"""Index routing & mapping (SURVEY.md §2.3 M3-M5).

- M4 index-name mapping: namespace → target index, defaulting to the
  lowercased namespace (defaultIndexMapping monstache.go:795-800) with
  per-namespace overrides (loadIndexTypes monstache.go:1893-1906).
- M3 routing-meta extraction: documents may carry ``_meta_monstache``
  {index, id, routing, version, skip, ...} that overrides routing
  (parseIndexMeta monstache.go:1377-1403, indexingMeta.load
  monstache.go:3547-3594).
- M5 prepare-for-indexing: strip _id/_meta_monstache from the body and
  optionally stamp the oplog ts + a formatted date
  (prepareDataForIndexing monstache.go:1360-1375).

The override map is tiny config — expressed as a literal ``map`` Column
(equivalent to a broadcast-hash lookup; no shuffle, no join node at all
for small maps since create_map literals constant-fold).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def map_index(df: DataFrame, overrides: dict[str, str] | None = None, ns_col: str = "ns") -> DataFrame:
    """M4: add ``_index`` = override(ns) else lower(ns)."""
    if overrides:
        lookup = F.create_map(*[F.lit(x) for x in chain.from_iterable(overrides.items())])
        idx = F.coalesce(lookup[F.col(ns_col)], F.lower(F.col(ns_col)))
    else:
        idx = F.lower(F.col(ns_col))
    return df.withColumn("_index", idx)


_ROLLOVER_FMT = {
    "hour": "yyyy.MM.dd.HH",
    "day": "yyyy.MM.dd",
    "week": "yyyy.MM.dd",  # truncated to the week start, labeled by it
    "month": "yyyy.MM",
    "year": "yyyy",
}


def map_index_rollover(
    df: DataFrame,
    interval: str = "day",
    ts_col: str = "ts",
    overrides: dict[str, str] | None = None,
    ns_col: str = "ns",
) -> DataFrame:
    """M4 extension — time-based index ROLLOVER: ``_index`` becomes
    ``<base>-<date label>`` (``logs-2024.01.05``), the index-per-period
    layout ES operators use for retention (delete old indices instead
    of delete-by-query) and that monstache deployments configure with
    date-math index names.  The label is the event time truncated to
    ``interval`` (hour/day/week/month/year) and formatted with the
    standard ES date pattern for that interval.

    One codegen projection on top of :func:`map_index` — the rollover
    name is derived per ROW from event time, so backfill and live
    events land in their own periods' indexes (time-correct
    re-ingestion), and downstream per-index operations (drop, merge)
    stay partition-pruned when the sink partitions by ``_index``.
    """
    if interval not in _ROLLOVER_FMT:
        raise ValueError(f"unsupported rollover interval: {interval}")
    out = map_index(df, overrides, ns_col)
    label = F.date_format(
        F.date_trunc(interval, F.col(ts_col)), _ROLLOVER_FMT[interval]
    )
    return out.withColumn(
        "_index",
        F.when(
            F.col(ts_col).isNotNull(), F.concat_ws("-", F.col("_index"), label)
        ).otherwise(F.col("_index")),
    )


def extract_meta(df: DataFrame, meta_col: str = "_meta_monstache") -> DataFrame:
    """M3: pop routing metadata out of the doc into dedicated columns
    and drop it from the body. Expects ``meta_col`` to be a struct
    column with (some of) fields index/id/routing/version/skip."""
    if meta_col not in df.columns:
        return df
    meta = F.col(meta_col)
    out = df
    for fld, target in (("index", "_index"), ("id", "_routed_id"), ("routing", "_routing"), ("skip", "_skip")):
        if fld in df.schema[meta_col].dataType.fieldNames():
            out = out.withColumn(target, meta.getField(fld))
    return out.drop(meta_col)


def prepare_for_indexing(
    df: DataFrame,
    ts_field: str | None = None,
    date_field: str | None = None,
    date_format: str = "yyyy/MM/dd HH:mm:ss",
) -> DataFrame:
    """M5: stamp oplog ts / formatted oplog date onto the body.

    (default format mirrors the reference's oplog-date default
    ``2006/01/02 15:04:05``, monstache.go:2888-2890).
    """
    out = df
    if ts_field:
        out = out.withColumn(ts_field, F.col("ts"))
    if date_field:
        out = out.withColumn(date_field, F.date_format(F.col("ts"), date_format))
    return out
