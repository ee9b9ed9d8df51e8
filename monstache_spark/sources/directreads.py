"""Direct reads — bulk backfill of whole "collections"
(SURVEY.md §2.1 S3-S5, §3.2).

- S3: the full-collection scan is just ``spark.read`` (partition-
  parallel for free; ``direct-read-split-max`` ≙ connector
  partitioning / repartition).
- S4 dynamic namespace discovery: ``direct-read-namespaces=[""]``
  enumerates everything minus system namespaces, filtered by regex
  (buildDynamicDirectReadNs monstache.go:4783-4825).
- S5 stateful direct reads: completed namespaces are recorded and
  skipped on restart (saveDirectReadNamespaces monstache.go:1745-1759,
  filterDirectReadNamespaces monstache.go:1704-1743). The reference
  keeps this in a MongoDB collection; here it is a tiny JSON manifest
  next to the checkpoint (SURVEY.md §1.4)."""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from monstache_spark.sources.testdata import load_table

# namespaces never eligible for direct reads (cf. systemsExcludeRegex
# monstache.go:86-87 + ignore rules monstache.go:551-557)
_SYSTEM_RE = re.compile(r"(^(monstache|config)\.)|(system\..+$)|(\.chunks$)")


def discover_namespaces(
    sf_dir: str,
    include_regex: str | None = None,
    exclude_regex: str | None = None,
) -> list[str]:
    """S4: enumerate available collections (parquet tables here; a
    catalog/listCollections call against a real source), minus system
    namespaces, filtered by the include/exclude patterns."""
    names = sorted(
        f"testdata.{os.path.splitext(f)[0]}"
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    out = []
    for ns in names:
        if _SYSTEM_RE.search(ns):
            continue
        if include_regex and not re.search(include_regex, ns):
            continue
        if exclude_regex and re.search(exclude_regex, ns):
            continue
        out.append(ns)
    return out


class DirectReadManifest:
    """S5 stateful direct reads: JSON manifest of completed namespaces."""

    def __init__(self, path: str):
        self.path = path

    def completed(self) -> set[str]:
        try:
            with open(self.path) as f:
                return set(json.load(f))
        except FileNotFoundError:
            return set()

    def mark_done(self, namespaces: list[str]) -> None:
        done = self.completed() | set(namespaces)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(sorted(done), f)

    def pending(self, namespaces: list[str]) -> list[str]:
        done = self.completed()
        return [ns for ns in namespaces if ns not in done]


def snapshot_envelope(df: DataFrame, ns: str, id_col: str) -> DataFrame:
    """Wrap a collection snapshot as CDC envelope rows: every row is an
    insert op with ``source='direct'`` and version 0 — direct-read ops
    carry synthetic timestamps in the reference (monstache.go:1288-1292)
    and any concurrent stream op must win the version race (SURVEY.md
    §7.3 'stream beats snapshot'), which version 0 guarantees."""
    from pyspark.sql import functions as F

    return df.select(
        F.lit("i").alias("op"),
        F.lit(ns).alias("ns"),
        F.col(id_col).cast("string").alias("id"),
        F.timestamp_micros(F.lit(0)).alias("ts"),
        F.lit(0).cast("long").alias("ts_ord"),
        F.lit("direct").alias("source"),
        F.lit(0).cast("long").alias("version"),
    )


def direct_read(
    spark: SparkSession,
    sf_dir: str,
    namespaces: list[str] | None = None,
    include_regex: str | None = None,
    exclude_regex: str | None = None,
    manifest: DirectReadManifest | None = None,
    split: int | None = None,
) -> dict[str, DataFrame]:
    """Issue the batch scans for every pending namespace. ``split``
    mirrors direct-read-split-max (repartition the scan; on a real
    connector this is the partitioner option)."""
    if not namespaces:
        namespaces = discover_namespaces(sf_dir, include_regex, exclude_regex)
    if manifest is not None:
        namespaces = manifest.pending(namespaces)
    out: dict[str, DataFrame] = {}
    for ns in namespaces:
        table = ns.split(".", 1)[1]
        df = load_table(spark, table, sf_dir)
        if split:
            df = df.repartition(split)
        out[ns] = df
    return out
