"""Time-machine (history) sink rows (SURVEY.md §2.6 K7).

The reference appends every version of a doc to a dated index
``log.<index>.YYYY-MM-dd`` carrying ``_source_id`` (the original doc
id), the oplog ts, and a formatted oplog date, routed by source id
(monstache.go:3253-3291; index-name format monstache.go:3256-3259,
defaults monstache.go:2861-2866).

Spark-first this is an append-mode second sink in the same micro-batch,
partitioned by the date — an SCD2-style audit log. The dated "index"
becomes a partition column, so history reads prune by date for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from monstache_spark.operators.routing import map_index


def time_machine_rows(
    ops: DataFrame, overrides: dict[str, str] | None = None, prefix: str = "log"
) -> DataFrame:
    """Every non-drop op becomes a history row in its dated log index.
    ``prefix`` is time-machine-index-prefix (default "log",
    monstache.go:2861-2863)."""
    routed = map_index(ops, overrides)
    return routed.select(
        F.concat(
            F.lit(prefix + "."), F.col("_index"), F.lit("."), F.date_format("ts", "yyyy-MM-dd")
        ).alias("history_index"),
        F.col("id").alias("_source_id"),
        "op",
        "ts",
        "version",
        "value",
        "k",
    )


def scd2_intervals(ops: DataFrame) -> DataFrame:
    """SCD-type-2 dimension view of the CDC envelope: one validity
    interval per document version, ``[valid_from, valid_to)`` in
    version order, closed by the NEXT op on the key (update or
    delete), open (``is_current``) otherwise.

    The time-machine sink (K7) answers "what did the doc look like at
    t" by append-log scan; this derives the lakehouse-standard
    interval table instead — a point-in-time join becomes
    ``BETWEEN valid_from AND valid_to``.  One lead window per key
    (the exchange hashes on (ns, id) — the same partitioning every
    other per-key stage uses), no state, no Python.

    Reference semantics evidence: versions are the oplog-derived
    total order of monstache.go:4053-4063 (tsVersion); a delete
    closes its predecessor's interval exactly as the versioned ES
    delete supersedes the doc.
    """
    w = Window.partitionBy("ns", "id").orderBy("version")
    closed = ops.withColumn("_valid_to", F.lead("version").over(w))
    return closed.filter(F.col("op") != "d").select(
        "ns",
        "id",
        "value",
        "k",
        F.col("version").alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_valid_to").isNull().cast("long").alias("is_current"),
    )
