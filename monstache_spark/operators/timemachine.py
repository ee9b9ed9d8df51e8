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
