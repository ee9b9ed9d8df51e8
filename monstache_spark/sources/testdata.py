"""Batch readers for the driver-generated testdata "collections".

In monstache terms these are the source MongoDB collections that direct
reads (SURVEY.md S3, monstache.go:399-404) scan; here they are parquet
tables. ``spark.read.parquet`` gives Catalyst pushdown/pruning for free —
the analogue of the reference pushing aggregation pipelines to the server
(monstache.go:4336-4386).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime SQL confs the engine depends on, pinned defensively: the
    caller (e.g. the verify driver) may hand us a plain session.

    - nanosAsLong: the driver testdata stores TIMESTAMP(NANOS) parquet,
      which Spark otherwise refuses to read.
    - UTC session timezone: date_trunc/date_format must agree with the
      UTC-naive DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_nanos(df)


def normalize_nanos(df: DataFrame) -> DataFrame:
    """Normalize driver-testdata timestamp encodings to plain UTC
    TIMESTAMP so the rest of the engine sees one type:

    - TIMESTAMP(NANOS) parquet arrives as long nanos under
      spark.sql.legacy.parquet.nanosAsLong → convert to µs timestamps
      (integer div — the values are µs-resolution).
    - Naive ``timestamp[us]`` parquet arrives as TIMESTAMP_NTZ →
      reinterpret as UTC (session timezone is pinned to UTC, so the
      wall-clock values are preserved and match the DuckDB oracle,
      which also treats naive timestamps as-is).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = df
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            out = out.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            out = out.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return out


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
