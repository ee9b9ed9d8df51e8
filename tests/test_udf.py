"""Per-namespace mapper/filter surface (M1/M2, F5/F6, F8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from monstache_spark.operators.udf import (
    NamespaceFilter,
    NamespaceMapper,
    apply_filters,
    apply_mappers,
    pandas_mapper,
)

SCHEMA = "op string, ns string, id string, value double, k long"
ROWS = [
    ("i", "test.a", "1", 10.0, 1),
    ("u", "test.a", "2", 100.0, 10),
    ("i", "test.b", "3", 3.0, 3),
    ("d", "test.b", "4", 0.0, 4),
]


def test_mapper_rewrites_only_its_namespace(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = apply_mappers(df, [NamespaceMapper("test.a", columns={"value": lambda: F.col("value") + 1})])
    got = {r["id"]: r["value"] for r in out.collect()}
    assert got == {"1": 11.0, "2": 101.0, "3": 3.0, "4": 0.0}


def test_global_mapper_runs_before_namespace(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = apply_mappers(
        df,
        [
            NamespaceMapper("test.a", columns={"value": lambda: F.col("value") * 10}),
            NamespaceMapper("", columns={"value": lambda: F.col("value") + 1}),  # global
        ],
    )
    got = {r["id"]: r["value"] for r in out.collect()}
    assert got["1"] == 110.0  # (10+1)*10: global applied first despite list order
    assert got["3"] == 4.0


def test_drop_when_creates_tombstone(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = apply_mappers(df, [NamespaceMapper("test.a", drop_when=lambda: F.col("value") < 50)])
    got = {r["id"]: r["op"] for r in out.collect()}
    assert got == {"1": "d", "2": "u", "3": "i", "4": "d"}


def test_skip_when_removes_row(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = apply_mappers(df, [NamespaceMapper("test.a", skip_when=lambda: F.col("k") == 10)])
    assert {r["id"] for r in out.collect()} == {"1", "3", "4"}


def test_filters_gate_data_ops_only(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = apply_filters(df, [NamespaceFilter("test.b", lambda: F.col("value") > 5)])
    ids = {r["id"] for r in out.collect()}
    assert "3" not in ids   # insert failing predicate -> filtered
    assert "4" in ids       # delete passes regardless


def test_pandas_mapper_escape_hatch(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)

    def fn(batches):
        for pdf in batches:
            pdf["value"] = pdf["value"] * 2
            yield pdf

    out = pandas_mapper(df, fn, SCHEMA)
    got = {r["id"]: r["value"] for r in out.collect()}
    assert got["1"] == 20.0 and got["2"] == 200.0


def test_map_index_rollover_periods(spark):
    import datetime

    from monstache_spark.operators.routing import map_index_rollover

    df = spark.createDataFrame(
        [("DB.Logs", datetime.datetime(2024, 1, 5, 13)),
         ("DB.Logs", datetime.datetime(2024, 2, 1, 0)),
         ("DB.Logs", None)],
        "ns string, ts timestamp",
    )
    daily = {(r["ns"], r["ts"]): r["_index"] for r in map_index_rollover(
        df, "day"
    ).collect()}
    vals = set(daily.values())
    assert "db.logs-2024.01.05" in vals and "db.logs-2024.02.01" in vals
    assert "db.logs" in vals          # null ts falls back to the base name
    monthly = {r["_index"] for r in map_index_rollover(df, "month").collect()}
    assert "db.logs-2024.01" in monthly and "db.logs-2024.02" in monthly
    hourly = {r["_index"] for r in map_index_rollover(
        df, "hour", overrides={"DB.Logs": "applogs"}
    ).collect()}
    assert "applogs-2024.01.05.13" in hourly
