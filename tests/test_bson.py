"""BSON normalization parity (reference monstachemap/encoding.go tests,
monstache_test.go:108-122, 239-283)."""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

from monstache_spark.functions.bson import (
    id_string,
    iso_json_date,
    prune_invalid_date,
    prune_invalid_float,
    uuid_dashed,
)


def test_uuid_dashed(spark):
    u = uuid.UUID("12345678-9abc-def0-1234-56789abcdef0")
    df = spark.createDataFrame([(u.bytes,)], "b binary")
    got = df.select(uuid_dashed(F.col("b")).alias("u")).collect()[0]["u"]
    assert got == str(u)


def test_prune_invalid_float(spark):
    df = spark.createDataFrame(
        [(1.5,), (float("nan"),), (float("inf"),), (float("-inf"),)], "x double"
    )
    got = [r["y"] for r in df.select(prune_invalid_float(F.col("x")).alias("y")).collect()]
    assert got == [1.5, None, None, None]


def test_prune_invalid_date(spark):
    df = spark.range(1).select(
        F.expr("timestamp'2024-01-01 00:00:00'").alias("ok"),
        F.expr("timestamp'10000-01-01 00:00:00'").alias("bad"),
    )
    got = df.select(
        prune_invalid_date(F.col("ok")).isNull().alias("ok_null"),
        prune_invalid_date(F.col("bad")).isNull().alias("bad_null"),
    ).collect()[0]
    assert not got["ok_null"]
    assert got["bad_null"]  # year 10000 pruned (encoding.go:28-30)


def test_id_string_integral_float_collapse(spark):
    """monstache_test.go:239-259: 42.0 -> "42", 1.5 -> "1.5"."""
    df = spark.createDataFrame([(42.0,), (1.5,), (-3.0,)], "x double")
    got = [r["y"] for r in df.select(id_string(F.col("x")).alias("y")).collect()]
    assert got == ["42", "1.5", "-3"]


def test_iso_json_date_format(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 3, 5, 6, 7, 8, 90000),)], "t timestamp")
    got = df.select(iso_json_date(F.col("t")).alias("s")).collect()[0]["s"]
    assert got == "2024-03-05T06:07:08.090Z"  # UTC session tz
