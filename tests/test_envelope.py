"""Envelope + versioning unit parity (reference: tsVersion
monstache.go:4053-4063, id rules monstache.go:815-840)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from monstache_spark.envelope import events_to_envelope, id_guard, version_expr


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


TS = dt.datetime(2024, 1, 1, 0, 0, 1)


def test_envelope_op_mapping(spark):
    df = _events(
        spark,
        [
            (1, TS, 10, "signup", 1.0, '{"k": 1}'),
            (2, TS, 10, "click", 2.0, '{"k": 2}'),
            (3, TS, 10, "error", 3.0, '{"k": 3}'),
        ],
    )
    got = {r["ts_ord"]: r["op"] for r in events_to_envelope(df).collect()}
    assert got == {1: "i", 2: "u", 3: "d"}


def test_envelope_ns_is_stable_per_user(spark):
    df = _events(spark, [(i, TS, 7, "click", 0.0, '{"k": 0}') for i in range(5)])
    ns = {r["ns"] for r in events_to_envelope(df).collect()}
    assert len(ns) == 1  # all events of one user share a namespace


def test_version_bumps_order_insert_update_delete(spark):
    """Same ts + ordinal: version(d) > version(u) > version(i) —
    the op bump (u:+1, d:+2) of monstache.go:4053-4063."""
    df = spark.createDataFrame(
        [("i", TS, 5), ("u", TS, 5), ("d", TS, 5)], "op string, ts timestamp, ts_ord long"
    )
    vs = {r["op"]: r["v"] for r in df.select("op", version_expr().alias("v")).collect()}
    assert vs["i"] < vs["u"] < vs["d"]
    assert vs["u"] - vs["i"] == 1 and vs["d"] - vs["i"] == 2


def test_version_monotonic_in_time(spark):
    later = TS + dt.timedelta(seconds=1)
    df = spark.createDataFrame(
        [("d", TS, 5), ("i", later, 5)], "op string, ts timestamp, ts_ord long"
    )
    vs = [r["v"] for r in df.select(version_expr().alias("v")).collect()]
    assert vs[1] > vs[0]  # any later-second op beats any earlier bump


def test_id_guard_rejects_empty_and_oversized(spark):
    df = spark.createDataFrame([("",), ("ok",), ("x" * 513,), ("x" * 512,)], "id string")
    kept = [r["id"] for r in id_guard(df).collect()]
    assert "" not in kept and "x" * 513 not in kept
    assert "ok" in kept and "x" * 512 in kept
