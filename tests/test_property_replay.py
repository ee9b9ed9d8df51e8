"""Out-of-order / replay property tests (SURVEY.md §5.2).

The external-versioning invariant (tsVersion monstache.go:4053-4063,
conflict-ignore monstache.go:566-571): the materialized state must be
a pure function of the op SET — delivery order, duplication (at-least-
once replays), and batch boundaries must not change the result.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from monstache_spark.operators.materialize import last_state, merge_upsert

NAMESPACES = ("test.a", "test.b")


def _ops_strategy():
    op = st.sampled_from(["i", "u", "d"])
    key = st.tuples(st.sampled_from(NAMESPACES), st.integers(0, 3))
    return st.lists(st.tuples(key, op), min_size=1, max_size=12)


def _rows(ops, start_pos: int = 0):
    # versions are the op's GLOBAL position * 4 + bump — unique per
    # event, mirroring the envelope's collision-free version arithmetic
    rows = []
    for pos, ((ns, kid), op) in enumerate(ops, start=start_pos):
        bump = {"i": 0, "u": 1, "d": 2}[op]
        rows.append((op, ns, str(kid), pos * 4 + bump, float(pos), pos))
    return rows


def _to_df(spark, ops, start_pos: int = 0):
    return spark.createDataFrame(
        _rows(ops, start_pos), "op string, ns string, id string, version long, value double, k long"
    ).select(
        "op", "ns", "id",
        F.timestamp_micros(F.col("version") * 1000).alias("ts"),
        F.col("k").alias("ts_ord"), F.lit("oplog").alias("source"),
        "value", "k", "version",
    )


def _canon(df):
    return sorted(
        (r["ns"], r["id"], r["version"], r["last_value"]) for r in df.collect()
    )


@pytest.mark.usefixtures("spark")
class TestReplayInvariance:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(ops=_ops_strategy(), seed=st.integers(0, 2**16))
    def test_order_and_duplication_invariant(self, spark, ops, seed):
        rng = random.Random(seed)
        baseline = _canon(last_state(_to_df(spark, ops)))
        # replays carry the SAME version as the original delivery
        # (monstache.go:566-571): duplicate DataFrame rows directly
        df = _to_df(spark, ops)
        dup = df.orderBy(F.rand(seed)).limit(max(1, len(ops) // 2))
        replay_df = df.unionByName(dup).orderBy(F.rand(seed + 1))
        assert _canon(last_state(replay_df)) == baseline

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(ops=_ops_strategy(), cut=st.integers(0, 12))
    def test_batch_boundary_invariant(self, spark, ops, cut):
        cut = min(cut, len(ops))
        whole = _canon(last_state(_to_df(spark, ops)))
        first = last_state(_to_df(spark, ops[:cut])) if cut else None
        second_ops = (
            _to_df(spark, ops[cut:], start_pos=cut)
            if cut < len(ops)
            else _to_df(spark, ops).limit(0)
        )
        if first is None:
            merged = last_state(second_ops)
        else:
            merged = merge_upsert(first, second_ops)
        # merge_upsert re-materializes; delete tombstones only survive
        # within a batch, so a delete in batch 2 must still erase keys
        # from batch 1 — that is exactly what merge_upsert guarantees
        assert _canon(merged) == whole
