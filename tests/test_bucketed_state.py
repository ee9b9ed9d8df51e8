"""BucketedStateTable: equivalence with StateTable and touched-bucket
incrementality."""

from __future__ import annotations

import json
import os
import random

from pyspark.sql import functions as F

from monstache_spark.sinks.bucketed import BucketedStateTable
from monstache_spark.sinks.merge import StateTable


def _ops_df(spark, rows):
    df = spark.createDataFrame(
        rows, "op string, ns string, id string, version long, value double, k long"
    )
    return df.select(
        "op", "ns", "id",
        F.timestamp_micros(F.col("version") * 1000).alias("ts"),
        F.col("k").alias("ts_ord"), F.lit("oplog").alias("source"),
        "value", "k", "version",
    )


def _rand_batches(seed, n_batches=3, per_batch=15):
    rng = random.Random(seed)
    pos = 0
    batches = []
    for _ in range(n_batches):
        rows = []
        for _ in range(per_batch):
            op = rng.choice(["i", "u", "u", "d"])
            ns = rng.choice(["test.a", "test.b"])
            kid = str(rng.randint(0, 9))
            bump = {"i": 0, "u": 1, "d": 2}[op]
            rows.append((op, ns, kid, pos * 4 + bump, float(pos), pos))
            pos += 1
        batches.append(rows)
    # final batch includes a collection drop
    batches.append([("drop", "test.b", None, pos * 4 + 3, None, None)])
    return batches


def _canon(df):
    if df is None:
        return []
    return sorted((r["ns"], r["id"], r["version"]) for r in df.collect())


def test_bucketed_equals_plain_state_table(spark, tmp_path):
    for seed in (1, 7):
        plain = StateTable(spark, str(tmp_path / f"plain{seed}"))
        bucketed = BucketedStateTable(spark, str(tmp_path / f"bucket{seed}"), n_buckets=4)
        for rows in _rand_batches(seed):
            df = _ops_df(spark, rows)
            plain.merge_batch(df)
            bucketed.merge_batch(df)
        assert _canon(bucketed.read()) == _canon(plain.read())


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    t = BucketedStateTable(spark, str(tmp_path / "inc"), n_buckets=8)
    # batch 1: many keys spread over buckets
    t.merge_batch(_ops_df(spark, [
        ("i", "test.a", str(i), i * 4, float(i), i) for i in range(20)
    ]))
    m1 = t._bucket_dirs()
    # batch 2: ONE key -> at most one bucket rewritten
    t.merge_batch(_ops_df(spark, [("u", "test.a", "3", 1000, 9.0, 0)]))
    m2 = t._bucket_dirs()
    changed = [b for b in m1 if m1[b] != m2.get(b)]
    assert len(changed) == 1
    unchanged = [b for b in m1 if m1[b] == m2.get(b)]
    assert unchanged  # old commit dirs still referenced and on disk
    for b in unchanged:
        assert os.path.isdir(m1[b])
    # the updated key is visible, others untouched
    got = {(r["id"]): r["version"] for r in t.read().collect()}
    assert got["3"] == 1000 and got["0"] == 0


def test_stream_pipeline_with_bucketed_state(spark, tmp_path):
    from monstache_spark.streaming.pipeline import PipelineConfig, run_stream

    events_src = "/root/testdata/sf0.001/events.parquet"
    cfg_b = PipelineConfig(
        checkpoint_dir=str(tmp_path / "ckpt_b"),
        state_dir=str(tmp_path / "state_b"),
        state_buckets=4,
    )
    cfg_p = PipelineConfig(
        checkpoint_dir=str(tmp_path / "ckpt_p"),
        state_dir=str(tmp_path / "state_p"),
    )
    sb = run_stream(spark, events_src, cfg_b)
    sp = run_stream(spark, events_src, cfg_p)
    assert _canon(sb.read()) == _canon(sp.read())


def test_bucket_pruned_read(spark, tmp_path):
    from monstache_spark.sinks.bucketed import bucket_of

    t = BucketedStateTable(spark, str(tmp_path / "pruned"), n_buckets=8)
    t.merge_batch(_ops_df(spark, [
        ("i", "test.a", str(i), i * 4, float(i), i) for i in range(16)
    ]))
    full = t.read()
    one = full.filter(F.col("id") == "5").select("ns", "id")
    b = one.select(bucket_of(8)).collect()[0][0]
    pruned = t.read(buckets=[int(b)])
    assert "5" in {r["id"] for r in pruned.collect()}
    assert pruned.count() < full.count()


def test_bucketed_drop_mid_batch_and_tombstones(spark, tmp_path):
    """Version-aware drops and persisted tombstones hold in the
    bucketed sink too (shared _merge_apply/_erase_dropped algebra)."""
    t = BucketedStateTable(spark, str(tmp_path / "vdrop"), n_buckets=4)
    t.merge_batch(_ops_df(spark, [
        ("i", "test.a", "1", 20, 1.0, 0),
        ("drop", "test.a", None, 100, None, None),
        ("i", "test.a", "2", 120, 2.0, 1),   # post-drop re-create survives
    ]))
    assert _canon(t.read()) == [("test.a", "2", 120)]
    # delete then stale insert in a later batch: tombstone keeps it dead
    t.merge_batch(_ops_df(spark, [("d", "test.a", "2", 200, None, None)]))
    t.merge_batch(_ops_df(spark, [("i", "test.a", "2", 150, 5.0, 2)]))
    assert _canon(t.read()) == []
    t.merge_batch(_ops_df(spark, [("i", "test.a", "2", 300, 6.0, 3)]))
    assert _canon(t.read()) == [("test.a", "2", 300)]
