"""Checkpoint-restart tests for every streaming query (SURVEY.md §2.7
resume semantics UNDER STATE, not just offsets), parametrized over
both state-store backends (default HDFS-backed and RocksDB).

The property tested: run over part 1 with a pinned checkpoint, add
part 2, re-run with the SAME checkpoint — the result must equal a
fresh single run over the full input.  That exercises (a) processed
files being skipped on restart and (b) keyed state (window aggs,
join buffers, dedup keys, applyInPandasWithState counters) resuming
from the checkpointed store instead of restarting from zero.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from monstache_spark.session import ROCKSDB_PROVIDER
from monstache_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rocksdb_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(ROCKSDB_PROVIDER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module", params=["hdfs", "rocksdb"])
def backend(request, spark):
    if request.param == "rocksdb" and not _rocksdb_available(spark):
        pytest.skip("RocksDB state store provider not on the classpath")
    return request.param


def _single_file(df, target: str, scratch: str):
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
    shutil.copyfile(os.path.join(scratch, part), target)


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """events split into two files by event_id; returns (glob_path,
    add_part2_fn, full_single_file_path)."""
    base = tmp_path_factory.mktemp("restart_src")
    inc = base / "inc"
    inc.mkdir()
    all_events = load_table(spark, "events", SF_DIR)
    cut = 3000
    _single_file(
        all_events.filter(F.col("event_id") < cut),
        str(inc / "a.parquet"),
        str(base / "wa"),
    )
    part2 = str(base / "b_staged.parquet")
    _single_file(
        all_events.filter(F.col("event_id") >= cut), part2, str(base / "wb")
    )
    full = str(base / "full_events.parquet")
    _single_file(all_events, full, str(base / "wf"))

    def add_part2():
        import shutil

        target = str(inc / "b.parquet")
        if not os.path.exists(target):
            shutil.copyfile(part2, target)

    return os.path.join(str(inc), "*.parquet"), add_part2, full


def _run_restart(run_fn, split_events, tmp_path, backend, tag):
    """run(part1) -> add part2 -> run(same ckpt); plus a fresh run on
    the full file.  Returns (restarted_df, fresh_df)."""
    glob_path, add_part2, full = split_events
    ckpt = str(tmp_path / f"ckpt_{tag}_{backend}")
    out = str(tmp_path / f"out_{tag}_{backend}")
    run_fn(glob_path, ckpt, out)
    add_part2()
    restarted = run_fn(glob_path, ckpt, out)
    fresh = run_fn(
        full,
        str(tmp_path / f"ckpt_{tag}_{backend}_fresh"),
        str(tmp_path / f"out_{tag}_{backend}_fresh"),
    )
    return restarted, fresh


def test_restart_hourly_windows(spark, tmp_path, backend, split_events):
    from monstache_spark.streaming.windows import hourly_window_counts

    def run(path, ckpt, out):
        return hourly_window_counts(
            spark, path, checkpoint_dir=ckpt, out_dir=out, state_store=backend
        )

    restarted, fresh = _run_restart(run, split_events, tmp_path, backend, "hw")
    key = lambda df: {  # noqa: E731
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in df.collect()
    }
    a, b = key(restarted), key(fresh)
    assert a == b and len(a) > 0


def test_restart_session_windows(spark, tmp_path, backend, split_events):
    from monstache_spark.streaming.windows import session_windows

    def run(path, ckpt, out):
        return session_windows(
            spark, path, checkpoint_dir=ckpt, out_dir=out, state_store=backend
        )

    restarted, fresh = _run_restart(run, split_events, tmp_path, backend, "sw")
    key = lambda df: {  # noqa: E731
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["sum_value"])
        for r in df.collect()
    }
    a, b = key(restarted), key(fresh)
    assert a == b and len(a) > 0


def test_restart_stream_stream_join(spark, tmp_path, backend, split_events):
    from monstache_spark.streaming.windows import stream_stream_join

    def run(path, ckpt, out):
        return stream_stream_join(
            spark, path, checkpoint_dir=ckpt, out_dir=out, state_store=backend
        )

    restarted, fresh = _run_restart(run, split_events, tmp_path, backend, "ssj")
    key = lambda df: {  # noqa: E731
        (r["user_id"], r["signup_event"], r["purchase_event"])
        for r in df.collect()
    }
    a, b = key(restarted), key(fresh)
    # append sink must not duplicate already-emitted pairs on restart
    assert restarted.count() == len(a)
    assert a == b and len(a) > 0


def test_restart_stream_dedup(spark, tmp_path, backend, split_events):
    from monstache_spark.streaming.windows import stream_dedup_keys

    def run(path, ckpt, out):
        return stream_dedup_keys(
            spark,
            path,
            ["user_id", "event_type"],
            checkpoint_dir=ckpt,
            out_dir=out,
            state_store=backend,
        )

    restarted, fresh = _run_restart(run, split_events, tmp_path, backend, "dd")
    key = lambda df: {(r["user_id"], r["event_type"]) for r in df.collect()}  # noqa: E731
    a, b = key(restarted), key(fresh)
    assert a == b and len(a) > 0


def test_restart_stateful_op_counts(spark, tmp_path, backend, split_events):
    """applyInPandasWithState counters must CONTINUE from checkpointed
    state over only the new files — the strongest §2.7 case."""
    from monstache_spark.streaming.stateful import run_op_counts_stream

    def run(path, ckpt, out):
        return run_op_counts_stream(
            spark, path, checkpoint_dir=ckpt, out_dir=out, state_store=backend
        )

    restarted, fresh = _run_restart(run, split_events, tmp_path, backend, "oc")
    key = lambda df: {  # noqa: E731
        r["ns"]: (r["n_i"], r["n_u"], r["n_d"], r["n_total"])
        for r in df.collect()
    }
    a, b = key(restarted), key(fresh)
    assert a == b and len(a) > 0


def test_restart_percolate_alerts(spark, tmp_path, backend, split_events):
    """Stateless stream: restart must still be exactly-once on the
    append sink (no re-emitted alerts for part-1 files)."""
    from monstache_spark.streaming.windows import percolate_alerts

    stored = {"buy": {"term": {"event_type": "purchase"}}}

    def run(path, ckpt, out):
        return percolate_alerts(
            spark, path, stored, out_dir=out, checkpoint_dir=ckpt
        )

    restarted, fresh = _run_restart(run, split_events, tmp_path, backend, "pa")
    a = sorted(r["event_id"] for r in restarted.collect())
    b = sorted(r["event_id"] for r in fresh.collect())
    assert a == b and len(a) > 0 and len(a) == len(set(a))
