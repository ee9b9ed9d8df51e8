"""E2E streaming pipeline: stream == batch (DataFrame parity), resume
idempotence via checkpoint."""

from __future__ import annotations

import os

from monstache_spark.sources.testdata import load_table
from monstache_spark.streaming.pipeline import PipelineConfig, run_batch, run_stream

SF_DIR = "/root/testdata/sf0.001"


def _cfg(tmp_path, tag):
    return PipelineConfig(
        namespace_regex=r"^(test|fs)\..+",
        namespace_exclude_regex=r"\.accounts$",
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        state_dir=str(tmp_path / f"state_{tag}"),
    )


def _as_dict(df):
    return {(r["ns"], r["id"]): (r["last_value"], r["version"]) for r in df.collect()}


def test_stream_equals_batch(spark, tmp_path):
    stream_state = run_stream(spark, os.path.join(SF_DIR, "events.parquet"), _cfg(tmp_path, "s"))
    batch_state = run_batch(spark, load_table(spark, "events", SF_DIR), _cfg(tmp_path, "b"))
    a, b = _as_dict(stream_state.read()), _as_dict(batch_state.read())
    assert a == b and len(a) > 0


def test_stats_listener_records_progress(spark, tmp_path):
    """K9 stats surface: micro-batch progress recorded per batch."""
    from monstache_spark.streaming.ops import StatsRecorder

    rec = StatsRecorder(str(tmp_path / "stats" / "progress.jsonl"))
    spark.streams.addListener(rec)
    try:
        run_stream(spark, os.path.join(SF_DIR, "events.parquet"), _cfg(tmp_path, "stats"))
        import time

        deadline = time.time() + 15
        rows = rec.rows()
        while time.time() < deadline and not any(r["event"] == "progress" and r.get("numInputRows", 0) > 0 for r in rows):
            time.sleep(0.5)
            rows = rec.rows()
    finally:
        spark.streams.removeListener(rec)
    assert any(r["event"] == "started" for r in rows)
    assert any(r["event"] == "progress" and r.get("numInputRows", 0) > 0 for r in rows)


def test_stream_restart_is_idempotent(spark, tmp_path):
    cfg = _cfg(tmp_path, "r")
    s1 = run_stream(spark, os.path.join(SF_DIR, "events.parquet"), cfg)
    first = _as_dict(s1.read())
    # restart with same checkpoint: no new input -> state unchanged
    s2 = run_stream(spark, os.path.join(SF_DIR, "events.parquet"), cfg)
    assert _as_dict(s2.read()) == first
