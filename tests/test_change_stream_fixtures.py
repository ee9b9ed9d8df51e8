"""Recorded change-stream fixtures driven end-to-end.

The reference's test contract is a LIVE loop — mongod writes, monstache
syncs, the Go suite polls Elasticsearch (monstache_test.go:24-42 over
docker/test/docker-compose.test.yml:7-115). The sandbox has no servers,
so this is the replayable half of that contract: raw extended-JSON
change events exactly as ``watch()`` emits them (recorded shape; see
docker/test/record_fixtures.py for regeneration against a live replica
set) driven through parse → envelope translation → the shared
transform chain → the versioned state sink, plus resume-token replay.
The live half lives in docker/test/ (compose recipe mirroring the
reference's docker/test/run-tests.sh).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "change_stream_events.jsonl")

OID = "66b9a1f0c4d4e0001c8d4a01"


def _envelope(spark):
    from monstache_spark.connectors import change_events_to_envelope, parse_raw_change_events

    raw = spark.read.text(FIXTURES)
    return change_events_to_envelope(parse_raw_change_events(raw))


def test_raw_parse_id_stringification(spark):
    """Extended-JSON document keys collapse per opIDToString
    (monstache.go:815-840): $oid→hex, $numberLong→digits, integral
    $numberDouble→int repr; string ids pass through."""
    from monstache_spark.connectors import parse_raw_change_events

    import json

    ev = parse_raw_change_events(spark.read.text(FIXTURES))
    ids = {
        r["resume_token"]: (
            None if r["documentKey"] is None else json.loads(r["documentKey"])["_id"]
        )
        for r in ev.collect()
    }
    assert ids["8266B9A0E0000000012B0229296E04"] == OID
    assert ids["8266B9A0E0000000022B0229296E04"] == "user-2"
    assert ids["8266B9A0E0000000032B0229296E04"] == "3"
    assert ids["8266B9A0E0000000042B0229296E04"] == "4"  # 4.0 -> "4"
    assert ids["8266B9A0EC000000012B0229296E04"] is None  # drop: no key
    # updateDescription rides along for delta consumers
    upd = ev.filter(F.col("operationType") == "update").first()
    assert '"score":6' in upd["updateDescription"].replace(" ", "")


def test_fixture_replay_materializes_reference_state(spark, tmp_path):
    """Full replay through the shared transform chain into the state
    sink: updates/replaces win by version, the delete kills id 3, the
    tmp database is erased by drop+dropDatabase, invalidate is
    dropped by translation."""
    from monstache_spark.sinks.merge import StateTable
    from monstache_spark.streaming.pipeline import PipelineConfig, transform

    env = _envelope(spark)
    ops = transform(env, PipelineConfig())
    state = StateTable(spark, str(tmp_path / "state"), payload_cols=("op", "ts", "ts_ord", "doc"))
    state.merge_batch(ops)
    rows = {(r["ns"], r["id"]): r for r in state.read().collect()}
    assert set(rows) == {
        ("test.users", OID),
        ("test.users", "user-2"),
        ("test.users", "4"),
        ("test.users", "user-5"),
        ("test.orders", "o-1"),
    }
    # the update's post-image (updateLookup) is what materializes
    assert '"score":6' in rows[("test.users", OID)]["last_doc"].replace(" ", "")
    assert '"bobby"' in rows[("test.users", "user-2")]["last_doc"]
    # tombstone for the deleted id persists (stale replays stay dead)
    with_tombs = state.read(include_tombstones=True)
    dead = with_tombs.filter(F.col("id") == "3").collect()
    assert len(dead) == 1 and dead[0]["_tomb"]


def test_fixture_replay_is_batch_boundary_invariant(spark, tmp_path):
    """Splitting the recorded stream at ANY point and merging the two
    halves as separate micro-batches must land the same final state as
    one batch — the §2.7 replay/versioned-delivery invariant."""
    from monstache_spark.sinks.merge import StateTable
    from monstache_spark.streaming.pipeline import PipelineConfig, transform

    env = _envelope(spark).orderBy("version").cache()
    try:
        ops = transform(env, PipelineConfig())
        whole = StateTable(spark, str(tmp_path / "whole"), payload_cols=("op", "doc"))
        whole.merge_batch(ops)
        expect = {
            (r["ns"], r["id"], r["version"]) for r in whole.read().collect()
        }
        versions = sorted(r["version"] for r in env.collect())
        for cut in (versions[3], versions[7]):
            split_dir = str(tmp_path / f"split_{cut}")
            st = StateTable(spark, split_dir, payload_cols=("op", "doc"))
            st.merge_batch(transform(env.filter(F.col("version") <= cut), PipelineConfig()))
            st.merge_batch(transform(env.filter(F.col("version") > cut), PipelineConfig()))
            got = {(r["ns"], r["id"], r["version"]) for r in st.read().collect()}
            assert got == expect, f"divergence splitting at version {cut}"
    finally:
        env.unpersist()


def test_resume_token_replay_suffix(spark, tmp_path):
    """Resuming after a saved token replays exactly the suffix, and
    merging the suffix onto the state built from the prefix equals the
    full-replay state (saveTokens/readResumeTokens parity,
    monstache.go:1658-1687, 2204-2231)."""
    from monstache_spark.connectors import (
        change_events_to_envelope,
        parse_raw_change_events,
        resume_after_token,
    )
    from monstache_spark.sinks.merge import StateTable
    from monstache_spark.streaming.pipeline import PipelineConfig, transform

    ev = parse_raw_change_events(spark.read.text(FIXTURES))
    token = "8266B9A0E8000000012B0229296E04"  # the delete of id 3
    suffix = resume_after_token(ev, token)
    assert suffix.count() == 5  # tmp insert, drop, dropDatabase, user-5, invalidate
    assert resume_after_token(ev, None).count() == ev.count()

    prefix = ev.filter(F.col("resume_token") <= token)
    st = StateTable(spark, str(tmp_path / "resumed"), payload_cols=("op", "doc"))
    st.merge_batch(transform(change_events_to_envelope(prefix), PipelineConfig()))
    st.merge_batch(transform(change_events_to_envelope(suffix), PipelineConfig()))
    full = StateTable(spark, str(tmp_path / "full"), payload_cols=("op", "doc"))
    full.merge_batch(transform(change_events_to_envelope(ev), PipelineConfig()))
    a = {(r["ns"], r["id"], r["version"]) for r in st.read().collect()}
    b = {(r["ns"], r["id"], r["version"]) for r in full.read().collect()}
    assert a == b


def test_fixture_stream_through_micro_batches(spark, tmp_path):
    """The same fixtures as a STREAMING source: readStream.text over
    the fixture file, one-file micro-batches, foreachBatch merging
    into the state sink — the in-sandbox stand-in for a live
    change-stream read (mongo_stream_options supplies the real
    connector options off-sandbox)."""
    from monstache_spark.connectors import change_events_to_envelope, parse_raw_change_events
    from monstache_spark.sinks.merge import StateTable
    from monstache_spark.streaming.pipeline import PipelineConfig, transform

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    # split the recording into two arrival files to force >1 micro-batch
    lines = open(FIXTURES).read().splitlines()
    (src_dir / "part1.jsonl").write_text("\n".join(lines[:7]) + "\n")
    (src_dir / "part2.jsonl").write_text("\n".join(lines[7:]) + "\n")

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(src_dir))
    )
    ops = transform(
        change_events_to_envelope(parse_raw_change_events(raw)), PipelineConfig()
    )
    state = StateTable(spark, str(tmp_path / "stream_state"), payload_cols=("op", "doc"))

    q = (
        ops.writeStream.foreachBatch(lambda df, _eid: state.merge_batch(df))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    keys = {(r["ns"], r["id"]) for r in state.read().collect()}
    assert keys == {
        ("test.users", OID),
        ("test.users", "user-2"),
        ("test.users", "4"),
        ("test.users", "user-5"),
        ("test.orders", "o-1"),
    }
