"""Earliest-across-shards resume election — mirrors the reference's
pkg/oplog/timestamp_resolver_test.go:11-88 plus the priority edge the
Go test exercises implicitly."""

from __future__ import annotations

import pytest

from monstache_spark.streaming.resume import (
    TS_SOURCE_MONSTACHE,
    TS_SOURCE_OPLOG,
    BsonTs,
    EarliestTimestampResolver,
    elect_resume_timestamp,
    resume_timestamp_literal,
)


def test_three_shards_monstache_priority_and_min():
    """timestamp_resolver_test.go:11-70: an oplog candidate earlier
    than every monstache candidate still loses (source priority); among
    monstache candidates the smallest (t, i) wins; every caller sees
    the same result; post-election offers return it unchanged."""
    r = EarliestTimestampResolver(3)
    assert r.offer((3, 1), TS_SOURCE_OPLOG) is None  # earlier, but oplog
    assert r.offer((10000, 10050), TS_SOURCE_MONSTACHE) is None
    elected = r.offer((10, 15), TS_SOURCE_MONSTACHE)
    assert elected == BsonTs(10, 15)
    assert r.resolved == BsonTs(10, 15)
    # repeated call after completion: cached result, no mutation
    assert r.offer((1, 1), TS_SOURCE_OPLOG) == BsonTs(10, 15)
    assert r.resolved == BsonTs(10, 15)


def test_single_shard():
    """timestamp_resolver_test.go:73-88."""
    r = EarliestTimestampResolver(1)
    assert r.offer((1000, 3), TS_SOURCE_OPLOG) == BsonTs(1000, 3)


def test_all_oplog_takes_min_with_ordinal_tiebreak():
    r = EarliestTimestampResolver(3)
    r.offer((5, 9), TS_SOURCE_OPLOG)
    r.offer((5, 2), TS_SOURCE_OPLOG)
    assert r.offer((6, 1), TS_SOURCE_OPLOG) == BsonTs(5, 2)


def test_monstache_then_oplog_never_displaces():
    r = EarliestTimestampResolver(2)
    r.offer((100, 1), TS_SOURCE_MONSTACHE)
    assert r.offer((1, 1), TS_SOURCE_OPLOG) == BsonTs(100, 1)


def test_oplog_then_later_monstache_displaces_even_if_larger():
    r = EarliestTimestampResolver(2)
    r.offer((1, 1), TS_SOURCE_OPLOG)
    assert r.offer((500, 7), TS_SOURCE_MONSTACHE) == BsonTs(500, 7)


def test_resolved_none_while_incomplete_and_bad_source_raises():
    r = EarliestTimestampResolver(2)
    r.offer((1, 1), TS_SOURCE_OPLOG)
    assert r.resolved is None
    with pytest.raises(ValueError):
        r.offer((1, 1), "gtm")
    with pytest.raises(ValueError):
        EarliestTimestampResolver(0)


def test_one_shot_election_and_pipeline_literal():
    ts = elect_resume_timestamp(
        [
            ((1723500776, 2), TS_SOURCE_OPLOG),
            ((1723500768, 4), TS_SOURCE_MONSTACHE),
            ((1723500772, 1), TS_SOURCE_MONSTACHE),
        ]
    )
    assert ts == BsonTs(1723500768, 4)
    assert resume_timestamp_literal(ts) == "2024-08-12 22:12:48"
