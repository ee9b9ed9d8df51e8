"""EQL sequence matching (operators/eql.py): head-greedy earliest
successor, maxspan pruning, id tie-breaks, overlapping starts."""

from __future__ import annotations

import datetime

import pytest

from monstache_spark.operators.eql import eql_sequence


def _t(m, s=0):
    return datetime.datetime(2024, 1, 1, 0, m, s)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (1, _t(0), "u1", "a"),
        (2, _t(2), "u1", "b"),
        (3, _t(3), "u1", "b"),   # later b: not picked (head-greedy)
        (4, _t(4), "u1", "c"),
        (5, _t(1), "u2", "a"),
        (6, _t(40), "u2", "b"),  # outside 30-min maxspan from t=1
        (7, _t(5), "u3", "b"),   # no step-1 event for u3
        (8, _t(6), "u1", "a"),   # second start for u1: no b after it
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )


def test_two_step_head_greedy_and_maxspan(ev):
    out = eql_sequence(
        ev,
        [{"term": {"kind": "a"}}, {"term": {"kind": "b"}}],
        by="user", maxspan_s=1800,
    ).collect()
    got = {(r["user"], r["id1"], r["id2"]) for r in out}
    # u1's first start picks the EARLIEST b (id 2, not 3); u2's b is
    # outside maxspan; u1's second start has no later b
    assert got == {("u1", 1, 2)}
    assert out[0]["span_s"] == 120.0


def test_three_step_chains_through_earliest(ev):
    out = eql_sequence(
        ev,
        [{"term": {"kind": "a"}}, {"term": {"kind": "b"}},
         {"term": {"kind": "c"}}],
        by="user", maxspan_s=3600,
    ).collect()
    assert [(r["id1"], r["id2"], r["id3"]) for r in out] == [(1, 2, 4)]


def test_tie_at_equal_timestamp_breaks_by_id(spark):
    rows = [
        (10, _t(0), "u", "a"),
        (12, _t(1), "u", "b"),
        (11, _t(1), "u", "b"),  # same ts, smaller id wins
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )
    out = eql_sequence(
        ev, [{"term": {"kind": "a"}}, {"term": {"kind": "b"}}], by="user"
    ).collect()
    assert [(r["id1"], r["id2"]) for r in out] == [(10, 11)]


def test_requires_two_steps(ev):
    with pytest.raises(ValueError, match="2 steps"):
        eql_sequence(ev, [{"term": {"kind": "a"}}], by="user")


def test_sequence_until_expires_inflight(spark):
    """EQL until: an until-event strictly between a sequence's first
    and last step expires it; sequences completing BEFORE the
    until-event stand; other keys unaffected."""
    from monstache_spark.operators.eql import eql_sequence

    rows = [
        # key "a": step1 @1, until @2, step2 @3 -> killed
        (1, "a", "start", 1.0),
        (2, "a", "abort", 1.0),
        (3, "a", "finish", 1.0),
        # key "b": step1 @4, step2 @5, until @6 (after completion) -> stands
        (4, "b", "start", 1.0),
        (5, "b", "finish", 1.0),
        (6, "b", "abort", 1.0),
        # key "c": no until -> stands
        (7, "c", "start", 1.0),
        (8, "c", "finish", 1.0),
    ]
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, k, t, v, base + dt.timedelta(seconds=i))
            for (i, k, t, v) in rows
        ],
        "event_id long, user string, event_type string, value double, ts timestamp",
    )
    steps = [
        {"term": {"event_type": "start"}},
        {"term": {"event_type": "finish"}},
    ]
    out = eql_sequence(
        ev, steps, by="user",
        until={"term": {"event_type": "abort"}},
    ).collect()
    assert sorted(r["user"] for r in out) == ["b", "c"]
    # without until all three complete
    out2 = eql_sequence(ev, steps, by="user").collect()
    assert sorted(r["user"] for r in out2) == ["a", "b", "c"]


def test_sample_requires_all_filters_and_picks_earliest(spark):
    """EQL sample: keys missing any filter drop; the deterministic
    sample is the earliest (ts, id) per (key, filter); order between
    filters is NOT constrained (error before view still matches)."""
    import datetime as dt

    from monstache_spark.operators.eql import eql_sample

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", "view"), (2, "a", "error"), (5, "a", "view"),
        (3, "b", "view"),                      # no error -> drops
        (4, "c", "error"), (6, "c", "view"),   # reversed order -> still matches
    ]
    ev = spark.createDataFrame(
        [(i, k, t, base + dt.timedelta(seconds=i)) for i, k, t in rows],
        "event_id long, user string, event_type string, ts timestamp",
    )
    out = eql_sample(
        ev,
        [{"term": {"event_type": "view"}}, {"term": {"event_type": "error"}}],
        by="user",
    ).collect()
    got = sorted((r["user"], r["id1"], r["id2"]) for r in out)
    assert got == [("a", 1, 2), ("c", 6, 4)]

    import pytest as _pt

    with _pt.raises(ValueError, match="at least 2"):
        eql_sample(ev, [{"term": {"event_type": "view"}}], by="user")


def test_sequence_until_kills_at_completion_instant(spark):
    """Self-review r10 pass 2 #1: an until-event coinciding with the
    COMPLETING event processes against still-in-flight state and
    kills the sequence; one coinciding with the FIRST event does
    not."""
    import datetime as dt

    from monstache_spark.operators.eql import eql_sequence

    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            # key d: the finishing event itself matches until -> killed
            (9, "d", "start", base + dt.timedelta(seconds=9)),
            (10, "d", "finish", base + dt.timedelta(seconds=10)),
            # key e: until matches the STARTING event only -> stands
            (11, "e", "start", base + dt.timedelta(seconds=11)),
            (12, "e", "finish", base + dt.timedelta(seconds=12)),
        ],
        "event_id long, user string, event_type string, ts timestamp",
    )
    steps = [
        {"term": {"event_type": "start"}},
        {"term": {"event_type": "finish"}},
    ]
    killed = eql_sequence(
        ev, steps, by="user", until={"term": {"event_type": "finish"}}
    ).collect()
    assert sorted(r["user"] for r in killed) == []
    stands = eql_sequence(
        ev, steps, by="user", until={"term": {"event_type": "start"}}
    ).collect()
    assert sorted(r["user"] for r in stands) == ["d", "e"]
