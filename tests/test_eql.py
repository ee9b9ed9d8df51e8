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
    with pytest.raises(ValueError, match="2 positive steps"):
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


def test_runs_expansion_semantics(spark):
    """`[a] with runs=2 [b]` expands to a→a→b (the public EQL
    equivalence): a key with only ONE `a` before its `b` cannot
    complete; consecutive picks stay head-greedy."""
    rows = [
        (1, _t(0), "u1", "a"),
        (2, _t(1), "u1", "a"),
        (3, _t(2), "u1", "b"),
        (4, _t(0), "u2", "a"),   # only one a: cannot satisfy runs=2
        (5, _t(1), "u2", "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )
    out = eql_sequence(
        ev,
        [{"query": {"term": {"kind": "a"}}, "runs": 2},
         {"term": {"kind": "b"}}],
        by="user", maxspan_s=3600,
    ).collect()
    assert [(r["user"], r["id1"], r["id2"], r["id3"]) for r in out] \
        == [("u1", 1, 2, 3)]


def test_runs_validation():
    from monstache_spark.operators.eql import _expand_runs

    assert _expand_runs(
        [{"query": {"term": {"k": "a"}}, "runs": 3}]
    ) == [{"term": {"k": "a"}}] * 3
    with pytest.raises(ValueError, match="runs must be >= 1"):
        _expand_runs([{"query": {}, "runs": 0}])
    with pytest.raises(ValueError, match="runs step must be"):
        _expand_runs([{"term": {"k": "a"}, "runs": 2}])


def test_eql_events_head_tail_pipes(spark):
    """head keeps the N OLDEST, tail the N NEWEST matching events
    under the packed (ts, id) order — ties at equal timestamps break
    by event id."""
    from monstache_spark.operators.eql import eql_events

    rows = [
        (1, _t(0), "u", "x"),
        (3, _t(1), "u", "x"),
        (2, _t(1), "u", "x"),   # same ts as id 3: id orders them
        (4, _t(2), "u", "x"),
        (5, _t(3), "u", "y"),   # filtered out
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )
    q = {"term": {"kind": "x"}}
    head = eql_events(ev, q, head=3).select("event_id").collect()
    assert sorted(r[0] for r in head) == [1, 2, 3]
    tail = eql_events(ev, q, tail=3).select("event_id").collect()
    assert sorted(r[0] for r in tail) == [2, 3, 4]
    with pytest.raises(ValueError, match="ONE of head/tail"):
        eql_events(ev, q, head=1, tail=1)


def test_missing_event_between(spark):
    """`[a] ![x] [b]`: a chain with an x strictly between its a and b
    dies; one without stands; an x OUTSIDE the pair (before a / after
    b) is irrelevant."""
    rows = [
        (1, _t(0), "u1", "a"),
        (2, _t(1), "u1", "x"),   # between: kills u1
        (3, _t(2), "u1", "b"),
        (4, _t(0), "u2", "a"),
        (5, _t(2), "u2", "b"),
        (6, _t(3), "u2", "x"),   # after b: harmless
        (7, _t(0, 1), "u3", "x"),  # hmm before a? no — after a at t=0
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )
    out = eql_sequence(
        ev,
        [{"term": {"kind": "a"}},
         {"missing": {"term": {"kind": "x"}}},
         {"term": {"kind": "b"}}],
        by="user", maxspan_s=3600,
    ).collect()
    assert sorted(r["user"] for r in out) == ["u2"]


def test_missing_event_boundaries(spark):
    """Leading `![x] [a] [b]` and trailing `[a] [b] ![x]` window by
    maxspan; both REQUIRE maxspan; adjacent missing steps and
    all-missing sequences raise."""
    rows = [
        (1, _t(0), "u1", "x"),   # 60 s before u1's a: kills leading
        (2, _t(1), "u1", "a"),
        (3, _t(2), "u1", "b"),
        (4, _t(1), "u2", "a"),
        (5, _t(2), "u2", "b"),
        (6, _t(30), "u2", "x"),  # 28 min after b: inside 30-min span
        (7, _t(1), "u3", "a"),
        (8, _t(2), "u3", "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )
    steps = [{"term": {"kind": "a"}}, {"term": {"kind": "b"}}]
    lead = eql_sequence(
        ev, [{"missing": {"term": {"kind": "x"}}}] + steps,
        by="user", maxspan_s=1800,
    ).collect()
    assert sorted(r["user"] for r in lead) == ["u2", "u3"]
    trail = eql_sequence(
        ev, steps + [{"missing": {"term": {"kind": "x"}}}],
        by="user", maxspan_s=1800,
    ).collect()
    assert sorted(r["user"] for r in trail) == ["u1", "u3"]
    with pytest.raises(ValueError, match="needs maxspan"):
        eql_sequence(
            ev, steps + [{"missing": {"term": {"kind": "x"}}}],
            by="user",
        )
    with pytest.raises(ValueError, match="adjacent missing"):
        eql_sequence(
            ev,
            [steps[0], {"missing": {"term": {"kind": "x"}}},
             {"missing": {"term": {"kind": "y"}}}, steps[1]],
            by="user", maxspan_s=1800,
        )
    with pytest.raises(ValueError, match="2 positive steps"):
        eql_sequence(
            ev, [steps[0], {"missing": {"term": {"kind": "x"}}}],
            by="user", maxspan_s=1800,
        )


def test_per_step_by_fields(spark):
    """`sequence by user [a] by f1 [b] by f2`: the key tuple
    (user, f1) on step 1 must equal (user, f2) on step 2 — a pair
    with matching user but different step fields does not chain."""
    rows = [
        # u1: a(f1=7) then b(f2=7) -> chains
        (1, _t(0), "u1", "a", 7, 0),
        (2, _t(1), "u1", "b", 0, 7),
        # u2: a(f1=3) then b(f2=4) -> f mismatch, no chain
        (3, _t(0), "u2", "a", 3, 0),
        (4, _t(1), "u2", "b", 0, 4),
        # u3: matching f but different user from u1 -> own chain only
        (5, _t(0), "u3", "a", 9, 0),
        (6, _t(1), "u3", "b", 0, 9),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user string, kind string,"
        " f1 long, f2 long",
    )
    out = eql_sequence(
        ev,
        [{"query": {"term": {"kind": "a"}}, "by": "f1"},
         {"query": {"term": {"kind": "b"}}, "by": "f2"}],
        by="user", maxspan_s=3600,
    ).collect()
    assert sorted((r["user"], r["id1"], r["id2"]) for r in out) \
        == [("u1", 1, 2), ("u3", 5, 6)]
    with pytest.raises(ValueError, match="same number of per-step"):
        eql_sequence(
            ev,
            [{"query": {"term": {"kind": "a"}}, "by": "f1"},
             {"term": {"kind": "b"}}],
            by="user",
        )
    with pytest.raises(ValueError, match="until/missing"):
        eql_sequence(
            ev,
            [{"query": {"term": {"kind": "a"}}, "by": "f1"},
             {"query": {"term": {"kind": "b"}}, "by": "f2"}],
            by="user", until={"term": {"kind": "x"}},
        )


def test_text_eql_event_query_and_pipes(spark):
    """The text EQL endpoint: `<category> where <cond>` with the
    head/tail pipes, `any` category, == null spelling, LIKE
    wildcards, and the regex spelling."""
    from monstache_spark.operators.eql import eql

    rows = [
        (1, _t(0), "u1", "login", "alice"),
        (2, _t(1), "u1", "login", None),
        (3, _t(2), "u2", "logout", "bob"),
        (4, _t(3), "u3", "login", "alphonse"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user string, event_type string,"
        " name string",
    )
    out = eql('login where name == "alice"', ev,
              category_col="event_type").collect()
    assert [r["event_id"] for r in out] == [1]
    out = eql("any where name == null", ev,
              category_col="event_type").collect()
    assert [r["event_id"] for r in out] == [2]
    out = eql('login where name like "al*" | head 1', ev,
              category_col="event_type").collect()
    assert [r["event_id"] for r in out] == [1]
    out = eql('any where name regex "a.*e" | tail 1', ev,
              category_col="event_type").collect()
    assert [r["event_id"] for r in out] == [4]
    with pytest.raises(ValueError, match="unsupported pipe"):
        eql("any where true | count", ev)


def test_text_eql_sequence_full_grammar(spark):
    """sequence with global by, maxspan, per-step runs, a missing
    step, until, and a head pipe — the whole grammar in one query,
    equal to the dict-API result."""
    from monstache_spark.operators.eql import eql, eql_sequence

    rows = [
        (1, _t(0), "u1", "a", 9.0),
        (2, _t(1), "u1", "a", 9.0),
        (3, _t(2), "u1", "b", 1.0),
        (4, _t(0), "u2", "a", 9.0),
        (5, _t(1), "u2", "a", 9.0),
        (6, _t(1, 30), "u2", "x", 0.0),   # between: kills u2
        (7, _t(2), "u2", "b", 1.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user string, event_type string,"
        " value double",
    )
    text = (
        "sequence by user with maxspan=1h"
        ' [a where value > 5] with runs=2'
        " ![x where true]"
        " [b where true]"
        " | head 10"
    )
    got = eql(text, ev, category_col="event_type").collect()
    want = eql_sequence(
        ev,
        [{"query": "(event_type = 'a') AND (value > 5)", "runs": 2},
         {"missing": "(event_type = 'x') AND (true)"},
         "(event_type = 'b') AND (true)"],
        by="user", maxspan_s=3600,
    ).collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)
    assert [r["user"] for r in got] == ["u1"]

    until_out = eql(
        "sequence by user with maxspan=1h [a where true] [b where true]"
        " until [x where true]",
        ev, category_col="event_type",
    ).collect()
    assert sorted({r["user"] for r in until_out}) == ["u1"]


def test_text_eql_sample_and_errors(spark):
    from monstache_spark.operators.eql import eql

    rows = [
        (1, _t(0), "u1", "a"), (2, _t(1), "u1", "b"),
        (3, _t(0), "u2", "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, event_type string"
    )
    out = eql("sample by user [a where true] [b where true]", ev,
              category_col="event_type").collect()
    assert [r["user"] for r in out] == ["u1"]
    with pytest.raises(ValueError, match="needs `by"):
        eql("sequence [a where true] [b where true]", ev)
    with pytest.raises(ValueError, match="header modifier"):
        eql("sequence by user [a where true] with maxspan=1h [b where true]",
            ev)
    with pytest.raises(ValueError, match="expected .*category.* where"):
        eql("sequence by user [nonsense] [b where true]", ev)


def test_text_eql_review_fixes(spark):
    """Self-review r10 pass 2 over the text endpoint: literal-aware
    pre-rewrites, regex~ case-insensitivity, sequential pipes,
    runs-substring false trigger, quoted `until`, sample+until
    refusal."""
    from monstache_spark.operators.eql import eql

    rows = [
        (1, _t(0), "u1", "log", "x == null", 1),
        (2, _t(1), "u1", "log", "Alice", 2),
        (3, _t(2), "u1", "log", "other", 9),
        (4, _t(3), "u1", "log", "sleep until x", 1),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user string, event_type string,"
        " msg string, runs long",
    )
    # a string literal containing `== null` must match literally
    out = eql('any where msg == "x == null"', ev).collect()
    assert [r["event_id"] for r in out] == [1]
    # regex~ is case-INsensitive
    out = eql('any where msg regex~ "alice"', ev).collect()
    assert [r["event_id"] for r in out] == [2]
    out = eql('any where msg regex "alice"', ev).collect()
    assert out == []
    # pipes chain sequentially: last 2 of the first 3
    out = eql("any where true | head 3 | tail 2", ev).collect()
    assert sorted(r["event_id"] for r in out) == [2, 3]
    # a field named `runs` in a condition must not trip the runs
    # step-expansion check
    seq = eql(
        "sequence by user with maxspan=1h"
        " [log where runs > 3] [log where runs == 1]",
        ev,
    ).collect()
    assert [(r["id1"], r["id2"]) for r in seq] == [(3, 4)]
    # `until` inside a string literal is not the until clause
    out = eql('any where msg == "sleep until x"', ev).collect()
    assert [r["event_id"] for r in out] == [4]
    with pytest.raises(ValueError, match="not defined over sample"):
        eql("sample by user [log where true] [log where true]"
            " until [log where true]", ev)
    with pytest.raises(ValueError, match="unparsed text after the until"):
        eql("sequence by user [log where true] [log where true]"
            " until [log where true] by msg", ev)


def test_append_conditional_on_scalar(spark):
    from monstache_spark.operators.ingest import ingest_pipeline

    df = spark.createDataFrame(
        [(1, "old"), (2, "keep"), (3, None)], "id long, tag string"
    )
    out = ingest_pipeline(
        df, [{"append": {"field": "tag", "value": "new", "if": "id = 1"}}]
    )
    rows = {r["id"]: r["tag"] for r in out.collect()}
    assert rows[1] == ["old", "new"]
    assert rows[2] == ["keep"]          # coerced but untouched
    assert rows[3] is None              # null scalar stays null


def test_text_eql_duplicate_modifiers_refuse(spark):
    """Round-11 ADVICE: duplicated `by`/`with` modifiers used to be
    silently swallowed (the parser read the FIRST, the leftover sweep
    stripped ALL) — now each duplicate refuses loudly."""
    from monstache_spark.operators.eql import eql

    ev = spark.createDataFrame(
        [(1, _t(0), "u1", "x", "a")],
        "event_id long, ts timestamp, user string, msg string,"
        " event_type string",
    )
    with pytest.raises(ValueError, match="duplicated `by`"):
        eql("sequence by user by msg [a where true] [a where true]",
            ev, category_col="event_type")
    with pytest.raises(ValueError, match="duplicated `with maxspan`"):
        eql("sequence by user with maxspan=1h with maxspan=2h"
            " [a where true] [a where true]",
            ev, category_col="event_type")
    with pytest.raises(ValueError, match="duplicated `with runs`"):
        eql("sequence by user [a where true] with runs=2 with runs=3"
            " [a where true]",
            ev, category_col="event_type")
    # composite keys: global by + ONE per-step by on every step still
    # parses (the documented composite-key form)
    out = eql("sequence by user with maxspan=1h [a where true] by msg"
              " [a where true] by msg", ev, category_col="event_type")
    assert out.count() == 0


def test_eql_join_unordered_and_until(spark):
    """Legacy EQL `join`: unordered key correlation (a key matches
    with its filters in ANY order — the contrast with sequence), the
    earliest event per (key, filter) as the deterministic pick, and
    until expiring joins completed at-or-after the until event."""
    from monstache_spark.operators.eql import eql, eql_join

    rows = [
        # u1: b BEFORE a — sequence would reject, join matches
        (1, _t(0), "u1", "b"),
        (2, _t(1), "u1", "a"),
        (3, _t(2), "u1", "a"),   # later a: not the earliest pick
        # u2: a then b, but an until-event between them expires it
        (4, _t(0), "u2", "a"),
        (5, _t(1), "u2", "x"),
        (6, _t(2), "u2", "b"),
        # u3: only a — no join
        (7, _t(0), "u3", "a"),
        # u4: a, b complete BEFORE the until event — stands
        (8, _t(0), "u4", "a"),
        (9, _t(1), "u4", "b"),
        (10, _t(2), "u4", "x"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )
    out = eql_join(
        ev,
        [{"term": {"kind": "a"}}, {"term": {"kind": "b"}}],
        by="user",
        until={"term": {"kind": "x"}},
    ).collect()
    got = {(r["user"], r["id1"], r["id2"]) for r in out}
    assert got == {("u1", 2, 1), ("u4", 8, 9)}
    # no until: u2 matches too
    out2 = eql_join(
        ev, [{"term": {"kind": "a"}}, {"term": {"kind": "b"}}], by="user"
    ).collect()
    assert {r["user"] for r in out2} == {"u1", "u2", "u4"}
    # an until event EXACTLY at the completion position expires (the
    # sequence-until at-or-before contract carried over)
    ev2 = ev.union(spark.createDataFrame(
        [(9, _t(1), "u5", "a"), (11, _t(1), "u5", "b"),
         (12, _t(1), "u5", "x")],
        "event_id long, ts timestamp, user string, kind string",
    ))
    # u5: until id=12 > completion id=11 at same ts -> join stands
    out3 = eql_join(
        ev2, [{"term": {"kind": "a"}}, {"term": {"kind": "b"}}],
        by="user", until={"term": {"kind": "x"}},
    ).collect()
    assert {r["user"] for r in out3} == {"u1", "u4", "u5"}
    with pytest.raises(ValueError, match="at least 2"):
        eql_join(ev, [{"term": {"kind": "a"}}], by="user")

    # text form, with pipes ordering by completion position
    txt = eql(
        'join by user [any where kind == "a"] [any where kind == "b"]'
        ' until [any where kind == "x"] | head 1',
        ev, category_col="kind",
    ).collect()
    # completions: u1 at id2's pack (t=1), u4 at t=1 with larger id —
    # u1's completion (id 2 at t(1)) < u4's (id 9 at t(1))
    assert [r["user"] for r in txt] == ["u1"]
    with pytest.raises(ValueError, match="needs `by"):
        eql("join [a where true] [b where true]", ev, category_col="kind")
    with pytest.raises(ValueError, match="not defined over join"):
        eql("join by user with maxspan=1h [a where true] [b where true]",
            ev, category_col="kind")
    with pytest.raises(ValueError, match="join steps take no"):
        eql("join by user ![a where true] [b where true]",
            ev, category_col="kind")


def test_eql_join_without_until_equals_sample(spark):
    """join with no until is sample's unordered semantics exactly
    (same earliest-per-(key, filter) pick) — the documented
    relationship between the legacy command and its ES replacement."""
    from monstache_spark.operators.eql import eql_join, eql_sample

    rows = [
        (i, _t(i % 7, i % 13), f"u{i % 5}", ["a", "b", "c"][i % 3])
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user string, kind string"
    )
    filters = [{"term": {"kind": "a"}}, {"term": {"kind": "b"}},
               {"term": {"kind": "c"}}]
    j = {tuple(r) for r in eql_join(ev, filters, by="user").collect()}
    s = {tuple(r) for r in eql_sample(ev, filters, by="user").collect()}
    assert j == s and len(j) > 0


def test_scanner_escaped_backslash_closes_string():
    """ADVICE-r13 class fix: a string literal ending in an escaped
    backslash ("…\\\\") closes the string — the single look-behind
    treated the quote as escaped and mis-bracketed everything after
    it in all three eql scanners."""
    from monstache_spark.operators.eql import _split_outside

    # the comma AFTER the closed string must split
    assert _split_outside('a == "x\\\\", b == 2', ",") == (
        ['a == "x\\\\"', ' b == 2']
    )
    # a genuinely escaped quote must NOT close the string
    assert _split_outside('a == "x\\",y", b', ",") == (
        ['a == "x\\",y"', ' b']
    )
