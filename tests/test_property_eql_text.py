"""Property tests for the TEXT EQL parser (operators/eql.eql): for
arbitrary generated sequence queries — categories, value/string
conditions (including literals containing the parser's own keywords),
per-step by fields, runs, missing steps, until — the parsed structures
handed to eql_sequence must equal the directly-constructed ones.  The
operators are monkeypatched to capture their arguments, so no Spark
session runs per example (the execution semantics are covered by the
unit/gate tests; THIS guards the parsing layer, where the round-10
self-review found its bugs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import monstache_spark.operators.eql as eqlmod

_cat = st.sampled_from(["view", "click", "error", "proc_start"])
# string literals that contain the parser's OWN tokens — the
# adversarial domain for literal-awareness
_tricky = st.sampled_from(
    ["plain", "x == null", "sleep until x", "a runs b",
     "LIKE (this)", "regex time", "it's quoted"]
)
_num_cond = st.integers(min_value=0, max_value=99).map(
    lambda n: (f"value > {n}", f"(value > {n})")
)
_str_cond = _tricky.map(
    lambda s: (
        f'name == "{s}"',
        "(name = '" + s.replace("'", "''") + "')",
    )
)
_cond = st.one_of(_num_cond, _str_cond)


def _expected_pred(cat: str, cond_sql: str) -> str:
    return f"(event_type = '{cat}') AND {cond_sql}"


@st.composite
def _sequences(draw):
    n = draw(st.integers(min_value=2, max_value=4))
    use_step_by = draw(st.booleans())
    use_until = draw(st.booleans()) and not use_step_by
    use_missing = draw(st.booleans()) and not use_step_by
    parts, expected = [], []
    for i in range(n):
        cat = draw(_cat)
        cond_txt, cond_sql = draw(_cond)
        txt = f"[{cat} where {cond_txt}]"
        pred = _expected_pred(cat, cond_sql)
        step = pred
        if use_step_by:
            txt += " by value"
            step = {"query": pred, "by": ["value"]}
        runs = draw(st.integers(min_value=1, max_value=3))
        if not use_step_by and runs > 1 and draw(st.booleans()):
            txt += f" with runs={runs}"
            step = {"query": pred, "runs": runs}
        parts.append(txt)
        expected.append(step)
        if use_missing and i < n - 1 and draw(st.booleans()):
            mcat = draw(_cat)
            mtxt, msql = draw(_cond)
            parts.append(f"![{mcat} where {mtxt}]")
            expected.append({"missing": _expected_pred(mcat, msql)})
    until_txt, until_expected = "", None
    if use_until:
        ucat = draw(_cat)
        utxt, usql = draw(_cond)
        until_txt = f" until [{ucat} where {utxt}]"
        until_expected = _expected_pred(ucat, usql)
    span = draw(st.sampled_from(["", " with maxspan=2h", " with maxspan=30m"]))
    span_s = {"": None, " with maxspan=2h": 7200,
              " with maxspan=30m": 1800}[span]
    text = "sequence by user" + span + " " + " ".join(parts) + until_txt
    return text, expected, until_expected, span_s


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_sequences())
def test_parsed_sequence_equals_direct_construction(case):
    text, expected_steps, expected_until, expected_span = case
    captured = {}

    def fake_sequence(events, steps, by, ts_col, id_col, maxspan_s,
                      analyzer, until):
        captured.update(steps=steps, by=by, maxspan_s=maxspan_s,
                        until=until)
        return "SENTINEL"

    real = eqlmod.eql_sequence
    eqlmod.eql_sequence = fake_sequence
    try:
        out = eqlmod.eql(text, events=None, category_col="event_type")
    finally:
        eqlmod.eql_sequence = real
    assert out == "SENTINEL"
    assert captured["steps"] == expected_steps
    assert captured["by"] == "user"
    assert captured["maxspan_s"] == expected_span
    assert captured["until"] == expected_until


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_cat, _cond)
def test_parsed_event_query_predicate(cat, cond):
    cond_txt, cond_sql = cond
    captured = {}

    class _FakeEvents:
        def filter(self, pred):
            captured["pred"] = pred
            return "FILTERED"

    # intercept below the filter: _step_pred receives the SQL string
    real = eqlmod._step_pred
    eqlmod._step_pred = lambda q, analyzer=None: q
    try:
        out = eqlmod.eql(
            f"{cat} where {cond_txt}", _FakeEvents(),
            category_col="event_type",
        )
    finally:
        eqlmod._step_pred = real
    assert out == "FILTERED"
    assert captured["pred"] == _expected_pred(cat, cond_sql)


@st.composite
def _joins(draw):
    n = draw(st.integers(min_value=2, max_value=4))
    parts, expected = [], []
    for _ in range(n):
        cat = draw(_cat)
        cond_txt, cond_sql = draw(_cond)
        parts.append(f"[{cat} where {cond_txt}]")
        expected.append(_expected_pred(cat, cond_sql))
    until_txt, until_expected = "", None
    if draw(st.booleans()):
        ucat = draw(_cat)
        utxt, usql = draw(_cond)
        until_txt = f" until [{ucat} where {utxt}]"
        until_expected = _expected_pred(ucat, usql)
    text = "join by user " + " ".join(parts) + until_txt
    return text, expected, until_expected


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_joins())
def test_parsed_join_equals_direct_construction(case):
    text, expected_filters, expected_until = case
    captured = {}

    def fake_join(events, filters, by, until, ts_col, id_col, analyzer):
        captured.update(filters=filters, by=by, until=until)
        return "SENTINEL"

    real = eqlmod.eql_join
    eqlmod.eql_join = fake_join
    try:
        out = eqlmod.eql(text, events=None, category_col="event_type")
    finally:
        eqlmod.eql_join = real
    assert out == "SENTINEL"
    assert captured["filters"] == expected_filters
    assert captured["by"] == "user"
    assert captured["until"] == expected_until
