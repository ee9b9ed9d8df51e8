"""ES|QL translator (operators/esql.py): command coverage, expression
dialect translation, wildcards, sort/null semantics, refusals."""

from __future__ import annotations

import pytest

from monstache_spark.operators.esql import _tr_expr, esql


def test_expression_dialect_translation():
    assert _tr_expr('a == "x"') == "a = 'x'"
    assert _tr_expr("a != 3 AND b >= 2") == "a != 3 AND b >= 2"
    # == inside a string literal survives; embedded quotes escape
    assert _tr_expr('a == "x == y" OR c == "it\'s"') == (
        "a = 'x == y' OR c = 'it''s'"
    )
    assert _tr_expr("a <= 1") == "a <= 1"


@pytest.fixture(scope="module")
def t(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, ["x", "y"]), (2, "a", 20.0, ["z"]),
         (3, "b", None, [])],
        "id long, k string, v double, tags array<string>",
    )


def test_pipeline_where_eval_stats_sort_limit(t):
    out = esql(
        'FROM t | WHERE v IS NOT NULL | EVAL dv = CAST(v AS DECIMAL(19,4)) * 2'
        ' | STATS n = COUNT(*), total = CAST(SUM(dv) AS DOUBLE) BY k'
        ' | SORT total DESC | LIMIT 1',
        {"t": t},
    ).collect()
    assert [tuple(r) for r in out] == [("a", 2, 60.0)]  # group keys first


def test_keep_drop_rename_wildcards(t):
    out = esql("FROM t | KEEP k, v | RENAME v AS val", {"t": t})
    assert out.columns == ["k", "val"]
    out = esql("FROM t | DROP ta*", {"t": t})
    assert out.columns == ["id", "k", "v"]
    with pytest.raises(ValueError, match="unknown column"):
        esql("FROM t | KEEP nope", {"t": t})


def test_row_and_mv_expand(t, spark):
    out = esql('ROW a = 1, b = "x"', {}, spark).collect()
    assert [tuple(r) for r in out] == [(1, "x")]
    out = esql("FROM t | MV_EXPAND tags | STATS n = COUNT(*)", {"t": t})
    # explode_outer: the empty-array row survives as one null row —
    # ES|QL MV_EXPAND keeps rows whose multi-value is null/empty
    assert out.collect()[0]["n"] == 4


def test_sort_null_placement(t):
    out = esql("FROM t | SORT v DESC NULLS LAST | KEEP id", {"t": t}).collect()
    assert [r["id"] for r in out] == [2, 1, 3]
    out = esql("FROM t | SORT v ASC NULLS FIRST | KEEP id", {"t": t}).collect()
    assert [r["id"] for r in out] == [3, 1, 2]


def test_refusals(t):
    with pytest.raises(ValueError, match="unsupported ES\\|QL command"):
        esql("FROM t | EXPLAIN", {"t": t})
    with pytest.raises(ValueError, match="must start with FROM"):
        esql("WHERE v > 1", {"t": t})
    with pytest.raises(ValueError, match="unknown table"):
        esql("FROM nope | LIMIT 1", {"t": t})


def test_enrich_lookup_join_dissect(spark, t):
    policy = spark.createDataFrame(
        [("a", "Alpha", 1), ("b", "Beta", 2)], "code string, label string, tier long"
    )
    out = esql(
        "FROM t | ENRICH names ON k WITH label | KEEP id, k, label",
        {"t": t}, enrich_policies={"names": (policy, "code")},
    ).collect()
    got = {r["id"]: r["label"] for r in out}
    assert got == {1: "Alpha", 2: "Alpha", 3: "Beta"}

    lk = spark.createDataFrame([("a", 100)], "k string, bonus long")
    out = esql("FROM t | LOOKUP JOIN lk ON k | KEEP id, bonus", {"t": t, "lk": lk})
    got = {r["id"]: r["bonus"] for r in out.collect()}
    assert got == {1: 100, 2: 100, 3: None}

    logs = spark.createDataFrame(
        [(1, "GET /a 200"), (2, "POST /b 503"), (3, "garbage")],
        "id long, line string",
    )
    out = esql(
        'FROM logs | DISSECT line "%{verb} %{path} %{status}" | KEEP id, verb, status',
        {"logs": logs},
    ).collect()
    got = {r["id"]: (r["verb"], r["status"]) for r in out}
    assert got[1] == ("GET", "200") and got[2] == ("POST", "503")
    assert got[3] == (None, None)  # non-matching line -> nulls

    with pytest.raises(ValueError, match="unknown enrich policy"):
        esql("FROM t | ENRICH nope ON k", {"t": t})
    with pytest.raises(ValueError, match="no %\\{key\\}"):
        esql('FROM logs | DISSECT line "static"', {"logs": logs})
    # GROK (supported since round 10) — the same log lines through
    # the built-in pattern library, typed status
    out = esql(
        'FROM logs | GROK line "%{WORD:verb} %{NOTSPACE:path}'
        ' %{INT:status:int}" | KEEP id, verb, status',
        {"logs": logs},
    ).collect()
    got = {r["id"]: (r["verb"], r["status"]) for r in out}
    assert got[1] == ("GET", 200) and got[2] == ("POST", 503)
    assert got[3] == (None, None)


def test_stats_per_agg_where_filter(t):
    out = esql(
        'FROM t | STATS n_a = COUNT(*) WHERE k == "a",'
        ' hi = MAX(v) WHERE v < 15, n = COUNT(*)',
        {"t": t},
    ).collect()[0]
    assert (out["n_a"], out["hi"], out["n"]) == (2, 10.0, 3)


def test_like_wildcard_translation(t, spark):
    logs = spark.createDataFrame(
        [(1, "alpha_x"), (2, "alphax"), (3, "beta")], "id long, s string"
    )
    # ES|QL * -> SQL %, ? -> _, and a literal underscore stays literal
    out = esql('FROM logs | WHERE s LIKE "alpha*"', {"logs": logs}).collect()
    assert {r["id"] for r in out} == {1, 2}
    out = esql('FROM logs | WHERE s LIKE "alpha_?"', {"logs": logs}).collect()
    assert {r["id"] for r in out} == {1}  # literal _ then one wildcard char
    out = esql('FROM logs | WHERE s LIKE "?eta"', {"logs": logs}).collect()
    assert {r["id"] for r in out} == {3}


def test_stats_keywords_inside_string_literals(t):
    # BY / WHERE inside string literals must not split the clause
    out = esql(
        'FROM t | EVAL note = "WHERE it failed BY design"'
        ' | STATS n = COUNT(*) WHERE note == "WHERE it failed BY design"',
        {"t": t},
    ).collect()[0]
    assert out["n"] == 3


def test_dissect_key_shadowing_source_column(spark):
    logs = spark.createDataFrame(
        [(1, "GET /a"), (2, "POST /b")], "id long, line string"
    )
    # a capture key named like the source column must not corrupt
    # later captures
    out = esql(
        'FROM logs | DISSECT line "%{line} %{path}" | KEEP id, line, path',
        {"logs": logs},
    ).collect()
    got = {r["id"]: (r["line"], r["path"]) for r in out}
    assert got == {1: ("GET", "/a"), 2: ("POST", "/b")}


def test_esql_function_name_mapping(t, spark):
    out = esql(
        "FROM t | EVAL n = MV_COUNT(tags), mn = MV_MIN(tags),"
        " s = TO_STRING(id), d = TO_DOUBLE(id)"
        " | KEEP id, n, mn, s, d",
        {"t": t},
    ).collect()
    got = {r["id"]: (r["n"], r["mn"], r["s"], r["d"]) for r in out}
    assert got[1] == (2, "x", "1", 1.0)
    assert got[3] == (0, None, "3", 3.0)  # empty array: count 0, min null
    nums = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None)], "id long, v array<double>"
    )
    out = esql(
        "FROM nums | EVAL s = MV_SUM(v), a = MV_AVG(v) | KEEP id, s, a",
        {"nums": nums},
    ).collect()
    got = {r["id"]: (r["s"], r["a"]) for r in out}
    assert got[1] == (6.0, 2.0)
    assert got[2] == (None, None)  # null multi-value stays null
    # nested rewrite: TO_LONG(MV_COUNT(tags)) resolves inner-first
    out = esql(
        "FROM t | EVAL c = TO_LONG(MV_COUNT(tags)) | STATS m = MAX(c)",
        {"t": t},
    ).collect()[0]
    assert out["m"] == 2


def test_change_point_command(spark):
    rows = [(i, 10.0 if i <= 5 else 50.0) for i in range(1, 11)]
    series = spark.createDataFrame(rows, "k long, v double")
    out = esql("FROM series | CHANGE_POINT v ON k", {"series": series}).collect()
    assert len(out) == 1
    r = out[0]
    # step change detected at the last low point (k=5)
    assert r["change_type"] == "step_change" and r["key"] == 5
    assert r["mean_left"] == 10.0 and r["mean_right"] == 50.0
    with pytest.raises(ValueError, match="CHANGE_POINT"):
        esql("FROM series | CHANGE_POINT", {"series": series})


def test_from_multi_index_unions(spark):
    """ES|QL `FROM a, b` unions the named indices; a column present in
    only one index null-fills (sparse multi-index mapping)."""
    a = spark.createDataFrame([(1, "x")], "id long, k string")
    b = spark.createDataFrame([(2, "y", 9.0)], "id long, k string, v double")
    out = esql("FROM a, b | SORT id ASC", {"a": a, "b": b}).collect()
    assert [(r["id"], r["k"], r["v"]) for r in out] == [
        (1, "x", None),
        (2, "y", 9.0),
    ]
    with pytest.raises(ValueError, match="unknown table"):
        esql("FROM a, missing", {"a": a})


def test_fn_rewrite_braces_in_argument(spark):
    """A brace character inside a rewritten function's argument must
    pass through literally — str.format on the template would raise
    KeyError/IndexError on '{' / '}'."""
    t = spark.createDataFrame([(1, "a{b"), (2, "cd")], "id long, s string")
    out = esql(
        'FROM t | EVAL m = TO_STRING("{x}"), n = MV_COUNT(split(s, "d"))'
        " | KEEP id, m, n",
        {"t": t},
    ).collect()
    got = {r["id"]: (r["m"], r["n"]) for r in out}
    assert got == {1: ("{x}", 1), 2: ("{x}", 2)}


def test_inlinestats_appends_group_stats(spark):
    """INLINESTATS keeps every row and appends the group aggregate —
    one window exchange, no collapse; per-agg WHERE rewrites to a
    conditional aggregate (FILTER is invalid on window functions)."""
    t = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 30.0), (3, "b", 5.0), (4, "b", None)],
        "id long, k string, v double",
    )
    out = esql(
        "FROM t | INLINESTATS n = COUNT(v), total = SUM(CAST(v AS"
        " DECIMAL(19,4))) BY k | EVAL total_d = CAST(total AS DOUBLE)"
        " | KEEP id, k, n, total_d | SORT id ASC",
        {"t": t},
    ).collect()
    got = [(r["id"], r["n"], r["total_d"]) for r in out]
    assert got == [(1, 2, 40.0), (2, 2, 40.0), (3, 1, 5.0), (4, 1, 5.0)]
    # per-aggregate WHERE + no BY (global window)
    out2 = esql(
        "FROM t | INLINESTATS big = COUNT(*) WHERE v >= 10 | KEEP id, big"
        " | SORT id ASC",
        {"t": t},
    ).collect()
    assert [(r["id"], r["big"]) for r in out2] == [
        (1, 2), (2, 2), (3, 2), (4, 2),
    ]


def test_inlinestats_aggregates_resolve_against_input(spark):
    """A later aggregate referencing a column an earlier aggregate
    shadows must read the INPUT column (ES|QL computes all aggs over
    the input frame) — sequential withColumn would read the appended
    window value."""
    t = spark.createDataFrame(
        [(1, "a", 2), (2, "a", 3)], "id long, k string, n long"
    )
    out = esql(
        "FROM t | INLINESTATS n = COUNT(*), s = SUM(n) BY k"
        " | KEEP id, n, s | SORT id ASC",
        {"t": t},
    ).collect()
    # s sums the ORIGINAL n column (2+3=5), not the appended count
    assert [(r["n"], r["s"]) for r in out] == [(2, 5), (2, 5)]


def test_bucket_time_spans(spark):
    """BUCKET(col, N unit) floors to exact epoch-microsecond bucket
    edges; quoted spans and plural units parse; the numeric 4-arg
    form raises."""
    import datetime as _dt

    t = spark.createDataFrame(
        [
            (1, _dt.datetime(2024, 1, 1, 0, 59)),
            (2, _dt.datetime(2024, 1, 1, 1, 1)),
            (3, _dt.datetime(2024, 1, 1, 1, 59)),
        ],
        "id long, ts timestamp",
    )
    out = esql(
        'FROM t | EVAL b = BUCKET(ts, 1 hour) | STATS n = COUNT(*) BY b'
        " | SORT b ASC",
        {"t": t},
    ).collect()
    assert [(r["b"].hour, r["n"]) for r in out] == [(0, 1), (1, 2)]
    out2 = esql(
        'FROM t | EVAL b = BUCKET(ts, "30 minutes") | STATS n = COUNT(*) BY b'
        " | SORT b ASC",
        {"t": t},
    ).collect()
    assert [r["n"] for r in out2] == [1, 1, 1]
    with pytest.raises(ValueError, match="BUCKET"):
        esql("FROM t | EVAL b = BUCKET(id, 20, 0, 100)", {"t": t})
    with pytest.raises(ValueError, match="span"):
        esql("FROM t | EVAL b = BUCKET(ts, 2 fortnight)", {"t": t})


def test_sample_deterministic_and_stats_by_expr(spark):
    """SAMPLE p keeps the keyed-hash subset (reproducible across runs
    and partitionings, S24 contract); STATS BY accepts named
    expression keys."""
    import datetime as _dt

    t = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id long, v double"
    )
    a = {r["id"] for r in esql("FROM t | SAMPLE 0.3", {"t": t}).collect()}
    b = {
        r["id"]
        for r in esql(
            "FROM t | SAMPLE 0.3", {"t": t.repartition(7)}
        ).collect()
    }
    assert a == b and 200 < len(a) < 400  # ~30%, exactly reproducible
    assert esql("FROM t | SAMPLE 1", {"t": t}).count() == 1000
    with pytest.raises(ValueError, match="probability"):
        esql("FROM t | SAMPLE 1.5", {"t": t})

    ev = spark.createDataFrame(
        [
            (1, _dt.datetime(2024, 1, 1, 3), "a"),
            (2, _dt.datetime(2024, 1, 1, 9), "a"),
            (3, _dt.datetime(2024, 1, 1, 9, 30), "b"),
        ],
        "id long, ts timestamp, k string",
    )
    out = esql(
        "FROM ev | STATS n = COUNT(*) BY b = BUCKET(ts, 6 hour), k"
        " | SORT b ASC, k ASC",
        {"ev": ev},
    ).collect()
    assert out[0].asDict().keys() == {"b", "k", "n"}
    assert [(r["b"].hour, r["k"], r["n"]) for r in out] == [
        (0, "a", 1), (6, "a", 1), (6, "b", 1),
    ]


def test_bucket_floor_pre_1970_and_literal_safety(spark):
    """BUCKET floors (pmod), never truncates toward zero — a pre-1970
    timestamp lands in the bucket BEFORE it; and a 'BUCKET(...)' inside
    a string literal is never rewritten."""
    import datetime as _dt

    t = spark.createDataFrame(
        [(1, _dt.datetime(1969, 12, 31, 18)), (2, _dt.datetime(1970, 1, 1, 6))],
        "id long, ts timestamp",
    )
    out = esql(
        "FROM t | EVAL b = BUCKET(ts, 12 hour) | KEEP id, b | SORT id ASC",
        {"t": t},
    ).collect()
    assert out[0]["b"] == _dt.datetime(1969, 12, 31, 12)  # floor, not 00:00
    assert out[1]["b"] == _dt.datetime(1970, 1, 1)
    lit = spark.createDataFrame(
        [(1, "BUCKET(ts, 1 hour)"), (2, "other")], "id long, s string"
    )
    got = esql(
        'FROM lit | WHERE s == "BUCKET(ts, 1 hour)" | KEEP id', {"lit": lit}
    ).collect()
    assert [r["id"] for r in got] == [1]


def test_sample_null_key_and_threshold_rounding(spark):
    """A null-keyed row keeps inclusion probability p (hash of a
    coalesced empty string, bucket 788822), and the threshold rounds
    rather than truncates (0.788823 * 1e6 must include bucket
    788822)."""
    t = spark.createDataFrame(
        [(None, 1.0), ("a", 2.0)], "k string, v double"
    )
    kept = {r["v"] for r in esql("FROM t | SAMPLE 0.788823", {"t": t}).collect()}
    assert 1.0 in kept  # null key -> bucket 788822 < 788823


def test_inlinestats_by_expression_key(spark):
    """INLINESTATS BY shares the STATS expression-key parser: a named
    BUCKET key partitions the window AND binds as a column."""
    import datetime as _dt

    t = spark.createDataFrame(
        [
            (1, _dt.datetime(2024, 1, 1, 1)),
            (2, _dt.datetime(2024, 1, 1, 2)),
            (3, _dt.datetime(2024, 1, 1, 13)),
        ],
        "id long, ts timestamp",
    )
    out = esql(
        "FROM t | INLINESTATS n = COUNT(*) BY b = BUCKET(ts, 12 hour)"
        " | KEEP id, b, n | SORT id ASC",
        {"t": t},
    ).collect()
    assert [(r["id"], r["b"].hour, r["n"]) for r in out] == [
        (1, 0, 2), (2, 0, 2), (3, 12, 1),
    ]


def test_find_calls_unbalanced_paren_raises():
    """ADVICE r9: a malformed call like 'BUCKET(ts, 1 hour' (no close
    paren) must be rejected, not silently rewritten to end-of-string."""
    from monstache_spark.operators.esql import _find_calls

    with pytest.raises(ValueError, match="unbalanced"):
        _find_calls("BUCKET(ts, 1 hour", "BUCKET")
    # balanced calls still resolve, including quoted parens inside
    spans = _find_calls('BUCKET(ts, ")" , 1)', "BUCKET")
    assert spans == [(0, 6, 18)]


def test_categorize_in_stats_by(spark):
    """ES|QL 8.18 CATEGORIZE() as a STATS BY key: digit-bearing
    tokens drop from the category, tokenless/null messages key to
    the NULL bucket, and the whole stage is one hash agg."""
    df = spark.createDataFrame(
        [
            ("error user 42 took 1.5",),
            ("error user 7 took 2.5",),
            ("ok done",),
            ("123 456",),
            (None,),
        ],
        "message string",
    )
    out = esql(
        "FROM logs | STATS n = COUNT(*) BY cat = CATEGORIZE(message)"
        " | SORT cat ASC",
        {"logs": df},
    ).collect()
    got = {r["cat"]: r["n"] for r in out}
    assert got == {None: 2, "error user took": 2, "ok done": 1}


def test_completion_rerank_refused(spark):
    """DIVERGENCES S31: the model-dependent ES|QL commands are
    refused with an actionable error, not silently misparsed.
    (FORK graduated to a real union-of-sub-pipes in round 13 —
    test_fork — since its semantics are declarative, not
    model-dependent; RRF stays refused on _score grounds.)"""
    df = spark.createDataFrame([(1,)], "x long")
    for cmd in ("COMPLETION prompt WITH inference_id",
                "RERANK \"q\" ON x WITH inference_id"):
        with pytest.raises(ValueError, match="model-dependent"):
            esql(f"FROM t | {cmd}", {"t": df})
    with pytest.raises(ValueError, match="_score"):
        esql("FROM t | RRF", {"t": df})


def test_match_in_where(spark):
    """ES|QL 8.18 MATCH(): OR semantics by default (any analyzed
    query token present), {"operator": "and"} requiring all; NULL
    fields never match; malformed calls raise."""
    df = spark.createDataFrame(
        [
            (1, "Merge Window join"),
            (2, "vector scan"),
            (3, "hash only"),
            (4, None),
        ],
        "id long, text string",
    )
    out = esql(
        'FROM t | WHERE MATCH(text, "merge vector") | KEEP id | SORT id',
        {"t": df},
    ).collect()
    assert [r["id"] for r in out] == [1, 2]

    both = esql(
        'FROM t | WHERE MATCH(text, "merge window", {"operator": "and"})'
        " | KEEP id",
        {"t": df},
    ).collect()
    assert [r["id"] for r in both] == [1]

    with pytest.raises(ValueError, match="string literal"):
        esql("FROM t | WHERE MATCH(text, other_col)", {"t": df})
    with pytest.raises(ValueError, match="MATCH takes"):
        esql("FROM t | WHERE MATCH(text)", {"t": df})


def test_qstr_in_where(spark):
    """ES|QL 8.18 QSTR(): full Lucene grammar through the
    query_string parser, AND-composable with SQL conjuncts;
    OR-composition raises with guidance."""
    df = spark.createDataFrame(
        [
            (1, "merge window join", "en", 10),
            (2, "vector scan", "de", 20),
            (3, "merging fast", "en", 30),
            (4, "hash only slow batch", "en", 40),
        ],
        "id long, text string, lang string, n long",
    )
    out = esql(
        'FROM t | WHERE QSTR("(merg* OR vector) AND -\\"slow batch\\"")'
        " | KEEP id | SORT id",
        {"t": df},
    ).collect()
    assert [r["id"] for r in out] == [1, 2, 3]

    # AND-composition with a pushable SQL conjunct
    both = esql(
        'FROM t | WHERE QSTR("merg*") AND n >= 30 | KEEP id',
        {"t": df},
    ).collect()
    assert [r["id"] for r in both] == [3]

    with pytest.raises(ValueError, match="top-level AND"):
        esql('FROM t | WHERE QSTR("x") OR n > 1', {"t": df})
    with pytest.raises(ValueError, match="string literal|QSTR takes"):
        esql("FROM t | WHERE QSTR(text)", {"t": df})


def test_qstr_mixed_and_or_precedence_refused(spark):
    """Self-review r10 #1: a QSTR clause with a top-level OR anywhere
    must raise — splitting on AND alone would silently rebind
    precedence (QSTR(..) AND x OR y computed as QSTR AND (x OR y))."""
    df = spark.createDataFrame(
        [(1, "merge fast", 10), (2, "hash slow", 99), (3, "merge slow", 99)],
        "id long, text string, n long",
    )
    with pytest.raises(ValueError, match="top-level AND"):
        esql('FROM t | WHERE QSTR("merge") AND n < 50 OR id == 2', {"t": df})


def test_match_options_map_with_multiple_keys(spark):
    """Self-review r10 #3: commas inside the options map are argument-
    internal ({} nesting protected), and an invalid operator value
    raises instead of silently falling back to OR (#7)."""
    df = spark.createDataFrame(
        [(1, "merge window"), (2, "merge only")], "id long, text string"
    )
    out = esql(
        'FROM t | WHERE MATCH(text, "merge window",'
        ' {"operator": "and", "boost": 2.5}) | KEEP id',
        {"t": df},
    ).collect()
    assert [r["id"] for r in out] == [1]
    with pytest.raises(ValueError, match="operator must be and/or"):
        esql(
            'FROM t | WHERE MATCH(text, "a b", {"operator": "adn"})',
            {"t": df},
        )


def test_to_ip_and_cidr_match(spark):
    """ES|QL TO_IP (NULL on malformed) and CIDR_MATCH (rewrite-time
    [lo, hi) integer range tests, OR across blocks, NULL ips never
    match; malformed blocks raise)."""
    df = spark.createDataFrame(
        [
            (1, "10.0.5.9"),
            (2, "192.168.1.4"),
            (3, "11.0.0.1"),
            (4, "999.1.1.1"),
            (5, None),
            (6, "10.255.255.255"),
        ],
        "id long, ip string",
    )
    out = esql(
        'FROM t | WHERE CIDR_MATCH(ip, "10.0.0.0/8", "192.168.0.0/16")'
        " | KEEP id | SORT id",
        {"t": df},
    ).collect()
    assert [r["id"] for r in out] == [1, 2, 6]

    v = esql("FROM t | EVAL v = TO_IP(ip) | KEEP id, v | SORT id", {"t": df}).collect()
    got = {r["id"]: r["v"] for r in v}
    assert got[4] is None and got[5] is None and got[1] == "10.0.5.9"

    with pytest.raises(ValueError, match="CIDR_MATCH block"):
        esql("FROM t | WHERE CIDR_MATCH(ip, blocks)", {"t": df})
    with pytest.raises(ValueError, match="invalid CIDR"):
        esql('FROM t | WHERE CIDR_MATCH(ip, "10.0.0.0/40")', {"t": df})
    with pytest.raises(ValueError, match="CIDR_MATCH takes"):
        esql("FROM t | WHERE CIDR_MATCH(ip)", {"t": df})


def test_mv_functions(spark):
    """MV_SORT / MV_DEDUPE / MV_FIRST / MV_LAST: codegen array
    expressions with NULL-safe edges (empty arrays -> NULL first/last
    via try_element_at; NULL input -> NULL through)."""
    df = spark.createDataFrame(
        [
            (1, ["b", "a", "b", "c"]),
            (2, []),
            (3, None),
        ],
        "id long, xs array<string>",
    )
    out = esql(
        "FROM t"
        " | EVAL s = MV_SORT(xs), d = MV_SORT(MV_DEDUPE(xs)),"
        " f = MV_FIRST(xs), l = MV_LAST(xs)"
        " | KEEP id, s, d, f, l | SORT id",
        {"t": df},
    ).collect()
    r1, r2, r3 = out
    assert r1["s"] == ["a", "b", "b", "c"] and r1["d"] == ["a", "b", "c"]
    assert (r1["f"], r1["l"]) == ("b", "c")
    assert r2["s"] == [] and r2["f"] is None and r2["l"] is None
    assert r3["s"] is None and r3["f"] is None


def test_date_diff_and_extract(spark):
    """DATE_DIFF: complete time units truncated toward zero (both
    directions); calendar units raise. DATE_EXTRACT: ISO day_of_week
    and friends; unsupported fields raise."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0),   # a Monday
             dt.datetime(2024, 1, 1, 2, 59, 59)),
            (2, dt.datetime(2024, 1, 7, 12, 0, 0),  # a Sunday
             dt.datetime(2024, 1, 7, 11, 0, 1)),
        ],
        "id long, a timestamp, b timestamp",
    )
    out = esql(
        "FROM t"
        ' | EVAL h = DATE_DIFF("hour", a, b), dow = DATE_EXTRACT("day_of_week", a),'
        ' s = DATE_DIFF("second", a, b)'
        " | KEEP id, h, dow, s | SORT id",
        {"t": df},
    ).collect()
    r1, r2 = out
    assert r1["h"] == 2 and r1["s"] == 10799 and r1["dow"] == 1
    assert r2["h"] == 0 and r2["s"] == -3599 and r2["dow"] == 7

    with pytest.raises(ValueError, match="DATE_DIFF unit"):
        esql('FROM t | EVAL x = DATE_DIFF("month", a, b)', {"t": df})
    with pytest.raises(ValueError, match="DATE_EXTRACT field"):
        esql('FROM t | EVAL x = DATE_EXTRACT("nano_of_day", a)', {"t": df})
    up = esql('FROM t | EVAL u = TO_UPPER("ab") | KEEP u | LIMIT 1', {"t": df}).collect()
    assert up[0]["u"] == "AB"


def test_agg_function_spellings(spark):
    """COUNT_DISTINCT / MEDIAN / PERCENTILE compile through STATS;
    PERCENTILE validates its literal; nested PERCENTILE raises."""
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (1, "b", 10.0)],
        "uid long, g string, v double",
    )
    out = esql(
        "FROM t | STATS n = COUNT_DISTINCT(uid), m = MEDIAN(v),"
        " p = PERCENTILE(v, 100) BY g | SORT g",
        {"t": df},
    ).collect()
    a, b = out
    assert (a["g"], a["n"], a["m"], a["p"]) == ("a", 3, 2.0, 3.0)
    assert (b["g"], b["n"], b["m"], b["p"]) == ("b", 1, 10.0, 10.0)

    with pytest.raises(ValueError, match="0..100"):
        esql("FROM t | STATS p = PERCENTILE(v, 101)", {"t": df})
    with pytest.raises(ValueError, match="0..100"):
        esql("FROM t | STATS p = PERCENTILE(v, x)", {"t": df})
    with pytest.raises(ValueError, match="nested PERCENTILE"):
        esql("FROM t | STATS p = PERCENTILE(PERCENTILE(v, 50), 90)", {"t": df})


def test_spark_spellings_pass_through_untouched(spark):
    """Self-review r10 pass 2 #3: lowercase Spark builtins with
    colliding names keep their native semantics — percentile's
    FRACTION arg is not rescaled, median stays unrounded-exact,
    date_diff keeps its 2-arg form."""
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    out = esql(
        "FROM t | STATS p = percentile(v, 0.5), m = median(v)",
        {"t": df},
    ).collect()
    assert out[0]["p"] == 2.0 and out[0]["m"] == 2.0
    # uppercase = ES|QL: p in 0..100
    up = esql("FROM t | STATS p = PERCENTILE(v, 50)", {"t": df}).collect()
    assert up[0]["p"] == 2.0
    with pytest.raises(ValueError, match="COUNT_DISTINCT takes"):
        esql("FROM t | STATS c = COUNT_DISTINCT(v, 1, 2)", {"t": df})
    # 2-arg precision form accepted, threshold ignored (exact per S3)
    two = esql("FROM t | STATS c = COUNT_DISTINCT(v, 3000)", {"t": df}).collect()
    assert two[0]["c"] == 3


def test_case_function_form(spark):
    """ES|QL CASE(cond, val, …, [default]) — the function-form
    conditional, including nesting and the no-default → NULL path."""
    df = spark.createDataFrame([(1,), (5,), (20,)], "v int")
    out = esql(
        'FROM t | EVAL tag = CASE(v > 10, "hi", v > 3, "mid", "lo"),'
        ' nd = CASE(v > 10, "hi")'
        " | SORT v ASC",
        {"t": df},
    ).collect()
    assert [r["tag"] for r in out] == ["lo", "mid", "hi"]
    assert [r["nd"] for r in out] == [None, None, "hi"]
    with pytest.raises(ValueError, match="CASE takes"):
        esql("FROM t | EVAL x = CASE(v)", {"t": df})


def test_split_literal_delimiter(spark):
    """ES|QL SPLIT splits on a LITERAL delimiter — a regex metachar
    like '.' is escaped at rewrite time (Spark's lowercase split
    would treat it as any-char); non-literal delimiters raise."""
    df = spark.createDataFrame([("a.b.c",)], "s string")
    out = esql(
        'FROM t | EVAL n = size(SPLIT(s, ".")), '
        'first = try_element_at(SPLIT(s, "."), 1)',
        {"t": df},
    ).collect()
    assert out[0]["n"] == 3 and out[0]["first"] == "a"
    with pytest.raises(ValueError, match="string literal"):
        esql("FROM t | EVAL x = SPLIT(s, s)", {"t": df})


def test_replace_is_regex_lowercase_stays_literal(spark):
    """Uppercase REPLACE is ES|QL's REGEX replace; lowercase replace
    keeps Spark's literal semantics (the collision contract)."""
    df = spark.createDataFrame([("a1b22c",)], "s string")
    out = esql(
        'FROM t | EVAL rx = REPLACE(s, "[0-9]+", "#"),'
        ' lit = replace(s, "1", "#")',
        {"t": df},
    ).collect()
    assert out[0]["rx"] == "a#b#c"
    assert out[0]["lit"] == "a#b22c"


def test_locate_and_affix_functions(spark):
    """LOCATE takes ES|QL's (string, substring [, start]) order —
    the REVERSE of Spark's locate; STARTS_WITH/ENDS_WITH map to the
    Spark builtins."""
    df = spark.createDataFrame([("hello world",)], "s string")
    out = esql(
        'FROM t | EVAL p = LOCATE(s, "world"),'
        ' p2 = LOCATE(s, "o", 6),'
        ' missing = LOCATE(s, "zz"),'
        ' a = STARTS_WITH(s, "hel"), b = ENDS_WITH(s, "rld")',
        {"t": df},
    ).collect()
    assert out[0]["p"] == 7 and out[0]["p2"] == 8
    assert out[0]["missing"] == 0
    assert out[0]["a"] is True and out[0]["b"] is True


def test_date_trunc_format_parse(spark):
    """DATE_TRUNC fixed spans floor by epoch pmod (multipliers work,
    UTC); calendar units admit only multiplier 1; DATE_FORMAT is
    format-FIRST (ES|QL order) and its 1-arg form raises; DATE_PARSE
    round-trips."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 15, 14, 47, 31),)], "ts timestamp"
    )
    out = esql(
        "FROM t | EVAL h3 = DATE_TRUNC(3 hours, ts),"
        " mon = DATE_TRUNC(1 month, ts),"
        ' d = DATE_FORMAT("yyyy-MM-dd HH:mm", ts),'
        ' back = DATE_PARSE("yyyy-MM-dd", DATE_FORMAT("yyyy-MM-dd", ts))',
        {"t": df},
    ).collect()
    assert out[0]["h3"] == dt.datetime(2024, 3, 15, 12, 0, 0)
    assert out[0]["mon"] == dt.datetime(2024, 3, 1, 0, 0, 0)
    assert out[0]["d"] == "2024-03-15 14:47"
    assert out[0]["back"] == dt.datetime(2024, 3, 15)
    with pytest.raises(ValueError, match="multiplier 1"):
        esql("FROM t | EVAL x = DATE_TRUNC(3 months, ts)", {"t": df})
    with pytest.raises(ValueError, match="format explicitly"):
        esql("FROM t | EVAL x = DATE_FORMAT(ts)", {"t": df})


def test_top_values_weighted_avg_std_dev(spark):
    """TOP keeps ties and respects order; VALUES emits sorted
    distinct; WEIGHTED_AVG and STD_DEV match hand-computed exact
    values (population σ)."""
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 3.0, 3), ("a", 3.0, 1), ("a", 5.0, 1)],
        "k string, v double, w int",
    )
    out = esql(
        "FROM t | STATS up = TOP(v, 3, \"asc\"),"
        ' down = TOP(v, 3, "desc"), vals = VALUES(v),'
        " wa = WEIGHTED_AVG(v, w), sd = STD_DEV(v) BY k",
        {"t": df},
    ).collect()
    r = out[0]
    assert r["up"] == [1.0, 3.0, 3.0]
    assert r["down"] == [5.0, 3.0, 3.0]
    assert r["vals"] == [1.0, 3.0, 5.0]
    # Σvw = 1 + 9 + 3 + 5 = 18, Σw = 6 → 3.0
    assert r["wa"] == 3.0
    # mean 3, squared dev (4 + 0 + 0 + 4)/4 = 2 → sqrt(2) @ 6dp
    assert r["sd"] == 1.414214
    with pytest.raises(ValueError, match='"asc" or "desc"'):
        esql('FROM t | STATS x = TOP(v, 3, "up") BY k', {"t": df})
    with pytest.raises(ValueError, match="integer literal"):
        esql('FROM t | STATS x = TOP(v, k, "asc") BY k', {"t": df})


def test_grok_extraction_types_and_nulls(spark):
    """GROK over the built-in pattern library: typed conversions,
    NULL fields on non-match, unanchored search semantics."""
    df = spark.createDataFrame(
        [(1, "INFO u=alice n=42 v=3.5 at 10.0.0.1"),
         (2, "weird line"),
         (3, None)],
        "id int, line string",
    )
    out = esql(
        "FROM t | GROK line"
        ' "%{LOGLEVEL:lvl} u=%{USERNAME:u} n=%{INT:n:int}'
        ' v=%{NUMBER:v:float} at %{IPV4:ip}"'
        " | SORT id ASC",
        {"t": df},
    ).collect()
    assert (out[0]["lvl"], out[0]["u"], out[0]["n"], out[0]["v"],
            out[0]["ip"]) == ("INFO", "alice", 42, 3.5, "10.0.0.1")
    assert out[1]["lvl"] is None and out[1]["n"] is None
    assert out[2]["lvl"] is None


def test_grok_pattern_validation(spark):
    """Unknown patterns, duplicate fields, capturing groups in
    literal text, malformed tokens, and zero-field patterns all
    raise loudly instead of mangling extraction indices."""
    df = spark.createDataFrame([("x",)], "line string")
    with pytest.raises(ValueError, match="unknown grok pattern"):
        esql('FROM t | GROK line "%{NOPE:x}"', {"t": df})
    with pytest.raises(ValueError, match="duplicate grok field"):
        esql('FROM t | GROK line "%{WORD:a} %{WORD:a}"', {"t": df})
    with pytest.raises(ValueError, match="non-capturing"):
        esql('FROM t | GROK line "(x)%{WORD:a}"', {"t": df})
    with pytest.raises(ValueError, match="malformed grok token"):
        esql('FROM t | GROK line "%{WORD:a:text}"', {"t": df})
    with pytest.raises(ValueError, match="extracts no fields"):
        esql('FROM t | GROK line "%{WORD} %{INT}"', {"t": df})
    # a field name that shadows the source column must not corrupt
    # later captures (the preserved-source-copy contract)
    df2 = spark.createDataFrame([("a 7",)], "line string")
    out = esql(
        'FROM t | GROK line "%{WORD:line} %{INT:n:int}"', {"t": df2}
    ).collect()
    assert out[0]["line"] == "a" and out[0]["n"] == 7


def test_mv_pack_median_slice_zip_append_concat(spark):
    """MV_MEDIAN (exact interpolated, DOUBLE, NULL on empty),
    MV_SLICE (0-based inclusive, negatives from the end, mixed signs
    refused), MV_ZIP (longer side's leftovers pass through alone),
    MV_APPEND, MV_CONCAT (literal delimiter)."""
    df = spark.createDataFrame([(1,)], "id int")
    out = esql(
        "FROM t"
        ' | EVAL a = array(3, 1, 2, 10), b = array("x", "y")'
        " | EVAL med4 = MV_MEDIAN(a), med1 = MV_MEDIAN(array(7)),"
        " med0 = MV_MEDIAN(array()),"
        " s1 = MV_CONCAT(transform(MV_SLICE(a, 1, 2), _x ->"
        ' CAST(_x AS STRING)), ","),'
        " s2 = MV_CONCAT(transform(MV_SLICE(a, -2, -1), _x ->"
        ' CAST(_x AS STRING)), ","),'
        ' z = MV_CONCAT(MV_ZIP(b, array("1", "2", "3"), "-"), " "),'
        " app = MV_COUNT(MV_APPEND(a, a))"
        " | KEEP med4, med1, med0, s1, s2, z, app",
        {"t": df},
    ).collect()[0]
    assert out["med4"] == 2.5 and out["med1"] == 7.0
    assert out["med0"] is None
    assert out["s1"] == "1,2" and out["s2"] == "2,10"
    assert out["z"] == "x-1 y-2 3"
    assert out["app"] == 8
    with pytest.raises(ValueError, match="share a sign"):
        esql("FROM t | EVAL x = MV_SLICE(array(1), -1, 1)", {"t": df})
    with pytest.raises(ValueError, match="end .* < start"):
        esql("FROM t | EVAL x = MV_SLICE(array(1), 2, 1)", {"t": df})
    with pytest.raises(ValueError, match="string literal"):
        esql("FROM t | EVAL x = MV_CONCAT(array(1), id)", {"t": df})


def test_ip_prefix(spark):
    """IP_PREFIX keeps the top prefix_v4 bits — /24, /16, a
    non-octet-aligned /12, /32 identity; malformed addresses NULL;
    length validation raises."""
    df = spark.createDataFrame(
        [("10.33.200.7",), ("999.1.1.1",), (None,)], "ip string"
    )
    out = esql(
        "FROM t | EVAL p24 = IP_PREFIX(ip, 24, 128),"
        " p16 = IP_PREFIX(ip, 16, 128), p12 = IP_PREFIX(ip, 12, 128),"
        " p32 = IP_PREFIX(ip, 32, 128)",
        {"t": df},
    ).collect()
    assert out[0]["p24"] == "10.33.200.0"
    assert out[0]["p16"] == "10.33.0.0"
    assert out[0]["p12"] == "10.32.0.0"    # 33 = 0b100001 -> keep 0b1000xx
    assert out[0]["p32"] == "10.33.200.7"
    assert out[1]["p24"] is None and out[2]["p24"] is None
    with pytest.raises(ValueError, match="IP_PREFIX lengths"):
        esql("FROM t | EVAL x = IP_PREFIX(ip, 33, 128)", {"t": df})


def test_base64_radians_mv_percentile_mad(spark):
    df = spark.createDataFrame([("spark",)], "s string")
    out = esql(
        "FROM t | EVAL b = TO_BASE64(s), back = FROM_BASE64(TO_BASE64(s)),"
        " deg = round(TO_DEGREES(TO_RADIANS(90.0)), 6),"
        " p50 = MV_PERCENTILE(array(1, 2, 3, 4), 50),"
        " p90 = MV_PERCENTILE(array(1, 2, 3, 4), 90),"
        " p100 = MV_PERCENTILE(array(1, 2, 3, 4), 100),"
        " mad = MV_MEDIAN_ABSOLUTE_DEVIATION(array(1, 2, 3, 4, 9))"
        " | KEEP b, back, deg, p50, p90, p100, mad",
        {"t": df},
    ).collect()[0]
    import base64

    assert out["b"] == base64.b64encode(b"spark").decode()
    assert out["back"] == "spark"
    assert out["deg"] == 90.0
    assert out["p50"] == 2.5          # (n-1)*0.5 = 1.5 -> 2 + 0.5*(3-2)
    assert out["p90"] == 3.7          # pos 2.7 -> 3 + 0.7*(4-3)
    assert out["p100"] == 4.0         # integral rank at the end clamps
    # median 3; |devs| sorted [0,1,1,2,6] -> median 1
    assert out["mad"] == 1.0
    with pytest.raises(ValueError, match="MV_PERCENTILE p"):
        esql("FROM t | EVAL x = MV_PERCENTILE(array(1), 101)", {"t": df})


def test_handler_literals_survive_later_passes(spark):
    """Self-review r10: single-quoted SQL literals emitted by
    rewriters must pass VERBATIM through every later pass — the ==→=
    substitution and the call scanners used to reach inside them."""
    df = spark.createDataFrame([("a==b==c", ["x", "y"])],
                               "s string, arr array<string>")
    out = esql(
        'FROM t | EVAL n = size(SPLIT(s, "==")),'
        ' d = MV_CONCAT(arr, "VALUES(x)"),'
        ' c = MV_CONCAT(arr, "CASE(q)")'
        " | KEEP n, d, c",
        {"t": df},
    ).collect()[0]
    assert out["n"] == 3                      # split on literal ==
    assert out["d"] == "xVALUES(x)y"          # delimiter untouched
    assert out["c"] == "xCASE(q)y"


def test_simple_case_form_passes_through(spark):
    """`CASE (v) WHEN … END` is Spark's simple-CASE pass-through
    syntax, not the ES|QL CASE function (self-review r10)."""
    df = spark.createDataFrame([(1,), (2,)], "v int")
    out = esql(
        'FROM t | EVAL lbl = CASE (v) WHEN 1 THEN "one" ELSE "other" END'
        " | SORT v ASC | KEEP lbl",
        {"t": df},
    ).collect()
    assert [r["lbl"] for r in out] == ["one", "other"]


def test_grok_char_class_paren_is_literal(spark):
    """A '(' inside a regex character class is literal text, not a
    capturing group (self-review r10)."""
    df = spark.createDataFrame([("(foo 7",)], "line string")
    out = esql(
        'FROM t | GROK line "[(]%{WORD:a} %{INT:n:int}"', {"t": df}
    ).collect()[0]
    assert out["a"] == "foo" and out["n"] == 7


def test_weighted_avg_skips_null_value_weights(spark):
    """ES WEIGHTED_AVG skips documents missing the VALUE entirely —
    their weights must not dilute the denominator (self-review
    r10)."""
    df = spark.createDataFrame(
        [(10.0, 1), (None, 1), (20.0, 3)], "v double, w int"
    )
    out = esql(
        "FROM t | STATS wa = WEIGHTED_AVG(v, w)", {"t": df}
    ).collect()[0]
    assert out["wa"] == 17.5                  # (10 + 60) / 4, not / 5


def test_ts_rate_counter_semantics(spark):
    """TS + RATE(): reset-compensated increases (a decrease is a
    counter reset — the post-reset sample counts as an increase from
    zero, the Prometheus/ES compensation), divided by the series'
    observed span; single-event series yield NULL; outer max/avg
    aggregate the per-series rates; RATE outside TS refuses."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "u1", 0.0),
        (2, base + dt.timedelta(seconds=10), "u1", 10.0),
        (3, base + dt.timedelta(seconds=20), "u1", 5.0),   # reset
        (4, base + dt.timedelta(seconds=30), "u1", 8.0),
        (5, base, "u2", 100.0),                            # singleton
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, host string, c double"
    )
    out = esql(
        "TS t | STATS m = max(RATE(c)), a = avg(RATE(c)), s = sum(RATE(c))",
        {"t": df}, dimensions=["host"],
    ).collect()[0]
    # u1: increases 10 + 5 (post-reset sample from zero) + 3 = 18
    # over 30 s; u2: NULL (no span)
    assert out["m"] == 0.6
    assert out["a"] == 0.6 and out["s"] == 0.6
    with pytest.raises(ValueError, match="only legal over the TS"):
        esql("FROM t | STATS m = max(RATE(c))", {"t": df})
    with pytest.raises(ValueError, match="needs the series metadata"):
        esql("TS t | STATS m = max(RATE(c))", {"t": df})
    with pytest.raises(ValueError, match="must wrap RATE|must be"):
        esql("TS t | STATS m = max(c), r = max(RATE(c))",
             {"t": df}, dimensions=["host"])
    with pytest.raises(ValueError, match="max/min/avg/sum"):
        esql("TS t | STATS m = count(RATE(c))", {"t": df},
             dimensions=["host"])


def test_ts_over_time_family(spark):
    """The *_OVER_TIME per-series functions: endpoints by packed
    order, exact-decimal sums, outer aggregation across series."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "u1", 4.0),
        (2, base + dt.timedelta(seconds=10), "u1", 1.0),
        (3, base + dt.timedelta(seconds=20), "u1", 7.0),
        (4, base, "u2", 10.0),
        (5, base + dt.timedelta(seconds=5), "u2", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, host string, c double"
    )
    out = esql(
        "TS t | STATS mx = max(MAX_OVER_TIME(c)),"
        " mn = min(MIN_OVER_TIME(c)),"
        " s = sum(SUM_OVER_TIME(c)), a = avg(AVG_OVER_TIME(c)),"
        " n = sum(COUNT_OVER_TIME(c)),"
        " f = min(FIRST_OVER_TIME(c)), l = max(LAST_OVER_TIME(c))",
        {"t": df}, dimensions=["host"],
    ).collect()[0]
    assert out["mx"] == 10.0 and out["mn"] == 1.0
    assert out["s"] == 24.0                 # (4+1+7) + (10+2)
    assert out["a"] == 5.0                  # avg(4.0, 6.0)
    assert out["n"] == 5
    assert out["f"] == 4.0                  # min(first u1=4, first u2=10)
    assert out["l"] == 7.0                  # max(last u1=7, last u2=2)


def test_tau_and_pseries_weighted_sum(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = esql(
        "FROM t | EVAL tau = round(TAU(), 6),"
        " w = MV_PSERIES_WEIGHTED_SUM(array(2.0, 8.0, 4.0), 2)"
        " | KEEP tau, w",
        {"t": df},
    ).collect()[0]
    import math

    assert out["tau"] == round(2 * math.pi, 6)
    # sorted desc [8, 4, 2]: 8/1 + 4/4 + 2/9 = 9.222222
    assert out["w"] == 9.222222
    with pytest.raises(ValueError, match="numeric literal"):
        esql("FROM t | EVAL w = MV_PSERIES_WEIGHTED_SUM(array(1.0), id)",
             {"t": df})


def test_tau_rejects_arguments(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="TAU takes no arguments"):
        esql("FROM t | EVAL x = TAU(id)", {"t": df})


def test_like_pattern_lists(spark):
    """ES|QL 8.16 pattern lists: LIKE ("a*", "b*") matches ANY
    pattern, NOT LIKE none; RLIKE lists too; literal text containing
    the construct is untouched."""
    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "s string"
    )
    out = esql('FROM t | WHERE s LIKE ("al*", "be*")', {"t": df}).collect()
    assert sorted(r["s"] for r in out) == ["alpha", "beta"]
    out = esql('FROM t | WHERE s NOT LIKE ("al*", "be*")', {"t": df}).collect()
    assert [r["s"] for r in out] == ["gamma"]
    out = esql('FROM t | WHERE s RLIKE ("^a", "a$")', {"t": df}).collect()
    assert sorted(r["s"] for r in out) == ["alpha", "beta", "gamma"]
    lit = esql(
        'FROM t | EVAL note = "s LIKE (\\"x\\")" | KEEP note | LIMIT 1',
        {"t": df},
    ).collect()[0]
    assert lit["note"] == 's LIKE ("x")'


def test_esql_8_18_conformance_sweep(spark):
    """Round-11 S36 sweep: HASH literal-algorithm dispatch (+ SHA1
    against fixed public vectors — DuckDB has no sha1 to oracle
    against), TERM exact-term filter, BYTE_LENGTH on multibyte text,
    and the named refusals (SHOW/METRICS/RRF commands; KQL, TO_*
    type-system, ST_* spatial functions)."""
    df = spark.createDataFrame(
        [(1, "abc", "héllo"), (2, "xyz", "plain")],
        "id long, s string, t string",
    )
    out = {r["id"]: r for r in esql(
        'FROM t | EVAL h1 = HASH("sha1", s), h2 = HASH("SHA-256", s),'
        " m = MD5(s), b = BYTE_LENGTH(t), r = RIGHT(s, 2)"
        ' | WHERE TERM(s, "abc")',
        {"t": df},
    ).collect()}
    assert list(out) == [1]
    # public SHA-1/MD5 test vectors for "abc"
    assert out[1]["h1"] == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert out[1]["m"] == "900150983cd24fb0d6963f7d28e17f72"
    assert out[1]["h2"] == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert out[1]["b"] == 6          # é is two UTF-8 bytes
    assert out[1]["r"] == "bc"
    with pytest.raises(ValueError, match="HASH algorithm must be"):
        esql('FROM t | EVAL h = HASH("crc32", s)', {"t": df})
    with pytest.raises(ValueError, match="HASH algorithm"):
        esql('FROM t | EVAL h = HASH(s, s)', {"t": df})  # non-literal
    for cmd, msg in [
        ("SHOW INFO", "SHOW"),
        ("METRICS events max(v)", "METRICS"),
    ]:
        with pytest.raises(ValueError, match=msg):
            esql(cmd, {"t": df})
    with pytest.raises(ValueError, match="RRF"):
        esql("FROM t | RRF", {"t": df})
    for fn in ('KQL("s:abc")', "TO_VERSION(s)", "TO_UNSIGNED_LONG(id)",
               "TO_GEOPOINT(s)", "ST_X(s)", "ST_CENTROID_AGG(s)"):
        with pytest.raises(ValueError, match="unsupported ES\\|QL function"):
            esql(f"FROM t | EVAL z = {fn}", {"t": df})
    # MATCH_PHRASE graduated from the refusal list in round 13
    mp = esql('FROM t | EVAL z = MATCH_PHRASE(s, "a b") | KEEP id, z',
              {"t": df})
    assert dict(mp.dtypes)["z"] == "boolean"
    # TO_DATE_NANOS graduated in round 14 (documented µs truncation:
    # a long is NANOS since epoch div 1000)
    tdn = esql("FROM t | EVAL z = TO_DATE_NANOS(id * 1000000000)"
               " | KEEP id, z", {"t": df})
    assert dict(tdn.dtypes)["z"] == "timestamp"
    # a refused name INSIDE a string literal must NOT trip the gate
    ok = esql('FROM t | EVAL z = concat(s, "ST_X(q)")', {"t": df})
    assert ok.count() == 2
    # Spark's lowercase hash() builtin (murmur3, variadic) still
    # passes through — HASH dispatch is case-sensitive (r11 pass 1)
    low = esql("FROM t | EVAL z = hash(s, id) | KEEP id, z", {"t": df})
    assert low.count() == 2 and dict(low.dtypes)["z"] == "int"


def test_esql_temporal_literal_arithmetic(spark):
    """ES|QL date math (`ts - 1 day`, `+ 2 quarters`): rewritten to
    ANSI INTERVAL after the function rewriters run (DATE_TRUNC's span
    argument is untouched), quarters map to 3N months, month-end
    arithmetic clamps, string literals are protected."""
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 31, 12, 0))], "id long, ts timestamp"
    )
    r = esql(
        "FROM t | EVAL nm = ts + 1 month, q = ts + 2 quarters,"
        " d = ts - 1 day, tr = DATE_TRUNC(1 day, ts),"
        ' s = "in 3 days"'
        " | KEEP nm, q, d, tr, s",
        {"t": df},
    ).collect()[0]
    assert r["nm"] == dt.datetime(2024, 2, 29, 12, 0)   # clamped
    assert r["q"] == dt.datetime(2024, 7, 31, 12, 0)    # 2 quarters = 6 months
    assert r["d"] == dt.datetime(2024, 1, 30, 12, 0)
    assert r["tr"] == dt.datetime(2024, 1, 31, 0, 0)
    assert r["s"] == "in 3 days"


def test_duration_rewrite_properties():
    """Spark-free invariants of _rewrite_durations (hypothesis):
    double-quoted literals are untouched; every `[+-] N unit` outside
    literals becomes INTERVAL (quarters ×3 months); the rewrite is
    idempotent (INTERVAL output never re-matches)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from monstache_spark.operators.esql import _rewrite_durations

    units = ["millisecond", "second", "minute", "hour", "day",
             "week", "month", "quarter", "year"]

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=10**6),
        unit=st.sampled_from(units),
        plural=st.booleans(),
        sign=st.sampled_from(["+", "-", "+ ", "-  "]),
        lit=st.text(
            alphabet=st.characters(
                blacklist_characters='"\\', min_codepoint=32,
                max_codepoint=126,
            ),
            max_size=20,
        ),
    )
    def check(n, unit, plural, sign, lit):
        dur = f"{n} {unit}{'s' if plural else ''}"
        expr = f'ts {sign}{dur} > x AND note == "{lit} {dur}"'
        out = _rewrite_durations(expr)
        # the literal span survives verbatim
        assert f'"{lit} {dur}"' in out
        # the arithmetic span became an INTERVAL
        if unit == "quarter":
            assert f"INTERVAL {3 * n} MONTH" in out
        else:
            assert f"INTERVAL {n} {unit.upper()}" in out
        assert dur not in out.replace(f'"{lit} {dur}"', "")
        # idempotent: a second pass changes nothing
        assert _rewrite_durations(out) == out

    check()


def test_lookup_join_override_and_multifield(spark, t):
    """LOOKUP JOIN fidelity (8.18 GA): non-key lookup fields OVERRIDE
    same-named incoming columns (the documented collision rule),
    multiple matches fan out, NULL keys never match, and multi-field
    ON joins on the full tuple."""
    from monstache_spark.operators.esql import esql

    src = spark.createDataFrame(
        [(1, "a", "old1"), (2, "b", "old2"), (3, None, "old3")],
        "id long, k string, label string",
    )
    lk = spark.createDataFrame(
        [("a", "new-a", 10), ("b", "new-b", 20), ("b", "new-b2", 21)],
        "k string, label string, bonus long",
    )
    out = esql("FROM src | LOOKUP JOIN lk ON k", {"src": src, "lk": lk})
    rows = {(r["id"], r["label"], r["bonus"]) for r in out.collect()}
    # id=2 fans out to both lookup matches; id=3's NULL key matches
    # nothing and keeps the row with NULL lookup fields (label was
    # overridden by the lookup column, so it is NULL, not "old3")
    assert rows == {
        (1, "new-a", 10), (2, "new-b", 20), (2, "new-b2", 21),
        (3, None, None),
    }
    # multi-field ON
    src2 = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y")], "id long, k string, sub string"
    )
    lk2 = spark.createDataFrame(
        [("a", "x", 7)], "k string, sub string, score long"
    )
    out2 = esql(
        "FROM src2 | LOOKUP JOIN lk2 ON k, sub", {"src2": src2, "lk2": lk2}
    ).collect()
    got = {r["id"]: r["score"] for r in out2}
    assert got == {1: 7, 2: None}
    with pytest.raises(ValueError, match="no match field"):
        esql("FROM src | LOOKUP JOIN lk ON nope", {"src": src, "lk": lk})
    with pytest.raises(ValueError, match="unknown lookup table"):
        esql("FROM src | LOOKUP JOIN nope ON k", {"src": src})


def test_from_metadata_index(spark, t):
    from monstache_spark.operators.esql import esql

    u = spark.createDataFrame([(9, "z", 1.0)], "id long, k string, v double")
    out = esql(
        "FROM t, u METADATA _index | STATS n = COUNT(*) BY _index"
        " | SORT _index ASC",
        {"t": t, "u": u},
    ).collect()
    assert [(r["_index"], r["n"]) for r in out] == [("t", 3), ("u", 1)]
    with pytest.raises(ValueError, match="unsupported METADATA field"):
        esql("FROM t METADATA _id", {"t": t})


def test_match_phrase(spark):
    from monstache_spark.operators.esql import esql

    docs = spark.createDataFrame(
        [(1, "fast Hash  Join beats sort"),   # matches (case/extra ws)
         (2, "join hash order swapped"),      # reversed -> no match
         (3, "hash joins plural"),            # 'joins' != 'join'
         (4, "prefix hash join suffix"),      # mid-text match
         (5, None),                           # NULL text -> filtered
         (6, "hash"),                         # shorter than phrase
         (7, "a hash b join c")],             # non-consecutive
        "id long, text string",
    )
    out = esql(
        'FROM docs | WHERE MATCH_PHRASE(text, "hash join") | KEEP id',
        {"docs": docs},
    ).collect()
    assert sorted(r["id"] for r in out) == [1, 4]
    one = esql(
        'FROM docs | WHERE MATCH_PHRASE(text, "HASH") | KEEP id',
        {"docs": docs},
    ).collect()
    assert sorted(r["id"] for r in one) == [1, 2, 3, 4, 6, 7]
    with pytest.raises(ValueError, match="slop"):
        esql('FROM docs | WHERE MATCH_PHRASE(text, "a b", {"slop": 1})',
             {"docs": docs})
    with pytest.raises(ValueError, match="string literal"):
        esql("FROM docs | WHERE MATCH_PHRASE(text, id)", {"docs": docs})
    with pytest.raises(ValueError, match="no tokens"):
        esql('FROM docs | WHERE MATCH_PHRASE(text, "  ")', {"docs": docs})


def test_fork(spark, t):
    from monstache_spark.operators.esql import esql

    out = esql(
        'FROM t | FORK ( WHERE k == "a" | STATS n = COUNT(*) BY k )'
        " ( WHERE v IS NOT NULL | EVAL w = v * 2 | KEEP id, w )"
        " | SORT _fork ASC, id ASC",
        {"t": t},
    ).collect()
    # branch columns union by name; missing null-fill
    assert [r["_fork"] for r in out] == ["fork1", "fork2", "fork2"]
    assert out[0]["k"] == "a" and out[0]["n"] == 2 and out[0]["id"] is None
    assert (out[1]["id"], out[1]["w"]) == (1, 20.0)
    assert (out[2]["id"], out[2]["w"]) == (2, 40.0)
    assert out[1]["k"] is None and out[1]["n"] is None
    # a later stage sees the unioned frame
    agg = esql(
        'FROM t | FORK ( WHERE k == "a" ) ( WHERE k == "b" )'
        " | STATS n = COUNT(*) BY _fork | SORT _fork ASC",
        {"t": t},
    ).collect()
    assert [(r["_fork"], r["n"]) for r in agg] == [("fork1", 2), ("fork2", 1)]
    with pytest.raises(ValueError, match="2-8"):
        esql('FROM t | FORK ( WHERE k == "a" )', {"t": t})
    with pytest.raises(ValueError, match="nested FORK"):
        esql('FROM t | FORK ( FORK ( WHERE k == "a" ) ( WHERE k == "b" ) )'
             ' ( WHERE k == "b" )', {"t": t})
    with pytest.raises(ValueError, match="empty FORK branch"):
        esql("FROM t | FORK ( ) ( WHERE k == \"b\" )", {"t": t})
    with pytest.raises(ValueError, match="parenthesized"):
        esql('FROM t | FORK ( WHERE k == "a" ) WHERE', {"t": t})
    with pytest.raises(ValueError, match="model-dependent"):
        esql('FROM t | COMPLETION x = "prompt"', {"t": t})
    with pytest.raises(ValueError, match="_score"):
        esql("FROM t | RRF", {"t": t})


def test_fork_outer_tables_visible_in_branch(spark, t):
    """ADVICE r13: the recursive branch compile must carry the OUTER
    table map, so a LOOKUP JOIN against an outer lookup table is
    legal inside a FORK branch (as the FORK docstring promises)."""
    from monstache_spark.operators.esql import esql

    lk = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "k string, label string"
    )
    out = esql(
        "FROM t | FORK ( LOOKUP JOIN lk ON k | KEEP id, label )"
        " ( WHERE k == \"b\" | KEEP id )"
        " | SORT _fork ASC, id ASC",
        {"t": t, "lk": lk},
    ).collect()
    assert [(r["_fork"], r["id"], r["label"]) for r in out] == [
        ("fork1", 1, "alpha"), ("fork1", 2, "alpha"),
        ("fork1", 3, "beta"), ("fork2", 3, None),
    ]
    # the branch-input name is reserved
    with pytest.raises(ValueError, match="reserved"):
        esql(
            'FROM t | FORK ( WHERE k == "a" ) ( WHERE k == "b" )',
            {"t": t, "__fork_input__": lk},
        )


def test_fork_branch_escaped_backslash_string(spark, t):
    """ADVICE r13: a branch string literal ending in an escaped
    backslash ("…\\\\") must close the string — the old single
    look-behind left the parser thinking it was still open and
    mis-bracketed the branch."""
    from monstache_spark.operators.esql import esql

    df = spark.createDataFrame(
        [(1, "x\\"), (2, "y")], "id long, path string"
    )
    out = esql(
        'FROM d | FORK ( WHERE path == "x\\\\" | KEEP id )'
        " ( WHERE id == 2 | KEEP id ) | SORT _fork ASC",
        {"d": df},
    ).collect()
    assert [(r["_fork"], r["id"]) for r in out] == [("fork1", 1), ("fork2", 2)]


def test_fork_persist_knob(spark, t):
    """fork_persist=True caches the branch input once; results are
    identical to the uncached plan."""
    from monstache_spark.operators.esql import esql

    q = ('FROM t | EVAL v2 = v * 3 | FORK ( WHERE k == "a" )'
         ' ( WHERE k == "b" ) | SORT _fork ASC, id ASC')
    plain = [tuple(r) for r in esql(q, {"t": t}).collect()]
    cached_df = esql(q, {"t": t}, fork_persist=True)
    cached = [tuple(r) for r in cached_df.collect()]
    assert plain == cached
    spark.catalog.clearCache()


def test_to_date_nanos(spark):
    """S36 graduation (r14): TO_DATE_NANOS under the documented µs
    truncation — long input is NANOS since epoch div 1000, string
    input date-parses with the fraction trimmed to 6 digits,
    datetime passes through."""
    from monstache_spark.operators.esql import esql

    df = spark.sql(
        "SELECT timestamp'2024-03-05 10:20:30.123456' AS ts,"
        " CAST(1709634030123456789 AS BIGINT) AS ns,"
        " '2024-03-05 10:20:30.123456789' AS s,"
        " 'garbage' AS bad"
    )
    out = esql(
        "FROM t | EVAL a = TO_DATE_NANOS(ns), b = TO_DATE_NANOS(s),"
        " c = TO_DATE_NANOS(ts), d = TO_DATE_NANOS(bad)"
        " | KEEP a, b, c, d",
        {"t": df},
    ).collect()[0]
    import datetime

    expect = datetime.datetime(2024, 3, 5, 10, 20, 30, 123456)
    assert out["a"] == expect  # 1709634030123456789 ns == that µs
    assert out["b"] == expect
    assert out["c"] == expect
    assert out["d"] is None  # unparseable -> NULL (the ES on-error shape)


def test_round_to(spark):
    """ES|QL 9.x ROUND_TO (r14): rounds DOWN to the greatest point
    <= value; below-min clamps to the smallest point; NULL
    propagates; points need not be pre-sorted."""
    from monstache_spark.operators.esql import esql

    df = spark.createDataFrame(
        [(1, 7.0), (2, 100.0), (3, 0.5), (4, 10.0), (5, None)],
        "id long, v double",
    )
    out = {r["id"]: r["b"] for r in esql(
        "FROM t | EVAL b = ROUND_TO(v, 10.0, 1.0, 50.0) | KEEP id, b",
        {"t": df},
    ).collect()}
    assert out == {1: 1.0, 2: 50.0, 3: 1.0, 4: 10.0, 5: None}
    with pytest.raises(ValueError, match="ROUND_TO takes"):
        esql("FROM t | EVAL b = ROUND_TO(v)", {"t": df})
