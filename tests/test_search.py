"""Bool-query compilation, BM25 retrieval, more-like-this."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from monstache_spark.operators.search import (
    bm25_topk,
    bool_query_filter,
    compile_bool_query,
    more_like_this,
)


def _docs(spark):
    rows = [
        (0, "spark streams data fast", "en"),
        (1, "slow batch job", "en"),
        (2, "spark spark spark tuning", "en"),
        (3, "data lake table scan", "de"),
        (4, "the quick brown fox", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_term_terms_range_exists(spark):
    df = _docs(spark).withColumn(
        "score", F.when(F.col("doc_id") < 3, F.col("doc_id") * 10.0)
    )
    got = {r["doc_id"] for r in bool_query_filter(df, {"term": {"lang": "de"}}).collect()}
    assert got == {3}
    got = {
        r["doc_id"]
        for r in bool_query_filter(df, {"terms": {"doc_id": [1, 4]}}).collect()
    }
    assert got == {1, 4}
    got = {
        r["doc_id"]
        for r in bool_query_filter(
            df, {"range": {"doc_id": {"gte": 1, "lt": 4}}}
        ).collect()
    }
    assert got == {1, 2, 3}
    got = {
        r["doc_id"] for r in bool_query_filter(df, {"exists": {"field": "score"}}).collect()
    }
    assert got == {0, 1, 2}


def test_prefix_wildcard_match_phrase(spark):
    df = _docs(spark)
    assert {
        r["doc_id"] for r in bool_query_filter(df, {"prefix": {"text": "spark"}}).collect()
    } == {0, 2}
    assert {
        r["doc_id"]
        for r in bool_query_filter(df, {"wildcard": {"text": "*quick*fox"}}).collect()
    } == {4}
    # match is OR over analyzed tokens, case-insensitive
    assert {
        r["doc_id"]
        for r in bool_query_filter(df, {"match": {"text": "SPARK fox"}}).collect()
    } == {0, 2, 4}
    assert {
        r["doc_id"]
        for r in bool_query_filter(df, {"match_phrase": {"text": "data lake"}}).collect()
    } == {3}


def test_bool_nesting_and_minimum_should_match(spark):
    df = _docs(spark)
    q = {
        "bool": {
            "must": [{"term": {"lang": "en"}}],
            "must_not": [{"match": {"text": "batch"}}],
            "should": [
                {"match": {"text": "spark"}},
                {"match": {"text": "fox"}},
                {"match": {"text": "data"}},
            ],
            "minimum_should_match": 1,
        }
    }
    assert {r["doc_id"] for r in bool_query_filter(df, q).collect()} == {0, 2, 4}
    # bare should (no must): at least one must match by default
    q2 = {"bool": {"should": [{"term": {"doc_id": 1}}, {"term": {"doc_id": 3}}]}}
    assert {r["doc_id"] for r in bool_query_filter(df, q2).collect()} == {1, 3}
    # nested bool inside must
    q3 = {
        "bool": {
            "must": [
                {
                    "bool": {
                        "should": [
                            {"term": {"lang": "de"}},
                            {"match": {"text": "tuning"}},
                        ]
                    }
                }
            ]
        }
    }
    assert {r["doc_id"] for r in bool_query_filter(df, q3).collect()} == {2, 3}


def test_bool_query_predicate_pushdown(spark, tmp_path):
    _docs(spark).write.parquet(str(tmp_path / "d"))
    df = spark.read.parquet(str(tmp_path / "d"))
    out = bool_query_filter(
        df, {"bool": {"must": [{"term": {"lang": "en"}}, {"range": {"doc_id": {"gte": 2}}}]}}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(lang,en)" in plan


def test_bm25_formula_matches_reference_computation(spark):
    df = _docs(spark)
    out = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["spark", "data"], k=5).collect()}
    # reference computation on the same 5-doc corpus
    corpus = {
        0: "spark streams data fast",
        1: "slow batch job",
        2: "spark spark spark tuning",
        3: "data lake table scan",
        4: "the quick brown fox",
    }
    toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    expect = {}
    for term in ["spark", "data"]:
        dfreq = sum(1 for v in toks.values() if term in v)
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                w = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
                expect[i] = expect.get(i, 0.0) + round(w, 6)
    for i, s in out.items():
        assert abs(s - expect[i]) < 1e-6, (i, s, expect.get(i))
    # doc 2 (3x spark) must outrank doc 0 (1x spark + 1x data)? check order agrees
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    got_ranked = [
        r["doc_id"]
        for r in bm25_topk(df, ["spark", "data"], k=5).orderBy("rank").collect()
    ]
    assert got_ranked == [i for i, _ in ranked]


def test_bm25_topk_plan_is_take_ordered(spark):
    df = _docs(spark)
    out = bm25_topk(df, ["spark"], k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortAggregate" not in plan


def test_more_like_this_excludes_source_and_is_deterministic(spark):
    df = _docs(spark)
    a = [(r["doc_id"], r["score"]) for r in more_like_this(df, 0, k=3, min_term_len=4).collect()]
    b = [(r["doc_id"], r["score"]) for r in more_like_this(df, 0, k=3, min_term_len=4).collect()]
    assert a == b
    assert 0 not in {i for i, _ in a}
    assert len(a) > 0


def test_match_phrase_is_token_boundary_exact(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "concatenate the results"), (3, "a cat")],
        "id long, text string",
    )
    got = sorted(
        r["id"]
        for r in bool_query_filter(df, {"match_phrase": {"text": "cat"}}).collect()
    )
    assert got == [1, 3]  # 'concatenate' must not hit


def test_match_phrase_slop_in_order_gap_budget(spark):
    df = spark.createDataFrame(
        [
            (1, "quick brown fox"),      # 1 gap
            (2, "quick fox"),            # exact
            (3, "fox quick"),            # adjacent swap: Lucene cost 2
            (4, "quick x y fox"),        # 2 gaps
            (5, "quick x y z fox"),      # 3 gaps
            (6, "the quickest fox"),     # no substring hit
        ],
        "id long, text string",
    )

    def ids(slop):
        return sorted(r["id"] for r in bool_query_filter(
            df, {"match_phrase": {"text": {"query": "quick fox", "slop": slop}}}
        ).collect())

    assert ids(0) == [2]
    assert ids(1) == [1, 2]
    assert ids(2) == [1, 2, 3, 4]    # the swap is admitted at its cost of 2
    assert ids(3) == [1, 2, 3, 4, 5]


def test_match_phrase_slop_three_terms_movement_cost(spark):
    # min-total-movement contract: x_i = p_i − i, cost = max(x)−min(x)
    df = spark.createDataFrame(
        [
            (1, "a b c"),         # exact, cost 0
            (2, "a x b c"),       # x=(0,1,1) cost 1
            (3, "a x b y c"),     # x=(0,1,2) cost 2
            (4, "a c b"),         # adjacent pair swap: x=(0,1,-1) cost 2
            (5, "b a x c"),       # x=(1,-1,1) cost 2
            (6, "c b a"),         # full reversal: x=(2,0,-2) cost 4
            (7, "c x x a b"),     # x=(3,3,-2) cost 5
        ],
        "id long, text string",
    )

    def ids(slop):
        return sorted(r["id"] for r in bool_query_filter(
            df, {"match_phrase": {"text": {"query": "a b c", "slop": slop}}}
        ).collect())

    assert ids(0) == [1]
    assert ids(1) == [1, 2]
    assert ids(2) == [1, 2, 3, 4, 5]   # 3-token out-of-order now admitted
    assert ids(4) == [1, 2, 3, 4, 5, 6]


def test_match_phrase_slop_four_terms_unordered_window_cover(spark):
    # n ≥ 4 with distinct terms: smallest-range cover admits every
    # arrangement at its max(x)−min(x) movement cost
    df = spark.createDataFrame(
        [
            (1, "a b c d"),      # exact, cost 0
            (2, "a x b c d"),    # x=(0,1,2,2) cost 2
            (3, "a b d c"),      # tail swap: x=(0,0,1,-1) cost 2
            (4, "d c b a"),      # full reversal: x=(3,1,-1,-3) cost 6
            (5, "a b x x x c d"),  # x=(0,0,3,3) cost 3
        ],
        "id long, text string",
    )

    def ids(slop):
        return sorted(r["id"] for r in bool_query_filter(
            df, {"match_phrase": {"text": {"query": "a b c d", "slop": slop}}}
        ).collect())

    assert ids(0) == [1]
    assert ids(2) == [1, 2, 3]
    assert ids(3) == [1, 2, 3, 5]
    assert ids(5) == [1, 2, 3, 5]
    assert ids(6) == [1, 2, 3, 4, 5]


def test_match_phrase_slop_window_cover_matches_brute_force(spark):
    # membership of the HOF window-cover predicate must equal the
    # brute-force min over all pick products of max(x)−min(x)
    import itertools
    import random

    rng = random.Random(7)
    vocab = list("abcde")
    docs = [
        (i, " ".join(rng.choice(vocab + ["x"]) for _ in range(rng.randint(4, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "id long, text string")

    def brute(text, query, slop):
        toks = text.split()
        lists = [
            [p for p, t in enumerate(toks) if t == term] for term in query
        ]
        if any(not l for l in lists):
            return False
        for pick in itertools.product(*lists):
            # Lucene repeats handling: equal query terms must land on
            # pairwise-DISTINCT document positions
            if any(
                query[i] == query[j] and pick[i] == pick[j]
                for i in range(len(query))
                for j in range(i + 1, len(query))
            ):
                continue
            xs = [p - d for d, p in enumerate(pick)]
            if max(xs) - min(xs) <= slop:
                return True
        return False

    for query in (
        ["a", "b", "c", "d"],          # distinct, n = 4
        ["a", "b", "a"],               # repeat, n = 3
        ["a", "b", "a", "c"],          # repeat, n = 4
        ["a", "a", "b", "a"],          # triple repeat, n = 4
        ["b", "a", "c", "a", "b"],     # two repeated terms, n = 5
    ):
        for slop in (0, 1, 2, 4):
            got = sorted(r["id"] for r in bool_query_filter(
                df,
                {"match_phrase": {"text": {"query": " ".join(query), "slop": slop}}},
            ).collect())
            want = sorted(i for i, text in docs if brute(text, query, slop))
            assert got == want, (query, slop, got, want)


def test_match_phrase_slop_analyzed_position_gaps(spark):
    # analyzed sloppy phrase: stop-word removal leaves position GAPS
    # — query 'hash the join'~0 becomes hash@0, join@2 and needs a
    # one-token gap in the doc; slop then budgets movement from that
    # gapped pattern
    from monstache_spark.functions.analyzer import ENGLISH

    df = spark.createDataFrame(
        [
            (1, "hash the join"),       # hash@0, join@2: exact gap match
            (2, "hash join"),           # join@1: one move
            (3, "hash x y join"),       # join@3: one move
            (4, "hash x y z join"),     # join@4: two moves
            (5, "join by hash"),        # swapped, spread 2: cost 2+2=4? x=(2,0)
        ],
        "id long, text string",
    )

    def ids(slop):
        return sorted(r["id"] for r in bool_query_filter(
            df,
            {"match_phrase": {"text": {"query": "hash the join", "slop": slop}}},
            analyzer=ENGLISH,
        ).collect())

    assert ids(0) == [1]
    assert ids(1) == [1, 2, 3]
    assert ids(2) == [1, 2, 3, 4]
    # doc 5: hash@2, join@0 -> x=(2, -2) cost 4
    assert ids(4) == [1, 2, 3, 4, 5]


def test_match_phrase_dict_form_without_slop_is_exact(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "cat x sat")], "id long, text string"
    )
    got = sorted(r["id"] for r in bool_query_filter(
        df, {"match_phrase": {"text": {"query": "cat sat"}}}
    ).collect())
    assert got == [1]


def test_highlight_fragments_tags_and_drops_nonmatches(spark):
    from monstache_spark.operators.search import highlight_fragments

    df = spark.createDataFrame(
        [(1, "alpha table beta"), (2, "no hits here"), (3, "Table at start")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           highlight_fragments(df, ["table"], fragment_size=30, context=3).collect()}
    assert set(out) == {1, 3}  # doc 2 dropped
    assert out[1]["first_pos"] == 7
    # fragment starts context=3 before the match
    assert out[1]["fragment"].startswith("ha <em>table</em>")
    assert out[1]["n_hits"] == 1
    # case-insensitive tagging preserves original case
    assert out[3]["fragment"].startswith("<em>Table</em>")


def test_highlight_escapes_regex_metacharacters(spark):
    from monstache_spark.operators.search import highlight_fragments

    df = spark.createDataFrame(
        [(1, "cost is 3.14 total"), (2, "cost is 3x14 total")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fragment"] for r in
           highlight_fragments(df, ["3.14"], fragment_size=40, context=0).collect()}
    # the dot is literal in both the position regexp and the tagging
    # regexp: doc 1 tags, doc 2 ('3x14') matches neither and is dropped
    assert "<em>3.14</em>" in out[1]
    assert 2 not in out


def test_highlight_first_pos_is_boundary_aware(spark):
    """A doc whose only occurrence is INSIDE another word ('tables'
    for term 'table') must be dropped, not emitted with n_hits=0; and
    first_pos must anchor on the boundary match, skipping an earlier
    mid-word substring."""
    from monstache_spark.operators.search import highlight_fragments

    df = spark.createDataFrame(
        [
            (1, "the tables are long"),            # substring only -> drop
            (2, "stables first, then a table here"),  # skip 'stables'
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           highlight_fragments(df, ["table"], fragment_size=30, context=0).collect()}
    assert set(out) == {2}
    assert out[2]["first_pos"] == 23  # 'table' in '... then a table here'
    assert out[2]["fragment"].startswith("<em>table</em>")
    assert out[2]["n_hits"] == 1


def test_significant_terms_scores_foreground_skew(spark):
    from monstache_spark.operators.search import significant_terms

    rows = [(i, "common special" if i < 4 else "common plain", "en" if i < 4 else "de")
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["term"]: r for r in significant_terms(
        df, {"term": {"lang": "en"}}, size=5, min_doc_count=1, min_term_len=1
    ).collect()}
    # 'special' appears ONLY in the foreground -> top score;
    # 'common' is everywhere -> JLH score 0
    assert out["special"]["rank"] == 1
    assert out["special"]["fg_count"] == 4 and out["special"]["bg_count"] == 4
    assert out["common"]["score"] == 0.0
    assert "plain" not in out  # fg_count = 0 excluded


def test_collapse_topk_keeps_best_per_group(spark):
    from monstache_spark.operators.search import collapse_topk

    rows = [
        (1, "query query query", "s1"),   # strongest in s1
        (2, "query filler words", "s1"),
        (3, "query other stuff", "s2"),
        (4, "nothing relevant here", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in collapse_topk(df, ["query"], "source", k=5).collect()}
    assert out["s1"]["doc_id"] == 1 and out["s1"]["inner_hits"] == 2
    assert out["s2"]["doc_id"] == 3 and out["s2"]["inner_hits"] == 1


def test_fuzzy_suggest_edit1_kinds_and_ranking(spark):
    from monstache_spark.operators.search import fuzzy_suggest

    df = spark.createDataFrame(
        [(1, "spark spark sparks park stark"), (2, "spark table")],
        "doc_id long, text string",
    )
    out = [(r["suggestion"], r["count"], r["distance"]) for r in
           fuzzy_suggest(df, ["spark"], top_n=5).orderBy("rank").collect()]
    # exact match ranks first (distance 0), then edit-1 of all three
    # kinds: deletion (park), insertion (sparks), substitution (stark)
    assert out[0] == ("spark", 3, 0)
    assert set(out[1:]) == {("park", 1, 1), ("sparks", 1, 1), ("stark", 1, 1)}


def test_fuzzy_suggest_damerau_counts_transposition_as_one(spark):
    from monstache_spark.operators.search import fuzzy_suggest

    df = spark.createDataFrame(
        [(1, "table cable fable")], "doc_id long, text string"
    )
    # 'tabel' is an adjacent transposition of 'table': levenshtein 2,
    # Damerau-Levenshtein 1
    plain = fuzzy_suggest(df, ["tabel"], top_n=5).collect()
    assert plain == []
    dl = [(r["suggestion"], r["distance"]) for r in
          fuzzy_suggest(df, ["tabel"], top_n=5, damerau=True).collect()]
    assert dl == [("table", 1)]
    # a NON-adjacent rearrangement ('elbat') stays out at threshold 1
    assert fuzzy_suggest(df, ["elbat"], top_n=5, damerau=True).collect() == []


def test_function_score_boost_reorders_matches(spark):
    from monstache_spark.operators.search import function_score_topk

    df = spark.createDataFrame(
        [
            (1, "apple apple apple", 1.0),   # highest BM25, tiny factor
            (2, "apple pie", 100.0),         # low BM25, huge factor
            (3, "banana bread", 50.0),       # no match
        ],
        "doc_id long, text string, pop double",
    )
    out = [(r["doc_id"], r["rank"]) for r in function_score_topk(
        df, ["apple"], factor_col="pop", factor=1.0, k=5
    ).orderBy("rank").collect()]
    # multiply mode: doc 2's popularity beats doc 1's tf; doc 3 absent
    assert out[0][0] == 2 and {d for d, _ in out} == {1, 2}
    # replace mode ignores BM25 entirely
    rep = [(r["doc_id"], r["score"]) for r in function_score_topk(
        df, ["apple"], factor_col="pop", boost_mode="replace", k=5
    ).orderBy("rank").collect()]
    assert rep[0] == (2, 100.0)
    # reciprocal modifier inverts the factor ordering
    rec = [r["doc_id"] for r in function_score_topk(
        df, ["apple"], factor_col="pop", modifier="reciprocal",
        boost_mode="replace", k=5
    ).orderBy("rank").collect()]
    assert rec[0] == 1


def test_completion_suggest_prefix_rank_by_weight(spark):
    from monstache_spark.operators.search import completion_suggest

    df = spark.createDataFrame(
        [(1, "spark spark spam spot table")], "doc_id long, text string"
    )
    out = [(r["suggestion"], r["weight"], r["rank"]) for r in
           completion_suggest(df, ["sp"], top_n=2).orderBy("rank").collect()]
    # weight desc (spark 2) then term asc (spam before spot); top_n cuts spot
    assert out == [("spark", 2, 1), ("spam", 1, 2)]
    # non-matching prefix yields nothing
    assert completion_suggest(df, ["zz"]).count() == 0
    # custom weights override corpus frequency (S10 escape hatch)
    vocab = spark.createDataFrame(
        [("spot", 100), ("spark", 1)], "term string, weight long"
    )
    custom = [(r["suggestion"], r["rank"]) for r in
              completion_suggest(df, ["sp"], top_n=2, vocab=vocab)
              .orderBy("rank").collect()]
    assert custom == [("spot", 1), ("spark", 2)]


def test_fuzzy_suggest_no_match_yields_nothing(spark):
    from monstache_spark.operators.search import fuzzy_suggest

    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    assert fuzzy_suggest(df, ["zzzzz"]).count() == 0


def test_hybrid_rrf_fuses_both_lists(spark):
    from monstache_spark.operators.search import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [(0, "query text here"), (1, "query query match"), (2, "unrelated words"),
         (3, "query appears once")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1.0, 0.05]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["doc_id"]: r for r in
           hybrid_rrf_topk(docs, emb, ["query"], 0, k=4, n_each=3).collect()}
    # doc 1: in both lists -> two RRF terms; doc 2: cosine-only; doc 3: both
    assert out[1]["bm25_rank"] is not None and out[1]["cos_rank"] is not None
    assert out[2]["bm25_rank"] is None and out[2]["cos_rank"] is not None
    # a doc present in both lists outranks one present in one list at
    # comparable positions
    assert out[1]["rrf_score"] > out[2]["rrf_score"]


def test_percolate_multi_match_and_none(spark):
    from monstache_spark.operators.search import percolate

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (3, "a", 99.0)],
        "doc_id long, kind string, v double",
    )
    stored = {
        "is_a": {"term": {"kind": "a"}},
        "big": {"range": {"v": {"gte": 50.0}}},
    }
    got = sorted((r["doc_id"], r["query_name"]) for r in percolate(df, stored).collect())
    # doc 3 matches both stored queries; doc 1 one; doc 2 one
    assert got == [(1, "is_a"), (2, "big"), (3, "big"), (3, "is_a")]


def test_anchor_terms_extraction_rules():
    from monstache_spark.operators.search import _anchor_terms

    # match on text: its token set
    assert _anchor_terms({"match": {"text": "big fast"}}, "text") == {"big", "fast"}
    # match_phrase: first token is the necessary one
    assert _anchor_terms({"match_phrase": {"text": "fast join"}}, "text") == {"fast"}
    # must: first conjunct that yields an anchor
    assert _anchor_terms(
        {"bool": {"must": [{"range": {"v": {"gte": 1}}},
                           {"match": {"text": "spark"}}]}}, "text"
    ) == {"spark"}
    # should-only: union of children, poisoned by an anchor-less child
    assert _anchor_terms(
        {"bool": {"should": [{"match": {"text": "a"}},
                             {"match": {"text": "b"}}]}}, "text"
    ) == {"a", "b"}
    assert _anchor_terms(
        {"bool": {"should": [{"match": {"text": "a"}},
                             {"range": {"v": {"gte": 1}}}]}}, "text"
    ) is None
    # non-text fields / must_not: no anchor
    assert _anchor_terms({"match": {"title": "x"}}, "text") is None
    assert _anchor_terms({"bool": {"must_not": [{"match": {"text": "x"}}]}}, "text") is None


def test_percolate_indexed_equals_plain_percolate(spark):
    from monstache_spark.operators.search import percolate, percolate_indexed

    df = spark.createDataFrame(
        [
            (1, "spark table join", "en", 10.0),
            (2, "hash merge scan", "de", 99.0),
            (3, "fast join here", "en", 50.0),
            (4, "nothing relevant", "fr", 99.0),
        ],
        "doc_id long, text string, lang string, v double",
    )
    stored = {
        "st": {"bool": {"must": [{"match": {"text": "spark"}},
                                 {"match": {"text": "table"}}]}},
        "hm": {"bool": {"should": [{"match": {"text": "hash"}},
                                   {"match": {"text": "merge"}}]}},
        "fj": {"match_phrase": {"text": "fast join"}},
        "big": {"range": {"v": {"gte": 60.0}}},   # anchor-less -> verify-all
    }
    plain = sorted((r["doc_id"], r["query_name"])
                   for r in percolate(df, stored).collect())
    for gs in (1, 2, 16):
        idx = sorted((r["doc_id"], r["query_name"])
                     for r in percolate_indexed(df, stored, group_size=gs).collect())
        assert idx == plain
    assert (1, "st") in plain and (4, "big") in plain


def test_rank_eval_perfect_and_zero_retrieval(spark):
    from monstache_spark.operators.search import rank_eval

    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "apple tart"), (3, "banana bread")],
        "doc_id long, text string",
    )
    judgments = spark.createDataFrame(
        [("qa", 1, 1.0), ("qa", 2, 1.0), ("qb", 3, 1.0)],
        "query_id string, doc_id long, grade double",
    )
    out = {r["query_id"]: r for r in rank_eval(
        docs, {"qa": ["apple"], "qb": ["apple"]}, judgments, k=2
    ).collect()}
    # qa: both retrieved docs relevant -> precision 10000bp, mrr 1, ndcg 1
    assert out["qa"]["precision_bp"] == 10000
    assert out["qa"]["mrr"] == 1.0 and out["qa"]["ndcg"] == 1.0
    # qb: 'apple' never retrieves doc 3 -> zero metrics
    assert out["qb"]["n_relevant_at_k"] == 0
    assert out["qb"]["mrr"] == 0.0 and out["qb"]["ndcg"] == 0.0


def test_bm25_search_after_pages_cover_all_without_overlap(spark):
    df = _docs(spark)
    p1 = bm25_topk(df, ["spark", "data"], k=2).orderBy("rank").collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    p2 = bm25_topk(df, ["spark", "data"], k=10, search_after=cursor).orderBy("rank").collect()
    ids1 = [r["doc_id"] for r in p1]
    ids2 = [r["doc_id"] for r in p2]
    full = [r["doc_id"] for r in bm25_topk(df, ["spark", "data"], k=10).orderBy("rank").collect()]
    assert ids1 + ids2 == full          # pages concatenate to the full ranking
    assert p2[0]["rank"] == 1            # page rank restarts, as in ES


def test_ids_and_multi_match_leaves(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta", "x y"), (2, "gamma", "alpha z"), (3, "none", "here")],
        "doc_id long, title string, body string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"ids": {"values": [1, 3], "field": "doc_id"}}
    ).collect()}
    assert got == {1, 3}
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"multi_match": {"query": "ALPHA", "fields": ["title", "body"]}}
    ).collect()}
    assert got == {1, 2}  # matches in either field, case-insensitive


def test_minimum_should_match_string_and_percent_forms(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha only here"), (3, "unrelated words")],
        "doc_id long, text string",
    )
    shoulds = [
        {"match": {"text": "alpha"}},
        {"match": {"text": "beta"}},
        {"match": {"text": "gamma"}},
    ]
    for msm, expect in [(2, {1}), ("2", {1}), ("67%", {1}),
                        ("100%", {1}), (1, {1, 2}), ("-2", {1, 2})]:
        got = {r["doc_id"] for r in bool_query_filter(
            df, {"bool": {"should": shoulds, "minimum_should_match": msm}}
        ).collect()}
        assert got == expect, (msm, got)


def test_percolate_indexed_accepts_string_msm(spark):
    from monstache_spark.operators.search import percolate_indexed

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    out = percolate_indexed(
        df,
        {"q1": {"bool": {"should": [{"match": {"text": "alpha"}},
                                    {"match": {"text": "gamma"}}],
                         "minimum_should_match": "1"}}},
    ).collect()
    assert {(r["doc_id"], r["query_name"]) for r in out} == {(1, "q1"), (2, "q1")}


def test_nested_query_per_element_scope(spark):
    # per-element conjunction: doc 2 has qty>=5 and flag='R' on
    # DIFFERENT elements — flattened semantics would match it, nested
    # must not
    df = spark.createDataFrame(
        [
            (1, "F", [(5, "R"), (1, "N")]),
            (2, "F", [(9, "N"), (1, "R")]),
            (3, "O", [(7, "R")]),
            (4, "F", []),
            (5, "F", None),
        ],
        "doc_id long, status string, items array<struct<qty:long,flag:string>>",
    )
    q = {"nested": {"path": "items", "query": {"bool": {"must": [
        {"range": {"items.qty": {"gte": 5}}},
        {"term": {"items.flag": "R"}},
    ]}}}}
    got = {r["doc_id"] for r in bool_query_filter(df, q).collect()}
    assert got == {1, 3}
    # composes inside a bool tree with parent-level predicates
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"bool": {"must": [{"term": {"status": "F"}}, q]}}
    ).collect()}
    assert got == {1}


def test_nested_aggs_counts_elements(spark):
    from monstache_spark.operators.aggs import nested_aggs

    df = spark.createDataFrame(
        [
            (1, "F", [(5, "R"), (1, "R")]),
            (2, "O", [(9, "N")]),
            (3, "F", []),
        ],
        "doc_id long, status string, items array<struct<qty:long,flag:string>>",
    )
    out = {r["by_flag"]: (r["doc_count"], r["total_qty"]) for r in nested_aggs(
        df, "items",
        {"by_flag": {"terms": {"field": "items.flag"},
                     "aggs": {"total_qty": {"sum": {"field": "items.qty"}}}}},
    ).collect()}
    assert out == {"R": (2, 6.0), "N": (1, 9.0)}
    filtered = nested_aggs(
        df, "items",
        {"by_flag": {"terms": {"field": "flag"}}},
        parent_filter={"term": {"status": "F"}},
    ).collect()
    assert {r["by_flag"]: r["doc_count"] for r in filtered} == {"R": 2}


def test_match_phrase_slop_two_token_transposition(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),      # in-order, gap 1
            (2, "fox quick"),                # adjacent swap: cost 2
            (3, "fox jumped over quick"),    # swap spread 3: cost 4
            (4, "quick fox"),                # exact
            (5, "no animals here"),
        ],
        "doc_id long, text string",
    )

    def hits(slop):
        return {r["doc_id"] for r in bool_query_filter(
            df, {"match_phrase": {"text": {"query": "quick fox", "slop": slop}}}
        ).collect()}

    assert hits(0) == {4}
    assert hits(1) == {1, 4}          # swap costs 2, still out at slop 1
    assert hits(2) == {1, 2, 4}       # adjacent swap admitted at 2
    assert hits(4) == {1, 2, 3, 4}    # spread-3 swap costs 4
    # n=3 reversal now admitted at its movement cost (4)
    rev = spark.createDataFrame([(1, "c b a")], "doc_id long, text string")
    got = {r["doc_id"] for r in bool_query_filter(
        rev, {"match_phrase": {"text": {"query": "a b c", "slop": 6}}},
    ).collect()}
    assert got == {1}
    got = {r["doc_id"] for r in bool_query_filter(
        rev, {"match_phrase": {"text": {"query": "a b c", "slop": 3}}},
    ).collect()}
    assert got == set()


def test_regexp_query_is_anchored(spark):
    df = spark.createDataFrame(
        [(1, "purchase"), (2, "purchases"), (3, "refund"), (4, "pur")],
        "doc_id long, kind string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"regexp": {"kind": "pur.*se"}}
    ).collect()}
    assert got == {1}  # anchored: 'purchases' has a trailing 's'
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"regexp": {"kind": {"value": "pur(chase)?s?"}}}
    ).collect()}
    assert got == {1, 2, 4}


def test_phrase_suggest_bigram_rescoring(spark):
    from monstache_spark.operators.search import phrase_suggest

    df = spark.createDataFrame(
        [(1, "green house effect"), (2, "green house gas"), (3, "green horse"),
         (4, "grain house"), (5, "the green house")],
        "doc_id long, text string",
    )
    out = phrase_suggest(df, "grean hose", top_n=3).collect()
    assert out[0]["suggestion"] == "green house"   # bigram count 3 wins
    assert out[0]["bigram_count"] == 3 and out[0]["rank"] == 1
    sugg = {r["suggestion"] for r in out}
    assert "green horse" in sugg                   # attested bigram, 1 occurrence
    assert "grain house" not in sugg               # 'grain' is 2 edits from 'grean'
    assert all(r["d1"] <= 1 and r["d2"] <= 1 for r in out)


def test_percentile_ranks_exact_cdf(spark):
    from monstache_spark.operators.aggs import compile_aggs

    df = spark.createDataFrame(
        [(i, "a", float(v)) for i, v in enumerate([10, 20, 30, 40])],
        "id long, k string, v double",
    )
    out = compile_aggs(
        df,
        {"k": {"terms": {"field": "k"},
               "aggs": {"pr": {"percentile_ranks": {"field": "v",
                                                    "values": [25.0, 40.0]}}}}},
    ).collect()[0]
    assert out["pr_rank_25"] == 50.0     # 2 of 4 values <= 25
    assert out["pr_rank_40"] == 100.0


def test_significant_text_analyzer_hides_stopwords(spark):
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import significant_terms

    df = spark.createDataFrame(
        [(1, "en", "the spark joins the data"), (2, "en", "the spark joined data"),
         (3, "en", "the spark engine"),
         (4, "de", "the oven"), (5, "de", "the oven"), (6, "de", "the oven")],
        "doc_id long, lang string, text string",
    )
    fg = {"term": {"lang": "en"}}
    plain = {r["term"] for r in significant_terms(
        df, fg, size=20, min_doc_count=2
    ).collect()}
    assert "the" in plain                # raw tokens: 'the' surfaces
    analyzed = {r["term"] for r in significant_terms(
        df, fg, size=20, min_doc_count=2, analyzer=ENGLISH
    ).collect()}
    assert "the" not in analyzed         # stopword gone
    assert "join" in analyzed            # joins/joined collapse to one stem


def test_function_score_transcendental_modifiers(spark):
    import math

    from monstache_spark.operators.search import function_score_topk

    df = spark.createDataFrame(
        [(1, "spark data", 99.0), (2, "spark engine", 9.0), (3, "other", 0.0)],
        "doc_id long, text string, pop double",
    )
    out = {r["doc_id"]: r["func_value"] for r in function_score_topk(
        df, ["spark"], "pop", modifier="log1p", boost_mode="replace", k=5
    ).collect()}
    assert out[1] == round(math.log10(100.0), 4) == 2.0
    assert out[2] == 1.0
    sq = {r["doc_id"]: r["func_value"] for r in function_score_topk(
        df, ["spark"], "pop", modifier="sqrt", boost_mode="replace", k=5
    ).collect()}
    assert sq[1] == round(math.sqrt(99.0), 4)


def test_fuzzy_suggest_max_edits_2_true_dl(spark):
    from monstache_spark.operators.search import fuzzy_suggest

    df = spark.createDataFrame(
        [(1, "table stable tales tbale bale cable staple maple"),
         (2, "table table abc")],
        "doc_id long, text string",
    )
    out = fuzzy_suggest(df, ["talbe"], top_n=10, max_edits=2).collect()
    got = {r["suggestion"]: r["distance"] for r in out}
    # 'talbe'->'table' is ONE transposition; 'tbale' is also 1 swap
    # away? tbale->table: swap positions 1-2 ('tb'->'bt'? no:
    # t-b-a-l-e vs t-a-b-l-e: swap at 2-3 -> 1). 'tales': DL 2
    # (swap al->la? talbe->tables? len diff). 'bale': DL 2? talbe ->
    # bale: delete t -> albe? hmm; trust the engine: check key facts
    assert got["table"] == 1
    assert got["tbale"] == 2 or "tbale" in got  # within 2 either way
    assert "staple" not in got                  # DL('talbe','staple') > 2
    # unrestricted-DL case OSA gets wrong: 'ca' vs 'abc' is 2
    df2 = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    out2 = {r["suggestion"]: r["distance"] for r in fuzzy_suggest(
        df2, ["ca"], top_n=5, max_edits=2
    ).collect()}
    assert out2.get("abc") == 2
    # cross-check every returned distance against DuckDB's DL
    import duckdb

    con = duckdb.connect()
    for r in fuzzy_suggest(df, ["talbe", "ca", "abcd"], top_n=20, max_edits=2).collect():
        dl = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [r["query"], r["suggestion"]]
        ).fetchone()[0]
        assert dl == r["distance"], (r["query"], r["suggestion"], dl, r["distance"])


def test_match_operator_and_and_cross_fields(spark):
    df = spark.createDataFrame(
        [(1, "john", "smith"), (2, "john", "doe"), (3, "jane", "smith"),
         (4, "john smith", "x")],
        "doc_id long, first string, last string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match": {"first": {"query": "john smith", "operator": "and"}}}
    ).collect()}
    assert got == {4}  # both tokens must be in ONE field
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"multi_match": {"query": "john smith",
                             "fields": ["first", "last"],
                             "type": "cross_fields", "operator": "and"}}
    ).collect()}
    assert got == {1, 4}  # each term in at least one field
    # best_fields + and: one field must hold all terms
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"multi_match": {"query": "john smith",
                             "fields": ["first", "last"], "operator": "and"}}
    ).collect()}
    assert got == {4}


def test_simple_query_string_grammar(spark):
    df = spark.createDataFrame(
        [(1, "quick brown fox jumps"), (2, "quick fox"), (3, "brown bear"),
         (4, "quick brown cat"), (5, "lazy dog")],
        "doc_id long, text string",
    )

    def run(q, **kw):
        body = {"query": q, "fields": ["text"], **kw}
        return {r["doc_id"] for r in bool_query_filter(
            df, {"simple_query_string": body}
        ).collect()}

    assert run("quick brown") == {1, 2, 3, 4}          # OR default
    assert run("quick brown", default_operator="and") == {1, 4}
    assert run('+quick -fox') == {4}                    # must + must_not... 2 has fox; 1 has fox
    assert run('"quick brown" -cat') == {1}             # phrase + exclusion
    assert run('+brown "quick fox"') == set()           # phrase must co-occur? no doc has both


def test_fuzzy_query_leaf_with_transpositions(spark):
    df = spark.createDataFrame(
        [(1, "table"), (2, "tabel"), (3, "cable"), (4, "chairs"), (5, "tbl")],
        "doc_id long, kind string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"fuzzy": {"kind": {"value": "table", "fuzziness": 1}}}
    ).collect()}
    assert got == {1, 2, 3}      # tabel = one swap; cable = one sub
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"fuzzy": {"kind": {"value": "table", "fuzziness": 1,
                                "transpositions": False}}}
    ).collect()}
    assert got == {1, 3}          # swap costs 2 without transpositions
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"fuzzy": {"kind": "table"}}   # default fuzziness 2
    ).collect()}
    assert got == {1, 2, 3, 5}    # tbl = two deletions


def test_fuzzy_query_fuzziness_zero_is_exact(spark):
    # fuzziness:0 means exact match — 1-edit neighbors (incl. the
    # adjacent swap) must NOT match even with transpositions=true
    df = spark.createDataFrame(
        [(1, "table"), (2, "tabel"), (3, "cable"), (4, "tables")],
        "doc_id long, kind string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"fuzzy": {"kind": {"value": "table", "fuzziness": 0}}}
    ).collect()}
    assert got == {1}


def test_cross_fields_analyzer_stems_once(spark):
    # cross_fields + and with an analyzer: query tokens are analyzed
    # ONCE — double application would stem 'crossing'→'cross'→'cros'
    # and miss the doc whose stored token stemmed once to 'cross'
    from monstache_spark.functions.analyzer import ENGLISH

    df = spark.createDataFrame(
        [(1, "crossing", "guard"), (2, "cross", "roads"),
         (3, "crossed", "wires"), (4, "cats", "dogs")],
        "doc_id long, a string, b string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"multi_match": {"query": "crossing", "fields": ["a", "b"],
                             "type": "cross_fields", "operator": "and"}},
        analyzer=ENGLISH,
    ).collect()}
    # query 'crossing'→'cross' (ONE stem).  Stored: doc1 'crossing'→
    # 'cross', doc3 'crossed'→'cross' (match); doc2 'cross'→'cros'
    # (s-rule, symmetric on both sides, as ES would).  A double-stemmed
    # query ('cros') would instead match ONLY doc2 — the old bug.
    assert got == {1, 3}


def test_match_bool_prefix_search_as_you_type(spark):
    df = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quick brother"), (3, "brown quick"),
         (4, "quicksand brow")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match_bool_prefix": {"text": "quick bro"}}
    ).collect()}
    # 'quick' must be a full token; 'bro' a prefix of any token
    assert got == {1, 2, 3}


def test_collapse_inner_hits_groups_and_members(spark):
    from monstache_spark.operators.search import collapse_inner_hits

    df = spark.createDataFrame(
        [(1, "spark spark spark", "a"), (2, "spark spark", "a"),
         (3, "spark", "a"), (4, "spark spark", "b"), (5, "nothing", "b"),
         (6, "spark", "c")],
        "doc_id long, text string, src string",
    )
    out = collapse_inner_hits(df, ["spark"], "src", k=2, inner_size=2).collect()
    groups = {r["src"]: r["group_rank"] for r in out}
    assert groups == {"a": 1, "b": 2}          # c's best is weakest -> cut
    a_members = sorted((r["hit_rank"], r["doc_id"]) for r in out if r["src"] == "a")
    assert a_members == [(1, 1), (2, 2)]        # top-2 members only
    b_members = [(r["hit_rank"], r["doc_id"]) for r in out if r["src"] == "b"]
    assert b_members == [(1, 4)]                # doc 5 doesn't match at all


def test_fuzzy_suggest_analyzed_vocab_and_query(spark):
    # analyzer threading: the vocabulary is the ANALYZED stream
    # ('tables'->'table'... actually 'table'+'s' stems), and query
    # terms pass the same chain; a stop-word query yields nothing
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import fuzzy_suggest

    df = spark.createDataFrame(
        [(1, "the tables are joining"), (2, "tables joined"),
         (3, "cable")],
        "doc_id long, text string",
    )
    # vocab: tables->tabl (x2, es-rule), joining->join, are(stop)->x,
    # joined->join, cable->cabl
    out = fuzzy_suggest(
        df, ["tabel"], damerau=True, analyzer=ENGLISH
    ).collect()
    got = [(r["query"], r["suggestion"], r["count"], r["distance"])
           for r in out]
    # query 'tabel' analyzes to 'tabel' (no suffix), DL1 from 'tabl'
    assert got[0] == ("tabel", "tabl", 2, 1)
    # all-stop-word query: empty result, stable schema
    empty = fuzzy_suggest(df, ["the"], analyzer=ENGLISH)
    assert empty.count() == 0
    assert empty.columns == ["query", "suggestion", "count", "distance", "rank"]


def test_more_like_this_analyzed_no_double_stem(spark):
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import more_like_this

    df = spark.createDataFrame(
        [(1, "crossing wires quickly"), (2, "crossed wires found"),
         (3, "nothing shared here"), (4, "wires everywhere")],
        "doc_id long, text string",
    )
    out = more_like_this(
        df, 1, k=3, min_term_len=4, analyzer=ENGLISH
    ).collect()
    ids = [r["doc_id"] for r in out]
    # doc1 analyzes to cross/wir/quickly; min_term_len drops 'wir',
    # so the MLT terms are cross+quickly — doc2 shares 'cross'
    # (single stemming on both sides; a double-stemmed query 'cros'
    # would match nothing), docs 3/4 share nothing
    assert ids == [2]


def test_highlight_analyzed_tags_surface_forms(spark):
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import highlight_fragments

    df = spark.createDataFrame(
        [(1, "they crossed the road"), (2, "a crossing guard"),
         (3, "cross purposes"), (4, "crossword puzzles")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fragment"] for r in highlight_fragments(
        df, ["crossing"], analyzer=ENGLISH
    ).collect()}
    # stem 'cross': surface forms crossed/crossing (and 'crosses');
    # 'cross' itself analyzes to 'cros' so it is NOT a hit, nor is
    # the mid-word 'crossword'
    assert "<em>crossed</em>" in out[1]
    assert "<em>crossing</em>" in out[2]
    assert 3 not in out and 4 not in out


def test_phrase_suggest_analyzed_stream(spark):
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import phrase_suggest

    df = spark.createDataFrame(
        [(1, "green house effect"), (2, "the green house"),
         (3, "green horse racing"), (4, "grease house")],
        "doc_id long, text string",
    )
    # analyzed stream drops 'the', so 'green house' is adjacent in
    # doc 2 as well; 'grean hose' corrects via bigram rescoring
    out = phrase_suggest(df, "grean hose", analyzer=ENGLISH).collect()
    assert out[0]["suggestion"] == "green house"
    assert out[0]["bigram_count"] == 2


def test_fuzzy_token_search_vocab_semijoin(spark):
    from monstache_spark.operators.search import fuzzy_token_search

    df = spark.createDataFrame(
        [(1, "the table is big"), (2, "tabel layout"), (3, "cable tv"),
         (4, "nothing here"), (5, "vegetable soup")],
        "doc_id long, text string",
    )
    # DL1 of 'table': table, tabel (swap), cable (sub); not vegetable
    got = {r["doc_id"] for r in fuzzy_token_search(
        df, "table", fuzziness=1
    ).collect()}
    assert got == {1, 2, 3}
    # fuzziness 0: exact token only
    got = {r["doc_id"] for r in fuzzy_token_search(
        df, "table", fuzziness=0
    ).collect()}
    assert got == {1}
    # no transpositions: the swap costs 2, out at fuzziness 1
    got = {r["doc_id"] for r in fuzzy_token_search(
        df, "table", fuzziness=1, transpositions=False
    ).collect()}
    assert got == {1, 3}
    # DL2 widens to two edits
    got = {r["doc_id"] for r in fuzzy_token_search(
        df, "tble", fuzziness=2
    ).collect()}
    assert 1 in got and 3 in got
    # plan: edit work on vocab rows; corpus side is a semi-join chain
    plan = fuzzy_token_search(df, "table", fuzziness=1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "LeftSemi" in plan and "levenshtein" in plan


def test_fuzzy_token_search_analyzed(spark):
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import fuzzy_token_search

    df = spark.createDataFrame(
        [(1, "joining tables"), (2, "joint account"), (3, "nothing")],
        "doc_id long, text string",
    )
    # query 'joins' analyzes to 'join'; doc1's 'joining'->'join' (DL0),
    # doc2's 'joint' is DL1 from 'join'
    got = {r["doc_id"] for r in fuzzy_token_search(
        df, "joins", fuzziness=1, analyzer=ENGLISH
    ).collect()}
    assert got == {1, 2}


def test_fuzzy_token_search_rejects_fuzziness_over_two(spark):
    import pytest

    from monstache_spark.operators.search import fuzzy_token_search

    df = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    # ES caps fuzziness at 2; >2 would silently under-match (the
    # 2-deletion candidate keys don't cover distance-3 pairs)
    with pytest.raises(ValueError, match="fuzziness"):
        fuzzy_token_search(df, "alpha", fuzziness=3)


def test_fuzzy_token_search_multi_token_value_unions(spark):
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import fuzzy_token_search

    df = spark.createDataFrame(
        [(1, "joining things"), (2, "tables everywhere"), (3, "nothing")],
        "doc_id long, text string",
    )
    # a multi-word value analyzes to ('join', 'tabl'); matches are the
    # UNION over the analyzed tokens (doc1 via join, doc2 via tabl)
    got = {r["doc_id"] for r in fuzzy_token_search(
        df, "joins tables", fuzziness=1, analyzer=ENGLISH
    ).collect()}
    assert got == {1, 2}


def test_fuzzy_suggest_analyzed_keys_by_original_term(spark):
    from monstache_spark.functions.analyzer import ENGLISH
    from monstache_spark.operators.search import fuzzy_suggest

    df = spark.createDataFrame(
        [(1, "table join table"), (2, "join the table")],
        "doc_id long, text string",
    )
    rows = fuzzy_suggest(
        df, ["joinning"], damerau=True, analyzer=ENGLISH
    ).collect()
    # the stemmer rewrites 'joinning'->'joinn'; output must still be
    # keyed by the caller's original term, as ES keys suggester
    # entries by the suggest text
    assert rows and all(r["query"] == "joinning" for r in rows)
    assert rows[0]["suggestion"] == "join"


def test_fuzzy_leaf_routes_to_vocab_path_with_text_mapping(spark):
    from monstache_spark.operators.search import (
        bool_query_filter,
        fuzzy_token_search,
    )

    df = spark.createDataFrame(
        [(1, "tabel scan", "a"), (2, "table join", "a"), (3, "nothing", "b"),
         (4, "tuble here", "b")],
        "doc_id long, text string, source string",
    )
    q = {"fuzzy": {"text": {"value": "table", "fuzziness": 1}}}
    routed = bool_query_filter(df, q, mappings={"text": {"type": "text"}})
    direct = fuzzy_token_search(df, "table", fuzziness=1)
    assert ({r["doc_id"] for r in routed.collect()}
            == {r["doc_id"] for r in direct.collect()} == {1, 2, 4})
    # the routed plan is a pure predicate — no per-row levenshtein scan
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "levenshtein" not in plan


def test_fuzzy_leaf_keyword_or_unmapped_keeps_field_value_path(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "tabel"), (2, "tabel scan"), (3, "nothing")],
        "doc_id long, source string",
    )
    q = {"fuzzy": {"source": {"value": "table", "fuzziness": 1}}}
    # keyword mapping: the FIELD VALUE is the unit — 'tabel scan' is
    # NOT within 1 edit of 'table' as a whole value
    for mappings in ({"source": {"type": "keyword"}}, None, {}):
        got = {r["doc_id"] for r in
               bool_query_filter(df, q, mappings=mappings).collect()}
        assert got == {1}


def test_fuzzy_leaf_routed_composes_under_bool_contexts(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "tabel scan", "x"), (2, "table join", "y"), (3, "nothing", "x")],
        "doc_id long, text string, source string",
    )
    mp = {"text": {"type": "text"}}
    q = {"bool": {"must_not": [{"fuzzy": {"text": {"value": "table",
                                                   "fuzziness": 1}}}]}}
    got = {r["doc_id"] for r in bool_query_filter(df, q, mappings=mp).collect()}
    assert got == {3}
    q2 = {"bool": {"must": [{"term": {"source": "x"}}],
                   "filter": [{"fuzzy": {"text": "table"}}]}}
    got2 = {r["doc_id"] for r in bool_query_filter(df, q2, mappings=mp).collect()}
    assert got2 == {1}


def test_fuzzy_term_expansions_rank_and_cap(spark):
    from monstache_spark.operators.search import fuzzy_term_expansions

    df = spark.createDataFrame(
        [(1, "table cable"), (2, "table fable"), (3, "table gable")],
        "doc_id long, text string",
    )
    # distance 0 first, then df desc, term asc; cap truncates
    terms = fuzzy_term_expansions(df, "table", fuzziness=1)
    assert terms[0] == "table" and set(terms) == {"table", "cable", "fable", "gable"}
    assert fuzzy_term_expansions(df, "table", fuzziness=1, max_expansions=2) == [
        "table", "cable"]


def test_phrase_suggest_chain_three_tokens_viterbi(spark):
    from monstache_spark.operators.search import phrase_suggest

    df = spark.createDataFrame(
        [(1, "green house effect"), (2, "green house effect"),
         (3, "grean horse racing"), (4, "house effect studies")],
        "doc_id long, text string",
    )
    rows = phrase_suggest(df, "grean hose efect", top_n=3).collect()
    # 'green house' (2) + 'house effect' (3) = 5; the 'grean horse'
    # chain dies because no 'horse <efect-candidate>' bigram exists
    assert rows[0]["suggestion"] == "green house effect"
    assert rows[0]["score"] == 5 and rows[0]["rank"] == 1


def test_phrase_suggest_chain_four_tokens_and_prune_exactness(spark):
    from monstache_spark.operators.search import phrase_suggest

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "a x c d"), (4, "a x c y")],
        "doc_id long, text string",
    )
    rows = phrase_suggest(df, "a b c d", top_n=3).collect()
    got = [(r["suggestion"], r["score"]) for r in rows]
    # chains: a-b-c-d = 2+2+3 = 7; a-x-c-d = 2+2+3 = 7 (x within 1
    # edit of b? lev('b','x')=1 yes); tie breaks lexicographically
    assert got[0] == ("a b c d", 7)
    assert all(got[i][1] >= got[i + 1][1] for i in range(len(got) - 1))


def test_match_phrase_slop_repeated_terms_distinct_positions(spark):
    df = spark.createDataFrame(
        [
            (1, "hash join hash"),    # exact: cost 0
            (2, "hash join"),         # only ONE hash — must NOT match
            (3, "join hash hash"),    # unordered arrangement, cost 2
            (4, "hash x join y hash"),# gaps: x=(0,1,2) cost 2
            (5, "nothing here"),
        ],
        "id long, text string",
    )

    def ids(slop):
        return sorted(r["id"] for r in bool_query_filter(
            df, {"match_phrase": {"text": {"query": "hash join hash",
                                           "slop": slop}}}
        ).collect())

    assert ids(0) == [1]
    # doc 2 must never match: both query 'hash' occurrences would
    # need the SAME document position (the distinctness constraint)
    assert ids(2) == [1, 3, 4]
    assert 2 not in set(ids(6))


def test_match_phrase_slop_repeated_pair(spark):
    df = spark.createDataFrame(
        [(1, "to be to"), (2, "to be"), (3, "be to be to")],
        "id long, text string",
    )

    def ids(slop):
        return sorted(r["id"] for r in bool_query_filter(
            df, {"match_phrase": {"text": {"query": "to to", "slop": slop}}}
        ).collect())

    # 'to to' needs TWO distinct 'to' positions: doc1 has to@1,to@3
    # (x spread 2-0... qd=(0,1): picks (1,3) -> x=(1,2) cost 1);
    # doc2 has only one 'to'; doc3 to@2,to@4 -> cost 1
    assert ids(0) == []
    assert ids(1) == [1, 3]
    assert 2 not in set(ids(5))


def test_rescore_topk_combines_and_keeps_nonmatching(spark):
    import pytest

    from monstache_spark.operators.search import bm25_topk, rescore_topk

    df = spark.createDataFrame(
        [(0, "spark streams data fast"), (1, "slow batch job"),
         (2, "spark spark spark tuning"), (3, "data lake table scan"),
         (4, "the quick brown fox")],
        "doc_id long, text string",
    )
    prim = {r["doc_id"]: r["score"]
            for r in bm25_topk(df, ["spark", "data"], k=4).collect()}
    sec_full = {r["doc_id"]: r["score"]
                for r in bm25_topk(df, ["tuning"], k=5).collect()}
    out = {r["doc_id"]: r["score"] for r in rescore_topk(
        df, ["spark", "data"], ["tuning"], window_size=4, k=4,
        rescore_query_weight=2,
    ).collect()}
    # every primary-window doc survives; rescore adds 2x secondary
    assert set(out) == set(prim)
    for i, s in out.items():
        expect = round(prim[i] + 2 * sec_full.get(i, 0.0), 6)
        assert abs(s - expect) < 1e-9, (i, s, expect)
    # doc 2 (the only 'tuning' doc) must be promoted to rank 1
    top = rescore_topk(df, ["spark", "data"], ["tuning"],
                       window_size=4, k=1).collect()[0]
    assert top["doc_id"] == 2 and top["rank"] == 1
    with pytest.raises(ValueError):
        rescore_topk(df, ["spark"], ["x"], window_size=3, k=5)


def test_span_term_first_and_or(spark):
    df = spark.createDataFrame(
        [(1, "spark makes data fast"), (2, "the spark engine"),
         (3, "data then spark late here"), (4, "nothing")],
        "id long, text string",
    )

    def ids(q):
        return sorted(r["id"] for r in bool_query_filter(df, q).collect())

    assert ids({"span_term": {"text": "spark"}}) == [1, 2, 3]
    # span_first end=2: span must END at position <= 2 (0-based
    # starts) -> spark@0 (doc1, e=1), spark@1 (doc2, e=2); doc3's
    # spark@2 has e=3, out
    assert ids({"span_first": {"match": {"span_term": {"text": "spark"}},
                               "end": 2}}) == [1, 2]
    assert ids({"span_or": {"clauses": [
        {"span_term": {"text": "engine"}},
        {"span_term": {"text": "nothing"}}]}}) == [2, 4]


def test_span_near_ordered_gaps_and_unordered(spark):
    df = spark.createDataFrame(
        [(1, "hash join now"),          # gap 0
         (2, "hash x join"),            # gap 1
         (3, "hash x y z join"),        # gap 3
         (4, "join hash"),              # reversed
         (5, "hash only")],
        "id long, text string",
    )

    def near(slop, in_order):
        return sorted(r["id"] for r in bool_query_filter(df, {
            "span_near": {"clauses": [
                {"span_term": {"text": "hash"}},
                {"span_term": {"text": "join"}},
            ], "slop": slop, "in_order": in_order}
        }).collect())

    assert near(0, True) == [1]
    assert near(1, True) == [1, 2]
    assert near(3, True) == [1, 2, 3]
    # unordered admits the reversal at its own gap (0 here)
    assert near(0, False) == [1, 4]


def test_span_near_three_clauses_joint_gap(spark):
    df = spark.createDataFrame(
        [(1, "a b c"),        # gaps 0+0
         (2, "a x b c"),      # gaps 1+0
         (3, "a x b y c"),    # gaps 1+1
         (4, "c b a")],       # reversed
        "id long, text string",
    )
    q = lambda slop, o: {"span_near": {"clauses": [  # noqa: E731
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}},
        {"span_term": {"text": "c"}}], "slop": slop, "in_order": o}}

    def ids(slop, o):
        return sorted(r["id"] for r in bool_query_filter(df, q(slop, o)).collect())

    assert ids(0, True) == [1]
    assert ids(1, True) == [1, 2]
    assert ids(2, True) == [1, 2, 3]
    assert ids(0, False) == [1, 4]


def test_span_not_excludes_overlaps_and_composes(spark):
    df = spark.createDataFrame(
        [(1, "hash a join"),        # near-span [0,3) contains no merge
         (2, "hash merge join"),    # merge INSIDE the span -> excluded
         (3, "merge hash a join")], # merge outside the span -> kept
        "id long, text string",
    )
    q = {"span_not": {
        "include": {"span_near": {"clauses": [
            {"span_term": {"text": "hash"}},
            {"span_term": {"text": "join"}}], "slop": 1, "in_order": True}},
        "exclude": {"span_term": {"text": "merge"}},
    }}
    got = sorted(r["id"] for r in bool_query_filter(df, q).collect())
    assert got == [1, 3]
    # pre widening: doc3's merge sits 1 position before the span
    q2 = {**q}
    q2["span_not"] = {**q["span_not"], "pre": 1}
    got2 = sorted(r["id"] for r in bool_query_filter(df, q2).collect())
    assert got2 == [1]


def test_span_in_bool_context_and_analyzer(spark):
    from monstache_spark.functions.analyzer import ENGLISH

    df = spark.createDataFrame(
        [(1, "joining the tables"), (2, "tables everywhere"), (3, "joining x")],
        "id long, text string",
    )
    # analyzed span_term: 'joining'->'join' with positions BEFORE stop
    # removal; span_near join(0)..tabl(2) has gap 1 (the stop word)
    q = {"span_near": {"clauses": [
        {"span_term": {"text": "join"}},
        {"span_term": {"text": "tabl"}}], "slop": 1, "in_order": True}}
    got = sorted(r["id"] for r in bool_query_filter(df, q, analyzer=ENGLISH).collect())
    assert got == [1]
    # must_not composition
    q2 = {"bool": {"must": [{"span_term": {"text": "tables"}}],
                   "must_not": [{"span_term": {"text": "joining"}}]}}
    assert sorted(r["id"] for r in bool_query_filter(df, q2).collect()) == [2]


def test_match_fuzziness_routes_per_token_expansion(spark):
    import pytest

    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "tabel scan fast"), (2, "table join"), (3, "scanning here"),
         (4, "nothing"), (5, "scan table")],
        "doc_id long, text string",
    )
    mp = {"text": {"type": "text"}}
    q_or = {"match": {"text": {"query": "table scan", "fuzziness": 1}}}
    got = {r["doc_id"] for r in bool_query_filter(df, q_or, mappings=mp).collect()}
    # 'table'~1 -> {tabel, table}; 'scan'~1 -> {scan}; OR
    assert got == {1, 2, 5}
    q_and = {"match": {"text": {"query": "table scan", "fuzziness": 1,
                                "operator": "and"}}}
    got2 = {r["doc_id"] for r in bool_query_filter(df, q_and, mappings=mp).collect()}
    assert got2 == {1, 5}
    # unrouted match+fuzziness must refuse, not silently under-match
    with pytest.raises(ValueError, match="mappings"):
        bool_query_filter(df, q_or)


def test_fuzzy_term_expansions_multi_one_job_per_token_ranks(spark):
    from monstache_spark.operators.search import (
        fuzzy_term_expansions,
        fuzzy_term_expansions_multi,
    )

    df = spark.createDataFrame(
        [(1, "table cable table"), (2, "scan span table")],
        "doc_id long, text string",
    )
    multi = fuzzy_term_expansions_multi(df, ["table", "scan"], fuzziness=1)
    assert multi["table"] == fuzzy_term_expansions(df, "table", fuzziness=1)
    assert multi["scan"] == fuzzy_term_expansions(df, "scan", fuzziness=1)
    assert multi["table"][0] == "table" and multi["scan"][0] == "scan"


def test_resolve_date_math():
    from monstache_spark.operators.search import resolve_date_math

    now = "2024-01-15 17:45:30"
    assert resolve_date_math("now-7d/d", now) == "2024-01-08 00:00:00"
    assert resolve_date_math("now/d", now) == "2024-01-15 00:00:00"
    # left-to-right: round first, then subtract
    assert resolve_date_math("now/d-7d", now) == "2024-01-08 00:00:00"
    assert resolve_date_math("now-7d", now) == "2024-01-08 17:45:30"
    # /w floors to Monday (2024-01-15 IS a Monday)
    assert resolve_date_math("now/w", now) == "2024-01-15 00:00:00"
    assert resolve_date_math("now-1d/w", now) == "2024-01-08 00:00:00"
    # anchored date + month clamp (Jan 31 + 1M = Feb 29 in 2024)
    assert resolve_date_math("2024-01-31||+1M", now) == "2024-02-29 00:00:00"
    assert resolve_date_math("2024-01-05||+1y/M", now) == "2025-01-01 00:00:00"
    # minutes vs Months case sensitivity
    assert resolve_date_math("now+2m", now) == "2024-01-15 17:47:30"
    assert resolve_date_math("now+2M", now) == "2024-03-15 17:45:30"
    import pytest

    with pytest.raises(ValueError):
        resolve_date_math("now-7q", now)


def test_range_date_math_and_terms_lookup(spark):
    import datetime

    import pytest

    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1 + i, 12), f"u{i % 3}")
         for i in range(20)],
        "id long, ts timestamp, owner string",
    )
    q = {"range": {"ts": {"gte": "now-7d/d", "lt": "now/d"}}}
    got = {r["id"] for r in bool_query_filter(
        df, q, now="2024-01-15 17:45:00").collect()}
    # [2024-01-08 00:00, 2024-01-15 00:00): days 8..14 -> ids 7..13
    assert got == set(range(7, 14))

    # terms lookup: one stored doc's array becomes the terms list
    reg = spark.createDataFrame(
        [("fav", ["u0", "u2"]), ("empty", [])],
        "key string, owners array<string>",
    )
    lk = {"registry": (reg, "key")}
    q2 = {"terms": {"owner": {"index": "registry", "id": "fav",
                              "path": "owners"}}}
    got2 = {r["owner"] for r in bool_query_filter(df, q2, lookups=lk).collect()}
    assert got2 == {"u0", "u2"}
    # missing doc -> matches nothing
    q3 = {"terms": {"owner": {"index": "registry", "id": "nope",
                              "path": "owners"}}}
    assert bool_query_filter(df, q3, lookups=lk).count() == 0
    with pytest.raises(ValueError, match="lookups"):
        bool_query_filter(df, q2)


def test_intervals_match_and_composition(spark):
    df = spark.createDataFrame(
        [(1, "hash x join"), (2, "join hash"), (3, "hash a b c join"),
         (4, "merge vector here"), (5, "merge sort close"), (6, "sort far x y z merge")],
        "id long, text string",
    )

    def ids(q):
        return sorted(r["id"] for r in bool_query_filter(df, q).collect())

    # match, unordered by default, max_gaps bounds the gap sum
    q = {"intervals": {"text": {"match": {"query": "hash join",
                                          "max_gaps": 1}}}}
    assert ids(q) == [1, 2]   # doc3 gap is 3
    q2 = {"intervals": {"text": {"match": {"query": "hash join",
                                           "max_gaps": 1, "ordered": True}}}}
    assert ids(q2) == [1]     # reversal out under ordered
    # default max_gaps -1 = unlimited
    q3 = {"intervals": {"text": {"match": {"query": "hash join"}}}}
    assert ids(q3) == [1, 2, 3]
    # all_of over [match merge, any_of(match sort, prefix vec)]
    q4 = {"intervals": {"text": {"all_of": {
        "intervals": [
            {"match": {"query": "merge"}},
            {"any_of": {"intervals": [
                {"match": {"query": "sort"}},
                {"prefix": {"prefix": "vec"}},
            ]}},
        ],
        "max_gaps": 1,
    }}}}
    assert ids(q4) == [4, 5]  # doc6's sort..merge gap is 4


def test_intervals_analyzed(spark):
    from monstache_spark.functions.analyzer import ENGLISH

    df = spark.createDataFrame(
        [(1, "joining the tables"), (2, "tables joined"), (3, "joining x")],
        "id long, text string",
    )
    # analyzed: join@0 .. tabl@2 (stop-word gap of 1)
    q = {"intervals": {"text": {"match": {"query": "joins tables",
                                          "max_gaps": 1, "ordered": True}}}}
    got = sorted(r["id"] for r in bool_query_filter(df, q, analyzer=ENGLISH).collect())
    assert got == [1]


def test_distance_feature_numeric_date_geo(spark):
    import datetime

    from monstache_spark.operators.search import distance_feature_topk

    df = spark.createDataFrame(
        [(1, "spark engine", 100.0, datetime.datetime(2024, 1, 10), 52.52, 13.405),
         (2, "spark engine", 300.0, datetime.datetime(2024, 1, 1), 48.85, 2.35),
         (3, "other stuff", 300.0, datetime.datetime(2024, 1, 10), 52.52, 13.405)],
        "doc_id long, text string, size double, ts timestamp, lat double, lon double",
    )
    # numeric: doc2 sits AT the origin -> feature = boost/1... pivot/(pivot+0)=1
    out = {r["doc_id"]: r for r in distance_feature_topk(
        df, ["spark"], field="size", origin=300.0, pivot=100.0, k=5
    ).collect()}
    assert set(out) == {1, 2}   # doc3 doesn't match the query
    assert out[2]["feature"] == 1.0
    assert abs(out[1]["feature"] - 100.0 / 300.0) < 1e-6
    assert out[2]["score"] > out[1]["score"]
    # date: pivot 7d; doc1 at the origin
    out2 = {r["doc_id"]: r["feature"] for r in distance_feature_topk(
        df, ["spark"], field="ts", origin="2024-01-10 00:00:00", pivot="7d", k=5
    ).collect()}
    assert out2[1] == 1.0 and 0.4 < out2[2] < 0.5  # 9d vs 7d pivot
    # geo: pivot 100km around Berlin
    out3 = {r["doc_id"]: r["feature"] for r in distance_feature_topk(
        df, ["spark"], origin={"lat": 52.52, "lon": 13.405}, pivot="100km",
        lat_col="lat", lon_col="lon", k=5
    ).collect()}
    assert out3[1] == 1.0 and out3[2] < 0.15  # Paris ~880 km away


def test_pinned_topk_order_and_dedup(spark):
    from monstache_spark.operators.search import pinned_topk

    df = spark.createDataFrame(
        [(0, "spark streams data"), (1, "slow batch"), (2, "spark spark"),
         (3, "data lake"), (4, "quick fox")],
        "doc_id long, text string",
    )
    rows = pinned_topk(df, [4, 2, 99], ["spark", "data"], k=5).collect()
    ids = [r["doc_id"] for r in rows]
    # pins first in GIVEN order (99 absent -> skipped; 4 doesn't match
    # the query but still pins); organic follows by BM25, doc2 deduped
    assert ids[:2] == [4, 2]
    assert rows[0]["pinned"] and rows[0]["score"] is None
    assert set(ids[2:]) == {0, 3} and all(not r["pinned"] for r in rows[2:])
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_more_like_this_multi_like_and_unlike(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"),
         (1, "alpha beta echo foxtrot"),
         (2, "alpha beta gamma echo"),
         (3, "zulu yankee xray whiskey"),
         (4, "gamma delta echo foxtrot")],
        "doc_id long, text string",
    )
    # multi-like [0,1]: shared terms (alpha, beta) dominate selection
    out = {r["doc_id"] for r in more_like_this(
        df, [0, 1], k=5, max_query_terms=2, min_term_len=4).collect()}
    assert 2 in out and 3 not in out
    assert out.isdisjoint({0, 1})  # like docs excluded from results
    # unlike doc 4 bans gamma/delta/echo/foxtrot from selection
    out2 = [r["doc_id"] for r in more_like_this(
        df, [0, 1], k=5, max_query_terms=4, min_term_len=4,
        unlike_ids=[4]).collect()]
    assert 2 in out2 and 4 not in out2
    # scalar like_id keeps its historical behavior
    a = [(r["doc_id"], r["score"]) for r in
         more_like_this(df, 0, k=3, min_term_len=4).collect()]
    b = [(r["doc_id"], r["score"]) for r in
         more_like_this(df, [0], k=3, min_term_len=4).collect()]
    assert a == b


def test_combined_fields_term_centric(spark):
    import math

    from monstache_spark.operators.search import combined_fields_topk

    df = spark.createDataFrame(
        [(1, "alpha beta", "alpha"), (2, "alpha alpha", "gamma"),
         (3, "delta", "beta"), (4, "zz yy", "xx")],
        "doc_id long, text string, title string",
    )
    out = {r["doc_id"]: r["score"] for r in combined_fields_topk(
        df, ["alpha"], {"text": 1.0, "title": 2.0}, k=4).collect()}
    # reference computation of the combined statistics
    tf = {1: 1 + 2.0, 2: 2.0, 4: 0.0}
    dl = {1: 2 + 2.0, 2: 2 + 2.0, 3: 1 + 2.0, 4: 2 + 2.0}
    n, avgdl = 4.0, sum(dl.values()) / 4
    dfreq = 2  # docs 1 and 2 contain 'alpha' in ANY field
    idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    for d in (1, 2):
        w = idf * tf[d] * 2.2 / (tf[d] + 1.2 * (1 - 0.75 + 0.75 * dl[d] / avgdl))
        assert abs(out[d] - round(w, 6)) < 1e-9, (d, out[d], w)
    assert set(out) == {1, 2}
    # term-centric: doc1 (one per field) must outscore doc2 (two in
    # the lighter field) under these weights
    assert out[1] > out[2]


def test_span_containing_and_within(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "hash join sort merge scan"),
         (2, "sort hash join table"),
         (3, "the quick brown fox"),
         (4, "hash table join of sorts")],
        "doc_id long, text string",
    )
    big = {"span_near": {"clauses": [
        {"span_term": {"text": "hash"}}, {"span_term": {"text": "join"}}],
        "slop": 2, "in_order": False}}
    little = {"span_term": {"text": "table"}}

    def ids(q):
        return sorted(r["doc_id"] for r in bool_query_filter(df, q).collect())

    # doc4: unordered near(hash@0, join@2) span (0,3) contains table@1;
    # doc2: near(hash@1, join@2) span (1,3) does NOT contain table@3
    assert ids({"span_containing": {"big": big, "little": little}}) == [4]
    assert ids({"span_within": {"big": big, "little": little}}) == [4]


def test_span_multi_term_predicates(spark):
    import pytest

    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "hash join sort merge"), (2, "hash jolt"), (3, "hash joint leap"),
         (4, "join hash")],
        "doc_id long, text string",
    )

    def ids(q):
        return sorted(r["doc_id"] for r in bool_query_filter(df, q).collect())

    near = lambda m, slop, order=True: {"span_near": {"clauses": [  # noqa: E731
        {"span_term": {"text": "hash"}}, {"span_multi": {"match": m}}],
        "slop": slop, "in_order": order}}

    # wildcard jo*t: jolt, joint — adjacent after hash
    assert ids(near({"wildcard": {"text": "jo*t"}}, 0)) == [2, 3]
    # prefix jo: join@1/jolt/joint all adjacent after hash@0
    assert ids(near({"prefix": {"text": "jo"}}, 0)) == [1, 2, 3]
    # regexp implicitly anchored: jo.n matches join/jo1n but not joint
    assert ids(near({"regexp": {"text": "jo.n"}}, 0)) == [1]
    with pytest.raises(ValueError, match="fuzzy"):
        bool_query_filter(df, near({"fuzzy": {"text": "join"}}, 0))


def test_match_phrase_prefix(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "hash join sort"), (2, "hash joint venture"), (3, "hash sort join"),
         (4, "join hash"), (5, "nothing jo")],
        "doc_id long, text string",
    )

    def ids(q):
        return sorted(r["doc_id"] for r in bool_query_filter(
            df, {"match_phrase_prefix": {"text": q}}).collect())

    # consecutive: last token prefix-matches ANY completion (no
    # max_expansions cap)
    assert ids("hash jo") == [1, 2]
    # slop admits movement/swap (min-movement contract)
    assert ids({"query": "hash jo", "slop": 2}) == [1, 2, 3, 4]
    # single-token query: plain prefix exists
    assert ids("jo") == [1, 2, 3, 4, 5]


def test_wrapper_query(spark):
    import base64
    import json

    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "en", 100), (2, "de", 900), (3, "en", 900)],
        "doc_id long, lang string, n_chars long",
    )
    inner = {"bool": {"must": [{"term": {"lang": "en"}},
                               {"range": {"n_chars": {"gte": 500}}}]}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    got = sorted(r["doc_id"] for r in bool_query_filter(
        df, {"wrapper": {"query": b64}}).collect())
    assert got == [3]


def test_rank_feature_topk(spark):
    import math

    import pytest

    from monstache_spark.operators.search import (
        bool_query_filter,
        rank_feature_topk,
    )

    df = spark.createDataFrame(
        [(1, 100), (2, 400), (3, None), (4, 0), (5, 900)],
        "doc_id long, pagerank long",
    )
    # filter context: positive feature present
    got = sorted(r["doc_id"] for r in bool_query_filter(
        df, {"rank_feature": {"field": "pagerank"}}).collect())
    assert got == [1, 2, 5]

    out = rank_feature_topk(df, "pagerank", k=2, pivot=100).collect()
    assert [(r["doc_id"], r["score"], r["rank"]) for r in out] == [
        (5, 0.9, 1), (2, 0.8, 2)]

    logd = {r["doc_id"]: r["score"]
            for r in rank_feature_topk(df, "pagerank", k=5, function="log",
                                       scaling_factor=2.0).collect()}
    assert logd[5] == round(round(math.log(2 * 900 + 1), 4), 6)

    with pytest.raises(ValueError, match="pivot"):
        rank_feature_topk(df, "pagerank", function="saturation")


def test_script_score_topk(spark):
    from monstache_spark.operators.search import bm25_topk, script_score_topk

    df = spark.createDataFrame(
        [(1, "hash join", 100), (2, "hash table scan", 900),
         (3, "no match here", 500), (4, "hash hash hash", 300)],
        "doc_id long, text string, n_chars long",
    )
    out = script_score_topk(
        df, {"match": {"text": "hash"}}, "n_chars / (n_chars + 100.0)", k=3)
    got = [(r["doc_id"], r["score"]) for r in out.collect()]
    assert got == [(2, 0.9), (4, 0.75), (1, 0.5)]

    # min_score drops the tail
    out = script_score_topk(
        df, {"match": {"text": "hash"}}, "n_chars / (n_chars + 100.0)",
        k=3, min_score=0.6)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 4]

    # _score binding: BM25 of the scoring terms feeds the script
    bm = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["hash"], k=4).collect()}
    out = script_score_topk(
        df, {"match": {"text": "hash"}}, "_score * 10", query_terms=["hash"], k=3)
    for r in out.collect():
        assert abs(r["score"] - round(bm[r["doc_id"]] * 10, 6)) < 1e-9


def test_significant_terms_heuristics_reference(spark):
    import math

    import pytest

    from monstache_spark.operators.search import significant_terms

    df = spark.createDataFrame(
        [(1, "a", "x y"), (2, "a", "x z"), (3, "a", "x y z"),
         (4, "b", "z w"), (5, "b", "w y"), (6, "b", "w")],
        "doc_id long, lang string, text string",
    )
    fg = {"term": {"lang": "a"}}

    def scores(h):
        return {r["term"]: r["score"] for r in significant_terms(
            df, fg, size=10, min_doc_count=1, heuristic=h).collect()}

    # contingency for 'x': n11=3 n10=0 n01=0 n00=3, fgt=3, bgt=6
    pct = scores("percentage")
    assert pct["x"] == 1.0 and pct["y"] == round(2 / 3, 6)

    chi = scores("chi_square")
    # chi2 for x: N*(3*3-0*0)^2/((3)*(3)*(3)*(3)) = 6*81/81 = 6
    assert chi["x"] == 6.0
    # 'w' is fg-absent -> min_doc_count=1 keeps fg_count>=1 only
    assert "w" not in chi

    mi = scores("mutual_information")
    ref = 0.0
    for nxy, row, col in ((3, 3, 3), (0, 3, 3), (0, 3, 3), (3, 3, 3)):
        if nxy:
            ref += (nxy / 6) * math.log2(6 * nxy / (row * col))
    assert mi["x"] == round(ref, 4)
    # 'y': n11=2/fgt=3 vs bg 3/6 -> over-represented, positive
    assert mi["y"] > 0

    gnd = scores("gnd")
    # x: fx=3, fy=3, fxy=3 -> gnd=0 -> exp(0)=1
    assert gnd["x"] == 1.0

    with pytest.raises(ValueError, match="heuristic"):
        significant_terms(df, fg, heuristic="bayes")


def test_span_field_masking_cross_field_near(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "hash join table", "alt text one"),
         (2, "sort hash merge", "hash here too"),
         (3, "scan scan", "hash early")],
        "doc_id long, text string, alt string",
    )
    q = {"span_near": {"clauses": [
        {"span_term": {"text": "hash"}},
        {"span_field_masking": {"query": {"span_term": {"alt": "hash"}},
                                "field": "text"}}],
        "slop": 3, "in_order": False}}
    got = sorted(r["doc_id"] for r in bool_query_filter(df, q).collect())
    # doc2: text hash@1, alt hash@0 -> near under independent
    # positions (the documented Lucene masking caveat); doc3 has no
    # 'hash' in text
    assert got == [2]


def test_sparse_vector_topk_weighted_tf(spark):
    import pytest

    from monstache_spark.operators.search import sparse_vector_topk

    df = spark.createDataFrame(
        [(1, "hash join table"), (2, "sort hash merge"),
         (3, "scan scan scan"), (4, "hash hash")],
        "doc_id long, text string",
    )
    out = sparse_vector_topk(df, {"hash": 2.0, "scan": 0.5}, k=4)
    got = [(r["doc_id"], r["score"]) for r in out.collect()]
    # doc4: tf(hash)=2 * 2.0 = 4; doc1/doc2: 2; doc3: 3 * 0.5 = 1.5
    assert got == [(4, 4.0), (1, 2.0), (2, 2.0), (3, 1.5)]
    with pytest.raises(ValueError, match="non-empty"):
        sparse_vector_topk(df, {})


def test_geo_shape_envelope_polygon_relations(spark):
    import pytest

    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 50.0, 60.0), (3, 0.0, 0.0)],
        "id long, lat double, lon double",
    ).withColumn("loc", F.struct("lat", "lon"))

    env = {"geo_shape": {"loc": {"shape": {
        "type": "envelope", "coordinates": [[15.0, 15.0], [25.0, 5.0]]},
        "relation": "intersects"}}}
    assert sorted(r["id"] for r in bool_query_filter(df, env).collect()) == [1]
    env["geo_shape"]["loc"]["relation"] = "disjoint"
    assert sorted(r["id"] for r in bool_query_filter(df, env).collect()) == [2, 3]

    poly = {"geo_shape": {"loc": {"shape": {
        "type": "polygon",
        "coordinates": [[[15.0, 5.0], [25.0, 5.0], [25.0, 15.0],
                         [15.0, 15.0], [15.0, 5.0]]]},
        "relation": "within"}}}
    assert sorted(r["id"] for r in bool_query_filter(df, poly).collect()) == [1]

    with pytest.raises(ValueError, match="relation"):
        bool_query_filter(df, {"geo_shape": {"loc": {
            "shape": {"type": "envelope", "coordinates": [[0, 1], [1, 0]]},
            "relation": "touches"}}})


def test_has_child_and_has_parent(spark):
    from monstache_spark.operators.search import (
        has_child_filter,
        has_parent_filter,
    )

    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTO"), (3, "BUILDING"), (4, "AUTO")],
        "c_custkey long, seg string")
    orders = spark.createDataFrame(
        [(10, 1, "F"), (11, 1, "F"), (12, 2, "F"), (13, 3, "O"), (14, 99, "F")],
        "o_orderkey long, o_custkey long, st string")

    out = has_child_filter(cust, orders, "c_custkey", "o_custkey",
                           {"term": {"st": "F"}}, min_children=2)
    assert sorted(r["c_custkey"] for r in out.collect()) == [1]
    # max_children bounds the band; parent columns unchanged
    out = has_child_filter(cust, orders, "c_custkey", "o_custkey",
                           {"term": {"st": "F"}}, min_children=1,
                           max_children=1)
    assert sorted(r["c_custkey"] for r in out.collect()) == [2]
    assert out.columns == cust.columns

    out = has_parent_filter(orders, cust, "c_custkey", "o_custkey",
                            {"term": {"seg": "BUILDING"}})
    # order 14's parent does not exist -> drops (as in ES)
    assert sorted(r["o_orderkey"] for r in out.collect()) == [10, 11, 13]
    assert out.columns == orders.columns


def test_runtime_mappings_queryable_not_stored(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame([(1, 100.0), (2, 300.0), (3, 250.0)],
                               "id long, price double")
    out = bool_query_filter(
        df,
        {"bool": {"must": [{"term": {"band": "high"}},
                           {"range": {"price": {"lt": 280.0}}}]}},
        runtime_mappings={
            "band": "CASE WHEN price > 200 THEN 'high' ELSE 'low' END"},
    )
    assert sorted(r["id"] for r in out.collect()) == [3]
    # runtime fields are queryable but never stored
    assert out.columns == ["id", "price"]


def test_multi_match_phrase_types(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "hash join table", "nothing here"),
         (2, "other words", "hash join now"),
         (3, "hash x join", "join hash"),
         (4, "hash joint", "x")],
        "id long, a string, b string",
    )

    def ids(body):
        return sorted(r["id"] for r in bool_query_filter(
            df, {"multi_match": body}).collect())

    # phrase: consecutive in ANY of the fields
    assert ids({"query": "hash join", "fields": ["a", "b"],
                "type": "phrase"}) == [1, 2]
    # phrase with slop admits the gap/swap
    assert ids({"query": "hash join", "fields": ["a", "b"],
                "type": "phrase", "slop": 2}) == [1, 2, 3]
    # phrase_prefix: last token as a prefix
    assert ids({"query": "hash jo", "fields": ["a", "b"],
                "type": "phrase_prefix"}) == [1, 2, 4]
    # bool_prefix: terms anywhere + last-token prefix
    assert ids({"query": "join ha", "fields": ["a", "b"],
                "type": "bool_prefix"}) == [1, 2, 3]


def test_intervals_filters_and_wildcard(spark):
    import pytest

    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "beta alpha delta"),
         (3, "alpha gamma beta"), (4, "alpha delta")],
        "id long, text string")

    def ids(rule):
        return sorted(r["id"] for r in bool_query_filter(
            df, {"intervals": {"text": rule}}).collect())

    window = {"all_of": {"intervals": [
        {"match": {"query": "alpha"}}, {"match": {"query": "gamma"}}],
        "max_gaps": 2, "ordered": False}}
    # containing: the alpha..gamma window must enclose a beta
    w = dict(window); w["all_of"] = dict(window["all_of"])
    w["all_of"]["filter"] = {"containing": {"match": {"query": "beta"}}}
    assert ids(w) == [1]
    w["all_of"]["filter"] = {"not_containing": {"match": {"query": "beta"}}}
    assert ids(w) == [3]
    # before / after relate the rule's intervals to another rule's
    assert ids({"match": {"query": "beta",
                "filter": {"before": {"match": {"query": "delta"}}}}}) == [1, 2]
    assert ids({"match": {"query": "beta",
                "filter": {"after": {"match": {"query": "alpha"}}}}}) == [1, 3]
    # not_overlapping IS span_not (ordered defaults false, so doc2's
    # 'beta alpha' is an adjacent unordered match too)
    assert ids({"match": {"query": "alpha beta", "max_gaps": 0,
                "filter": {"not_overlapping": {"match": {"query": "gamma"}}}}}) == [1, 2]
    # wildcard rule: one interval per admitted token
    assert ids({"wildcard": {"pattern": "ga*"}}) == [1, 3]
    with pytest.raises(ValueError, match="intervals filter"):
        ids({"match": {"query": "beta", "filter": {"overlapping": {"match": {"query": "x"}}}}})


def test_parent_id_leaf(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long")
    got = sorted(r["o_orderkey"] for r in bool_query_filter(
        df, {"parent_id": {"field": "o_custkey", "id": 1}}).collect())
    assert got == [10, 11]


def test_search_after_pages_are_disjoint_and_exhaustive(spark):
    from monstache_spark.operators.search import search_after

    df = spark.createDataFrame(
        [(i, float(100 - (i % 7))) for i in range(1, 41)], "id long, score double"
    )
    sort = [("score", "desc"), ("id", "asc")]
    seen, after = [], None
    for _ in range(5):
        page = search_after(df, sort, after, size=10).collect()
        if not page:
            break
        seen.extend((r["score"], r["id"]) for r in page)
        after = [page[-1]["score"], page[-1]["id"]]
    # pages concatenate to the full frame in exact sort order
    assert len(seen) == 40 and len(set(seen)) == 40
    assert seen == sorted(seen, key=lambda t: (-t[0], t[1]))
    import pytest as _pt

    with _pt.raises(ValueError, match="sort"):
        search_after(df, [], None, 10)
    with _pt.raises(ValueError, match="length"):
        search_after(df, sort, [1.0], 10)


def test_completion_contexts_filter_and_boost(spark):
    from monstache_spark.operators.search import completion_suggest

    docs = spark.createDataFrame(
        [(1, "spark spark", "a"), (2, "spark sprint", "b"), (3, "spark", "c")],
        "doc_id long, text string, source string",
    )
    out = completion_suggest(
        docs, ["sp"], top_n=3,
        context_field="source", context_values=["a", "b"],
        context_boosts={"b": 5},
    ).collect()
    got = {r["suggestion"]: r["weight"] for r in out}
    # doc 3 (source c) is excluded; spark = 2x1 (a) + 1x5 (b) = 7
    assert got == {"spark": 7, "sprint": 5}
    import pytest as _pt

    with _pt.raises(ValueError, match="context_values"):
        completion_suggest(docs, ["sp"], context_field="source")


def test_completion_contexts_fractional_boost(spark):
    """ES context boosts are floats — a 2.5 boost must contribute 2.5
    per occurrence (int() truncation would make it 2) and the summed
    weight comes back as double."""
    from monstache_spark.operators.search import completion_suggest

    docs = spark.createDataFrame(
        [(1, "spark spark", "a"), (2, "spark sprint", "b")],
        "doc_id long, text string, source string",
    )
    out = completion_suggest(
        docs, ["sp"], top_n=3,
        context_field="source", context_values=["a", "b"],
        context_boosts={"b": 2.5},
    )
    assert dict(out.dtypes)["weight"] == "double"
    got = {r["suggestion"]: r["weight"] for r in out.collect()}
    # spark = 2x1 (a) + 1x2.5 (b) = 4.5; sprint = 2.5
    assert got == {"spark": 4.5, "sprint": 2.5}


def test_termvectors_positions_and_stats(spark):
    from monstache_spark.operators.search import termvectors

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id long, text string"
    )
    out = {(r["doc_id"], r["term"]): r for r in termvectors(docs, [1, 2]).collect()}
    r = out[(1, "a")]
    assert r["term_freq"] == 2 and r["positions"] == [0, 2]
    assert r["doc_freq"] == 2 and r["ttf"] == 3  # doc 3 counts in stats
    assert out[(2, "c")]["positions"] == [1]
    assert (3, "a") not in out  # doc 3 not requested
    no_stats = termvectors(docs, [1], term_statistics=False)
    assert set(no_stats.columns) == {"doc_id", "term", "term_freq", "positions"}


def test_linear_retriever_minmax_and_weights(spark):
    from monstache_spark.operators.search import linear_retriever_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    out = linear_retriever_topk(
        docs, emb, ["alpha"], query_vec_id=0, weights=(2.0, 1.0),
        k=4, n_each=3,
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # minmax: each list rescaled to [0,1] over its own window; the
    # best lexical doc gets bm25_norm 1.0, the best semantic cos_norm 1.0
    assert max(r["bm25_norm"] for r in out if r["bm25_norm"] is not None) == 1.0
    assert by_id[1]["cos_norm"] == 1.0  # identical vector to the query
    # doc 3 matches no lexical term: bm25 contribution is 0, not null
    assert by_id[3]["bm25_norm"] is None and by_id[3]["score"] >= 0
    # ranks are dense and deterministic
    assert sorted(r["rank"] for r in out) == list(range(1, len(out) + 1))
    import pytest as _pt

    with _pt.raises(ValueError, match="normalizer"):
        linear_retriever_topk(docs, emb, ["a"], 0, normalizer="zscore")


def test_graph_explore_vertices_and_connections(spark):
    from monstache_spark.operators.graph import graph_explore

    df = spark.createDataFrame(
        [(1, "a", "x", 10.0), (2, "a", "x", 10.0), (3, "a", "y", 10.0),
         (4, "b", "y", 10.0), (5, "c", "z", 1.0)],
        "id long, f1 string, f2 string, v double",
    )
    out = graph_explore(
        df, {"range": {"v": {"gte": 5}}},
        [{"field": "f1", "size": 2}, {"field": "f2", "size": 10}],
    ).collect()
    vertices = {(r["field"], r["term"]): r["weight"]
                for r in out if r["kind"] == "vertex"}
    conns = {(r["term"], r["term2"]): r["weight"]
             for r in out if r["kind"] == "connection"}
    # seed excludes id 5; f1 keeps top-2 (a:3, b:1); c never appears
    assert vertices[("f1", "a")] == 3 and vertices[("f1", "b")] == 1
    assert ("f1", "c") not in vertices
    # connections only among kept vertices, exact co-occurrence counts
    assert conns == {("a", "x"): 2, ("a", "y"): 1, ("b", "y"): 1}
    import pytest as _pt

    with _pt.raises(ValueError, match="2 vertex"):
        graph_explore(df, None, [{"field": "f1"}])


def test_terms_enum_prefix_pagination(spark):
    from monstache_spark.operators.search import terms_enum

    df = spark.createDataFrame(
        [(1, "Apple"), (2, "apricot"), (3, "apex"), (4, "banana"),
         (5, "apex")],
        "id long, f string",
    )
    out = [r["term"] for r in terms_enum(df, "f", "ap", size=10).collect()]
    assert out == ["apex", "apricot"]  # distinct, sorted; 'Apple' is case-mismatched
    out = [r["term"] for r in terms_enum(
        df, "f", "ap", size=10, case_insensitive=True).collect()]
    assert out == ["Apple", "apex", "apricot"]
    # pagination resumes strictly after the cursor
    out = [r["term"] for r in terms_enum(
        df, "f", "", size=10, search_after="apex").collect()]
    assert out == ["apricot", "banana"]
    out = [r["term"] for r in terms_enum(
        df, "f", "", size=10, index_filter={"term": {"id": 4}}).collect()]
    assert out == ["banana"]


def test_field_caps_type_mapping(spark):
    from monstache_spark.operators.search import field_caps

    df = spark.createDataFrame(
        [(1, "x", 1.0, True, [1.0], [("a",)])],
        "id long, s string, d double, b boolean, "
        "arr array<double>, items array<struct<k string>>",
    )
    rows = {r[1]: r for r in field_caps({"t": df})}
    assert rows["id"][2] == "long" and rows["s"][2] == "keyword"
    assert rows["b"][2] == "boolean"
    # array element type with multi_value; array<struct> is nested
    assert rows["arr"][2:] == ("double", True, True, True)
    assert rows["items"][2] == "nested" and rows["items"][4] is False


def test_rule_query_criteria_and_actions(spark):
    from monstache_spark.operators.search import rule_query_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "beta"), (4, "alpha beta alpha")],
        "doc_id long, text string",
    )
    ruleset = [
        {"criteria": [{"type": "exact", "metadata": "seg", "values": ["pro"]}],
         "actions": {"pinned_ids": [3]}},
        {"criteria": [{"type": "contains", "metadata": "q", "values": ["alp"]}],
         "actions": {"excluded_ids": [4]}},
        {"criteria": [{"type": "gt", "metadata": "tier", "values": [5]}],
         "actions": {"pinned_ids": [999]}},  # tier 3: inert
    ]
    out = rule_query_topk(
        docs, ruleset, {"seg": "pro", "q": "alpha", "tier": 3},
        ["alpha"], k=10,
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 3 and out[0]["pinned"]           # pinned first
    assert 4 not in ids                                # excluded organically
    assert set(ids) == {3, 1, 2}
    # exclusion-only path keeps index-wide stats and fills to k
    out2 = rule_query_topk(
        docs, [{"criteria": [{"type": "always"}],
                "actions": {"excluded_ids": [2]}}],
        {}, ["alpha"], k=10,
    ).collect()
    assert [r["doc_id"] for r in out2] == [1, 4] or set(
        r["doc_id"] for r in out2) == {1, 4}
    # doc both pinned and excluded is excluded (ES applies exclusion last)
    out3 = rule_query_topk(
        docs, [{"criteria": [{"type": "always"}],
                "actions": {"pinned_ids": [2], "excluded_ids": [2]}}],
        {}, ["alpha"], k=10,
    ).collect()
    assert 2 not in [r["doc_id"] for r in out3]
    import pytest as _pt

    with _pt.raises(ValueError, match="criteria type"):
        rule_query_topk(docs, [{"criteria": [{"type": "soundex"}]}], {}, ["a"])


def test_graph_explore_significance_mode(spark):
    from monstache_spark.operators.graph import graph_explore

    # 'rare' appears in 2 of 2 seed docs but only 2 of 10 overall ->
    # high JLH; 'common' is everywhere -> low
    rows = [(i, "common" if i > 2 else "rare", "u", 10.0 if i <= 2 else 1.0)
            for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, f1 string, f2 string, v double")
    out = graph_explore(
        df, {"range": {"v": {"gte": 5}}},
        [{"field": "f1", "size": 2}, {"field": "f2", "size": 2}],
        use_significance=True,
    ).collect()
    vts = {r["term"]: r["weight"] for r in out
           if r["kind"] == "vertex" and r["field"] == "f1"}
    # jlh(rare) = (1 - 0.2) * (1 / 0.2) = 4.0; common has fg 0 -> filtered
    assert vts == {"rare": 4.0}
    conns = [r for r in out if r["kind"] == "connection"]
    assert all(isinstance(r["weight"], float) for r in conns)


def test_retriever_tree_rrf_and_rescorer(spark):
    """ES retriever-tree compiler: an rrf node fuses standard + knn
    children; a rescorer node re-weights the child window; unknown
    kinds raise."""
    import pytest as _pt

    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame(
        [(1, "merge window merge"), (2, "vector scan"), (3, "hash join")],
        "doc_id long, text string",
    )
    dim = 8
    emb = spark.createDataFrame(
        [(0, [1.0] * dim), (1, [1.0] * dim), (2, [-1.0] * dim), (3, [0.5] * dim)],
        "vec_id long, embedding array<double>",
    )
    out = retriever_topk(
        docs, emb,
        {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "merge vector"}}}},
            {"knn": {"query_vector_id": 0}},
        ], "rank_constant": 60, "rank_window_size": 10}},
        k=3,
    ).collect()
    # doc 1: bm25 rank 1 + cosine rank 1 -> top fused
    assert out[0]["doc_id"] == 1 and out[0]["rank"] == 1
    assert len(out) == 3

    res = retriever_topk(
        docs, emb,
        {"rescorer": {
            "retriever": {"standard": {"query": {"match": {"text": "merge vector"}}}},
            "window_size": 5,
            "query": {"match": {"text": "scan"}},
            "query_weight": 0.0,
            "rescore_query_weight": 1.0,
        }},
        k=2,
    ).collect()
    # with query_weight 0 only the rescore query ('scan') matters:
    # doc 2 contains it, doc 1 scores 0
    assert res[0]["doc_id"] == 2 and res[0]["score"] > 0
    assert res[1]["score"] == 0.0

    with _pt.raises(ValueError, match="unsupported retriever"):
        retriever_topk(docs, emb, {"mystery": {}}, k=1)
    with _pt.raises(ValueError, match="supports match"):
        retriever_topk(
            docs, emb,
            {"standard": {"query": {"regexp": {"text": "x"}}}}, k=1,
        )


def test_retriever_knn_k_capped_by_window_and_field_honored(spark):
    """A knn child's k is capped at the enclosing rank_window_size (ES
    scores only the window), and a standard match query's FIELD is
    honored rather than silently searching the default text column."""
    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame(
        [(1, "merge", "alpha beta"), (2, "vector", "merge merge")],
        "doc_id long, text string, source string",
    )
    dim = 4
    emb = spark.createDataFrame(
        [(0, [1.0] * dim), (1, [1.0] * dim), (2, [0.9] * dim), (3, [0.8] * dim)],
        "vec_id long, embedding array<double>",
    )
    out = retriever_topk(
        docs, emb,
        {"rrf": {"retrievers": [
            {"knn": {"query_vector_id": 0, "k": 100}},
        ], "rank_constant": 60, "rank_window_size": 2}},
        k=5,
    ).collect()
    # window 2 caps the child: only 2 fused rows despite k=100
    assert len(out) == 2
    # field-honoring: searching `source` finds doc 2 ('merge merge')
    out2 = retriever_topk(
        docs, emb,
        {"standard": {"query": {"match": {"source": "merge"}}}},
        k=5,
    ).collect()
    assert [r["doc_id"] for r in out2] == [2]


def test_knn_query_prefilter_semantics(spark):
    """The knn filter restricts candidates BEFORE the search: the
    globally-nearest vector is excluded when the filter rejects it,
    and k still fills from qualifying vectors."""
    from monstache_spark.operators.search import knn_query_topk

    dim = 4
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0], 9),   # query
            (1, [1.0, 0.0, 0.0, 0.0], 0),   # nearest, label rejected
            (2, [0.9, 0.1, 0.0, 0.0], 1),   # nearest QUALIFYING
            (3, [0.0, 1.0, 0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<double>, label long",
    )
    out = knn_query_topk(
        emb, query_vector_id=0, k=2, filter={"terms": {"label": [1]}}
    ).collect()
    assert [r["vec_id"] for r in out] == [2, 3]
    # unfiltered, vec 1 wins
    out2 = knn_query_topk(emb, query_vector_id=0, k=1).collect()
    assert out2[0]["vec_id"] == 1


def test_retriever_text_similarity_reranker(spark):
    """ES text_similarity_reranker node (maxSim model stand-in):
    child scores are REPLACED by the rerank score; multi-vector docs
    take the per-query max; vectorless candidates score 0.0;
    min_score drops; a missing inference_id raises."""
    import pytest as _pt

    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame(
        [(1, "merge window merge"), (2, "merge vector"), (3, "hash join")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # doc 1 carries TWO vectors (one strong), doc 2 one weak vector,
    # doc 3 matches nothing; doc ids 1/2 both match 'merge'
    dv = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [3.0, 0.0]), (2, [0.5, 0.0])],
        "doc_id long, embedding array<double>",
    )
    reg = {"m": [[1.0, 0.0]]}
    spec = {"text_similarity_reranker": {
        "retriever": {"standard": {"query": {"match": {"text": "merge"}}}},
        "inference_id": "m",
        "rank_window_size": 5,
    }}
    out = retriever_topk(
        docs, emb, spec, k=3, doc_vecs=dv, inference_registry=reg
    ).collect()
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in out}
    # maxSim picks doc 1's BEST vector: dot([1,0],[3,0]) = 3.0
    assert got[1] == (3.0, 1)
    assert got[2] == (0.5, 2)
    assert 3 not in got  # never in the child window (no 'merge')

    # min_score drops the weak candidate
    spec_min = {"text_similarity_reranker": {
        **spec["text_similarity_reranker"], "min_score": 1.0,
    }}
    kept = retriever_topk(
        docs, emb, spec_min, k=3, doc_vecs=dv, inference_registry=reg
    ).collect()
    assert [r["doc_id"] for r in kept] == [1]

    # vectorless candidate -> 0.0 (not dropped) when no min_score
    dv_only1 = spark.createDataFrame(
        [(1, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    z = retriever_topk(
        docs, emb, spec, k=3, doc_vecs=dv_only1, inference_registry=reg
    ).collect()
    assert {r["doc_id"]: r["score"] for r in z}[2] == 0.0

    with _pt.raises(ValueError, match="inference_registry"):
        retriever_topk(docs, emb, spec, k=3, doc_vecs=dv)

    # default doc_vecs: one vector per doc straight from embeddings
    d = retriever_topk(
        docs, emb, spec, k=3, inference_registry=reg
    ).collect()
    assert {r["doc_id"]: r["score"] for r in d}[1] == 0.0  # emb[1]=[0,1]
    assert {r["doc_id"]: r["score"] for r in d}[2] == 2.0


def test_retriever_tree_linear_node(spark):
    """Linear node in the retriever tree: per-child minmax over its
    own window, weighted sum with missing docs contributing 0,
    degenerate (single-score) window normalizing to 1.0, unsupported
    normalizer raising."""
    import pytest as _pt

    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame(
        [(1, "merge window merge"), (2, "merge vector"), (3, "hash join")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [-1.0, 0.0]), (3, [1.0, 0.05])],
        "vec_id long, embedding array<double>",
    )
    spec = {"linear": {
        "retrievers": [
            {"retriever": {"standard": {"query": {"match": {"text": "merge"}}}},
             "weight": 2.0, "normalizer": "minmax"},
            {"retriever": {"knn": {"query_vector_id": 0}},
             "weight": 1.0, "normalizer": "minmax"},
        ],
        "rank_window_size": 5,
    }}
    out = retriever_topk(docs, emb, spec, k=4).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    # doc 1: bm25 max (norm 1.0) * 2 + knn norm; doc 3 appears only in
    # knn (bm25 contributes 0)
    assert got[1] >= 2.0
    assert 3 in got and got[3] < 2.0
    # scores sorted desc with rank 1..n
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks)

    bad = {"linear": {"retrievers": [
        {"retriever": {"knn": {"query_vector_id": 0}}, "normalizer": "zscore"},
    ]}}
    with _pt.raises(ValueError, match="normalizer"):
        retriever_topk(docs, emb, bad, k=2)


def test_retriever_tree_pinned_node(spark):
    """Pinned retriever node: pinned ids first in the GIVEN order
    (null score), child results follow by their own ranking minus the
    pinned docs, absent pinned ids skipped, empty pin list raises."""
    import pytest as _pt

    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame(
        [(1, "merge window merge"), (2, "merge vector"), (3, "hash join")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    spec = {"pinned": {
        "ids": [3, 99, 2],  # 99 absent -> skipped; 2 also a child hit
        "retriever": {"standard": {"query": {"match": {"text": "merge"}}}},
        "rank_window_size": 5,
    }}
    out = retriever_topk(docs, emb, spec, k=5).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[:2] == [3, 2]          # pin order, not relevance
    assert out[0]["score"] is None and out[1]["score"] is None
    assert ids.count(2) == 1          # never twice
    assert 1 in ids and out[ids.index(1)]["score"] is not None

    with _pt.raises(ValueError, match="needs ids"):
        retriever_topk(docs, emb, {"pinned": {"ids": [], "retriever": spec["pinned"]["retriever"]}}, k=2)


def test_retriever_tree_rule_node(spark):
    """Rule retriever node: matching rules pin (in order) and
    exclude over the child window; exclusion wins over pinning AND
    over organic rank; non-matching rules are inert; exclusion-only
    rulesets work (no pins)."""
    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame(
        [(1, "merge window merge"), (2, "merge vector"), (3, "hash join"),
         (4, "merge fast")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    child = {"standard": {"query": {"match": {"text": "merge"}}}}
    spec = {"rule": {
        "retriever": child,
        "ruleset": [
            {"criteria": [{"type": "exact", "metadata": "seg",
                           "values": ["pro"]}],
             "actions": {"pinned_ids": [3, 2]}},
            {"criteria": [{"type": "always"}],
             "actions": {"excluded_ids": [2, 4]}},
            {"criteria": [{"type": "exact", "metadata": "seg",
                           "values": ["free"]}],
             "actions": {"pinned_ids": [99]}},
        ],
        "match_criteria": {"seg": "pro"},
        "rank_window_size": 5,
    }}
    out = retriever_topk(docs, emb, spec, k=5).collect()
    ids = [r["doc_id"] for r in out]
    # 2 pinned AND excluded -> excluded wins; 4 excluded from organic;
    # 3 pinned first (null score); 1 organic
    assert ids == [3, 1]
    assert out[0]["score"] is None and out[1]["score"] is not None

    # exclusion-only: no pins, child ranking preserved minus excluded
    spec2 = {"rule": {
        "retriever": child,
        "ruleset": [{"criteria": [{"type": "always"}],
                     "actions": {"excluded_ids": [1]}}],
        "match_criteria": {},
        "rank_window_size": 5,
    }}
    out2 = retriever_topk(docs, emb, spec2, k=5).collect()
    assert [r["doc_id"] for r in out2] == [2, 4]


def test_retriever_knn_literal_query_vector(spark):
    """The knn node's primary ES form — a literal query_vector —
    scores under the ES contract ((1+cos)/2), supports the pre-filter
    and similarity threshold, and fuses in rrf like any child."""
    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame(
        [(1, "merge window"), (2, "vector scan")], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 1), (2, [0.0, 1.0], 2), (3, [1.0, 0.1], 1)],
        "vec_id long, embedding array<double>, label long",
    )
    out = retriever_topk(
        docs, emb,
        {"knn": {"query_vector": [1.0, 0.0], "k": 3}},
        k=3,
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    assert got[1] == 1.0            # (1 + 1)/2
    assert got[2] == 0.5            # orthogonal
    assert out[0]["doc_id"] == 1

    filt = retriever_topk(
        docs, emb,
        {"knn": {"query_vector": [1.0, 0.0], "k": 3,
                 "filter": {"term": {"label": 1}},
                 "min_similarity": 0.5}},
        k=3,
    ).collect()
    assert sorted(r["doc_id"] for r in filt) == [1, 3]


def test_retriever_knn_similarity_float_is_threshold(spark):
    """Self-review r10 pass 2 #2: in the ES knn retriever body,
    `similarity` is the FLOAT threshold (metric comes from the
    mapping); a string still selects the metric."""
    from monstache_spark.operators.search import retriever_topk

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = retriever_topk(
        docs, emb,
        {"knn": {"query_vector": [1.0, 0.0], "k": 5, "similarity": 0.5}},
        k=5,
    ).collect()
    assert [r["doc_id"] for r in out] == [1]  # orthogonal vec dropped
    metric = retriever_topk(
        docs, emb,
        {"knn": {"query_vector": [1.0, 0.0], "k": 5,
                 "similarity": "l2_norm"}},
        k=5,
    ).collect()
    assert len(metric) == 2  # string selects the metric, no threshold


def test_sliced_scroll(spark):
    import pytest

    from monstache_spark.operators.search import sliced_scroll
    from monstache_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    total = docs.count()
    slices = [sliced_scroll(docs, i, 4) for i in range(4)]
    ids = [sorted(r["doc_id"] for r in s.select("doc_id").collect())
           for s in slices]
    # disjoint and collectively exhaustive
    flat = [i for part in ids for i in part]
    assert len(flat) == total == len(set(flat))
    # stable across repartitionings (the scroll-consumer contract)
    re_ids = sorted(
        r["doc_id"]
        for r in sliced_scroll(docs.repartition(7), 2, 4)
        .select("doc_id").collect()
    )
    assert re_ids == ids[2]
    with pytest.raises(ValueError, match="slice id"):
        sliced_scroll(docs, 4, 4)
    with pytest.raises(ValueError, match="max"):
        sliced_scroll(docs, 0, 1)
