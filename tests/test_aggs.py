"""ES aggregations DSL (operators/aggs.py) unit tests: the paths the
oracle-checked entry queries don't exercise — filters buckets,
min_doc_count, per-parent size truncation, multi-membership range
edges, composite cursor semantics, and rejection of unsupported
shapes."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from monstache_spark.operators.aggs import compile_aggs, compile_composite_agg


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # (id, kind, region, val, ts)
        (1, "click", "eu", 10.0, datetime.datetime(2024, 1, 1, 5)),
        (2, "click", "eu", 20.0, datetime.datetime(2024, 1, 1, 9)),
        (3, "click", "us", 30.0, datetime.datetime(2024, 1, 2, 1)),
        (4, "view", "eu", 40.0, datetime.datetime(2024, 1, 1, 2)),
        (5, "view", "us", 50.0, datetime.datetime(2024, 1, 2, 3)),
        (6, "buy", "us", 60.0, datetime.datetime(2024, 1, 2, 4)),
        (7, "buy", None, None, datetime.datetime(2024, 1, 3, 0)),
        (8, None, "eu", 80.0, datetime.datetime(2024, 1, 3, 1)),
    ]
    return spark.createDataFrame(rows, "id long, kind string, region string, val double, ts timestamp")


def test_terms_drops_null_keys_and_orders(ev):
    out = compile_aggs(ev, {"k": {"terms": {"field": "kind"}}})
    got = {r["k"]: r["doc_count"] for r in out.collect()}
    # the null-kind row (id 8) is dropped, as in ES
    assert got == {"click": 3, "view": 2, "buy": 2}


def test_terms_size_ties_break_by_key_asc(ev):
    out = compile_aggs(ev, {"k": {"terms": {"field": "kind", "size": 2}}})
    got = sorted(r["k"] for r in out.collect())
    # click(3) first, then buy(2) beats view(2) on key asc
    assert got == ["buy", "click"]


def test_min_doc_count_filters_buckets(ev):
    out = compile_aggs(ev, {"k": {"terms": {"field": "kind", "min_doc_count": 3}}})
    assert [r["k"] for r in out.collect()] == ["click"]


def test_nested_size_truncates_within_parent(ev):
    # per region, keep only the top-1 kind: truncation must rank the
    # kind bucket total WITHIN its parent region bucket
    out = compile_aggs(
        ev,
        {
            "region": {
                "terms": {"field": "region"},
                "aggs": {"k": {"terms": {"field": "kind", "size": 1}}},
            }
        },
    )
    got = {(r["region"], r["k"]): r["doc_count"] for r in out.collect()}
    # eu: click=2 beats view=1; us: buy/click/view all 1 → key asc → buy
    assert got == {("eu", "click"): 2, ("us", "buy"): 1}


def test_parent_total_counts_null_key_children(ev):
    """A non-leaf terms bucket's size ranking must use the PARENT's
    doc count (ES semantics) — children with a missing sub-key still
    count.  kind=buy has 2 docs but one (id 7) has region NULL: with
    leaf-sum totals buy would tie view at 1 and lose size=2 selection
    ordering; with parent totals buy keeps its true total of 2."""
    out = compile_aggs(
        ev,
        {
            "k": {
                "terms": {"field": "kind", "size": 2},
                "aggs": {"region": {"terms": {"field": "region"}}},
            }
        },
    )
    parents = sorted({r["k"] for r in out.collect()})
    # click(3) then buy(2, counting the null-region doc) — view(2)
    # loses the tie on key asc; a leaf-sum total would undercount buy
    # to 1 and emit view instead
    assert parents == ["buy", "click"]


def test_parent_total_not_inflated_by_multi_membership_children(ev):
    """A multi-membership child (filters explode) must not
    double-count the parent's total when ranking parent buckets."""
    out = compile_aggs(
        ev,
        {
            "k": {
                "terms": {"field": "kind", "size": 1, "min_doc_count": 3},
                "aggs": {
                    "f": {
                        "filters": {
                            "filters": {
                                "all": {"range": {"val": {"gte": 0.0}}},
                                "eu": {"term": {"region": "eu"}},
                            }
                        }
                    }
                },
            }
        },
    )
    rows = out.collect()
    # min_doc_count=3 on PARENT totals: only click (3 docs) survives —
    # view/buy have 2 parent docs even though explode produces more
    # leaf rows
    assert {r["k"] for r in rows} == {"click"}


def test_filters_agg_multi_membership(ev):
    out = compile_aggs(
        ev,
        {
            "f": {
                "filters": {
                    "filters": {
                        "cheap": {"range": {"val": {"lt": 40.0}}},
                        "eu": {"term": {"region": "eu"}},
                    }
                },
                "aggs": {"total": {"sum": {"field": "val"}}},
            }
        },
    )
    got = {r["f"]: (r["doc_count"], r["total"]) for r in out.collect()}
    # rows 1,2 match both buckets; row 8 (val=80, eu) only eu
    assert got == {"cheap": (3, 60.0), "eu": (4, 150.0)}


def test_filters_other_bucket_catches_null_predicates(ev):
    """ES other_bucket counts a doc whose filter predicates evaluate
    to NULL (null field in a term/range) as "did not match" — it must
    land in the other bucket, not silently vanish from the agg.  Both
    null shapes are exercised: id 7 (val NULL → NULL range predicate)
    and id 8 (kind NULL → NULL term predicate)."""
    out = compile_aggs(
        ev,
        {
            "f": {
                "filters": {
                    "filters": {
                        "views": {"term": {"kind": "view"}},
                        "cheap": {"range": {"val": {"lt": 15.0}}},
                    },
                    "other_bucket_key": "rest",
                }
            }
        },
    )
    got = {r["f"]: r["doc_count"] for r in out.collect()}
    # views: ids 4,5; cheap: id 1; rest: ids 2,3,6 (plain non-match),
    # 7 (NULL val predicate), 8 (NULL kind predicate) — a bare
    # NOT(NULL) would drop 7 and 8 and report rest=3
    assert got == {"views": 2, "cheap": 1, "rest": 5}


def test_range_boundaries_half_open(ev):
    out = compile_aggs(
        ev,
        {
            "band": {
                "range": {
                    "field": "val",
                    "ranges": [
                        {"key": "lo", "to": 30.0},
                        {"key": "hi", "from": 30.0},
                    ],
                }
            }
        },
    )
    got = {r["band"]: r["doc_count"] for r in out.collect()}
    # val=30 lands in hi only ([from, to)); null val drops
    assert got == {"lo": 2, "hi": 5}


def test_date_histogram_hour(ev):
    out = compile_aggs(
        ev, {"h": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}}
    )
    got = {r["h"].date(): r["doc_count"] for r in out.collect()}
    assert got == {
        datetime.date(2024, 1, 1): 3,
        datetime.date(2024, 1, 2): 3,
        datetime.date(2024, 1, 3): 2,
    }


def test_date_histogram_min_doc_count_zero_fills_gaps(ev):
    out = compile_aggs(
        ev,
        {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day",
                                  "min_doc_count": 0},
               "aggs": {"total": {"sum": {"field": "val"}}}}},
    )
    rows = {r["d"].day: (r["doc_count"], r["total"]) for r in out.collect()}
    # Jan 1..3 continuous; all three days have data here, so add a
    # variant with a real gap below
    assert set(rows) == {1, 2, 3}


def test_date_histogram_fill_emits_empty_buckets(spark):
    import datetime

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 5.0),
         (2, datetime.datetime(2024, 1, 4), 7.0)],
        "id long, ts timestamp, val double",
    )
    out = compile_aggs(
        df,
        {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day",
                                  "min_doc_count": 0},
               "aggs": {"total": {"sum": {"field": "val"}}}}},
    )
    rows = {r["d"].day: (r["doc_count"], r["total"]) for r in out.collect()}
    # Jan 2 and 3 are EMPTY buckets: doc_count 0, metrics null
    assert rows == {1: (1, 5.0), 2: (0, None), 3: (0, None), 4: (1, 7.0)}


def test_date_histogram_extended_bounds(spark):
    import datetime

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2), 5.0)],
        "id long, ts timestamp, val double",
    )
    out = compile_aggs(
        df,
        {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day", "min_doc_count": 0,
            "extended_bounds": {"min": "2024-01-01", "max": "2024-01-04"}}}},
    )
    days = sorted(r["d"].day for r in out.collect())
    assert days == [1, 2, 3, 4]


def test_date_histogram_fill_rejected_on_nested_tree(ev):
    with pytest.raises(ValueError, match="only bucket level"):
        compile_aggs(
            ev,
            {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day",
                                      "min_doc_count": 0},
                   "aggs": {"k": {"terms": {"field": "kind"}}}}},
        )


def test_histogram_negative_values(spark):
    df = spark.createDataFrame(
        [(1, -15.0), (2, -5.0), (3, 5.0)], "id long, v double"
    )
    out = compile_aggs(df, {"b": {"histogram": {"field": "v", "interval": 10.0}}})
    got = {r["b"]: r["doc_count"] for r in out.collect()}
    # floor semantics: -15 → -20, -5 → -10 (ES histogram contract)
    assert got == {-20.0: 1, -10.0: 1, 0.0: 1}


def test_cardinality_precision_threshold_is_approx(ev):
    exact = compile_aggs(
        ev, {"k": {"terms": {"field": "region"}, "aggs": {"c": {"cardinality": {"field": "kind"}}}}}
    )
    approx = compile_aggs(
        ev,
        {
            "k": {
                "terms": {"field": "region"},
                "aggs": {"c": {"cardinality": {"field": "kind", "precision_threshold": 100}}},
            }
        },
    )
    # at this cardinality the HLL answer equals the exact one; the
    # assertion pins that the knob switches plans without changing
    # small-cardinality results
    assert {tuple(r) for r in exact.collect()} == {tuple(r) for r in approx.collect()}


def test_composite_after_cursor_strictly_after(ev):
    body = {
        "composite": {
            "sources": [
                {"k": {"terms": {"field": "kind"}}},
                {"r": {"terms": {"field": "region"}}},
            ],
            "size": 2,
            "after": {"k": "buy", "r": "us"},
        }
    }
    out = compile_composite_agg(ev, "page", body)
    got = [(r["k"], r["r"]) for r in out.collect()]
    # key-asc order resumes strictly after (buy, us): the (buy, us)
    # bucket itself is excluded
    assert got == [("click", "eu"), ("click", "us")]


def test_composite_page_then_next_page_covers_all(ev):
    base = {
        "composite": {
            "sources": [{"k": {"terms": {"field": "kind"}}}],
            "size": 2,
        },
        "aggs": {"n": {"value_count": {"field": "val"}}},
    }
    p1 = compile_composite_agg(ev, "page", base).collect()
    after = {"k": p1[-1]["k"]}
    base2 = {**base, "composite": {**base["composite"], "after": after}}
    p2 = compile_composite_agg(ev, "page", base2).collect()
    assert [r["k"] for r in p1] + [r["k"] for r in p2] == ["buy", "click", "view"]


def test_terms_include_exclude(ev):
    out = compile_aggs(
        ev, {"k": {"terms": {"field": "kind", "include": "c.*|v.*",
                             "exclude": ["view"]}}}
    )
    got = {r["k"]: r["doc_count"] for r in out.collect()}
    # include admits click/view; exclude then drops view; buy never matches
    assert got == {"click": 3}


def test_adjacency_matrix_singles_and_pairs(ev):
    from monstache_spark.operators.aggs import adjacency_matrix

    out = adjacency_matrix(
        ev,
        {"eu": {"term": {"region": "eu"}},
         "cheap": {"range": {"val": {"lt": 40.0}}}},
        id_col="id",
    )
    got = {r["key"]: r["doc_count"] for r in out.collect()}
    # rows 1,2 are eu AND cheap; row 3 cheap only; rows 4,8 eu only
    assert got == {"eu": 4, "cheap": 3, "cheap&eu": 2}


def test_serial_diff_lags_n_buckets(ev):
    from monstache_spark.operators.aggs import pipeline_aggs

    daily = compile_aggs(
        ev, {"d": {"date_histogram": {"field": "ts", "calendar_interval": "day"}}}
    )
    out = {r["d"].day: r["doc_count_sdiff"] for r in pipeline_aggs(
        daily, sort_col="d", value_col="doc_count", serial_diff=2
    ).collect()}
    # days 1,2,3 have 3,3,2 docs; lag-2: day3 = 2 - 3 = -1, days 1-2 null
    assert out[1] is None and out[2] is None and out[3] == -1


def test_stats_bucket_summarizes_sibling_buckets(ev):
    from monstache_spark.operators.aggs import stats_bucket

    daily = compile_aggs(
        ev,
        {"k": {"terms": {"field": "kind"},
               "aggs": {"d": {"date_histogram": {"field": "ts",
                                                 "calendar_interval": "day"}}}}},
    )
    out = {r["k"]: r for r in stats_bucket(
        daily, "doc_count", parent_cols=["k"]
    ).collect()}
    # click: days 1 (2 docs) and 2 (1 doc)
    c = out["click"]
    assert (c["doc_count_bucket_count"], c["doc_count_bucket_min"],
            c["doc_count_bucket_max"], c["doc_count_bucket_sum"]) == (2, 1.0, 2.0, 3.0)


def test_top_metrics_latest_row_ties_on_id(spark):
    import datetime

    from monstache_spark.operators.aggs import top_metrics

    t = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, "a", t, 10.0), (2, "a", t, 20.0), (3, "b", datetime.datetime(2024, 1, 2), 5.0)],
        "event_id long, event_type string, ts timestamp, value double",
    )
    out = {r["event_type"]: r["value"] for r in top_metrics(
        df, "event_type", "ts", ["value"], id_col="event_id"
    ).collect()}
    # tie on ts within 'a' breaks to the larger event_id (2 -> 20.0)
    assert out == {"a": 20.0, "b": 5.0}


def test_top_metrics_generic_sort_two_phase(spark):
    from monstache_spark.operators.aggs import top_metrics

    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "x"),
            (2, "a", 5.0, "y"),   # tie on sort, larger id wins desc
            (3, "a", 2.0, "z"),
            (4, "b", 9.0, "w"),
            (5, None, 99.0, "n"),  # null bucket drops
        ],
        "event_id long, event_type string, score double, tag string",
    )
    out = {r["event_type"]: (r["score"], r["tag"]) for r in top_metrics(
        df, "event_type", "score", ["tag"], id_col="event_id"
    ).collect()}
    assert out == {"a": (5.0, "y"), "b": (9.0, "w")}
    asc = {r["event_type"]: r["tag"] for r in top_metrics(
        df, "event_type", "score", ["tag"], ascending=True, id_col="event_id"
    ).collect()}
    assert asc == {"a": "z", "b": "w"}


def test_top_metrics_string_sort_no_sort_aggregate(spark):
    from monstache_spark.operators.aggs import top_metrics

    df = spark.createDataFrame(
        [
            (1, "a", "s1", 10.0),
            (2, "a", "s9", 20.0),
            (3, "a", "s9", 30.0),   # tie on 's9', larger id wins desc
            (4, "b", "s0", 5.0),
            (5, None, "zz", 99.0),  # null bucket drops
            (6, "b", None, 77.0),   # null sort key drops
        ],
        "event_id long, event_type string, skey string, value double",
    )
    out = {r["event_type"]: (r["skey"], r["value"]) for r in top_metrics(
        df, "event_type", "skey", ["value"], id_col="event_id"
    ).collect()}
    assert out == {"a": ("s9", 30.0), "b": ("s0", 5.0)}
    asc = {r["event_type"]: (r["skey"], r["value"]) for r in top_metrics(
        df, "event_type", "skey", ["value"], ascending=True, id_col="event_id"
    ).collect()}
    assert asc == {"a": ("s1", 10.0), "b": ("s0", 5.0)}
    # the whole point: a string sort key must NOT sort-aggregate the
    # corpus (a string in an agg buffer degrades to SortAggregate)
    res = top_metrics(df, "event_type", "skey", ["value"], id_col="event_id")
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan


def test_adjacency_matrix_counts_distinct_ids(spark):
    from monstache_spark.operators.aggs import adjacency_matrix

    # duplicate rows per id must not inflate the matrix
    df = spark.createDataFrame(
        [(1, "eu"), (1, "eu"), (2, "us")], "id long, region string"
    )
    got = {r["key"]: r["doc_count"] for r in adjacency_matrix(
        df, {"eu": {"term": {"region": "eu"}}}, id_col="id"
    ).collect()}
    assert got == {"eu": 1}


def test_date_histogram_extended_bounds_only_extend(spark):
    import datetime

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1)), (2, datetime.datetime(2024, 1, 4))],
        "id long, ts timestamp",
    )
    # bounds INSIDE the data range must not drop the real outer buckets
    out = compile_aggs(
        df,
        {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day", "min_doc_count": 0,
            "extended_bounds": {"min": "2024-01-02", "max": "2024-01-03"},
        }}},
    ).collect()
    got = {r["d"].day: r["doc_count"] for r in out}
    assert got == {1: 1, 2: 0, 3: 0, 4: 1}
    # bounds OUTSIDE extend the timeline with empty buckets
    out2 = compile_aggs(
        df,
        {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day", "min_doc_count": 0,
            "extended_bounds": {"min": "2023-12-31", "max": "2024-01-05"},
        }}},
    ).collect()
    got2 = {(r["d"].month, r["d"].day): r["doc_count"] for r in out2}
    assert got2[(12, 31)] == 0 and got2[(1, 5)] == 0 and len(got2) == 6


def test_rare_terms_keeps_only_long_tail(ev):
    out = compile_aggs(
        ev, {"k": {"rare_terms": {"field": "kind", "max_doc_count": 2}}}
    )
    got = {r["k"]: r["doc_count"] for r in out.collect()}
    # click(3) is too common; view(2)/buy(2) are rare; null kind drops
    assert got == {"view": 2, "buy": 2}


def test_rare_terms_non_leaf_uses_parent_totals(ev):
    out = compile_aggs(
        ev,
        {
            "k": {
                "rare_terms": {"field": "kind", "max_doc_count": 2},
                "aggs": {"region": {"terms": {"field": "region"}}},
            }
        },
    )
    # buy has 2 docs TOTAL (one with null region): parent total 2 <= 2
    # keeps it even though only 1 leaf row remains after the null drop
    parents = {r["k"] for r in out.collect()}
    assert parents == {"view", "buy"}


def test_multi_terms_compound_key_and_size(ev):
    out = compile_aggs(
        ev,
        {
            "kr": {
                "multi_terms": {
                    "terms": [{"field": "kind"}, {"field": "region"}],
                    "size": 2,
                },
                "aggs": {"total": {"sum": {"field": "val"}}},
            }
        },
    )
    got = {r["kr"]: (r["doc_count"], r["total"]) for r in out.collect()}
    # click|eu has 2 docs; the five 1-doc pairs tie -> buy|us on key asc;
    # docs missing either field (ids 7, 8) drop
    assert got == {"click|eu": (2, 30.0), "buy|us": (1, 60.0)}


def test_bucket_script_and_selector(ev):
    from monstache_spark.operators.aggs import bucket_script, bucket_selector

    daily = compile_aggs(
        ev,
        {"k": {"terms": {"field": "kind"},
               "aggs": {"total": {"sum": {"field": "val"}}}}},
    )
    scripted = bucket_script(daily, "per_doc", "total / doc_count")
    got = {r["k"]: r["per_doc"] for r in scripted.collect()}
    assert got["click"] == 20.0 and got["view"] == 45.0
    kept = {r["k"] for r in bucket_selector(scripted, "doc_count >= 3").collect()}
    assert kept == {"click"}


def test_sibling_aggs_long_format_union(ev):
    from monstache_spark.operators.aggs import compile_sibling_aggs

    out = compile_sibling_aggs(
        ev,
        {
            "k": {"terms": {"field": "kind"},
                  "aggs": {"avg_val": {"avg": {"field": "val"}}}},
            "r": {"terms": {"field": "region"},
                  "aggs": {"total": {"sum": {"field": "val"}}}},
        },
    )
    assert out.columns == ["agg", "key", "doc_count", "avg_val", "total"]
    rows = {(r["agg"], r["key"]): r for r in out.collect()}
    assert rows[("k", "click")]["doc_count"] == 3
    assert rows[("k", "click")]["avg_val"] == 20.0
    assert rows[("k", "click")]["total"] is None       # foreign metric null
    assert rows[("r", "eu")]["doc_count"] == 4
    assert rows[("r", "eu")]["avg_val"] is None
    assert rows[("r", "eu")]["total"] == 150.0


def test_sibling_aggs_nested_key_chain_joined(ev):
    from monstache_spark.operators.aggs import compile_sibling_aggs

    out = compile_sibling_aggs(
        ev,
        {
            "rk": {"terms": {"field": "region"},
                   "aggs": {"k": {"terms": {"field": "kind"}}}},
        },
    )
    keys = {r["key"] for r in out.collect()}
    assert "eu/click" in keys and "us/buy" in keys


def test_rejects_sibling_bucket_aggs(ev):
    with pytest.raises(ValueError, match="one bucket agg per level"):
        compile_aggs(
            ev,
            {
                "a": {"terms": {"field": "kind"}},
                "b": {"terms": {"field": "region"}},
            },
        )


def test_rejects_metrics_only_tree(ev):
    with pytest.raises(ValueError, match="no bucket aggregation"):
        compile_aggs(ev, {"m": {"avg": {"field": "val"}}})


def test_rejects_bucket_sub_agg_in_composite(ev):
    with pytest.raises(ValueError, match="metrics"):
        compile_composite_agg(
            ev,
            "page",
            {
                "composite": {"sources": [{"k": {"terms": {"field": "kind"}}}]},
                "aggs": {"sub": {"terms": {"field": "region"}}},
            },
        )


def test_pipeline_aggs_derivative_cumsum_mavg(spark):
    from monstache_spark.operators.aggs import pipeline_aggs

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 20), ("b", 1, 5)],
        "g string, t long, doc_count long",
    )
    out = {(r["g"], r["t"]): r for r in pipeline_aggs(
        df, "t", "doc_count", parent_cols=["g"],
        derivative=True, cumulative=True, moving_avg=2,
    ).collect()}
    assert out[("a", 1)]["doc_count_deriv"] is None      # first bucket, as in ES
    assert out[("a", 2)]["doc_count_deriv"] == 20
    assert out[("a", 3)]["doc_count_deriv"] == -10
    assert out[("a", 3)]["doc_count_cumsum"] == 60.0
    assert out[("a", 3)]["doc_count_mavg"] == 25.0       # (30+20)/2 trailing
    # parent isolation: b's window never sees a's buckets
    assert out[("b", 1)]["doc_count_deriv"] is None
    assert out[("b", 1)]["doc_count_cumsum"] == 5.0


def test_top_hits_per_bucket_and_null_drop(spark):
    from monstache_spark.operators.aggs import top_hits_agg

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 30.0), (3, "a", 20.0), (4, None, 99.0), (5, "b", 1.0)],
        "doc_id long, g string, v double",
    )
    out = [(r["g"], r["doc_id"], r["hit_rank"]) for r in
           top_hits_agg(df, "g", "v", n=2).orderBy("g", "hit_rank").collect()]
    assert out == [("a", 2, 1), ("a", 3, 2), ("b", 5, 1)]


def test_anomaly_flags_exact_zscore(spark):
    from monstache_spark.operators.aggs import anomaly_flags

    # series 10,10,10,10,100: mean=28, popvar=1296, sigma=36;
    # z(100)=2 exactly -> NOT flagged at t=2 (strict >), flagged at 1.9
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([10, 10, 10, 10, 100])],
        "g string, t long, doc_count long",
    )
    at2 = {r["t"]: r["is_anomaly"] for r in
           anomaly_flags(df, "doc_count", ["g"], threshold_sigma=2.0).collect()}
    assert at2 == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}  # z == t is not > t
    at19 = {r["t"]: r["is_anomaly"] for r in
            anomaly_flags(df, "doc_count", ["g"], threshold_sigma=1.9).collect()}
    assert at19 == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1}


def test_percentiles_approx_knob(ev):
    exact = compile_aggs(
        ev, {"k": {"terms": {"field": "region"}, "aggs": {"p": {"percentiles": {"field": "val", "percents": [50.0]}}}}}
    ).collect()
    approx = compile_aggs(
        ev, {"k": {"terms": {"field": "region"}, "aggs": {"p": {"percentiles": {"field": "val", "percents": [50.0], "approx": True}}}}}
    ).collect()
    # same schema; at 3-4 values per bucket the sketch is exact up to
    # interpolation (approx_percentile returns a data point, percentile
    # interpolates) — assert the approx answer is a real data value
    # within the bucket's range
    ex = {r["k"]: r["p_p50"] for r in exact}
    ap = {r["k"]: r["p_p50"] for r in approx}
    assert set(ex) == set(ap)
    for k in ap:
        assert ap[k] is not None


def test_percentile_suffix_lossless_no_collisions(ev):
    out = compile_aggs(
        ev,
        {"k": {"terms": {"field": "region"},
               "aggs": {"p": {"percentiles": {"field": "val",
                                              "percents": [1.05, 15.0, 10.05, 99.9]}}}}},
    )
    cols = set(out.columns)
    # 1.05 and 15.0 must NOT collide; 10.05 must not mangle to p105
    assert {"p_p1_05", "p_p15", "p_p10_05", "p_p99_9"} <= cols


def test_terms_missing_bucket(ev):
    out = compile_aggs(
        ev, {"k": {"terms": {"field": "kind", "missing": "N/A"}}}
    )
    got = {r["k"]: r["doc_count"] for r in out.collect()}
    # the null-kind doc lands in the named bucket instead of dropping
    assert got == {"click": 3, "view": 2, "buy": 2, "N/A": 1}


def test_terms_order_by_metric(ev):
    out = compile_aggs(
        ev,
        {
            "k": {
                "terms": {"field": "kind", "size": 2, "order": {"avg_val": "desc"}},
                "aggs": {"avg_val": {"avg": {"field": "val"}}},
            }
        },
    )
    got = [r["k"] for r in out.collect()]
    # avg: buy=60 (one non-null val), view=45, click=20 -> top-2 by metric
    assert sorted(got) == ["buy", "view"]
    # ascending order keeps the lowest-metric buckets instead
    out_asc = compile_aggs(
        ev,
        {
            "k": {
                "terms": {"field": "kind", "size": 2, "order": {"avg_val": "asc"}},
                "aggs": {"avg_val": {"avg": {"field": "val"}}},
            }
        },
    )
    assert sorted(r["k"] for r in out_asc.collect()) == ["click", "view"]


def test_terms_order_metric_rejected_on_non_leaf(ev):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="leaf terms level"):
        compile_aggs(
            ev,
            {
                "k": {
                    "terms": {"field": "kind", "size": 1, "order": {"m": "desc"}},
                    "aggs": {"r": {"terms": {"field": "region"}}},
                }
            },
        ).collect()


def test_nested_aggs_reverse_nested_parent_counts(spark):
    from monstache_spark.operators.aggs import nested_aggs

    df = spark.createDataFrame(
        [
            (1, [("R",), ("R",), ("N",)]),
            (2, [("R",)]),
            (3, [("N",)]),
        ],
        "doc_id long, items array<struct<flag:string>>",
    )
    out = {r["by_flag"]: (r["doc_count"], r["parent_doc_count"]) for r in nested_aggs(
        df, "items", {"by_flag": {"terms": {"field": "items.flag"}}},
        parent_id_col="doc_id",
    ).collect()}
    # R: 3 elements from 2 parents; N: 2 elements from 2 parents
    assert out == {"R": (3, 2), "N": (2, 2)}


def test_weighted_avg_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0, 1.0), (2, "a", 20.0, 3.0), (3, "a", None, 5.0),
         (4, "a", 30.0, None)],
        "id long, k string, v double, w double",
    )
    out = compile_aggs(
        df, {"k": {"terms": {"field": "k"},
                   "aggs": {"wa": {"weighted_avg": {"value": {"field": "v"},
                                                    "weight": {"field": "w"}}}}}}
    ).collect()[0]
    # only rows with BOTH value and weight count: (10*1 + 20*3)/(1+3)
    assert out["wa"] == 17.5


def test_extended_stats_variance_and_std(spark):
    df = spark.createDataFrame(
        [(i, "a", float(v)) for i, v in enumerate([2, 4, 4, 4, 5, 5, 7, 9])],
        "id long, k string, v double",
    )
    out = compile_aggs(
        df, {"k": {"terms": {"field": "k"},
                   "aggs": {"es": {"extended_stats": {"field": "v"}}}}}
    ).collect()[0]
    # classic example: mean 5, population variance 4, std 2
    assert out["es_avg"] == 5.0
    assert out["es_variance"] == 4.0
    assert out["es_std_deviation"] == 2.0
    assert out["es_sum_of_squares"] == 232.0


def test_missing_bucket_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, None, 2.0), (3, None, None), (4, "y", 4.0)],
        "id long, k string, v double",
    )
    out = compile_aggs(
        df, {"no_k": {"missing": {"field": "k"},
                      "aggs": {"total": {"sum": {"field": "v"}}}}}
    ).collect()
    assert len(out) == 1
    assert (out[0]["no_k"], out[0]["doc_count"], out[0]["total"]) == ("missing", 2, 2.0)


def test_sampler_and_diversified(spark):
    from monstache_spark.operators.aggs import sampler_agg

    df = spark.createDataFrame(
        [(i, f"src{i % 2}", float(i)) for i in range(10)],
        "doc_id long, src string, v double",
    )
    plain = sampler_agg(df, 4).collect()
    assert sorted(r["doc_id"] for r in plain) == [0, 1, 2, 3]
    div = sampler_agg(df, 4, dedup_field="src", max_docs_per_value=1).collect()
    assert sorted(r["doc_id"] for r in div) == [0, 1]  # one per src


def test_date_histogram_hard_bounds_narrow(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1)), (2, datetime.datetime(2024, 1, 3)),
         (3, datetime.datetime(2024, 1, 6))],
        "id long, ts timestamp",
    )
    out = compile_aggs(
        df,
        {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day", "min_doc_count": 0,
            "hard_bounds": {"min": "2024-01-02", "max": "2024-01-04"},
        }}},
    ).collect()
    got = {r["d"].day: r["doc_count"] for r in out}
    # Jan 1 and Jan 6 DROP despite data; Jan 2/4 empty-fill
    assert got == {2: 0, 3: 1, 4: 0}
    # without gap filling, hard_bounds still drops outside buckets
    out2 = compile_aggs(
        df,
        {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "hard_bounds": {"min": "2024-01-02", "max": "2024-01-04"},
        }}},
    ).collect()
    assert {r["d"].day for r in out2} == {3}


def test_auto_date_histogram_picks_interval(spark):
    from monstache_spark.operators.aggs import auto_date_histogram

    # 3-day span, 10-bucket target -> day buckets
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 5)), (2, datetime.datetime(2024, 1, 3, 9))],
        "id long, ts timestamp",
    )
    out = auto_date_histogram(df, "ts", buckets=10).collect()
    assert out[0]["interval"] == "day"
    # 3-hour span now descends into the sub-hour rungs -> 30m
    df2 = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 5)), (2, datetime.datetime(2024, 1, 1, 8))],
        "id long, ts timestamp",
    )
    assert auto_date_histogram(df2, "ts", buckets=10).collect()[0]["interval"] == "30m"
    # 8-hour span -> hour buckets (span/1800 > 9, span/3600 <= 9)
    df3 = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 0)), (2, datetime.datetime(2024, 1, 1, 8))],
        "id long, ts timestamp",
    )
    assert auto_date_histogram(df3, "ts", buckets=10).collect()[0]["interval"] == "hour"


def test_dis_max_constant_score_boosting_terms_set(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "spark sql join", "en", 2), (2, "pandas numpy", "en", 1),
         (3, "spark streaming", "de", 3)],
        "doc_id long, text string, lang string, need long",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"dis_max": {"queries": [{"match": {"text": "pandas"}},
                                     {"term": {"lang": "de"}}]}}
    ).collect()}
    assert got == {2, 3}
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"constant_score": {"filter": {"match": {"text": "spark"}}}}
    ).collect()}
    assert got == {1, 3}
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"boosting": {"positive": {"match": {"text": "spark"}},
                          "negative": {"term": {"lang": "de"}},
                          "negative_boost": 0.2}}
    ).collect()}
    assert got == {1, 3}  # negative demotes, never excludes
    # terms_set with per-doc minimum field
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"terms_set": {"text": {
            "terms": ["spark", "sql", "join", "numpy"],
            "minimum_should_match_field": "need"}}}
    ).collect()}
    # doc1 matches 3 >= 2; doc2 matches 1 >= 1; doc3 matches 1 < 3
    assert got == {1, 2}


def test_normalize_agg_methods(spark):
    from monstache_spark.operators.aggs import normalize_agg

    df = spark.createDataFrame(
        [("a", 10.0), ("b", 30.0), ("c", 60.0)], "k string, v double"
    )
    pct = {r["k"]: r["v_norm"] for r in normalize_agg(df, "v").collect()}
    assert pct == {"a": 10.0, "b": 30.0, "c": 60.0}
    r01 = {r["k"]: r["v_norm"] for r in normalize_agg(
        df, "v", method="rescale_0_1"
    ).collect()}
    assert r01 == {"a": 0.0, "b": 0.4, "c": 1.0}
    # ES 'mean' method is (value − mean) / (max − min)
    mn = {r["k"]: round(r["v_norm"], 4) for r in normalize_agg(
        df, "v", method="mean"
    ).collect()}
    assert mn == {"a": -0.4667, "b": -0.0667, "c": 0.5333}
    # collapsed range → 0, not NaN/div-by-zero
    one = spark.createDataFrame([("a", 5.0), ("b", 5.0)], "k string, v double")
    flat = {r["k"]: r["v_norm"] for r in normalize_agg(
        one, "v", method="mean"
    ).collect()}
    assert flat == {"a": 0.0, "b": 0.0}


def test_bucket_sort_rank_and_page(spark):
    from monstache_spark.operators.aggs import bucket_sort_agg

    df = spark.createDataFrame(
        [("a", 10), ("b", 40), ("c", 30), ("d", 20)], "k string, n long"
    )
    top2 = bucket_sort_agg(df, [("n", "desc")], size=2).collect()
    assert {(r["k"], r["_rank"]) for r in top2} == {("b", 1), ("c", 2)}
    page = bucket_sort_agg(df, [("n", "desc")], size=2, from_=2).collect()
    assert {(r["k"], r["_rank"]) for r in page} == {("d", 3), ("a", 4)}


def test_cumulative_cardinality_first_appearance(spark):
    from monstache_spark.operators.aggs import cumulative_cardinality

    df = spark.createDataFrame(
        [(1, "u1"), (1, "u2"), (2, "u1"), (2, "u3"), (3, "u3"), (3, None)],
        "day long, user string",
    )
    out = {r["bucket"]: (r["new_values"], r["cumulative_cardinality"])
           for r in cumulative_cardinality(df, F.col("day"), "user").collect()}
    # day1: u1,u2 new; day2: u3 new; day3: nothing new (null drops)
    assert out == {1: (2, 2), 2: (1, 3)}


def test_singular_filter_bucket_scopes_subaggs(ev):
    out = compile_aggs(
        ev,
        {"eu_only": {"filter": {"term": {"region": "eu"}},
                     "aggs": {"total": {"sum": {"field": "val"}}}}},
    ).collect()
    assert len(out) == 1
    # eu rows: ids 1,2,4,8 -> vals 10+20+40+80
    assert (out[0]["eu_only"], out[0]["doc_count"], out[0]["total"]) == ("filter", 4, 150.0)


def test_histogram_gap_fill_and_extended_bounds(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 15.0), (3, 45.0)], "id long, v double"
    )
    out = compile_aggs(
        df, {"h": {"histogram": {"field": "v", "interval": 10.0,
                                 "min_doc_count": 0}}}
    ).collect()
    got = {r["h"]: r["doc_count"] for r in out}
    assert got == {10.0: 2, 20.0: 0, 30.0: 0, 40.0: 1}
    out2 = compile_aggs(
        df, {"h": {"histogram": {"field": "v", "interval": 10.0,
                                 "min_doc_count": 0,
                                 "extended_bounds": {"min": 0.0, "max": 60.0}}}}
    ).collect()
    got2 = {r["h"]: r["doc_count"] for r in out2}
    assert got2 == {0.0: 0, 10.0: 2, 20.0: 0, 30.0: 0, 40.0: 1, 50.0: 0, 60.0: 0}


def test_histogram_gap_fill_fractional_interval(spark):
    # fractional interval: timeline keys must round-trip the SAME
    # floor(v/interval)·interval expression as the bucket keys —
    # generating lo + i·interval drifted for interval=0.1 and the
    # left join silently dropped non-empty buckets
    df = spark.createDataFrame(
        [(1, 0.05), (2, 0.31), (3, 0.35), (4, 0.72)], "id long, v double"
    )
    out = compile_aggs(
        df, {"h": {"histogram": {"field": "v", "interval": 0.1,
                                 "min_doc_count": 0}}}
    ).collect()
    got = {round(r["h"], 10): r["doc_count"] for r in out}
    # every data bucket present (0.0:1, 0.3:2, 0.7:1) and 8 buckets total
    assert got[0.0] == 1 and got[0.3] == 2 and got[0.7] == 1
    assert len(got) == 8 and sum(got.values()) == 4


def test_extended_stats_constant_bucket_zero_std(spark):
    # constant values: sos/n − mean² can cancel slightly negative;
    # std must be 0.0, never NaN
    df = spark.createDataFrame(
        [("a", 7.3), ("a", 7.3), ("a", 7.3)], "k string, v double"
    )
    out = compile_aggs(
        df,
        {"k": {"terms": {"field": "k"},
               "aggs": {"v": {"extended_stats": {"field": "v"}}}}},
    ).collect()
    assert out[0]["v_variance"] == 0.0
    assert out[0]["v_std_deviation"] == 0.0


def test_boxplot_exact_quartiles(spark):
    df = spark.createDataFrame(
        [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8])],
        "id long, k string, v double",
    )
    out = compile_aggs(
        df, {"k": {"terms": {"field": "k"},
                   "aggs": {"b": {"boxplot": {"field": "v"}}}}}
    ).collect()[0]
    assert (out["b_min"], out["b_max"]) == (1.0, 8.0)
    assert (out["b_q1"], out["b_q2"], out["b_q3"]) == (2.75, 4.5, 6.25)


def test_median_absolute_deviation_exact(spark):
    from monstache_spark.operators.aggs import median_absolute_deviation

    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 1, 2, 2, 4, 6, 9]], "k string, v double"
    )
    out = median_absolute_deviation(df, "k", "v").collect()[0]
    # median 2; deviations [1,1,0,0,2,4,7] -> median 1
    assert (out["doc_count"], out["mad"]) == (7, 1.0)


def test_string_stats_lengths_and_entropy(spark):
    import math

    from monstache_spark.operators.aggs import string_stats

    df = spark.createDataFrame(
        [("a", "aab"), ("a", "b"), ("b", "xyzw")], "k string, s string"
    )
    out = {r["k"]: r for r in string_stats(df, "k", "s").collect()}
    a = out["a"]
    assert (a["doc_count"], a["min_length"], a["max_length"], a["avg_length"]) == (2, 1, 3, 2.0)
    # chars a:2, b:2 over 4 -> entropy 1 bit
    assert a["entropy"] == 1.0
    b = out["b"]
    assert b["entropy"] == 2.0   # 4 distinct chars uniform


def test_auto_date_histogram_minute_second_rungs(spark):
    import datetime

    from monstache_spark.operators.aggs import auto_date_histogram

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    # 80 minutes of data -> 10m fixed rung (span/600 <= 9)
    rows = [(i, t0 + datetime.timedelta(minutes=8 * i), 1.0) for i in range(11)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = auto_date_histogram(df, "ts", buckets=10, name="bucket").collect()
    assert all(r["interval"] == "10m" for r in out)
    # epoch-floor edges: all bucket minutes are multiples of 10
    assert all(r["bucket"].minute % 10 == 0 and r["bucket"].second == 0
               for r in out)
    assert sum(r["doc_count"] for r in out) == 11
    # 40 seconds of data -> 5s rung
    rows = [(i, t0 + datetime.timedelta(seconds=4 * i), 1.0) for i in range(11)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = auto_date_histogram(df, "ts", buckets=10, name="bucket").collect()
    assert all(r["interval"] == "5s" for r in out)
    assert all(r["bucket"].second % 5 == 0 for r in out)
    # 8 minutes -> calendar 'minute' rung
    rows = [(i, t0 + datetime.timedelta(seconds=48 * i), 1.0) for i in range(11)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = auto_date_histogram(df, "ts", buckets=10, name="bucket").collect()
    assert all(r["interval"] == "minute" for r in out)


def test_date_histogram_fixed_interval_epoch_floor(spark):
    import datetime

    from monstache_spark.operators.aggs import compile_aggs

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 0, 0, 29), 1.0),
         (2, datetime.datetime(2024, 1, 1, 0, 0, 31), 2.0),
         (3, datetime.datetime(2024, 1, 1, 0, 1, 1), 3.0)],
        "event_id long, ts timestamp, value double",
    )
    out = {r["b"].isoformat(): r["doc_count"] for r in compile_aggs(
        df, {"b": {"date_histogram": {"field": "ts", "fixed_interval": "30s"}}}
    ).collect()}
    assert out == {"2024-01-01T00:00:00": 1, "2024-01-01T00:00:30": 1,
                   "2024-01-01T00:01:00": 1}


def test_rate_agg_calendar_division(spark):
    from pyspark.sql import functions as F

    from monstache_spark.operators.aggs import rate_agg

    df = spark.createDataFrame(
        [("2024-01-05", 31.0), ("2024-01-20", 31.0),
         ("2024-02-10", 29.0), ("2024-03-31", 62.0)],
        "d string, v double",
    ).select(F.to_timestamp("d").alias("ts"), "v")
    out = {r["key"].strftime("%Y-%m"): (r["rate"], r["doc_count"])
           for r in rate_agg(df, "ts", "month", "day", value_col="v").collect()}
    # January: 62 over 31 days = 2/day; February 2024 is a LEAP month:
    # 29/29 = 1/day; March: 62/31 = 2/day
    assert out == {"2024-01": (2.0, 2), "2024-02": (1.0, 1), "2024-03": (2.0, 1)}

    # doc-count rate (no field): events per day over weekly buckets
    out = rate_agg(df, "ts", "week", "day").collect()
    assert all(abs(r["rate"] - round(r["doc_count"] / 7.0, 6)) < 1e-9 for r in out)

    import pytest
    with pytest.raises(ValueError, match="exceed"):
        rate_agg(df, "ts", "day", "week")


def test_moving_percentiles_window(spark):
    from pyspark.sql import functions as F

    from monstache_spark.operators.aggs import moving_percentiles

    rows = []
    for day, vals in [("2024-01-01", [1.0, 3.0]), ("2024-01-02", [5.0]),
                      ("2024-01-03", [7.0, 9.0]), ("2024-01-05", [11.0])]:
        rows += [(day, v) for v in vals]
    df = spark.createDataFrame(rows, "d string, v double").select(
        F.to_timestamp("d").alias("ts"), F.col("v"))
    out = {r["key"].strftime("%m-%d"): (r["doc_count"], r["50"])
           for r in moving_percentiles(df, "ts", "v", [50.0], window=2).collect()}
    # 01-01: own window {1,3} -> 2.0; 01-02: {1,3,5} -> 3.0;
    # 01-03: {5,7,9} -> 7.0; 01-04: trailing window of 01-03's rows
    # {7,9} with ZERO own docs; 01-05: {11}; no 01-06 (past the last
    # real bucket)
    assert out == {"01-01": (2, 2.0), "01-02": (1, 3.0), "01-03": (2, 7.0),
                   "01-04": (0, 8.0), "01-05": (1, 11.0)}


def test_categorize_text_digit_placeholders(spark):
    from monstache_spark.operators.aggs import categorize_text

    df = spark.createDataFrame(
        [(1, "error user 8 took 12ms"), (2, "error user 44 took 9ms"),
         (3, "login ok user 3"), (4, "42 1337"), (5, None)],
        "id long, message string",
    )
    out = [(r["key"], r["doc_count"])
           for r in categorize_text(df, "message", size=5).collect()]
    # digit-bearing tokens drop from the key; all-digit messages and
    # nulls produce no category
    assert out == [("error user took", 2), ("login ok user", 1)]


def test_geo_bounds_box(spark):
    from monstache_spark.operators.geo import geo_bounds

    df = spark.createDataFrame(
        [("a", 10.0, 20.0), ("a", -5.0, 40.0), ("a", 2.0, None),
         ("b", 0.0, 0.0)],
        "k string, lat double, lon double",
    )
    out = {r["k"]: r for r in geo_bounds(df, "lat", "lon", bucket_col="k").collect()}
    assert out["a"]["doc_count"] == 2  # null lon drops
    assert (out["a"]["top_left_lat"], out["a"]["top_left_lon"]) == (10.0, 20.0)
    assert (out["a"]["bottom_right_lat"], out["a"]["bottom_right_lon"]) == (-5.0, 40.0)
    assert out["b"]["doc_count"] == 1


def test_frequent_item_sets_supports(spark):
    from monstache_spark.operators.aggs import frequent_item_sets

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"), (4, "c"),  # duplicate item in one basket
    ]
    df = spark.createDataFrame(rows, "g long, i string")
    out = {(r["items"], r["n_items"]): (r["doc_count"], r["support"])
           for r in frequent_item_sets(df, "g", "i", min_support=0.5,
                                       max_size=2, size=10).collect()}
    # a:3/4, b:3/4, c:2/4, ab:2/4, bc:2/4, ac:1/4 (below threshold)
    assert out == {
        ("a", 1): (3, 0.75), ("b", 1): (3, 0.75), ("c", 1): (2, 0.5),
        ("a b", 2): (2, 0.5), ("b c", 2): (2, 0.5),
    }
    # triples: abc appears once -> only with lower threshold
    out3 = {r["items"] for r in frequent_item_sets(
        df, "g", "i", min_support=0.25, max_size=3, size=20).collect()}
    assert "a b c" in out3


def test_matrix_stats_reference_values(spark):
    import math

    from monstache_spark.operators.aggs import matrix_stats

    xs = [1.0, 2.0, 3.0, 4.0, 10.0]
    ys = [2.0, 1.0, 5.0, 3.0, 9.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = matrix_stats(df, ["x", "y"]).collect()[0]
    n = len(xs)
    mx = sum(xs) / n
    m2 = sum((v - mx) ** 2 for v in xs)
    m3 = sum((v - mx) ** 3 for v in xs)
    m4 = sum((v - mx) ** 4 for v in xs)
    assert r["doc_count"] == n
    assert abs(r["mean_a"] - round(mx, 6)) < 1e-9
    assert abs(r["variance_a"] - round(m2 / (n - 1), 6)) < 1e-6
    assert abs(r["skewness_a"] - round(math.sqrt(n) * m3 / m2 ** 1.5, 6)) < 1e-6
    assert abs(r["kurtosis_a"] - round(n * m4 / m2 ** 2, 6)) < 1e-6
    cov = sum((a - mx) * (b - sum(ys) / n) for a, b in zip(xs, ys))
    assert abs(r["covariance"] - round(cov / (n - 1), 6)) < 1e-6
    my = sum(ys) / n
    m2y = sum((v - my) ** 2 for v in ys)
    assert abs(r["correlation"] - round(cov / math.sqrt(m2 * m2y), 6)) < 1e-6
    # docs missing any field are skipped entirely
    df2 = spark.createDataFrame([(1.0, 2.0), (3.0, None)], "x double, y double")
    assert matrix_stats(df2, ["x", "y"]).collect()[0]["doc_count"] == 1


def test_bucket_correlation_perfect_and_inverse(spark):
    from monstache_spark.operators.aggs import bucket_correlation

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, v double")
    r = bucket_correlation(df, "k", "v", [1.0, 2.0, 3.0, 4.0]).collect()[0]
    assert r["correlation"] == 1.0 and r["n"] == 4
    r = bucket_correlation(df, "k", "v", [4.0, 3.0, 2.0, 1.0]).collect()[0]
    assert r["correlation"] == -1.0
    # constant indicator has no variance -> null
    r = bucket_correlation(df, "k", "v", [5.0, 5.0, 5.0, 5.0]).collect()[0]
    assert r["correlation"] is None


def test_bucket_count_ks_test_statistic(spark):
    import math

    from monstache_spark.operators.aggs import bucket_count_ks_test

    df = spark.createDataFrame(
        [(1, 70), (2, 10), (3, 10), (4, 10)], "k long, doc_count long")
    r = bucket_count_ks_test(df, "k").collect()[0]
    # ECDF: .7 .8 .9 1.0 vs uniform .25 .5 .75 1.0 -> D = .45 at k=1
    assert r["statistic"] == 0.45 and r["n"] == 100
    assert abs(r["p_approx"] - round(min(1.0, 2 * math.exp(-2 * 100 * 0.45 ** 2)), 4)) < 1e-9
    # explicit expected fractions matching the data -> D = 0
    r = bucket_count_ks_test(df, "k", fractions=[0.7, 0.1, 0.1, 0.1]).collect()[0]
    assert r["statistic"] == 0.0 and r["p_approx"] == 1.0


def test_change_point_step_series(spark):
    from monstache_spark.operators.aggs import change_point

    rows = [(i, 10.0) for i in range(1, 6)] + [(i, 50.0) for i in range(6, 11)]
    df = spark.createDataFrame(rows, "k long, v double")
    r = change_point(df, "k", "v").collect()[0]
    # best split after k=5: left mean 10, right mean 50
    assert (r["key"], r["change_type"]) == (5, "step_change")
    assert (r["mean_left"], r["mean_right"]) == (10.0, 50.0)
    # flat series: no variance reduction anywhere -> stationary
    flat = spark.createDataFrame([(i, 7.0) for i in range(1, 8)], "k long, v double")
    r = change_point(flat, "k", "v").collect()[0]
    assert r["change_type"] == "stationary" and r["score"] == 0.0


def test_t_test_agg_forms(spark):
    import math

    import pytest

    from monstache_spark.operators.aggs import t_test_agg

    df = spark.createDataFrame(
        [(10.0, 12.0, "a"), (20.0, 19.0, "a"), (30.0, 31.0, "b"), (40.0, 38.0, "b")],
        "va double, vb double, g string")
    # paired: diffs (-2, 1, -1, 2) -> mean 0 -> t = 0, p = 1
    r = t_test_agg(df, "va", field_b="vb", type="paired").collect()[0]
    assert (r["t_statistic"], r["df"], r["p_value"]) == (0.0, 3.0, 1.0)
    # welch on groups: a={10,20} b={30,40} -> t=-2.828427, df=2
    r = t_test_agg(df, "va", group_field="g", group_values=("a", "b")).collect()[0]
    m1, m2, v = 15.0, 35.0, 50.0
    t = (m1 - m2) / math.sqrt(v / 2 + v / 2)
    assert r["t_statistic"] == round(t, 6) and r["df"] == 2.0
    assert (r["n_a"], r["n_b"]) == (2, 2)
    # equal variances: pooled == welch here
    r2 = t_test_agg(df, "va", group_field="g", group_values=("a", "b"),
                    type="homoscedastic").collect()[0]
    assert r2["t_statistic"] == r["t_statistic"]
    with pytest.raises(ValueError, match="paired"):
        t_test_agg(df, "va", group_field="g", group_values=("a", "b"),
                   type="paired")
    with pytest.raises(ValueError, match="exactly one"):
        t_test_agg(df, "va")


def test_ip_range_agg_masks_and_bounds(spark):
    from pyspark.sql import functions as F

    from monstache_spark.operators.aggs import ip_range_agg

    df = spark.createDataFrame(
        [("10.0.0.5",), ("10.0.1.200",), ("10.0.2.1",), ("10.0.255.255",), (None,)],
        "ip string")
    out = {r["key"]: r["doc_count"] for r in ip_range_agg(df, "ip", [
        {"to": "10.0.2.0"},
        {"from": "10.0.2.0", "to": "10.0.3.0", "key": "mid"},
        {"mask": "10.0.0.0/23"},
    ]).collect()}
    # /23 covers 10.0.0.0 - 10.0.1.255; multi-membership counts both
    assert out == {"*-10.0.2.0": 2, "mid": 1, "10.0.0.0/23": 2}


def test_ip_prefix_agg_networks(spark):
    import pytest

    from monstache_spark.operators.aggs import ip_prefix_agg

    df = spark.createDataFrame(
        [("10.0.0.5",), ("10.0.0.200",), ("10.0.1.7",), ("10.2.3.4",), (None,)],
        "ip string")
    out = [(r["key"], r["prefix_length"], r["doc_count"])
           for r in ip_prefix_agg(df, "ip", 24).collect()]
    assert out == [("10.0.0.0", 24, 2), ("10.0.1.0", 24, 1), ("10.2.3.0", 24, 1)]
    out = [(r["key"], r["doc_count"]) for r in ip_prefix_agg(df, "ip", 15).collect()]
    assert out == [("10.0.0.0", 3), ("10.2.0.0", 1)]
    with pytest.raises(ValueError, match="prefix_length"):
        ip_prefix_agg(df, "ip", 0)


def test_global_agg_scopes(ev):
    from monstache_spark.operators.aggs import global_agg

    out = global_agg(
        ev,
        {"term": {"region": "eu"}},
        {"total": {"sum": {"field": "val"}}},
    )
    got = {r["scope"]: (r["doc_count"], r["total"]) for r in out.collect()}
    # query scope: eu rows (1,2,4,8) sum 150; global: all 8 rows sum 290
    assert got["query"] == (4, 150.0)
    assert got["global"] == (8, 290.0)


def test_global_agg_with_bucket_tree(ev):
    from monstache_spark.operators.aggs import global_agg

    out = global_agg(
        ev, {"term": {"region": "us"}}, {"k": {"terms": {"field": "kind"}}}
    )
    got = {(r["scope"], r["k"]): r["doc_count"] for r in out.collect()}
    assert got[("query", "buy")] == 1 and got[("global", "buy")] == 2
    assert ("query", "view") in got and got[("global", "click")] == 3


def test_random_sampler_scales_and_is_deterministic(ev):
    from monstache_spark.operators.aggs import random_sampler_agg

    a = random_sampler_agg(
        ev, 0.5, {"k": {"terms": {"field": "kind", "min_doc_count": 1}}},
        seed=3, id_col="id",
    ).collect()
    b = random_sampler_agg(
        ev.repartition(7), 0.5,
        {"k": {"terms": {"field": "kind", "min_doc_count": 1}}},
        seed=3, id_col="id",
    ).collect()
    # membership is (seed, id)-keyed: identical under any partitioning
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # doc_count is scaled by 1/p: every count is the sample count x2
    import pytest as _pt

    with _pt.raises(ValueError, match="probability"):
        random_sampler_agg(ev, 0.0, {"k": {"terms": {"field": "kind"}}})


def test_percentiles_bucket_exact(spark):
    from monstache_spark.operators.aggs import percentiles_bucket

    buckets = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0), ("d", 40.0)], "k string, m double"
    )
    row = percentiles_bucket(buckets, "m", percents=(50.0, 99.0)).collect()[0]
    # exact interpolation over [10,20,30,40]
    assert row["m_p50"] == 25.0
    assert row["m_p99"] == 39.7


def test_scripted_metric_reduces(ev):
    import pytest as _pt

    from monstache_spark.operators.aggs import scripted_metric

    out = scripted_metric(
        ev.filter(F.col("val").isNotNull()),
        "val * 2",
        reduce="sum",
        group_by=["region"],
        name="doubled",
    )
    got = {r["region"]: r["doubled"] for r in out.collect()}
    assert got["us"] == 280.0  # (30+50+60)*2
    with _pt.raises(ValueError, match="order-dependent"):
        scripted_metric(ev, "val", reduce="concat")


def test_children_and_parent_aggs(spark):
    from monstache_spark.operators.aggs import children_agg, parent_agg

    parents = spark.createDataFrame(
        [(1, "eu"), (2, "us"), (3, "eu")], "pid long, region string"
    )
    children = spark.createDataFrame(
        [(10, 1, "a", 5.0), (11, 1, "b", 7.0), (12, 2, "a", 9.0),
         (13, 9, "a", 1.0)],
        "cid long, pid long, kind string, v double",
    )
    out = children_agg(
        parents, children, "pid", "pid",
        {"k": {"terms": {"field": "kind"},
               "aggs": {"total": {"sum": {"field": "v"}}}}},
        parent_filter={"term": {"region": "eu"}},
    )
    got = {r["k"]: (r["doc_count"], r["total"]) for r in out.collect()}
    # only parent 1 is eu; orphan child 13 never matches
    assert got == {"a": (1, 5.0), "b": (1, 7.0)}

    out = parent_agg(
        children, parents, "pid", "pid",
        {"r": {"terms": {"field": "region"}}},
        child_filter={"term": {"kind": "a"}},
    )
    got = {r["r"]: r["doc_count"] for r in out.collect()}
    # parent 1 has one matching child, parent 2 one; each counts ONCE
    assert got == {"eu": 1, "us": 1}


def test_variable_width_histogram_largest_gaps(spark):
    from monstache_spark.operators.aggs import variable_width_histogram

    df = spark.createDataFrame(
        [(1.0,), (1.1,), (1.2,), (5.0,), (5.1,), (9.0,), (9.0,)], "v double"
    )
    out = sorted(
        (r["key"], r["min"], r["max"], r["doc_count"])
        for r in variable_width_histogram(df, "v", 3).collect()
    )
    # cuts at the two largest gaps (1.2->5.0 and 5.1->9.0)
    assert out == [(1.1, 1.0, 1.2, 3), (5.05, 5.0, 5.1, 2), (9.0, 9.0, 9.0, 2)]
    # buckets=1: one bucket over everything
    one = variable_width_histogram(df, "v", 1).collect()
    assert len(one) == 1 and one[0]["doc_count"] == 7
    # partitioning independence: gaps stitched across range partitions
    out2 = sorted(
        (r["key"], r["min"], r["max"], r["doc_count"])
        for r in variable_width_histogram(
            df.repartition(5), "v", 3, range_partitions=3
        ).collect()
    )
    assert out2 == out
    import pytest as _pt

    with _pt.raises(ValueError, match="buckets"):
        variable_width_histogram(df, "v", 0)


def test_downsample_rollup(spark):
    import datetime

    from monstache_spark.operators.aggs import downsample

    t0 = datetime.datetime(2024, 1, 1, 0, 10)
    t1 = datetime.datetime(2024, 1, 1, 0, 50)
    t2 = datetime.datetime(2024, 1, 1, 1, 5)
    df = spark.createDataFrame(
        [(1, "a", t0, 1.0), (2, "a", t1, 5.0), (3, "a", t1, 3.0),
         (4, "a", t2, 7.0), (5, "b", t0, 2.0)],
        "event_id long, dim string, ts timestamp, v double",
    )
    out = {(r["dim"], r["bucket"].hour): r for r in downsample(
        df, "ts", ["dim"], gauges=["v"], counters=["v"], fixed_interval="1h"
    ).collect()}
    a0 = out[("a", 0)]
    # gauge stats over the 00:xx bucket; counter last = the value at
    # the latest (ts, id) — t1 ties break by MAX id (id 3 -> 3.0)
    assert (a0["doc_count"], a0["v_min"], a0["v_max"], a0["v_sum"],
            a0["v_count"], a0["v_last"]) == (3, 1.0, 5.0, 9.0, 3, 3.0)
    assert out[("a", 1)]["v_last"] == 7.0
    assert out[("b", 0)]["doc_count"] == 1
    import pytest as _pt

    with _pt.raises(ValueError, match="fixed_interval"):
        downsample(df, "ts", ["dim"], ["v"], fixed_interval="1month")


def test_transform_latest_whole_rows(spark):
    import datetime

    from monstache_spark.operators.aggs import transform_latest

    d = lambda day: datetime.datetime(2024, 1, day)  # noqa: E731
    df = spark.createDataFrame(
        [(1, "k1", d(1), "old"), (2, "k1", d(5), "new"),
         (3, "k1", d(5), "tie-high-id"), (4, "k2", d(2), "only")],
        "id long, key string, ts timestamp, payload string",
    )
    out = {r["key"]: r for r in transform_latest(df, ["key"], "ts", "id").collect()}
    # latest per key; ties on ts break by MAX id
    assert out["k1"]["id"] == 3 and out["k1"]["payload"] == "tie-high-id"
    assert out["k2"]["id"] == 4
    assert set(out["k1"].asDict()) == {"id", "key", "ts", "payload"}


def test_extended_stats_bucket_moments(spark):
    from monstache_spark.operators.aggs import extended_stats_bucket

    buckets = spark.createDataFrame(
        [("a", 2.0), ("b", 4.0), ("c", 4.0), ("d", 4.0), ("e", 5.0),
         ("f", 5.0), ("g", 7.0), ("h", 9.0)],
        "k string, m double",
    )
    r = extended_stats_bucket(buckets, "m").collect()[0]
    # classic example: variance 4, std 2
    assert (r["m_bucket_count"], r["m_bucket_avg"]) == (8, 5.0)
    assert r["m_bucket_variance"] == 4.0 and r["m_bucket_std_deviation"] == 2.0
    # constant buckets clamp to exactly 0, never NaN
    one = spark.createDataFrame([("a", 3.0), ("b", 3.0)], "k string, m double")
    r = extended_stats_bucket(one, "m").collect()[0]
    assert r["m_bucket_variance"] == 0.0 and r["m_bucket_std_deviation"] == 0.0


def test_moving_fn(spark):
    """ES moving_fn (r14): window = prior `window` buckets (shift=0
    excludes the current; first bucket NULL), ewma = the exact ES
    oldest-seeded fold, linearWeightedAvg ramps toward the newest,
    stdDev is population over the window."""
    import pytest

    from monstache_spark.operators.aggs import moving_fn

    b = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 40.0), ("a", 4, 30.0),
         ("b", 1, 5.0)],
        "k string, t long, v double",
    )
    out = {(r["k"], r["t"]): r for r in moving_fn(
        b, "t", "v", 3, "ewma", parent_cols=["k"]).collect()}
    assert out[("a", 1)]["v_mfn"] is None  # empty prior window
    assert out[("a", 2)]["v_mfn"] == 10.0  # seed = oldest
    # fold [10, 20]: 20*0.3 + 10*0.7 = 13.0
    assert out[("a", 3)]["v_mfn"] == 13.0
    # fold [10,20,40]: 13.0 then 40*0.3 + 13*0.7 = 21.1
    assert out[("a", 4)]["v_mfn"] == 21.1
    assert out[("b", 1)]["v_mfn"] is None  # partitions isolate
    lwa = {(r["k"], r["t"]): r["v_mfn"] for r in moving_fn(
        b, "t", "v", 3, "linearWeightedAvg", parent_cols=["k"]).collect()}
    # window [10,20,40] weights 1,2,3: (10+40+120)/6
    assert lwa[("a", 4)] == round(170 / 6, 6)
    sd = {(r["k"], r["t"]): r["v_mfn"] for r in moving_fn(
        b, "t", "v", 3, "stdDev", parent_cols=["k"]).collect()}
    assert sd[("a", 1)] is None
    assert sd[("a", 2)] == 0.0  # single value
    mx = {(r["k"], r["t"]): r["v_mfn"] for r in moving_fn(
        b, "t", "v", 2, "max", parent_cols=["k"]).collect()}
    assert mx[("a", 4)] == 40.0  # window [20, 40]
    # shift=1 includes the current bucket
    s1 = {(r["k"], r["t"]): r["v_mfn"] for r in moving_fn(
        b, "t", "v", 2, "max", shift=1, parent_cols=["k"]).collect()}
    assert s1[("a", 1)] == 10.0
    with pytest.raises(ValueError, match="refused"):
        moving_fn(b, "t", "v", 3, "holt")
    with pytest.raises(ValueError, match="one of"):
        moving_fn(b, "t", "v", 3, "nope")
