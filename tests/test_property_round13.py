"""Property tests for the round-13 operators, each compared against a
pure-Python reference of the DOCUMENTED contract:

- ES|QL MATCH_PHRASE vs a consecutive-subsequence checker over the
  simple-analyzed token stream (random docs drawn near/far from a
  random phrase, so both match and miss branches exercise).
- ES|QL FORK vs a manual union of independently-compiled branches
  (null-fill + `_fork` discriminator).
- sliced_scroll's partition property over random STRING ids:
  disjoint, collectively exhaustive, slice-count-parameterized.
- reroute's mustache binding over random field values.

One Spark action per example."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from monstache_spark.operators.esql import esql
from monstache_spark.operators.ingest import ingest_pipeline
from monstache_spark.operators.search import sliced_scroll

_WORDS = ["alpha", "beta", "Gamma", "delta", "ALPHA", "x1"]


@st.composite
def _docs_and_phrase(draw):
    phrase = draw(st.lists(st.sampled_from(_WORDS), min_size=1,
                           max_size=3))
    docs = []
    for i in range(draw(st.integers(min_value=1, max_value=6))):
        base = draw(st.lists(st.sampled_from(_WORDS), min_size=0,
                             max_size=6))
        if draw(st.booleans()):  # plant the phrase at a random offset
            pos = draw(st.integers(min_value=0, max_value=len(base)))
            base = base[:pos] + phrase + base[pos:]
        docs.append((i, " ".join(base) if base else draw(
            st.sampled_from(["", "   "]))))
    return docs, phrase


@settings(max_examples=15, deadline=None)
@given(_docs_and_phrase())
def test_match_phrase_property(spark, data):
    docs, phrase = data
    df = spark.createDataFrame(docs, "id long, text string")
    q = " ".join(phrase)
    got = {r["id"] for r in esql(
        f'FROM d | WHERE MATCH_PHRASE(text, "{q}") | KEEP id',
        {"d": df}).collect()}
    want = set()
    ptoks = [w.lower() for w in q.split()]
    for i, text in docs:
        toks = [t for t in text.strip().lower().split() if t]
        n = len(ptoks)
        if any(toks[j:j + n] == ptoks
               for j in range(len(toks) - n + 1)):
            want.add(i)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=4),
       st.integers(min_value=1, max_value=5))
def test_fork_equals_manual_union(spark, cut1, cut2):
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(8)], "id long, g long, v double"
    )
    forked = esql(
        f"FROM t | FORK ( WHERE g >= {cut1} | STATS n = COUNT(*) BY g )"
        f" ( WHERE id < {cut2} | EVAL w = v + 1 | KEEP id, w )",
        {"t": df},
    )
    b1 = esql(f"FROM t | WHERE g >= {cut1} | STATS n = COUNT(*) BY g",
              {"t": df}).withColumn("_fork", F.lit("fork1"))
    b2 = esql(f"FROM t | WHERE id < {cut2} | EVAL w = v + 1 | KEEP id, w",
              {"t": df}).withColumn("_fork", F.lit("fork2"))
    manual = b1.unionByName(b2, allowMissingColumns=True)
    key = lambda r: tuple(str(r[c]) for c in sorted(forked.columns))
    assert sorted(map(key, forked.collect())) == sorted(
        map(key, manual.select(*forked.columns).collect()))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abc0 _é", min_size=0, max_size=6),
                min_size=1, max_size=12, unique=True),
       st.integers(min_value=2, max_value=5))
def test_sliced_scroll_partition_property(spark, ids, m):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    parts = [
        {r["doc_id"] for r in sliced_scroll(df, i, m, id_col="doc_id")
         .collect()}
        for i in range(m)
    ]
    union = set().union(*parts)
    assert union == set(ids)
    assert sum(len(p) for p in parts) == len(ids)  # disjoint


@settings(max_examples=10, deadline=None)
@given(st.sampled_from(["web", "api-x", "", "a b"]),
       st.sampled_from(["prod", "dev_1", ""]))
def test_reroute_mustache_property(spark, svc, env):
    df = spark.createDataFrame([(1, svc, env)],
                               "id long, svc string, env string")
    out = ingest_pipeline(df, [{"reroute": {
        "dataset": "{{svc}}", "namespace": "{{env}}"}}]).collect()[0]
    # concat_ws skips NULLs but keeps empty strings — empty parts stay
    # as empty segments
    assert out["_index"] == f"logs-{svc}-{env}"
