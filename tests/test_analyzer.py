"""Configurable analyzer chain (functions/analyzer.py): the three
renderings (Spark Column, Python, DuckDB SQL) must agree verbatim —
DIVERGENCES.md S1 closure."""

import duckdb
import pytest
from pyspark.sql import functions as F

from monstache_spark.functions.analyzer import (
    ENGLISH,
    Analyzer,
    ENGLISH_STOPWORDS,
)


SAMPLES = [
    "The Quick joins RAN over the queries",
    "  spaced   out  tokens  ",
    "ties flies ing ed s es",      # suffix/min-stem edge cases
    "THE AND OR",                  # stopwords (and a non-stop 'or'... 'or' IS a stopword)
    "",
]


def test_default_analyzer_is_behavior_neutral():
    a = Analyzer()
    assert a.analyze("The  Quick fox") == ["the", "quick", "fox"]


def test_python_chain_stopwords_and_stems():
    assert ENGLISH.analyze("The quick joins") == ["quick", "join"]
    # min_stem guards short tokens: 'ing' (len 3) keeps itself,
    # 'ties' -> 'ies' would leave 1 char -> falls through to 's' rule?
    # 'ties': endswith 'ies', 4-3=1 < 3 -> next; 'ing' no; 'ed' no;
    # 'es' -> 4-2=2 < 3 -> next; 's' -> 4-1=3 >= 3 -> 'tie'
    assert ENGLISH.analyze("ties") == ["tie"]
    assert ENGLISH.analyze("ing es s") == ["ing", "es", "s"]
    assert ENGLISH.analyze("the to of") == []


@pytest.mark.parametrize("cfg", [Analyzer(), ENGLISH,
                                 Analyzer(stopwords=("x",), stem_suffixes=("ing",))])
def test_three_renderings_agree(spark, cfg):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)],
                               "id long, text string")
    spark_out = {
        r["id"]: r["toks"]
        for r in df.select("id", cfg.tokens(F.col("text")).alias("toks")).collect()
    }
    py_out = {i: cfg.analyze(s) for i, s in enumerate(SAMPLES)}
    con = duckdb.connect()
    sql_out = {}
    for i, s in enumerate(SAMPLES):
        sql_out[i] = con.execute(
            "SELECT " + cfg.sql_tokens("t") + " FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
    assert spark_out == py_out == sql_out


def test_match_with_analyzer_stems_and_stops(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "she joined the team"), (2, "join us"), (3, "disjoint sets"),
         (4, "the a to")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match": {"text": "the joins"}}, analyzer=ENGLISH
    ).collect()}
    assert got == {1, 2}          # joined/join both stem to 'join'; 'the' inert
    # all-stopword query matches nothing
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match": {"text": "the to"}}, analyzer=ENGLISH
    ).collect()}
    assert got == set()


def test_bm25_analyzer_changes_df_and_matches(spark):
    from monstache_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(1, "the cat runs"), (2, "cats running fast"), (3, "dogs bark")],
        "doc_id long, text string",
    )
    plain = {r["doc_id"] for r in bm25_topk(df, ["cats"], k=5).collect()}
    assert plain == {2}
    stemmed = {r["doc_id"] for r in bm25_topk(
        df, ["cats"], k=5,
        analyzer=Analyzer(stopwords=ENGLISH_STOPWORDS,
                          stem_suffixes=("ning", "ing", "s")),
    ).collect()}
    assert stemmed == {1, 2}      # 'cats'->'cat' meets 'cat' and 'cats'->'cat'


def test_analyzed_phrase_position_increments(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, "hash join plan"), (2, "hash the join"), (3, "hash outer join"),
         (4, "join hash"), (5, "hash distributed merge join")],
        "doc_id long, text string",
    )
    # "hash join" analyzed: hash@0, join@1 -> adjacency required
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match_phrase": {"text": "hash join"}}, analyzer=ENGLISH
    ).collect()}
    assert got == {1}
    # "hash the join": the@1 removed -> hash@0, join@2 -> one-token gap
    # required (ANY filler token, as in Lucene position matching)
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match_phrase": {"text": "hash the join"}}, analyzer=ENGLISH
    ).collect()}
    assert got == {2, 3}
    # stemming applies inside the phrase: 'joins' -> 'join'
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match_phrase": {"text": "hash joins"}}, analyzer=ENGLISH
    ).collect()}
    assert got == {1}
    # all-stopword phrase matches nothing
    got = {r["doc_id"] for r in bool_query_filter(
        df, {"match_phrase": {"text": "the a"}}, analyzer=ENGLISH
    ).collect()}
    assert got == set()


def test_tokens_pos_three_renderings_agree(spark):
    import duckdb
    from pyspark.sql import functions as F

    samples = ["The quick joins RAN", "", "the a to", "one  two   three"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "id long, text string")
    spark_out = {
        r["id"]: [(e["t"], e["p"]) for e in r["tp"]]
        for r in df.select("id", ENGLISH.tokens_pos(F.col("text")).alias("tp")).collect()
    }
    py_out = {i: ENGLISH.analyze_pos(s) for i, s in enumerate(samples)}
    con = duckdb.connect()
    sql_out = {}
    for i, s in enumerate(samples):
        rows = con.execute(
            "SELECT " + ENGLISH.sql_tokens_pos("t") + " FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
        sql_out[i] = [(e["t"], e["p"]) for e in rows]
    assert spark_out == py_out == sql_out


def test_sql_literal_escaping_apostrophes():
    """ADVICE r9: synonyms/stopwords containing apostrophes must render
    valid DuckDB SQL (single quotes doubled)."""
    import duckdb

    from monstache_spark.functions.analyzer import Analyzer

    an = Analyzer(stopwords=("don't",), synonyms=(("can't", "cannot"),))
    sql = an.sql_tokens("text")
    rows = duckdb.sql(
        f"SELECT {sql} AS t FROM (SELECT 'i don''t can''t go' AS text)"
    ).fetchall()
    assert rows[0][0] == ["i", "cannot", "go"]
    sql_pos = an.sql_tokens_pos("text")
    rows = duckdb.sql(
        f"SELECT {sql_pos} AS t FROM (SELECT 'i don''t can''t go' AS text)"
    ).fetchall()
    assert [e["t"] for e in rows[0][0]] == ["i", "cannot", "go"]
