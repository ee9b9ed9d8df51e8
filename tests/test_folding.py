"""ASCII folding (functions/folding.py): map behavior, three-rendering
parity (Python / Column / DuckDB SQL), and the Analyzer chain order
(fold BEFORE stop matching, positions unchanged)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from monstache_spark.functions.folding import (
    _EXPANSIONS,
    _PAIRS,
    fold_col,
    fold_py,
    fold_sql,
)

# every mapped character once, plus expansions, plus ascii passthrough
_PROBES = (
    ["café", "müller", "señor", "tłumacz", "œuvre", "straße", "þorn"]
    + [f"x{a}y" for a, _ in _PAIRS]
    + [f"x{a}y" for a, _ in _EXPANSIONS]
    + ["plain", "", "mixed-café-strasse"]
)


def test_fold_py_behavior():
    assert fold_py("café") == "cafe"
    assert fold_py("straße") == "strasse"
    assert fold_py("œuvre") == "oeuvre"
    assert fold_py("þorn") == "thorn"
    assert fold_py("ĳsselmeer") == "ijsselmeer"
    assert fold_py("plain") == "plain"
    # every single-char mapping folds to its ascii target
    for src, dst in _PAIRS:
        assert fold_py(src) == dst


def test_three_renderings_agree(spark):
    sdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _PROBES])).alias("t")
    )
    got_col = [r["f"] for r in sdf.select(fold_col(F.col("t")).alias("f")).collect()]
    got_py = [fold_py(p) for p in _PROBES]
    con = duckdb.connect()
    vals = ", ".join("(" + f"'{p}'" + ")" for p in _PROBES)
    got_sql = [
        r[0]
        for r in con.execute(
            f"SELECT {fold_sql('t')} FROM (VALUES {vals}) AS v(t)"
        ).fetchall()
    ]
    assert got_col == got_py == got_sql


def test_analyzer_folding_chain_order(spark):
    """Folding runs before stop matching ('thé' folds to the stop word
    'the' and is removed) and before stemming; positions keep Lucene
    increments across the removed folded stop word."""
    from monstache_spark.functions.analyzer import ENGLISH_FOLDED

    a = ENGLISH_FOLDED
    assert a.analyze("thé café chairs") == ["cafe", "chair"]
    assert a.analyze_pos("thé café chairs") == [("cafe", 1), ("chair", 2)]
    df = spark.range(1).select(F.lit("thé café chairs").alias("text"))
    got = df.select(a.tokens(F.col("text")).alias("toks")).collect()[0]["toks"]
    assert got == ["cafe", "chair"]
    got_pos = df.select(a.tokens_pos(F.col("text")).alias("tp")).collect()[0]["tp"]
    assert [(e["t"], e["p"]) for e in got_pos] == [("cafe", 1), ("chair", 2)]
    # SQL mirrors
    con = duckdb.connect()
    sql_toks = con.execute(
        f"SELECT {a.sql_tokens('t')} FROM (VALUES ('thé café chairs')) v(t)"
    ).fetchone()[0]
    assert sql_toks == ["cafe", "chair"]
    sql_pos = con.execute(
        f"SELECT {a.sql_tokens_pos('t')} FROM (VALUES ('thé café chairs')) v(t)"
    ).fetchone()[0]
    assert [(e["t"], e["p"]) for e in sql_pos] == [("cafe", 1), ("chair", 2)]


def test_synonym_filter_three_renderings_and_order(spark):
    """Synonyms apply after stop removal and before stemming, in all
    three renderings; positions survive the rewrite."""
    import duckdb
    from pyspark.sql import functions as F

    from monstache_spark.functions.analyzer import Analyzer

    a = Analyzer(
        stopwords=("the",),
        synonyms=(("quick", "fast"), ("autos", "cars")),
        stem_suffixes=("s",),
    )
    text = "the quick autos won"
    # python: stop 'the' removed; quick->fast; autos->cars->stem 'car'
    assert a.analyze(text) == ["fast", "car", "won"]
    assert a.analyze_pos(text) == [("fast", 1), ("car", 2), ("won", 3)]
    df = spark.range(1).select(F.lit(text).alias("t"))
    got = df.select(a.tokens(F.col("t")).alias("x")).collect()[0]["x"]
    assert got == ["fast", "car", "won"]
    got_pos = df.select(a.tokens_pos(F.col("t")).alias("x")).collect()[0]["x"]
    assert [(e["t"], e["p"]) for e in got_pos] == [
        ("fast", 1), ("car", 2), ("won", 3),
    ]
    con = duckdb.connect()
    sql = con.execute(
        f"SELECT {a.sql_tokens('t')} FROM (VALUES ('{text}')) v(t)"
    ).fetchone()[0]
    assert sql == ["fast", "car", "won"]
    sql_pos = con.execute(
        f"SELECT {a.sql_tokens_pos('t')} FROM (VALUES ('{text}')) v(t)"
    ).fetchone()[0]
    assert [(e["t"], e["p"]) for e in sql_pos] == [
        ("fast", 1), ("car", 2), ("won", 3),
    ]
