"""Porter stemmer (functions/porter.py): canonical behavior against an
independent imperative reference port, plus three-rendering parity
(Python / Column / DuckDB SQL) over the real corpus vocabulary."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from monstache_spark.functions.porter import (
    porter_stem_py,
    porter_tokens_col,
    porter_tokens_sql,
)

# ---------------------------------------------------------------------------
# independent reference port (imperative, official-port structure with
# the entry guard and Y-marking) — deliberately NOT sharing code with
# the ops-based implementation it checks
# ---------------------------------------------------------------------------

_c = "[^aeiou]"
_v = "[aeiouy]"
_C = _c + "[^aeiouy]*"
_V = _v + "[aeiou]*"
_mgr0 = re.compile("^(" + _C + ")?" + _V + _C)
_meq1 = re.compile("^(" + _C + ")?" + _V + _C + "(" + _V + ")?$")
_mgr1 = re.compile("^(" + _C + ")?" + _V + _C + _V + _C)
_s_v = re.compile("^(" + _C + ")?" + _v)
_cvc = re.compile(_C + _v + "[^aeiouwxy]$")

_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _ref_porter(w: str) -> str:
    if len(w) < 3:
        return w
    restore_y = w[0] == "y"
    if restore_y:
        w = "Y" + w[1:]
    # 1a
    m = re.search(r"^(.+?)(ss|i)es$", w)
    if m:
        w = m.group(1) + m.group(2)
    else:
        m = re.search(r"^(.+?)([^s])s$", w)
        if m:
            w = m.group(1) + m.group(2)
    # 1b
    m = re.search(r"^(.+?)eed$", w)
    if m:
        if _mgr0.search(m.group(1)):
            w = m.group(1) + "ee"
    else:
        m = re.search(r"^(.+?)(ed|ing)$", w)
        if m and _s_v.search(m.group(1)):
            w = m.group(1)
            if re.search(r"(at|bl|iz)$", w):
                w += "e"
            elif re.search(
                r"(bb|cc|dd|ff|gg|hh|jj|kk|mm|nn|pp|qq|rr|tt|vv|ww|xx)$", w
            ):
                w = w[:-1]
            elif _meq1.search(w) and _cvc.search(w):
                w += "e"
    # 1c
    m = re.search(r"^(.+?)y$", w)
    if m and _s_v.search(m.group(1)):
        w = m.group(1) + "i"
    # 2
    m = re.search(r"^(.+?)(" + "|".join(s for s, _ in _STEP2) + ")$", w)
    if m and _mgr0.search(m.group(1)):
        w = m.group(1) + dict(_STEP2)[m.group(2)]
    # 3
    m = re.search(r"^(.+?)(" + "|".join(s for s, _ in _STEP3) + ")$", w)
    if m and _mgr0.search(m.group(1)):
        w = m.group(1) + dict(_STEP3)[m.group(2)]
    # 4
    m = re.search(r"^(.+?)(" + "|".join(_STEP4) + ")$", w)
    if m:
        if _mgr1.search(m.group(1)):
            w = m.group(1)
    else:
        m = re.search(r"^(.+?)(s|t)(ion)$", w)
        if m and _mgr1.search(m.group(1) + m.group(2)):
            w = m.group(1) + m.group(2)
    # 5a
    m = re.search(r"^(.+?)e$", w)
    if m:
        stem = m.group(1)
        if _mgr1.search(stem) or (
            _meq1.search(stem) and not _cvc.search(stem)
        ):
            w = stem
    # 5b
    if re.search(r"ll$", w) and _mgr1.search(w):
        w = w[:-1]
    if restore_y:
        w = "y" + w[1:]
    return w


# canonical behavior pairs derived from the 1980 paper's step examples,
# run through the FULL cascade
CANONICAL = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "caress": "caress", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration",
    "hesitanci": "hesit", "digitizer": "digit", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "electriciti": "electr",
    "triplicate": "triplic", "formative": "form", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "adjustable": "adjust", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "effective": "effect",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controlling": "control", "rolling": "roll", "ion": "ion",
    "by": "by", "a": "a", "yellow": "yellow", "year": "year",
}


def test_canonical_pairs_and_reference_agreement():
    for w, want in CANONICAL.items():
        assert porter_stem_py(w) == want, (w, porter_stem_py(w), want)
        assert _ref_porter(w) == want, (w, _ref_porter(w), want)


def test_troubled_conflated_detail():
    # step-1b adjustment branches, full cascade
    assert porter_stem_py("troubled") == "troubl"  # trouble then 5a drops e
    assert porter_stem_py("conflated") == "conflat"


@pytest.fixture(scope="module")
def vocab(spark):
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
        .collect()
    )
    return sorted(r["t"] for r in rows)


def test_three_renderings_agree_on_corpus_vocab(spark, vocab):
    # Python rendering (the same ops tree executed directly)
    py = {w: porter_stem_py(w) for w in vocab}
    # reference imperative port agrees everywhere
    for w in vocab:
        assert _ref_porter(w) == py[w], (w, _ref_porter(w), py[w])
    # Column rendering
    df = spark.createDataFrame([(w,) for w in vocab], "t string")
    col_out = {
        r["t"]: r["s"][0]
        for r in df.select(
            "t", porter_tokens_col(F.array(F.col("t"))).alias("s")
        ).collect()
    }
    assert col_out == py
    # DuckDB rendering
    con = duckdb.connect()
    vals = ", ".join("('" + w.replace("'", "''") + "')" for w in vocab)
    sql_out = {
        r[0]: r[1][0]
        for r in con.execute(
            f"SELECT t, {porter_tokens_sql('[t]')} FROM (VALUES {vals}) AS x(t)"
        ).fetchall()
    }
    assert sql_out == py


def test_porter_analyzer_renderings_and_positions(spark):
    import duckdb

    from monstache_spark.functions.analyzer import ENGLISH_PORTER

    txt = "the troubled engineers are relational thinkers yearly"
    py = ENGLISH_PORTER.analyze(txt)
    assert py == ["troubl", "engin", "relat", "thinker", "yearli"]
    df = spark.createDataFrame([(txt,)], "text string")
    col = df.select(ENGLISH_PORTER.tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert col == py
    con = duckdb.connect()
    sql = con.execute(
        f"SELECT {ENGLISH_PORTER.sql_tokens('text')} FROM (VALUES ('{txt}')) v(text)"
    ).fetchone()[0]
    assert sql == py
    # positions keep pre-stop-removal increments under porter stemming
    pos = df.select(ENGLISH_PORTER.tokens_pos(F.col("text")).alias("p")).collect()[0]["p"]
    assert [(e["t"], e["p"]) for e in pos] == [
        ("troubl", 1), ("engin", 2), ("relat", 4), ("thinker", 5), ("yearli", 6)]
    sqlp = con.execute(
        f"SELECT {ENGLISH_PORTER.sql_tokens_pos('text')} FROM (VALUES ('{txt}')) v(text)"
    ).fetchone()[0]
    assert [(e["t"], e["p"]) for e in sqlp] == [(e["t"], e["p"]) for e in pos]
    # porter + suffix list is a config error
    import pytest

    from monstache_spark.functions.analyzer import Analyzer

    with pytest.raises(ValueError):
        Analyzer(porter=True, stem_suffixes=("s",)).analyze("cats")
