"""Property tests for the round-6 exactness contracts: the analyzer's
three renderings and the geohash encoder must agree on ARBITRARY
inputs, not just the curated samples — these are the contracts the
oracle hashes stand on."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from monstache_spark.functions.analyzer import ENGLISH, Analyzer
from monstache_spark.operators.geo import _GEOHASH32, geohash_sql


# printable-ascii words (the analyzer's whitespace-token domain)
_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                           exclude_characters="'\\\""),
    min_size=1, max_size=12,
)
_texts = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_texts)
def test_analyzer_python_equals_duckdb(text):
    con = duckdb.connect()
    for cfg in (Analyzer(), ENGLISH):
        sql = con.execute(
            "SELECT " + cfg.sql_tokens("t") + " FROM (SELECT ? AS t)", [text]
        ).fetchone()[0]
        assert sql == cfg.analyze(text)
        sqlp = con.execute(
            "SELECT " + cfg.sql_tokens_pos("t") + " FROM (SELECT ? AS t)", [text]
        ).fetchone()[0]
        assert [(e["t"], e["p"]) for e in sqlp] == cfg.analyze_pos(text)


def _geohash_ref(lat: float, lon: float, p: int) -> str:
    """Textbook bisection geohash — an independent reference
    implementation (not the bit-interleave formula under test)."""
    lat_r, lon_r = (-90.0, 90.0), (-180.0, 180.0)
    bits = []
    even = True
    while len(bits) < 5 * p:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                bits.append(1); lon_r = (mid, lon_r[1])
            else:
                bits.append(0); lon_r = (lon_r[0], mid)
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                bits.append(1); lat_r = (mid, lat_r[1])
            else:
                bits.append(0); lat_r = (lat_r[0], mid)
        even = not even
    out = ""
    for j in range(p):
        c = 0
        for i in range(5):
            c = c * 2 + bits[5 * j + i]
        out += _GEOHASH32[c]
    return out


# Coordinates on a 1e-4-degree grid (~11 m): real-world precision.
# Unconstrained floats can sit within one double-ulp of a cell
# boundary, where `floor((x+offset)/span·2^n)` (both engines,
# identically) and the bisection reference legitimately disagree —
# the offset addition absorbs a ±1e-35 perturbation. Exact
# boundaries themselves are fine (both assign the upper cell).
@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=-899_999, max_value=899_999).map(lambda i: i / 1e4),
    st.integers(min_value=-1_799_999, max_value=1_799_999).map(lambda i: i / 1e4),
    st.integers(min_value=1, max_value=8),
)
def test_geohash_sql_matches_bisection_reference(lat, lon, p):
    con = duckdb.connect()
    # literals must enter as DOUBLE: a bare decimal literal parses as
    # DECIMAL in DuckDB and its arithmetic rounds differently from
    # IEEE doubles (the production oracle reads DOUBLE columns)
    got = con.execute(
        "SELECT " + geohash_sql("lat", "lon", p)
        + f" FROM (SELECT CAST({lat!r} AS DOUBLE) AS lat,"
        + f" CAST({lon!r} AS DOUBLE) AS lon)"
    ).fetchone()[0]
    assert got == _geohash_ref(lat, lon, p)
