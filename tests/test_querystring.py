"""Lucene query_string grammar (operators/querystring.py)."""

from __future__ import annotations

import pytest

from monstache_spark.operators.querystring import (
    parse_query_string,
    query_string_filter,
)


def test_parse_shapes():
    assert parse_query_string("lang:en") == {"match": {"lang": "en"}}
    assert parse_query_string('"hash join"~2') == {
        "match_phrase": {"text": {"query": "hash join", "slop": 2}}}
    assert parse_query_string("doc_id:[3 TO 7}") == {
        "range": {"doc_id": {"gte": 3, "lt": 7}}}
    assert parse_query_string("ts:[2024-01-01 TO *]") == {
        "range": {"ts": {"gte": "2024-01-01"}}}
    assert parse_query_string("_exists_:score") == {"exists": {"field": "score"}}
    assert parse_query_string("tabel~1") == {
        "fuzzy": {"text": {"value": "tabel", "fuzziness": 1}}}
    assert parse_query_string("tabel~") == {
        "fuzzy": {"text": {"value": "tabel", "fuzziness": 2}}}
    assert parse_query_string("vec*") == {"__token_wildcard__": {"text": "vec*"}}
    q = parse_query_string("a AND b OR NOT c")
    assert q == {"bool": {
        "should": [{"bool": {"must": [{"match": {"text": "a"}},
                                      {"match": {"text": "b"}}]}},
                   {"bool": {"must_not": [{"match": {"text": "c"}}]}}],
        "minimum_should_match": 1}}
    # +/- lift an OR group to must/must_not/should
    q2 = parse_query_string("+a -b c")
    assert q2 == {"bool": {"must": [{"match": {"text": "a"}}],
                           "must_not": [{"match": {"text": "b"}}],
                           "should": [{"match": {"text": "c"}}]}}
    # field group + boost discarded
    q3 = parse_query_string("lang:(en OR de)^2")
    assert q3 == {"bool": {"should": [{"match": {"lang": "en"}},
                                      {"match": {"lang": "de"}}],
                           "minimum_should_match": 1}}
    with pytest.raises(ValueError):
        parse_query_string("(a OR b")
    with pytest.raises(ValueError):
        parse_query_string("a)")


def test_query_string_filter_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "hash join fast", "en", 10.0),
         (2, "merge sort slow", "en", None),
         (3, "hash table scan", "de", 5.0),
         (4, "vector search", "en", 7.0)],
        "doc_id long, text string, lang string, score double",
    )

    def ids(q, **kw):
        return sorted(r["doc_id"] for r in query_string_filter(df, q, **kw).collect())

    assert ids("hash AND lang:en") == [1]
    assert ids('"hash join"') == [1]
    assert ids("hash OR vector") == [1, 3, 4]
    assert ids("hash -join") == [3]
    assert ids("lang:en AND _exists_:score") == [1, 4]
    assert ids("doc_id:[2 TO 3]") == [2, 3]
    assert ids("vec* OR merg?") == [2, 4]
    assert ids("NOT lang:en") == [3]
    assert ids("hash scan", default_operator="and") == [3]
    # fuzzy term through the mappings scale path
    assert ids("hsah~2", mappings={"text": {"type": "text"}}) == [1, 3]
