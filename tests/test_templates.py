"""Search templates (operators/templates.py): mustache subset
rendering, defaults, toJson arrays, registry round trip."""

from __future__ import annotations

import pytest

from monstache_spark.operators.templates import TemplateRegistry, render_template


def test_render_scalars_numbers_and_strings():
    q = render_template(
        '{"bool": {"must": [{"term": {"lang": "{{lang}}"}}, '
        '{"range": {"doc_id": {"lt": {{cutoff}}}}}]}}',
        {"lang": "en", "cutoff": 5},
    )
    assert q == {"bool": {"must": [{"term": {"lang": "en"}},
                                   {"range": {"doc_id": {"lt": 5}}}]}}


def test_render_tojson_array_and_default():
    q = render_template(
        '{"bool": {"must": [{"terms": {"id": {{#toJson}}ids{{/toJson}}}}],'
        ' "minimum_should_match": {{msm}}{{^msm}}0{{/msm}}}}',
        {"ids": [1, 2, 3]},
    )
    assert q["bool"]["must"][0]["terms"]["id"] == [1, 2, 3]
    assert q["bool"]["minimum_should_match"] == 0
    q2 = render_template('{"term": {"k": {{v}}{{^v}}9{{/v}}}}', {"v": 4})
    assert q2 == {"term": {"k": 4}}


def test_render_errors():
    with pytest.raises(KeyError):
        render_template('{"terms": {"x": {{#toJson}}xs{{/toJson}}}}', {})
    with pytest.raises(ValueError):
        render_template('{"term": {"x": {{v}}}}', {})  # empty slot


def test_registry_search_round_trip(spark):
    reg = TemplateRegistry()
    reg.put("by_lang", '{"bool": {"must": [{"term": {"lang": "{{lang}}"}}],'
                       ' "must_not": [{"match": {"text": "{{bad}}{{^bad}}zzz{{/bad}}"}}]}}')
    df = spark.createDataFrame(
        [(1, "good text", "en"), (2, "bad batch", "en"), (3, "x", "de")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"] for r in reg.search(df, "by_lang",
                                           {"lang": "en", "bad": "batch"}).collect()}
    assert got == {1}
    # default kicks in when the param is absent
    got2 = {r["doc_id"] for r in reg.search(df, "by_lang", {"lang": "en"}).collect()}
    assert got2 == {1, 2}
    with pytest.raises(KeyError):
        reg.search(df, "nope", {})
