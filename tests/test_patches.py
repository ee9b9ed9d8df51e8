"""RFC-7386 merge patches (M9 dynamic-doc mode): diff/apply laws and
the windowed patch-history operator (addPatch monstache.go:3084-3158)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from monstache_spark.operators.patches import (
    json_merge_patches,
    rfc7386_apply,
    rfc7386_diff,
)

# JSON docs WITHOUT literal nulls: RFC 7386 cannot express "set to
# null" (null means remove), so null-valued docs don't round-trip —
# a spec limitation the diff docstring pins.
_scalars = st.one_of(
    st.integers(-1000, 1000), st.text(max_size=8), st.booleans()
)
_docs = st.recursive(
    st.dictionaries(st.text(max_size=4), _scalars, max_size=4),
    lambda inner: st.dictionaries(st.text(max_size=4), inner | _scalars, max_size=4),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(_docs, _docs)
def test_diff_apply_roundtrip(old, new):
    """apply(old, diff(old, new)) == new — the defining law of
    CreateMergePatch + MergePatch (RFC 7386 §2)."""
    assert rfc7386_apply(old, rfc7386_diff(old, new)) == new


def test_diff_spec_examples():
    """The RFC 7386 appendix-A cases that matter for CDC docs."""
    assert rfc7386_diff({"a": "b"}, {"a": "c"}) == {"a": "c"}
    assert rfc7386_diff({"a": "b"}, {"a": "b", "b": "c"}) == {"b": "c"}
    assert rfc7386_diff({"a": "b", "b": "c"}, {"b": "c"}) == {"a": None}
    # nested objects recurse; arrays replace wholesale
    assert rfc7386_diff({"a": {"b": 1, "c": 2}}, {"a": {"b": 9, "c": 2}}) == {
        "a": {"b": 9}
    }
    assert rfc7386_diff({"a": [1, 2]}, {"a": [1, 2, 3]}) == {"a": [1, 2, 3]}
    assert rfc7386_diff({"a": 1}, {"a": 1}) == {}


def test_json_merge_patches_stream(spark):
    """Doc-version stream → {ts, p, v} rows: v=1 full doc, then
    canonical minimal patches; applying the chain rebuilds the doc."""
    rows = [
        ("u1", 1, 10, '{"name":"ann","age":30}'),
        ("u1", 2, 20, '{"name":"ann","age":31,"city":"oslo"}'),
        ("u1", 3, 30, '{"name":"ann","city":"oslo"}'),
        ("u2", 1, 15, '{"name":"bob"}'),
    ]
    docs = spark.createDataFrame(rows, "id string, version long, ts_s long, doc string")
    out = json_merge_patches(
        docs, doc_col="doc", key_cols=("id",), order_cols=("version",), ts_col="ts_s"
    )
    got = {(r["id"], r["v"]): (r["ts"], r["p"]) for r in out.collect()}
    assert got[("u1", 1)] == (10, '{"age":30,"name":"ann"}')
    assert got[("u1", 2)] == (20, '{"age":31,"city":"oslo"}')
    assert got[("u1", 3)] == (30, '{"age":null}')
    assert got[("u2", 1)] == (15, '{"name":"bob"}')
    # replay: v1 seed + patches reproduce the final doc
    state = json.loads(got[("u1", 1)][1])
    for v in (2, 3):
        state = rfc7386_apply(state, json.loads(got[("u1", v)][1]))
    assert state == {"name": "ann", "city": "oslo"}
