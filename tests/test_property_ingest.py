"""Property tests for the ingest-pipeline compiler (operators/ingest):
random processor chains over random rows, compared against a pure-
Python reference interpreter of the module's DOCUMENTED contracts —
per-row ``if`` gating (condition-false keeps the old value; NULL
condition is false), NULL-on-failure conversions, processor-order-
visible mutations, foreach element transforms, drop filtering.

One Spark action per example keeps the suite fast; the generator
stays inside the engine's documented domain (clean integral strings
or obvious garbage for convert — try_cast's edge numerals like "7.0"
are a separate documented contract, not a property)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from monstache_spark.operators.ingest import ingest_pipeline

_S_ALPHA = "ab oO é"  # case-mapped unicode included


@st.composite
def _rows(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    out = []
    for i in range(n):
        s = draw(st.one_of(st.none(), st.text(alphabet=_S_ALPHA, max_size=8)))
        nstr = draw(st.one_of(
            st.none(),
            st.from_regex(r"[0-9]{1,6}", fullmatch=True),
            st.just("x"),
            st.just(""),
        ))
        v = draw(st.one_of(st.none(), st.floats(
            min_value=-5, max_value=5, allow_nan=False, width=32)))
        out.append({"id": i, "s": s, "nstr": nstr, "v": v})
    return out


@st.composite
def _pipeline(draw):
    procs = []
    n = draw(st.integers(min_value=1, max_value=4))
    for _ in range(n):
        kind = draw(st.sampled_from(
            ["case", "gsub", "set", "convert", "splitjoin", "drop",
             "foreach"]))
        cond = draw(st.one_of(st.none(), st.just("v > 0.5")))
        if kind == "case":
            op = draw(st.sampled_from(["uppercase", "lowercase", "trim"]))
            p = {op: {"field": "s"}}
            if cond:
                p[op]["if"] = cond
        elif kind == "gsub":
            p = {"gsub": {"field": "s", "pattern": "a", "replacement": "X"}}
            if cond:
                p["gsub"]["if"] = cond
        elif kind == "set":
            p = {"set": {"field": "c", "value": "K"}}
            if cond:
                p["set"]["if"] = cond
        elif kind == "convert":
            p = {"convert": {"field": "nstr", "type": "long",
                             "target_field": "n2"}}
            if cond:
                p["convert"]["if"] = cond
        elif kind == "splitjoin":
            p = [
                {"split": {"field": "s", "separator": " ",
                           "target_field": "parts"}},
                {"join": {"field": "parts", "separator": "-",
                          "target_field": "joined"}},
            ]
            procs.extend(p)
            continue
        elif kind == "drop":
            p = {"drop": {"if": "v > 2.0"}}
        else:
            procs.extend([
                {"split": {"field": "s", "separator": " ",
                           "target_field": "parts"}},
                {"foreach": {"field": "parts",
                             "processor": {"uppercase":
                                           {"field": "_ingest._value"}}}},
                {"join": {"field": "parts", "separator": "|",
                          "target_field": "joined"}},
            ])
            continue
        procs.append(p)
    return procs


def _cond_true(row, cond):
    if cond is None:
        return True
    m = re.fullmatch(r"v > ([0-9.]+)", cond)
    v = row.get("v")
    return v is not None and v > float(m.group(1))


def _py_apply(rows, procs):
    """Reference interpreter over list-of-dict rows (the documented
    contracts; missing column == key absent until first write)."""
    rows = [dict(r) for r in rows]
    cols = {"id", "s", "nstr", "v"}
    for proc in procs:
        (ptype, o), = proc.items()
        cond = o.get("if")
        if ptype == "drop":
            rows = [r for r in rows if not _cond_true(r, o["if"])]
            continue
        for r in rows:
            if ptype in ("uppercase", "lowercase", "trim"):
                old = r.get(o["field"])
                if _cond_true(r, cond):
                    fn = {"uppercase": str.upper, "lowercase": str.lower,
                          "trim": str.strip}[ptype]
                    r[o["field"]] = None if old is None else fn(old)
                # cond false: keep old (or None if column introduced
                # for other rows — handled by dict.get on compare)
            elif ptype == "gsub":
                old = r.get(o["field"])
                if _cond_true(r, cond):
                    r[o["field"]] = (
                        None if old is None
                        else re.sub(o["pattern"], o["replacement"], old)
                    )
            elif ptype == "set":
                if _cond_true(r, cond):
                    r[o["field"]] = o["value"]
                else:
                    r.setdefault(o["field"], None)
            elif ptype == "convert":
                tgt = o.get("target_field", o["field"])
                if _cond_true(r, cond):
                    x = r.get(o["field"])
                    r[tgt] = int(x) if x is not None and x.isdigit() else None
                else:
                    # keep-old branch try_cast to the target type; a
                    # fresh target is NULL
                    old = r.get(tgt)
                    r[tgt] = old if isinstance(old, int) else None
            elif ptype == "split":
                tgt = o["target_field"]
                old = r.get(o["field"])
                if _cond_true(r, cond):
                    r[tgt] = None if old is None else re.split(
                        o["separator"], old)
                else:
                    r.setdefault(tgt, None)
            elif ptype == "join":
                tgt = o["target_field"]
                arr = r.get(o["field"])
                if _cond_true(r, cond):
                    r[tgt] = None if arr is None else o["separator"].join(arr)
                else:
                    r.setdefault(tgt, None)
            elif ptype == "foreach":
                if _cond_true(r, cond):
                    arr = r.get(o["field"])
                    r[o["field"]] = (
                        None if arr is None else [
                            None if x is None else x.upper() for x in arr]
                    )
            else:  # pragma: no cover
                raise AssertionError(ptype)
        cols |= {k for r in rows for k in r}
    # every row exposes every column (columnar frames have no ragged
    # rows)
    for r in rows:
        for c in cols:
            r.setdefault(c, None)
    return rows


@settings(max_examples=20, deadline=None)
@given(rows=_rows(), procs=_pipeline())
def test_pipeline_matches_python_reference(spark, rows, procs):
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("s", StringType()),
        StructField("nstr", StringType()),
        StructField("v", DoubleType()),
    ])
    df = spark.createDataFrame(
        [(r["id"], r["s"], r["nstr"], r["v"]) for r in rows], schema
    )
    got = [r.asDict() for r in ingest_pipeline(df, procs).collect()]
    got = sorted(got, key=lambda r: r["id"])
    exp = sorted(_py_apply(rows, procs), key=lambda r: r["id"])
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        for k, ev in e.items():
            gv = g.get(k)
            if isinstance(ev, float) and gv is not None:
                assert abs(gv - ev) < 1e-6, (k, gv, ev)
            else:
                assert gv == ev, (k, gv, ev, procs)
