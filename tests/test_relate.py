"""Relate join semantics (FIXTURES.md F4; reference
monstache.go:1221-1358)."""

from __future__ import annotations

from pyspark.sql import functions as F

from monstache_spark.operators.relate import (
    Relation,
    delete_via_sink_lookup,
    identity_delete_propagation,
    relate_chain,
    relate_once,
)


def _frames(spark):
    a = spark.createDataFrame([("a1", "b1"), ("a2", "b2"), ("a3", "bX")], "a_id string, b_ref string")
    b = spark.createDataFrame([("b1", 10), ("b2", 20), ("b2", 21)], "b_id string, payload int")
    c = spark.createDataFrame([(10, "c-ten"), (20, "c-twenty")], "c_key int, c_val string")
    return {"db.a": a, "db.b": b, "db.c": c}


def test_fk_basic_fanout(spark):
    """Every matching target doc re-emits (duplicate matches fan out)."""
    f = _frames(spark)
    rel = Relation("db.a", "db.b", "b_ref", "b_id")
    out = relate_once(f["db.a"], f["db.b"], rel).collect()
    assert len(out) == 3  # a1->b1, a2->{b2,b2'}, a3 no match
    assert {r["payload"] for r in out} == {10, 20, 21}


def test_fk_type_coercion(spark):
    """string source key matched against long target key (fk-typed)."""
    a = spark.createDataFrame([("7",), ("8",)], "ref string")
    b = spark.createDataFrame([(7, "seven")], "key long, v string")
    rel = Relation("db.a", "db.b", "ref", "key", match_field_type="long")
    out = relate_once(a, b, rel).collect()
    assert len(out) == 1 and out[0]["v"] == "seven"


def test_two_hop_chain_and_max_depth(spark):
    f = _frames(spark)
    rels = [
        Relation("db.a", "db.b", "b_ref", "b_id"),
        Relation("db.b", "db.c", "payload", "c_key"),
    ]
    hops = relate_chain(f, f["db.a"], rels, max_depth=2)
    assert len(hops) == 2
    hop2 = hops[1].collect()
    assert {r["c_val"] for r in hop2} == {"c-ten", "c-twenty"}

    hops1 = relate_chain(f, f["db.a"], rels, max_depth=1)
    assert len(hops1) == 1  # second hop suppressed (fk-depth fixture)


def test_identity_delete_propagation(spark):
    dels = spark.createDataFrame([("db.a", "k1", 12)], "ns string, id string, version long")
    rel = Relation("db.a", "db.b", "_id", "_id")
    out = identity_delete_propagation(dels, rel).collect()
    assert out[0]["ns"] == "db.b" and out[0]["id"] == "k1"


def test_delete_via_sink_lookup(spark):
    """J3: recover deleted doc's fields from the sink state table."""
    dels = spark.createDataFrame([("db.a", "k1", 99)], "ns string, id string, version long")
    state = spark.createDataFrame(
        [("db.a", "k1", 5, 42.0), ("db.a", "k2", 6, 43.0)],
        "ns string, id string, version long, last_value double",
    )
    rel = Relation("db.a", "db.b", "fk", "id")
    out = delete_via_sink_lookup(dels, state, rel).collect()
    assert len(out) == 1 and out[0]["last_value"] == 42.0
