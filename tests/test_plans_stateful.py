"""Plan builder + stateful streaming + IVF coverage."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from monstache_spark.operators.similarity import brute_force_topk, ivf_topk
from monstache_spark.operators.udf import NamespaceFilter, NamespaceMapper
from monstache_spark.plans.builder import EnginePlan, build_outputs


def _env_df(spark):
    rows = [
        # (op, ns, id, ts_ord, value, k, version)
        ("i", "test.users", "1", 1, 10.0, 1, 100),
        ("u", "test.users", "1", 2, 150.0, 2, 200),
        ("i", "test.accounts", "2", 3, 3.0, 3, 300),   # filtered out (< 5)
        ("i", "test.accounts", "3", 4, 50.0, 4, 400),
        ("i", "skip.other", "4", 5, 1.0, 5, 500),      # excluded by regex
        ("d", "test.accounts", "9", 6, None, None, 600),  # deletes always pass filters
    ]
    df = spark.createDataFrame(
        rows, "op string, ns string, id string, ts_ord long, value double, k long, version long"
    )
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_ord") * 1000000)).withColumn(
        "source", F.lit("oplog")
    )


def test_build_outputs_end_to_end(spark):
    plan = EnginePlan(
        namespace_regex=r"^test\..+",
        dropped_databases=False,
        dropped_collections=False,
        mappers=[
            NamespaceMapper(
                namespace="test.users", columns={"value": lambda: F.col("value") * 2}
            )
        ],
        filters=[NamespaceFilter("test.accounts", lambda: F.col("value") >= 5)],
        index_overrides={"test.users": "users_v2"},
        time_machine=True,
    )
    outputs = build_outputs(_env_df(spark), plan)
    ops = outputs["ops"].collect()
    assert {r["ns"] for r in ops} == {"test.users", "test.accounts"}
    assert all(r["_index"] == "users_v2" for r in ops if r["ns"] == "test.users")
    assert ("2" not in {r["id"] for r in ops})  # account value 3 filtered
    assert ("9" in {r["id"] for r in ops})      # delete passes filters
    users = {r["id"]: r for r in outputs["state"].collect() if r["ns"] == "test.users"}
    assert users["1"]["last_value"] == 300.0  # mapper doubled the last value
    assert "time_machine" in outputs


def test_build_outputs_relate_scoped_to_source_ns(spark):
    from monstache_spark.operators.relate import Relation

    customers = spark.createDataFrame([(1, "c1"), (3, "c3")], "c_key long, c_name string")
    plan = EnginePlan(
        relations=[Relation("test.users", "dim.customers", "id", "c_key", "long")]
    )
    outputs = build_outputs(
        _env_df(spark), plan, collections={"dim.customers": customers}
    )
    hop = outputs["relate_hop1"].collect()
    # only test.users ops relate: ids 1 (twice: i+u); account id 3 must NOT
    assert sorted(r["c_name"] for r in hop) == ["c1", "c1"]


def test_build_outputs_relations_on_two_source_namespaces(spark):
    """ADVICE fix: relations whose source ns differs from the first
    entry must still fire (one chain per distinct source ns)."""
    from monstache_spark.operators.relate import Relation

    customers = spark.createDataFrame([(1, "c1"), (3, "c3")], "c_key long, c_name string")
    accounts = spark.createDataFrame([(2, "a2"), (3, "a3")], "a_key long, a_label string")
    plan = EnginePlan(
        relations=[
            Relation("test.users", "dim.customers", "id", "c_key", "long"),
            Relation("test.accounts", "dim.accounts", "id", "a_key", "long"),
        ]
    )
    outputs = build_outputs(
        _env_df(spark),
        plan,
        collections={"dim.customers": customers, "dim.accounts": accounts},
    )
    assert "relate_test.users_hop1" in outputs
    assert "relate_test.accounts_hop1" in outputs
    users_hop = outputs["relate_test.users_hop1"].collect()
    assert sorted(r["c_name"] for r in users_hop) == ["c1", "c1"]
    acct_hop = outputs["relate_test.accounts_hop1"].collect()
    # accounts ns ops relate through the second relation
    assert all(r["ns"] == "test.accounts" for r in acct_hop)
    assert len(acct_hop) > 0


def test_ivf_recall_vs_brute_force(spark):
    import random

    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    corpus = emb.filter(F.col("vec_id") < 50)
    queries = emb.filter(F.col("vec_id") >= 50)
    exact = brute_force_topk(corpus, queries, k=3)
    # probing ALL cells ⇒ IVF degenerates to exhaustive search
    approx = ivf_topk(corpus, queries, k=3, n_centroids=8, n_probe=8)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    assert e == a


def test_ivf_with_kmeans_centroids(spark):
    import random

    from monstache_spark.operators.similarity import kmeans_centroids

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    corpus = emb.filter(F.col("vec_id") < 50)
    queries = emb.filter(F.col("vec_id") >= 50)
    cen = kmeans_centroids(corpus, 6, seed=42)
    exact = brute_force_topk(corpus, queries, k=3)
    # probing all learned cells ⇒ exhaustive again
    approx = ivf_topk(corpus, queries, k=3, n_probe=6, centroids=cen)
    e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
    assert e == a
    # deterministic across runs with the same seed
    cen2 = kmeans_centroids(corpus, 6, seed=42)
    assert sorted(map(tuple, cen.collect())) == sorted(map(tuple, cen2.collect()))


def test_stateful_op_counts_totals(spark):
    from monstache_spark.streaming.stateful import run_op_counts_stream

    base = tempfile.mkdtemp(prefix="stateful_test_")
    try:
        events = spark.range(20).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            F.when(F.col("id") % 3 == 0, "signup")
            .when(F.col("id") % 3 == 1, "error")
            .otherwise("click")
            .alias("event_type"),
            F.timestamp_micros(F.col("id") * 1000).alias("ts"),
            F.lit(1.0).alias("value"),
            F.lit('{"k": 1}').alias("props"),
        )
        tmp_out = os.path.join(base, "out")
        events.coalesce(1).write.parquet(tmp_out)
        part = next(f for f in os.listdir(tmp_out) if f.endswith(".parquet"))
        path = os.path.join(base, "events.parquet")
        shutil.copyfile(os.path.join(tmp_out, part), path)
        out = run_op_counts_stream(spark, path)
        rows = out.collect()
        assert sum(r["n_total"] for r in rows) == 20
        assert sum(r["n_i"] for r in rows) == 7   # ids 0,3,6,9,12,15,18
        assert sum(r["n_d"] for r in rows) == 7   # ids 1,4,7,10,13,16,19
    finally:
        shutil.rmtree(base, ignore_errors=True)
