"""Salted join / salted aggregation equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from monstache_spark.operators.skew import salted_join, salted_sum_count


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: 900 rows of key 1, a few of others
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.createDataFrame([(1, "a"), (950, "b"), (999, "c")], "k long, rname string")
    plain = left.join(right, "k").select("k", "lval", "rname")
    salted = salted_join(left, right, "k", n_salts=4).select("k", "lval", "rname")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # deterministic salt variant
    salted2 = salted_join(left, right, "k", n_salts=4, left_salt_from="lval").select(
        "k", "lval", "rname"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted2.collect()))


def test_salted_join_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "k long, lval long")
    right = spark.createDataFrame([(1, "a")], "k long, rname string")
    out = salted_join(left, right, "k", n_salts=3, how="left").collect()
    got = {(r["k"], r["rname"]) for r in out}
    assert got == {(1, "a"), (2, None)}
    assert len(out) == 2  # unmatched row appears exactly once, not per-salt


def test_salted_sum_count_matches_plain_agg(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") * 2).cast("double").alias("v")
    )
    plain = {
        (r["g"]): (r["s"], r["c"])
        for r in df.groupBy("g").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = {
        (r["g"]): (r["sum_value"], r["n_rows"])
        for r in salted_sum_count(df, ["g"], F.col("v"), n_salts=8).collect()
    }
    assert plain == salted


def test_range_bucketed_rank_matches_global_window(spark):
    from pyspark.sql.window import Window

    from monstache_spark.operators.skew import range_bucketed_rank

    # keys with heavy ties (key = id % 7) so tie-break order and
    # bucket-boundary tie handling are both exercised
    df = spark.range(3000).select(
        F.col("id").cast("long").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("key"),
    )
    w = Window.orderBy(F.col("key").desc(), F.col("doc_id").asc())
    naive = {
        r["doc_id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w).cast("long")).collect()
    }
    fast = {
        r["doc_id"]: r["rank"]
        for r in range_bucketed_rank(df, "key", "doc_id", n_buckets=16).collect()
    }
    assert fast == naive


def test_range_bucketed_rank_plan_has_no_global_window(spark):
    from monstache_spark.operators.skew import range_bucketed_rank

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), F.rand(seed=3).alias("key")
    )
    out = range_bucketed_rank(df, "key", "doc_id", n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window must be partitioned (hash exchange on the bucket),
    # never SinglePartition
    assert "Window" in plan
    assert "SinglePartition" not in plan
