"""Winnowing, embedding near-dup, BPE tokens, drops, snapshots,
streaming windows (the round-1 coverage additions)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from monstache_spark.envelope import events_to_envelope
from monstache_spark.functions.text import bpe_token_count, bpe_tokens
from monstache_spark.operators.dedup import embedding_near_dup_pairs, winnow_fingerprints
from monstache_spark.operators.filters import worker_partition
from monstache_spark.operators.materialize import apply_drops, last_state
from monstache_spark.sources.directreads import snapshot_envelope


def _winnow_python(text: str, k: int = 8, w: int = 4) -> list[int]:
    import re

    canon = re.sub(r"\s+", " ", text.strip().lower())
    n_pos = max(len(canon) - k + 1, 1)
    grams = [
        int(hashlib.md5(f"1:{canon[i:i + k]}".encode()).hexdigest()[:8], 16)
        for i in range(n_pos)
    ]
    n_win = max(len(grams) - w + 1, 1)
    mins = [min(grams[j:j + w]) for j in range(n_win)]
    return sorted(set(mins))


def _md5_hash_fn(c):
    from monstache_spark.functions.text import shingle_hash

    return shingle_hash(c, 1)


def test_winnow_matches_reference_python(spark):
    docs = spark.createDataFrame(
        [(1, "The quick  Brown fox jumps over the lazy dog"), (2, "tiny")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["fps"])
        for r in winnow_fingerprints(docs, hash_fn=_md5_hash_fn).collect()
    }
    assert got[1] == _winnow_python("The quick  Brown fox jumps over the lazy dog")
    assert got[2] == _winnow_python("tiny")


def test_winnow_shared_fingerprint_for_common_substring(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "PREFIX " + a + " SUFFIX"
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {r["doc_id"]: set(r["fps"]) for r in winnow_fingerprints(docs).collect()}
    assert got[1] & got[2]  # long shared substring must share >= 1 fingerprint


def test_embedding_near_dup_finds_planted_pair(spark):
    base = [1.0, 0.0, 0.5, 0.25]
    near = [1.0, 0.01, 0.5, 0.25]
    far = [-1.0, 0.5, -0.5, 2.0]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<float>"
    )
    pairs = embedding_near_dup_pairs(emb, dim=4, bits=2, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_bpe_tokens_shape(spark):
    df = spark.createDataFrame([("Hello, world! v2.0 costs $45",)], "text string")
    toks = df.select(bpe_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["Hello", ",", "world", "!", "v", "2", ".", "0", "costs", "$", "4", "5"]
    n = df.select(bpe_token_count(F.col("text")).alias("n")).collect()[0]["n"]
    assert n == len(toks)


def test_worker_partition_covers_everything(spark):
    df = spark.createDataFrame([(str(i),) for i in range(100)], "id string")
    shards = [worker_partition(df, w, 3).count() for w in range(3)]
    assert sum(shards) == 100
    assert all(s > 0 for s in shards)


def test_apply_drops_erases_then_revives(spark):
    rows = [
        ("i", "db.a", "1", 10),
        ("u", "db.a", "1", 20),   # erased by the drop at v=25
        ("drop", "db.a", None, 25),
        ("i", "db.a", "1", 30),   # re-created after the drop
        ("i", "db.b", "2", 15),   # other ns untouched by collection drop
        ("dropDatabase", "other", None, 100),
        ("i", "other.x", "3", 50),  # erased by the db drop
    ]
    ops = spark.createDataFrame(rows, "op string, ns string, id string, version long")
    out = apply_drops(ops).select("ns", "id", "version").collect()
    got = {(r["ns"], r["id"], r["version"]) for r in out}
    assert got == {("db.a", "1", 30), ("db.b", "2", 15)}


def test_snapshot_envelope_versions_lose_to_stream(spark):
    snap = snapshot_envelope(
        spark.createDataFrame([(7, "x")], "c_custkey long, c_name string"),
        "test.customer",
        "c_custkey",
    )
    stream = spark.createDataFrame(
        [("u", "test.customer", "7", None, 5, "oplog", 99)],
        "op string, ns string, id string, ts timestamp, ts_ord long, source string, version long",
    ).withColumn("ts", F.timestamp_micros(F.lit(1000)))
    merged = snap.unionByName(stream)
    state = last_state(merged, payload_cols=("op", "source"))
    row = state.collect()[0]
    assert row["last_source"] == "oplog" and row["version"] == 99


def test_bigram_lm_train_and_score_integer_contract(spark):
    from monstache_spark.functions.text import bigram_lm_score, train_bigram_lm

    docs = spark.createDataFrame(
        [(1, "abab"), (2, "ab"), (3, "zz"), (4, "x"), (5, "")],
        "doc_id long, text string",
    )
    model = {r["bigram"]: r["prob_micro"] for r in train_bigram_lm(docs).collect()}
    # corpus bigrams: doc1 -> ab,ba,ab ; doc2 -> ab ; doc3 -> zz  (total 5)
    assert model == {
        "ab": 3 * 1000000 // 5,
        "ba": 1 * 1000000 // 5,
        "zz": 1 * 1000000 // 5,
    }
    out = {r["doc_id"]: r for r in bigram_lm_score(
        docs, train_bigram_lm(docs)
    ).collect()}
    # doc1: (600000+200000+600000) div 3
    assert out[1]["n_bigrams"] == 3 and out[1]["avg_prob_micro"] == 1400000 // 3
    assert out[2]["avg_prob_micro"] == 600000
    assert out[3]["avg_prob_micro"] == 200000
    # sub-2-char docs: zero bigrams, zero score, still present
    assert out[4]["n_bigrams"] == 0 and out[4]["avg_prob_micro"] == 0
    assert out[5]["n_bigrams"] == 0


def test_bigram_lm_scored_matches_unfused(spark):
    """The fused single-gram-pass train+score (r14 optimization) must
    be row-identical to the train_bigram_lm + bigram_lm_score
    composition — including unseen-bigram zeros and sub-2-char docs."""
    from monstache_spark.functions.text import (
        bigram_lm_score,
        bigram_lm_scored,
        train_bigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "abab"), (2, "ab"), (3, "zz"), (4, "x"), (5, ""),
         (6, "the  quick  Brown fox"), (7, "the quick brown fox")],
        "doc_id long, text string",
    )
    unfused = sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_prob_micro"])
        for r in bigram_lm_score(docs, train_bigram_lm(docs)).collect()
    )
    fused = sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_prob_micro"])
        for r in bigram_lm_scored(docs).collect()
    )
    assert fused == unfused
    # scoring a foreign doc: unseen bigrams count zero
    foreign = spark.createDataFrame([(9, "qq")], "doc_id long, text string")
    f = bigram_lm_score(foreign, train_bigram_lm(docs)).collect()[0]
    assert f["avg_prob_micro"] == 0 and f["n_bigrams"] == 1
