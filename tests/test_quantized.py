"""Quantized-vector operators (operators/similarity.py): bit packing
(sign masks), hamming kNN, int8 scalar quantization, integer-dot kNN."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monstache_spark.operators.similarity import (
    binary_quantize,
    hamming_topk,
    int8_quantize,
    int8_topk,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_binary_quantize_sign_mask(spark):
    dim = 64
    # vector A: bits 0 and 2 set; vector B: bit 63 only (the sign bit);
    # vector C: all positive -> all 64 bits -> code == -1 (all ones)
    a = [1.0, 0.0, 3.0] + [0.0] * (dim - 3)
    b = [0.0] * 63 + [0.5]
    c = [0.1] * dim
    out = {
        r["vec_id"]: (r["code"], r["n_bits"])
        for r in binary_quantize(_emb(spark, [(1, a), (2, b), (3, c)])).collect()
    }
    assert out[1] == (0b101, 2)
    assert out[2] == (-(1 << 63), 1)
    assert out[3] == (-1, 64)


def test_hamming_topk_orders_by_distance_then_id(spark):
    dim = 64
    q = [1.0] * 4 + [0.0] * (dim - 4)          # bits 0-3
    near = [1.0] * 3 + [0.0] * (dim - 3)       # bits 0-2 -> hamming 1
    far = [0.0] * 60 + [1.0] * 4               # bits 60-63 -> hamming 8
    same = [2.0] * 4 + [-1.0] * (dim - 4)      # bits 0-3 -> hamming 0
    out = hamming_topk(
        _emb(spark, [(0, q), (1, near), (2, far), (3, same)]),
        query_vec_id=0,
        k=3,
    ).collect()
    assert [(r["vec_id"], r["hamming"], r["rank"]) for r in out] == [
        (3, 0, 1),
        (1, 1, 2),
        (2, 8, 3),
    ]


def test_int8_quantize_boundaries(spark):
    dim = 4
    rows = [
        (1, [0.0, 10.0, -5.0, 7.0]),
        (2, [1.0, 20.0, -5.0, 7.0]),
        (3, [2.0, 15.0, -5.0, 7.0]),
    ]
    out = {
        r["vec_id"]: r["codes"]
        for r in int8_quantize(_emb(spark, rows), dim=dim).collect()
    }
    # dim0: min 0 max 2 -> codes 0 / 127 / 255 (mid floors to 127)
    assert [out[1][0], out[2][0], out[3][0]] == [0, 127, 255]
    # dim1: min 10 max 20 -> 0 / 255 / 127
    assert [out[1][1], out[2][1], out[3][1]] == [0, 255, 127]
    # constant dims code to 0
    assert {out[i][2] for i in (1, 2, 3)} == {0}
    assert {out[i][3] for i in (1, 2, 3)} == {0}


def test_int8_topk_integer_dot(spark):
    dim = 4
    rows = [
        (0, [0.0, 0.0, 0.0, 2.0]),
        (1, [0.0, 0.0, 0.0, 2.0]),   # identical to query -> max dot
        (2, [2.0, 2.0, 2.0, 0.0]),   # orthogonal-ish
    ]
    out = int8_topk(_emb(spark, rows), query_vec_id=0, dim=dim, k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["dot"] > out[1]["dot"]
    assert all(isinstance(r["dot"], int) for r in out)


def test_binary_quantize_rejects_nothing_but_handles_zero(spark):
    dim = 64
    z = [0.0] * dim  # no strictly-positive dims -> empty mask
    out = binary_quantize(_emb(spark, [(9, z)])).collect()[0]
    assert out["code"] == 0 and out["n_bits"] == 0


def test_hamming_rerank_recovers_exact_winner(spark):
    """A vector with the same sign pattern as the query but a better
    cosine must win the re-rank even if another candidate ties it on
    hamming."""
    from monstache_spark.operators.similarity import hamming_rerank_topk

    dim = 64
    q = [1.0] * 8 + [0.0] * (dim - 8)
    aligned = [1.0] * 8 + [0.0] * (dim - 8)     # cosine 1.0
    skewed = [9.0] + [0.1] * 7 + [0.0] * (dim - 8)  # same bits, lower cosine
    out = hamming_rerank_topk(
        spark.createDataFrame(
            [(0, q), (1, skewed), (2, aligned)],
            "vec_id long, embedding array<double>",
        ),
        query_vec_id=0,
        k=2,
        shortlist=2,
    ).collect()
    assert [r["vec_id"] for r in out] == [2, 1]
    assert out[0]["score"] == 1.0 and out[0]["hamming"] == 0


def test_binary_quantize_rejects_over_64_dims(spark):
    """ADVICE r9: a >64-dim vector must raise, not silently emit NULL
    codes (zip_with pads with NULL powers and poisons the OR-fold)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    out = binary_quantize(_emb(spark, [(1, [1.0] * 70)]))
    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as ei:
        out.collect()
    assert "at most 64" in str(ei.value)


def test_binary_quantize_null_vector_passthrough(spark):
    """The dim guard must not turn a NULL vector into an error — NULL
    in, NULL code out (pre-guard semantics preserved)."""
    rows = binary_quantize(_emb(spark, [(1, None), (2, [1.0, -1.0])])).collect()
    got = {r["vec_id"]: r["code"] for r in rows}
    assert got[1] is None
    assert got[2] == 0b1


def test_query_sign_mask_matches_spark_sign_mask(spark):
    """Python query_sign_mask must equal the Spark _sign_mask packing,
    including the signed bit 63."""
    from monstache_spark.operators.similarity import (
        query_sign_mask,
    )

    vecs = [
        [1.0, 0.0, 3.0] + [0.0] * 61,
        [0.0] * 63 + [0.5],
        [0.1] * 64,
        [-1.0] * 64,
    ]
    rows = binary_quantize(
        _emb(spark, [(i, v) for i, v in enumerate(vecs)])
    ).collect()
    got = {r["vec_id"]: r["code"] for r in rows}
    for i, v in enumerate(vecs):
        assert got[i] == query_sign_mask(v), i
    with pytest.raises(ValueError, match="64"):
        query_sign_mask([1.0] * 70)


def test_maxsim_inv_hamming_topk(spark):
    """maxSimInvHamming: per-(doc,vector) inverse-hamming (64-h)/64,
    max per query vector, summed; multi-vector docs take their best
    vector per query; ties break on id."""
    from monstache_spark.operators.similarity import (
        maxsim_inv_hamming_topk,
        query_sign_mask,
    )

    q1 = [1.0] * 8 + [0.0] * 56          # mask = 0xFF
    # doc 1: one vector identical to q1 (h=0 -> 1.0), one garbage
    # doc 2: vector with 4 of q1's bits (h=4 -> 60/64)
    d1a = [1.0] * 8 + [0.0] * 56
    d1b = [0.0] * 32 + [1.0] * 32
    d2 = [1.0] * 4 + [0.0] * 60
    dv = spark.createDataFrame(
        [(1, d1a), (1, d1b), (2, d2)], "doc_id long, embedding array<double>"
    )
    out = maxsim_inv_hamming_topk(dv, [q1], k=5).collect()
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in out}
    assert got[1] == (1.0, 1)
    assert got[2] == ((64 - 4) / 64.0, 2)

    # two query vectors sum their per-doc maxes
    q2 = [0.0] * 32 + [1.0] * 32
    out2 = maxsim_inv_hamming_topk(dv, [q1, q2], k=5).collect()
    got2 = {r["doc_id"]: r["score"] for r in out2}
    assert got2[1] == 2.0  # d1a matches q1 exactly, d1b matches q2 exactly

    with pytest.raises(ValueError, match="non-empty"):
        maxsim_inv_hamming_topk(dv, [], k=5)


def test_knn_search_min_similarity(spark):
    """ES knn `similarity` threshold: cosine keeps raw >= t (score
    >= (1+t)/2) and may under-fill k; l2_norm treats t as a maximum
    distance (score >= 1/(1+t^2))."""
    from monstache_spark.operators.similarity import knn_search

    emb = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
    )
    out = knn_search(
        emb, [1.0, 0.0], k=10, min_similarity=0.5,
        vec_col="embedding", id_col="vec_id",
    ).collect()
    # cosines: 1 -> 1.0, 2 -> .7071, 3 -> -1; threshold .5 keeps 1, 2
    assert [r["vec_id"] for r in out] == [1, 2]

    l2 = knn_search(
        emb, [1.0, 0.0], k=10, similarity="l2_norm", min_similarity=1.5,
        vec_col="embedding", id_col="vec_id",
    ).collect()
    # distances: 1 -> 0, 2 -> 1, 3 -> 2; max distance 1.5 keeps 1, 2
    assert [r["vec_id"] for r in l2] == [1, 2]


def test_maxsim_inv_hamming_num_bits(spark):
    """Self-review r10 #4: sub-64-dim vectors score over THEIR bit
    width — a full mismatch is 0.0, not (64-dim)/64."""
    from monstache_spark.operators.similarity import (
        maxsim_inv_hamming_topk,
    )

    q = [1.0] * 16 + [0.0] * 16          # 32-dim
    d_match = [1.0] * 16 + [0.0] * 16    # h = 0 -> 1.0
    d_anti = [0.0] * 16 + [1.0] * 16     # h = 32 -> 0.0
    dv = spark.createDataFrame(
        [(1, d_match), (2, d_anti)], "doc_id long, embedding array<double>"
    )
    out = maxsim_inv_hamming_topk(dv, [q], k=5, num_bits=32).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    assert got[1] == 1.0
    assert got[2] == 0.0
    with pytest.raises(ValueError, match="num_bits dims"):
        maxsim_inv_hamming_topk(dv, [[1.0] * 64], k=5, num_bits=32)
    with pytest.raises(ValueError, match="1..64"):
        maxsim_inv_hamming_topk(dv, [q], k=5, num_bits=65)
