"""Similarity search: brute-force exact vs numpy; LSH recall sanity."""

from __future__ import annotations

import math

from monstache_spark.operators.similarity import brute_force_topk, lsh_topk

VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 0.95, 0.05]),
    (4, [0.5, 0.5, 0.0]),
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_brute_force_matches_python(spark):
    emb = _emb(spark)
    out = brute_force_topk(emb, emb.filter("vec_id = 0"), k=2).collect()
    got = [(r["corpus_id"], r["score"]) for r in sorted(out, key=lambda r: r["rank"])]
    scores = {i: _cos(VECS[0][1], v) for i, v in VECS if i != 0}
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (gi, gs), (ei, es) in zip(got, expected):
        assert abs(gs - es) < 1e-5


def test_lsh_bucket_join_subset_of_brute_force(spark):
    """LSH results are a subset of exact results' candidate space and
    scores agree where both return a pair."""
    emb = _emb(spark)
    exact = {
        (r["query_id"], r["corpus_id"]): r["score"]
        for r in brute_force_topk(emb, emb, k=4).collect()
    }
    approx = lsh_topk(emb, emb, dim=3, k=4, bits=2).collect()
    for r in approx:
        key = (r["query_id"], r["corpus_id"])
        assert key in exact
        assert abs(exact[key] - r["score"]) < 1e-9


def test_lsh_multiprobe_superset_and_recall(spark):
    """Hamming-1 multi-probe: probes own + bits flipped buckets, so the
    candidate pool is a superset of single-probe and recall vs exact
    can only improve; no pair is double-counted."""
    import random

    from monstache_spark.operators.similarity import brute_force_topk, lsh_topk

    rng = random.Random(7)
    dim = 8
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 10")

    def pairs(df):
        return {(r["query_id"], r["corpus_id"]) for r in df.collect()}

    single = pairs(lsh_topk(emb, queries, dim=dim, k=5, bits=4))
    multi_df = lsh_topk(emb, queries, dim=dim, k=5, bits=4, hamming=1)
    multi = pairs(multi_df)
    exact = pairs(brute_force_topk(emb, queries, k=5))
    # no duplicate (query, corpus) rows from overlapping probes
    assert multi_df.count() == len(multi)
    assert len(multi & exact) >= len(single & exact)
    assert len(multi) >= len(single)


def test_lsh_hamming2_and_multitable_recall_monotone(spark):
    """H2 probing and OR-amplified tables each widen the candidate
    pool monotonically; candidates stay deduped on (query, corpus)."""
    import random

    from monstache_spark.operators.similarity import brute_force_topk, lsh_topk

    rng = random.Random(21)
    dim = 8
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 10")

    def pairs(df):
        return {(r["query_id"], r["corpus_id"]) for r in df.collect()}

    exact = pairs(brute_force_topk(emb, queries, k=5))
    h1 = pairs(lsh_topk(emb, queries, dim=dim, k=5, bits=4, hamming=1))
    h2_df = lsh_topk(emb, queries, dim=dim, k=5, bits=4, hamming=2)
    h2 = pairs(h2_df)
    assert len(h2 & exact) >= len(h1 & exact)

    t1 = pairs(lsh_topk(emb, queries, dim=dim, k=5, bits=4))
    t4_df = lsh_topk(emb, queries, dim=dim, k=5, bits=4, n_tables=4)
    t4 = pairs(t4_df)
    # dedup across tables holds: row count == distinct pair count
    assert t4_df.count() == len(t4)
    assert len(t4 & exact) >= len(t1 & exact)
    # single-table path is byte-identical to the pre-multitable layout
    assert t1 == pairs(lsh_topk(emb, queries, dim=dim, k=5, bits=4, n_tables=1))


def test_pq_encode_codebook_vectors_self_code(spark):
    from monstache_spark.operators.similarity import pq_codebooks, pq_encode

    # 4 vectors, dim=4, m=2 subspaces of 2; codebooks from vec_id < 2
    rows = [
        (0, [0.0, 0.0, 1.0, 1.0]),
        (1, [5.0, 5.0, -3.0, -3.0]),
        (2, [0.1, 0.1, 1.1, 0.9]),   # nearest codeword 0 in both subspaces
        (3, [4.0, 6.0, -2.0, -4.0]), # nearest codeword 1 in both subspaces
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_codebooks(emb, dim=4, m=2, k_sub=2)
    assert cb.count() == 4  # 2 subspaces x 2 codewords
    codes = {(r["vec_id"], r["m"]): r["code"] for r in pq_encode(emb, cb, dim=4, m=2).collect()}
    # codebook vectors encode to themselves (distance 0)
    assert codes[(0, 0)] == 0 and codes[(0, 1)] == 0
    assert codes[(1, 0)] == 1 and codes[(1, 1)] == 1
    # the others snap to their nearest codeword per subspace
    assert codes[(2, 0)] == 0 and codes[(2, 1)] == 0
    assert codes[(3, 0)] == 1 and codes[(3, 1)] == 1


def test_pq_adc_ranks_exact_duplicate_first(spark):
    import random

    from monstache_spark.operators.similarity import pq_adc_topk

    rng = random.Random(7)
    dim = 8
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(50)]
    rows.append((100, list(rows[20][1])))  # exact duplicate of vec 20
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id = 100")
    out = pq_adc_topk(emb, queries, dim=dim, k=3, m=4, k_sub=8).collect()
    top = next(r for r in out if r["rank"] == 1)
    # the duplicate shares every code, so its ADC distance is the
    # query's own quantization residual — the minimum any corpus
    # vector can achieve — and it ranks first (id tie-break)
    assert top["corpus_id"] == 20
    assert all(r["dist_micro"] >= top["dist_micro"] >= 0 for r in out)


def test_ivfpq_full_probe_wide_rerank_equals_brute_force(spark):
    import random

    from monstache_spark.operators.similarity import brute_force_topk, ivfpq_adc_topk

    rng = random.Random(3)
    dim = 8
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 8")
    # probe EVERY cell and re-rank a pool wider than the corpus: the
    # approximation disappears and the refine stage must reproduce the
    # exact cosine top-k, ranks included
    approx = ivfpq_adc_topk(
        emb, queries, dim=dim, k=5, n_centroids=4, n_probe=4, m=4, k_sub=8, rerank=100
    )
    exact = brute_force_topk(emb, queries, k=5)
    a = {(r["query_id"], r["corpus_id"], r["rank"]) for r in approx.collect()}
    b = {(r["query_id"], r["corpus_id"], r["rank"]) for r in exact.collect()}
    assert a == b


def test_ivf_partitioned_index_prunes_at_scan(spark, tmp_path):
    """The written IVF index must let a probe list prune PARTITIONS at
    the parquet scan — the physical claim behind n_probe cost — and
    probed-cell reads must reproduce the in-memory cell assignment."""
    import random

    from monstache_spark.operators.similarity import (
        ivf_assign,
        read_ivf_cells,
        write_ivf_index,
    )

    rng = random.Random(5)
    dim = 8
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, n_centroids=4)

    probed = read_ivf_cells(spark, path, [0, 2])
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the IN filter must land INSIDE PartitionFilters (not data filters):
    # plans always print a PartitionFilters list, empty when not pruning
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1) and "IN (0,2)" in m.group(1)

    mem = ivf_assign(emb, emb.filter("vec_id < 4")).select("vec_id", "cid")
    expect = {r["vec_id"] for r in mem.collect() if r["cid"] in (0, 2)}
    got = {r["vec_id"] for r in probed.collect()}
    assert got == expect and len(got) > 0
    # and the complement cells stay unread: union of both reads == corpus
    rest = {r["vec_id"] for r in read_ivf_cells(spark, path, [1, 3]).collect()}
    assert got | rest == {r[0] for r in rows} and got.isdisjoint(rest)


def test_ivfpq_indexed_matches_in_query_build_and_prunes(spark, tmp_path):
    """Querying the materialized IVF-PQ index must reproduce the
    in-query index build exactly (same deterministic centroids and
    codebooks), and the cells scan must prune to the probed cells."""
    import random
    import re

    from monstache_spark.operators.similarity import (
        ivfpq_adc_topk,
        ivfpq_topk_indexed,
        write_ivfpq_index,
    )

    rng = random.Random(11)
    dim = 8
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id >= 20 and vec_id < 24")
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(emb, path, dim=dim, n_centroids=8, m=4, k_sub=8)

    indexed = ivfpq_topk_indexed(
        spark, path, queries, dim=dim, k=5, n_probe=2, m=4, rerank=10
    )
    inquery = ivfpq_adc_topk(
        emb, queries, dim=dim, k=5, n_centroids=8, n_probe=2, m=4, k_sub=8, rerank=10
    )
    a = {(r["query_id"], r["corpus_id"], r["rank"], r["score"]) for r in indexed.collect()}
    b = {(r["query_id"], r["corpus_id"], r["rank"], r["score"]) for r in inquery.collect()}
    assert a == b and len(a) > 0

    # with 2 probes of 8 cells the probe union is a strict subset →
    # the executed cells scans must carry a non-empty cell INSET
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    filt = [g for g in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if "cell" in g]
    assert filt, "cells scan lost its partition filter"
    insets = [g for g in filt if "INSET" in g or "IN (" in g]
    assert insets, f"no INSET on cells scan: {filt}"


def test_semantic_dedup_keeps_lowest_id_per_group(spark):
    """Within a cell, any vector with a smaller-id near-dup (cosine >=
    tau) is dropped; group keepers and singletons survive."""
    from monstache_spark.operators.similarity import semantic_dedup

    emb = _emb(spark)
    # centroids = vec_id < 2: cell0 = {0}, cell1 = {1,2,3,4} (each
    # vector joins its nearest centroid by cosine; 1 IS centroid 1)
    out = semantic_dedup(emb, tau=0.9, n_centroids=2)
    rows = {r["vec_id"]: (r["cell"], r["cell_size"]) for r in out.collect()}
    # in cell1 only (2,3) clear tau (cos≈0.9986) → 3 dropped, 2 kept
    assert set(rows) == {0, 1, 2, 4}
    # 1 survives despite cos(0,1)≈0.994: pairing is cell-scoped and 0
    # sits alone in cell0 (the SemDeDup approximation, by design)
    assert rows[0] == (0, 1)
    assert rows[1][1] == 4 and rows[2][1] == 4 and rows[4][1] == 4


def test_semantic_dedup_max_cell_suppression_keeps_members(spark):
    """A cell over max_cell is suppressed from pairing — all its
    members survive (observable via cell_size), never silently pruned."""
    from monstache_spark.operators.similarity import semantic_dedup

    emb = _emb(spark)
    out = semantic_dedup(emb, tau=0.9, n_centroids=2, max_cell=1)
    assert out.count() == 5


def test_knn_join_multi_table_dedups_and_ranks(spark):
    from monstache_spark.operators.similarity import knn_join

    emb = spark.createDataFrame(
        [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.5]) for i in range(9)],
        "vec_id long, embedding array<float>",
    )
    out = knn_join(emb, k=3, dim=4, bits=4, n_tables=3)
    rows = out.collect()
    # every (id_q, id_n) appears once despite 3 tables
    pairs = [(r["id_q"], r["id_n"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    # ranks are 1..k' consecutive per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r["id_q"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # identical-direction vectors (same i%3 class) score 1.0 at rank 1
    top = {r["id_q"]: r for r in rows if r["rank"] == 1}
    assert all(v["score"] == 1.0 for v in top.values())


def test_knn_join_ivf_full_probe_is_exact(spark):
    import random

    from monstache_spark.operators.similarity import brute_force_topk, knn_join_ivf

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # probing EVERY cell makes IVF exhaustive -> must equal brute force
    got = {
        (r["id_q"], r["rank"]): r["id_n"]
        for r in knn_join_ivf(emb, k=3, n_centroids=4, n_probe=4).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["corpus_id"]
        for r in brute_force_topk(emb, emb, k=3).collect()
    }
    assert got == want


def test_knn_join_ivf_partial_probe_recall(spark):
    import random

    from monstache_spark.operators.similarity import brute_force_topk, knn_join_ivf

    random.seed(11)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    approx = knn_join_ivf(emb, k=3, n_centroids=6, n_probe=2).collect()
    exact = brute_force_topk(emb, emb, k=3).collect()
    got = {(r["id_q"], r["id_n"]) for r in approx}
    want = {(r["query_id"], r["corpus_id"]) for r in exact}
    recall = len(got & want) / len(want)
    assert recall >= 0.5          # partial probe keeps useful recall
    # every query still gets k answers (cells are non-empty)
    from collections import Counter
    per_q = Counter(r["id_q"] for r in approx)
    assert all(v == 3 for v in per_q.values())


def test_knn_join_ivf_max_cell_drops_fat_cells(spark):
    from monstache_spark.operators.similarity import knn_join_ivf

    # 10 identical vectors land in one cell; cap 5 drops that cell
    rows = [(i, [1.0, 0.0]) for i in range(10)] + [(10 + i, [0.0, 1.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_join_ivf(emb, k=2, n_centroids=2, n_probe=1, max_cell=5).collect()
    # neighbors only come from the small surviving cell
    assert all(r["id_n"] >= 10 for r in out)


def test_knn_join_ivf_two_level_exhaustive_single_coarse(spark):
    import random

    from monstache_spark.operators.similarity import brute_force_topk, knn_join_ivf

    random.seed(3)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # one coarse cell + probing every fine cell => exhaustive => exact
    got = {
        (r["id_q"], r["rank"]): r["id_n"]
        for r in knn_join_ivf(
            emb, k=3, n_centroids=1, n_fine=5, n_probe=5
        ).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["corpus_id"]
        for r in brute_force_topk(emb, emb, k=3).collect()
    }
    assert got == want


def test_knn_join_ivf_two_level_recall(spark):
    import random

    from monstache_spark.operators.similarity import brute_force_topk, knn_join_ivf

    random.seed(19)
    rows = [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    approx = knn_join_ivf(emb, k=3, n_centroids=3, n_fine=4, n_probe=2).collect()
    exact = brute_force_topk(emb, emb, k=3).collect()
    got = {(r["id_q"], r["id_n"]) for r in approx}
    want = {(r["query_id"], r["corpus_id"]) for r in exact}
    assert len(got & want) / len(want) >= 0.35  # bounded probe, useful recall


def test_knn_join_pq_recall_and_contract(spark):
    import random

    from monstache_spark.operators.similarity import brute_force_topk, knn_join_pq

    random.seed(23)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    approx = knn_join_pq(
        emb, dim=16, k=3, n_centroids=2, n_fine=4, n_probe=4,
        m=4, k_sub=8, rerank=20,
    ).collect()
    exact = brute_force_topk(emb, emb, k=3).collect()
    got = {(r["id_q"], r["id_n"]) for r in approx}
    want = {(r["query_id"], r["corpus_id"]) for r in exact}
    recall = len(got & want) / len(want)
    assert recall >= 0.5
    # rerank scores are EXACT cosine: every returned pair's score
    # matches the brute-force score for that pair
    exact_scores = {
        (r["query_id"], r["corpus_id"]): r["score"] for r in exact
    }
    for r in approx:
        key = (r["id_q"], r["id_n"])
        if key in exact_scores:
            assert r["score"] == exact_scores[key]
    assert all(1 <= r["rank"] <= 3 for r in approx)


def test_knn_join_pq_code_subsplit_keeps_close_pairs(spark):
    import random

    from monstache_spark.operators.similarity import brute_force_topk, knn_join_pq

    random.seed(29)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    approx = knn_join_pq(
        emb, dim=16, k=3, n_centroids=2, n_fine=4, n_probe=4,
        m=4, k_sub=8, rerank=20, sub_codes=1, code_probes=8,
    ).collect()
    # probing ALL codewords of the split code == no sub-split at all
    full = knn_join_pq(
        emb, dim=16, k=3, n_centroids=2, n_fine=4, n_probe=4,
        m=4, k_sub=8, rerank=20,
    ).collect()
    assert {(r["id_q"], r["id_n"], r["rank"]) for r in approx} == {
        (r["id_q"], r["id_n"], r["rank"]) for r in full
    }
    # a narrow probe still finds the exact clones
    emb2 = spark.createDataFrame(
        [(i, [float(i % 4), 1.0, 0.0, 0.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = knn_join_pq(
        emb2, dim=4, k=2, n_centroids=2, n_fine=2, n_probe=2,
        m=2, k_sub=4, rerank=10, sub_codes=1, code_probes=1,
    ).collect()
    exact = brute_force_topk(emb2, emb2, k=2).collect()
    got = {(r["id_q"], r["id_n"]) for r in out}
    want = {(r["query_id"], r["corpus_id"]) for r in exact}
    assert len(got & want) / len(want) >= 0.9


def test_knn_search_prefilter_and_similarities(spark):
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from monstache_spark.operators.similarity import knn_search

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [0.8, 0.6], "b"),
         (3, [0.0, 1.0], "a"), (4, [-1.0, 0.0], "b"), (5, None, "a")],
        "vec_id long, embedding array<double>, tag string",
    )
    out = knn_search(df, [1.0, 0.0], k=2)
    got = [(r["vec_id"], r["score"], r["rank"]) for r in out.collect()]
    # cosine scores: v1 = 1 -> (1+1)/2 = 1.0; v2 = 0.8 -> 0.9
    assert got == [(1, 1.0, 1), (2, 0.9, 2)]

    # PRE-filter semantics: k results come from the filtered set, not
    # a post-filtered top-k (a post-filter of top-2 would return only v2)
    out = knn_search(df, [1.0, 0.0], k=2, filter={"term": {"tag": "b"}})
    assert [(r["vec_id"], r["score"]) for r in out.collect()] == [
        (2, 0.9), (4, 0.0)]

    # dot_product and l2_norm contracts
    out = knn_search(df, [1.0, 0.0], k=1, similarity="dot_product")
    assert [(r["vec_id"], r["score"]) for r in out.collect()] == [(1, 1.0)]
    out = knn_search(df, [0.0, 1.0], k=1, similarity="l2_norm")
    assert [(r["vec_id"], r["score"]) for r in out.collect()] == [(3, 1.0)]

    with pytest.raises(ValueError, match="similarity"):
        knn_search(df, [1.0, 0.0], similarity="hamming")


def test_script_query_leaf(spark):
    from monstache_spark.operators.search import bool_query_filter

    df = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (3, 40.0)], "id long, v double")
    got = sorted(r["id"] for r in bool_query_filter(
        df, {"bool": {"must": [
            {"script": {"script": {"source": "v * 2 > 30"}}},
            {"range": {"id": {"lte": 2}}},
        ]}}).collect())
    assert got == [2]


def test_maxsim_topk_late_interaction(spark):
    from monstache_spark.operators.similarity import maxsim_topk

    # doc 1: two vectors; doc 2: one. q1 matches doc1's second vector
    # best, q2 matches doc2's vector best.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (1, [0.0, 2.0, 0.0]),
        (2, [0.0, 0.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    out = {r["doc_id"]: r for r in maxsim_topk(
        df, [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], k=5).collect()}
    # doc1: max dot q1 = 2 (2nd vec), max dot q2 = 0 -> 2.0
    # doc2: max dot q1 = 0, max dot q2 = 3 -> 3.0
    assert out[1]["score"] == 2.0 and out[2]["score"] == 3.0
    assert out[2]["rank"] == 1 and out[1]["rank"] == 2
    import pytest as _pt

    with _pt.raises(ValueError, match="query_vectors"):
        maxsim_topk(df, [], k=5)


def test_hard_negatives_band_and_rank(spark):
    from monstache_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),     # cos 1.0 with 1: above the band (near-dup)
        (3, [1.0, 0.4]),     # cos ~0.928 with 1: inside the band
        (4, [0.0, 1.0]),     # cos 0 with 1: below the band
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = [(r["anchor_id"], r["negative_id"], r["rank"]) for r in
           hard_negatives(df, k=2, band=(0.5, 0.95)).collect()]
    by_anchor = {}
    for a, n, rk in out:
        by_anchor.setdefault(a, []).append((rk, n))
    # anchor 1: only 3 is in-band (2 too similar, 4 too far)
    assert sorted(by_anchor[1]) == [(1, 3)]
    # anchor 3 sees both 1 and 2 at ~0.928
    assert sorted(n for _, n in by_anchor[3]) == [1, 2]
    import pytest as _pt

    with _pt.raises(ValueError, match="band"):
        hard_negatives(df, band=(0.9, 0.5))


def test_knn_join_pq_literal_stage_matches_join_formulation(spark):
    """The r15 literal-quantizer stage (cell argmax + packed PQ codes
    as one projection over inlined CAST('<repr>' AS DOUBLE) literals)
    must be BIT-IDENTICAL to the ivf_assign + pq_encode join
    formulation it replaced inside knn_join_pq — same argmax packing,
    same argmin codes, same shift packing."""
    import random

    from pyspark.sql import functions as F

    from monstache_spark.functions.vectors import as_double_array, norm
    from monstache_spark.operators.similarity import (
        _literal_pq_stage_sql,
        _norm_col,
        ivf_assign,
        pq_codebooks,
        pq_encode,
    )

    random.seed(31)
    dim, m, k_sub, n_centroids = 16, 4, 8, 3
    bits = max(1, (k_sub - 1).bit_length())
    rows = [(i, [random.uniform(-1, 1) for _ in range(dim)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = emb.filter(F.col("vec_id") < n_centroids)
    codebooks = pq_codebooks(emb, dim, m, k_sub)

    # old formulation: crossJoin argmax cell + explode/join/agg codes
    coarse = ivf_assign(emb, centroids, rank_limit=1).select(
        F.col("vec_id").alias("id"), F.col("cid").alias("ccell")
    )
    codes = pq_encode(emb, codebooks, dim, m)
    packed = codes.groupBy("vec_id").agg(
        F.sum(
            (F.col("code") * F.pow(F.lit(2.0), F.col("m") * bits)).cast("long")
        ).alias("pk")
    ).select(F.col("vec_id").alias("id"), "pk")
    old = {(r["id"], r["ccell"], r["pk"]) for r in coarse.join(packed, "id").collect()}

    # new formulation: one literal projection
    cen_rows = centroids.select(
        F.col("vec_id").alias("cid"),
        as_double_array(F.col("embedding")).alias("cvd"),
        norm(F.col("embedding")).alias("nc"),
    ).collect()
    cen = [(int(r["cid"]), list(r["cvd"]), float(r["nc"])) for r in cen_rows]
    cb = {}
    for r in codebooks.collect():
        cb[(int(r["m"]), int(r["code"]))] = list(r["sub"])
    books = [
        sorted((c, sub) for (mj, c), sub in cb.items() if mj == mi)
        for mi in range(m)
    ]
    cell_sql, pk_sql = _literal_pq_stage_sql(cen, books, dim, m, bits)
    staged = (
        emb.select(
            F.col("vec_id").alias("id"),
            as_double_array(F.col("embedding")).alias("v"),
        )
        .withColumn("nrm", _norm_col(F.col("v")))
        .withColumn("ccell", F.expr(cell_sql))
        .withColumn("pk", F.expr(pk_sql))
    )
    new = {(r["id"], r["ccell"], r["pk"]) for r in staged.collect()}
    assert new == old

    # knn_join_pq's single-collect DEFAULT path derives both quantizer
    # sets driver-side from the same `id < max(n_centroids, k_sub)`
    # rows: the Python norm fold and subvector slices must be
    # BIT-IDENTICAL to the Spark-expression derivations above
    import math

    d_sub = dim // m
    base_rows = (
        emb.filter(F.col("vec_id") < max(n_centroids, k_sub))
        .select(
            F.col("vec_id").alias("id"),
            as_double_array(F.col("embedding")).alias("vd"),
        )
        .collect()
    )
    cen_py, cb_py = [], {}
    for r in sorted(base_rows, key=lambda r: r["id"]):
        vid, vd = int(r["id"]), list(r["vd"])
        if vid < n_centroids:
            acc = 0.0
            for x in vd:
                acc = acc + x * x
            cen_py.append((vid, vd, math.sqrt(acc)))
        if vid < k_sub:
            for mi in range(m):
                cb_py[(mi, vid)] = vd[mi * d_sub : (mi + 1) * d_sub]
    books_py = [
        sorted((c, sub) for (mj, c), sub in cb_py.items() if mj == mi)
        for mi in range(m)
    ]
    # string equality of the generated SQL == bit equality of every
    # literal double (repr is shortest-round-trip)
    assert _literal_pq_stage_sql(cen_py, books_py, dim, m, bits) == (
        cell_sql,
        pk_sql,
    )


def test_pq_adc_literal_codes_match_pq_encode(spark):
    """pq_adc_topk's literal-codebook code projection must produce the
    exact (corpus_id, m, code) rows of the pq_encode join formulation,
    and the full query must equal a run with explicitly-supplied
    (join-built) codebooks."""
    import random

    from pyspark.sql import functions as F

    from monstache_spark.functions.vectors import as_double_array
    from monstache_spark.operators.similarity import (
        _literal_code_sql,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    random.seed(37)
    dim, m, k_sub = 16, 4, 8
    d_sub = dim // m
    rows = [(i, [random.uniform(-1, 1) for _ in range(dim)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codebooks = pq_codebooks(emb, dim, m, k_sub)
    old = {
        (r["vec_id"], r["m"], r["code"])
        for r in pq_encode(emb, codebooks, dim, m).collect()
    }
    base_rows = (
        emb.filter(F.col("vec_id") < k_sub)
        .select(F.col("vec_id").alias("id"), as_double_array("embedding").alias("vd"))
        .collect()
    )
    cb_vals = {}
    for r in sorted(base_rows, key=lambda r: r["id"]):
        vd = list(r["vd"])
        for mi in range(m):
            cb_vals[(mi, int(r["id"]))] = vd[mi * d_sub : (mi + 1) * d_sub]
    books = [
        sorted((c, s) for (mj, c), s in cb_vals.items() if mj == mi)
        for mi in range(m)
    ]
    lit = emb.select(
        F.col("vec_id").alias("corpus_id"),
        as_double_array("embedding").alias("v"),
    ).selectExpr(
        "corpus_id",
        "inline(array("
        + ", ".join(
            f"struct(CAST({mi} AS BIGINT) AS m,"
            f" {_literal_code_sql(books[mi], mi, d_sub)} AS code)"
            for mi in range(m)
        )
        + "))",
    )
    new = {(r["corpus_id"], r["m"], r["code"]) for r in lit.collect()}
    assert new == old

    queries = emb.filter("vec_id >= 10 and vec_id < 14")
    a = {
        (r["query_id"], r["corpus_id"], r["rank"], r["dist_micro"])
        for r in pq_adc_topk(emb, queries, dim, k=3, m=m, k_sub=k_sub).collect()
    }
    b = {
        (r["query_id"], r["corpus_id"], r["rank"], r["dist_micro"])
        for r in pq_adc_topk(
            emb, queries, dim, k=3, m=m, k_sub=k_sub, codebooks=codebooks
        ).collect()
    }
    assert a == b and len(a) > 0
