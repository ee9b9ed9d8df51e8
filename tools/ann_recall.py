"""ANN recall harness: recall@k of the approximate paths vs the exact
brute-force baseline, at a real scale factor.

    python tools/ann_recall.py [sf_dir] [k] [n_queries]

Defaults: /root/testdata/sf0.1, k=10, 100 queries. Reports recall and
wall time per configuration — the numbers the README quotes. Recall is
macro-averaged over queries: |approx∩exact| / k.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from monstache_spark.session import get_spark
from monstache_spark.sources.testdata import load_table


def _pairs(df) -> set[tuple]:
    return {(r["query_id"], r["corpus_id"]) for r in df.collect()}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from monstache_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
        lsh_topk,
    )

    spark = get_spark("ann-recall")
    emb = load_table(spark, "embeddings", sf_dir).cache()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < n_q)

    t0 = time.time()
    exact = _pairs(brute_force_topk(emb, queries, k=k))
    t_exact = time.time() - t0
    print(f"corpus={n_corpus} queries={n_q} k={k}   exact baseline {t_exact:.1f}s")

    km = kmeans_centroids(emb, 16, max_iter=5).cache()
    km.count()

    configs = [
        ("lsh bits=6 single-probe", lambda: lsh_topk(emb, queries, dim=64, k=k, bits=6)),
        (
            "lsh bits=6 multi-probe H1",
            lambda: lsh_topk(emb, queries, dim=64, k=k, bits=6, hamming=1),
        ),
        (
            "lsh bits=6 multi-probe H2",
            lambda: lsh_topk(emb, queries, dim=64, k=k, bits=6, hamming=2),
        ),
        (
            "lsh bits=6 tables=4",
            lambda: lsh_topk(emb, queries, dim=64, k=k, bits=6, n_tables=4),
        ),
        (
            "lsh bits=6 tables=4 H1",
            lambda: lsh_topk(emb, queries, dim=64, k=k, bits=6, n_tables=4, hamming=1),
        ),
        (
            "ivf 16 cells n_probe=1",
            lambda: ivf_topk(emb, queries, k=k, n_centroids=16, n_probe=1),
        ),
        (
            "ivf 16 cells n_probe=4",
            lambda: ivf_topk(emb, queries, k=k, n_centroids=16, n_probe=4),
        ),
        (
            "ivf 16 cells n_probe=8",
            lambda: ivf_topk(emb, queries, k=k, n_centroids=16, n_probe=8),
        ),
        (
            "ivf kmeans16 n_probe=4",
            lambda: ivf_topk(emb, queries, k=k, n_centroids=16, n_probe=4, centroids=km),
        ),
        (
            "ivf kmeans16 n_probe=8",
            lambda: ivf_topk(emb, queries, k=k, n_centroids=16, n_probe=8, centroids=km),
        ),
    ]
    for name, fn in configs:
        t0 = time.time()
        approx = _pairs(fn())
        dt = time.time() - t0
        recall = len(approx & exact) / max(len(exact), 1)
        print(f"{name:28s} recall@{k} {recall:6.3f}   {dt:5.1f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
