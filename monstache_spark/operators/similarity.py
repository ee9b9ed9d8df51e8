"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the scale plan:

- Brute-force cosine top-k: broadcast the (small) query set against the
  corpus — one pass over the corpus, no shuffle of the corpus at all;
  per-query top-k via window. The corpus side streams through codegen'd
  dot products. This is the exact baseline.
- LSH-bucketed ANN (random hyperplanes): each vector gets a b-bit sign
  sketch from fixed pseudo-random hyperplanes (deterministically derived
  from md5, so results are reproducible anywhere); queries probe only
  their bucket (+ optional multi-probe neighbors). At 100 TB the corpus
  is hash-partitioned by bucket → a query touches 1/2^b of the data.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from monstache_spark.functions.vectors import as_double_array, cosine_rounded
from monstache_spark.session import shuffle_partitions


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` is broadcast; ties
    break on corpus id for determinism.

    Both sides pre-cast to double and pre-compute their norms ONCE
    PER ROW (query norms at broadcast build, corpus norms in the scan
    projection), so per-pair work is a single interpreted fold
    instead of three folds plus six cast transforms —
    ``sqrt(q·q)·sqrt(c·c)`` keeps the exact op order of
    ``functions.vectors.cosine``, so scores stay bit-identical."""
    from monstache_spark.functions.vectors import dot_pre, norm_pre

    qv = as_double_array(F.col(vec_col))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            qv.alias("q_vec"),
            norm_pre(qv).alias("_qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        qv.alias("c_vec"),
        norm_pre(qv).alias("_cn"),
    )
    den = F.col("_qn") * F.col("_cn")
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("corpus_id")).select(
        "query_id",
        "corpus_id",
        F.round(
            F.when(den > 0, dot_pre(F.col("q_vec"), F.col("c_vec")) / den).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negatives(
    embeddings: DataFrame,
    k: int = 5,
    band: tuple = (0.5, 0.95),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    anchors: DataFrame | None = None,
) -> DataFrame:
    """Contrastive-training HARD-NEGATIVE mining: for each anchor, the
    top-``k`` most similar OTHER vectors whose rounded cosine falls in
    ``[band_lo, band_hi)`` — similar enough to be hard for the model,
    strictly below the near-duplicate band SemDeDup/embedding-dedup
    would remove (the complement of that contract: dedup kills
    ``≥ hi``, negatives train on ``[lo, hi)``).  ``anchors`` is the
    query set being mined for (the realistic shape: negatives are
    mined for a TRAINING-QUERY set, not every corpus vector); None
    mines for every vector.  Returns
    ``(anchor_id, negative_id, score, rank)``.

    Plan shape: this is the exact anchors×corpus baseline, made flat
    in the constant factor — both sides PRE-NORMALIZE ONCE, each
    staged through its exchange (broadcast build / shuffle write) so
    Catalyst's projection collapse cannot re-inline the norm into
    every pair, leaving ONE dot-product fold per pair where the naive
    cosine pays three (dot + two norms — measured 211 s → ~8 s at
    2k×2k); cosine of unit vectors IS the dot, rounded at 6 dp with
    the identical expression tree in the oracle.  At 100 TB generate
    candidates through the IVF-PQ co-bucket kNN join
    (:func:`knn_join_pq`) and band-filter its output — identical
    contract, candidate cost O(cell population) instead of |A|·N.
    """
    lo, hi = float(band[0]), float(band[1])
    if not (lo < hi):
        raise ValueError("band must be (lo, hi) with lo < hi")
    # the broadcast hint applies only to a CALLER-SUPPLIED anchor set
    # (presumed query-sized); the anchors=None full-corpus mode is the
    # fenced exact baseline and must not force-collect the whole
    # corpus to the driver — Spark picks the join strategy there
    hint_broadcast = anchors is not None
    if anchors is None:
        anchors = embeddings

    def unit(frame: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        v = as_double_array(F.col(vec_col))
        n = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x
            )
        )
        normed = F.when(
            n > 0, F.transform(v, lambda x: x / n)
        ).otherwise(F.transform(v, lambda x: x * F.lit(0.0)))
        return frame.select(
            F.col(id_col).alias(out_id), normed.alias(out_vec)
        )

    a = unit(anchors, "anchor_id", "a_vec")
    if hint_broadcast:
        a = F.broadcast(a)
    else:
        a = a.repartition(
            embeddings.sparkSession.sparkContext.defaultParallelism
        )
    c = unit(embeddings, "negative_id", "c_vec").repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_vec"), F.col("c_vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    scored = (
        a.crossJoin(c)
        .filter(F.col("anchor_id") != F.col("negative_id"))
        .select(
            "anchor_id",
            "negative_id",
            F.round(dot, 6).alias("score"),
        )
        .filter((F.col("score") >= F.lit(lo)) & (F.col("score") < F.lit(hi)))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def maxsim_topk(
    doc_vecs: DataFrame,
    query_vectors: list[list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``rank_vectors`` late-interaction scoring (the ColBERT
    ``maxSimDotProduct`` rank-feature): documents carry MULTIPLE
    vectors — one row per (doc, vector), the exploded storage a
    multi-vector field syncs into — and
    ``score(doc) = Σ_q max_v dot(q, v)``: each query token vector
    picks its best-matching doc vector, scores sum over query tokens.

    Plan shape: the Q query vectors are compile-time literals, so the
    Q dot products are ONE codegen projection per (doc, vector) row
    (left-to-right double summation, the vectors contract); the
    per-query maxes collapse in ONE hash agg per doc (Q max columns,
    map-side combinable — no explode of queries, no join, no second
    corpus pass); the sum of maxes rounds at 6 dp and top-k is
    TakeOrderedAndProject.  Cost is corpus × Q multiplies — the same
    arithmetic ES pays per candidate, here flat over one scan.
    Returns ``(id, score, rank)``.
    """
    if not query_vectors:
        raise ValueError("query_vectors must be non-empty")
    v = as_double_array(F.col(vec_col))
    dots = []
    for qi, qvec in enumerate(query_vectors):
        qv = F.array(*[F.lit(float(x)) for x in qvec])
        dots.append(
            F.aggregate(
                F.zip_with(v, qv, lambda a, b: a * b),
                F.lit(0.0),
                lambda s, x: s + x,
            ).alias(f"_d{qi}")
        )
    per_vec = doc_vecs.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), *dots
    )
    maxes = per_vec.groupBy(id_col).agg(
        *[F.max(f"_d{qi}").alias(f"_m{qi}") for qi in range(len(query_vectors))]
    )
    total = F.lit(0.0)
    for qi in range(len(query_vectors)):
        total = total + F.col(f"_m{qi}")
    scored = maxes.select(F.col(id_col), F.round(total, 6).alias("score"))
    ranked = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def knn_search(
    docs: DataFrame,
    query_vector: list[float],
    k: int = 10,
    filter: dict | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    similarity: str = "cosine",
    num_candidates: int | None = None,
    analyzer=None,
    min_similarity: float | None = None,
) -> DataFrame:
    """ES 8 kNN search API (the top-level ``knn`` section a consumer
    of a monstache-synced index issues): top-``k`` documents nearest
    a LITERAL query vector, with ES's PRE-FILTER semantics — the
    optional ``filter`` (any bool-DSL dict) restricts the candidate
    set BEFORE the top-k (ES applies it during HNSW graph traversal;
    post-filtering k results down would return fewer than k, which ES
    explicitly does not do).

    ``_score`` follows the ES contract per similarity: ``cosine`` →
    ``(1 + cos)/2``, ``dot_product`` → ``(1 + dot)/2`` (vectors
    assumed unit-normalized, as ES requires for dot_product),
    ``l2_norm`` → ``1/(1 + d²)`` — each rounded at 6 decimals over
    left-to-right double summation (the vectors.cosine contract).

    This is the exact path: ONE corpus scan with the query vector as
    a literal expression (no crossJoin, no second frame), a filter
    predicate, and TakeOrderedAndProject — at 100 TB route through
    ``ivfpq_topk_indexed`` with the same filter pushed into the cell
    scan; ``num_candidates`` (an HNSW beam width) is accepted and
    ignored here because the exact path considers every candidate.

    ``min_similarity`` is ES's knn ``similarity`` threshold (the
    request field is literally named ``similarity``; the metric name
    comes from the field MAPPING, which our ``similarity`` str arg
    plays): candidates below the required similarity are dropped, so
    FEWER than ``k`` hits may return — the one knn case where ES
    documents an under-filled result.  For ``cosine``/``dot_product``
    it is the minimum RAW similarity (score ≥ (1+t)/2); for
    ``l2_norm`` it is the maximum DISTANCE (score ≥ 1/(1+t²)).  The
    cut compares 6-dp ROUNDED score against the 6-dp rounded
    threshold — the S11 contract class, so membership is
    engine-exact.  Returns ``(id, score, rank)``.
    """
    if similarity not in ("cosine", "dot_product", "l2_norm"):
        raise ValueError(f"unsupported similarity: {similarity}")
    base = docs
    if filter is not None:
        from monstache_spark.operators.search import compile_bool_query

        base = base.filter(compile_bool_query(filter, analyzer=analyzer))
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    v = as_double_array(F.col(vec_col))
    dot = F.aggregate(
        F.zip_with(v, qv, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
    )
    if similarity == "cosine":
        qn = math.sqrt(sum(float(x) * float(x) for x in query_vector))
        vn = F.sqrt(
            F.aggregate(
                F.transform(v, lambda a: a * a), F.lit(0.0), lambda s, x: s + x
            )
        )
        cos = F.when(vn * F.lit(qn) > 0, dot / (vn * F.lit(qn))).otherwise(
            F.lit(0.0)
        )
        score = F.round((F.lit(1.0) + cos) / F.lit(2.0), 6)
    elif similarity == "dot_product":
        score = F.round((F.lit(1.0) + dot) / F.lit(2.0), 6)
    else:
        d2 = F.aggregate(
            F.zip_with(v, qv, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        score = F.round(F.lit(1.0) / (F.lit(1.0) + d2), 6)
    scored = base.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), score.alias("score")
    )
    if min_similarity is not None:
        t = float(min_similarity)
        if similarity == "l2_norm":
            thr = 1.0 / (1.0 + t * t)
        else:
            thr = (1.0 + t) / 2.0
        scored = scored.filter(F.col("score") >= F.lit(round(thr, 6)))
    ranked = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j of
    plane p is derived from md5(p:j) mapped to [-1, 1). Pure Python at
    plan-build time (tiny), shipped as a literal array — the Spark-side
    computation stays JVM-only."""
    import hashlib

    comps = []
    for j in range(dim):
        h = hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[:8]
        comps.append((int(h, 16) / float(0xFFFFFFFF)) * 2.0 - 1.0)
    return comps


def lsh_bucket(vec: Column, dim: int, bits: int = 8, table: int = 0) -> Column:
    """Sign-sketch bucket id in [0, 2^bits): bit p = 1 iff v·plane_p > 0.

    ``table`` selects a disjoint hyperplane family (plane indices
    ``table*bits .. table*bits+bits-1``) so independent hash tables for
    OR-amplified multi-table LSH share one implementation; table 0 is
    the original family (oracle-pinned)."""
    acc = F.lit(0).cast("long")
    v = as_double_array(vec)
    for p in range(bits):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, table * bits + p)])
        d = F.aggregate(F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        acc = acc + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def _pack_score_id(score6: Column, idx: Column) -> Column:
    """(score, idx) lexicographic argmax key as ONE long: score must
    already be rounded to 6 decimals (score·10⁶ exact), idx in
    [0, 2²¹) occupies the low bits INVERTED so the max pack breaks
    score ties toward the LOWEST idx."""
    micro = F.round(score6 * F.lit(1_000_000.0)).cast("long")
    return micro * F.lit(1 << 21) + (F.lit((1 << 21) - 1) - idx)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rank_limit: int = 1,
) -> DataFrame:
    """Assign each vector to its ``rank_limit`` nearest centroids by
    cosine (rank 1 = cell assignment; >1 = multi-probe list). The
    centroid set broadcasts — it is index-metadata-sized (hundreds to
    thousands of rows) at any corpus scale."""
    from monstache_spark.functions.vectors import as_double_array, dot_pre, norm

    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cid"),
            # pre-cast to double at broadcast build: HOFs are
            # interpreted, so a per-pair cast transform costs more
            # than the dot fold itself
            as_double_array(F.col(vec_col)).alias("_cvd"),
            # centroid norms computed once at broadcast build, not per
            # (vector, centroid) pair
            norm(F.col(vec_col)).alias("_nc"),
        )
    )
    # Two interpreted-HOF cost levers: (1) the corpus usually arrives
    # as one small-bytes scan partition while the crossJoin output is
    # |corpus| x |centroids| interpreted cosines — an explicit-width
    # exchange spreads that work (AQE would coalesce it back on input
    # bytes); (2) the corpus-side norm is computed once per VECTOR
    # before the join instead of once per pair, leaving one
    # interpreted dot per pair. sqrt(a*a)*sqrt(b*b) keeps the exact op
    # order of functions.vectors.cosine, so scores stay bit-identical.
    nparts = shuffle_partitions(corpus.sparkSession)
    base = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .repartition(nparts, F.col(id_col))
        .withColumn("_vd", as_double_array(F.col(vec_col)))
        .withColumn("_na", norm(F.col(vec_col)))
    )
    den = F.col("_na") * F.col("_nc")
    score = F.round(
        F.when(den > 0, dot_pre(F.col("_vd"), F.col("_cvd")) / den).otherwise(F.lit(0.0)),
        6,
    )
    scored = base.crossJoin(c).select(id_col, vec_col, "cid", score.alias("c_score"))
    if rank_limit == 1:
        # Cell assignment (the corpus-sized path) is an argmax per key:
        # a hash aggregate with map-side partial combine collapses the
        # |corpus| x |centroids| scored rows to one row per vector
        # BEFORE the exchange — vs a row_number window, which shuffles
        # and sorts every scored row.  The (score, cid) lexicographic
        # order packs into ONE long — a struct ordering key in the
        # max_by buffer silently degrades the aggregate to
        # SortAggregate (UnsafeRow buffers only mutate primitives; the
        # plan audit now guards this).  c_score is already rounded to
        # 6 decimals, so score·10⁶ is an exact integer; cid occupies
        # the low 21 bits inverted (max pack ⇒ max score, then MIN
        # cid).  Precondition: 0 ≤ cid < 2²¹ — centroid ids are index
        # metadata (hundreds to thousands), never near the bound.
        pack = _pack_score_id(F.col("c_score"), F.col("cid"))
        best = scored.groupBy(id_col, vec_col).agg(F.max(pack).alias("_pk"))
        r = F.pmod(F.col("_pk"), F.lit(1 << 21))
        return best.select(
            id_col,
            vec_col,
            (F.lit((1 << 21) - 1) - r).cast("long").alias("cid"),
            (
                ((F.col("_pk") - r) / F.lit(1 << 21)).cast("long")
                / F.lit(1_000_000.0)
            ).alias("c_score"),
        ).withColumn("c_rank", F.lit(1))
    # multi-probe (query-side, small): the window sort is fine here
    w = Window.partitionBy(id_col).orderBy(F.col("c_score").desc(), F.col("cid").asc())
    return scored.withColumn("c_rank", F.row_number().over(w)).filter(
        F.col("c_rank") <= rank_limit
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Learned IVF centroids via pyspark.ml KMeans (the production
    index-build path; deterministic for a fixed seed). Returns a
    centroid frame shaped like a corpus (id_col, vec_col) so it plugs
    straight into ivf_assign/ivf_topk."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fea = corpus.select(
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(fea)
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return corpus.sparkSession.createDataFrame(
        rows, f"{id_col} bigint, {vec_col} array<double>"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: corpus partitioned into centroid
    cells, queries probe only their ``n_probe`` nearest cells.

    Default centroids are the ``n_centroids`` lowest-id vectors —
    deterministic and oracle-reproducible; pass
    ``centroids=kmeans_centroids(corpus, n)`` for the learned
    production index (same plan shape). At scale the corpus is written
    partitioned by ``cell`` so a query's probe list prunes partitions
    at the scan: cost ~ (n_probe / n_centroids) of the corpus per
    query, and the cell equi-join replaces the brute-force cross
    join."""
    from monstache_spark.functions.vectors import dot_pre, norm_pre

    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids)
    # pre-cast + pre-norm once per row on BOTH join sides so the
    # per-pair work after the cell equi-join is a single interpreted
    # fold (same op order as cosine_rounded — scores bit-identical)
    vd = as_double_array(F.col(vec_col))
    cells = ivf_assign(corpus, centroids, vec_col, id_col, rank_limit=1).select(
        F.col(id_col).alias("corpus_id"), vd.alias("c_vec"),
        norm_pre(vd).alias("_cn"), F.col("cid").alias("cell"),
    )
    probes = ivf_assign(queries, centroids, vec_col, id_col, rank_limit=n_probe).select(
        F.col(id_col).alias("query_id"), vd.alias("q_vec"),
        norm_pre(vd).alias("_qn"), F.col("cid").alias("cell"),
    )
    den = F.col("_qn") * F.col("_cn")
    scored = probes.join(cells, "cell").filter(
        F.col("query_id") != F.col("corpus_id")
    ).select(
        "query_id",
        "corpus_id",
        F.round(
            F.when(den > 0, dot_pre(F.col("q_vec"), F.col("c_vec")) / den).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("score"),
    )
    # a corpus vector can surface via several probed cells only if
    # duplicated — cell assignment is unique, so no dedup needed
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hamming: int = 0,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket(s). Recall < 1
    by design; the bucketed equi-join replaces the cross join, so cost
    scales with probed-bucket size, not corpus size.

    Two independent recall knobs, composable:

    - ``hamming``: multi-probe — each query also probes every bucket
      within Hamming distance 1 (one sketch bit flipped) or 2 (any two
      bits) of its own. Query-side fan-out only: the index stays one
      bucket per corpus vector, probe volume grows to
      ``1 + bits (+ bits*(bits-1)/2)`` buckets.
    - ``n_tables``: OR-amplification — L disjoint hyperplane families;
      a candidate is probed if it shares a bucket in ANY table
      (recall ≈ 1-(1-p^bits)^L). Index-side fan-out: the corpus emits
      one row per table, so index size and build cost grow L×, while
      each table's probe stays one bucket.

    Candidates found via several probes/tables are deduped on
    (query, corpus) before ranking, so no result is double-counted.
    Measured at sf0.1 (tools/ann_recall.py, bits=6, recall@10):
    single-probe .060 → H1 .257 → H2 .579; 4 tables .222, and
    4 tables × H1 .735 — probe-volume-for-recall trades with the
    index layout unchanged within each table."""
    from monstache_spark.functions.vectors import dot_pre, norm_pre

    tables = list(range(n_tables))
    # pre-cast + pre-norm once per row on both sides: per-pair work
    # after the bucket join is a single interpreted fold (same op
    # order as cosine_rounded — scores bit-identical)
    vd = as_double_array(F.col(vec_col))
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        vd.alias("c_vec"),
        norm_pre(vd).alias("_cn"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_bucket(F.col(vec_col), dim, bits, table=t).alias("b"),
                    )
                    for t in tables
                ]
            )
        ).alias("tb"),
    ).select(
        "corpus_id", "c_vec", "_cn", F.col("tb.t").alias("t"), F.col("tb.b").alias("bucket")
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        vd.alias("q_vec"),
        norm_pre(vd).alias("_qn"),
        *[lsh_bucket(F.col(vec_col), dim, bits, table=t).alias(f"b{t}") for t in tables],
    )
    probe_structs = []
    for t in tables:
        b0 = F.col(f"b{t}")
        probes = [b0]
        if hamming >= 1:
            probes += [b0.bitwiseXOR(F.lit(1 << p)) for p in range(bits)]
        if hamming >= 2:
            probes += [
                b0.bitwiseXOR(F.lit((1 << p) | (1 << r)))
                for p in range(bits)
                for r in range(p + 1, bits)
            ]
        probe_structs += [F.struct(F.lit(t).alias("t"), b.alias("b")) for b in probes]
    q = F.broadcast(
        q0.select(
            "query_id", "q_vec", "_qn", F.explode(F.array(*probe_structs)).alias("tb")
        ).select(
            "query_id", "q_vec", "_qn", F.col("tb.t").alias("t"), F.col("tb.b").alias("bucket")
        )
    )
    den = F.col("_qn") * F.col("_cn")
    cand = q.join(c, ["t", "bucket"]).filter(F.col("query_id") != F.col("corpus_id")).select(
        "query_id",
        "corpus_id",
        F.round(
            F.when(den > 0, dot_pre(F.col("q_vec"), F.col("c_vec")) / den).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("score"),
    )
    # same pair may surface from several tables (never within one);
    # dedup carries only (ids, score) — vectors stay out of the shuffle
    scored = cand.dropDuplicates(["query_id", "corpus_id"]) if n_tables > 1 else cand
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN
# ---------------------------------------------------------------------------


def _subspace_rows(df: DataFrame, dim: int, m: int, vec_col: str, id_col: str) -> DataFrame:
    """(id, m, sub) rows: the vector split into ``m`` contiguous
    subvectors of dim/m doubles. One explode, no shuffle."""
    d_sub = dim // m
    v = as_double_array(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).cast("long").alias("m"),
                        F.slice(v, mi * d_sub + 1, d_sub).alias("sub"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("_s"),
    ).select(id_col, F.col("_s.m").alias("m"), F.col("_s.sub").alias("sub"))


def _sub_dist_micro(a: Column, b: Column) -> Column:
    """Squared L2 distance between two subvectors in integer
    micro-units: round(1e6 * sum((a_i-b_i)^2)). The left-fold order
    matches the DuckDB oracle's list_reduce, and the final integer is
    representation-stable — ranking and hashing can never diverge on
    float formatting."""
    sq = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.round(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x) * F.lit(1000000.0)).cast(
        "long"
    )


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k_sub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ codebooks as a frame of (m, code, sub): codeword ``c`` of
    subspace ``mi`` is subvector ``mi`` of the corpus vector with id
    ``c`` (the ``k_sub`` lowest ids) — the same deterministic,
    oracle-reproducible convention as ``ivf_topk``'s default
    centroids. A learned variant would run k-means per subspace and
    produce the same (m, code, sub) shape; everything downstream is
    unchanged. Codebooks are index metadata: m * k_sub rows (128 at
    the defaults) — always broadcast."""
    base = corpus.filter(F.col(id_col) < k_sub)
    return _subspace_rows(base, dim, m, vec_col, id_col).select(
        "m", F.col(id_col).cast("long").alias("code"), "sub"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector as ``m`` codebook indices: code of subspace
    ``mi`` = argmin squared-L2 codeword (ties -> lowest code). The
    compressed index is (id, m, code) — 8 small ints instead of 64
    floats at the defaults, the 32x memory cut that makes a
    100 TB-corpus index fit an executor fleet.

    Plan: explode subspaces, join the broadcast codebooks on ``m``,
    and take the argmin as ``min(dist * 1024 + code)`` — the
    (dist, code) lexicographic order packed into ONE BIGINT, because a
    struct in the aggregation buffer silently degrades the aggregate
    to SortAggregate (full map-side sort; tools/explain_audit.py
    guards this). The packed min is a fixed-width hash-aggregate
    buffer with map-side partial combine, so the |corpus| x k_sub
    scored rows collapse before any exchange. Valid for k_sub <= 1024
    and dist_micro < 2^53/1024 (distances here are bounded by the
    subvector dimension x 4e6)."""
    subs = _subspace_rows(corpus, dim, m, vec_col, id_col)
    cb = F.broadcast(codebooks.select("m", "code", F.col("sub").alias("c_sub")))
    scored = subs.join(cb, "m").select(
        id_col,
        "m",
        (_sub_dist_micro(F.col("sub"), F.col("c_sub")) * F.lit(1024) + F.col("code")).alias(
            "_pk"
        ),
    )
    best = scored.groupBy(id_col, "m").agg(F.min("_pk").alias("_pk"))
    return best.select(id_col, "m", F.pmod(F.col("_pk"), F.lit(1024)).cast("long").alias("code"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    k_sub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ ANN top-k by asymmetric distance computation (ADC,
    Jegou/Douze/Schmid PAMI'11): the corpus is scanned in the
    COMPRESSED domain — each query precomputes a lookup table of
    squared-L2 distances to every codeword (m * k_sub entries), and a
    corpus vector's approximate distance is the sum of ``m`` table
    lookups on its codes. Returns (query_id, corpus_id, dist_micro,
    rank), rank 1 = nearest, integer micro-unit distances.

    Scale shape: the LUT is |queries| * m * k_sub rows — broadcast;
    the corpus side touches only its (id, m, code) index rows (8
    ints/vector), joins the LUT on (m, code), and collapses to one
    distance per (query, vector) in a map-side-combined hash
    aggregate. The raw vectors are read once at encode time and never
    shuffled; full-precision re-ranking of the top candidates, or an
    IVF cell restriction in front (join the probe list before the
    LUT join), composes without changing this plan."""
    books = None
    if codebooks is None:
        # literal PQ codes for the default deterministic codebooks
        # (r15, the knn_join_pq pattern — see _literal_codes_frame)
        books, codebooks = _literal_default_codebooks(
            corpus, dim, m, k_sub, vec_col, id_col
        )
        if codebooks is None:
            codebooks = pq_codebooks(corpus, dim, m, k_sub, vec_col, id_col)
    if books is not None:
        codes = _literal_codes_frame(corpus, books, dim, m, vec_col, id_col).select(
            F.col(id_col).alias("corpus_id"), "m", "code"
        )
    else:
        codes = pq_encode(corpus, codebooks, dim, m, vec_col, id_col).select(
            F.col(id_col).alias("corpus_id"), "m", "code"
        )
    q_subs = _subspace_rows(queries, dim, m, vec_col, id_col)
    cb = F.broadcast(codebooks.select("m", "code", F.col("sub").alias("c_sub")))
    lut = F.broadcast(
        q_subs.join(cb, "m").select(
            F.col(id_col).alias("query_id"),
            "m",
            "code",
            _sub_dist_micro(F.col("sub"), F.col("c_sub")).alias("d_micro"),
        )
    )
    scored = (
        codes.join(lut, ["m", "code"])
        .groupBy("query_id", "corpus_id")
        .agg(F.sum("d_micro").cast("long").alias("dist_micro"))
        .filter(F.col("query_id") != F.col("corpus_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist_micro").asc(), F.col("corpus_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_sub: int = 16,
    rerank: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """The production ANN shape — IVF-PQ with exact re-ranking
    (the FAISS IVFPQ+refine recipe, composed from this module's
    operators):

    1. IVF restriction: queries probe their ``n_probe`` nearest cells;
       only corpus vectors in probed cells become candidates
       (~ n_probe/n_centroids of the corpus per query).
    2. Compressed-domain scan: candidates are scored by PQ ADC — the
       (id, m, code) index joins a broadcast per-query LUT; raw
       vectors are not touched.
    3. Refine: the ``rerank`` best ADC candidates per query (ties →
       lowest id; deterministic) are re-scored with exact cosine on
       the raw vectors, and the final top-``k`` ranks by that.

    Returns (query_id, corpus_id, score, rank) — score is the exact
    cosine of the re-ranked survivors, so result quality is bounded
    only by candidate recall, not by quantization error.

    Scale: stage 2's join volume is |candidates| * m fixed-width rows
    with a map-side-combined hash agg; stage 3 touches raw vectors for
    only queries * rerank rows — at 100 TB the full-precision data is
    read by id lookup (or carried on the cell-partitioned index),
    never scanned."""
    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids)

    # Literal PQ codes for the default deterministic codebooks (r15,
    # the knn_join_pq pattern — see _literal_codes_frame).
    books = None
    if codebooks is None:
        books, codebooks = _literal_default_codebooks(
            corpus, dim, m, k_sub, vec_col, id_col
        )
        if codebooks is None:
            codebooks = pq_codebooks(corpus, dim, m, k_sub, vec_col, id_col)

    cells = ivf_assign(corpus, centroids, vec_col, id_col, rank_limit=1).select(
        F.col(id_col).alias("corpus_id"), F.col("cid").alias("cell")
    )
    probes = ivf_assign(queries, centroids, vec_col, id_col, rank_limit=n_probe).select(
        F.col(id_col).alias("query_id"), F.col("cid").alias("cell")
    )
    cand = (
        probes.join(cells, "cell")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id")
    )

    if books is not None:
        codes = _literal_codes_frame(corpus, books, dim, m, vec_col, id_col).select(
            F.col(id_col).alias("corpus_id"), "m", "code"
        )
    else:
        codes = pq_encode(corpus, codebooks, dim, m, vec_col, id_col).select(
            F.col(id_col).alias("corpus_id"), "m", "code"
        )
    q_subs = _subspace_rows(queries, dim, m, vec_col, id_col)
    cb = F.broadcast(codebooks.select("m", "code", F.col("sub").alias("c_sub")))
    lut = F.broadcast(
        q_subs.join(cb, "m").select(
            F.col(id_col).alias("query_id"),
            "m",
            "code",
            _sub_dist_micro(F.col("sub"), F.col("c_sub")).alias("d_micro"),
        )
    )
    adc = (
        cand.join(codes, "corpus_id")
        .join(lut, ["query_id", "m", "code"])
        .groupBy("query_id", "corpus_id")
        .agg(F.sum("d_micro").cast("long").alias("dist_micro"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro").asc(), F.col("corpus_id").asc()
    )
    pool = adc.withColumn("_r", F.row_number().over(w_adc)).filter(F.col("_r") <= rerank)

    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    cv = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("c_vec"))
    refined = (
        pool.join(qv, "query_id")
        .join(cv, "corpus_id")
        .select(
            "query_id",
            "corpus_id",
            cosine_rounded(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id").asc())
    return refined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> None:
    """Materialize the IVF index as a cell-partitioned parquet table —
    the physical layout that makes ``n_probe`` real at scale: a query
    reading ``cell IN (probe list)`` prunes to those directories at
    the SCAN (Catalyst partition pruning), so probe cost is I/O-bounded
    by n_probe/n_centroids of the corpus, not filter-after-read.
    ``read_ivf_cells`` + ``tests/test_similarity.py`` assert the
    pruned plan shape."""
    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids)
    cells = ivf_assign(corpus, centroids, vec_col, id_col, rank_limit=1).select(
        id_col, vec_col, F.col("cid").alias("cell")
    )
    cells.write.mode("overwrite").partitionBy("cell").parquet(path)


def read_ivf_cells(spark, path: str, probe_cells: list[int]) -> DataFrame:
    """Read only the probed cells from a written IVF index. The IN
    filter lands in the scan's PartitionFilters — directories outside
    the probe list are never opened."""
    df = spark.read.parquet(path)
    return df.filter(F.col("cell").isin([int(c) for c in probe_cells]))


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    k_sub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> None:
    """Materialize the full IVF-PQ index — the build-once artifact that
    removes every corpus pass from query time (round-3's
    ``ivfpq_adc_topk`` re-trained and re-encoded the index inside each
    query: 5 corpus scans per execution).

    Layout under ``path``:

    - ``cells/``      cell-partitioned parquet of (id, vec, codes):
      the PQ codes ride WITH the raw vector in the cell directory, so
      one partition-pruned scan serves both the compressed ADC pass
      and the full-precision refine (the FAISS IVFPQ+refine storage
      recipe).
    - ``centroids/``  corpus-shaped (id, vec) centroid table — index
      metadata, broadcast at query time for probe assignment.
    - ``codebooks/``  (m, code, sub) PQ codebook sidecar — broadcast
      at query time to build each query's ADC lookup table.

    Build cost is the one place the corpus is scanned (assign + encode
    + write); queries against the result touch only probed cell
    directories. collect_list here is index-BUILD-time only and
    collapses to exactly ``m`` elements per vector."""
    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids)
    if codebooks is None:
        codebooks = pq_codebooks(corpus, dim, m, k_sub, vec_col, id_col)
    cells = ivf_assign(corpus, centroids, vec_col, id_col, rank_limit=1).select(
        id_col, F.col("cid").alias("cell")
    )
    codes = pq_encode(corpus, codebooks, dim, m, vec_col, id_col)
    packed = codes.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("m"), F.col("code")))),
            lambda s: s["code"],
        ).alias("codes")
    )
    (
        corpus.select(id_col, vec_col)
        .join(cells, id_col)
        .join(packed, id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path + "/cells")
    )
    centroids.select(id_col, vec_col).write.mode("overwrite").parquet(path + "/centroids")
    codebooks.write.mode("overwrite").parquet(path + "/codebooks")


def ivfpq_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_probe: int = 4,
    m: int = 8,
    rerank: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ + exact refine over a materialized index
    (:func:`write_ivfpq_index`) — identical results to
    :func:`ivfpq_adc_topk` built from the same corpus/centroids/
    codebooks, but query cost is bounded by the probed cells, not the
    corpus:

    1. Probe: queries assign to their ``n_probe`` nearest centroids
       (broadcast metadata); the union of probed cells becomes a
       LITERAL IN-list (collected driver-side — O(queries * n_probe)
       control-plane rows), so the cells scan prunes at the SOURCE
       (PartitionFilters, asserted in tests).
    2. ADC: candidate codes posexplode to (m, code) and join the
       broadcast per-query LUT; map-side-combined hash agg sums the
       ``m`` lookups.
    3. Refine: the ``rerank`` best ADC candidates per query re-score
       with exact cosine on the raw vectors read from the SAME pruned
       cell scan (broadcast pool join — no second corpus pass).
    """
    cells_all = spark.read.parquet(path + "/cells")
    centroids = spark.read.parquet(path + "/centroids")
    codebooks = spark.read.parquet(path + "/codebooks")

    # Literal-centroid probe (r15; guide §2.4/§7.3): centroids are
    # index metadata, and the probe LIST is collected driver-side
    # anyway (the IN-list that prunes the cells scan) — so the old
    # shape ran the full ivf_assign subtree (an explicit-width
    # exchange of the query rows + broadcast crossJoin + multi-probe
    # window) TWICE per query: once under the eager cell collect,
    # once as the candidate join's broadcast build.  Here one
    # projection job computes each query's n_probe cells as a
    # descending sort of the literal centroid packs (pack order ==
    # (score desc, cid asc) — exactly ivf_assign's multi-probe window
    # order, same rounded-cosine arithmetic, pinned by
    # test_ivfpq_indexed_matches_unindexed), and the collected
    # (query_id, cell) pairs re-enter as a LocalRelation.
    from monstache_spark.functions.vectors import norm

    cen_rows = centroids.select(
        F.col(id_col).alias("cid"),
        as_double_array(F.col(vec_col)).alias("cvd"),
        norm(F.col(vec_col)).alias("nc"),
    ).collect()
    cen = [(int(r["cid"]), list(r["cvd"]), float(r["nc"])) for r in cen_rows]
    mask21 = (1 << 21) - 1
    probe_sql = (
        f"transform(slice(reverse(array_sort({_literal_cell_packs_sql(cen)})), "
        f"1, {n_probe}), p -> CAST({mask21} - pmod(p, {1 << 21}) AS BIGINT))"
    )
    probe_rows = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(F.col(vec_col)).alias("v"),
        )
        .withColumn("nrm", _norm_col(F.col("v")))
        .select("query_id", F.expr(probe_sql).alias("cells"))
        .collect()
    )
    pairs = [(r["query_id"], int(c)) for r in probe_rows for c in r["cells"]]
    probe_cells = sorted({c for _, c in pairs})
    pruned = cells_all.filter(F.col("cell").isin(probe_cells))
    qid_sql = queries.schema[id_col].dataType.simpleString()
    if pairs:
        # one selectExpr with the pairs as SQL text — element-wise
        # F.lit/F.struct Columns cost hundreds of py4j round-trips
        # (the sinks/annindex._quant_frame lesson)
        def q_lit(q) -> str:
            if isinstance(q, str):
                return "'" + q.replace("'", "''") + "'"
            return repr(q)

        probes = (
            spark.range(1)
            .selectExpr(
                "explode(array("
                + ", ".join(
                    f"struct(CAST({q_lit(q)} AS {qid_sql}) AS query_id,"
                    f" CAST({c} AS BIGINT) AS cell)"
                    for q, c in pairs
                )
                + ")) AS _p"
            )
            .select("_p.query_id", "_p.cell")
        )
    else:
        probes = (
            queries.select(F.col(id_col).alias("query_id"))
            .withColumn("cell", F.lit(0).cast("long"))
            .filter(F.lit(False))
        )

    cand = (
        F.broadcast(probes)
        .join(pruned, "cell")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("corpus_id"), "codes")
    )

    q_subs = _subspace_rows(queries, dim, m, vec_col, id_col)
    cb = F.broadcast(codebooks.select("m", "code", F.col("sub").alias("c_sub")))
    lut = F.broadcast(
        q_subs.join(cb, "m").select(
            F.col(id_col).alias("query_id"),
            "m",
            "code",
            _sub_dist_micro(F.col("sub"), F.col("c_sub")).alias("d_micro"),
        )
    )
    adc = (
        cand.select(
            "query_id", "corpus_id", F.posexplode("codes").alias("m", "code")
        )
        .join(lut, ["query_id", "m", "code"])
        .groupBy("query_id", "corpus_id")
        .agg(F.sum("d_micro").cast("long").alias("dist_micro"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro").asc(), F.col("corpus_id").asc()
    )
    pool = adc.withColumn("_r", F.row_number().over(w_adc)).filter(F.col("_r") <= rerank)

    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    cv = pruned.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("c_vec"))
    refined = (
        F.broadcast(pool.select("query_id", "corpus_id"))
        .join(cv, "corpus_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "corpus_id",
            cosine_rounded(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("corpus_id").asc())
    return refined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    corpus: DataFrame,
    tau: float = 0.95,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) as a pure DataFrame plan: cluster the embedding
    space, then inside each cluster remove every vector that has a
    semantic near-duplicate (cosine >= ``tau``) with a smaller id —
    the surviving lowest-id member is each duplicate group's keeper.

    Plan shape (the scale story):

    - Cell assignment is :func:`ivf_assign` — centroids broadcast, the
      corpus never shuffles for the assignment (map-side argmax).
    - The near-dup pair search is an EQUI-join on ``cell`` with
      ``a.id < b.id`` — pair cost is sum(|cell| choose 2), never the
      all-pairs corpus square. At 100 TB the production call passes
      ``centroids=kmeans_centroids(corpus, n)`` with n sized so cells
      stay bounded (the paper's setting: n ~ sqrt(|corpus|)), and
      ``max_cell`` caps degenerate cells the same way the LSH buckets
      are capped (suppressed cells are observable via the returned
      ``cell_size`` — a suppressed cell keeps ALL its members rather
      than silently guessing which to drop).
    - Survivors = corpus anti-join losers (losers shuffle as bare ids).

    Default centroids are the ``n_centroids`` lowest-id vectors —
    deterministic and oracle-reproducible in ANSI SQL.

    Returns (id_col, cell, cell_size) for each surviving vector.
    """
    from monstache_spark.functions.vectors import as_double_array, dot_pre, norm

    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids)
    # NOTE (r15 optimization round, negative result): replacing this
    # ivf_assign call with the knn_join_pq-style literal-centroid
    # argmax projection MEASURED ~2x SLOWER here (ABBA best-of-3:
    # 1.98/2.65 s join formulation vs 3.5-5.2 s literal, stable
    # sentinel) — at n_centroids=16 the nested interpreted
    # transform-over-sequence(aggregate(zip_with(...))) evaluation
    # costs more per row than 16 crossJoin pair rows each paying one
    # flat dot fold plus the map-side-combined argmax.  knn_join_pq
    # keeps the literal form because it also eliminates the encode
    # explode/join/aggregates and two code-attach joins; here the
    # crossJoin+argmax was the whole cost.  Left as the join
    # formulation.
    cells = ivf_assign(corpus, centroids, vec_col, id_col, rank_limit=1).select(
        F.col(id_col), F.col(vec_col), F.col("cid").alias("cell")
    )
    sizes = cells.groupBy("cell").agg(F.count("*").alias("cell_size"))
    cells = cells.join(F.broadcast(sizes), "cell")
    eligible = (
        cells if max_cell is None else cells.filter(F.col("cell_size") <= max_cell)
    )
    # Precompute each vector's norm BEFORE the pair join: the
    # zip_with/aggregate dot product is interpreted (outside codegen),
    # so evaluating 3 of them per PAIR (a·b, a·a, b·b) is the cost
    # center — norms are per-VECTOR and the cell exchange materializes
    # them as data, leaving one interpreted aggregate per pair.
    # sqrt(a·a)*sqrt(b·b) is evaluated in the same op order as
    # functions.vectors.cosine, so rounding is bit-identical.
    # Explicit-width exchange on cell: pair volume is quadratic in cell
    # size while the PRE-join bytes are tiny, so AQE would coalesce the
    # join down to one task sized by input bytes (the explode-
    # parallelism trap); the explicit width pins one task per cell hash
    # and both join sides inherit the partitioning (single exchange).
    nparts = shuffle_partitions(corpus.sparkSession)
    # the arrays are ALSO pre-cast to double here (not just the
    # norms): the per-pair ``dot`` otherwise pays two interpreted
    # cast transforms per pair, which cost more than the fold itself
    sided = eligible.repartition(nparts, F.col("cell")).select(
        "cell",
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("_vd"),
        norm(F.col(vec_col)).alias("_nrm"),
    )
    a = sided.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col("_vd").alias("v_a"),
        F.col("_nrm").alias("n_a"),
    )
    b = sided.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col("_vd").alias("v_b"),
        F.col("_nrm").alias("n_b"),
    )
    den = F.col("n_a") * F.col("n_b")
    cos = F.round(
        F.when(den > 0, dot_pre(F.col("v_a"), F.col("v_b")) / den).otherwise(F.lit(0.0)), 6
    )
    losers = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= tau)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return cells.join(losers, id_col, "left_anti").select(id_col, "cell", "cell_size")


def _norm_col(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
    )


def knn_join_ivf(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_fine: int | None = None,
    max_cell: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Batch ANN via IVF cells — the SCALE path for the all-corpus kNN
    join (:func:`knn_join` is the LSH co-bucket variant).

    Why IVF beats sign-sketch co-bucketing for the batch join: LSH
    sign buckets are data-oblivious — clustered corpora (the normal
    embedding shape) pile into a few buckets, and the co-bucket
    self-join inflates quadratically inside them (the 100× probe
    measured ~60 s with the cap engaged).  IVF cells follow the data:
    centroids land where the mass is, cells stay near-balanced, and
    candidate volume is ``n_probe · N · avg_cell``.

    Flat mode (``n_fine=None``) assigns against ``n_centroids``
    broadcast centroids — right when ``n_centroids`` is small.  But a
    balanced cell size needs ``n_centroids ∝ N``, and flat assignment
    costs ``N · n_centroids`` dot products — quadratic in N.  The
    scale path is TWO-LEVEL (``n_fine`` set, the IMI idea): assign to
    ``n_centroids`` coarse cells, then to one of ``n_fine`` fine
    centroids chosen WITHIN each coarse cell (its lowest-id members —
    deterministic, index-free), giving ``n_centroids · n_fine``
    effective cells at ``N · (n_centroids + n_fine)`` assignment cost
    — linear in N with cell count scaling multiplicatively.  Probing
    covers the ``n_probe`` nearest FINE cells within the query's own
    coarse cell (recall loss at coarse boundaries is the documented
    trade; raise ``n_centroids``/``n_probe`` to buy it back —
    measured in tools/scale_probe.py).

    Norms are computed ONCE per row before the candidate join so
    per-pair work is a single dot; the candidate join is a plain
    equi-join on the cell id; per-vector top-k is a window over
    candidate rows.  ``max_cell`` drops over-full cells (same
    explicit-loss contract as ``knn_join``'s ``max_bucket``).
    ``centroids`` defaults to the ``n_centroids`` lowest-id vectors
    (deterministic, oracle-reproducible); pass
    ``kmeans_centroids(...)`` for the learned production index.

    Returns ``(id_q, id_n, score, rank)``.
    """
    if centroids is None:
        centroids = emb.filter(F.col(id_col) < n_centroids)
    coarse = ivf_assign(emb, centroids, vec_col, id_col, rank_limit=1).select(
        F.col(id_col).alias("id"),
        as_double_array(F.col(vec_col)).alias("v"),
        F.col("cid").alias("ccell"),
    ).withColumn("nrm", _norm_col(F.col("v")))

    if n_fine is None:
        cells = coarse.select(
            F.col("id").alias("id_n"), F.col("v").alias("vn"),
            F.col("nrm").alias("nn"), F.col("ccell").alias("cell"),
        )
        probes = ivf_assign(
            emb, centroids, vec_col, id_col, rank_limit=n_probe
        ).select(
            F.col(id_col).alias("id_q"),
            as_double_array(F.col(vec_col)).alias("vq"),
            F.col("cid").alias("cell"),
        ).withColumn("nq", _norm_col(F.col("vq")))
    else:
        # fine centroids: the n_fine lowest-id members of each coarse
        # cell — a bounded window over the assigned frame, then a
        # BROADCAST join back on the coarse cell (n_centroids·n_fine
        # rows total: index-metadata-sized at any corpus scale)
        wf = Window.partitionBy("ccell").orderBy(F.col("id").asc())
        fine_c = (
            coarse.withColumn("_fr", F.row_number().over(wf))
            .filter(F.col("_fr") <= n_fine)
            .select(
                "ccell",
                F.col("_fr").alias("fcell"),
                F.col("v").alias("fv"),
                F.col("nrm").alias("fn"),
            )
        )
        fd = F.aggregate(
            F.zip_with(F.col("v"), F.col("fv"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        fden = F.col("nrm") * F.col("fn")
        fscored = coarse.join(F.broadcast(fine_c), "ccell").select(
            "id", "v", "nrm", "ccell", "fcell",
            F.round(
                F.when(fden > 0, fd / fden).otherwise(F.lit(0.0)), 6
            ).alias("fs"),
        )
        # argmax per vector stays a HashAggregate: the (fs, fcell)
        # order packs into one long (same pattern as ivf_assign's
        # rank-1 path — a struct ordering key would degrade to
        # SortAggregate)
        fpack = _pack_score_id(F.col("fs"), F.col("fcell"))
        assign = fscored.groupBy("id", "v", "nrm", "ccell").agg(
            F.max(fpack).alias("_fpk")
        ).select(
            "id", "v", "nrm", "ccell",
            (F.lit((1 << 21) - 1) - F.pmod(F.col("_fpk"), F.lit(1 << 21)))
            .cast("int").alias("fcell"),
        )
        cells = assign.select(
            F.col("id").alias("id_n"), F.col("v").alias("vn"),
            F.col("nrm").alias("nn"),
            F.col("ccell"), F.col("fcell"),
        )
        wp = Window.partitionBy("id").orderBy(
            F.col("fs").desc(), F.col("fcell").asc()
        )
        probes = (
            fscored.withColumn("_pr", F.row_number().over(wp))
            .filter(F.col("_pr") <= n_probe)
            .select(
                F.col("id").alias("id_q"), F.col("v").alias("vq"),
                F.col("nrm").alias("nq"),
                F.col("ccell"), F.col("fcell"),
            )
        )

    join_keys = ["cell"] if n_fine is None else ["ccell", "fcell"]
    if max_cell is not None:
        keep = (
            cells.groupBy(*join_keys)
            .agg(F.count("*").alias("_m"))
            .filter(F.col("_m") <= max_cell)
            .select(*join_keys)
        )
        cells = cells.join(F.broadcast(keep), join_keys)
    pairs = probes.join(cells, join_keys).filter(F.col("id_q") != F.col("id_n"))
    d = F.aggregate(
        F.zip_with(F.col("vq"), F.col("vn"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("nq") * F.col("nn")
    scored = pairs.select(
        "id_q",
        "id_n",
        F.round(F.when(denom > 0, d / denom).otherwise(F.lit(0.0)), 6).alias("score"),
    )
    # a corpus vector lives in exactly one cell, so a neighbor can
    # surface at most once per query — no dedup agg needed
    w = Window.partitionBy("id_q").orderBy(F.col("score").desc(), F.col("id_n").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _lit_double_sql(x: float) -> str:
    """A double literal as ``CAST('<repr>' AS DOUBLE)`` — Python repr
    is shortest-round-trip and Spark's parser is correctly rounded, so
    the plan sees the bit-identical IEEE double (the
    sinks/annindex.py mechanism)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _lit_double_array_sql(xs: list) -> str:
    return "array(" + ", ".join(_lit_double_sql(float(x)) for x in xs) + ")"


def _literal_cell_packs_sql(cen: list) -> str:
    """SQL producing, over columns ``v`` (pre-cast double array) and
    ``nrm``, the ARRAY of ``_pack_score_id(round(cosine, 6), cid)``
    packs against the literal centroid set ``cen`` ([(cid,
    [double...], norm)]) — the exact per-centroid arithmetic of
    ``ivf_assign``'s broadcast crossJoin (same fold order, same
    rounding, same packing), one pack per centroid.  ``array_max``
    over it is the rank-1 cell argmax; a descending sort of it is the
    multi-probe order (score desc, cid asc — cid occupies the low
    bits inverted)."""
    mask21 = (1 << 21) - 1
    cids_sql = "array(" + ", ".join(str(c) for c, _, _ in cen) + ")"
    cvecs_sql = "array(" + ", ".join(_lit_double_array_sql(v) for _, v, _ in cen) + ")"
    cnorms_sql = _lit_double_array_sql([n for _, _, n in cen])
    return (
        f"transform(sequence(0, {len(cen) - 1}), i -> "
        f"CAST(round(round(CASE WHEN (nrm * element_at({cnorms_sql}, i + 1)) > 0 "
        f"THEN aggregate(zip_with(v, element_at({cvecs_sql}, i + 1), "
        "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        f" / (nrm * element_at({cnorms_sql}, i + 1)) "
        f"ELSE 0.0D END, 6) * 1000000.0D) AS BIGINT) * {1 << 21}"
        f" + ({mask21} - element_at({cids_sql}, i + 1)))"
    )


def _literal_code_sql(book: list, mi: int, d_sub: int) -> str:
    """SQL for subspace ``mi``'s PQ code over column ``v`` (pre-cast
    double array) against the literal codeword list ``book``
    ([(code, [double...])], sorted) — ``pq_encode``'s packed argmin
    verbatim: ``pmod(min(dist_micro·1024 + code), 1024)`` with
    ``_sub_dist_micro``'s round-then-cast arithmetic."""
    codes_sql = "array(" + ", ".join(str(int(c)) for c, _ in book) + ")"
    vecs_sql = "array(" + ", ".join(_lit_double_array_sql(s) for _, s in book) + ")"
    return (
        f"CAST(pmod(array_min(transform(sequence(0, {len(book) - 1}), j -> "
        f"CAST(round(aggregate(zip_with(slice(v, {mi * d_sub + 1}, {d_sub}), "
        f"element_at({vecs_sql}, j + 1), "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (a2, x) -> a2 + x)"
        " * 1000000.0D) AS BIGINT) * 1024"
        f" + element_at({codes_sql}, j + 1))), 1024) AS BIGINT)"
    )


def _literal_default_codebooks(
    corpus: DataFrame, dim: int, m: int, k_sub: int, vec_col: str, id_col: str
):
    """Collect the DEFAULT deterministic codebooks (subvectors of the
    ``k_sub`` lowest-id vectors) as plain values in ONE bounded job
    and rebuild the (m, code, sub) codebook frame as a LocalRelation
    from the same doubles.  Returns ``(books, codebooks_frame)`` —
    ``books`` is the per-subspace sorted [(code, [double...])] list —
    or ``(None, None)`` when the corpus has no codebook rows (callers
    fall back to the join formulation).  The doubles come from the
    same Spark-side ``as_double_array`` cast ``pq_codebooks`` applies;
    subvectors are plain slices (_subspace_rows)."""
    d_sub = dim // m
    base_rows = (
        corpus.filter(F.col(id_col) < k_sub)
        .select(
            F.col(id_col).alias("id"),
            as_double_array(F.col(vec_col)).alias("vd"),
        )
        .collect()
    )
    cb_vals: dict = {}
    for r in sorted(base_rows, key=lambda r: r["id"]):
        vd = list(r["vd"])
        for mi in range(m):
            cb_vals[(mi, int(r["id"]))] = vd[mi * d_sub : (mi + 1) * d_sub]
    books = [
        sorted((c, sub) for (mj, c), sub in cb_vals.items() if mj == mi)
        for mi in range(m)
    ]
    if not any(books):
        return None, None
    frame = (
        corpus.sparkSession.range(1)
        .selectExpr(
            "inline(array("
            + ", ".join(
                f"struct(CAST({mi} AS BIGINT) AS m,"
                f" CAST({int(c)} AS BIGINT) AS code,"
                f" {_lit_double_array_sql(sub)} AS sub)"
                for mi in range(m)
                for c, sub in books[mi]
            )
            + "))"
        )
    )
    return books, frame


def _literal_codes_frame(
    corpus: DataFrame, books: list, dim: int, m: int, vec_col: str, id_col: str
) -> DataFrame:
    """``pq_encode``-identical ``(id, m, code)`` rows computed in a
    single literal projection over an explicit-width exchange (r15,
    the knn_join_pq pattern — guide §2.4): the join formulation paid
    an m-way subspace explode + broadcast codebook join + packed
    argmin aggregate over the whole corpus for codewords that are
    index metadata.  The explicit repartition both parallelizes the
    per-row encode off a narrow scan and gives downstream id-keyed
    joins their partitioning.  Row identity is pinned by
    test_pq_adc_literal_codes_match_pq_encode."""
    d_sub = dim // m
    nparts = shuffle_partitions(corpus.sparkSession)
    return (
        corpus.repartition(nparts, F.col(id_col))
        .select(
            F.col(id_col),
            as_double_array(F.col(vec_col)).alias("v"),
        )
        .selectExpr(
            id_col,
            "inline(array("
            + ", ".join(
                f"struct(CAST({mi} AS BIGINT) AS m,"
                f" {_literal_code_sql(books[mi], mi, d_sub)} AS code)"
                for mi in range(m)
                if books[mi]
            )
            + "))",
        )
    )


def _literal_pq_stage_sql(
    cen: list, books: list, dim: int, m: int, bits: int
) -> tuple[str, str]:
    """SQL for the per-row (cell, packed-codes) stage over columns
    ``v`` (pre-cast double array) and ``nrm``, with the frozen
    quantizers inlined as literal arrays — the annindex encode
    expressions (sinks/annindex.py, pinned bit-identical to the
    ``ivf_assign`` + ``pq_encode`` join formulation by
    tests/test_annindex.py) parameterized for knn_join_pq's packing
    (``bits`` per code instead of 8).

    * cell — per centroid ``i``: ``round(round(score, 6)·1e6)`` over
      the same pre-cast doubles in the same left-to-right fold order
      as ``ivf_assign``, packed by ``_pack_score_id``'s arithmetic;
      ``array_max`` over distinct packs ≡ the crossJoin argmax.
    * codes — per subspace ``mi``: ``array_min`` over
      ``dist_micro·1024 + code`` replicates ``pq_encode``'s packed
      ``min`` (``_sub_dist_micro``'s round-then-cast, verbatim), and
      the fold of shiftlefts sums the identical packed BIGINT the old
      ``sum(code · 2^(mi·bits))`` aggregate built (non-overlapping
      bit ranges — order-exact integer addition).  Subspaces with an
      empty codebook are skipped, exactly as the encode join produced
      no row for them.

    ``cen``: [(cid, [double...], norm)]; ``books``: per-subspace
    sorted [(code, [double...])]."""

    arr = _lit_double_array_sql
    mask21 = (1 << 21) - 1
    cell_sql = (
        f"CAST({mask21} - pmod(array_max({_literal_cell_packs_sql(cen)}), "
        f"{1 << 21}) AS BIGINT)"
    )

    d_sub = dim // m
    cbcodes_sql = "array(" + ", ".join(
        "array(" + ", ".join(str(int(c)) for c, _ in bk) + ")" if bk else "array()"
        for bk in books
    ) + ")"
    cbvecs_sql = "array(" + ", ".join(
        "array(" + ", ".join(arr(s) for _, s in bk) + ")"
        if bk
        else "array(array(CAST(0.0 AS DOUBLE)))"
        for bk in books
    ) + ")"
    mis_sql = "array(" + ", ".join(
        str(mi) for mi in range(m) if books[mi]
    ) + ")"
    pk_sql = (
        f"CAST(aggregate({mis_sql}, 0L, (acc, mi) -> acc + "
        f"shiftleft(CAST(pmod(array_min(transform("
        f"sequence(0, size(element_at({cbcodes_sql}, mi + 1)) - 1), j -> "
        f"CAST(round(aggregate(zip_with(slice(v, mi * {d_sub} + 1, {d_sub}), "
        f"element_at(element_at({cbvecs_sql}, mi + 1), j + 1), "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (a2, x) -> a2 + x)"
        " * 1000000.0D) AS BIGINT) * 1024"
        f" + element_at(element_at({cbcodes_sql}, mi + 1), j + 1))), "
        f"1024) AS BIGINT), {bits} * mi)) AS BIGINT)"
    )
    return cell_sql, pk_sql


def knn_join_pq(
    emb: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 32,
    n_fine: int = 32,
    n_probe: int = 2,
    m: int = 8,
    k_sub: int = 16,
    rerank: int | None = None,
    max_cell: int | None = None,
    sub_codes: int = 0,
    code_probes: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """The SCALE path for the all-corpus kNN join: two-level IVF
    candidate cells + PQ symmetric-distance (SDC) candidate ranking +
    bounded exact re-rank.

    Why this shape wins at 100 TB: the LSH co-bucket join
    (:func:`knn_join`) and the raw IVF join (:func:`knn_join_ivf`)
    both pay a full-width dot product per candidate PAIR — the
    dominant cost, since pairs outnumber vectors by orders of
    magnitude, and every pair row carries two raw vectors through the
    shuffle.  Here candidate pairs are scored in the COMPRESSED
    domain (Jegou/Douze/Schmid PAMI'11, symmetric variant): each
    vector's ``m`` PQ codes pack into ONE long, the ``m · k_sub²``
    codeword-pair distance table enters the plan as literal arrays
    (index metadata — 2 KB at the defaults), and a pair's approximate
    distance is ``m`` codegen bit-extracts + array lookups.  No
    interpreted HOF per pair, no vectors in the pair shuffle (16
    bytes/row instead of ~1 KB).  Only the top-``rerank`` SDC
    candidates per query (default ``4k``) are re-scored with the
    exact cosine — ``N · rerank`` full-width dots instead of
    ``N · avg_cell · n_probe``.

    Candidate cells are the two-level IVF assignment of
    :func:`knn_join_ivf` (coarse broadcast centroids, fine lowest-id
    members per coarse cell): ``N · (n_centroids + n_fine)``
    assignment dots, ``n_centroids · n_fine`` effective cells.  The
    codebooks/centroids frames are the same ones
    :func:`write_ivfpq_index` materializes — a maintained IVF-PQ
    index feeds this join for free.  The one driver-side collect is
    the codebook (``m · k_sub`` rows — index metadata, never
    corpus-sized).

    ``sub_codes > 0`` arms the CODE SUB-SPLIT for corpora whose
    natural clusters overwhelm geometric cells (IVF cells can only be
    as fine as the centroid set; a tight million-vector cluster stays
    one giant cell and the co-cell pair count goes quadratic).  The
    first ``sub_codes`` PQ codes extend the cell key — cells split
    ``k_sub^sub_codes`` ways ALONG THE DATA's own quantization — and
    a query probes, per split code, only the ``code_probes`` nearest
    codewords to its own (nearness read off the SDC table
    driver-side: index metadata, zero extra passes).  Pair volume
    shrinks ~``(code_probes/k_sub)^sub_codes`` while close neighbors
    — whose codes agree or are adjacent by construction — stay
    co-probed; the recall trade is explicit and measured
    (tools/scale_probe.py).

    Returns ``(id_q, id_n, score, rank)`` — same contract as
    :func:`knn_join` (cosine, rounded 6, ties on id).
    """
    rerank = rerank or 4 * k
    bits = max(1, (k_sub - 1).bit_length())
    d_sub = dim // m
    cen: list | None = None
    cb: dict = {}
    if centroids is None and codebooks is None:
        # Default quantizers (lowest-id vectors / their subvectors):
        # both derive from the SAME `id < max(n_centroids, k_sub)`
        # rows, so ONE bounded collect feeds both — the separate
        # centroid and codebook collects each cost a full
        # analyze+plan+job round (measured: the two jobs were half the
        # warm query at sf0.1).  Derivations are bit-exact to the
        # frame expressions: the doubles come from the same Spark-side
        # as_double_array cast; the norm fold `acc = acc + x*x` then
        # sqrt is IEEE-identical to functions.vectors.norm's
        # left-to-right aggregate; codeword subvectors are plain
        # slices of the same doubles (_subspace_rows).
        base_rows = (
            emb.filter(F.col(id_col) < max(n_centroids, k_sub))
            .select(
                F.col(id_col).alias("id"),
                as_double_array(F.col(vec_col)).alias("vd"),
            )
            .collect()
        )
        cen = []
        for r in sorted(base_rows, key=lambda r: r["id"]):
            vid = int(r["id"])
            vd = list(r["vd"])
            if vid < n_centroids:
                acc = 0.0
                for x in vd:
                    acc = acc + x * x
                cen.append((vid, vd, math.sqrt(acc)))
            if vid < k_sub:
                for mi in range(m):
                    cb[(mi, vid)] = vd[mi * d_sub : (mi + 1) * d_sub]
    else:
        if centroids is None:
            centroids = emb.filter(F.col(id_col) < n_centroids)
        if codebooks is None:
            codebooks = pq_codebooks(emb, dim, m, k_sub, vec_col, id_col)
        # SDC inputs: ONE control-plane collect of the codebook frame.
        for r in codebooks.collect():
            cb[(int(r["m"]), int(r["code"]))] = list(r["sub"])

    # SDC table: squared-L2 micro-distance between every codeword pair
    # per subspace — m * k_sub^2 ints, literal arrays in the plan.
    sdc: list[list[int]] = []
    for mi in range(m):
        flat = []
        for c1 in range(k_sub):
            for c2 in range(k_sub):
                a = cb.get((mi, c1))
                b = cb.get((mi, c2))
                if a is None or b is None:
                    flat.append(0)
                    continue
                acc = 0.0
                for x, y in zip(a, b):
                    acc += (x - y) * (x - y)
                # floor(x+0.5), not Python round(): banker's rounding
                # would diverge from Spark/DuckDB half-up on exact .5
                flat.append(int(math.floor(acc * 1_000_000.0 + 0.5)))
        sdc.append(flat)

    # Frozen quantizers as PLAIN VALUES (r15 optimization round, the
    # annindex literal-encode pattern — guide §2.4/§7.3): centroids
    # and codebooks are index metadata (n_centroids / m·k_sub rows,
    # bounded at any corpus scale), and the SDC table above already
    # collects the codebooks.  The join-based formulation paid, PER
    # QUERY, two crossJoin+HashAggregate executions of the coarse
    # assignment, an m-way subspace explode + broadcast join + two
    # aggregates for the PQ encode, and two shuffle joins attaching
    # the packed codes back to the cell index — 8 Exchange / 11
    # BroadcastExchange / 2 SortMergeJoin / 14 scans in the plan.
    # Here cell + packed codes are computed in ONE map-side projection
    # whose literals re-enter via CAST('<repr>' AS DOUBLE) — Python
    # repr is shortest-round-trip and Spark's parser is correctly
    # rounded, so every double is bit-identical to the collected value
    # (sinks/annindex.py's proven mechanism; equality to the join
    # formulation pinned by test_knn_join_pq_literal_stage_matches_
    # join_formulation).
    if cen is None:
        from monstache_spark.functions.vectors import norm

        cen_rows = centroids.select(
            F.col(id_col).alias("cid"),
            as_double_array(F.col(vec_col)).alias("cvd"),
            norm(F.col(vec_col)).alias("nc"),
        ).collect()
        cen = [(int(r["cid"]), list(r["cvd"]), float(r["nc"])) for r in cen_rows]
    books: list[list] = [
        sorted((c, sub) for (mj, c), sub in cb.items() if mj == mi)
        for mi in range(m)
    ]
    if not cen or not any(books):
        # degenerate quantizers (empty centroid or codebook frame):
        # the join formulation produced zero rows everywhere
        empty = emb.select(
            F.col(id_col).alias("id_q"), F.col(id_col).alias("id_n")
        ).filter(F.lit(False))
        return empty.withColumn("score", F.lit(0.0)).withColumn(
            "rank", F.lit(0).cast("long")
        )
    cell_sql, pk_sql = _literal_pq_stage_sql(cen, books, dim, m, bits)

    # staged corpus frame: ONE explicit-width exchange (hash on id —
    # the partitioning every downstream consumer needs: the cell
    # argmax keys, the probe window, and the pair window are all
    # id-clustered, so no further corpus exchange plans), then cell +
    # packed codes per row in one codegen'd-schedule projection.
    nparts = shuffle_partitions(emb.sparkSession)
    staged = (
        emb.repartition(nparts, F.col(id_col))
        .select(
            F.col(id_col).alias("id"),
            as_double_array(F.col(vec_col)).alias("v"),
        )
        .withColumn("nrm", _norm_col(F.col("v")))
        .withColumn("ccell", F.expr(cell_sql))
        .withColumn("pk", F.expr(pk_sql))
    )
    wf = Window.partitionBy("ccell").orderBy(F.col("id").asc())
    fine_c = (
        staged.withColumn("_fr", F.row_number().over(wf))
        .filter(F.col("_fr") <= n_fine)
        .select(
            "ccell", F.col("_fr").alias("fcell"),
            F.col("v").alias("fv"), F.col("nrm").alias("fn"),
        )
    )
    fd = F.aggregate(
        F.zip_with(F.col("v"), F.col("fv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    fden = F.col("nrm") * F.col("fn")
    # pk rides the fine-scoring rows: it is functionally dependent on
    # id, so adding it to the argmax grouping keys keeps the SAME
    # groups (and the buffer stays primitive — HashAggregate), while
    # the old shape joined a separately-aggregated packed frame back
    # on id (a SortMergeJoin per side)
    fscored = staged.join(F.broadcast(fine_c), "ccell").select(
        "id", "ccell", "pk", "fcell",
        F.round(F.when(fden > 0, fd / fden).otherwise(F.lit(0.0)), 6).alias("fs"),
    )
    # packed-scalar argmax — struct ordering keys degrade to
    # SortAggregate (plan audit guards this)
    fpack = _pack_score_id(F.col("fs"), F.col("fcell"))
    cells_c = fscored.groupBy("id", "ccell", "pk").agg(
        F.max(fpack).alias("_fpk")
    ).select(
        F.col("id").alias("id_n"),
        "ccell",
        (F.lit((1 << 21) - 1) - F.pmod(F.col("_fpk"), F.lit(1 << 21)))
        .cast("int").alias("fcell"),
        F.col("pk").alias("pk_n"),
    )
    wp = Window.partitionBy("id").orderBy(F.col("fs").desc(), F.col("fcell").asc())
    probes_c = (
        fscored.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select(
            F.col("id").alias("id_q"), "ccell", "fcell",
            F.col("pk").alias("pk_q"),
        )
    )
    if max_cell is not None:
        keep = (
            cells_c.groupBy("ccell", "fcell")
            .agg(F.count("*").alias("_m"))
            .filter(F.col("_m") <= max_cell)
            .select("ccell", "fcell")
        )
        cells_c = cells_c.join(F.broadcast(keep), ["ccell", "fcell"])

    join_keys = ["ccell", "fcell"]
    if sub_codes > 0:
        mask_i = (1 << bits) - 1
        probe_side = probes_c
        for ci in range(sub_codes):
            # per-code probe lists: the code_probes nearest codewords
            # to each codeword of subspace ci, by the SDC table —
            # driver-side index metadata rendered as one literal
            # array-of-arrays
            near = []
            for c1 in range(k_sub):
                ranked = sorted(
                    range(k_sub), key=lambda c2: (sdc[ci][c1 * k_sub + c2], c2)
                )
                near.append(ranked[:code_probes])
            probe_map = F.array(
                *[F.array(*[F.lit(c) for c in row]) for row in near]
            )
            cq = F.shiftright(F.col("pk_n"), bits * ci).bitwiseAND(F.lit(mask_i))
            cells_c = cells_c.withColumn(f"sc{ci}", cq.cast("int"))
            pq_code = F.shiftright(F.col("pk_q"), bits * ci).bitwiseAND(
                F.lit(mask_i)
            )
            probe_side = probe_side.withColumn(
                f"sc{ci}",
                F.explode(F.element_at(probe_map, pq_code.cast("int") + F.lit(1))),
            )
            join_keys.append(f"sc{ci}")
        probes_c = probe_side

    # the packed cell index is ~16 bytes/vector — BROADCAST it, so
    # pair generation is map-side over the id-partitioned probe side
    # (probes_c inherits the staged frame's hash(id) partitioning —
    # no further exchange): no shuffle, no skew hotspot however fat a
    # cell is, and the downstream shortlist window finds each query's
    # pairs already co-partitioned by id_q (its partial group-limit
    # then cuts the window shuffle to ≤ rerank rows per query).  At
    # corpora where 16·N outgrows the broadcast budget, drop the
    # hint: the same equi-join shuffles on the cell key instead.
    pairs = probes_c.join(
        F.broadcast(cells_c), join_keys
    ).filter(F.col("id_q") != F.col("id_n"))
    mask = F.lit((1 << bits) - 1)
    d_micro: Column = F.lit(0).cast("long")
    for mi in range(m):
        cq = F.shiftright(F.col("pk_q"), bits * mi).bitwiseAND(mask)
        cn = F.shiftright(F.col("pk_n"), bits * mi).bitwiseAND(mask)
        tbl = F.array(*[F.lit(x) for x in sdc[mi]])
        d_micro = d_micro + F.element_at(tbl, (cq * k_sub + cn + 1).cast("int"))
    cand = pairs.select("id_q", "id_n", d_micro.alias("d_micro"))
    wc = Window.partitionBy("id_q").orderBy(
        F.col("d_micro").asc(), F.col("id_n").asc()
    )
    shortlist = (
        cand.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= rerank)
        .select("id_q", "id_n")
    )

    # exact re-rank of the bounded shortlist (N·rerank full-width dots)
    vecs = emb.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    ).withColumn("nrm", _norm_col(F.col("v")))
    qside = vecs.select(
        F.col("id").alias("id_q"), F.col("v").alias("vq"), F.col("nrm").alias("nq")
    )
    nside = vecs.select(
        F.col("id").alias("id_n"), F.col("v").alias("vn"), F.col("nrm").alias("nn")
    )
    joined = shortlist.join(qside, "id_q").join(nside, "id_n")
    dd = F.aggregate(
        F.zip_with(F.col("vq"), F.col("vn"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("nq") * F.col("nn")
    scored = joined.select(
        "id_q",
        "id_n",
        F.round(F.when(denom > 0, dd / denom).otherwise(F.lit(0.0)), 6).alias("score"),
    )
    w = Window.partitionBy("id_q").orderBy(F.col("score").desc(), F.col("id_n").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def knn_join(
    emb: DataFrame,
    k: int = 5,
    dim: int = 64,
    bits: int = 6,
    n_tables: int = 1,
    max_bucket: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch ANN: the top-``k`` cosine neighbors of EVERY vector (the
    all-corpus kNN join behind semantic dedup maps, embedding-space
    visualization, and graph construction) — approximate via LSH
    co-bucketing, never the O(N²) cross join.

    Each vector lands in one sign-sketch bucket per hash table
    (disjoint hyperplane families, OR-amplified recall as in
    :func:`lsh_topk`); candidates are co-bucket pairs via a self
    equi-join on (table, bucket); scores dedupe across tables with ONE
    hash agg (identical per table, so ``max`` is exact); per-vector
    top-k is a window over candidate rows partitioned by the query id.

    Scale guards, in the same spirit as dedup's bounded LSH: vector
    norms are computed ONCE per bucket row, so per-pair work is a
    single dot product (same arithmetic and rounding as
    ``cosine_rounded`` — norms just move before the join); and
    ``max_bucket``, when set, drops co-bucket lists larger than the
    cap (clustered corpora skew sign buckets — measured: a 50x corpus
    at +log2(50) bits still produced a 651-member bucket).  Dropped
    buckets lose those vectors' candidates, exactly like an IVF probe
    bound; raise ``bits`` or ``max_bucket`` to trade cost for recall.

    Returns ``(id_q, id_n, score, rank)``.
    """
    frames = []
    for t in range(n_tables):
        v = as_double_array(F.col(vec_col))
        nv = F.sqrt(
            F.aggregate(
                F.zip_with(v, v, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        frames.append(
            emb.select(
                F.col(id_col).alias("id"),
                v.alias("v"),
                nv.alias("nv"),
                lsh_bucket(F.col(vec_col), dim, bits, t).alias("bucket"),
                F.lit(t).alias("tbl"),
            )
        )
    b = frames[0]
    for f in frames[1:]:
        b = b.unionByName(f)
    if max_bucket is not None:
        keep = (
            b.groupBy("tbl", "bucket")
            .agg(F.count("*").alias("_m"))
            .filter(F.col("_m") <= max_bucket)
            .select("tbl", "bucket")
        )
        b = b.join(F.broadcast(keep), ["tbl", "bucket"])
    a = b.select(
        F.col("tbl"), F.col("bucket"),
        F.col("id").alias("id_q"), F.col("v").alias("vq"), F.col("nv").alias("nq"),
    )
    c = b.select(
        F.col("tbl"), F.col("bucket"),
        F.col("id").alias("id_n"), F.col("v").alias("vn"), F.col("nv").alias("nn"),
    )
    pairs = a.join(c, ["tbl", "bucket"]).filter(F.col("id_q") != F.col("id_n"))
    d = F.aggregate(
        F.zip_with(F.col("vq"), F.col("vn"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("nq") * F.col("nn")
    scored = pairs.select(
        "id_q",
        "id_n",
        F.round(
            F.when(denom > 0, d / denom).otherwise(F.lit(0.0)), 6
        ).alias("score"),
    )
    dedup = scored.groupBy("id_q", "id_n").agg(F.max("score").alias("score"))
    w = Window.partitionBy("id_q").orderBy(F.col("score").desc(), F.col("id_n").asc())
    return (
        dedup.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# quantized vectors: bit (hamming) and int8 — the modern ES
# dense_vector element_type: bit / int8 surface (and the BBQ-style
# binary-quantization scale path every production vector index ships)
# ---------------------------------------------------------------------------

# distinct powers of two as SIGNED 64-bit literals (bit 63 is the sign
# bit in two's complement — both engines agree on the representation)
_BIT_POWERS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def _sign_mask(vec: Column) -> Column:
    """Pack the per-dimension sign bits of a ≤64-dim vector into ONE
    BIGINT: bit i set iff ``vec[i] > 0``.  A zip against the literal
    power table + a bitwise-OR fold — pure codegen, no UDF, and the
    DuckDB mirror is the identical list_transform/list_reduce fold.

    Vectors longer than 64 dims raise at execution time (ADVICE r9:
    zip_with pads the short side with NULLs, so a positive component
    past index 63 would otherwise silently poison the OR-fold to NULL
    and downstream hamming kNN would rank on NULL distances)."""
    powers = F.array(*[F.lit(p).cast("long") for p in _BIT_POWERS])
    bits = F.zip_with(
        vec,
        powers,
        lambda x, p: F.when(x > 0, p).otherwise(F.lit(0).cast("long")),
    )
    mask = F.aggregate(
        bits, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b)
    )
    return F.when(vec.isNull() | (F.size(vec) <= 64), mask).otherwise(
        F.raise_error(
            F.concat(
                F.lit("_sign_mask: vector has "),
                F.size(vec).cast("string"),
                F.lit(" dims; the bit-packed code holds at most 64"),
            )
        ).cast("long")
    )


def binary_quantize(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """ES ``element_type: bit`` / binary quantization (BBQ): each
    ≤64-dim vector becomes one BIGINT sign mask plus its popcount —
    a 256x storage cut at dim=64 (float32 → 1 bit/dim), the standard
    first-stage filter of a two-phase (hamming shortlist → exact
    re-rank) vector pipeline.  One projection, no shuffle.  Returns
    ``(id, code, n_bits)``."""
    code = _sign_mask(F.col(vec_col))
    return emb.select(
        F.col(id_col),
        code.alias("code"),
        F.bit_count(code).cast("long").alias("n_bits"),
    )


def hamming_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """kNN by HAMMING distance over binary-quantized vectors — ES's
    ``knn`` with ``element_type: bit`` (Lucene's hamming similarity):
    shortlist = bit_count(xor(code, query_code)) ascending, ties on
    id.  The query row broadcasts; the corpus scan stays a projection
    + TakeOrderedAndProject — distance is TWO instructions per vector
    (xor + popcount) on packed words, the whole point of the bit
    representation at 100 TB.  Returns ``(vec_id, hamming, rank)``,
    integers only (no float contract needed)."""
    codes = binary_quantize(emb, vec_col, id_col)
    q = F.broadcast(
        codes.filter(F.col(id_col) == query_vec_id).select(
            F.col("code").alias("q_code")
        )
    )
    scored = (
        codes.filter(F.col(id_col) != query_vec_id)
        .crossJoin(q)
        .select(
            id_col,
            F.bit_count(F.col("code").bitwiseXOR(F.col("q_code")))
            .cast("long")
            .alias("hamming"),
        )
    )
    ranked = scored.orderBy(F.col("hamming").asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("hamming").asc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def query_sign_mask(vec: list[float]) -> int:
    """Python rendering of :func:`_sign_mask` for a LITERAL query
    vector: bit i set iff ``vec[i] > 0``, returned as the SIGNED
    64-bit value both engines store (bit 63 is the sign bit)."""
    if len(vec) > 64:
        raise ValueError("query vector exceeds 64 dims")
    m = 0
    for i, x in enumerate(vec):
        if x > 0:
            m |= 1 << i
    return m - (1 << 64) if m >= (1 << 63) else m


def maxsim_inv_hamming_topk(
    doc_vecs: DataFrame,
    query_vectors: list[list[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    num_bits: int = 64,
) -> DataFrame:
    """ES ``rank_vectors`` with ``element_type: bit`` — the
    ``maxSimInvHamming`` late-interaction rank feature (ES 8.16+,
    the BBQ analogue of :func:`maxsim_topk`): documents carry
    MULTIPLE bit vectors (one row per (doc, vector), sign-mask packed
    by :func:`_sign_mask`); per pair the inverse-hamming similarity is
    ``(num_bits − hamming) / num_bits`` (ES's bit-vector similarity),
    ``score(doc) = Σ_q max_v inv_hamming(q, v)``; ``num_bits`` is the
    vector dimensionality (= mask bit width — pass it for sub-64-dim
    vectors so a full mismatch scores 0.0, not (64−dim)/64).

    Plan shape mirrors maxsim_topk: the Q query MASKS are Python-side
    literals (:func:`query_sign_mask`), so the Q xor+popcount
    similarities are ONE codegen projection per (doc, vector) row; the
    per-query maxes collapse in ONE hash agg per doc; top-k is
    TakeOrderedAndProject.  At 100 TB phase 1 reads ONE BIGINT per
    stored vector — 1/256th of the float bytes — and every similarity
    is exact binary arithmetic ((64−h)/64 is a dyadic rational), so
    the contract needs no rounding clause.  Returns
    ``(id, score, rank)``."""
    if not query_vectors:
        raise ValueError("query_vectors must be non-empty")
    if not 0 < num_bits <= 64:
        raise ValueError("num_bits must be in 1..64")
    if any(len(q) != num_bits for q in query_vectors):
        raise ValueError("every query vector must have num_bits dims")
    code = _sign_mask(as_double_array(F.col(vec_col)))
    sims = []
    nb = float(num_bits)
    for qi, qvec in enumerate(query_vectors):
        qm = F.lit(query_sign_mask(qvec)).cast("long")
        h = F.bit_count(code.bitwiseXOR(qm)).cast("double")
        sims.append(((F.lit(nb) - h) / F.lit(nb)).alias(f"_s{qi}"))
    per_vec = doc_vecs.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), *sims
    )
    maxes = per_vec.groupBy(id_col).agg(
        *[F.max(f"_s{qi}").alias(f"_m{qi}") for qi in range(len(query_vectors))]
    )
    total = F.lit(0.0)
    for qi in range(len(query_vectors)):
        total = total + F.col(f"_m{qi}")
    scored = maxes.select(F.col(id_col), total.alias("score"))
    ranked = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def int8_quantize(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ES ``element_type: int8`` scalar quantization: per-DIMENSION
    corpus min/max (one 1-row aggregate, broadcast) scale each value
    to an integer code in [0, 255] — ``floor((x - min_d) * 255 /
    (max_d - min_d))``, clamped, constant dimensions coding to 0.
    Codes are exact integers, so every downstream contract
    (dot products, top-k) is engine-exact with NO rounding clause.
    Returns ``(id, codes array<long>)``."""
    v = as_double_array(F.col(vec_col))
    stats = emb.agg(
        F.array(*[F.min(v[i]) for i in range(dim)]).alias("mins"),
        F.array(*[F.max(v[i]) for i in range(dim)]).alias("maxs"),
    )
    ranges = stats.select(
        "mins",
        F.zip_with("maxs", "mins", lambda hi, lo: hi - lo).alias("spans"),
    )
    scaled = emb.crossJoin(F.broadcast(ranges)).select(
        F.col(id_col),
        F.zip_with(
            v,
            F.zip_with(
                "mins", "spans", lambda lo, sp: F.struct(lo.alias("lo"), sp.alias("sp"))
            ),
            lambda x, s: F.when(
                s["sp"] > 0,
                F.least(
                    F.lit(255).cast("long"),
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.floor((x - s["lo"]) * F.lit(255.0) / s["sp"]).cast("long"),
                    ),
                ),
            ).otherwise(F.lit(0).cast("long")),
        ).alias("codes"),
    )
    return scaled


def int8_topk(
    emb: DataFrame,
    query_vec_id: int,
    dim: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """kNN by integer dot product over int8-quantized codes — the ES
    int8-HNSW scoring primitive, exact across engines because every
    term is an integer (quantization already absorbed the float
    noise).  Query row broadcasts; one corpus projection +
    TakeOrderedAndProject.  Returns ``(vec_id, dot, rank)``."""
    codes = int8_quantize(emb, dim, vec_col, id_col)
    q = F.broadcast(
        codes.filter(F.col(id_col) == query_vec_id).select(
            F.col("codes").alias("q_codes")
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("codes"), F.col("q_codes"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.filter(F.col(id_col) != query_vec_id)
        .crossJoin(q)
        .select(id_col, dot.alias("dot"))
    )
    ranked = scored.orderBy(F.col("dot").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("dot").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def hamming_rerank_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    shortlist: int = 40,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """TWO-PHASE vector search — the production shape of every
    binary-quantized index (ES BBQ, FAISS binary + refine): phase 1
    shortlists ``shortlist`` candidates by hamming distance over the
    1-bit codes (xor + popcount, touches only packed words), phase 2
    re-ranks ONLY the shortlist by exact cosine against the original
    float vectors and keeps ``k``.  At 100 TB phase 1 reads 1/256th
    of the vector bytes and phase 2 is O(shortlist) — the float
    corpus is joined back BY ID for the shortlist rows only, so full
    vectors never move for non-candidates.

    Returns ``(vec_id, hamming, score, rank)`` — hamming from the
    shortlist phase, rounded-cosine score from the re-rank.
    """
    short = hamming_topk(emb, query_vec_id, shortlist, vec_col, id_col)
    vecs = emb.select(F.col(id_col), F.col(vec_col))
    q = F.broadcast(
        emb.filter(F.col(id_col) == query_vec_id).select(
            as_double_array(F.col(vec_col)).alias("q_vec")
        )
    )
    # the shortlist is k-sized (control plane): broadcast it into the
    # id join so the float corpus is semi-joined, never shuffled
    cand = vecs.join(F.broadcast(short.select(id_col, "hamming")), id_col)
    scored = cand.crossJoin(q).select(
        id_col,
        "hamming",
        cosine_rounded(as_double_array(F.col(vec_col)), F.col("q_vec")).alias(
            "score"
        ),
    )
    ranked = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))
