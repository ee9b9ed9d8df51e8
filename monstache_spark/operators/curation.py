"""Corpus-curation operators for the training-data pipeline extensions.

The reference engine (monstache) defers all per-document computation to
user JS (monstache.go:1000-1037); a 100 TB training-data pipeline needs
these as first-class, declarative operators instead. Everything here is
built from JVM-side ``pyspark.sql.functions`` so the hot path stays
inside whole-stage codegen — no Python in the per-row loop.

Scale notes (100 TB / 1000 executors):

* Shuffles carry fixed-width hashes or (doc_id, count) pairs — never
  document text. The only wide exchanges are groupBys on 8-byte gram
  hashes.
* The benchmark side of decontamination is broadcast (benchmarks are
  small by definition), so the corpus never shuffles for it.
* Sequence packing windows are bounded by an explicit shard count per
  stratum — there is no global-order window anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from monstache_spark.functions.text import shingle_hash, token_count, tokens
from monstache_spark.operators.dedup import shingle_rows

def _gram_hash_rows(
    docs: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    hasher: Callable[[Column], Column] | None,
    distinct: bool,
) -> DataFrame:
    """(id, gram-hash) rows via the exploded-row shingle formulation
    (dedup.shingle_rows — measured ~3.5x faster than the interpreted
    array-HOF form, which Catalyst re-inlines into every consumer).

    The gram string is hashed BEFORE any distinct/shuffle so every
    exchange carries 16-byte rows; ``distinct`` therefore dedupes on
    the hash (an md5-derived ``hasher`` lets external oracles
    reproduce collision behavior exactly; default xxhash64).
    """
    h = hasher if hasher is not None else F.xxhash64
    rows = shingle_rows(docs, text_col, id_col, k=n, distinct=False)
    out = rows.select(F.col(id_col), h(F.col("s")).alias("gh"))
    return out.distinct() if distinct else out


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

#: Redaction order matters where patterns could overlap (an email body
#: contains digits and dots); apply in this exact order on every engine.
#: Patterns restrict themselves to the regex subset with identical
#: semantics in Java regex and RE2 (no lookaround, no backrefs, ASCII
#: word boundaries, explicit [0-9] classes).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII hit counts (``regexp_count`` stays in codegen).

    Counts are taken on the *unredacted* text, each pattern
    independently; overlap resolution only matters for the rewrite.
    """
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its typed placeholder, in the
    pinned PII_PATTERNS order (email → ssn → phone → ipv4)."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# Cross-document boilerplate detection (C4-style repeated-span removal)
# ---------------------------------------------------------------------------


def boilerplate_stats(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Per-document boilerplate exposure: how many of a doc's distinct
    word ``n``-grams occur in at least ``min_docs`` distinct documents.

    The C4/RefinedWeb recipe drops or trims spans that repeat across
    many pages (nav bars, license footers). This is the measurement
    half, per document: ``n_grams`` (distinct n-grams), ``n_boiler``
    (of those, how many are corpus-boilerplate) and ``boiler_bp``
    (basis points, integer floor — representation-stable for oracles).

    Scale: the gram string is hashed to a fixed-width BIGINT *before*
    any shuffle (``hasher``, default ``xxhash64``), so both groupBys
    exchange 16-byte rows regardless of document size. Pass an
    md5-derived hasher only when an external oracle must reproduce the
    hash (md5 measures ~2x slower than xxhash64).
    """
    grams = _gram_hash_rows(docs, n, text_col, id_col, hasher, distinct=True)
    # distinct doc counts per gram hash; one shuffle on the 8-byte hash
    boiler = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gh")
    )
    per_doc = grams.join(boiler.withColumn("_b", F.lit(1)), "gh", "left").groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.count("_b").alias("n_boiler"),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_boiler",
        F.floor(F.col("n_boiler") * 10000 / F.col("n_grams")).cast("long").alias("boiler_bp"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (test-set overlap)
# ---------------------------------------------------------------------------


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with a
    benchmark/evaluation set (the GPT-3/PaLM decontamination rule:
    13-gram collision ⇒ contaminated; ``n`` is a parameter because the
    right value depends on tokenizer granularity).

    Returns one row per ``docs`` document: ``n_hits`` (distinct
    colliding n-grams, BIGINT) and ``contaminated`` (0/1 BIGINT).

    Scale: the benchmark gram set is broadcast — benchmarks are
    O(thousands of documents) while the corpus is O(billions), so the
    corpus side never shuffles; the plan is scan → hash → broadcast
    left join → partial-agg groupBy on ``doc_id``.
    """
    bench_grams = (
        _gram_hash_rows(benchmark, n, text_col, id_col, hasher, distinct=False)
        .select("gh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = _gram_hash_rows(docs, n, text_col, id_col, hasher, distinct=True)
    return (
        doc_grams.join(F.broadcast(bench_grams), "gh", "left")
        .groupBy(id_col)
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            id_col,
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") > 0).cast("long").alias("contaminated"),
        )
    )


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents that NEAR-duplicate any benchmark
    document — MinHash band collision instead of exact n-gram overlap.
    The fuzzy complement to :func:`decontaminate` (the Dolma/FineWeb
    practice): a paraphrased or lightly perturbed benchmark leak
    shares few exact 13-grams but still collides on MinHash bands,
    which fire at roughly Jaccard ≥ (1/num_bands)^(num_bands/
    num_hashes).

    One row per ``docs`` document: ``n_hit_bands`` (how many of its
    ``num_bands`` band keys appear anywhere in the benchmark, BIGINT)
    and ``contaminated`` (0/1 BIGINT, any collision). Compose
    ``dedup.ngram_jaccard_pairs`` downstream when a verified
    similarity score is needed per (train, bench) pair.

    Scale: the benchmark's band-key set is ``|benchmark| * num_bands``
    strings — broadcast; the corpus side reduces to ``num_hashes``
    longs per document before its only exchange (the signature
    min-aggregate), then probes the broadcast set. The corpus text is
    never shuffled and no corpus-corpus join exists."""
    from monstache_spark.operators.dedup import minhash_band_rows

    bench = F.broadcast(
        minhash_band_rows(benchmark, text_col, id_col, num_hashes, num_bands, shingle_k)
        .select("band")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = minhash_band_rows(docs, text_col, id_col, num_hashes, num_bands, shingle_k)
    return (
        train.join(bench, "band", "left")
        .groupBy(id_col)
        .agg(F.count("_hit").cast("long").alias("n_hit_bands"))
        .select(
            id_col,
            "n_hit_bands",
            (F.col("n_hit_bands") > 0).cast("long").alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Within-document repetition (quality signal)
# ---------------------------------------------------------------------------


def repetition_stats(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Duplicate n-gram fraction per document — the repetition signal
    used by Gopher/MassiveText quality filtering (high duplicate-gram
    share ⇒ degenerate or templated text).

    Emits ``n_grams`` (total, sliding), ``n_distinct`` and ``dup_bp``
    (duplicated fraction in basis points, integer floor).

    Scale: grams explode to rows and immediately reduce by
    ``(doc_id, gram-hash)`` — map-side partial aggregation collapses
    each document's repeats before the exchange, so shuffle volume is
    bounded by distinct grams, not text size.
    """
    grams = _gram_hash_rows(docs, n, text_col, id_col, hasher, distinct=False)
    per_gram = grams.groupBy(id_col, "gh").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_distinct",
        F.floor((F.col("n_grams") - F.col("n_distinct")) * 10000 / F.col("n_grams"))
        .cast("long")
        .alias("dup_bp"),
    )


# ---------------------------------------------------------------------------
# Cross-document span dedup (the C4 rewrite rule)
# ---------------------------------------------------------------------------


def dedup_spans(
    docs: DataFrame,
    w: int = 16,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite documents by removing repeated spans — the C4 rule
    ("discard all but one of any three-sentence span occurring more
    than once") adapted to untyped text: each document splits into
    consecutive ``w``-token chunks, every occurrence of a chunk that
    appears ≥ ``min_count`` times corpus-wide is dropped EXCEPT the
    corpus-first one (smallest ``(doc_id, chunk_pos)``), and the
    document is rebuilt from its surviving chunks.

    Unlike :func:`boilerplate_stats` (the measurement half), this is
    the transform half: it returns the corpus itself, rewritten —
    ``(doc_id, text, n_chunks, n_dropped)``, empty string for fully
    deduplicated documents.

    Scale: duplicate decisions travel as ``(ch, doc_id, cpos)`` rows —
    the census groupBy and the decision join key on the 8-byte chunk
    hash and never carry chunk text. Text shuffles exactly once, in the
    final join of per-doc drop lists back onto the original documents
    (keyed on ``id_col``, which parquet bucketing can co-locate). The
    rebuild is a single indexed-lambda filter over the chunk array with
    one consumer, so projection collapse cannot re-inline it anywhere
    else.
    """
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(w)).cast("long")
    chunk_arr = F.when(F.size(toks) > 0, F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, (i * w + 1).cast("int"), w), " "),
    )).otherwise(F.array().cast("array<string>"))

    # The corpus-first occurrence is min over (doc_id, cpos) — packed
    # into ONE BIGINT (doc_id << 20 | cpos) because a struct in the
    # aggregation buffer silently degrades the census to SortAggregate
    # (full map-side sort). Order-preserving for non-negative ids and
    # cpos < 2^20 (≈8M tokens/doc at w=8).
    #
    # Stage the (id, cpos, ch, pk) rows ONCE: they are consumed twice
    # (census aggregate + decision join) and the tokenize/chunk HOF
    # that produces them is the dominant per-row cost — without the
    # checkpoint the whole chunking re-executes per consumer (HOFs get
    # no subexpression elimination), and over a single small parquet
    # file it re-executes on ONE core (guide §2.2/§2.5).  The spread
    # is scale-adaptive (no-op on a production-width scan); the
    # checkpoint rows are 32 bytes each — far smaller than the chunk
    # text they replace.  Join strategies stay AQE-decided (no
    # broadcast hints): at corpus scale census/drops can be huge.
    from monstache_spark.session import spread_scan

    docs = spread_scan(docs)
    rows = docs.select(
        F.col(id_col), F.posexplode(chunk_arr).alias("cpos", "chunk")
    ).select(
        id_col,
        "cpos",
        F.xxhash64("chunk").alias("ch"),
        (F.col(id_col).cast("long") * (1 << 20) + F.col("cpos")).alias("pk"),
    ).localCheckpoint(eager=True)
    census = (
        rows.groupBy("ch")
        .agg(F.count("*").alias("n_occ"), F.min("pk").alias("keep"))
        .filter(F.col("n_occ") >= min_count)
        .select("ch", "keep")
    )
    drops = (
        rows.join(census, "ch")
        .filter(F.col("pk") != F.col("keep"))
        .groupBy(id_col)
        .agg(F.collect_set("cpos").alias("_dp"))
    )
    dp = F.col("_dp")
    kept_arr = F.when(
        dp.isNull(), chunk_arr
    ).otherwise(F.filter(chunk_arr, lambda c, i: ~F.array_contains(dp, i.cast("int"))))
    return docs.join(drops, id_col, "left").select(
        id_col,
        F.array_join(kept_arr, " ").alias(text_col),
        n_chunks.alias("n_chunks"),
        F.coalesce(F.size(dp).cast("long"), F.lit(0).cast("long")).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff its
    md5-derived bucket (0..9999) falls below ``rates[stratum] * 10000``.

    This is how a data-mixing stage rebalances languages/domains
    (downsample the dominant crawl language, keep the tail) while
    staying reproducible: membership depends only on (seed, id), never
    on partitioning, row order, or cluster size — unlike
    ``df.sample()``, which is seed-and-split dependent.

    Scale: pure narrow projection + filter; no shuffle at all.
    """
    bucket = F.pmod(shingle_hash(F.col(id_col).cast("string"), seed), F.lit(10000))
    thresh = F.lit(int(default_rate * 10000))
    expr = thresh
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(stratum_col) == stratum, F.lit(int(rate * 10000))).otherwise(expr)
    return docs.filter(bucket < expr).select(
        id_col, stratum_col, bucket.cast("long").alias("bucket")
    )


def render_chat(
    docs: DataFrame,
    messages_col: str = "messages",
    id_col: str = "doc_id",
) -> DataFrame:
    """SFT-sample rendering: turn a conversation column
    (``array<struct<role, content>>``) into the training text plus the
    LOSS-MASK spans — the character intervals covering assistant
    CONTENT, which is what supervised fine-tuning actually trains on
    (everything else is masked out of the loss).

    Template is the ChatML shape::

        <|im_start|>{role}\\n{content}<|im_end|>\\n

    per message, concatenated in order.  The span arithmetic is ONE
    ``F.aggregate`` fold over the message array carrying a
    ``(text, spans)`` struct accumulator — a single codegen-free but
    JVM-side expression per row, no explode, no shuffle, no Python.
    Offsets are 0-based character positions, end-exclusive, computed
    from running lengths — so they are exact for any engine that
    concatenates the same template (the oracle rebuilds them with
    prefix sums).

    Returns ``(id, text, assistant_spans array<struct<s,e>>,
    n_turns, assistant_chars)``.
    """
    footer = "<|im_end|>\n"

    def merge(acc, m):
        pre = F.concat(
            acc["text"], F.lit("<|im_start|>"), m["role"], F.lit("\n")
        )
        start = F.length(pre)
        end = start + F.length(m["content"])
        new_text = F.concat(pre, m["content"], F.lit(footer))
        span = F.struct(start.alias("s"), end.alias("e"))
        new_spans = F.when(
            m["role"] == F.lit("assistant"),
            F.concat(acc["spans"], F.array(span)),
        ).otherwise(acc["spans"])
        return F.struct(new_text.alias("text"), new_spans.alias("spans"))

    init = F.struct(
        F.lit("").alias("text"),
        F.array().cast("array<struct<s:int,e:int>>").alias("spans"),
    )
    folded = F.aggregate(F.col(messages_col), init, merge)
    return docs.select(
        F.col(id_col),
        folded["text"].alias("text"),
        folded["spans"].alias("assistant_spans"),
        F.size(messages_col).cast("long").alias("n_turns"),
        F.aggregate(
            folded["spans"],
            F.lit(0),
            lambda a, sp: a + (sp["e"] - sp["s"]),
        ).cast("long").alias("assistant_chars"),
    )


def cluster_balanced_sample(
    emb: DataFrame,
    per_cluster_cap: int,
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> DataFrame:
    """Topic-balanced sampling over LEARNED strata — the DataComp /
    SemDeDup-style recipe: assign each embedding to its nearest
    centroid cell (rounded-cosine argmax) and keep at most
    ``per_cluster_cap`` members per cell, chosen by a deterministic
    md5-hash order.  A dominant topic cluster (the crawl's boilerplate
    mass) is capped while tail clusters survive whole —
    cluster-proportional flattening, the embedding-space analogue of
    :func:`domain_cap`.

    Membership depends only on (seed, id) and the frozen centroid set
    — never on partitioning, row order, or cluster size — so the
    sample is reproducible and incrementally stable (a re-run over a
    grown corpus keeps every previously-picked id whose hash rank
    still clears the cap).

    Default centroids are the ``n_centroids`` lowest-id vectors (the
    deterministic oracle-reproducible convention shared with
    ``ivf_topk``); pass ``kmeans_centroids(...)`` for learned
    production cells — same plan shape either way.

    Plan: ONE broadcast-centroid assignment argmax (hash agg with
    map-side combine) + one per-cell window whose cap pushes into the
    sort as WindowGroupLimit.  Returns ``(id, cell, pick_rank)``.
    """
    from monstache_spark.operators.similarity import ivf_assign

    if centroids is None:
        centroids = emb.filter(F.col(id_col) < n_centroids)
    cells = ivf_assign(emb, centroids, vec_col, id_col, rank_limit=1).select(
        id_col, F.col("cid").alias("cell")
    )
    h = shingle_hash(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy("cell").orderBy(h.asc(), F.col(id_col).asc())
    return (
        cells.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("pick_rank") <= per_cluster_cap)
        .select(id_col, "cell", "pick_rank")
    )


def mixture_stats(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Per-(source, lang) corpus composition: document count, token
    count, and token share in basis points — the inputs a data-mixing
    stage needs to set sampling weights.

    The corpus total is a lazy one-row aggregate cross-joined back in
    (broadcast of a single row), so the whole statistic is one plan
    with map-side partial aggregation — no driver-side ``.collect()``
    and no second pass over the data.
    """
    toks = docs.select(*group_cols, token_count(F.col(text_col)).cast("long").alias("nt"))
    agg = toks.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    )
    total = agg.agg(F.sum("n_tokens").cast("long").alias("_tot"))
    return agg.crossJoin(F.broadcast(total)).select(
        *group_cols,
        "n_docs",
        "n_tokens",
        F.floor(F.col("n_tokens") * 10000 / F.col("_tot")).cast("long").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# Document chunking (overlapping token windows for training / retrieval)
# ---------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping ``window``-token chunks at
    ``stride``-token steps — the window-split that turns curated
    documents into fixed-size training samples or retrieval passages
    (stride < window gives the standard overlapping-context layout;
    stride == window gives disjoint chunks).

    Chunk ``i`` covers tokens [i*stride+1, i*stride+window];
    ``n_chunks = 1 + ceil(max(n_tokens - window, 0) / stride)`` for
    non-empty docs (the final chunk may be short), 0 for empty docs.
    Output: (id, chunk_id, chunk, n_tokens).

    Scale: a narrow per-row transform — no shuffle, no corpus-wide
    state; parallelism is the scan's (with a single small input file,
    repartition upstream — see dedup._spread for why byte-sized scan
    partitions mis-size row-amplifying transforms). Each chunk string
    is built exactly once: the struct array has one consumer
    (posexplode), so Catalyst's projection collapse cannot re-inline
    the slices into multiple evaluation sites."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n == 0, F.lit(0).cast("long")).otherwise(
        F.lit(1).cast("long")
        + F.ceil(F.greatest(n - window, F.lit(0)) / F.lit(stride)).cast("long")
    )
    chunk_structs = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(F.slice(toks, (i * stride + 1).cast("int"), window), " ").alias("c"),
            F.size(F.slice(toks, (i * stride + 1).cast("int"), window))
            .cast("long")
            .alias("nt"),
        ),
    )
    rows = docs.filter(n_chunks > 0).select(
        F.col(id_col), F.posexplode(chunk_structs).alias("chunk_id", "_ch")
    )
    return rows.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("_ch.c").alias("chunk"),
        F.col("_ch.nt").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Per-domain document caps (web-corpus domain balancing)
# ---------------------------------------------------------------------------


def cap_per_domain(
    docs: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 17,
    n_salts: int = 8,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen by a
    deterministic per-document priority (md5-derived) with id
    tie-break — the per-domain cap every web-scale corpus applies so
    that a single mega-site cannot dominate the training mixture
    (RefinedWeb/C4 both cap URL-host contributions).

    Returns the surviving ``(id, domain, priority, rk)`` rows,
    ``rk`` ∈ 1..cap within each domain.

    Scale: a single ``row_number`` over the domain partition would
    serialize a mega-domain (tens of millions of pages from one host)
    through one task — exactly the worst skew case. Instead the rank
    runs in two stages: documents first rank within
    ``(domain, salt)`` — ``n_salts`` deterministic shards per domain —
    and only per-salt survivors (≤ ``n_salts × cap`` rows per domain,
    independent of domain size) enter the final per-domain rank. Both
    stages are windows over bounded partitions; the plan's worst task
    is O(domain_size / n_salts), tunable to the cluster.

    The two stages are exact, not approximate: the global top-``cap``
    of a domain contains at most ``cap`` members from any one salt
    shard, so per-salt top-``cap`` survivors are a superset of the
    final winners.
    """
    pr = F.pmod(shingle_hash(F.col(id_col).cast("string"), seed), F.lit(1 << 31))
    base = docs.select(F.col(id_col), F.col(domain_col), pr.cast("long").alias("priority"))
    base = base.withColumn("_salt", F.pmod(F.col("priority"), F.lit(n_salts)))
    w_local = Window.partitionBy(domain_col, "_salt").orderBy("priority", id_col)
    survivors = base.withColumn("_lrk", F.row_number().over(w_local)).filter(
        F.col("_lrk") <= cap
    )
    w_dom = Window.partitionBy(domain_col).orderBy("priority", id_col)
    return (
        survivors.withColumn("rk", F.row_number().over(w_dom).cast("long"))
        .filter(F.col("rk") <= cap)
        .select(id_col, domain_col, "priority", "rk")
    )


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier (the fasttext-style quality filter)
# ---------------------------------------------------------------------------


def quality_score_hashed(
    docs: DataFrame,
    n_buckets: int = 4096,
    seed: int = 23,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a hashed bag-of-words linear model — the
    shape of the fasttext-style quality classifiers used to filter web
    corpora (GPT-3's WebText-vs-CommonCrawl classifier, CCNet, DCLM):
    token → hash bucket → weight, document score = Σ weights.

    The weights here are a deterministic function of the bucket id
    (a fixed LCG step mapped to −1000..+1000 milli-units) so the
    operator is self-contained and oracle-reproducible; swapping in
    trained weights is a broadcast join on ``bucket`` against a
    ≤ ``n_buckets``-row weight table and changes nothing about the
    plan shape.

    Emits integer columns only (``score_milli``, ``n_tokens``,
    ``keep`` 0/1) — representation-stable across engines.

    Scale: the hashing trick means there is NO vocabulary table — the
    model is a pure expression, so the plan is explode → hash →
    groupBy(``id``) with map-side partial aggregation. The exchange
    carries (id, partial-sum) pairs, never tokens; a trained-weight
    variant adds one broadcast join before the same aggregate.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    rows = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.when(F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>"))
            .otherwise(toks)
        ).alias("_tok"),
    )
    bucket = F.pmod(shingle_hash(F.col("_tok"), seed), F.lit(n_buckets))
    w_milli = F.pmod(bucket * F.lit(1103515245) + F.lit(12345), F.lit(2001)) - F.lit(1000)
    scored = (
        rows.select(
            F.col(id_col),
            F.when(F.col("_tok").isNull(), F.lit(0).cast("long"))
            .otherwise(w_milli.cast("long"))
            .alias("_w"),
            F.when(F.col("_tok").isNull(), F.lit(0).cast("long"))
            .otherwise(F.lit(1).cast("long"))
            .alias("_one"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("_w").cast("long").alias("score_milli"),
            F.sum("_one").cast("long").alias("n_tokens"),
        )
    )
    return scored.select(
        id_col,
        "score_milli",
        "n_tokens",
        (F.col("score_milli") > 0).cast("long").alias("keep"),
    )


def quality_top_fraction(
    docs: DataFrame,
    frac: float = 0.5,
    stratum_col: str = "lang",
    n_buckets: int = 4096,
    seed: int = 23,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_salts: int = 8,
) -> DataFrame:
    """Keep the top ``frac`` of documents per stratum by classifier
    score — the relative quality cut (FineWeb-Edu keeps the top slice
    by classifier score; a fixed threshold drifts as the corpus mix
    changes, a per-stratum fraction does not). Scoring is
    :func:`quality_score_hashed`; the cut keeps the ``ceil(frac * n)``
    best (score desc, id asc) within each stratum.

    Output: kept rows ``(id, stratum, score_milli, rk)``.

    Scale: the per-stratum quota K = ceil(frac*n) is data-dependent,
    so this generalizes :func:`cap_per_domain`'s two-stage salted
    rank to a column-valued cap: stratum counts reduce to one row per
    stratum (broadcast back), documents rank first within
    (stratum, salt) keeping local rank ≤ K — at most n_salts*K rows
    per stratum survive, bounded per task — then the final rank runs
    over the survivors. Exact by the same pigeonhole argument: the
    stratum's true top-K contains at most K members of any salt
    shard."""
    scored = quality_score_hashed(docs, n_buckets, seed, text_col, id_col).join(
        docs.select(id_col, stratum_col), id_col
    )
    quota = F.broadcast(
        scored.groupBy(stratum_col).agg(
            F.ceil(F.count("*") * F.lit(frac)).cast("long").alias("_k")
        )
    )
    base = scored.join(quota, stratum_col).withColumn(
        "_salt", F.pmod(shingle_hash(F.col(id_col).cast("string"), seed + 1), F.lit(n_salts))
    )
    w_local = Window.partitionBy(stratum_col, "_salt").orderBy(
        F.col("score_milli").desc(), F.col(id_col).asc()
    )
    survivors = base.withColumn("_lrk", F.row_number().over(w_local)).filter(
        F.col("_lrk") <= F.col("_k")
    )
    w_str = Window.partitionBy(stratum_col).orderBy(
        F.col("score_milli").desc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w_str).cast("long"))
        .filter(F.col("rk") <= F.col("_k"))
        .select(id_col, stratum_col, "score_milli", "rk")
    )


# ---------------------------------------------------------------------------
# Sequence packing (token-budget binning for training batches)
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 4,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """Assign documents to fixed-token-budget bins (greedy first-fit in
    deterministic id order) — the packing step that turns a curated
    corpus into ~``seq_len``-token training sequences.

    A document lands in bin ``floor(running_tokens_before_it /
    seq_len)`` within its (stratum, shard) partition; downstream
    concatenation of a bin yields a sequence that crosses the budget at
    most once (documents longer than ``seq_len`` own their bins).

    Scale: a *global* cumulative sum would serialize on one partition.
    Instead each stratum is split into ``n_shards`` deterministic
    shards (md5 of the id, reproducible anywhere) and the running sum
    windows over (stratum, shard) — window width is corpus_size /
    (strata × shards), tunable to executor memory. Bin ids are only
    unique within (stratum, shard), which is what a data loader needs.
    """
    shard = F.pmod(shingle_hash(F.col(id_col).cast("string"), seed), F.lit(n_shards))
    toks = docs.select(
        F.col(id_col),
        F.col(stratum_col),
        shard.cast("long").alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(stratum_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.select(
        id_col,
        stratum_col,
        "shard",
        "n_tokens",
        F.floor(running / seq_len).cast("long").alias("bin"),
    )


def write_training_shards(
    packed: DataFrame,
    path: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> None:
    """Materialize a packed corpus manifest in the layout a training
    data loader consumes: one directory per (stratum, shard), rows
    sorted by (bin, id) within each file so a loader streams bins
    sequentially without a sort. ``packed`` is
    :func:`pack_sequences` output (or any frame carrying
    ``shard``/``bin``).

    Scale: partitionBy writes each (stratum, shard) directory from
    the tasks that own it — sortWithinPartitions is a local sort, NO
    global ordering exchange (a global orderBy would range-partition
    the whole corpus through one barrier). The local sort LEADS with
    the partitionBy columns: Spark's V1 write path requires rows
    clustered by partition columns and would otherwise insert its own
    sort, and the advertised per-file (bin, id) order would then only
    survive if that inserted sort were stable — which Spark does not
    guarantee. Shard count is the parallelism knob: loaders read
    shards independently, and directory pruning serves stratum-scoped
    epochs for free."""
    (
        packed.repartition(F.col(stratum_col), F.col("shard"))
        .sortWithinPartitions(stratum_col, "shard", "bin", id_col)
        .write.mode("overwrite")
        .partitionBy(stratum_col, "shard")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Gopher-style composite document quality filter
# ---------------------------------------------------------------------------

GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_signal_cols(text_col: str) -> dict[str, Column]:
    """The Gopher signal expressions over ``text_col`` as named
    Columns — shared by the signals projection and the filter so the
    filter stays a row-local WHERE (no join, no shuffle)."""
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words).cast("long")
    safe_n = F.greatest(n_words, F.lit(1).cast("long"))
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w).cast("long")
    )
    n_hash = (F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))).cast("long")
    n_ell = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    lines = F.split(text, r"\n")
    n_lines = F.greatest(F.size(lines).cast("long"), F.lit(1).cast("long"))
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*\u2022\u2023\u25e6]"))
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|\u2026)$"))
    ).cast("long")
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
        )
    ).cast("long")

    def bp(num: Column) -> Column:
        return F.floor(num * 10000 / safe_n).cast("long")

    sig = {
        "n_words": n_words,
        "mean_word_len_bp": bp(word_chars),
        "symbol_word_bp": bp(n_hash + n_ell),
        "bullet_line_bp": F.floor(bullet_lines * 10000 / n_lines).cast("long"),
        "ellipsis_line_bp": F.floor(ellipsis_lines * 10000 / n_lines).cast("long"),
        "alpha_word_bp": bp(alpha_words),
        "n_stopwords_present": n_stop,
    }
    sig["passes"] = (
        (sig["n_words"] >= 50)
        & (sig["n_words"] <= 100000)
        & (sig["mean_word_len_bp"] >= 30000)
        & (sig["mean_word_len_bp"] <= 100000)
        & (sig["symbol_word_bp"] <= 1000)
        & (sig["bullet_line_bp"] <= 9000)
        & (sig["ellipsis_line_bp"] <= 3000)
        & (sig["alpha_word_bp"] >= 8000)
        & (sig["n_stopwords_present"] >= 2)
    )
    return sig


def gopher_quality_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The MassiveText/Gopher document-quality rule set (Rae et al.
    2021, arXiv:2112.11446 \u00a7A.1.1) as one codegen projection \u2014 no
    shuffle, no UDF, every signal an exact integer (counts, or
    basis-point floors) so the filter is reproducible bit-for-bit on
    any engine.

    Per document: ``n_words``; ``mean_word_len_bp`` (10^-4 chars);
    ``symbol_word_bp`` (# and ... occurrences per word);
    ``bullet_line_bp`` / ``ellipsis_line_bp`` (lines starting with a
    bullet / ending in an ellipsis); ``alpha_word_bp`` (words with at
    least one letter); ``n_stopwords_present`` (of the 8 required
    Gopher stopwords); and ``passes`` \u2014 the conjunction of the paper's
    bounds (50 <= words <= 100k, 3 <= mean len <= 10, symbol ratio
    <= 0.1, bullets <= 90%, ellipses <= 30%, alpha words >= 80%,
    >= 2 required stopwords).

    Scale: a pure narrow projection over the text column \u2014 pipelined
    into whatever scan/filter surrounds it; cost is one pass over the
    bytes per document, shuffle volume zero."""
    sig = _gopher_signal_cols(text_col)
    return docs.select(id_col, *[c.alias(n) for n, c in sig.items()])


def gopher_quality_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Documents surviving the Gopher rules. The predicate is
    row-local, so this is a plain WHERE over the input \u2014 no join, no
    shuffle; Catalyst pushes it toward the scan and rejected documents
    never reach downstream operators."""
    return docs.filter(_gopher_signal_cols(text_col)["passes"])


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169) — hashed n-gram bigram models + Gumbel top-k
# ---------------------------------------------------------------------------


def dsir_bucket_model(
    corpus: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    k: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """The DSIR importance model: word k-grams hashed into
    ``n_buckets`` buckets, one add-one-smoothed unigram-over-buckets
    model for the target distribution and one for the raw corpus.
    Returns the ``n_buckets``-row weight table
    ``(bucket, c_target, c_raw, w)`` with
    ``w = round(ln p_target(b) - ln p_raw(b), 6)`` as DECIMAL(18,6) —
    rounded per bucket BEFORE any summation so document scores are
    exact decimal sums, reproducible on any engine.

    Scale: both count passes are map-side-combined hash aggregates
    over 16-byte (bucket) rows; the model is index-metadata-sized
    (``n_buckets`` rows) at any corpus scale and broadcasts into the
    scoring join."""

    def bucket_counts(df: DataFrame, name: str) -> DataFrame:
        g = _gram_hash_rows(df, k, text_col, id_col, hasher, distinct=False)
        return (
            g.select(F.pmod(F.col("gh"), F.lit(n_buckets)).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias(name))
        )

    joined = (
        bucket_counts(target, "c_target")
        .join(bucket_counts(corpus, "c_raw"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("c_target", F.lit(0)).cast("long").alias("c_target"),
            F.coalesce("c_raw", F.lit(0)).cast("long").alias("c_raw"),
        )
    )
    totals = F.broadcast(
        joined.agg(
            F.sum("c_target").alias("n_target"), F.sum("c_raw").alias("n_raw")
        )
    )
    b = F.lit(float(n_buckets))
    return joined.crossJoin(totals).select(
        "bucket",
        "c_target",
        "c_raw",
        F.round(
            F.log((F.col("c_target") + 1.0) / (F.col("n_target") + b))
            - F.log((F.col("c_raw") + 1.0) / (F.col("n_raw") + b)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("w"),
    )


def dsir_importance_weights(
    corpus: DataFrame,
    model: DataFrame,
    n_buckets: int = 1024,
    k: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight: the sum of its hashed
    k-gram bucket weights (with multiplicity, per the paper). Returns
    ``(id, n_grams, score)`` — score an exact decimal sum cast to
    double.

    Scale: gram rows join the BROADCAST model on bucket (no corpus
    shuffle for the join), then reduce by document — map-side partial
    aggregation collapses each doc's grams before the exchange."""
    g = _gram_hash_rows(corpus, k, text_col, id_col, hasher, distinct=False)
    scored = g.select(
        F.col(id_col), F.pmod(F.col("gh"), F.lit(n_buckets)).alias("bucket")
    ).join(F.broadcast(model.select("bucket", "w")), "bucket")
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum("w").cast("decimal(38,6)").cast("double").alias("score"),
    )


def dsir_scores(
    corpus: DataFrame,
    target_filter: Column,
    n_buckets: int = 1024,
    k: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """One-gram-pass DSIR: :func:`dsir_bucket_model` +
    :func:`dsir_importance_weights` fused for the common case where
    the target distribution is a row predicate over the SAME corpus
    (``target_filter``, e.g. ``lang == 'en'``).

    The separate calls run the gram explode + hash pass THREE times
    (target bucket counts, raw bucket counts, per-doc scoring) — the
    dominant cost, since every pass re-scans the corpus text, windows
    the token positions, and hashes every k-gram (guide §2.2: shuffle
    and recompute less; HOF/window work is never deduped across
    subtrees).  Here ONE pass builds the per-(doc, bucket) gram
    histogram with the target flag carried through the explode
    (``shingle_rows(carry=...)``), eager-checkpointed at
    O(docs x touched buckets) — strictly smaller than the gram rows
    it replaces; both model counts and the per-doc scores then
    derive from it:

    - ``c_target``/``c_raw`` are histogram sums per bucket (the
      full-outer bucket union is the histogram's bucket set, since
      target ⊆ corpus);
    - the per-doc score sums ``w * cnt`` — exact DECIMAL
      multiplication, identical to summing the rounded per-bucket
      ``w`` once per gram occurrence, so scores are bit-identical to
      the unfused path (pinned by ``test_dsir_scores_matches_unfused``).

    Returns the :func:`dsir_importance_weights` frame
    ``(id, n_grams, score)``."""
    from monstache_spark.operators.dedup import shingle_rows

    h = hasher if hasher is not None else F.xxhash64
    flagged = corpus.withColumn("__dsir_tgt", target_filter.cast("boolean"))
    rows = shingle_rows(
        flagged, text_col, id_col, k=k, distinct=False, carry=("__dsir_tgt",)
    )
    hist = (
        rows.select(
            F.col(id_col),
            F.col("__dsir_tgt").alias("tgt"),
            F.pmod(h(F.col("s")), F.lit(n_buckets)).alias("bucket"),
        )
        .groupBy(id_col, "tgt", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    bucket_counts = hist.groupBy("bucket").agg(
        F.sum(F.when(F.col("tgt"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("c_target"),
        F.sum("cnt").cast("long").alias("c_raw"),
    )
    totals = F.broadcast(
        bucket_counts.agg(
            F.sum("c_target").alias("n_target"), F.sum("c_raw").alias("n_raw")
        )
    )
    b = F.lit(float(n_buckets))
    # the w expression is copied VERBATIM from dsir_bucket_model so
    # every rounded double is bit-identical to the unfused model's
    model = bucket_counts.crossJoin(totals).select(
        "bucket",
        F.round(
            F.log((F.col("c_target") + 1.0) / (F.col("n_target") + b))
            - F.log((F.col("c_raw") + 1.0) / (F.col("n_raw") + b)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("w"),
    )
    scored = hist.join(F.broadcast(model), "bucket")
    return scored.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.sum(F.col("w") * F.col("cnt"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("score"),
    )


def dsir_gumbel_sample(
    weights: DataFrame,
    k_sample: int,
    id_col: str = "doc_id",
    score_col: str = "score",
    seed: int = 7,
    noise_buckets: int = 1 << 20,
) -> DataFrame:
    """Gumbel top-k resampling over DSIR log weights: sampling without
    replacement with probability proportional to the importance weight
    reduces to ranking ``score + Gumbel noise`` (Vieira 2014). The
    noise is derived deterministically per id from the md5 hash family
    (u = (h % M + 0.5) / M; g = -ln(-ln u)), so the sample is
    reproducible on any engine. Adds ``gumbel_key``, ``rank`` and
    ``sampled``.

    The global rank is computed by ``skew.range_bucketed_rank``
    (quantile range buckets + per-bucket row_number + literal
    offsets), NOT a single-partition ``Window.orderBy`` — the ranked
    frame stays parallel at corpus scale."""
    from monstache_spark.operators.skew import range_bucketed_rank

    h = shingle_hash(F.concat(F.lit("gumbel:"), F.col(id_col).cast("string")), seed)
    u = (F.pmod(h, F.lit(noise_buckets)) + 0.5) / float(noise_buckets)
    g = F.round(-F.log(-F.log(u)), 6).cast("decimal(18,6)")
    keyed = weights.withColumn(
        "gumbel_key",
        (F.col(score_col).cast("decimal(28,6)") + g).cast("decimal(28,6)").cast("double"),
    )
    # the ranker needs two extra passes (quantile bounds, bucket
    # counts); checkpoint the per-doc weight rows — O(#docs), tiny
    # next to the gram pipeline that produced them — so those passes
    # do not recompute the corpus scan
    keyed = keyed.localCheckpoint(eager=True)
    ranked = range_bucketed_rank(keyed, "gumbel_key", id_col, rank_col="rank")
    return ranked.withColumn("sampled", F.col("rank") <= k_sample)


# ---------------------------------------------------------------------------
# cross-corpus overlap audit
# ---------------------------------------------------------------------------


def corpus_overlap(
    docs: DataFrame,
    group_col: str = "source",
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Pairwise n-gram overlap between corpus groups (sources /
    datasets / dumps) — the contamination-audit matrix run before
    mixing datasets into a training corpus: how much of dataset A's
    n-gram inventory already exists in dataset B.

    For every unordered group pair that shares at least one distinct
    word ``n``-gram, emits ``(src_a, src_b, n_grams_a, n_grams_b,
    n_shared, jaccard_bp, contain_a_bp, contain_b_bp)`` — Jaccard and
    both directed containments (|A∩B|/|A|, |A∩B|/|B|) in integer
    basis points, so the frame is hash-exact on any engine.  Pairs
    with zero shared grams are omitted (at corpus scale most of the
    quadratic pair space is empty; emit-on-evidence keeps the output
    proportional to real overlap).

    Scale shape: ONE corpus pass explodes shingles (per-document
    ``_spread`` + lead window, as everywhere else); gram strings hash
    to 8-byte ints BEFORE the distinct, so the (group, gram-hash)
    dedup exchange carries fixed-width rows; group membership per gram
    comes from a hash agg on the gram hash; the pair explosion is
    bounded by C(#groups-per-gram, 2) with #groups a handful; group
    gram totals broadcast into the final join.  No corpus self-join —
    the membership-array formulation replaces the (grams ⋈ grams)
    equi-join with a per-gram combination explode.
    """
    h = hasher if hasher is not None else F.xxhash64
    sep = "\x1f"
    tagged = docs.withColumn(
        "_gid",
        F.concat_ws(sep, F.col(group_col).cast("string"), F.col(id_col).cast("string")),
    )
    rows = shingle_rows(tagged, text_col, "_gid", k=n, distinct=False)
    grams = rows.select(
        F.split_part(F.col("_gid"), F.lit(sep), F.lit(1)).alias("grp"),
        h(F.col("s")).alias("gh"),
    )
    # collect_set dedups (grp, gh) DURING the membership agg with
    # map-side partial merging — one gram-row shuffle instead of a
    # distinct exchange followed by a second groupBy exchange
    memb = grams.groupBy("gh").agg(F.array_sort(F.collect_set("grp")).alias("gs"))
    # distinct grams per group == buckets containing the group; the
    # explode here is over gram-BUCKET rows, not raw gram rows
    sizes = (
        memb.select(F.explode("gs").alias("grp"))
        .groupBy("grp")
        .agg(F.count("*").cast("long").alias("n_grams"))
    )
    combos = memb.filter(F.size("gs") >= 2).select(
        F.explode(
            F.flatten(
                F.transform(
                    "gs",
                    lambda a, i: F.transform(
                        F.slice(F.col("gs"), i + F.lit(2), F.size("gs")),
                        lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
                    ),
                )
            )
        ).alias("p")
    )
    shared = combos.groupBy("p.src_a", "p.src_b").agg(
        F.count("*").cast("long").alias("n_shared")
    )
    sa = F.broadcast(sizes.select(F.col("grp").alias("src_a"), F.col("n_grams").alias("n_grams_a")))
    sb = F.broadcast(sizes.select(F.col("grp").alias("src_b"), F.col("n_grams").alias("n_grams_b")))
    out = shared.join(sa, "src_a").join(sb, "src_b")
    union = F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_shared")
    return out.select(
        "src_a",
        "src_b",
        "n_grams_a",
        "n_grams_b",
        "n_shared",
        F.floor(F.col("n_shared") * 10000 / union).cast("long").alias("jaccard_bp"),
        F.floor(F.col("n_shared") * 10000 / F.col("n_grams_a")).cast("long").alias("contain_a_bp"),
        F.floor(F.col("n_shared") * 10000 / F.col("n_grams_b")).cast("long").alias("contain_b_bp"),
    )


def score_decile_map(
    scored: DataFrame,
    score_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Corpus quality map: bucket documents into score deciles (or
    ``n_buckets``-iles) and report per-bucket membership and score
    stats — the distribution view used to pick perplexity/quality
    cutoffs before filtering (CCNet buckets its corpus by LM
    perplexity exactly this way).

    The bucket boundaries are exact interpolated percentiles computed
    in ONE aggregate row and broadcast back; bucket assignment is a
    codegen sum of boundary comparisons — no global sort, no ntile
    window (an ntile over the corpus would be a single-partition
    window).  With integer scores the boundary comparisons are
    engine-exact even though the interpolated boundaries are doubles:
    no integer can sit between two engines' last-bit-different
    boundary values unless it equals the boundary, which happens only
    when the percentile lands ON a data point (frac = 0) and is then
    integer-exact on both.

    Returns ``(decile, n_docs, min_score, max_score, mean_score)``.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # the scored frame is consumed twice (boundary agg + bucket
    # assignment); checkpoint the per-doc rows — O(#docs), tiny next
    # to whatever scoring pipeline produced them — so that pipeline
    # executes once (same pattern as the DSIR gumbel ranker)
    scored = scored.localCheckpoint(eager=True)
    bounds = scored.agg(
        F.percentile(
            F.col(score_col), F.array(*[F.lit(q) for q in qs])
        ).alias("bs")
    )
    b = scored.crossJoin(F.broadcast(bounds))
    dec = F.lit(1)
    for i in range(len(qs)):
        dec = dec + F.when(
            F.col(score_col) > F.element_at(F.col("bs"), i + 1), F.lit(1)
        ).otherwise(F.lit(0))
    return (
        b.withColumn("decile", dec.cast("long"))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(score_col).cast("long").alias("min_score"),
            F.max(score_col).cast("long").alias("max_score"),
            (
                F.sum(score_col).cast("double") / F.count("*").cast("double")
            ).alias("mean_score"),
        )
    )


def plan_mixture(
    docs: DataFrame,
    weights_bp: dict[str, int],
    token_budget: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture planner: given target mixture weights (in
    basis points) and a total token budget, compute each domain's
    sampling fraction and expected token yield — the arithmetic
    behind every data-mixing recipe (e.g. The Pile / Dolma weight
    tables), kept in exact integers so any engine agrees.

    Per group: ``n_docs``, ``total_tokens`` (whitespace tokens, one
    hash agg), ``target_tokens = floor(budget * weight / 10000)``,
    ``sample_bp = min(10000, floor(target * 10000 / total))`` (a
    domain smaller than its target caps at keep-everything — the
    planner reports the shortfall rather than inventing upsampling),
    and ``expected_tokens = floor(total * sample_bp / 10000)``.
    Groups without a weight get weight 0.  One aggregation pass; the
    weight table is a literal CASE expression (plan metadata).
    """
    w = F.lit(0).cast("long")
    for grp, bp in sorted(weights_bp.items()):
        w = F.when(F.col(group_col) == F.lit(grp), F.lit(int(bp)).cast("long")).otherwise(w)
    agg = docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("total_tokens"),
    )
    out = agg.withColumn("weight_bp", w)
    target = F.floor(F.lit(int(token_budget)) * F.col("weight_bp") / 10000).cast("long")
    out = out.withColumn("target_tokens", target)
    # total_tokens == 0 (a group whose documents are all empty text)
    # means "nothing to sample": keep-everything (10000 bp) yields the
    # correct expected_tokens of 0, and avoids a null from the
    # division silently propagating into the plan.
    frac = F.when(
        F.col("total_tokens") > 0,
        F.least(
            F.lit(10000).cast("long"),
            F.floor(
                F.col("target_tokens") * 10000 / F.col("total_tokens")
            ).cast("long"),
        ),
    ).otherwise(F.lit(10000).cast("long"))
    out = out.withColumn("sample_bp", frac)
    return out.withColumn(
        "expected_tokens",
        F.floor(F.col("total_tokens") * F.col("sample_bp") / 10000).cast("long"),
    )


def data_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """One-row dataset datasheet — the "data card" summary attached to
    a training corpus release: volume (docs/tokens/chars), composition
    (languages, sources, dominant language), exact-duplicate exposure
    and PII exposure, all in exact integers / basis points so the card
    is reproducible bit-for-bit on any engine.

    One corpus pass computes every global aggregate (count-distincts
    share the scan); the dominant-language argmax is a
    language-cardinality frame reduced to one row; the three one-row
    frames broadcast-join into the final card.  No driver-side
    collection, no floats.
    """
    from monstache_spark.functions.text import fingerprint, token_count

    text = F.col(text_col)
    base = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count(text)).cast("long").alias("total_tokens"),
        F.sum(F.length(text)).cast("long").alias("total_chars"),
        F.countDistinct(F.col(lang_col)).cast("long").alias("n_langs"),
        F.countDistinct(F.col(source_col)).cast("long").alias("n_sources"),
        F.countDistinct(fingerprint(text)).cast("long").alias("n_unique_fp"),
    )
    counts = pii_counts(text)
    any_pii = (
        sum(list(counts.values()), F.lit(0).cast("long")) > 0
    ).cast("long")
    pii = docs.agg(F.sum(any_pii).cast("long").alias("pii_docs"))
    top_lang = (
        docs.groupBy(lang_col)
        .agg(F.count("*").cast("long").alias("_c"))
        .orderBy(F.col("_c").desc(), F.col(lang_col).asc())
        .limit(1)
        .select(F.col(lang_col).alias("top_lang"), F.col("_c").alias("top_lang_docs"))
    )
    return (
        base.crossJoin(F.broadcast(pii))
        .crossJoin(F.broadcast(top_lang))
        .select(
            "n_docs",
            "total_tokens",
            "total_chars",
            "n_langs",
            "n_sources",
            "top_lang",
            "top_lang_docs",
            F.floor((F.col("n_docs") - F.col("n_unique_fp")) * 10000 / F.col("n_docs"))
            .cast("long")
            .alias("dup_docs_bp"),
            F.floor(F.col("pii_docs") * 10000 / F.col("n_docs"))
            .cast("long")
            .alias("pii_docs_bp"),
            F.floor(F.col("total_tokens") * 100 / F.col("n_docs"))
            .cast("long")
            .alias("mean_tokens_centi"),
        )
    )


def dpo_pairs(
    df: DataFrame,
    prompt_col: str,
    completion_col: str,
    score_col: str,
    id_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """Preference-pair construction for DPO/RLHF reward modeling:
    per prompt, pair the highest-scored completion (chosen) with the
    lowest-scored (rejected), keeping prompts whose score gap reaches
    ``min_margin`` — the standard best-vs-worst pairing over a scored
    candidate pool.

    Plan shape (the top_metrics two-phase shape): completion strings
    NEVER enter an aggregation buffer — one string/struct field in a
    buffer silently degrades the whole aggregate to SortAggregate —
    so phase 1 is a pure-numeric hash agg (max/min score per prompt)
    and phase 2 joins back to fetch the winning rows, breaking score
    ties on the LOWEST ``id_col`` (deterministic).  Prompts with a
    single candidate drop (no pair exists).  Returns ``(prompt,
    chosen, rejected, chosen_score, rejected_score, margin)``.
    """
    base = df.filter(
        F.col(prompt_col).isNotNull()
        & F.col(completion_col).isNotNull()
        & F.col(score_col).isNotNull()
    ).select(
        F.col(prompt_col).alias("prompt"),
        F.col(completion_col).alias("_c"),
        F.col(score_col).cast("double").alias("_s"),
        F.col(id_col).alias("_id"),
    )
    ext = base.groupBy("prompt").agg(
        F.max("_s").alias("_hi"),
        F.min("_s").alias("_lo"),
        F.count("*").alias("_n"),
    ).filter(
        (F.col("_n") >= 2) & (F.col("_hi") - F.col("_lo") >= F.lit(min_margin))
    )

    def pick(bound: str, out_c: str, out_s: str) -> DataFrame:
        # tie-join: all rows at the extreme score, keep the lowest id
        j = base.join(
            ext.select("prompt", F.col(bound).alias("_b")), "prompt"
        ).filter(F.col("_s") == F.col("_b"))
        w = Window.partitionBy("prompt").orderBy(F.col("_id").asc())
        return (
            j.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "prompt",
                F.col("_c").alias(out_c),
                F.col("_s").alias(out_s),
            )
        )

    chosen = pick("_hi", "chosen", "chosen_score")
    rejected = pick("_lo", "rejected", "rejected_score")
    return (
        chosen.join(rejected, "prompt")
        .withColumn(
            "margin", F.round(F.col("chosen_score") - F.col("rejected_score"), 6)
        )
        .select(
            "prompt", "chosen", "rejected",
            "chosen_score", "rejected_score", "margin",
        )
    )


def curriculum_interleave(
    df: DataFrame,
    difficulty_col: str,
    id_col: str,
    n_strata: int = 4,
) -> DataFrame:
    """Deterministic curriculum ordering with stratified interleaving:
    rows are cut into ``n_strata`` difficulty strata (equal-width
    NTILE over ascending difficulty), then the global training order
    round-robins across strata — position ``rank_within_stratum ·
    n_strata + stratum`` — so every training window sees the full
    difficulty spectrum while easier examples still lead within each
    cycle (the interleaved-curriculum schedule; a pure sort-by-
    difficulty curriculum is the ``n_strata=1`` special case).

    Two window passes over (difficulty, id) — the order is a pure
    function of the data, reproducible on any engine and any
    partitioning.  Returns the input plus ``stratum`` and ``order_idx``
    (dense 0-based global positions followed by sorting consumers).
    """
    w = Window.orderBy(F.col(difficulty_col).asc(), F.col(id_col).asc())
    strat = F.ntile(n_strata).over(w) - F.lit(1)
    out = df.filter(
        F.col(difficulty_col).isNotNull() & F.col(id_col).isNotNull()
    ).withColumn("stratum", strat.cast("long"))
    w2 = Window.partitionBy("stratum").orderBy(
        F.col(difficulty_col).asc(), F.col(id_col).asc()
    )
    return out.withColumn(
        "order_idx",
        ((F.row_number().over(w2) - F.lit(1)) * F.lit(n_strata)
         + F.col("stratum")).cast("long"),
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "0",
) -> DataFrame:
    """Reproducible global shuffle for training-order assignment:
    rows order by ``md5(seed || ':' || id)`` — a keyed hash both
    engines compute identically (unlike engine-native hash functions,
    whose values differ between Spark and DuckDB), so epoch N's order
    is a pure function of (seed, id) on ANY engine, partitioning, or
    rerun.  Different seeds give independent epoch permutations.

    The sort is one shuffle-range exchange — exactly what a training
    shard writer needs ahead of ``write_training_shards``; at 100 TB
    the same key feeds a ``repartitionByRange`` so shard files come
    out order-stable too.  Returns the input plus ``shuffle_key`` and
    ``epoch_pos`` (0-based).
    """
    key = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))
    out = df.filter(F.col(id_col).isNotNull()).withColumn("shuffle_key", key)
    w = Window.orderBy(F.col("shuffle_key").asc(), F.col(id_col).asc())
    return out.withColumn(
        "epoch_pos", (F.row_number().over(w) - F.lit(1)).cast("long")
    )


def best_of_n(
    candidates: DataFrame,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand_id",
    reward_col: str = "reward",
) -> DataFrame:
    """Best-of-N selection over reward-scored candidates — the
    rejection-sampling step of an RLHF/RFT pipeline: per prompt, keep
    the candidate with the highest reward (ties break on the LOWEST
    candidate id, deterministic).  Also emits the per-prompt candidate
    count, reward mean (exact-decimal sum / count), and the
    best-minus-mean margin the pipeline monitors.

    Plan shape: the two-phase extreme + tie-join — ONE hash aggregate
    computes (max reward, n, sum) per prompt with primitive-only
    buffers (a ``max_by(id, reward)`` would drag the id into the
    buffer and degrade to SortAggregate), then a join back on
    ``(prompt, max_reward)`` picks the winner row and min() resolves
    reward ties.  Both shuffles key on the prompt — co-partitioned,
    and at 100 TB the aggregate side is map-combined to one row per
    prompt before it moves.
    """
    # the stats side renames its key pre-join (self-join lineage —
    # Spark's ambiguous-column check rejects frame-qualified refs here)
    stats = (
        candidates.groupBy(prompt_col)
        .agg(
            F.max(reward_col).alias("best_reward"),
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(F.col(reward_col).cast("decimal(38,6)")).alias("_sum"),
        )
        .withColumnRenamed(prompt_col, "_prompt")
    )
    winners = (
        candidates.join(
            stats,
            (F.col(prompt_col) == F.col("_prompt"))
            & (F.col(reward_col) == F.col("best_reward")),
        )
        .groupBy(prompt_col, "best_reward", "n_candidates", "_sum")
        .agg(F.min(cand_col).alias("best_cand"))
    )
    # cast the exact decimal sum to double BEFORE dividing: decimal
    # division scale rules differ across engines, double division is
    # IEEE-identical
    mean = F.col("_sum").cast("double") / F.col("n_candidates")
    return winners.select(
        prompt_col,
        "best_cand",
        "best_reward",
        "n_candidates",
        F.round(mean, 6).alias("reward_mean"),
        F.round(F.col("best_reward") - mean, 6).alias("margin"),
    )


def length_buckets(
    docs: DataFrame,
    boundaries: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching stats — the padding-waste planner that
    decides a training run's bucket boundaries: each document falls in
    the smallest bucket whose capacity holds its token count (the last
    bucket also takes overflow, truncation-planned).  Per bucket:
    document count, token sum, capacity = n_docs x bucket size, and
    the padding waste in basis points (exact integer arithmetic — no
    float contract).

    ONE projection (token count + bucket CASE) + ONE hash aggregate.
    """
    if (
        not boundaries
        or boundaries != sorted(boundaries)
        or len(set(boundaries)) != len(boundaries)
    ):
        raise ValueError("boundaries must be strictly increasing")
    if boundaries[0] <= 0:
        # a non-positive bucket would have capacity 0 and divide the
        # waste ratio by zero (empty docs land in the smallest bucket)
        raise ValueError("boundaries must be positive")
    from monstache_spark.functions.text import token_count

    nt = token_count(F.col(text_col)).cast("long")
    bucket = F.lit(boundaries[-1]).cast("long")
    for b in reversed(boundaries[:-1]):
        bucket = F.when(nt <= b, F.lit(b).cast("long")).otherwise(bucket)
    rows = docs.select(
        F.col(id_col),
        nt.alias("n_tokens"),
        bucket.alias("bucket"),
    )
    agg = rows.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum(F.least(F.col("n_tokens"), F.col("bucket")))
        .cast("long")
        .alias("kept_tokens"),
    )
    capacity = F.col("n_docs") * F.col("bucket")
    return agg.select(
        "bucket",
        "n_docs",
        "sum_tokens",
        "kept_tokens",
        capacity.alias("capacity"),
        F.floor((capacity - F.col("kept_tokens")) * 10000 / capacity)
        .cast("long")
        .alias("waste_bp"),
    )


def train_val_test_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    key_col: str | None = None,
    fractions: tuple = (0.9, 0.05, 0.05),
    names: tuple = ("train", "val", "test"),
    seed: int | str = 7,
) -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment.

    The unit of assignment is ``key_col`` — pass a near-dup cluster id
    (``dedup.near_dup_cluster``) or a domain so CORRELATED documents
    land on ONE side (test-set contamination through near-duplicates
    is the canonical eval failure at web scale); the default (the doc
    id) is a plain iid split.

    Assignment = the seed-keyed md5 of the key, mapped to [0, 1) by
    its 60-bit hex prefix and cut at the cumulative fractions.  The
    cut points are 15-digit hex STRING literals and the comparison is
    lexicographic — fixed-width lowercase hex orders exactly like the
    integer it spells, so Spark and an independent engine agree
    bit-for-bit with no integer conversion.  Properties a 100 TB
    pipeline needs: a pure narrow projection (no shuffle, no RNG
    state, whole-stage codegen); reproducible under ``seed``; STABLE
    under corpus growth — a document's side never changes when other
    documents arrive or partitioning changes, unlike
    ``DataFrame.randomSplit`` (per-partition RNG).

    Returns ``docs`` + a ``split`` column.  Fractions must be
    positive and sum to 1 (±1e-9); one name per fraction.
    """
    if len(fractions) != len(names) or len(fractions) < 2:
        raise ValueError("need >= 2 fractions with one name each")
    if min(fractions) <= 0 or abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must be positive and sum to 1: {fractions}")
    key = F.col(key_col if key_col is not None else id_col)
    hx = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 15
    )
    cuts = []
    acc = 0.0
    for frac in fractions[:-1]:
        acc += frac
        cuts.append(format(int(acc * (16 ** 15)), "015x"))
    expr = F.lit(names[-1])
    for cut, name in zip(reversed(cuts), reversed(names[:-1])):
        expr = F.when(hx < F.lit(cut), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    stratum_col: str | None = None,
    seed: str = "0",
    n_buckets: int = 64,
) -> DataFrame:
    """Take documents in deterministic-shuffle order until a global
    token budget is met — the "give me a 1B-token slice" primitive.
    With ``stratum_col``, the budget applies PER STRATUM (a per-
    language eval slice).

    Scale design: the cut needs the global running token sum in
    shuffle-key order, and a single global window serializes on one
    partition.  Instead, the md5 shuffle key is RANGE-bucketed by its
    leading hex digits (buckets are ordered intervals of the key
    space, so bucket order IS global order — a hash-sharded prefix
    sum would interleave and break the cut), the running sum windows
    within each (stratum, bucket), and each bucket's offset is the
    prefix sum of the bucket TOTALS — an O(strata × n_buckets)-row
    aggregate collected to the driver (control-plane) and broadcast
    back as a literal lookup.  No global sort, no driver data path;
    the classic two-pass distributed prefix sum.

    A document is kept while the tokens BEFORE it are under the
    budget, so the straddling document is included and the slice is
    the shortest prefix reaching the budget (ES-style "at least N").
    Deterministic under (seed, ids) on any partitioning; documents
    with NULL id drop (the deterministic_shuffle contract).  A NULL
    ``stratum_col`` value is its own stratum with its own budget —
    the bucket-offset join is null-safe (``eqNullSafe``), matching
    the window/groupBy semantics (and SQL ``PARTITION BY``), so NULL-
    stratum documents are never silently dropped.  Returns
    ``(id, [stratum], n_tokens, cum_before, keep)``.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    if not 1 <= n_buckets <= 4096:
        raise ValueError(f"n_buckets out of range: {n_buckets}")
    from monstache_spark.functions.text import token_count

    key = F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                         F.col(id_col).cast("string")))
    # leading 3 hex digits (4096 intervals) scaled down to n_buckets —
    # an ORDERED range bucketing of the key space
    bucket = F.floor(
        F.conv(F.substring(key, 1, 3), 16, 10).cast("long")
        * n_buckets / 4096
    ).cast("long")
    strata = [stratum_col] if stratum_col else []
    rows = docs.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col),
        *[F.col(c) for c in strata],
        key.alias("shuffle_key"),
        bucket.alias("_bkt"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*strata, "_bkt")
        .orderBy("shuffle_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "_cum_in_bkt"
    )
    totals = (
        rows.groupBy(*strata, "_bkt")
        .agg(F.sum("n_tokens").alias("_tot"))
    )
    # bucket offsets: prefix sum over the TOTALS frame (tiny — one row
    # per (stratum, bucket)); windowing per stratum over <= n_buckets
    # rows is control-plane-sized by construction
    wo = (
        Window.partitionBy(*strata)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *strata,
        "_bkt",
        F.coalesce(F.sum("_tot").over(wo), F.lit(0)).alias("_off"),
    )
    # null-safe on the stratum key: window partitions treat NULL as a
    # real stratum, so the offset join must too (a bare name-list
    # equi-join would drop every NULL-stratum row)
    off = offsets.select(
        *[F.col(c).alias(f"_o_{c}") for c in strata],
        F.col("_bkt").alias("_o_bkt"),
        "_off",
    )
    cond = F.col("_bkt") == F.col("_o_bkt")
    for c in strata:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_o_{c}"))
    joined = rows.select(
        id_col, *strata, "shuffle_key", "_bkt", "n_tokens", in_bucket
    ).join(F.broadcast(off), cond)
    cum_before = (F.col("_off") + F.col("_cum_in_bkt")).alias("cum_before")
    return joined.select(
        id_col, *strata, "n_tokens", cum_before,
        ((F.col("_off") + F.col("_cum_in_bkt"))
         < F.lit(int(budget_tokens))).alias("keep"),
    )


def temperature_sample(
    docs: DataFrame,
    temperature: float,
    doc_budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "t",
) -> DataFrame:
    """Temperature-smoothed source sampling — the multilingual-LM
    mixing rule (sample source ``s`` with probability
    ``p_s ∝ n_s^(1/T)``; published as exponent-smoothed sampling in
    the mBERT/XLM-R/mT5 line, where T>1 upweights low-resource
    sources and T=1 is proportional).  Converts the draw
    probabilities into per-document keep fractions against a total
    ``doc_budget``: ``keep_s = min(1, p_s · budget / n_s)`` — an
    over-asked source caps at keep-everything (no upsampling; the
    report shows the shortfall), exactly plan_mixture's stance.

    Determinism discipline (every step either exact or under a
    documented rounded contract):

    * ``w_s = pow(n_s, 1/T)`` is libm — rounded to 12 dp and summed
      as exact ``decimal(38,12)`` (order-independent; the S11
      rounded-transcendental contract).
    * ``p_s = round(w_s / Σw, 6)``.
    * membership: the first 15 md5 hex digits of ``seed:id`` as a
      60-bit integer, kept iff ``< floor(keep_s · 2^60)`` —
      multiplying a double by 2^60 scales the mantissa EXACTLY (a
      power of two), so the cut integer is engine-identical and the
      comparison is pure integer ordering (the hash_sample /
      train_val_test_split family).

    Plan: one hash agg over the corpus for ``n_s`` (map-side
    combine), the O(#sources) stats frame broadcast back onto the
    scan, one codegen filter — no shuffle of the corpus, no
    driver-side collect.  Returns the kept docs with their group's
    ``p`` and ``keep_frac`` attached (callers aggregate or join as
    needed).
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0: {temperature}")
    if doc_budget <= 0:
        raise ValueError(f"doc_budget must be > 0: {doc_budget}")
    # NULL-group contract (ADVICE r13): docs with a NULL group_col
    # are excluded BEFORE the count agg — groupBy would keep the
    # NULL stratum (inflating the weight denominator and skewing
    # every p_s) while the equi-join back can never match NULL keys,
    # so its budget mass would be silently unspendable.  A source
    # label is required to participate in the mixture; sibling
    # token_budget_sample spells the same stratum out explicitly.
    docs = docs.filter(F.col(group_col).isNotNull())
    counts = docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("_n")
    )
    w = F.round(
        F.pow(F.col("_n").cast("double"), F.lit(1.0 / float(temperature))),
        12,
    ).cast("decimal(38,12)")
    weighted = counts.withColumn("_w", w)
    tot = weighted.agg(F.sum("_w").cast("decimal(38,12)").alias("_tw"))
    probs = (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn(
            "p",
            F.round(
                F.col("_w").cast("double") / F.col("_tw").cast("double"), 6
            ),
        )
        .withColumn(
            "keep_frac",
            F.least(
                F.lit(1.0),
                F.round(
                    F.col("p") * F.lit(float(doc_budget))
                    / F.col("_n").cast("double"),
                    6,
                ),
            ),
        )
        .select(group_col, "_n", "p", "keep_frac")
    )
    cut = F.floor(
        F.col("keep_frac") * F.lit(float(1 << 60))
    ).cast("long")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(str(seed) + ":"), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    joined = docs.join(F.broadcast(probs.withColumn("_cut", cut)), group_col)
    return (
        joined.filter(h < F.col("_cut"))
        .drop("_cut", "_n")
    )
