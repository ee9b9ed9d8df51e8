"""Dedup operator semantics (extensions; SURVEY.md §7.2 step 9)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from monstache_spark.functions.text import shingle_hash, word_shingles
from monstache_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The  quick   brown fox jumps over the lazy dog "),  # exact dup modulo ws/case
    (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
    (4, "completely different text about spark engines and parquet files"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_canonicalizes(spark):
    clusters = exact_duplicates(_docs(spark)).collect()
    by_n = sorted(r["n_members"] for r in clusters)
    assert by_n == [1, 1, 2]  # docs 1+2 collide
    kept = {r["doc_id"] for r in dedup_exact(_docs(spark)).collect()}
    assert kept == {1, 3, 4}


def test_minhash_finds_near_dup(spark):
    cands = minhash_candidate_pairs(_docs(spark), num_hashes=16, num_bands=8, shingle_k=1)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs  # exact dups always collide
    assert (1, 3) in pairs  # near dup shares most unigram shingles


def test_jaccard_value_matches_python(spark):
    docs = _docs(spark)
    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    out = ngram_jaccard_pairs(docs, pairs, shingle_k=1, threshold=0.0).collect()
    s1 = set(DOCS[0][1].lower().split())
    s3 = set(DOCS[2][1].lower().split())
    expected = len(s1 & s3) / len(s1 | s3)
    assert abs(out[0]["jaccard"] - expected) < 1e-6


def test_shingle_hash_matches_python_md5(spark):
    df = spark.createDataFrame([("abc def",)], "s string")
    got = df.select(shingle_hash(F.col("s"), 3).alias("h")).collect()[0]["h"]
    assert got == int(hashlib.md5(b"3:abc def").hexdigest()[:8], 16)


def test_simhash_similar_docs_close(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(_docs(spark), shingle_k=1).collect()}
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert hamming(sigs[1], sigs[2]) == 0  # canonical-equal docs
    assert hamming(sigs[1], sigs[3]) < hamming(sigs[1], sigs[4])


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    got = df.select(word_shingles(F.col("text"), 3).alias("sh")).collect()[0]["sh"]
    assert got == ["one two"]  # shorter than k -> whole doc as one shingle


def test_shingle_pipeline_partition_invariant(spark):
    """Dedup results must not depend on physical partitioning — the
    lead-window shingle construction orders by explicit position, so
    any repartitioning yields identical candidate pairs, signatures,
    and fingerprints."""
    from monstache_spark.operators.dedup import winnow_fingerprints

    base = _docs(spark)
    variants = [base.coalesce(1), base.repartition(7)]
    pair_sets = []
    sig_sets = []
    fp_sets = []
    for v in variants:
        cands = minhash_candidate_pairs(v, num_hashes=16, num_bands=8, shingle_k=1)
        pair_sets.append({(r["id_a"], r["id_b"]) for r in cands.collect()})
        sigs = simhash_signatures(v, shingle_k=1)
        sig_sets.append({(r["doc_id"], r["simhash"]) for r in sigs.collect()})
        fps = winnow_fingerprints(v, k=4, w=2)
        fp_sets.append({(r["doc_id"], tuple(r["fps"])) for r in fps.collect()})
    assert pair_sets[0] == pair_sets[1]
    assert sig_sets[0] == sig_sets[1]
    assert fp_sets[0] == fp_sets[1]


def test_dedup_corpus_removes_exact_and_near_dups(spark):
    from monstache_spark.operators.dedup import dedup_corpus

    out = dedup_corpus(
        _docs(spark), num_hashes=16, num_bands=8, shingle_k=1, threshold=0.5
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # doc 2 is an exact dup of 1 (removed); doc 3 is a near dup of 1
    # (unigram jaccard 8/11 ≈ 0.73 >= 0.5, higher id removed)
    assert kept == [1, 4]


def test_max_bucket_cap_and_stats(spark):
    """An adversarial boilerplate corpus: 12 identical docs all land in
    one bucket per band. The default-capped pair path drops oversize
    buckets; lsh_bucket_stats reports exactly what was suppressed —
    truncation is observable, never silent."""
    from monstache_spark.operators.dedup import lsh_bucket_stats, minhash_buckets

    boiler = [(i, "all rights reserved terms of service apply") for i in range(12)]
    docs = spark.createDataFrame(boiler, "doc_id long, text string")
    # identical docs share every band: 4 buckets of 12
    buckets = minhash_buckets(docs, num_hashes=16, num_bands=4, shingle_k=2)
    assert {r["n_ids"] for r in buckets.collect()} == {12}

    capped = minhash_candidate_pairs(
        docs, num_hashes=16, num_bands=4, shingle_k=2, max_bucket=8
    )
    assert capped.count() == 0  # every bucket oversize -> no pair explosion

    stats = lsh_bucket_stats(
        docs, num_hashes=16, num_bands=4, shingle_k=2, max_bucket=8
    ).collect()[0]
    assert stats["n_buckets"] == 4
    assert stats["n_dropped"] == 4
    assert stats["max_bucket_size"] == 12
    assert stats["pairs_suppressed"] == 4 * (12 * 11 // 2)

    # unbounded opt-in still works and the default cap keeps small buckets
    assert minhash_candidate_pairs(
        docs, num_hashes=16, num_bands=4, shingle_k=2, max_bucket=None
    ).count() == 12 * 11 // 2
    assert minhash_candidate_pairs(
        docs, num_hashes=16, num_bands=4, shingle_k=2
    ).count() == 12 * 11 // 2  # DEFAULT_MAX_BUCKET=500 >> 12


def test_connected_components_transitive_chain(spark):
    from monstache_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5 plus clique {10,11,12} plus isolated pair (20,21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    out = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert all(out[i] == 1 for i in (1, 2, 3, 4, 5))
    assert all(out[i] == 10 for i in (10, 11, 12))
    assert out[20] == 20 and out[21] == 21 - 1


def test_connected_components_converges_under_max_iter(spark):
    from monstache_spark.operators.dedup import connected_components

    # a 17-node path: min-prop alone needs 16 rounds; pointer jumping
    # must finish inside 6
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 17)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"] for r in connected_components(pairs, max_iter=6).collect()}
    assert all(out[i] == 1 for i in range(1, 18))


def test_near_dup_clusters_labels_whole_corpus(spark):
    from monstache_spark.operators.dedup import near_dup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1
        (3, base + " extra more"),     # near-dup of 2 (transitively of 1)
        (9, "totally different words nothing shared here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(df, threshold=0.3).collect()}
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[9] == 9  # untouched doc is its own cluster


def test_dedup_keep_best_prefers_quality_then_min_id(spark):
    from monstache_spark.operators.dedup import dedup_keep_best

    rows = [
        (1, "Hello  World", 12),   # same canonical text as 2,3
        (2, "hello world", 30),    # best quality -> keeper
        (3, "HELLO WORLD", 30),    # ties 2 on quality -> larger id loses
        (4, "unique", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = {r["fp"]: r for r in dedup_keep_best(df).collect()}
    assert len(out) == 2
    clus = next(r for r in out.values() if r["n_members"] == 3)
    assert clus["keep_id"] == 2 and clus["keep_quality"] == 30
    solo = next(r for r in out.values() if r["n_members"] == 1)
    assert solo["keep_id"] == 4 and solo["keep_quality"] == 5


def test_dedup_keep_best_out_of_range_raises(spark):
    """The packed argmax is only valid for 0 <= quality < 2^31 and
    0 <= id < 2^32; violations must fail loudly, not elect a wrong
    keeper."""
    import pytest
    from pyspark.errors import SparkRuntimeException
    from monstache_spark.operators.dedup import dedup_keep_best

    bad_quality = spark.createDataFrame(
        [(1, "a", -5), (2, "a", 3)], "doc_id long, text string, n_chars long"
    )
    with pytest.raises(SparkRuntimeException, match="packed argmax out of range"):
        dedup_keep_best(bad_quality).collect()
    bad_id = spark.createDataFrame(
        [(1 << 33, "a", 3)], "doc_id long, text string, n_chars long"
    )
    with pytest.raises(SparkRuntimeException, match="packed argmax out of range"):
        dedup_keep_best(bad_id).collect()


def test_simhash_near_dup_pigeonhole_recall(spark):
    """Any pair within Hamming <= n_bands-1 over the signature space
    MUST be found (a shared intact band is guaranteed by pigeonhole),
    and reported Hamming distances are exact."""
    from monstache_spark.operators.dedup import simhash_near_dup_pairs, simhash_signatures

    rows = [
        (1, "spark catalyst optimizer plans queries fast"),
        (2, "spark catalyst optimizer plans queries fast"),   # exact copy: hamming 0
        (3, "spark catalyst optimizer plans queries slowly"), # near copy
        (4, "completely different words entirely unrelated here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df, shingle_k=2).collect()}
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_near_dup_pairs(df, shingle_k=2, max_hamming=31).collect()}
    assert out[(1, 2)] == 0
    for (a, b), h in out.items():
        assert h == bin(sigs[a] ^ sigs[b]).count("1")
    # exhaustive pigeonhole check: every pair within hamming 3 appears
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                assert (a, b) in out


def test_incremental_dedup_across_batches(spark, tmp_path):
    from monstache_spark.operators.dedup import FingerprintRegistry, incremental_dedup_batch

    reg = FingerprintRegistry(spark, str(tmp_path / "fps"))
    b0 = spark.createDataFrame(
        [(1, "hello world"), (2, "HELLO   world"), (3, "unique one")],
        "doc_id long, text string",
    )
    s0 = {r["doc_id"] for r in incremental_dedup_batch(reg, b0).collect()}
    # within-batch: canonical duplicate 2 loses to min-id 1
    assert s0 == {1, 3}
    b1 = spark.createDataFrame(
        [(10, "hello world"), (11, "fresh text"), (12, "fresh text")],
        "doc_id long, text string",
    )
    s1 = {r["doc_id"] for r in incremental_dedup_batch(reg, b1).collect()}
    # cross-batch: 10 collides with batch-0 history; 11 beats 12 in-batch
    assert s1 == {11}
    b2 = spark.createDataFrame([(20, "fresh text")], "doc_id long, text string")
    s2 = {r["doc_id"] for r in incremental_dedup_batch(reg, b2).collect()}
    assert s2 == set()
    # registry holds exactly one keeper per fingerprint ever admitted
    known = {(r["fp"], r["doc_id"]) for r in reg.known().collect()}
    assert {d for _, d in known} == {1, 3, 11}


def test_bucketed_registry_equals_flat_and_prunes(spark, tmp_path):
    """A digest-prefix-bucketed registry must admit exactly the same
    survivors as the flat layout, and a membership probe must prune
    the history scan to the batch's buckets (PartitionFilters)."""
    import re

    from monstache_spark.operators.dedup import FingerprintRegistry, incremental_dedup_batch

    flat = FingerprintRegistry(spark, str(tmp_path / "flat"))
    buck = FingerprintRegistry(spark, str(tmp_path / "buck"), n_buckets=8)
    batches = [
        [(i, f"text number {i % 7}") for i in range(10)],
        [(100 + i, f"text number {i % 11}") for i in range(12)],
        [(200 + i, f"fresh {i}") for i in range(5)],
    ]
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {r["doc_id"] for r in incremental_dedup_batch(flat, df).collect()}
        b = {r["doc_id"] for r in incremental_dedup_batch(buck, df).collect()}
        assert a == b
    # registries agree on the admitted fingerprint set
    fa = {(r["fp"], r["doc_id"]) for r in flat.known().collect()}
    fb = {(r["fp"], r["doc_id"]) for r in buck.known().select("fp", "doc_id").collect()}
    assert fa == fb
    # a probe scoped to one batch prunes the scan to that batch's buckets
    probe = spark.createDataFrame([("00ab" + "0" * 28,)], "fp string")
    pruned = buck.known(touching=probe)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1)


def test_incremental_dedup_survivors_stable_after_path_refresh(spark, tmp_path):
    """The returned survivor frame must NOT depend on re-reading the
    registry path it just appended to: after a file-index refresh the
    batch's own fingerprints would anti-join away its survivors."""
    from monstache_spark.operators.dedup import FingerprintRegistry, incremental_dedup_batch

    reg = FingerprintRegistry(spark, str(tmp_path / "fps"))
    b0 = spark.createDataFrame([(1, "seed text")], "doc_id long, text string")
    incremental_dedup_batch(reg, b0).collect()
    b1 = spark.createDataFrame(
        [(10, "brand new"), (11, "seed text")], "doc_id long, text string"
    )
    out = incremental_dedup_batch(reg, b1)
    # simulate a plan re-resolution between admit() and the caller's
    # action: invalidate the cached file listing for the registry path
    spark.catalog.refreshByPath(reg.path)
    assert {r["doc_id"] for r in out.collect()} == {10}


def test_incremental_dedup_equals_global_argmin_randomized(spark, tmp_path):
    """Randomized invariance: sequential batch admission == one-shot
    arg-min over (batch, id) per fingerprint."""
    import random

    from monstache_spark.operators.dedup import FingerprintRegistry, incremental_dedup_batch
    from monstache_spark.functions.text import fingerprint as _fp  # noqa: F401

    rng = random.Random(77)
    texts = [f"text variant {rng.randint(0, 25)}" for _ in range(60)]
    rows = [(i, texts[i]) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    reg = FingerprintRegistry(spark, str(tmp_path / "fps_rand"))
    survived = set()
    for b in range(3):
        batch = docs.filter(f"doc_id % 3 = {b}")
        survived |= {r["doc_id"] for r in incremental_dedup_batch(reg, batch).collect()}
    # expected: per canonical text, keeper = min over (batch, id)
    best = {}
    for i, t in rows:
        key = " ".join(t.lower().split())
        cand = (i % 3, i)
        if key not in best or cand < best[key]:
            best[key] = cand
    assert survived == {i for _, i in best.values()}


def test_registry_compaction_preserves_contents(spark, tmp_path):
    from monstache_spark.operators.dedup import FingerprintRegistry

    reg = FingerprintRegistry(spark, str(tmp_path / "reg"), n_buckets=8)
    for i in range(3):
        fps = spark.createDataFrame(
            [(f"{j:03x}fp{i}_{j}", i * 100 + j) for j in range(20)],
            "fp string, doc_id long",
        )
        reg.admit(fps)
    before = {(r["fp"], r["doc_id"]) for r in reg.known().select("fp", "doc_id").collect()}
    n_files = reg.compact()
    assert n_files > 8  # 3 admissions x touched buckets
    after_df = reg.known()
    after = {(r["fp"], r["doc_id"]) for r in after_df.select("fp", "doc_id").collect()}
    assert after == before
    # one file per bucket now
    assert len(after_df.inputFiles()) <= 8
    # registry still admits after compaction
    reg.admit(spark.createDataFrame([("fffpost", 999)], "fp string, doc_id long"))
    assert ("fffpost", 999) in {
        (r["fp"], r["doc_id"]) for r in reg.known().select("fp", "doc_id").collect()
    }


def test_incremental_near_dup_invariant_and_batch_split_independence(spark, tmp_path):
    from monstache_spark.operators.dedup import (
        FingerprintRegistry,
        incremental_near_dup_batch,
        minhash_band_rows,
    )
    from pyspark.sql import functions as F

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "completely different content about spark plans"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "unrelated text that shares nothing with others"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")

    def run(n_batches):
        reg = FingerprintRegistry(spark, str(tmp_path / f"reg{n_batches}"))
        kept = set()
        for b in range(n_batches):
            batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_batches)) == b)
            kept |= {r["doc_id"] for r in
                     incremental_near_dup_batch(reg, batch, shingle_k=2).collect()}
        return kept

    # closed-form invariant: survive iff arg-min holder of EVERY band
    # under the admission order (batch asc, id asc)
    def expected(n_batches):
        bands = minhash_band_rows(docs, shingle_k=2).collect()
        holder = {}
        for r in sorted(bands, key=lambda r: (r["doc_id"] % n_batches, r["doc_id"])):
            holder.setdefault(r["band"], r["doc_id"])
        losers = {r["doc_id"] for r in bands if holder[r["band"]] != r["doc_id"]}
        return {i for i, _ in texts} - losers

    assert run(2) == expected(2)
    assert run(5) == expected(5)
    # doc 3 (exact dup, later admission order) must never survive
    assert 3 not in run(2)

    # ids_only returns the identical survivor id SET without the
    # semi-join back through the batch (r14 optimization knob)
    reg = FingerprintRegistry(spark, str(tmp_path / "reg_ids_only"))
    kept_ids = set()
    for b in range(2):
        batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == b)
        out = incremental_near_dup_batch(reg, batch, shingle_k=2, ids_only=True)
        assert out.columns == ["doc_id"]
        kept_ids |= {r["doc_id"] for r in out.collect()}
    assert kept_ids == expected(2)


def test_minhash_collapsed_connectivity_equivalent(spark):
    from monstache_spark.operators.dedup import (
        connected_components,
        minhash_candidate_pairs,
        minhash_candidate_pairs_collapsed,
    )

    # 3 clone families (8 copies each) + near-dup variants + singletons
    base = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red green blue yellow purple orange",
    ]
    rows = []
    did = 0
    for fam in base:
        for _ in range(8):
            rows.append((did, fam)); did += 1
        rows.append((did, fam + " extra")); did += 1   # near-dup variant
    rows.append((did, "totally unrelated text here")); did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = minhash_candidate_pairs(df, shingle_k=2)
    coll = minhash_candidate_pairs_collapsed(df, shingle_k=2)
    n_full, n_coll = full.count(), coll.count()
    # clone cliques C(8,2)=28 collapse to 7 star edges per family
    assert n_coll < n_full
    cc_full = {(r["id"], r["cluster_id"])
               for r in connected_components(full).collect()}
    cc_coll = {(r["id"], r["cluster_id"])
               for r in connected_components(coll).collect()}
    assert cc_full == cc_coll
    # id ordering invariant
    assert coll.filter("id_a >= id_b").count() == 0


def test_registry_fp_pushdown_and_sorted_compaction(spark, tmp_path):
    """Round 10: known(touching=...) pushes the batch fingerprints as
    an In(fp) predicate (PushedFilters) on top of bucket pruning;
    compact() writes each bucket fp-sorted; membership semantics are
    unchanged on both the pushdown and the over-limit fallback path."""
    import re

    from monstache_spark.operators.dedup import (
        FingerprintRegistry,
        incremental_dedup_batch,
    )

    reg = FingerprintRegistry(spark, str(tmp_path / "r"), n_buckets=8)
    b0 = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(20)], "doc_id long, text string"
    )
    assert len(incremental_dedup_batch(reg, b0).collect()) == 20
    reg.compact(write_options={"parquet.block.size": str(64 * 1024)})

    # compacted buckets are fp-sorted
    import pyarrow.parquet as pq

    part_dirs = [p for p in (tmp_path / "r").iterdir() if p.name.startswith("bucket=")]
    assert part_dirs
    for d in part_dirs:
        for f in d.glob("*.parquet"):
            fps = pq.read_table(str(f), columns=["fp"])["fp"].to_pylist()
            assert fps == sorted(fps)

    # probe: In(fp) reaches the scan as a pushed filter
    b1 = spark.createDataFrame(
        [(100, "doc number 3"), (101, "unseen text")], "doc_id long, text string"
    )
    from monstache_spark.functions.text import fingerprint
    from pyspark.sql import functions as F

    fps1 = b1.select(fingerprint(F.col("text")).alias("fp"))
    pruned = reg.known(touching=fps1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\]]*In\(fp", plan), plan[:2000]
    # membership result: exactly the one colliding fingerprint
    assert pruned.count() == 1
    s = {r["doc_id"] for r in incremental_dedup_batch(reg, b1).collect()}
    assert s == {101}

    # over-limit fallback: buckets-only pruning, same survivors
    reg2 = FingerprintRegistry(spark, str(tmp_path / "r2"), n_buckets=8)
    reg2.PROBE_FP_LIMIT = 2  # instance override forces the fallback
    assert len(incremental_dedup_batch(reg2, b0).collect()) == 20
    b2 = spark.createDataFrame(
        [(200, "doc number 3"), (201, "doc number 4"), (202, "fresh a"),
         (203, "fresh b")],
        "doc_id long, text string",
    )
    s2 = {r["doc_id"] for r in incremental_dedup_batch(reg2, b2).collect()}
    assert s2 == {202, 203}


def test_containment_pairs(spark):
    """Asymmetric containment (r14): a short doc fully inside a long
    one scores c=1.0 in the contained direction even when Jaccard is
    low; the df_cap drops corpus-wide boilerplate shingles BEFORE the
    join and the sizes stay in the capped space."""
    import pytest

    from monstache_spark.operators.dedup import containment_pairs

    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(10, 20))  # contained
    other = " ".join(f"z{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, other)],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r for r in containment_pairs(
        docs, k=3, threshold=0.5).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # 8 shingles of the short doc, all present in the long doc
    assert r["n_b"] == 8 and r["n_inter"] == 8 and r["c_ba"] == 1.0
    assert r["c_ab"] < 0.25  # Jaccard-style symmetric view is low
    # df_cap: a boilerplate shingle shared by every doc must not
    # create pairs once capped below the corpus df
    boiler = "the same footer text"
    docs2 = spark.createDataFrame(
        [(i, f"u{i} v{i} x{i} " + boiler) for i in range(1, 6)],
        "doc_id long, text string",
    )
    assert containment_pairs(docs2, k=3, threshold=0.3).count() > 0
    assert containment_pairs(docs2, k=3, threshold=0.3,
                             df_cap=3).count() == 0
    with pytest.raises(ValueError, match="threshold"):
        containment_pairs(docs, threshold=1.5)
