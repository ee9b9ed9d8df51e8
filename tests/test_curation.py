"""Unit tests for the corpus-curation operators (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from monstache_spark.functions.text import shingle_hash
from monstache_spark.operators.curation import (
    boilerplate_stats,
    decontaminate,
    pack_sequences,
    pii_counts,
    redact_pii,
    repetition_stats,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pii_redaction_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.co.uk today"),
            (2, "call 555-123-4567 or 555-000-1111"),
            (3, "host 192.168.0.1 and ssn 123-45-6789"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    t = F.col("text")
    c = pii_counts(t)
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[c[k].alias(k) for k in ("email", "ssn", "phone", "ipv4")],
            redact_pii(t).alias("red"),
        ).collect()
    }
    assert out[1]["email"] == 1 and "[EMAIL]" in out[1]["red"]
    assert "@" not in out[1]["red"]
    assert out[2]["phone"] == 2 and out[2]["red"].count("[PHONE]") == 2
    assert out[3]["ipv4"] == 1 and out[3]["ssn"] == 1
    assert "[IP]" in out[3]["red"] and "[SSN]" in out[3]["red"]
    assert out[4]["red"] == "nothing sensitive here"
    # an SSN is not double-matched by the phone pattern
    assert out[3]["phone"] == 0


def test_boilerplate_stats_flags_repeated_spans(spark):
    footer = "all rights reserved by example corp"
    rows = [(i, f"unique words {i} alpha beta {footer}", "en") for i in range(4)]
    rows.append((9, "totally different content with no shared spans at all", "en"))
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r
        for r in boilerplate_stats(df, n=3, min_docs=3, hasher=lambda c: shingle_hash(c, 21)).collect()
    }
    # the footer's 3-grams repeat across 4 docs -> boilerplate
    assert out[0]["n_boiler"] >= 4
    assert out[9]["n_boiler"] == 0 and out[9]["boiler_bp"] == 0
    assert all(0 <= r["boiler_bp"] <= 10000 for r in out.values())


def test_decontaminate_broadcast_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog", "en")])
    train = _docs(
        spark,
        [
            (1, "prefix words then the quick brown fox jumps here", "en"),
            (2, "completely clean document with original phrasing", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=4).collect()}
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] >= 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0


def test_repetition_stats_degenerate_text(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam spam spam", "en"),
            (2, "eight distinct tokens make zero repeated trigrams here", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, n=3).collect()}
    assert out[1]["n_distinct"] == 1 and out[1]["dup_bp"] > 8000
    assert out[2]["dup_bp"] == 0 and out[2]["n_grams"] == out[2]["n_distinct"]


def test_stratified_sample_deterministic_and_bounded(spark):
    rows = [(i, f"doc {i}", "en" if i % 2 == 0 else "fr") for i in range(400)]
    df = _docs(spark, rows)
    a = stratified_sample(df, rates={"en": 0.5}, seed=11)
    b = stratified_sample(df, rates={"en": 0.5}, seed=11)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b  # pure function of (seed, id)
    kept = a.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in kept}
    assert by_lang["fr"] == 200  # default rate 1.0 keeps everything
    assert 60 <= by_lang["en"] <= 140  # ~50% of 200
    # different seed -> different membership
    c = stratified_sample(df, rates={"en": 0.5}, seed=12)
    assert sorted(r["doc_id"] for r in c.collect()) != ids_a


def test_pack_sequences_bins_respect_budget(spark):
    rows = [(i, " ".join(["w"] * 10), "en") for i in range(100)]
    df = _docs(spark, rows)
    out = pack_sequences(df, seq_len=50, n_shards=2, seed=13).collect()
    assert all(r["n_tokens"] == 10 for r in out)
    # within each (lang, shard, bin): at most 5 docs of 10 tokens fit a 50-token bin
    from collections import Counter

    sizes = Counter((r["shard"], r["bin"]) for r in out)
    assert all(v <= 5 for v in sizes.values())
    # bins are dense from 0 within each shard
    for shard in {r["shard"] for r in out}:
        bins = sorted({r["bin"] for r in out if r["shard"] == shard})
        assert bins == list(range(len(bins)))


def test_pack_sequences_long_doc_owns_bins(spark):
    df = _docs(spark, [(1, " ".join(["w"] * 120), "en"), (2, " ".join(["x"] * 5), "en")])
    out = {r["doc_id"]: r for r in pack_sequences(df, seq_len=50, n_shards=1).collect()}
    # doc 1 (120 tokens) starts at bin 0; doc 2 starts after it at bin 2
    assert out[1]["bin"] == 0
    assert out[2]["bin"] == 120 // 50


def test_mixture_stats_shares_sum_and_empty_docs(spark):
    from monstache_spark.operators.curation import mixture_stats

    rows = [
        (1, "one two three four", "en", "web"),
        (2, "cinq six", "fr", "web"),
        (3, "sept huit neuf", "fr", "books"),
        (4, "   ", "en", "web"),  # empty after trim -> 0 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {(r["source"], r["lang"]): r for r in mixture_stats(df).collect()}
    assert out[("web", "en")]["n_docs"] == 2
    assert out[("web", "en")]["n_tokens"] == 4
    assert out[("web", "fr")]["n_tokens"] == 2
    assert out[("books", "fr")]["n_tokens"] == 3
    # shares are floor(bp) of a 9-token corpus and never exceed 10000 total
    assert out[("web", "en")]["share_bp"] == 4444
    assert out[("web", "fr")]["share_bp"] == 2222
    assert out[("books", "fr")]["share_bp"] == 3333
    assert sum(r["share_bp"] for r in out.values()) <= 10000


def test_plan_mixture_zero_token_group_yields_zero_not_null(spark):
    from monstache_spark.operators.curation import plan_mixture

    rows = [
        (1, "alpha beta gamma", "web"),
        (2, "", "empty_src"),      # all-empty group: total_tokens == 0
        (3, "   ", "empty_src"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in plan_mixture(
        df, {"web": 5000, "empty_src": 5000}, token_budget=1000
    ).collect()}
    e = out["empty_src"]
    # keep-everything of nothing: no nulls leak into the plan
    assert e["total_tokens"] == 0
    assert e["sample_bp"] == 10000
    assert e["expected_tokens"] == 0


def test_dedup_spans_keeps_corpus_first_occurrence(spark):
    from monstache_spark.operators.curation import dedup_spans

    rows = [
        (1, "a b c d e f g h"),   # owns the corpus-first "a b c d"
        (2, "a b c d x y z w"),   # loses its copy
        (3, "a b c d"),           # fully deduplicated -> empty text
        (4, ""),                  # empty doc passes through
        (5, "q r s"),             # unique partial chunk survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_spans(df, w=4).collect()}
    assert out[1]["text"] == "a b c d e f g h" and out[1]["n_dropped"] == 0
    assert out[2]["text"] == "x y z w" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "" and out[3]["n_chunks"] == 1 and out[3]["n_dropped"] == 1
    assert out[4]["text"] == "" and out[4]["n_chunks"] == 0 and out[4]["n_dropped"] == 0
    assert out[5]["text"] == "q r s" and out[5]["n_dropped"] == 0


def test_dedup_spans_within_doc_repeat(spark):
    from monstache_spark.operators.curation import dedup_spans

    # the same chunk twice INSIDE one doc: first occurrence kept, second dropped
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    out = dedup_spans(df, w=2).collect()[0]
    assert out["text"] == "a b" and out["n_chunks"] == 2 and out["n_dropped"] == 1


def test_cap_per_domain_binds_and_is_deterministic(spark):
    from monstache_spark.operators.curation import cap_per_domain

    rows = [(i, "web" if i < 30 else "books") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_domain(df, cap=5, domain_col="source").collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    assert len(by_dom["web"]) == 5 and len(by_dom["books"]) == 5
    # ranks are 1..cap and ordered by (priority, doc_id)
    for dom, rs in by_dom.items():
        rs = sorted(rs, key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == [1, 2, 3, 4, 5]
        assert [
            (r["priority"], r["doc_id"]) for r in rs
        ] == sorted((r["priority"], r["doc_id"]) for r in rs)
    # two-stage salted rank == single-stage rank (exactness of the rewrite)
    single = cap_per_domain(df, cap=5, domain_col="source", n_salts=1).collect()
    assert sorted((r["doc_id"], r["rk"]) for r in out) == sorted(
        (r["doc_id"], r["rk"]) for r in single
    )


def test_quality_score_hashed_integer_contract(spark):
    from monstache_spark.operators.curation import quality_score_hashed

    rows = [(1, "alpha beta alpha"), (2, ""), (3, "   "), (4, "gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_score_hashed(df).collect()}
    assert set(out) == {1, 2, 3, 4}                     # empty docs not lost
    assert out[2]["n_tokens"] == 0 and out[2]["score_milli"] == 0 and out[2]["keep"] == 0
    assert out[3]["n_tokens"] == 0
    assert out[1]["n_tokens"] == 3
    # bag-of-words: repeated token counts twice; score is linear in tokens
    single = {r["doc_id"]: r for r in quality_score_hashed(
        spark.createDataFrame([(10, "alpha"), (11, "beta")], "doc_id long, text string")
    ).collect()}
    assert out[1]["score_milli"] == 2 * single[10]["score_milli"] + single[11]["score_milli"]
    assert out[1]["keep"] == (1 if out[1]["score_milli"] > 0 else 0)
    # weights bounded to milli-units
    assert abs(single[10]["score_milli"]) <= 1000


def test_fuzzy_decontaminate_catches_perturbed_copy(spark):
    from monstache_spark.operators.curation import decontaminate, fuzzy_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog near the river bank today"
    # paraphrase-style perturbation: a few tokens swapped, most shingles intact
    leaked = "the quick brown fox jumps over the lazy cat near the river bank today"
    clean = "completely unrelated text about spark partitions and shuffle exchanges"
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    docs = spark.createDataFrame([(1, leaked), (2, clean)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in fuzzy_decontaminate(docs, bench, shingle_k=2).collect()}
    assert out[1]["contaminated"] == 1 and out[1]["n_hit_bands"] >= 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hit_bands"] == 0
    # every doc gets a row, collision or not
    assert set(out) == {1, 2}


def test_cap_per_domain_two_stage_exactness_property(spark):
    """Property: for any (domain, id) layout, cap, and salt count, the
    two-stage salted rank selects exactly the same winners (and ranks)
    as the single-stage rank."""
    import random

    from monstache_spark.operators.curation import cap_per_domain

    rng = random.Random(99)
    for trial in range(4):
        n_dom = rng.randint(1, 4)
        rows = [
            (i, f"d{rng.randint(0, n_dom - 1)}")
            for i in range(rng.randint(1, 120))
        ]
        cap = rng.randint(1, 8)
        n_salts = rng.choice([2, 3, 8, 16])
        df = spark.createDataFrame(rows, "doc_id long, source string")
        fast = cap_per_domain(df, cap=cap, domain_col="source", n_salts=n_salts).collect()
        ref = cap_per_domain(df, cap=cap, domain_col="source", n_salts=1).collect()
        assert sorted((r["doc_id"], r["source"], r["rk"]) for r in fast) == sorted(
            (r["doc_id"], r["source"], r["rk"]) for r in ref
        ), f"trial={trial} cap={cap} n_salts={n_salts}"


def test_chunk_documents_window_stride_contract(spark):
    from monstache_spark.operators.curation import chunk_documents

    rows = [
        (1, "a b c d e f g"),  # 7 tokens: w=4 s=2 -> chunks at 0,2,4 (ceil(3/2)=2 -> 3 chunks)
        (2, "x y"),            # shorter than window -> one whole chunk
        (3, ""),               # empty -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, window=4, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    assert 3 not in by_doc
    c1 = by_doc[1]
    assert [c1[i]["chunk"] for i in range(3)] == ["a b c d", "c d e f", "e f g"]
    assert [c1[i]["n_tokens"] for i in range(3)] == [4, 4, 3]
    assert by_doc[2][0]["chunk"] == "x y" and by_doc[2][0]["n_tokens"] == 2
    # disjoint layout when stride == window
    disj = chunk_documents(df.filter("doc_id = 1"), window=3, stride=3).collect()
    assert sorted(r["chunk"] for r in disj) == ["a b c", "d e f", "g"]


def test_quality_top_fraction_quota_and_two_stage_exactness(spark):
    import random

    from monstache_spark.operators.curation import quality_top_fraction

    rng = random.Random(41)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = [
        (i, " ".join(rng.choices(words, k=rng.randint(1, 12))),
         "en" if i % 3 else "fr")
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_top_fraction(df, frac=0.25).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    import math
    n_en = sum(1 for _, _, l in rows if l == "en")
    n_fr = sum(1 for _, _, l in rows if l == "fr")
    assert len(by_lang["en"]) == math.ceil(0.25 * n_en)
    assert len(by_lang["fr"]) == math.ceil(0.25 * n_fr)
    # ranks are contiguous from 1 and ordered by (score desc, id asc)
    for rs in by_lang.values():
        rs = sorted(rs, key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["score_milli"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)
    # two-stage salted rank with column-valued quota == single-stage
    ref = quality_top_fraction(df, frac=0.25, n_salts=1).collect()
    assert sorted((r["doc_id"], r["rk"]) for r in out) == sorted(
        (r["doc_id"], r["rk"]) for r in ref
    )


def test_write_training_shards_layout_and_order(spark, tmp_path):
    import os

    from monstache_spark.operators.curation import pack_sequences, write_training_shards

    rows = [(i, " ".join(["tok"] * (5 + i % 7)), "en" if i % 2 else "fr") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    packed = pack_sequences(docs, seq_len=16, n_shards=2)
    out = str(tmp_path / "shards")
    write_training_shards(packed, out)
    # hive layout: lang=<stratum>/shard=<s> directories
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert langs == {"lang=en", "lang=fr"}
    shards = {d for d in os.listdir(os.path.join(out, "lang=en")) if d.startswith("shard=")}
    assert shards == {"shard=0", "shard=1"}
    # directory pruning serves a stratum-scoped read
    en = spark.read.parquet(out).filter("lang = 'en' and shard = 0")
    plan = en._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "lang" in m.group(1) and "shard" in m.group(1)
    # within one physical file, rows stream in (bin, doc_id) order
    part_dir = os.path.join(out, "lang=en", "shard=0")
    pfiles = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    import pyarrow.parquet as pq
    for f in pfiles:
        t = pq.read_table(os.path.join(part_dir, f)).to_pydict()
        keys = list(zip(t["bin"], t["doc_id"]))
        assert keys == sorted(keys)
    # round-trip: every packed row lands exactly once
    assert spark.read.parquet(out).count() == packed.count()


def test_gopher_signals_and_filter(spark):
    from monstache_spark.operators.curation import (
        gopher_quality_filter,
        gopher_quality_signals,
    )

    good = (
        "the quick brown fox jumps to be of and that have with more words " * 5
    ).strip()
    rows = [
        (0, good),                                   # passes every rule
        (1, "short text the be"),                    # < 50 words
        (2, ("### " * 60 + "the be of and").strip()),  # symbol ratio + alpha
        (3, "\n".join(["- bullet the be of"] * 60)),   # 100% bullet lines
        (4, ("xx " * 60 + "the be").strip()),        # mean word len < 3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r.asDict() for r in gopher_quality_signals(docs).collect()}
    assert sig[0]["passes"] and sig[0]["n_stopwords_present"] >= 2
    assert not sig[1]["passes"] and sig[1]["n_words"] < 50
    assert not sig[2]["passes"] and sig[2]["symbol_word_bp"] > 1000
    assert not sig[3]["passes"] and sig[3]["bullet_line_bp"] == 10000
    assert not sig[4]["passes"] and sig[4]["mean_word_len_bp"] < 30000
    kept = [r["doc_id"] for r in gopher_quality_filter(docs).collect()]
    assert kept == [0]


def test_dsir_upweights_target_like_documents(spark):
    """Docs resembling the target distribution score higher; Gumbel
    resample is deterministic and ranks every doc exactly once."""
    from monstache_spark.operators.curation import (
        dsir_bucket_model,
        dsir_gumbel_sample,
        dsir_importance_weights,
    )

    target_like = "the cat sat on the mat and the dog sat too"
    off_dist = "zzz qqq vvv kkk jjj xxx www yyy uuu ttt"
    rows = [(i, target_like) for i in range(10)] + [(i, off_dist) for i in range(10, 20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id < 5")  # target distribution = target_like docs
    model = dsir_bucket_model(docs, target, n_buckets=64, k=2)
    wts = dsir_importance_weights(docs, model, n_buckets=64, k=2)
    by_id = {r["doc_id"]: r["score"] for r in wts.collect()}
    assert len(by_id) == 20
    assert min(by_id[i] for i in range(10)) > max(by_id[i] for i in range(10, 20))
    s1 = dsir_gumbel_sample(wts, k_sample=5).collect()
    s2 = dsir_gumbel_sample(wts, k_sample=5).collect()
    assert sorted(r["rank"] for r in s1) == list(range(1, 21))
    assert {r["doc_id"] for r in s1 if r["sampled"]} == {r["doc_id"] for r in s2 if r["sampled"]}


def test_lang_guess_staged_matches_plain(spark):
    """The staged lang scorer (token stream projected once) is
    value-identical to the Column-DSL lang_guess composition —
    ratios bit-equal, guess equal — including empty text, sub-threshold
    docs, and tie shapes."""
    from pyspark.sql import functions as F

    from monstache_spark.functions.text import (
        LANG_ORDER,
        lang_guess,
        lang_guess_staged,
    )

    rows = [
        (0, "the cat sat on the mat and it is that for the win"),
        (1, "der hund und die katze sind im haus mit den kindern"),
        (2, "el perro y el gato en la casa que no se ve"),
        (3, "le chat et le chien en la maison des amis du parc"),
        (4, ""),  # empty: all ratios 0.0, guess 'other'
        (5, "zzz qqq www"),  # below threshold
        (6, "de de de de"),  # 'de' is a stopword in es AND fr: tie-break
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ratios, guess = lang_guess(F.col("text"))
    plain = docs.select(
        "doc_id",
        *[r.alias(f"r_{lang}") for lang, r in ratios.items()],
        guess.alias("lang_guess"),
    )
    staged = lang_guess_staged(docs).select(
        "doc_id",
        *[F.col(f"_lr_{lang}").alias(f"r_{lang}") for lang in LANG_ORDER],
        "lang_guess",
    )
    a = {r["doc_id"]: tuple(r)[1:] for r in plain.collect()}
    b = {r["doc_id"]: tuple(r)[1:] for r in staged.collect()}
    assert a == b  # raw double bits + guess identical


def test_dsir_scores_matches_unfused(spark):
    """The one-gram-pass dsir_scores is bit-identical to the
    dsir_bucket_model + dsir_importance_weights composition when the
    target is a predicate over the same corpus — including docs on
    real testdata-like text with repeats, short docs, and an empty
    doc (the whole-doc '' shingle path)."""
    from pyspark.sql import functions as F

    from monstache_spark.functions.text import shingle_hash
    from monstache_spark.operators.curation import (
        dsir_bucket_model,
        dsir_importance_weights,
        dsir_scores,
    )

    rows = [
        (0, "the cat sat on the mat and the cat sat again", "en"),
        (1, "le chat est assis sur le tapis", "fr"),
        (2, "the dog ran over the mat", "en"),
        (3, "one", "en"),  # < k tokens: whole-doc shingle
        (4, "", "fr"),  # empty text: '' shingle
        (5, "zzz qqq vvv the kkk jjj", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    hasher = lambda c: shingle_hash(c, 1)  # noqa: E731

    model = dsir_bucket_model(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=32, k=2, hasher=hasher
    )
    unfused = dsir_importance_weights(docs, model, n_buckets=32, k=2, hasher=hasher)
    fused = dsir_scores(
        docs, F.col("lang") == "en", n_buckets=32, k=2, hasher=hasher
    )
    a = {r["doc_id"]: (r["n_grams"], r["score"]) for r in unfused.collect()}
    b = {r["doc_id"]: (r["n_grams"], r["score"]) for r in fused.collect()}
    assert a == b  # exact equality incl. the float score bits


def test_corpus_overlap_counts_and_omits_disjoint(spark):
    from monstache_spark.operators.curation import corpus_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),
            (2, "a b c e", "s2"),   # shares 2-gram "a b", "b c" with s1
            (3, "x y z w", "s3"),   # disjoint from both
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["src_a"], r["src_b"]): (r["n_shared"], r["jaccard_bp"], r["contain_a_bp"])
        for r in corpus_overlap(docs, n=2).collect()
    }
    # s1 grams: {a b, b c, c d}; s2: {a b, b c, c e} -> shared 2,
    # union 4 -> jaccard 5000 bp, containment 2/3 -> 6666 bp
    assert out == {("s1", "s2"): (2, 5000, 6666)}


def test_score_decile_map_buckets_uniform_scores(spark):
    from monstache_spark.operators.curation import score_decile_map

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "doc_id long, s long"
    )
    out = {r["decile"]: r for r in score_decile_map(df, "s", n_buckets=10).collect()}
    assert set(out) == set(range(1, 11))
    assert all(r["n_docs"] == 10 for r in out.values())
    # buckets are ordered and contiguous in score space
    assert out[1]["min_score"] == 0 and out[10]["max_score"] == 990
    for d in range(1, 10):
        assert out[d]["max_score"] < out[d + 1]["min_score"]


def test_data_card_summary_arithmetic(spark):
    from monstache_spark.operators.curation import data_card

    docs = spark.createDataFrame(
        [
            (1, "hello world", "en", "a"),
            (2, "hello world", "en", "a"),      # exact dup of 1
            (3, "mail me at x@y.com now", "en", "b"),
            (4, "autre texte ici", "fr", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    card = data_card(docs).collect()[0]
    assert card["n_docs"] == 4
    assert card["n_langs"] == 2 and card["n_sources"] == 2
    assert card["top_lang"] == "en" and card["top_lang_docs"] == 3
    assert card["dup_docs_bp"] == 2500       # 1 of 4 docs is a dup
    assert card["pii_docs_bp"] == 2500       # doc 3 has an email
    assert card["total_tokens"] == 2 + 2 + 5 + 3


def test_cluster_balanced_sample_caps_dominant_cluster(spark):
    from monstache_spark.operators.curation import cluster_balanced_sample

    # centroids = ids 0,1 (e1/e2 axes); ids 2..11 cluster on axis 0,
    # ids 12..14 on axis 1 — a dominant cluster and a tail cluster
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    rows += [(i, [1.0, 0.05 * (i % 3)]) for i in range(2, 12)]
    rows += [(i, [0.05, 1.0]) for i in range(12, 15)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balanced_sample(df, per_cluster_cap=4, n_centroids=2)
    by_cell = {}
    for r in out.collect():
        by_cell.setdefault(r["cell"], set()).add(r["vec_id"])
    # dominant cluster capped at 4; tail cluster (4 members incl. its
    # centroid) survives whole
    assert len(by_cell[0]) == 4 and len(by_cell[1]) == 4
    assert by_cell[1] == {1, 12, 13, 14}
    # deterministic: same picks on re-run
    again = {(r["vec_id"], r["cell"], r["pick_rank"]) for r in
             cluster_balanced_sample(df, per_cluster_cap=4, n_centroids=2).collect()}
    assert again == {(r["vec_id"], r["cell"], r["pick_rank"]) for r in out.collect()}
    # incrementally stable: adding rows keeps survivors whose hash
    # rank still clears the cap — picks are a function of (seed, id)
    plan = cluster_balanced_sample(df, per_cluster_cap=4, n_centroids=2)
    pl = plan._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in pl


def test_render_chat_text_and_loss_mask_spans(spark):
    from monstache_spark.operators.curation import render_chat

    df = spark.createDataFrame(
        [(1, [("system", "be brief"), ("user", "hi"),
              ("assistant", "hello"), ("user", "more"),
              ("assistant", "ok")])],
        "doc_id long, messages array<struct<role string, content string>>",
    )
    r = render_chat(df).collect()[0]
    expect = ("<|im_start|>system\nbe brief<|im_end|>\n"
              "<|im_start|>user\nhi<|im_end|>\n"
              "<|im_start|>assistant\nhello<|im_end|>\n"
              "<|im_start|>user\nmore<|im_end|>\n"
              "<|im_start|>assistant\nok<|im_end|>\n")
    assert r["text"] == expect
    # every span slices exactly the assistant content
    slices = [r["text"][sp["s"]:sp["e"]] for sp in r["assistant_spans"]]
    assert slices == ["hello", "ok"]
    assert r["n_turns"] == 5 and r["assistant_chars"] == 7
    # empty conversation
    df2 = spark.createDataFrame(
        [(2, [])], "doc_id long, messages array<struct<role string, content string>>")
    r2 = render_chat(df2).collect()[0]
    assert r2["text"] == "" and r2["assistant_spans"] == [] and r2["assistant_chars"] == 0


def test_dpo_pairs_best_vs_worst(spark):
    from monstache_spark.operators.curation import dpo_pairs

    df = spark.createDataFrame(
        [
            (1, "p1", "good", 0.9), (2, "p1", "bad", 0.1), (3, "p1", "mid", 0.5),
            (4, "p2", "only", 0.7),                       # single candidate drops
            (5, "p3", "a", 0.6), (6, "p3", "b", 0.6),      # tie: margin 0
            (7, "p4", "hi", 0.8), (8, "p4", "lo", 0.75),   # margin 0.05
        ],
        "id long, prompt string, completion string, score double",
    )
    out = {r["prompt"]: r for r in dpo_pairs(
        df, "prompt", "completion", "score", "id").collect()}
    assert set(out) == {"p1", "p3", "p4"}
    assert (out["p1"]["chosen"], out["p1"]["rejected"]) == ("good", "bad")
    assert out["p1"]["margin"] == 0.8
    # tie on both extremes: lowest id wins both picks
    assert (out["p3"]["chosen"], out["p3"]["rejected"]) == ("a", "a")
    # min_margin filters narrow pairs
    out = {r["prompt"] for r in dpo_pairs(
        df, "prompt", "completion", "score", "id", min_margin=0.1).collect()}
    assert out == {"p1"}


def test_curriculum_interleave_round_robin(spark):
    from monstache_spark.operators.curation import curriculum_interleave

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "id long, difficulty double")
    out = sorted(
        ((r["order_idx"], r["id"], r["stratum"]) for r in
         curriculum_interleave(df, "difficulty", "id", n_strata=2).collect())
    )
    # strata: ids 1-4 (easy), 5-8 (hard); order alternates E H E H ...
    assert [(o, i) for o, i, _ in out] == [
        (0, 1), (1, 5), (2, 2), (3, 6), (4, 3), (5, 7), (6, 4), (7, 8)]


def test_deterministic_shuffle_reproducible(spark):
    from monstache_spark.operators.curation import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(20)], "id long")
    a = [r["id"] for r in deterministic_shuffle(df, "id", seed="1")
         .orderBy("epoch_pos").collect()]
    b = [r["id"] for r in deterministic_shuffle(df, "id", seed="1")
         .orderBy("epoch_pos").collect()]
    c = [r["id"] for r in deterministic_shuffle(df, "id", seed="2")
         .orderBy("epoch_pos").collect()]
    assert a == b            # same seed -> identical epoch order
    assert a != c            # different seed -> different permutation
    assert sorted(a) == list(range(20))
    assert a != list(range(20))  # actually shuffled


def test_best_of_n_ties_and_stats(spark):
    from monstache_spark.operators.curation import best_of_n

    cands = spark.createDataFrame(
        [
            (1, 10, 5.0), (1, 11, 9.0), (1, 12, 9.0),  # tie -> min cand 11
            (2, 20, 4.0),
        ],
        "prompt_id long, cand_id long, reward double",
    )
    out = {r["prompt_id"]: r for r in best_of_n(cands).collect()}
    assert out[1]["best_cand"] == 11 and out[1]["best_reward"] == 9.0
    assert out[1]["n_candidates"] == 3
    assert abs(out[1]["reward_mean"] - (23.0 / 3)) < 1e-6
    assert out[2]["best_cand"] == 20 and out[2]["n_candidates"] == 1
    assert out[2]["margin"] == 0.0


def test_length_buckets_edges_and_overflow(spark):
    from monstache_spark.operators.curation import length_buckets

    import pytest as _pt

    docs = spark.createDataFrame(
        [
            (1, "a b"),                    # 2 tokens  -> bucket 4
            (2, "a b c d"),                # 4 tokens  -> bucket 4 (edge)
            (3, "a b c d e"),              # 5 tokens  -> bucket 8
            (4, " ".join(["x"] * 20)),     # 20 tokens -> last bucket 8, truncates
        ],
        "doc_id long, text string",
    )
    out = {r["bucket"]: r for r in length_buckets(docs, [4, 8]).collect()}
    assert out[4]["n_docs"] == 2 and out[4]["sum_tokens"] == 6
    assert out[4]["capacity"] == 8 and out[4]["kept_tokens"] == 6
    assert out[4]["waste_bp"] == 2500
    # bucket 8: doc 3 (5 kept) + doc 4 (truncated to 8 of 20)
    assert out[8]["n_docs"] == 2 and out[8]["sum_tokens"] == 25
    assert out[8]["kept_tokens"] == 13 and out[8]["capacity"] == 16
    assert out[8]["waste_bp"] == 1875
    with _pt.raises(ValueError, match="strictly increasing"):
        length_buckets(docs, [8, 4])


def test_train_val_test_split_stability_and_grouping(spark):
    """Leakage-safe split: same key -> same side regardless of the
    rest of the corpus (stable under growth, unlike randomSplit);
    group keying puts every doc of a key on one side; fractions are
    roughly honored; bad fractions refuse."""
    import pytest as _pytest

    from monstache_spark.operators.curation import train_val_test_split

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 20).cast("string").alias("domain"),
    )
    out = train_val_test_split(docs, "doc_id").collect()
    sides = {r["doc_id"]: r["split"] for r in out}
    counts = {}
    for s in sides.values():
        counts[s] = counts.get(s, 0) + 1
    assert 0.85 < counts["train"] / 2000 < 0.95
    assert counts["val"] > 0 and counts["test"] > 0
    # stability: the same ids in a DIFFERENT corpus keep their side
    sub = train_val_test_split(
        docs.filter(F.col("doc_id") < 100), "doc_id"
    ).collect()
    assert all(sides[r["doc_id"]] == r["split"] for r in sub)
    # group keying: one side per domain
    grouped = train_val_test_split(docs, key_col="domain",
                                   fractions=(0.5, 0.25, 0.25))
    per_dom = grouped.groupBy("domain").agg(
        F.countDistinct("split").alias("n")
    ).collect()
    assert all(r["n"] == 1 for r in per_dom)
    with _pytest.raises(ValueError, match="sum to 1"):
        train_val_test_split(docs, fractions=(0.9, 0.05), names=("a", "b"))
    with _pytest.raises(ValueError, match="one name each"):
        train_val_test_split(docs, fractions=(0.5, 0.5),
                             names=("a", "b", "c"))


def test_token_budget_sample_semantics(spark):
    """Token-budget slice: the kept set is the shortest prefix (in
    md5-shuffle order) whose tokens reach the budget — including the
    straddling doc; per-stratum budgets are independent; the result
    is a pure function of (seed, ids) regardless of partitioning;
    bad budgets refuse."""
    import pytest as _pytest

    from monstache_spark.operators.curation import token_budget_sample

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        # 5 tokens per doc
        F.lit("a b c d e").alias("text"),
    )
    out = token_budget_sample(docs, 50, stratum_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        kept = [r for r in rows if r["keep"]]
        # 5 tokens/doc, budget 50 -> exactly 10 docs per stratum
        assert len(kept) == 10, (lang, len(kept))
        assert max(r["cum_before"] for r in kept) == 45
        dropped = [r for r in rows if not r["keep"]]
        assert min(r["cum_before"] for r in dropped) == 50
    # partitioning must not change the slice
    out2 = token_budget_sample(
        docs.repartition(7), 50, stratum_col="lang"
    ).collect()
    assert {(r["doc_id"], r["keep"]) for r in out2} == {
        (r["doc_id"], r["keep"]) for r in out
    }
    # unstratified: one global budget; straddling doc included
    g = token_budget_sample(docs, 7).collect()
    kept = sorted(r["cum_before"] for r in g if r["keep"])
    assert kept == [0, 5]          # 0 < 7 and 5 < 7; next is 10
    with _pytest.raises(ValueError, match="positive"):
        token_budget_sample(docs, 0)
    with _pytest.raises(ValueError, match="n_buckets"):
        token_budget_sample(docs, 10, n_buckets=0)
    # NULL stratum is a real stratum with its own budget — the offset
    # join is null-safe, so NULL-lang docs must NOT vanish (r11 advice)
    nullable = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, F.col("lang"))
    )
    n_out = token_budget_sample(nullable, 50, stratum_col="lang")
    rows = n_out.collect()
    assert len(rows) == 200  # every doc gets a row, NULL stratum included
    null_kept = [r for r in rows if r["lang"] is None and r["keep"]]
    assert len(null_kept) == 10  # 5 tokens/doc, budget 50


def test_temperature_sample(spark):
    import pytest

    from monstache_spark.operators.curation import temperature_sample

    # skewed corpus: 64 'big' docs, 8 'small'
    rows = [(i, "big" if i < 64 else "small") for i in range(72)]
    df = spark.createDataFrame(rows, "doc_id long, src string")

    def probs(t):
        out = temperature_sample(
            df, temperature=t, doc_budget=40, group_col="src"
        )
        return {r["src"]: (r["p"], r["keep_frac"])
                for r in out.select("src", "p", "keep_frac")
                .distinct().collect()}

    p1 = probs(1.0)
    p4 = probs(4.0)
    # T=1 is proportional: p ratio equals the 8:1 count ratio (up to
    # the 6-dp rounding of each probability)
    assert abs(p1["big"][0] / p1["small"][0] - 8.0) < 1e-3
    # higher temperature flattens the mixture toward uniform
    assert p4["big"][0] / p4["small"][0] < p1["big"][0] / p1["small"][0]
    # a source asked for more than it has caps at keep-everything
    outcap = temperature_sample(
        df, temperature=1.0, doc_budget=10_000, group_col="src"
    )
    kf = {r["src"]: r["keep_frac"]
          for r in outcap.select("src", "keep_frac").distinct().collect()}
    assert kf == {"big": 1.0, "small": 1.0}
    assert outcap.count() == 72  # keep_frac 1.0 keeps every doc
    # membership is deterministic and partitioning-invariant
    a = sorted(r["doc_id"] for r in temperature_sample(
        df, 2.0, 40, group_col="src").select("doc_id").collect())
    b = sorted(r["doc_id"] for r in temperature_sample(
        df.repartition(7), 2.0, 40, group_col="src")
        .select("doc_id").collect())
    assert a == b and 0 < len(a) < 72
    with pytest.raises(ValueError, match="temperature"):
        temperature_sample(df, 0.0, 40, group_col="src")
    with pytest.raises(ValueError, match="doc_budget"):
        temperature_sample(df, 1.0, 0, group_col="src")


def test_temperature_sample_null_group_excluded(spark):
    """ADVICE r13: docs with a NULL group_col are excluded BEFORE the
    count agg — a NULL stratum would inflate the weight denominator
    (skewing every p_s) while the equi-join back can never match it,
    so its budget mass was silently unspendable."""
    from monstache_spark.operators.curation import temperature_sample

    rows = [(i, "big" if i < 64 else "small") for i in range(72)]
    clean = spark.createDataFrame(rows, "doc_id long, src string")
    dirty = clean.unionByName(spark.createDataFrame(
        [(100 + i, None) for i in range(500)], "doc_id long, src string"
    ))
    # the NULL stratum must not perturb the mixture: p and keep_frac
    # per labeled source are identical with and without NULL docs
    def stats(df):
        return {
            r["src"]: (r["p"], r["keep_frac"])
            for r in temperature_sample(
                df, temperature=2.0, doc_budget=40, group_col="src"
            ).select("src", "p", "keep_frac").distinct().collect()
        }
    assert stats(dirty) == stats(clean)
    # and NULL-group docs never appear in the output
    out = temperature_sample(
        dirty, temperature=1.0, doc_budget=10_000, group_col="src"
    )
    assert out.filter("src IS NULL").count() == 0
    assert out.count() == 72
