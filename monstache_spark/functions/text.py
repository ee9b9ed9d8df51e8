"""Text-analysis functions for the training-data pipeline extensions.

Beyond monstache parity (the reference defers all per-doc computation to
user JS; our engine ships these as first-class, JVM-side operators):
token counting, quality scoring, language ID heuristics, and document
fingerprinting — all built-in-function compositions so they stay inside
whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic; deterministic and oracle-expressible.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "for", "it"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "im"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "une", "du"),
}

#: deterministic tiebreak order for the argmax language guess
LANG_ORDER = ("en", "de", "es", "fr")


def lang_guess(text: Column, threshold: float = 0.02) -> tuple[dict[str, Column], Column]:
    """Multi-language stopword scorer: per-language stopword ratios and
    an argmax guess (ties resolve to the earlier language in
    LANG_ORDER; below-threshold best score → 'other'). A character
    n-gram profile slots in the same shape for languages that don't
    whitespace-tokenize."""
    ratios = {lang: stopword_ratio(text, lang) for lang in LANG_ORDER}
    guess = F.lit("other")
    # build the chain back-to-front so earlier langs win ties
    for i in range(len(LANG_ORDER) - 1, -1, -1):
        lang = LANG_ORDER[i]
        cond = ratios[lang] >= threshold
        for later in LANG_ORDER[i + 1 :]:
            cond = cond & (ratios[lang] >= ratios[later])
        for earlier in LANG_ORDER[:i]:
            cond = cond & (ratios[lang] > ratios[earlier])
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
    return ratios, guess


def lang_guess_staged(df, text_col: str = "text", threshold: float = 0.02):
    """:func:`lang_guess` with the per-row work STAGED through real
    columns: the Column-DSL composition re-inlines each language's
    ratio expression into every argmax comparison (~40 copies of the
    tokenize+filter HOF per row, all interpreted — HOFs are excluded
    from codegen subexpression elimination; guide §4.3), so the plain
    form tokenizes each document ~40x.  Here the lowered token array
    is projected ONCE, per-language stopword counts once, and the
    guess chain compares ratio ATTRIBUTES; CollapseProject leaves the
    staging projections alone because the staged expressions are
    non-cheap and multiply referenced.

    Returns ``df`` plus ``_lr_<lang>`` (the RAW per-language ratio,
    value-identical to ``lang_guess``'s) and ``lang_guess``; callers
    round/rename and drop what they don't need.  The guess logic —
    tie-break to the earlier ``LANG_ORDER`` language, best-below-
    ``threshold`` → ``'other'`` — is the same chain, over the same
    double values."""
    ltoks = tokens(F.lower(F.col(text_col)))
    staged = df.withColumn("_lt", ltoks).withColumn(
        "_ln", token_count(F.col(text_col))
    )
    def _contains(sw):
        # closure factory, NOT a default arg: a 2-parameter lambda is
        # arity-probed by PySpark as the (element, index) HOF form
        return lambda t: F.array_contains(sw, t)

    for lang in LANG_ORDER:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        cnt = F.size(F.filter(F.col("_lt"), _contains(sw)))
        staged = staged.withColumn(
            f"_lr_{lang}",
            F.when(
                F.col("_ln") > 0, cnt.cast("double") / F.col("_ln").cast("double")
            ).otherwise(F.lit(0.0)),
        )
    r = {lang: F.col(f"_lr_{lang}") for lang in LANG_ORDER}
    guess = F.lit("other")
    for i in range(len(LANG_ORDER) - 1, -1, -1):
        lang = LANG_ORDER[i]
        cond = r[lang] >= threshold
        for later in LANG_ORDER[i + 1 :]:
            cond = cond & (r[lang] >= r[later])
        for earlier in LANG_ORDER[:i]:
            cond = cond & (r[lang] > r[earlier])
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
    return staged.withColumn("lang_guess", guess).drop("_lt", "_ln")


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty text → empty array."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length in doubles (0.0 for empty docs)."""
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Number of tokens that are stopwords (lowercased match)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_count(text, lang).cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def non_alpha_ratio(text: Column) -> Column:
    """Fraction of characters outside [a-zA-Z0-9 ] — a punctuation /
    noise proxy for quality scoring."""
    clean = F.regexp_replace(text, r"[a-zA-Z0-9 ]", "")
    n = F.length(text)
    return F.when(n > 0, F.length(clean).cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the lowercase, whitespace-collapsed
    text. Canonicalization makes trivially-reformatted copies collide."""
    canon = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(canon)


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as strings — the MinHash/Jaccard input unit.

    Built with sequence+transform over the token array (no UDF):
    shingle i = tokens[i..i+k) joined by single spaces.
    """
    toks = tokens(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


#: BPE-style pre-tokenization pattern (the GPT-2 pre-tokenizer shape,
#: simplified to the subset whose semantics are identical in Java regex
#: and DuckDB's RE2): letter runs, single digits, punctuation runs.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization: the units a byte-pair encoder would
    merge from. A cheap-but-useful proxy for LLM token counts (letters
    cluster, digits split, punctuation separates) that stays inside
    whole-stage codegen — no tokenizer library in the hot path."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def shingle_hash(shingle: Column, seed: int) -> Column:
    """Deterministic 32-bit-ish hash of a shingle for MinHash, built
    from md5 so the DuckDB oracle can reproduce it bit-for-bit:
    first 8 hex chars of md5(seed || shingle) as a BIGINT."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed) + ":"), shingle)), 1, 8), 16, 10).cast("long")


def char_bigram_rows(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(id, bigram) rows over canonicalized text (lowercase, collapsed
    whitespace) — the unit of the corpus-trained character LM. Docs
    shorter than 2 chars contribute nothing. The pre-explode spread
    (dedup._spread) parallelizes the ~len-per-doc amplification and
    pre-partitions for the per-doc score aggregate."""
    from pyspark.sql import functions as F

    from monstache_spark.operators.dedup import _spread

    canon = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = _spread(docs, id_col).select(F.col(id_col), canon.alias("_c"))
    n = F.length("_c")
    return base.filter(n >= 2).select(
        id_col,
        F.explode(F.sequence(F.lit(1), n - 1)).alias("_i"),
        F.col("_c"),
    ).select(id_col, F.col("_c").substr(F.col("_i"), F.lit(2)).alias("bigram"))


def train_bigram_lm(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-trained character-bigram model: (bigram, prob_micro)
    with prob_micro = floor(1e6 * count / total) — exact integer
    arithmetic, so any engine reproduces the model bit-for-bit.

    The model is index-metadata-sized (vocab² bigrams over the
    observed alphabet — thousands of rows at any corpus scale) and is
    always broadcast by consumers. Training is one hash aggregate on
    the 2-char gram plus a one-row total cross-joined back — the
    whole model build is a single DAG with no driver-side state, the
    in-engine analogue of CCNet's LM step."""
    from pyspark.sql import functions as F

    rows = char_bigram_rows(docs, text_col, id_col)
    counts = rows.groupBy("bigram").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_tot"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bigram",
        F.expr("cnt * 1000000 div _tot").cast("long").alias("prob_micro"),
    )


def bigram_lm_score(docs, model, text_col: str = "text", id_col: str = "doc_id"):
    """Score documents under a bigram model: mean model probability of
    the document's bigrams, in integer micro-units (unseen bigrams
    count 0) — the fluency/quality signal of an LM filter, kept in
    exact integers so ranking and oracle hashing never touch floats.
    Documents with fewer than 2 characters score 0 over 0 bigrams.

    Plan: explode bigrams → broadcast-join the model → per-doc sum
    with map-side partial combine (the spread in char_bigram_rows
    makes this aggregate exchange-free)."""
    from pyspark.sql import functions as F

    rows = char_bigram_rows(docs, text_col, id_col)
    scored = (
        rows.join(F.broadcast(model), "bigram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("prob_micro"), F.lit(0))).cast("long").alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.expr("_s div n_bigrams").cast("long").alias("avg_prob_micro"),
        )
    )
    ids = docs.select(id_col)
    return (
        ids.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("avg_prob_micro", F.lit(0).cast("long")).alias("avg_prob_micro"),
        )
    )


def bigram_lm_scored(docs, text_col: str = "text", id_col: str = "doc_id"):
    """:func:`train_bigram_lm` + :func:`bigram_lm_score` over the SAME
    corpus, in ONE gram pass (r14 optimization round; guide §2.2 —
    the two-call composition ran the canonicalize + explode
    amplification twice, since explode/HOF subtrees are never deduped
    across consumers).  The per-(doc, bigram) histogram is staged
    once (eager checkpoint, ~len→distinct-bigram compression per
    doc); the model's corpus counts and the per-doc scores both
    derive from it:

    * ``cnt(bigram) = Σ_doc _dc`` — same integer the direct count
      computed;
    * ``n_bigrams = Σ _dc = count(*)`` over gram rows;
    * ``_s = Σ _dc·coalesce(prob_micro, 0)`` — summing the per-bigram
      probability once per occurrence, exact integer arithmetic.

    Output is row-identical to the unfused composition
    (``test_bigram_lm_scored_matches_unfused`` pins it)."""
    rows = char_bigram_rows(docs, text_col, id_col)
    # LAZY checkpoint (r15; guide §2.2): the eager variant ran the
    # gram pass as its own job at frame-construction time — a flat
    # per-query constant that a small corpus never pays back
    # (measured r14: both gate queries regressed ~0.3-0.5 s at sf0.1
    # while the fused shape won ~40% at 50×).  Lazy materializes the
    # histogram inside the FIRST consuming job (the model broadcast
    # build) and the scoring pass reads the cached blocks — same
    # single gram pass, no extra job.  Statistics loss is harmless
    # here: every join below carries an explicit broadcast hint.
    hist = (
        rows.groupBy(id_col, "bigram")
        .agg(F.count("*").alias("_dc"))
        .localCheckpoint(eager=False)
    )
    counts = hist.groupBy("bigram").agg(F.sum("_dc").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_tot"))
    model = counts.crossJoin(F.broadcast(total)).select(
        "bigram",
        F.expr("cnt * 1000000 div _tot").cast("long").alias("prob_micro"),
    )
    scored = (
        hist.join(F.broadcast(model), "bigram", "left")
        .groupBy(id_col)
        .agg(
            F.sum("_dc").cast("long").alias("n_bigrams"),
            F.sum(F.col("_dc") * F.coalesce(F.col("prob_micro"), F.lit(0)))
            .cast("long")
            .alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.expr("_s div n_bigrams").cast("long").alias("avg_prob_micro"),
        )
    )
    ids = docs.select(id_col)
    return (
        ids.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("avg_prob_micro", F.lit(0).cast("long")).alias("avg_prob_micro"),
        )
    )
