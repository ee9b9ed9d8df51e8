"""Distributed WordPiece tokenizer training and MaxMatch segmentation.

WordPiece (Schuster & Nakajima 2012; the BERT tokenizer, and the
trainer shipped by the public HuggingFace ``tokenizers`` library)
completes the engine's subword trio next to BPE (operators/tokenizer)
and Unigram-LM (operators/unigram).  Two public pieces:

* :func:`wordpiece_train` — greedy merge learning like BPE but scored
  by LIKELIHOOD, ``score(a,b) = count(ab) / (count(a)·count(b))`` —
  the merge that most increases corpus likelihood under a unigram
  factorization, which is what separates WordPiece from plain
  frequency BPE.  Same two-level execution as ``bpe_train``: ONE
  corpus-sized word-count pass, then the loop runs over the
  Heaps-small distinct-word table — driver-side with exact recounting
  when the vocab fits the budget, distributed (argmax row per
  iteration, vocab never leaves the cluster) when it doesn't.  Both
  paths bit-identical (same IEEE double score, same tie-break: score
  desc, left asc, right asc) and pinned to a pure-Python reference by
  tests/test_wordpiece.py.

* :func:`wordpiece_segment` — the MaxMatch (greedy longest-prefix)
  algorithm the WordPiece MODEL actually runs at inference (BERT's
  ``##`` continuation convention; a word with any uncoverable position
  becomes one ``[UNK]``, the HF contract).  Spark-first shape: the
  corpus collapses to the DISTINCT-WORD frame once; every (pos, len ≤
  max token length) substring candidate joins the vocabulary frame
  (broadcast — vocab is alphabet + merges, control-plane-sized); the
  greedy walk is ONE ``F.aggregate`` fold per word over the
  best-match-length array (jumping cursor, no per-row Python); then
  per-doc stats come from joining words back — so the expensive
  matching work is paid per distinct word, not per corpus occurrence.

No SQL oracle can express the data-dependent training iteration, so
the gate queries freeze the sf0.01 result as VALUES (the
``bpe_train_merges`` precedent); segmentation is additionally pinned
against a pure-Python HF-style reference in unit tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from monstache_spark.operators.tokenizer import word_counts

#: BERT continuation prefix: a non-initial piece of a word.
CONT = "##"


def _initial_symbols(word: Column) -> Column:
    """Space-joined WordPiece symbols: first char bare, every later
    char ``##``-prefixed — ``'low'`` → ``'l ##o ##w'``."""
    chars = F.split(word, "")
    marked = F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit(CONT), c)),
    )
    return F.array_join(marked, " ")


def _merged_token(left: str, right: str) -> str:
    """The token a merge produces: the right side is never
    word-initial, so its ``##`` drops; the left side keeps its own."""
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def _apply_merge_token(
    syms: Column, left: str, right: str, token: str
) -> Column:
    """Merge every adjacent (left, right) into ``token`` in a
    space-joined symbol string — the EXACT left-to-right
    non-overlapping tuple scan of the driver loop
    (tokenizer._apply_merge_exact; the replace-chain shortcut
    diverges on self-overlapping runs), with the merged symbol being
    the WordPiece token (continuation ``##`` dropped from the right
    side), not the verbatim concatenation."""
    from monstache_spark.operators.tokenizer import _apply_merge_exact

    return _apply_merge_exact(syms, left, right, token)


def _py_symbols(word: str) -> tuple[str, ...]:
    return tuple(
        ch if i == 0 else CONT + ch for i, ch in enumerate(word)
    )


def _driver_wp_loop(
    words: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, str, int]]:
    """Exact greedy WordPiece over a collected (word, count) vocab —
    semantically identical to the distributed loop (same IEEE double
    score ``c/(c_l·c_r)``, same tie-break score desc / left asc /
    right asc, same simultaneous non-overlapping left-to-right
    merge).  Recounts per iteration: O(|vocab|·len) per merge, the
    right cost model for a driver-resident vocabulary."""
    vocab: list[tuple[tuple[str, ...], int]] = [
        (_py_symbols(w), n) for w, n in words
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pc: dict = {}
        sc: dict = {}
        for syms, n in vocab:
            for s in syms:
                sc[s] = sc.get(s, 0) + n
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        best = None
        for (a, b), c in pc.items():
            if c < min_pair_count:
                continue
            score = float(c) / (float(sc[a]) * float(sc[b]))
            key = (-score, a, b)
            if best is None or key < best[0]:
                best = (key, a, b, c)
        if best is None:
            break
        _, left, right, c = best
        token = _merged_token(left, right)
        merges.append((rank, left, right, token, int(c)))
        nxt = []
        for syms, n in vocab:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(token)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((tuple(out), n))
        vocab = nxt
    return merges


def wordpiece_train(
    docs: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
    driver_vocab_budget: int | None = 200_000,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` WordPiece merges; returns
    ``[(rank, left, right, token, pair_count), ...]`` in merge order.

    Differs from :func:`tokenizer.bpe_train` only in the selection
    rule: argmax of ``count(pair) / (count(left)·count(right))`` (the
    likelihood gain of the merge under a unigram factorization) — so
    each iteration takes TWO vocab-sized hash aggs (pair counts +
    symbol counts) joined on the pair's endpoints, still never a
    corpus pass.  Ties on the double score break left asc / right asc
    (two rationally-distinct scores equal as doubles would tie-break
    lexically — both paths share the rule, documented).
    ``driver_vocab_budget=None`` forces the distributed loop.
    """
    wc = word_counts(docs, text_col, id_col)
    if driver_vocab_budget is not None:
        head = wc.take(driver_vocab_budget + 1)
        if len(head) <= driver_vocab_budget:
            return _driver_wp_loop(
                [(r["word"], r["n"]) for r in head], n_merges, min_pair_count
            )
    vocab = wc.select(
        "word", "n", _initial_symbols(F.col("word")).alias("syms")
    )
    cached = vocab.persist()
    cached.count()
    vocab = cached
    merges: list[tuple[int, str, str, str, int]] = []
    since_checkpoint = 0
    try:
        for rank in range(n_merges):
            arr = F.split(F.col("syms"), " ")
            sym_counts = (
                vocab.select("n", F.explode(arr).alias("sym"))
                .groupBy("sym")
                .agg(F.sum("n").cast("long").alias("sc"))
            )
            idx = F.when(
                F.size(arr) >= 2, F.sequence(F.lit(0), F.size(arr) - 2)
            ).otherwise(F.array().cast("array<int>"))
            pairs = F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(arr, i + 1).alias("left"),
                    F.element_at(arr, i + 2).alias("right"),
                ),
            )
            pc = (
                vocab.select("n", F.explode(pairs).alias("p"))
                .groupBy("p.left", "p.right")
                .agg(F.sum("n").cast("long").alias("c"))
                .filter(F.col("c") >= F.lit(min_pair_count))
            )
            scored = (
                pc.join(
                    F.broadcast(
                        sym_counts.select(
                            F.col("sym").alias("left"),
                            F.col("sc").alias("lc"),
                        )
                    ),
                    "left",
                )
                .join(
                    F.broadcast(
                        sym_counts.select(
                            F.col("sym").alias("right"),
                            F.col("sc").alias("rc"),
                        )
                    ),
                    "right",
                )
                .withColumn(
                    "score",
                    F.col("c").cast("double")
                    / (
                        F.col("lc").cast("double")
                        * F.col("rc").cast("double")
                    ),
                )
            )
            top = (
                scored.orderBy(
                    F.col("score").desc(),
                    F.col("left").asc(),
                    F.col("right").asc(),
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right, c = top[0]["left"], top[0]["right"], int(top[0]["c"])
            token = _merged_token(left, right)
            merges.append((rank, left, right, token, c))
            vocab = vocab.select(
                "word",
                "n",
                _apply_merge_token(
                    F.col("syms"), left, right, token
                ).alias("syms"),
            )
            since_checkpoint += 1
            if since_checkpoint >= checkpoint_every:
                nxt = vocab.persist()
                nxt.count()
                cached.unpersist()
                cached = nxt
                vocab = nxt
                since_checkpoint = 0
    finally:
        cached.unpersist()
    return merges


def wordpiece_vocab(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
) -> list[str]:
    """The model vocabulary a merge table induces: every single-char
    symbol seen in the corpus (bare + ``##`` continuation forms, the
    trainer's alphabet) plus each merge's token — the HF WordPiece
    vocab construction.  The alphabet comes from one distinct-char
    hash agg over the distinct-word frame (control-plane-sized)."""
    chars = (
        word_counts(docs, text_col)
        .select(F.explode(F.split("word", "")).alias("ch"))
        .distinct()
        .collect()
    )
    alphabet = sorted({r["ch"] for r in chars if r["ch"]})
    vocab = list(alphabet) + [CONT + c for c in alphabet]
    vocab += [m[3] for m in merges]
    return vocab


def wordpiece_segment(
    docs: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MaxMatch (greedy longest-prefix) WordPiece segmentation — the
    BERT inference algorithm: per word, repeatedly take the LONGEST
    vocabulary piece prefixing the remainder (continuations carry
    ``##``); a word with any uncoverable position is ONE ``[UNK]``
    (the HF contract).  Returns per-document
    ``(id, n_tokens, n_unk, n_words)`` — fertility + OOV signals.

    Plan shape: corpus → distinct-word frame (one hash agg); candidate
    (pos, len) substrings of each distinct word — bounded by word
    length × the vocab's max piece length — equi-join the broadcast
    vocabulary frame; per (word, pos) the max matched length is a hash
    agg; the greedy jumping-cursor walk is ONE ``F.aggregate`` fold
    over that per-word array (JVM-side, no Python, no explode of the
    walk); per-doc stats re-join words (broadcastable — the word-stats
    frame is Heaps-small).  The corpus is touched exactly twice (word
    counts, final stats join), never per merge or per position.
    """
    if not vocab:
        raise ValueError("vocab must be non-empty")
    max_len = max(len(v) - (len(CONT) if v.startswith(CONT) else 0) for v in vocab)
    spark = docs.sparkSession
    vdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in sorted(set(vocab))])).alias(
            "piece"
        )
    )
    words = word_counts(docs, text_col, id_col).select("word")
    wlen = F.length("word")
    cand = (
        words.withColumn("pos", F.explode(F.sequence(F.lit(1), wlen)))
        .withColumn(
            "len",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_len), wlen - F.col("pos") + 1),
                )
            ),
        )
        .withColumn(
            "piece",
            F.when(
                F.col("pos") == 1, F.expr("substring(word, pos, len)")
            ).otherwise(
                F.concat(F.lit(CONT), F.expr("substring(word, pos, len)"))
            ),
        )
    )
    matched = cand.join(F.broadcast(vdf), "piece").groupBy("word", "pos").agg(
        F.max("len").alias("best")
    )
    best_arr = matched.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("pos"), F.col("best")))
        ).alias("bm")
    )
    walked = (
        words.join(best_arr, "word", "left")
        .withColumn(
            "acc",
            F.aggregate(
                F.sequence(F.lit(1), F.length("word")),
                F.struct(
                    F.lit(1).alias("pos"),
                    F.lit(0).alias("n"),
                    F.lit(False).alias("failed"),
                ),
                lambda acc, i: F.when(
                    acc["failed"] | (acc["pos"] != i), acc
                ).otherwise(
                    F.when(
                        F.coalesce(
                            F.element_at(F.col("bm"), i), F.lit(0)
                        )
                        > 0,
                        F.struct(
                            (acc["pos"] + F.element_at(F.col("bm"), i)).alias(
                                "pos"
                            ),
                            (acc["n"] + 1).alias("n"),
                            F.lit(False).alias("failed"),
                        ),
                    ).otherwise(
                        F.struct(
                            acc["pos"].alias("pos"),
                            acc["n"].alias("n"),
                            F.lit(True).alias("failed"),
                        )
                    )
                ),
            ),
        )
        .select(
            "word",
            F.when(F.col("acc.failed"), F.lit(1))
            .otherwise(F.col("acc.n"))
            .cast("long")
            .alias("w_tokens"),
            F.col("acc.failed").cast("long").alias("w_unk"),
        )
    )
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    occ = docs.select(
        F.col(id_col), F.explode(toks).alias("word")
    ).filter(F.col("word") != "")
    return (
        occ.join(F.broadcast(walked), "word")
        .groupBy(id_col)
        .agg(
            F.sum("w_tokens").cast("long").alias("n_tokens"),
            F.sum("w_unk").cast("long").alias("n_unk"),
            F.count("*").cast("long").alias("n_words"),
        )
    )
