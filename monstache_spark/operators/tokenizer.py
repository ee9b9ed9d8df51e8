"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge learning (Sennrich et al. 2016,
arXiv:1508.07909) re-expressed for Spark's execution model:

- ONE corpus-sized pass: word counting (map-side-combined hash agg).
  Everything after operates on the DISTINCT-WORD table weighted by
  count — at 100 TB of text the vocabulary is millions of rows, not
  petabytes, so the per-merge iteration cost is bounded by |vocab|.
- Each merge iteration counts adjacent symbol pairs over the vocab
  (posexplode + lead window — the same exploded-row shape as
  dedup.shingle_rows), picks the arg-max pair with a deterministic
  tie-break (count desc, left asc, right asc), and applies the merge
  as a codegen string replace on the space-joined symbol string.
- The driver loop carries only the merge table (one row per
  iteration — control plane, like the drop/bucket lists elsewhere);
  the vocab stays distributed. Lineage is cut with a persist every
  ``checkpoint_every`` merges so iteration N does not replay N string
  replaces from scratch.

No SQL oracle can express the data-dependent iteration, so the entry
query for this operator is rows-only checked; correctness is pinned
instead by unit + property tests against a pure-Python reference
implementation (tests/test_tokenizer.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: End-of-word marker, per the original BPE formulation. Kept to one
#: character so symbol strings stay compact in shuffle buffers.
EOW = "▁"  # ▁ (lower one-eighth block, as used by sentencepiece)


def word_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, n) over lowercased whitespace words — the single
    corpus-sized pass; map-side partial aggregation collapses repeats
    before the exchange."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """Space-joined character symbols with the end-of-word marker:
    'low' -> 'l o w ▁'."""
    chars = F.split(word, "")
    return F.concat(F.array_join(chars, " "), F.lit(" " + EOW))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, c) adjacent-symbol-pair counts over the vocab,
    weighted by word count.

    Pairs are formed with array ops on the symbol string (adjacent
    (i, i+1) structs), NOT the posexplode+lead-window shape used for
    corpus shingling: the vocab is small, the loop runs every merge
    iteration, and skipping the per-word window saves one exchange +
    stage barrier per iteration — the iteration cost is dominated by
    stage scheduling, not compute."""
    arr = F.split(F.col("syms"), " ")
    idx = F.when(F.size(arr) >= 2, F.sequence(F.lit(0), F.size(arr) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(arr, i + 1).alias("left"),
            F.element_at(arr, i + 2).alias("right"),
        ),
    )
    exploded = vocab.select("n", F.explode(pairs).alias("p"))
    return exploded.groupBy("p.left", "p.right").agg(
        F.sum("n").cast("long").alias("c")
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Merge every adjacent (left, right) in a space-joined symbol
    string — REPLACE-CHAIN approximation used only by the frozen-table
    SEGMENT path (:func:`bpe_segment`), where the DuckDB oracle
    mirrors these exact replace semantics.  CAVEAT: for
    SELF-OVERLAPPING merges (left == right over a run of 5+ equal
    symbols, e.g. 'm m m m m') the two-pass replace can pick different
    pairs than the trainer's left-to-right tuple scan — the TRAIN
    loops therefore use :func:`_apply_merge_exact`, which reproduces
    the driver loop bit for bit."""
    padded = F.concat(F.lit(" "), syms, F.lit(" "))
    target = F.lit(f" {left} {right} ")
    merged = F.lit(f" {left}{right} ")
    # one replace pass can miss back-to-back occurrences sharing a
    # space (e.g. 'a b a b' -> the 2nd 'a b' starts at the space the
    # 1st consumed) — a second pass is sufficient because the miss
    # pattern cannot recur after re-padding.
    once = F.replace(padded, target, merged)
    twice = F.replace(once, target, merged)
    return F.trim(twice)


def _apply_merge_exact(
    syms: Column, left: str, right: str, merged: str
) -> Column:
    """Left-to-right NON-OVERLAPPING merge of adjacent (left, right)
    into ``merged`` on a space-joined symbol string — the exact tuple
    scan the driver loops run (``while j: if s[j]==left and
    s[j+1]==right: emit merged, j+=2 else emit s[j], j+=1``), as one
    ``F.aggregate`` fold carrying (output array, skip flag).  The
    replace-chain shortcut diverges from this scan on self-overlapping
    runs (left == right, 5+ repeats), which is why both distributed
    TRAIN loops use this fold: driver/distributed bit-equality is a
    tested contract.  Interpreted HOF, but it runs over the
    Heaps-small vocab frame, never the corpus."""
    arr = F.split(syms, " ")
    n = F.size(arr)
    folded = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, i: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        ).otherwise(
            F.when(
                (i < n)
                & (F.element_at(arr, i) == F.lit(left))
                & (F.element_at(arr, i + 1) == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(F.element_at(arr, i))).alias(
                        "out"
                    ),
                    F.lit(False).alias("skip"),
                )
            )
        ),
    )
    return F.array_join(folded["out"], " ")


def _driver_merge_loop(
    words: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, int]]:
    """Exact greedy BPE over an already-collected (word, count) vocab.

    Semantically identical to the distributed loop (same tie-break:
    count desc, left asc, right asc; same simultaneous non-overlapping
    left-to-right merge) — pinned against it by
    tests/test_tokenizer.py.  Pair counts are maintained
    INCREMENTALLY: each merge re-counts only the words that contain
    the merged pair, so the loop is O(affected words) per iteration.
    """
    from collections import Counter

    def pairs_of(syms: tuple[str, ...]) -> list[tuple[str, str]]:
        return list(zip(syms, syms[1:]))

    vocab: list[list] = [
        [tuple(word) + (EOW,), int(n)] for word, n in words
    ]
    counts: Counter = Counter()
    # pair -> set of vocab indexes containing it (occurrence index)
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, n) in enumerate(vocab):
        for p in pairs_of(syms):
            counts[p] += n
            where.setdefault(p, set()).add(i)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((rank, left, right, int(c)))
        merged = left + right
        for i in sorted(where.get((left, right), ())):
            syms, n = vocab[i]
            # retract this word's old pair contributions
            for p in pairs_of(syms):
                counts[p] -= n
                if counts[p] <= 0:
                    del counts[p]
                ws = where.get(p)
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del where[p]
            # simultaneous non-overlapping left-to-right merge
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_syms = tuple(out)
            vocab[i][0] = new_syms
            for p in pairs_of(new_syms):
                counts[p] += n
                where.setdefault(p, set()).add(i)
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
    driver_vocab_budget: int | None = 200_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, pair_count), ...]`` in merge order.

    Two-level execution, like Spark's own broadcast-threshold choice:
    the corpus-sized work (word counting) is always ONE distributed
    hash-agg pass; what remains operates on the distinct-word table,
    which Heaps' law keeps orders of magnitude smaller than the
    corpus.  When that vocab fits ``driver_vocab_budget`` rows it is
    collected once and the merge loop runs driver-side with
    incremental pair-count maintenance — zero per-iteration Spark
    jobs, exactly the regime where a 20-iteration distributed loop is
    pure stage-scheduling overhead.  Vocabs over the budget (100 TB
    corpora with long-tail tokens) stay on the distributed loop, where
    the driver receives ONE row per iteration (the arg-max pair) and
    the vocabulary table never leaves the cluster.  Both paths are
    bit-identical (same tie-break, same simultaneous merge) and pinned
    to one pure-Python reference by tests/test_tokenizer.py.

    Stops early when no pair reaches ``min_pair_count``.
    ``driver_vocab_budget=None`` forces the distributed loop."""
    wc = word_counts(docs, text_col, id_col)
    if driver_vocab_budget is not None:
        head = wc.take(driver_vocab_budget + 1)
        if len(head) <= driver_vocab_budget:
            return _driver_merge_loop(
                [(r["word"], r["n"]) for r in head], n_merges, min_pair_count
            )
    vocab = wc.select(
        "word", "n", _initial_symbols(F.col("word")).alias("syms")
    )
    cached = vocab.persist()
    cached.count()
    vocab = cached
    merges: list[tuple[int, str, str, int]] = []
    since_checkpoint = 0
    try:
        for rank in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.col("c").desc(), F.col("left").asc(), F.col("right").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < min_pair_count:
                break
            left, right, c = top[0]["left"], top[0]["right"], int(top[0]["c"])
            merges.append((rank, left, right, c))
            vocab = vocab.select(
                "word",
                "n",
                _apply_merge_exact(
                    F.col("syms"), left, right, left + right
                ).alias("syms"),
            )
            since_checkpoint += 1
            if since_checkpoint >= checkpoint_every:
                # cut lineage: persist + materialize the new frame, then
                # drop the previous cache so memory holds one vocab copy
                nxt = vocab.persist()
                nxt.count()
                cached.unpersist()
                cached = nxt
                vocab = nxt
                since_checkpoint = 0
    finally:
        cached.unpersist()
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to a corpus: per document, the BPE
    token count and mean token length. The merge chain compiles to a
    static sequence of codegen string replaces — a narrow projection,
    no shuffle, no Python; the merge table is plan metadata (it came
    from :func:`bpe_train`'s control-plane rows).

    Output: (id, n_tokens, n_words) — token inflation vs whitespace
    words is the tokenizer-fertility signal used to compare merge
    tables."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    words = F.filter(toks, lambda w: w != F.lit(""))
    # per-word symbol string, then fold the merge chain over it
    def segment_word(w: Column) -> Column:
        syms = F.concat(F.array_join(F.split(w, ""), " "), F.lit(" " + EOW))
        for _, left, right, _c in merges:
            syms = _apply_merge(syms, left, right)
        return F.size(F.split(syms, " "))

    per_word = F.transform(words, segment_word)
    n_tokens = F.aggregate(per_word, F.lit(0), lambda a, x: a + x).cast("long")
    return docs.select(
        id_col,
        n_tokens.alias("n_tokens"),
        F.size(words).cast("long").alias("n_words"),
    )
