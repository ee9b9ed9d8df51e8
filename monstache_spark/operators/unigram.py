"""Unigram-LM tokenizer training (SentencePiece-style) and application.

Kudo 2018 (arXiv:1804.10959) subword regularization's unigram language
model, re-expressed for Spark's execution model with the same
two-level shape as :mod:`tokenizer` (BPE):

- ONE corpus-sized pass: word counting (map-side-combined hash agg).
  Everything after operates on the distinct-word table weighted by
  count — Heaps' law keeps it orders of magnitude smaller than the
  corpus.
- Seed vocabulary: the most frequent substrings (≤ ``max_piece_len``
  chars) of the weighted vocab, plus every single character (coverage
  guarantee).
- EM rounds with the Viterbi (hard-count) approximation: each round
  segments every distinct word with the current piece log-probs,
  accumulates piece counts weighted by word frequency, re-estimates
  probabilities, and prunes the lowest-count multi-char pieces toward
  ``vocab_size`` (``prune_frac`` per round, as sentencepiece shrinks
  its seed).
- Determinism on any engine: log-probs are quantized to integer
  MICRO-units and the DP compares exact ints; ties break toward the
  longer trailing piece, then the DP's fixed scan order.  Two
  engines given the same word table produce byte-identical piece
  tables (tests pin the Spark path to a pure-Python reference).

Hybrid execution, like BPE's: under ``driver_vocab_budget`` distinct
words the EM loop runs driver-side (zero per-iteration Spark jobs —
the regime where iteration cost is pure stage scheduling); over it,
each E-step is a ``mapInPandas`` over the distributed vocab with the
piece table a broadcast-sized closure, reduced by one hash agg.
Segmentation of a full corpus (:func:`unigram_segment`) is a
``mapInPandas`` Arrow stage: per-word Viterbi is inherently
sequential DP — one of the few justified Python edges (like the
RFC-7386 diff), and it is embarrassingly data-parallel across rows.

No SQL oracle can express the iterative EM or the DP, so the entry
queries are rows-only checked; correctness is pinned by unit +
property tests against the pure-Python reference
(tests/test_unigram.py).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monstache_spark.operators.tokenizer import word_counts

#: log-prob quantum: probabilities enter the DP as round(ln p * 1e6)
MICRO = 1_000_000

_NEG = -(10**15)


def _viterbi(word: str, pieces: dict[str, int], max_piece_len: int) -> list[str]:
    """Best segmentation of ``word`` by total integer log-prob.

    Ties break toward the longer trailing piece (smaller split point),
    scanning split points ascending — fully deterministic.  Assumes
    every single character of ``word`` is in ``pieces`` (the trainer
    guarantees coverage); unknown characters fall back to themselves
    with a floor score so segmentation never fails on unseen input.
    """
    n = len(word)
    best = [_NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for j in range(1, n + 1):
        lo = max(0, j - max_piece_len)
        for i in range(lo, j):
            if best[i] == _NEG:
                continue
            p = pieces.get(word[i:j])
            if p is None:
                if j - i == 1:
                    p = _NEG // 2  # unseen char floor: always segmentable
                else:
                    continue
            cand = best[i] + p
            if cand > best[j] or (cand == best[j] and i < back[j]):
                best[j] = cand
                back[j] = i
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def _seed_counts(
    words: list[tuple[str, int]], max_piece_len: int
) -> Counter:
    """Occurrence counts of every substring ≤ max_piece_len, weighted
    by word frequency."""
    c: Counter = Counter()
    for w, n in words:
        ln = len(w)
        for i in range(ln):
            for j in range(i + 1, min(i + max_piece_len, ln) + 1):
                c[w[i:j]] += n
    return c


def _estimate(counts: Counter) -> dict[str, int]:
    """counts -> integer-micro log-probs (round(ln(c/total) * 1e6))."""
    total = sum(counts.values())
    return {
        p: round(math.log(c / total) * MICRO) for p, c in counts.items() if c > 0
    }


def _prune(
    counts: Counter, chars: set[str], target: int
) -> Counter:
    """Keep all single chars plus the top multi-char pieces by
    (count desc, piece asc) until ``target`` total pieces."""
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    kept = Counter({ch: max(counts.get(ch, 0), 1) for ch in chars})
    for p, c in multi[: max(0, target - len(kept))]:
        kept[p] = c
    return kept


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 1000,
    seed_size: int = 4000,
    max_piece_len: int = 8,
    n_em: int = 4,
    prune_frac: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_vocab_budget: int | None = 200_000,
) -> list[tuple[str, int, int]]:
    """Learn a unigram-LM piece table; returns
    ``[(piece, logprob_micro, count), ...]`` sorted by
    (count desc, piece asc) — a deterministic, engine-portable order.

    Execution: the corpus collapses to a (word, n) vocab in one
    distributed hash agg; within ``driver_vocab_budget`` the EM loop
    runs driver-side, otherwise every E-step is a ``mapInPandas``
    Viterbi pass over the distributed vocab reduced by one hash agg
    (``driver_vocab_budget=None`` forces that path)."""
    wc = word_counts(docs, text_col, id_col)
    rows = None
    if driver_vocab_budget is not None:
        head = wc.take(driver_vocab_budget + 1)
        if len(head) <= driver_vocab_budget:
            rows = [(r["word"], int(r["n"])) for r in head]

    if rows is not None:
        seed = _seed_counts(rows, max_piece_len)
    else:
        seed = _distributed_seed(wc, max_piece_len)
    chars = {p for p in seed if len(p) == 1}
    counts = _prune(seed, chars, max(vocab_size, seed_size))

    for _ in range(n_em):
        pieces = _estimate(counts)
        if rows is not None:
            new = Counter()
            for w, n in rows:
                for piece in _viterbi(w, pieces, max_piece_len):
                    new[piece] += n
        else:
            new = _distributed_estep(wc, pieces, max_piece_len)
        target = max(vocab_size, int(len(counts) * (1.0 - prune_frac)))
        counts = _prune(new, chars, target)

    final = _estimate(counts)
    return sorted(
        ((p, final[p], int(counts[p])) for p in counts),
        key=lambda t: (-t[2], t[0]),
    )


def _distributed_seed(wc: DataFrame, max_piece_len: int) -> Counter:
    """Substring counts over the distributed vocab: per-word substring
    explode in codegen (sequence + transform, no Python), hash-agg'd,
    then collected — the result is piece-table-sized regardless of
    corpus size, but unbounded seeds on adversarial vocabs should be
    capped upstream by seed_size pruning right after."""
    arr = F.split(F.col("word"), "")
    n = F.size(arr)
    starts = F.sequence(F.lit(0), n - 1)
    subs = F.flatten(
        F.transform(
            starts,
            lambda i: F.transform(
                F.sequence(
                    i + 1, F.least(i + F.lit(max_piece_len), n)
                ),
                lambda j: F.substring(F.col("word"), i + 1, j - i),
            ),
        )
    )
    rows = (
        wc.select(F.col("n"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("c"))
        .collect()
    )
    return Counter({r["piece"]: int(r["c"]) for r in rows})


def _distributed_estep(
    wc: DataFrame, pieces: dict[str, int], max_piece_len: int
) -> Counter:
    """One Viterbi E-step over the distributed vocab: mapInPandas with
    the piece table in the closure, reduced by one hash agg; the
    driver receives piece-table-sized rows."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            local: Counter = Counter()
            for w, n in zip(pdf["word"], pdf["n"]):
                for piece in _viterbi(str(w), pieces, max_piece_len):
                    local[piece] += int(n)
            yield pd.DataFrame(
                {"piece": list(local.keys()), "c": list(local.values())}
            )

    rows = (
        wc.mapInPandas(run, "piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    )
    return Counter({r["piece"]: int(r["c"]) for r in rows})


def unigram_segment(
    docs: DataFrame,
    pieces: list[tuple[str, int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
) -> DataFrame:
    """Apply a trained piece table: per document, the unigram token
    count and whitespace word count (tokenizer-fertility signal,
    comparable to :func:`tokenizer.bpe_segment`'s output).

    One Arrow-batched ``mapInPandas`` stage — per-word Viterbi DP is
    inherently sequential within a word and embarrassingly parallel
    across documents; no shuffle, the piece table rides in the
    closure (piece tables are vocab_size-bounded by construction)."""
    import pandas as pd

    table = {p: lp for p, lp, _c in pieces}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            n_tokens = []
            n_words = []
            for text in pdf[text_col]:
                words = [w for w in str(text).lower().strip().split() if w]
                t = 0
                for w in words:
                    t += len(_viterbi(w, table, max_piece_len))
                n_tokens.append(t)
                n_words.append(len(words))
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": n_tokens, "n_words": n_words}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, n_tokens long, n_words long"
    )
