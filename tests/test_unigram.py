"""Unigram-LM tokenizer (operators/unigram.py): the distributed path
is pinned bit-exact to the driver path (which doubles as the
pure-Python reference — both run the same integer-micro DP), plus
hand-computed Viterbi cases and training-shape assertions."""

from __future__ import annotations

import pytest

from monstache_spark.operators.unigram import (
    MICRO,
    _seed_counts,
    _viterbi,
    unigram_segment,
    unigram_train,
)

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a mat and a hat",
    "the hat that the cat wore",
    "mats and hats and cats",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_viterbi_prefers_higher_logprob():
    pieces = {"ab": -100, "a": -300, "b": -300, "abab": -250}
    assert _viterbi("abab", pieces, 8) == ["ab", "ab"]


def test_viterbi_tie_breaks_to_longer_trailing_piece():
    pieces = {"ab": -200, "a": -100, "b": -100}
    # [ab] = -200 == [a, b] = -200: tie goes to the longer piece
    assert _viterbi("ab", pieces, 8) == ["ab"]


def test_viterbi_unseen_char_falls_back_to_itself():
    pieces = {"a": -100}
    assert _viterbi("axa", pieces, 8) == ["a", "x", "a"]


def test_seed_counts_weighted_occurrences():
    got = _seed_counts([("aba", 2)], max_piece_len=2)
    # substrings of 'aba' (≤2): a(pos0), ab, b, ba, a(pos2) — each ×2
    assert got == {"a": 4, "b": 2, "ab": 2, "ba": 2}


def test_train_learns_frequent_words_as_pieces(spark):
    pieces = unigram_train(_docs(spark), vocab_size=60, seed_size=200, n_em=3)
    table = {p for p, _lp, _c in pieces}
    # 'the'/'cat'/'mat' recur enough to survive pruning as whole pieces
    assert {"the", "cat", "mat"} <= table
    # every character of the corpus is covered
    chars = {c for t in TEXTS for c in t.lower() if c != " "}
    assert chars <= table
    # log-probs are negative integer micro-units
    assert all(isinstance(lp, int) and lp < 0 for _p, lp, _c in pieces)


def test_distributed_path_matches_driver_path(spark):
    fast = unigram_train(_docs(spark), vocab_size=60, seed_size=200, n_em=2)
    dist = unigram_train(
        _docs(spark), vocab_size=60, seed_size=200, n_em=2,
        driver_vocab_budget=None,
    )
    assert fast == dist


def test_segment_counts_match_driver_viterbi(spark):
    pieces = unigram_train(_docs(spark), vocab_size=60, seed_size=200, n_em=2)
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_words"])
        for r in unigram_segment(_docs(spark), pieces).collect()
    }
    table = {p: lp for p, lp, _c in pieces}
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        want = sum(len(_viterbi(w, table, 8)) for w in words)
        assert out[i] == (want, len(words))


def test_fertility_below_character_count(spark):
    # a trained table must beat char-level segmentation on its corpus
    pieces = unigram_train(_docs(spark), vocab_size=60, seed_size=200, n_em=3)
    out = unigram_segment(_docs(spark), pieces).collect()
    for r in out:
        assert r["n_tokens"] <= sum(len(w) for w in TEXTS[r["doc_id"]].split())
        assert r["n_tokens"] >= r["n_words"]
