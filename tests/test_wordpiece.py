"""WordPiece trainer + MaxMatch segmenter (operators/wordpiece.py):
driver/distributed bit-equality, pinning against an independent
pure-Python HF-style reference, and the UNK whole-word contract."""

from __future__ import annotations

import pytest

from monstache_spark.operators.wordpiece import (
    CONT,
    _driver_wp_loop,
    wordpiece_segment,
    wordpiece_train,
    wordpiece_vocab,
)


def _ref_maxmatch(word: str, vocab: set[str]) -> list[str]:
    """Independent HF-style WordPiece MaxMatch: greedy longest prefix,
    ## continuations, whole word -> [UNK] on any uncoverable spot."""
    out, pos = [], 0
    while pos < len(word):
        end = len(word)
        piece = None
        while end > pos:
            sub = word[pos:end]
            if pos > 0:
                sub = CONT + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return ["[UNK]"]
        out.append(piece)
        pos = end
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "low lower lowest"),
            (2, "low low newer new"),
            (3, "wider new lower"),
            (4, "newest widest low"),
        ],
        "doc_id long, text string",
    )


def test_driver_and_distributed_paths_identical(docs):
    a = wordpiece_train(docs, n_merges=10)
    b = wordpiece_train(docs, n_merges=10, driver_vocab_budget=None)
    assert a == b and len(a) > 3


def test_likelihood_score_not_raw_frequency(docs):
    # the first merge maximizes c/(c_l*c_r), not raw pair count: 'l ##o'
    # appears 6x but 'l' and '##o' are frequent; a rarer exclusive pair
    # can win. Verify against the reference loop exactly.
    merges = wordpiece_train(docs, n_merges=5)
    words = [("low", 4), ("lower", 2), ("lowest", 1), ("newer", 1),
             ("new", 2), ("wider", 1), ("newest", 1), ("widest", 1)]
    ref = _driver_wp_loop(words, 5, 2)
    assert merges == ref


def test_merged_token_drops_continuation_prefix(docs):
    merges = wordpiece_train(docs, n_merges=10)
    for _rank, left, right, token, _c in merges:
        assert right.startswith(CONT)
        expect = left + right[len(CONT):]
        assert token == expect
        if left.startswith(CONT):
            assert token.startswith(CONT)


def test_segment_matches_reference_maxmatch(docs, spark):
    merges = wordpiece_train(docs, n_merges=10)
    vocab = wordpiece_vocab(docs, merges)
    vset = set(vocab)
    got = {r["doc_id"]: r for r in wordpiece_segment(docs, vocab).collect()}
    texts = {1: "low lower lowest", 2: "low low newer new",
             3: "wider new lower", 4: "newest widest low"}
    for did, text in texts.items():
        words = text.split()
        pieces = [_ref_maxmatch(w, vset) for w in words]
        n_tokens = sum(len(p) for p in pieces)
        n_unk = sum(1 for p in pieces if p == ["[UNK]"])
        r = got[did]
        assert (r["n_tokens"], r["n_unk"], r["n_words"]) == (
            n_tokens, n_unk, len(words)), (did, pieces)


def test_segment_unk_whole_word(spark):
    docs = spark.createDataFrame(
        [(1, "ab zq ab")], "doc_id long, text string"
    )
    # vocab covers 'ab' fully but 'zq' only partially ('z' absent)
    out = wordpiece_segment(docs, ["a", "##b", "ab", "q", "##q"]).collect()[0]
    assert (out["n_tokens"], out["n_unk"], out["n_words"]) == (3, 1, 3)
    with pytest.raises(ValueError, match="vocab"):
        wordpiece_segment(docs, [])


def test_self_overlapping_merge_paths_equal(spark):
    """Regression twin of the BPE self-overlap case: (##m, ##m) wins
    the likelihood argmax and both paths must scan left-to-right."""
    docs = spark.createDataFrame(
        [(1, "ammmmm bmmmmm cmmmmm dmmmmm")], "doc_id long, text string"
    )
    a = wordpiece_train(docs, n_merges=3)
    b = wordpiece_train(docs, n_merges=3, driver_vocab_budget=None)
    assert a == b
    assert (a[0][1], a[0][2]) == ("##m", "##m")
