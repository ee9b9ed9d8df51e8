"""BPE training/application vs a pure-Python reference implementation
(the Sennrich et al. 2016 algorithm transcribed from the paper's
pseudocode — word counts, pair counts, greedy simultaneous merge)."""

from __future__ import annotations

import collections

from hypothesis import given, settings
from hypothesis import strategies as st

from monstache_spark.operators.tokenizer import (
    EOW,
    bpe_segment,
    bpe_train,
    word_counts,
)


def _ref_word_counts(texts):
    c = collections.Counter()
    for t in texts:
        for w in t.strip().lower().split():
            c[w] += 1
    return dict(c)


def _ref_pair_counts(vocab):
    pairs = collections.Counter()
    for syms, n in vocab.items():
        s = syms.split(" ")
        for a, b in zip(s, s[1:]):
            pairs[(a, b)] += n
    return pairs


def _ref_merge(syms, pair):
    s = syms.split(" ")
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
            out.append(s[i] + s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return " ".join(out)


def _ref_bpe_train(texts, n_merges, min_pair_count=2):
    wc = _ref_word_counts(texts)
    vocab = {" ".join(list(w)) + " " + EOW: n for w, n in wc.items()}
    merges = []
    for rank in range(n_merges):
        pairs = _ref_pair_counts(vocab)
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_pair_count:
            break
        merges.append((rank, l, r, c))
        nv = collections.defaultdict(int)
        for s, n in vocab.items():
            nv[_ref_merge(s, (l, r))] += n
        vocab = dict(nv)
    return merges


def _ref_segment_count(text, merges):
    total, words = 0, text.strip().lower().split()
    for w in words:
        syms = " ".join(list(w)) + " " + EOW
        for _, l, r, _c in merges:
            syms = _ref_merge(syms, (l, r))
        total += len(syms.split(" "))
    return total, len(words)


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest wide",
    "low new wide lower newer",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_word_counts_match_reference(spark):
    got = {r["word"]: r["n"] for r in word_counts(_docs(spark)).collect()}
    assert got == _ref_word_counts(TEXTS)


def test_bpe_train_matches_reference(spark):
    got = bpe_train(_docs(spark), n_merges=12, checkpoint_every=4)
    want = _ref_bpe_train(TEXTS, 12)
    assert got == want
    assert len(got) > 3  # corpus supports several merges


def test_bpe_train_distributed_path_matches_driver_path(spark):
    # driver_vocab_budget=None forces the distributed merge loop;
    # budget=0-sized vocab impossible here, so default takes the
    # driver fast path — both must be bit-identical to the reference
    dist = bpe_train(
        _docs(spark), n_merges=12, checkpoint_every=4, driver_vocab_budget=None
    )
    fast = bpe_train(_docs(spark), n_merges=12)
    assert dist == fast == _ref_bpe_train(TEXTS, 12)


def test_bpe_segment_matches_reference(spark):
    merges = bpe_train(_docs(spark), n_merges=8)
    out = {r["doc_id"]: (r["n_tokens"], r["n_words"]) for r in
           bpe_segment(_docs(spark), merges).collect()}
    for i, t in enumerate(TEXTS):
        assert out[i] == _ref_segment_count(t, merges)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=40).filter(str.strip),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_train_property_matches_reference(spark, texts):
    got = bpe_train(_docs(spark, texts), n_merges=6, checkpoint_every=3)
    assert got == _ref_bpe_train(texts, 6)


def test_self_overlapping_merge_driver_distributed_equal(spark):
    """Regression: the two-pass replace diverged from the driver's
    left-to-right tuple scan on self-overlapping runs (left == right
    over 5+ equal symbols); the train loops now share the exact fold."""
    from monstache_spark.operators.tokenizer import bpe_train

    docs = spark.createDataFrame(
        [(1, "hmmmmm hmmmmm hmmmmm zz"), (2, "mmmmm mmmmm zz")],
        "doc_id long, text string",
    )
    a = bpe_train(docs, n_merges=4)
    b = bpe_train(docs, n_merges=4, driver_vocab_budget=None)
    assert a == b
    # the first merge IS the self-pair, so the case is exercised
    assert (a[0][1], a[0][2]) == ("m", "m")
