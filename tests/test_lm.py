"""Stupid-backoff LM perplexity: parity vs a pure-Python reference,
quantized tier agreement, and the unseen-token honesty columns."""

from __future__ import annotations

import math

import pytest

from cngi_prototype_spark.text.lm import lm_doc_logprob

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "a dog sat"),
    (3, "entirely new words here"),
    (4, "the the the"),
    (5, "x"),
]


def _ref(docs, train=None, alpha=0.4):
    train = train if train is not None else docs
    tok = lambda t: t.lower().strip().split() or [""]  # noqa: E731
    uni, bi, ctx = {}, {}, {}
    for _, t in train:
        ws = tok(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    n = sum(uni.values())
    out = {}
    for d, t in docs:
        ws = tok(t)
        s, unseen = 0.0, 0
        for i, w in enumerate(ws):
            if w not in uni:
                unseen += 1
                continue
            if i == 0:
                p = uni[w] / n
            elif (ws[i - 1], w) in bi:
                p = bi[(ws[i - 1], w)] / ctx[ws[i - 1]]
            else:
                p = alpha * uni[w] / n
            s += math.log(p)
        out[d] = (len(ws), s, unseen)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lm_matches_reference(spark, docs_df):
    got = {r.doc_id: (r.n_tokens, r.logprob, r.n_unseen)
           for r in lm_doc_logprob(docs_df).collect()}
    want = _ref(DOCS)
    assert set(got) == set(want)
    for d, (nt, lp, nu) in want.items():
        assert got[d][0] == nt and got[d][2] == nu == 0
        assert got[d][1] == pytest.approx(lp, rel=1e-12)


def test_lm_quantized_tier_agrees(spark, docs_df):
    exact = {r.doc_id: r.logprob for r in lm_doc_logprob(docs_df).collect()}
    quant = {r.doc_id: r.logprob_q
             for r in lm_doc_logprob(docs_df, quantize=True).collect()}
    for d, lp in exact.items():
        assert quant[d] == pytest.approx(lp * 1e9, abs=32)


def test_lm_unseen_tokens_are_honest(spark, docs_df):
    # train on docs 0-2 only: doc 3's vocabulary is entirely unseen
    train = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.logprob, r.n_unseen)
           for r in lm_doc_logprob(docs_df, train_docs=train).collect()}
    want = _ref(DOCS, train=DOCS[:3])
    for d, (nt, lp, nu) in want.items():
        assert got[d][0] == nt and got[d][2] == nu
        if nu == nt:  # nothing scorable: NULL sum, not a fake 0.0
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(lp, rel=1e-12)
    assert got[3][2] == 4  # all four tokens unseen


def test_lm_distinguishes_fluent_from_shuffled(spark):
    # the score must be usable as a quality signal: a document whose
    # bigrams match the corpus outscores one with the same unigrams
    # in an order the corpus never produced
    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    probe = [(100, "the quick brown fox"), (101, "fox the brown quick")]
    df = spark.createDataFrame(base + probe, "doc_id long, text string")
    got = {r.doc_id: r.logprob / r.n_tokens
           for r in lm_doc_logprob(df).collect()}
    assert got[100] > got[101]
