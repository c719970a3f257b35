"""Multinomial Naive Bayes classifier: parity vs a pure-Python
reference, quantized-tier agreement, tie-break determinism, separate
train/score corpora, and the incremental count store scoring
identically to batch for any batching."""

from __future__ import annotations

import math
import os

import pytest

from cngi_prototype_spark.streaming.stream_ops import stream_nb_counts
from cngi_prototype_spark.text.classifier import (
    nb_classify,
    nb_classify_from_store,
    nb_counts,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat ran fast", "en"),
    (2, "le chat et le chien", "fr"),
    (3, "le chien dort", "fr"),
    (4, "der hund und die katze", "de"),
    (5, "the dog and the cat sat", "en"),
]
SCHEMA = "doc_id long, text string, lang string"


def _tok(t: str) -> list[str]:
    return t.lower().strip().split() or [""]


def _ref(docs, train=None):
    """Laplace-smoothed multinomial NB, argmax with lexicographic
    tie-break — the textbook formulas, computed independently."""
    train = train if train is not None else docs
    counts: dict[tuple[str, str], int] = {}
    dcount: dict[str, int] = {}
    for _, t, lab in train:
        dcount[lab] = dcount.get(lab, 0) + 1
        for w in _tok(t):
            counts[(lab, w)] = counts.get((lab, w), 0) + 1
    labels = sorted(dcount)
    n_l = {lab: sum(c for (l2, _), c in counts.items() if l2 == lab)
           for lab in labels}
    vocab = len({w for (_, w) in counts})
    d_total = sum(dcount.values())
    out = {}
    for d, t, _ in docs:
        scores = {}
        for lab in labels:
            s = math.log(dcount[lab] / d_total)
            for w in _tok(t):
                s += math.log((counts.get((lab, w), 0) + 1)
                              / (n_l[lab] + vocab))
            scores[lab] = s
        best = max(scores.values())
        pred = min(lab for lab in labels if scores[lab] == best)
        second = sorted(scores.values())[-2] if len(labels) > 1 else best
        out[d] = (len(_tok(t)), pred, best, best - second)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_matches_reference(spark, docs_df):
    want = _ref(DOCS)
    got = {r.doc_id: (r.n_tokens, r.label_pred, r.score, r.margin)
           for r in nb_classify(docs_df).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == want[d][1]
        assert got[d][2] == pytest.approx(want[d][2], rel=1e-9)
        assert got[d][3] == pytest.approx(want[d][3], rel=1e-9, abs=1e-9)


def test_quantized_tier_agrees(spark, docs_df):
    exact = {r.doc_id: (r.label_pred, r.score)
             for r in nb_classify(docs_df).collect()}
    quant = {r.doc_id: (r.label_pred, r.score_q)
             for r in nb_classify(docs_df, quantize=True).collect()}
    for d, (lab, s) in exact.items():
        assert quant[d][0] == lab
        # nano-quantization error bounded by one ulp per token + prior
        assert abs(quant[d][1] / 1e9 - s) < 1e-6


def test_separate_train_corpus(spark, docs_df):
    """Score docs the model never saw — unseen tokens take the
    c=0 branch of the shared formula, no crash, no NULLs."""
    train = docs_df.filter("doc_id < 4")
    score = spark.createDataFrame(
        [(10, "completely novel words", None),
         (11, "le chat", None)], SCHEMA)
    got = {r.doc_id: r.label_pred
           for r in nb_classify(score, train_docs=train).collect()}
    want = _ref([(10, "completely novel words", ""),
                 (11, "le chat", "")], train=DOCS[:4])
    assert got == {d: v[1] for d, v in want.items()}


def test_tie_break_lexicographic(spark):
    """Two classes with mirror-image evidence: a doc seen identically
    under both ties exactly, and the smaller label must win."""
    df = spark.createDataFrame(
        [(0, "aa bb", "x"), (1, "aa bb", "y"), (2, "aa bb", "z")],
        SCHEMA)
    out = {r.doc_id: (r.label_pred, r.margin)
           for r in nb_classify(df).collect()}
    assert out[0] == ("x", 0.0)


def test_no_labels_raises(spark):
    df = spark.createDataFrame([(0, "abc", None)], SCHEMA)
    with pytest.raises(ValueError, match="no labeled"):
        nb_classify(df).collect()


def _run_batches(spark, tmp, batches):
    os.makedirs(f"{tmp}/in", exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(f"{tmp}/in")
        q = stream_nb_counts(
            spark.readStream.schema(SCHEMA).parquet(f"{tmp}/in"),
            f"{tmp}/counts", f"{tmp}/ck",
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)


@pytest.mark.parametrize("splits", [[2, 4], [1, 2, 2, 1]])
def test_incremental_equals_batch(spark, docs_df, tmp_path, splits):
    assert sum(splits) == len(DOCS)
    batches, i = [], 0
    for s in splits:
        batches.append(DOCS[i:i + s])
        i += s
    _run_batches(spark, str(tmp_path), batches)
    batch = {r.doc_id: (r.n_tokens, r.label_pred, r.score_q, r.margin_q)
             for r in nb_classify(docs_df, quantize=True).collect()}
    store = {r.doc_id: (r.n_tokens, r.label_pred, r.score_q, r.margin_q)
             for r in nb_classify_from_store(
                 spark, f"{tmp_path}/counts", docs_df,
                 quantize=True).collect()}
    assert store == batch


def test_counts_additive(spark, docs_df):
    """nb_counts over slices sums to nb_counts over the whole —
    the property the streaming store depends on."""
    a = nb_counts(docs_df.filter("doc_id < 3"))
    b = nb_counts(docs_df.filter("doc_id >= 3"))
    merged = {(r.label, r.token): r.c
              for r in a.unionByName(b).groupBy("label", "token")
              .sum("c").withColumnRenamed("sum(c)", "c").collect()}
    whole = {(r.label, r.token): r.c for r in nb_counts(docs_df).collect()}
    assert merged == whole


def test_token_free_class_still_scores(spark):
    """Degenerate guard: a class whose only training doc has NULL text
    contributes doc-count priors but zero token rows — it must still
    be scored (n_l = 0 in the smoothing denominator), not silently
    dropped. Pins the Spark/SQL agreement on deriving classes from
    the priors table, not the token-count table."""
    df = spark.createDataFrame(
        [(0, "aa bb aa", "x"), (1, "aa bb", "x"), (2, None, "y")],
        SCHEMA)
    rows = nb_classify(df.filter("text IS NOT NULL"),
                       train_docs=df).collect()
    # every scored row carries finite scores for the argmax over BOTH
    # classes; class y (token-free) loses on every token, so x wins
    assert {r.label_pred for r in rows} == {"x"}
    assert all(r.margin > 0 for r in rows)


def test_store_expiry_sentinel_ignored(spark, docs_df):
    """compact_store's full-expiry sentinel is an all-NULL row; the
    from-counts reader must drop it (label IS NOT NULL, the
    bm25_topk_from_store guard) instead of fabricating a NULL class
    and crashing the sorted() label collect."""
    counts = nb_counts(docs_df).unionByName(
        docs_df.sparkSession.createDataFrame(
            [(None, None, None)], "label string, token string, c long"))
    from cngi_prototype_spark.text.classifier import (
        nb_classify_from_counts)
    got = {r.doc_id: r.label_pred
           for r in nb_classify_from_counts(
               docs_df, counts, quantize=True).collect()}
    want = {r.doc_id: r.label_pred
            for r in nb_classify(docs_df, quantize=True).collect()}
    assert got == want
