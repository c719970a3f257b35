"""Hybrid lexical+vector retrieval: blend parity vs a pure-Python
composition of the two (already individually verified) signals, and
the broadcast plan contract."""

from __future__ import annotations

import math

import pytest

from cngi_prototype_spark.plans.inspect import (
    broadcast_hint_count,
    explain_formatted,
)
from cngi_prototype_spark.similarity.hybrid import hybrid_search
from cngi_prototype_spark.text.retrieval import bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox"),
    (2, "lorem ipsum dolor sit amet"),
    (3, "quick quick quick brown"),
    (4, "a dog and another dog chase the fox"),
    (5, "entirely unrelated text about spark plans"),
]
EMB = [
    (0, [0.9, 0.1, 0.2]), (1, [0.8, 0.2, 0.1]), (2, [0.0, 1.0, 0.1]),
    (3, [0.7, 0.1, 0.4]), (4, [0.6, 0.3, 0.3]), (5, [0.1, 0.9, 0.5]),
]
QTEXT = [(0, "quick fox"), (1, "lazy dog")]
QVEC = [(0, [1.0, 0.0, 0.1]), (1, [0.5, 0.5, 0.2])]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    qv = spark.createDataFrame(QVEC, "query_id long, embedding array<double>")
    return docs, emb, qv


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(x * x for x in b)))


def test_hybrid_blend_matches_components(spark, frames):
    docs, emb, qv = frames
    cand = {(r.query_id, r.doc_id): r.score_q
            for r in bm25_topk(docs, QTEXT, top_n=10,
                               quantize=True).collect()}
    maxq = {}
    for (q, _d), s in cand.items():
        maxq[q] = max(maxq.get(q, 0), s)
    want = {}
    for (q, d), s in cand.items():
        lex = s / maxq[q]
        cos = _cos(QVEC[q][1], EMB[d][1])
        want[(q, d)] = (lex, cos, 0.5 * lex + 0.5 * cos)
    got = {(r.query_id, r.doc_id): (r.lex_norm, r.cos_sim, r.hybrid_score)
           for r in hybrid_search(docs, emb, QTEXT, qv,
                                  bm25_n=10, k=10).collect()}
    assert set(got) == set(want)
    for key, (lex, cos, h) in want.items():
        assert got[key][0] == pytest.approx(lex, rel=1e-12)
        assert got[key][1] == pytest.approx(cos, rel=1e-12)
        assert got[key][2] == pytest.approx(h, rel=1e-12)


def test_hybrid_topk_and_weights(spark, frames):
    docs, emb, qv = frames
    rows = hybrid_search(docs, emb, QTEXT, qv, bm25_n=10, k=2).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for _q, rs in per_q.items():
        assert len(rs) <= 2
        rs = sorted(rs, key=lambda r: r.rank)
        for a, b in zip(rs, rs[1:]):
            assert a.hybrid_score >= b.hybrid_score
    # pure-vector weights reduce to cosine ordering on the shortlist
    vec_only = hybrid_search(docs, emb, QTEXT, qv, bm25_n=10, k=10,
                             w_lex=0.0, w_vec=1.0).collect()
    for r in vec_only:
        assert r.hybrid_score == pytest.approx(r.cos_sim, rel=1e-12)


def test_rrf_matches_reference(spark, frames):
    from cngi_prototype_spark.similarity.hybrid import rrf_search

    docs, emb, qv = frames
    cand = {}
    for r in bm25_topk(docs, QTEXT, top_n=10, quantize=True).collect():
        cand[(r.query_id, r.doc_id)] = r.rank
    # vector ranks over the SAME shortlist (cos desc, doc_id asc)
    vec_rank = {}
    for q in {k[0] for k in cand}:
        ds = [d for (qq, d) in cand if qq == q]
        ds.sort(key=lambda d: (-_cos(QVEC[q][1], EMB[d][1]), d))
        for i, d in enumerate(ds):
            vec_rank[(q, d)] = i + 1
    want = {key: 1.0 / (60 + lr) + 1.0 / (60 + vec_rank[key])
            for key, lr in cand.items()}
    got = {(r.query_id, r.doc_id): (r.lex_rank, r.vec_rank, r.rrf_score)
           for r in rrf_search(docs, emb, QTEXT, qv,
                               bm25_n=10, k=10).collect()}
    assert set(got) == set(want)
    for key, score in want.items():
        assert got[key][0] == cand[key]
        assert got[key][1] == vec_rank[key]
        assert got[key][2] == pytest.approx(score, rel=1e-12)


def test_hybrid_plan_contract(spark, frames):
    docs, emb, qv = frames
    df = hybrid_search(docs, emb, QTEXT, qv, bm25_n=10, k=5)
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # bm25's three broadcasts + the shortlist + the query vectors
    assert broadcast_hint_count(df) >= 5


def test_blend_zero_score_shortlist_yields_zero_lex_norm(spark, frames):
    """Degenerate shortlist whose scores all quantize to 0 must blend
    as an explicit 0.0 lexical contribution (vector-only ranking),
    never a NULL/NaN from a 0/0 normalization (review finding)."""
    import pyspark.sql.functions as F

    from cngi_prototype_spark.similarity.hybrid import _blend_shortlist

    docs, emb, qv = frames
    cand = spark.createDataFrame(
        [(0, d) for d, _ in
         [(r.doc_id, None) for r in docs.select("doc_id").collect()][:3]],
        "query_id INT, doc_id BIGINT").withColumn(
            "score_q", F.lit(0).cast("long"))
    rows = _blend_shortlist(cand, emb, qv, k=5, w_lex=0.5, w_vec=0.5,
                            vec_id_col="vec_id", vec_col="embedding").collect()
    assert rows
    for r in rows:
        assert r.lex_norm == 0.0
        assert not math.isnan(r.hybrid_score)
        assert r.hybrid_score == pytest.approx(0.5 * r.cos_sim, rel=1e-12)
