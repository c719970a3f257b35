"""BM25 retrieval: formula parity vs a pure-Python reference, quantized
tier agreement, and the broadcast plan contract."""

from __future__ import annotations

import math

import pytest

from cngi_prototype_spark.plans.inspect import (
    broadcast_hint_count,
    explain_formatted,
)
from cngi_prototype_spark.text.retrieval import bm25_postings, bm25_topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox"),
    (3, "lorem ipsum dolor sit amet"),
    (4, "quick quick quick brown"),
    (5, "a dog and another dog chase the fox"),
    (6, "entirely unrelated text about spark plans"),
]
QUERIES = [(0, "quick fox"), (1, "lazy dog"), (2, "zzz_absent")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent reference implementation (dict-based, no Spark)."""
    toks = {d: t.lower().strip().split() for d, t in docs}
    # tokenizer convention: empty doc -> one empty token
    toks = {d: (t if t else [""]) for d, t in toks.items()}
    n = len(toks)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        for term in set(qtext.lower().strip().split()):
            if term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if not tf:
                    continue
                tfn = (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl[d] / avgdl))
                out[(qid, d)] = out.get((qid, d), 0.0) + idf * tfn
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id INT, text STRING")


def test_bm25_matches_reference(spark, docs_df):
    got = {(r.query_id, r.doc_id): r.score
           for r in bm25_topk(docs_df, QUERIES, top_n=10).collect()}
    want = _py_bm25(DOCS, QUERIES)
    assert set(got) == set(want)
    for key, v in want.items():
        assert got[key] == pytest.approx(v, rel=1e-12)


def test_bm25_topn_and_tiebreak(spark, docs_df):
    rows = bm25_topk(docs_df, QUERIES, top_n=2).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert 2 not in per_q  # no term of query 2 exists in the corpus
    for _qid, rs in per_q.items():
        assert len(rs) <= 2
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == list(
            range(1, len(rs) + 1))
        # rank order is (score desc, doc_id asc)
        rs = sorted(rs, key=lambda r: r.rank)
        for a, b_ in zip(rs, rs[1:]):
            assert (a.score, -a.doc_id) >= (b_.score, -b_.doc_id)


def test_bm25_quantized_tier_agrees(spark, docs_df):
    exact = {(r.query_id, r.doc_id): (r.rank, r.score)
             for r in bm25_topk(docs_df, QUERIES, top_n=10).collect()}
    quant = {(r.query_id, r.doc_id): (r.rank, r.score_q)
             for r in bm25_topk(docs_df, QUERIES, top_n=10,
                                quantize=True).collect()}
    assert set(exact) == set(quant)
    for key, (rank, score) in exact.items():
        qrank, score_q = quant[key]
        assert qrank == rank  # nano-quantization never flips a rank here
        assert score_q == pytest.approx(score * 1e9, abs=len(QUERIES))


def test_bm25_plan_contract(spark, docs_df):
    df = bm25_topk(docs_df, QUERIES, top_n=5)
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # query terms, doc frequencies, and the 1-row stats are all hinted
    # broadcast — the corpus postings never shuffle for the join
    assert broadcast_hint_count(df) >= 3


def test_bm25_query_quoting_and_tokenizer_parity(spark):
    """Review findings: (a) query terms containing quotes must be
    SQL-escaped in the DuckDB twin; (b) query tokenization must match
    the corpus tokenizer's ASCII-\\s+ split — Python's default
    str.split() also splits on Unicode whitespace (NBSP), silently
    missing exact textual matches."""
    import duckdb
    import pandas as pd

    from cngi_prototype_spark.text.retrieval import sql_bm25_topk

    docs = [(0, "don't panic"), (1, "foo bar baz"), (2, "plain text")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    queries = [(0, "don't"), (1, "foo bar")]

    # NBSP is NOT a token boundary for the corpus tokenizer, so the
    # query term must stay 'foo\xa0bar' and hit doc 1 exactly
    got = {(r.query_id, r.doc_id)
           for r in bm25_topk(df, queries, top_n=5).collect()}
    assert (0, 0) in got and (1, 1) in got

    # the SQL twin must parse AND agree despite the apostrophe
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs,
                                           columns=["doc_id", "text"]))
    oracle = {(r[0], r[1])
              for r in con.sql(sql_bm25_topk(queries, top_n=5,
                                             quantize=True)).fetchall()}
    spark_q = {(r.query_id, r.doc_id)
               for r in bm25_topk(df, queries, top_n=5,
                                  quantize=True).collect()}
    assert oracle == spark_q


def test_bm25_postings_dl_is_token_count(spark, docs_df):
    rows = bm25_postings(docs_df).collect()
    dl = {r.doc_id: r.dl for r in rows}
    for d, t in DOCS:
        assert dl[d] == len(t.split())


def test_query_terms_all_empty_raises(spark):
    """Queries that tokenize to zero terms must raise identically on
    both engines — the SQL twin would otherwise emit a bare 'VALUES '
    syntax error while Spark silently returned nothing (review
    finding)."""
    import pytest as _pytest

    from cngi_prototype_spark.text.retrieval import (
        _query_terms, sql_bm25_topk)

    with _pytest.raises(ValueError, match="no query terms"):
        _query_terms([(0, "   "), (1, "")])
    with _pytest.raises(ValueError, match="no query terms"):
        sql_bm25_topk([(0, " \t ")])
