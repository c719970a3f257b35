"""Hybrid lexical + vector retrieval.

The canonical production search composition (Elasticsearch/Vespa/
retrieval-augmented-training pipelines): BM25 shortlists candidates
cheaply over the inverted index, dense-embedding cosine re-scores
them, and a weighted blend ranks the final top-k. Bridges the
engine's two retrieval tiers (text/retrieval.py, similarity/ann.py).

Scale shape: stage 1 is the BM25 plan (corpus streams once, postings
shuffle, broadcast query terms); the shortlist is ``bm25_n × queries``
rows — tiny — so stage 2 BROADCASTS it into the embeddings join (the
corpus-sized embedding table streams, never shuffles) and the query
vectors ride a second broadcast. No stage is ever corpus × queries.

Cross-engine exactness: the blend is a pure per-row expression over
exact inputs — BM25 scores enter as the quantized BIGINT tier
(aggregation-order-free), the per-query max used for normalization is
an exact integer max, and the cosine reuses the ann tier's
bit-mirrored dot/norm folds — so the hybrid score hashes identically
on both engines without further quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cngi_prototype_spark.similarity.ann import SQL_DVEC, _dvec, cosine, sql_cosine
from cngi_prototype_spark.text.retrieval import bm25_topk, sql_bm25_topk

__all__ = ["hybrid_search", "hybrid_search_from_stores", "rrf_search",
           "sql_hybrid_search", "sql_rrf_search"]


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_texts: list[tuple[int, str]],
    query_vecs: DataFrame,
    *,
    bm25_n: int = 50,
    k: int = 10,
    w_lex: float = 0.5,
    w_vec: float = 0.5,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BM25 top-``bm25_n`` shortlist → embedding cosine re-score →
    ``w_lex·(bm25/maxₚₑᵣ₋query) + w_vec·cos`` blend → top-``k`` →
    ``(query_id, doc_id, lex_norm, cos_sim, hybrid_score, rank)``.

    ``query_vecs``: ``(query_id, <vec_col>)`` — the dense side of each
    query (one row per query_id in ``query_texts``). Documents missing
    an embedding drop out of the blend (inner join — the hybrid score
    is undefined without both signals)."""
    cand = bm25_topk(docs, query_texts, top_n=bm25_n, quantize=True,
                     text_col=text_col, id_col=doc_id_col)
    return _blend_shortlist(cand, embeddings, query_vecs, k=k,
                            w_lex=w_lex, w_vec=w_vec,
                            vec_id_col=vec_id_col, vec_col=vec_col)


def _blend_shortlist(
    cand: DataFrame,
    embeddings: DataFrame,
    query_vecs: DataFrame,
    *,
    k: int,
    w_lex: float,
    w_vec: float,
    vec_id_col: str,
    vec_col: str,
) -> DataFrame:
    """The cosine re-score + weighted-blend tail over a quantized BM25
    shortlist ``(query_id, doc_id, score_q, ...)`` — shared by
    :func:`hybrid_search` (shortlist built in-plan) and
    :func:`hybrid_search_from_stores` (shortlist from the streaming
    postings store)."""
    wq = Window.partitionBy("query_id")
    # zero-guarded normalization: if every shortlist contribution
    # floor-quantized to 0 (pathologically tiny scores), max == 0 and
    # the division would yield NULL/NaN silently — rank such rows with
    # an explicit 0.0 lexical contribution instead (vector-only blend)
    _max_q = F.max("score_q").over(wq).cast("double")
    cand = cand.withColumn(
        "lex_norm",
        F.when(_max_q > 0,
               F.col("score_q").cast("double") / _max_q)
        .otherwise(F.lit(0.0)))
    emb = embeddings.select(F.col(vec_id_col).alias("doc_id"),
                            _dvec(F.col(vec_col)).alias("cv"))
    qv = query_vecs.select(F.col("query_id"),
                           _dvec(F.col(vec_col)).alias("qv"))
    scored = (emb
              .join(F.broadcast(cand.select("query_id", "doc_id",
                                            "lex_norm")), "doc_id")
              .join(F.broadcast(qv), "query_id")
              .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
              .withColumn("hybrid_score",
                          F.lit(w_lex) * F.col("lex_norm")
                          + F.lit(w_vec) * F.col("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("hybrid_score").desc(), F.col("doc_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "lex_norm", "cos_sim",
                    "hybrid_score", F.col("rank").cast("long").alias("rank")))


def hybrid_search_from_stores(
    spark,
    postings_path: str,
    embeddings: DataFrame,
    query_texts: list[tuple[int, str]],
    query_vecs: DataFrame,
    *,
    bm25_n: int = 50,
    k: int = 10,
    w_lex: float = 0.5,
    w_vec: float = 0.5,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval served from the incrementally maintained BM25
    postings store (``streaming.stream_ops.stream_bm25_postings``) —
    the live-serving composition: lexical shortlist from the store,
    dense re-score from the embeddings table (itself maintainable via
    ``stream_ivf_cells`` or any append sink). Equal to
    :func:`hybrid_search` over the concatenated corpus for any
    batching (property-tested)."""
    from cngi_prototype_spark.text.retrieval import bm25_topk_from_store

    cand = bm25_topk_from_store(spark, postings_path, query_texts,
                                top_n=bm25_n, quantize=True)
    return _blend_shortlist(cand, embeddings, query_vecs, k=k,
                            w_lex=w_lex, w_vec=w_vec,
                            vec_id_col=vec_id_col, vec_col=vec_col)


def rrf_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_texts: list[tuple[int, str]],
    query_vecs: DataFrame,
    *,
    bm25_n: int = 50,
    k: int = 10,
    rrf_k: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reciprocal Rank Fusion over the same two signals (Cormack et
    al. 2009; the Elasticsearch hybrid default): fuse by
    ``Σ 1/(rrf_k + rankₛᵢgₙₐₗ)`` instead of score blending —
    scale-free, so no per-query normalization is needed. The lexical
    rank is BM25's (total order: quantized score desc, doc_id); the
    vector rank orders the SAME shortlist by cosine (cos desc,
    doc_id). Returns ``(query_id, doc_id, lex_rank, vec_rank,
    rrf_score, rank)``. Exactness: ranks are integers and the fused
    score is a sum of exact-input rationals evaluated in signal order
    — hash-safe unquantized."""
    cand = bm25_topk(docs, query_texts, top_n=bm25_n, quantize=True,
                     text_col=text_col, id_col=doc_id_col)
    return _rrf_from_shortlist(cand, embeddings, query_vecs, k=k,
                               rrf_k=rrf_k, vec_id_col=vec_id_col,
                               vec_col=vec_col)


def _rrf_from_shortlist(
    cand: DataFrame,
    embeddings: DataFrame,
    query_vecs: DataFrame,
    *,
    k: int,
    rrf_k: int,
    vec_id_col: str,
    vec_col: str,
) -> DataFrame:
    emb = embeddings.select(F.col(vec_id_col).alias("doc_id"),
                            _dvec(F.col(vec_col)).alias("cv"))
    qv = query_vecs.select(F.col("query_id"),
                           _dvec(F.col(vec_col)).alias("qv"))
    scored = (emb
              .join(F.broadcast(cand.select(
                  "query_id", "doc_id",
                  F.col("rank").alias("lex_rank"))), "doc_id")
              .join(F.broadcast(qv), "query_id")
              .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv"))))
    wv = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id").asc())
    scored = scored.withColumn(
        "vec_rank", F.row_number().over(wv).cast("long"))
    rrf = (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("lex_rank"))
           + F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("vec_rank")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (scored.withColumn("rrf_score", rrf)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "lex_rank", "vec_rank",
                    "rrf_score", "rank"))


def rrf_search_from_stores(
    spark,
    postings_path: str,
    embeddings: DataFrame,
    query_texts: list[tuple[int, str]],
    query_vecs: DataFrame,
    *,
    bm25_n: int = 50,
    k: int = 10,
    rrf_k: int = 60,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """RRF retrieval served from the incrementally maintained BM25
    postings store — completes the store-served family next to
    :func:`hybrid_search_from_stores`: lexical ranks come from the
    store's shortlist, vector ranks from the embeddings table, fused
    by the same exact-rational expression. Equal to :func:`rrf_search`
    over the concatenated corpus for any batching (property-tested)."""
    from cngi_prototype_spark.text.retrieval import bm25_topk_from_store

    cand = bm25_topk_from_store(spark, postings_path, query_texts,
                                top_n=bm25_n, quantize=True)
    return _rrf_from_shortlist(cand, embeddings, query_vecs, k=k,
                               rrf_k=rrf_k, vec_id_col=vec_id_col,
                               vec_col=vec_col)


def sql_rrf_search(
    query_texts: list[tuple[int, str]],
    *,
    bm25_n: int = 50,
    k: int = 10,
    rrf_k: int = 60,
    query_vec_pred: str = "vec_id < 3",
) -> str:
    """DuckDB twin of :func:`rrf_search` (same shortlist, same rank
    orders, same fusion expression)."""
    dv = SQL_DVEC.format(v="embedding")
    cos = sql_cosine("q.qv", "e.cv")
    return f"""
    WITH cand AS ({sql_bm25_topk(query_texts, top_n=bm25_n,
                                 quantize=True)}),
    e AS (SELECT vec_id AS doc_id, {dv} AS cv FROM embeddings),
    q AS (SELECT vec_id AS query_id, {dv} AS qv FROM embeddings
          WHERE {query_vec_pred}),
    scored AS (
      SELECT cand.query_id, cand.doc_id,
             cand.rank AS lex_rank, {cos} AS cos_sim
      FROM cand
      JOIN e ON e.doc_id = cand.doc_id
      JOIN q ON q.query_id = cand.query_id
    ),
    vr AS (
      SELECT query_id, doc_id, lex_rank,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT)
               AS vec_rank
      FROM scored
    ),
    fused AS (
      SELECT query_id, doc_id, lex_rank, vec_rank,
             1.0 / ({float(rrf_k)!r} + lex_rank)
             + 1.0 / ({float(rrf_k)!r} + vec_rank) AS rrf_score
      FROM vr
    )
    SELECT query_id, doc_id, lex_rank, vec_rank, rrf_score,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY rrf_score DESC, doc_id ASC) AS BIGINT) AS rank
    FROM fused QUALIFY rank <= {k}
    """


def sql_hybrid_search(
    query_texts: list[tuple[int, str]],
    *,
    bm25_n: int = 50,
    k: int = 10,
    w_lex: float = 0.5,
    w_vec: float = 0.5,
    query_vec_pred: str = "vec_id < 3",
) -> str:
    """DuckDB twin of :func:`hybrid_search` over the ``documents`` +
    ``embeddings`` views, with query vectors drawn from ``embeddings``
    rows matching ``query_vec_pred`` (vec_id = query_id — the gate
    convention)."""
    dv = SQL_DVEC.format(v="embedding")
    cos = sql_cosine("q.qv", "e.cv")
    return f"""
    WITH cand0 AS ({sql_bm25_topk(query_texts, top_n=bm25_n,
                                  quantize=True)}),
    cand AS (
      -- zero-guarded normalization, mirroring the Spark side: a
      -- shortlist whose every contribution floor-quantized to 0
      -- ranks with an explicit 0.0 lexical term (vector-only blend)
      SELECT query_id, doc_id,
             CASE WHEN MAX(score_q) OVER (PARTITION BY query_id) > 0
                  THEN CAST(score_q AS DOUBLE)
                       / CAST(MAX(score_q) OVER (PARTITION BY query_id)
                              AS DOUBLE)
                  ELSE 0.0 END AS lex_norm
      FROM cand0
    ),
    e AS (SELECT vec_id AS doc_id, {dv} AS cv FROM embeddings),
    q AS (SELECT vec_id AS query_id, {dv} AS qv FROM embeddings
          WHERE {query_vec_pred}),
    scored AS (
      SELECT cand.query_id, cand.doc_id, cand.lex_norm,
             {cos} AS cos_sim,
             {w_lex!r} * cand.lex_norm + {w_vec!r} * ({cos}) AS hybrid_score
      FROM cand
      JOIN e ON e.doc_id = cand.doc_id
      JOIN q ON q.query_id = cand.query_id
    ),
    ranked AS (
      SELECT query_id, doc_id, lex_norm, cos_sim, hybrid_score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY hybrid_score DESC, doc_id ASC) AS BIGINT)
               AS rank
      FROM scored
    )
    SELECT query_id, doc_id, lex_norm, cos_sim, hybrid_score, rank
    FROM ranked WHERE rank <= {k}
    """
