"""N-gram language-model perplexity scoring (CCNet-style quality
filtering).

The canonical LM-quality pass for training corpora (Wenzek et al.
2020 "CCNet" filters on LM perplexity; Brants et al. 2007 "stupid
backoff" is the smoothing that scales to web-size counts): train
bigram/unigram counts, score each document by its mean token
log-probability, keep/bucket by the score. Beyond the reference's
surface (it has no text tier) but first-class for the training-data
pipeline.

Model — stupid backoff with score reset at document starts:

- first token:             p(w₁)        = c(w₁) / N
- subsequent tokens:       p(wᵢ|wᵢ₋₁)  = c(wᵢ₋₁wᵢ) / c_ctx(wᵢ₋₁)
  backing off (bigram unseen) to        α · c(wᵢ) / N,  α = 0.4
  where ``c_ctx(prev)`` counts ``prev`` as a bigram *context*
  (bigrams starting with prev), so the bigram distribution per
  context sums to 1 over observed continuations.

Scale design: bigram extraction is a zero-shuffle projection
(``transform(sequence(...))`` over the tokenized array); all count
tables are corpus-bound aggregations with map-side combine. Scoring
touches the corpus-sized gram stream with exactly ONE shuffle join —
on ``(prev, w)`` against the bigram table, into which ``c_ctx`` is
denormalized (a bigram-table-sized window, never a gram-stream join;
``c_ctx`` is only ever read when ``c_bi`` is non-null, so the
denormalized form is value-identical). The unigram table is
vocab-sized (Heaps' law: ≪ corpus) and broadcast by default; the
1-row total is a broadcast. Nothing is ever per-pair or driver-side.

Cross-engine exactness: per-token log-probabilities are identical IEEE
expression trees (counts are exact integers, one ``ln``) quantized to
BIGINT nano-units, so the per-document sum is aggregation-order-free —
the functions/exact.py convention, same as text/retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.text.analysis import _sql_tokens, _tokens

__all__ = ["lm_counts", "lm_doc_logprob", "lm_doc_logprob_from_counts",
           "lm_doc_logprob_from_store", "sql_lm_doc_logprob"]


def _doc_grams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos, w, prev) for every token — prev NULL at pos 1.
    Pure projection: tokenize once, one transform+explode."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos0", "w"),
        toks.alias("_toks"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "w",
        F.when(F.col("pos0") > 0,
               F.col("_toks")[F.col("pos0") - 1]).alias("prev"),
    )


def _logp(alpha: float) -> Column:
    """Per-token log-probability — association order mirrored by
    :func:`_sql_logp`."""
    uni = F.col("c_w").cast("double") / F.col("n_total").cast("double")
    bi = F.col("c_bi").cast("double") / F.col("c_ctx").cast("double")
    p = (F.when(F.col("prev").isNull(), uni)
         .when(F.col("c_bi").isNotNull(), bi)
         .otherwise(F.lit(alpha) * uni))
    return F.log(p)


def _sql_logp(alpha: float) -> str:
    uni = "(CAST(c_w AS DOUBLE) / CAST(n_total AS DOUBLE))"
    bi = "(CAST(c_bi AS DOUBLE) / CAST(c_ctx AS DOUBLE))"
    return (f"ln(CASE WHEN prev IS NULL THEN {uni} "
            f"WHEN c_bi IS NOT NULL THEN {bi} "
            f"ELSE {alpha!r} * {uni} END)")


def lm_doc_logprob(
    docs: DataFrame,
    *,
    train_docs: DataFrame | None = None,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: bool = False,
    broadcast_unigrams: bool = True,
) -> DataFrame:
    """Per-document stupid-backoff LM score →
    ``(doc_id, n_tokens, logprob)`` (``logprob_q`` BIGINT nano-units
    when ``quantize=True`` — the exact-gate form; mean log-prob /
    perplexity derive as ``logprob / n_tokens``).

    ``train_docs``: the corpus the counts train on (defaults to
    ``docs`` — self-perplexity, the deterministic gate shape; CCNet
    trains on a trusted reference corpus and scores the crawl).
    Tokens unseen in training score NULL log-probability rows and are
    excluded from the sum with their count in ``n_unseen`` — an
    honesty column, never a silent drop."""
    grams = _doc_grams(docs, text_col, id_col)
    tgrams = (grams if train_docs is None
              else _doc_grams(train_docs, text_col, id_col))
    # r14: ONE corpus pass builds both count tables. The unified
    # (prev, w) count — prev NULL marking position-1 grams — yields
    #   c_w  = Σ over every prev (incl. NULL) of c(prev, w)
    #          (every occurrence of w has exactly one prev slot), and
    #   c_bi = the prev-NOT-NULL rows verbatim.
    # The table is bigram-vocab-bounded, so the localCheckpoint is a
    # bounded materialization (NOT a corpus-sized cache) that stops the
    # uni/bi diamond from re-tokenizing and re-aggregating the corpus
    # once per branch (the old form paid the gram pass twice and
    # shuffled two count tables instead of one). Eager by design: the
    # counts job runs at plan-build, mirroring dedup.py's documented
    # convention.
    unified = (tgrams.groupBy("prev", "w")
               .agg(F.count("*").alias("c")).localCheckpoint())
    uni = unified.groupBy("w").agg(F.sum("c").alias("c_w"))
    bi = (unified.filter(F.col("prev").isNotNull())
          .select("prev", "w", F.col("c").alias("c_bi")))
    return _score_grams(grams, uni, bi, alpha=alpha, quantize=quantize,
                        broadcast_unigrams=broadcast_unigrams)


def _score_grams(grams: DataFrame, uni: DataFrame, bi: DataFrame,
                 *, alpha: float, quantize: bool,
                 broadcast_unigrams: bool = True) -> DataFrame:
    """Score positional grams against unigram/bigram count tables —
    the shared tail of :func:`lm_doc_logprob` (counts built in-plan)
    and :func:`lm_doc_logprob_from_counts` (counts accumulated by
    ``streaming.stream_ops.stream_lm_counts``).

    ``c_ctx`` is denormalized into the bigram table via a
    bigram-table-sized window (it is only read when ``c_bi`` is
    non-null — see :func:`_logp` — so rows where the bigram is unseen
    never touch it and the denormalized form is value-identical to a
    separate ``prev``-keyed join). With ``broadcast_unigrams`` (the
    default; disable only when the vocab itself exceeds executor
    memory) the corpus-sized gram stream shuffles exactly once: the
    ``(prev, w)`` join against the bigram table."""
    from pyspark.sql import Window

    bi_ctx = bi.withColumn(
        "c_ctx", F.sum("c_bi").over(Window.partitionBy("prev")))
    total = uni.agg(F.sum("c_w").alias("n_total"))
    uni_side = F.broadcast(uni) if broadcast_unigrams else uni
    scored = (grams
              .join(uni_side, "w", "left")
              .join(bi_ctx, ["prev", "w"], "left")
              .crossJoin(F.broadcast(total)))
    lp = F.when(F.col("c_w").isNotNull(), _logp(alpha))
    contrib = (F.floor(lp * F.lit(1e9) + F.lit(0.5)).cast("long")
               if quantize else lp)
    col = "logprob_q" if quantize else "logprob"
    return (scored
            .select("doc_id", contrib.alias("_lp"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("_lp").alias(col),
                 F.sum(F.when(F.col("_lp").isNull(), 1)
                       .otherwise(0)).alias("n_unseen")))


def lm_counts(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unified LM count rows ``(prev, w, c)`` — unigram rows carry
    ``prev`` NULL, bigram rows the context token. Additive: counts
    from disjoint corpus slices SUM to the whole-corpus counts, which
    is what makes the streaming store
    (``stream_lm_counts`` + ``compact_store(sum_cols=['c'])``) exact."""
    grams = _doc_grams(docs, text_col, id_col)
    uni = (grams.groupBy("w").agg(F.count("*").alias("c"))
           .select(F.lit(None).cast("string").alias("prev"), "w", "c"))
    bi = (grams.filter(F.col("prev").isNotNull())
          .groupBy("prev", "w").agg(F.count("*").alias("c")))
    return uni.unionByName(bi)


def lm_doc_logprob_from_counts(
    docs: DataFrame,
    counts: DataFrame,
    *,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: bool = False,
    broadcast_unigrams: bool = True,
) -> DataFrame:
    """Score documents against an externally accumulated
    :func:`lm_counts` table (possibly per-batch partials — they are
    re-summed here, so the streaming store needs no pre-merge)."""
    uni = (counts.filter(F.col("prev").isNull())
           .groupBy("w").agg(F.sum("c").alias("c_w")))
    bi = (counts.filter(F.col("prev").isNotNull())
          .groupBy("prev", "w").agg(F.sum("c").alias("c_bi")))
    grams = _doc_grams(docs, text_col, id_col)
    return _score_grams(grams, uni, bi, alpha=alpha, quantize=quantize,
                        broadcast_unigrams=broadcast_unigrams)


def lm_doc_logprob_from_store(
    spark,
    counts_path: str,
    docs: DataFrame,
    **kwargs,
) -> DataFrame:
    """Score against the persistent count store maintained by
    ``streaming.stream_ops.stream_lm_counts`` — drops the ``_batch``
    epoch column and any full-expiry sentinel row (a sentinel has
    ``w`` NULL; real unigram rows only ever have ``prev`` NULL)."""
    counts = spark.read.parquet(counts_path)
    counts = counts.filter(F.col("w").isNotNull())
    if "_batch" in counts.columns:
        counts = counts.drop("_batch")
    return lm_doc_logprob_from_counts(docs, counts, **kwargs)


def sql_lm_doc_logprob(alpha: float = 0.4, quantize: bool = True) -> str:
    """DuckDB twin of :func:`lm_doc_logprob` over the ``documents``
    view (self-perplexity shape — same tokenizer, same count tables,
    same quantized log-prob expression)."""
    toks = _sql_tokens("text")
    col = "logprob_q" if quantize else "logprob"
    lp = _sql_logp(alpha)
    contrib = (f"CAST(floor(({lp}) * 1000000000.0 + 0.5) AS BIGINT)"
               if quantize else lp)
    return f"""
    WITH grams AS (
      SELECT doc_id, g.pos AS pos, g.w AS w, g.prev AS prev
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) + 1),
                 i -> struct_pack(pos := i, w := toks[i],
                                  prev := CASE WHEN i > 1
                                          THEN toks[i - 1] END))) AS g
        FROM (SELECT doc_id, {toks} AS toks FROM documents)
      )
    ),
    uni AS (SELECT w, COUNT(*)::BIGINT AS c_w FROM grams GROUP BY w),
    bi AS (
      SELECT prev, w, COUNT(*)::BIGINT AS c_bi FROM grams
      WHERE prev IS NOT NULL GROUP BY prev, w
    ),
    ctx AS (SELECT prev, SUM(c_bi)::BIGINT AS c_ctx FROM bi GROUP BY prev),
    total AS (SELECT SUM(c_w)::BIGINT AS n_total FROM uni),
    scored AS (
      SELECT doc_id, {contrib} AS _lp FROM (
        SELECT g.doc_id, g.prev AS prev, uni.c_w AS c_w,
               bi.c_bi AS c_bi, ctx.c_ctx AS c_ctx,
               total.n_total AS n_total
        FROM grams g
        LEFT JOIN uni ON uni.w = g.w
        LEFT JOIN bi ON bi.prev = g.prev AND bi.w = g.w
        LEFT JOIN ctx ON ctx.prev = g.prev
        CROSS JOIN total
      )
    )
    SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
           CAST(SUM(_lp) AS {'BIGINT' if quantize else 'DOUBLE'})
             AS {col},
           CAST(SUM(CASE WHEN _lp IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unseen
    FROM scored GROUP BY doc_id
    """
