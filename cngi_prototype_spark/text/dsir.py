"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS, "Data Selection for Language Models via Importance
Resampling").

The published recipe for picking pretraining documents that "look
like" a target corpus without training a model: fit bag-of-HASHED-
n-gram unigram+bigram distributions on the target and on the raw pool,
weight every raw document by its log likelihood ratio, then draw the
selection with Gumbel-top-k (sampling without replacement proportional
to the importance weights). Beyond the reference's surface (it has no
text tier) but first-class for the training-data pipeline.

Model — hashed bag-of-ngrams with Laplace smoothing over B buckets:

- feature stream:   every unigram w and bigram "prev w", hashed to
                    bucket h(f) = md5_num(f) mod B
- bucket probs:     p̂(b) = (c(b) + 1) / (N + B)   per corpus
- doc log-weight:   Σ_features  ln p̂_target(h(f)) − ln p̂_raw(h(f))
- selection:        Gumbel-top-k on  logw + G_i,
                    G_i = −ln(−ln u_i), u_i a seeded md5 uniform

One formula covers seen and unseen buckets (c := 0), so both engines
share a single expression tree.

Scale design: both count tables are BUCKET-bounded (B rows, default
2^16) regardless of corpus size — they broadcast; their totals ride the
same 1-row broadcast. Scoring shuffles the corpus-sized feature stream
exactly ONCE (the final ``groupBy(doc_id)``, partial aggs map-side);
feature extraction is a zero-shuffle projection (tokenize once,
transform + explode). The Gumbel keys are pure per-row expressions —
no RNG state, no driver round-trip — so resampling is a deterministic
function of (doc_id, seed) and reproduces bit-identically across runs
and engines.

Cross-engine exactness: per-feature log-ratios are identical IEEE
expression trees (exact integer counts, two ``ln``) quantized to BIGINT
nano-units, so per-document sums are aggregation-order-free — the
functions/exact.py convention, same as text/lm.py and
text/classifier.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.text.analysis import (
    _sql_tokens,
    _tokens,
    md5_num,
    sql_md5_num,
)

__all__ = ["dsir_features", "dsir_weights", "dsir_resample",
           "dsir_resample_from_weights",
           "sql_dsir_weights", "sql_dsir_resample"]

_U_MOD = 1 << 30  # uniform-grid size for the seeded Gumbel draw


def dsir_features(
    docs: DataFrame,
    *,
    buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket) for every unigram and bigram occurrence —
    zero-shuffle projection: tokenize once, one transform + explode,
    hash to ``md5_num(feature) mod buckets``."""
    toks = _tokens(F.col(text_col))
    feats = F.concat(
        toks,
        F.transform(
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda t, i: F.concat_ws(" ", F.element_at(toks, i + 1), t)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(feats).alias("_f"),
    ).select("doc_id", F.pmod(md5_num(F.col("_f")),
                              F.lit(buckets)).alias("bucket"))


def _bucket_counts(feats: DataFrame, name: str) -> DataFrame:
    return feats.groupBy("bucket").agg(F.count("*").alias(name))


def dsir_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    *,
    buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: bool = False,
) -> DataFrame:
    """Per-document DSIR importance weight →
    ``(doc_id, n_features, logw)`` (``logw_q`` BIGINT nano-units when
    ``quantize=True`` — the exact-gate form). ``logw`` is the log
    likelihood ratio ln p̂_target(doc) − ln p̂_raw(doc) under the hashed
    bag-of-ngrams model; the raw distribution fits on ``docs`` itself
    (the pool being selected from, as in the paper)."""
    feats = dsir_features(docs, buckets=buckets,
                          text_col=text_col, id_col=id_col)
    tfeats = dsir_features(target_docs, buckets=buckets,
                           text_col=text_col, id_col=id_col)
    # materialize the bucket-bounded (B rows max) count tables ONCE:
    # the merged broadcast table AND the totals derive from them —
    # without this each leg re-runs the corpus-sized tokenize +
    # md5-hash + explode (measured 12.2 s -> ~5 s for dsir_select at
    # sf0.1; the duplicate_clusters edge-list precedent)
    raw = _bucket_counts(feats, "c_r").localCheckpoint(eager=True)
    tgt = _bucket_counts(tfeats, "c_t").localCheckpoint(eager=True)
    table = raw.join(tgt, "bucket", "full_outer")
    # every feature lands in exactly one bucket, so the stream counts
    # equal the bucket-count sums — no second corpus pass
    totals = (raw.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("n_r"))
              .crossJoin(tgt.agg(F.coalesce(F.sum("c_t"),
                                            F.lit(0)).alias("n_t"))))
    lr = (F.log((F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double")
                / (F.col("n_t") + F.lit(buckets)).cast("double"))
          - F.log((F.coalesce(F.col("c_r"), F.lit(0)) + 1).cast("double")
                  / (F.col("n_r") + F.lit(buckets)).cast("double")))
    contrib = (F.floor(lr * F.lit(1e9) + F.lit(0.5)).cast("long")
               if quantize else lr)
    col = "logw_q" if quantize else "logw"
    return (feats
            .join(F.broadcast(table), "bucket", "left")
            .crossJoin(F.broadcast(totals))
            .select("doc_id", contrib.alias("_lr"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_features"),
                 F.sum("_lr").alias(col)))


def _gumbel(doc_id: Column, seed: int) -> Column:
    """Deterministic seeded Gumbel(0,1) draw from a doc-keyed md5
    uniform on the half-open grid ((j + 0.5) / 2^30) — never 0 or 1,
    so both logs are finite. Mirrored verbatim by the SQL twin."""
    u = ((F.pmod(md5_num(F.concat_ws(":", doc_id.cast("string"),
                                     F.lit(str(seed)))),
                 F.lit(_U_MOD)).cast("double") + F.lit(0.5))
         / F.lit(float(_U_MOD)))
    return -F.log(-F.log(u))


def dsir_resample(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    *,
    seed: int = 0,
    temperature: float = 1.0,
    buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k selection of ``k`` documents proportional to their
    DSIR importance weights (sampling WITHOUT replacement, the paper's
    §2.2 construction): key = logw / temperature + Gumbel_i, take the
    top k. Deterministic in (doc_id, seed) → reproducible shards.

    Returns ``(doc_id, n_features, logw, gumbel_key, rank)`` for the
    selected documents. The top-k is ``orderBy().limit(k)`` —
    Spark plans it as TakeOrderedAndProject (per-partition partial
    top-k, then a merge of k-row heads), never a full global sort of
    the corpus; the rank window runs over the already-bounded k rows."""
    w = dsir_weights(docs, target_docs, buckets=buckets,
                     text_col=text_col, id_col=id_col, quantize=True)
    return dsir_resample_from_weights(w, k, seed=seed,
                                      temperature=temperature)


def dsir_resample_from_weights(
    weights: DataFrame,
    k: int,
    *,
    seed: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """The Gumbel-top-k keying/selection step of :func:`dsir_resample`
    over an already-computed quantized weights table — the keying is a
    pure per-row expression, so callers that also need the weights
    (the gate query) reuse one weight pipeline instead of two."""
    key = (F.col("logw_q").cast("double") / F.lit(1e9)
           / F.lit(float(temperature))
           + _gumbel(F.col("doc_id"), seed))
    from pyspark.sql import Window
    keyed = weights.select("doc_id", "n_features",
                           (F.col("logw_q").cast("double") / F.lit(1e9))
                           .alias("logw"),
                           key.alias("gumbel_key"))
    order = [F.col("gumbel_key").desc(), F.col("doc_id").asc()]
    topk = keyed.orderBy(*order).limit(k)
    # window over k rows, not the corpus — bounded by construction
    return topk.withColumn("rank", F.row_number().over(
        Window.orderBy(*order)))


def sql_dsir_weights(
    target_filter: str,
    *,
    buckets: int = 1 << 16,
    quantize: bool = True,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`dsir_weights` over the ``documents`` view
    — raw pool = the whole table, target = rows matching
    ``target_filter`` (same tokenizer, same hash, same quantized
    log-ratio expression)."""
    toks = _sql_tokens("text")
    bucket = f"CAST({sql_md5_num('f')} % {buckets} AS BIGINT)"
    lr = (f"ln(CAST(COALESCE(t.c_t, 0) + 1 AS DOUBLE)"
          f" / CAST(nt.n_t + {buckets} AS DOUBLE))"
          f" - ln(CAST(COALESCE(r.c_r, 0) + 1 AS DOUBLE)"
          f" / CAST(nr.n_r + {buckets} AS DOUBLE))")
    contrib = (f"CAST(floor(({lr}) * 1000000000.0 + 0.5) AS BIGINT)"
               if quantize else lr)
    col = "logw_q" if quantize else "logw"
    typ = "BIGINT" if quantize else "DOUBLE"
    return f"""
    WITH toksrc AS (SELECT doc_id, {toks} AS toks FROM {table}),
    feats AS (
      SELECT doc_id, {bucket} AS bucket FROM (
        SELECT doc_id, unnest(
          list_concat(toks,
            list_transform(range(2, len(toks) + 1),
                           i -> toks[i - 1] || ' ' || toks[i]))) AS f
        FROM toksrc
      )
    ),
    tfeats AS (
      SELECT f.bucket FROM feats f
      JOIN {table} d ON d.doc_id = f.doc_id
      WHERE {target_filter}
    ),
    raw AS (SELECT bucket, COUNT(*)::BIGINT AS c_r FROM feats
            GROUP BY bucket),
    tgt AS (SELECT bucket, COUNT(*)::BIGINT AS c_t FROM tfeats
            GROUP BY bucket),
    nr AS (SELECT COUNT(*)::BIGINT AS n_r FROM feats),
    nt AS (SELECT COUNT(*)::BIGINT AS n_t FROM tfeats)
    SELECT f.doc_id AS doc_id, COUNT(*)::BIGINT AS n_features,
           CAST(SUM({contrib}) AS {typ}) AS {col}
    FROM feats f
    LEFT JOIN raw r ON r.bucket = f.bucket
    LEFT JOIN tgt t ON t.bucket = f.bucket
    CROSS JOIN nr CROSS JOIN nt
    GROUP BY f.doc_id
    """


def sql_dsir_resample(
    target_filter: str,
    k: int,
    *,
    seed: int = 0,
    temperature: float = 1.0,
    buckets: int = 1 << 16,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`dsir_resample` (same quantized weights,
    same seeded md5 Gumbel grid, same rank tie-break)."""
    md5_arg = f"CAST(doc_id AS VARCHAR) || ':{seed}'"
    u = (f"(CAST({sql_md5_num(md5_arg)} % {_U_MOD} AS DOUBLE) + 0.5)"
         f" / {float(_U_MOD)!r}")
    key = (f"CAST(logw_q AS DOUBLE) / 1000000000.0 / {float(temperature)!r}"
           f" + (-ln(-ln({u})))")
    return f"""
    WITH w AS ({sql_dsir_weights(target_filter, buckets=buckets,
                                 quantize=True, table=table)}),
    keyed AS (
      SELECT doc_id, n_features,
             CAST(logw_q AS DOUBLE) / 1000000000.0 AS logw,
             {key} AS gumbel_key
      FROM w
    )
    SELECT doc_id, n_features, logw, gumbel_key,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER
               (ORDER BY gumbel_key DESC, doc_id ASC) AS rank
      FROM keyed
    ) WHERE rank <= {k}
    """
