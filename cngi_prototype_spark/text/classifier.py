"""Multinomial Naive Bayes document classifier (train + score).

The classic closed-form text classifier (McCallum & Nigam 1998,
"A Comparison of Event Models for Naive Bayes Text Classification") —
the role fastText-style linear classifiers play in public LLM data
pipelines: GPT-3 / CCNet / RefinedWeb all gate web documents on a cheap
supervised "looks like the reference corpus" classifier before the
expensive stages. Beyond the reference's surface (it has no text tier)
but first-class for the training-data pipeline.

Model — Laplace-smoothed multinomial NB over whitespace tokens:

- log-prior:            log( d_l / d_total )          (document counts)
- per-token log-prob:   log( (c_lt + 1) / (n_l + V) ) (token counts)
- doc score per label:  prior_l + Σ_tokens logp_l(t)
- prediction:           argmax label, lexicographic tie-break

One formula covers seen AND unseen tokens (c_lt := 0 when the pair is
unseen), so there is no separate out-of-vocabulary branch to keep in
sync across engines.

Scale design: the model is (vocab × labels)-bounded (Heaps' law:
≪ corpus) and rides a BROADCAST join, pivoted to one count column per
label so the corpus-sized token stream is never multiplied by the label
count; global scalars (class totals, vocab size, priors) ride a 1-row
broadcast crossJoin. Scoring shuffles the corpus stream exactly ONCE
(the final ``groupBy(doc_id)``, partial aggs map-side); the per-label
sums are k parallel agg columns, and argmax / margin are pure per-row
expressions (``greatest`` + ``array_sort``), no window over the corpus.
The label set is collected on the driver — bounded by construction
(a classifier with unbounded classes is not a classifier), same
justification tier as a broadcast-threshold probe.

Count rows are ADDITIVE over disjoint corpus slices (the ``lm_counts``
convention: token rows plus NULL-token document-count rows), so the
streaming maintainer ``streaming.stream_ops.stream_nb_counts`` +
``compact_store(sum_cols=['c'])`` accumulates them incrementally and
``nb_classify_from_counts`` scores bit-identically to the batch
operator (property-tested).

Cross-engine exactness: per-token log-probabilities are identical IEEE
expression trees (exact integer counts, one ``ln``) quantized to BIGINT
nano-units, so per-document sums are aggregation-order-free — the
functions/exact.py convention, same as text/lm.py and
text/retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.text.analysis import _sql_tokens, _tokens

__all__ = ["nb_counts", "nb_classify", "nb_classify_from_counts",
           "nb_classify_from_store", "sql_nb_classify"]

_QUANT = "1000000000.0"  # nano-unit quantization for the exact gate sum


def _q(lp: Column, quantize: bool) -> Column:
    return (F.floor(lp * F.lit(1e9) + F.lit(0.5)).cast("long")
            if quantize else lp)


def _sql_q(lp: str, quantize: bool) -> str:
    return (f"CAST(floor(({lp}) * {_QUANT} + 0.5) AS BIGINT)"
            if quantize else lp)


def nb_counts(
    train_docs: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Unified NB count rows ``(label, token, c)`` — token rows carry
    class-conditional token counts, NULL-token rows the per-class
    DOCUMENT count (the prior numerator). Additive: counts from
    disjoint corpus slices SUM to the whole-corpus counts, which is
    what makes the streaming store (``stream_nb_counts`` +
    ``compact_store(sum_cols=['c'])``) exact."""
    base = train_docs.filter(F.col(label_col).isNotNull())
    grams = base.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("token"))
    tok = grams.groupBy("label", "token").agg(F.count("*").alias("c"))
    docs = (base.groupBy(F.col(label_col).alias("label"))
            .agg(F.count("*").alias("c"))
            .select("label", F.lit(None).cast("string").alias("token"), "c"))
    return tok.select("label", "token", "c").unionByName(docs)


def nb_classify(
    docs: DataFrame,
    *,
    train_docs: DataFrame | None = None,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: bool = False,
) -> DataFrame:
    """Score (and argmax-classify) every document against a multinomial
    NB model trained on ``train_docs`` (defaults to ``docs`` —
    self-train, the deterministic gate shape; production trains on a
    labeled curated set and scores the crawl).

    Returns ``(doc_id, n_tokens, label_pred, score, margin)`` —
    ``score`` the winning log-joint, ``margin`` its lead over the
    runner-up label (0 on a tie; the standard selection-confidence
    knob). ``quantize=True`` emits BIGINT nano-unit ``score_q`` /
    ``margin_q`` — the exact-gate form."""
    counts = nb_counts(train_docs if train_docs is not None else docs,
                       label_col=label_col, text_col=text_col)
    return nb_classify_from_counts(
        docs, counts, text_col=text_col, id_col=id_col, quantize=quantize)


def nb_classify_from_counts(
    docs: DataFrame,
    counts: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: bool = False,
) -> DataFrame:
    """Score documents against an externally accumulated
    :func:`nb_counts` table (possibly per-batch partials — they are
    re-summed here, so the streaming store needs no pre-merge).

    .. note:: EAGER at construction time (the dedup.py convention):
       building the returned DataFrame runs the training-side count
       aggregation immediately via ``localCheckpoint(eager=True)`` and
       pins the vocab×labels model blocks in executor storage for the
       session — the checkpoint is what keeps the corpus-sized
       tokenize+explode from re-running once per model leg (measured
       6.2 s → ~2 s at sf0.1). Callers that only want to *declare* the
       plan should defer calling this until first execution."""
    # label IS NOT NULL also drops compact_store's full-expiry
    # sentinel (an all-NULL row) — the bm25_topk_from_store guard,
    # without which the sentinel would fabricate a NULL class and
    # break the sorted() label collect
    counts = counts.filter(F.col("label").isNotNull())
    tok = (counts.filter(F.col("token").isNotNull())
           .groupBy("label", "token").agg(F.sum("c").alias("c")))
    pri = (counts.filter(F.col("token").isNull())
           .groupBy("label").agg(F.sum("c").alias("d_l")))
    # materialize the bounded tables ONCE: the model pivot, per-class
    # totals and vocab size all derive from `tok` — without this each
    # leg re-runs the corpus-sized tokenize+explode+groupBy (measured
    # 6.2 s -> ~2 s for nb_classify at sf0.1). Size is vocab x labels,
    # the bounded quantity this operator is designed around (the
    # duplicate_clusters edge-list precedent).
    tok = tok.localCheckpoint(eager=True)
    pri = pri.localCheckpoint(eager=True)
    # the label set is bounded by construction — collect it so the
    # per-label sums can be k parallel agg columns instead of a k-times
    # multiplied corpus stream (same tier as a broadcast-size probe)
    labels = sorted(r["label"] for r in pri.select("label").collect())
    if not labels:
        raise ValueError("nb_classify: no labeled training documents")
    # model: one count column per label, vocab-sized -> broadcast.
    # Pivot outputs are renamed POSITIONALLY (group cols, then one col
    # per entry of the explicit values list, in list order) — label
    # values come from data, so name-based access (even backtick-
    # quoted) would break on parser-hostile characters.
    model = (tok.groupBy("token")
             .pivot("label", labels)
             .agg(F.sum("c"))
             .toDF("token", *[f"_c_{i}" for i in range(len(labels))]))
    # 1-row global stats: per-class token totals, vocab size, priors
    stats = (tok.groupBy().pivot("label", labels).agg(F.sum("c"))
             .toDF(*[f"_n_{i}" for i in range(len(labels))]))
    vocab = tok.select(F.count_distinct("token").alias("_v"))
    pw = (pri.groupBy().pivot("label", labels).agg(F.sum("d_l"))
          .toDF(*[f"_d_{i}" for i in range(len(labels))]))
    dtot = pri.agg(F.sum("d_l").alias("_dt"))
    stats_row = (stats.crossJoin(vocab).crossJoin(pw).crossJoin(dtot))

    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("token"))
    j = (grams
         .join(F.broadcast(model), "token", "left")
         .crossJoin(F.broadcast(stats_row)))

    def lp(i: int) -> Column:
        num = (F.coalesce(F.col(f"_c_{i}"), F.lit(0)) + 1).cast("double")
        # a class whose training docs carry no tokens has n_l = 0 (the
        # SQL twin derives classes from the priors table for the same
        # reason — dropping the class entirely would diverge)
        den = (F.coalesce(F.col(f"_n_{i}"), F.lit(0))
               + F.col("_v")).cast("double")
        return _q(F.log(num / den), quantize)

    agg = (j.groupBy("doc_id")
           .agg(F.count("*").alias("n_tokens"),
                *[F.sum(lp(i)).alias(f"_s_{i}")
                  for i in range(len(labels))]))

    def prior(i: int) -> Column:
        return _q(F.log(F.col(f"_d_{i}").cast("double")
                        / F.col("_dt").cast("double")), quantize)

    scored = agg.crossJoin(F.broadcast(stats_row)).select(
        "doc_id", "n_tokens",
        *[(F.col(f"_s_{i}") + prior(i)).alias(f"_t_{i}")
          for i in range(len(labels))])
    score_cols = [F.col(f"_t_{i}") for i in range(len(labels))]
    best = F.greatest(*score_cols) if len(labels) > 1 else score_cols[0]
    pred = F.lit(labels[-1])
    for i in range(len(labels) - 2, -1, -1):
        pred = F.when(F.col(f"_t_{i}") == best, F.lit(labels[i])) \
                .otherwise(pred)
    # lexicographic tie-break: the chain is built last-to-first so the
    # smallest label whose score equals the max wins
    if len(labels) > 1:
        arr = F.array_sort(F.array(*score_cols))
        margin = best - F.element_at(arr, len(labels) - 1)
    else:
        margin = F.lit(0).cast("long" if quantize else "double")
    sfx = "_q" if quantize else ""
    return scored.select(
        "doc_id", "n_tokens", pred.alias("label_pred"),
        best.alias(f"score{sfx}"), margin.alias(f"margin{sfx}"))


def nb_classify_from_store(
    spark,
    counts_path: str,
    docs: DataFrame,
    **kwargs,
) -> DataFrame:
    """Score against the parquet count store maintained by
    ``streaming.stream_ops.stream_nb_counts`` — the live-classifier
    serving path (equal-to-batch property-tested)."""
    counts = spark.read.parquet(counts_path).select("label", "token", "c")
    return nb_classify_from_counts(docs, counts, **kwargs)


def sql_nb_classify(
    label_col: str = "lang",
    quantize: bool = True,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`nb_classify` over the ``documents`` view
    (self-train shape — same tokenizer, same count tables, same
    quantized log-prob/prior expressions, same lexicographic argmax)."""
    toks = _sql_tokens("text")
    lp = _sql_q(
        "ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)"
        " / CAST(COALESCE(nl.n_l, 0) + v.v AS DOUBLE))", quantize)
    pr = _sql_q(
        "ln(CAST(pri.d_l AS DOUBLE) / CAST(dt.d_total AS DOUBLE))", quantize)
    sfx = "_q" if quantize else ""
    typ = "BIGINT" if quantize else "DOUBLE"
    return f"""
    WITH d AS (
      SELECT doc_id, {label_col} AS label, {toks} AS toks FROM {table}
      WHERE {label_col} IS NOT NULL
    ),
    g AS (SELECT doc_id, unnest(toks) AS token
          FROM (SELECT doc_id, {toks} AS toks FROM {table})),
    tg AS (SELECT label, unnest(toks) AS token FROM d),
    counts AS (SELECT label, token, COUNT(*)::BIGINT AS c
               FROM tg GROUP BY label, token),
    nl AS (SELECT label, SUM(c)::BIGINT AS n_l FROM counts GROUP BY label),
    v AS (SELECT COUNT(DISTINCT token)::BIGINT AS v FROM counts),
    pri AS (SELECT label, COUNT(*)::BIGINT AS d_l FROM d GROUP BY label),
    dt AS (SELECT COUNT(*)::BIGINT AS d_total FROM d),
    scored AS (
      -- classes come from the PRIORS table (every labeled class has
      -- >= 1 doc), not from token counts: a class whose docs carry no
      -- tokens must still score (n_l = 0), mirroring the Spark side
      SELECT g.doc_id, pri.label AS label, {lp} AS lp
      FROM g
      CROSS JOIN pri
      LEFT JOIN nl ON nl.label = pri.label
      CROSS JOIN v
      LEFT JOIN counts c ON c.label = pri.label AND c.token = g.token
    ),
    per AS (
      SELECT doc_id, label, COUNT(*)::BIGINT AS n_tokens,
             SUM(lp) AS s
      FROM scored GROUP BY doc_id, label
    ),
    tot AS (
      SELECT per.doc_id, per.label, per.n_tokens,
             CAST(per.s + ({pr}) AS {typ}) AS t
      FROM per
      JOIN pri ON pri.label = per.label
      CROSS JOIN dt
    ),
    r AS (
      SELECT *, MAX(t) OVER (PARTITION BY doc_id) AS best FROM tot
    )
    SELECT doc_id,
           MAX(n_tokens)::BIGINT AS n_tokens,
           MIN(label) FILTER (WHERE t = best) AS label_pred,
           CAST(MAX(best) AS {typ}) AS score{sfx},
           -- single-label training: index 0 is NULL in 1-based DuckDB
           -- lists; COALESCE to best mirrors the Spark margin of 0
           CAST(MAX(best) - COALESCE(list_sort(list(t))[COUNT(*) - 1],
                                     MAX(best)) AS {typ})
             AS margin{sfx}
    FROM r GROUP BY doc_id
    """
