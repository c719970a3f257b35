"""Gopher repetition and document-quality filters.

The repetition metrics and rule thresholds follow the published Gopher
corpus-filtering rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", appendix A1.1) with
the conventions used by open reimplementations:

- duplicate line / paragraph fraction  = repeated occurrences (count−1
  per distinct unit) over total units; the char variants put repeated
  occurrences' characters over the document's total characters.
- top n-gram character fraction (n = 2..4) = chars of the single most
  frequent word n-gram times its count, over total chars — zero when
  the top gram occurs once (a unique gram repeats nothing).
- duplicated n-gram character fraction (n = 5..10) = chars of all
  occurrences of grams that occur ≥ 2 times, over total chars (the
  occurrence-count approximation; the span-overlap-aware variant
  needs positional interval merging and is deliberately not used —
  the approximation upper-bounds it and keeps the metric a pure
  count aggregation).

Every metric is exact integer arithmetic until one final BIGINT/BIGINT
double division (IEEE-correctly-rounded in both Spark and DuckDB), so
the SQL twins hash-match bit-for-bit.

Scale design: one explode → two-level groupBy per unit family.  The
first groupBy key is (doc, unit) so map-side partial aggregation
collapses each document's repeats before the shuffle; the second is
(doc).  Everything is embarrassingly parallel per document — no
cross-document state, no windows over the corpus, no UDFs.

Beyond-reference tier: casangi/cngi_prototype has no text operators;
these exist for the LLM-training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.text.analysis import _sql_tokens, _tokens

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

# Gopher's "must contain ≥ 2 of" stop set (distinct from the
# language-ID stopword lists in analysis.py).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

BULLET_RE = "^[-*•‣▪►]"
ELLIPSIS_END_RE = "(\\.\\.\\.|…)$"


def _lines(text: Column, sep: str) -> Column:
    """Non-empty trimmed units after splitting on ``sep``."""
    return F.filter(F.transform(F.split(text, sep), lambda s: F.trim(s)),
                    lambda s: s != "")


def _sql_lines(text: str, sep: str) -> str:
    return (f"list_filter(list_transform(regexp_split_to_array({text},"
            f" '{sep}'), s -> trim(s)), s -> s <> '')")


def _nonempty_tokens(text: Column) -> Column:
    return F.filter(_tokens(text), lambda t: t != "")


def _sql_nonempty_tokens(text: str) -> str:
    return f"list_filter({_sql_tokens(text)}, t -> t <> '')"


def _sum_len(arr: Column) -> Column:
    """Σ length(element) as BIGINT — exact integers, order-free."""
    return F.aggregate(
        F.transform(arr, lambda u: F.length(u).cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)


def _unit_frac(units: Column, distinct: Column) -> Column:
    """dup_*_frac = Σ_v(c_v − 1) / Σ_v c_v computed in-row:
    Σ_v(c_v − 1) = size(units) − size(distinct)."""
    n_units = F.size(units)
    return F.when(n_units > 0,
                  (n_units - F.size(distinct)).cast("double")
                  / n_units.cast("double")).otherwise(F.lit(0.0))


def _unit_char_frac(units: Column, distinct: Column,
                    n_chars: Column) -> Column:
    """dup_*_char_frac = Σ_v(c_v − 1)·len(v) / n_chars in-row:
    Σ_v(c_v − 1)·len(v) = Σlen(units) − Σlen(distinct)."""
    return F.when(n_chars > 0,
                  (_sum_len(units) - _sum_len(distinct)).cast("double")
                  / n_chars.cast("double")).otherwise(F.lit(0.0))


def _gram_chars(t: Column, n: int, *, top: bool) -> Column:
    """Top/duplicated n-gram character count (BIGINT) over one
    document's word n-grams, as ONE single-pass ``aggregate`` over the
    sorted gram array.

    Sorting makes equal grams adjacent, so a run-length pass yields
    the identical (gram, count) multiset as the old explode →
    groupBy(doc, n, gram).  The sorted array is the aggregate's
    *argument* — evaluated once per row — and the lambda touches only
    the O(1) accumulator struct and the current element.  (An earlier
    in-row form indexed the sorted array from inside ``filter`` /
    ``zip_with`` lambdas; higher-order-function lambdas are
    re-evaluated per element with no common-subexpression elimination,
    so every element re-sorted the array — quadratic per document.
    Likewise an accumulator that concat-builds a runs array would be
    quadratic in distinct grams; the accumulator here is fixed-size.)

    ``top``: winner = max (count, gram) struct over all runs — field
    order c then gram, the same tie-break as the old
    ``max(struct(c, gram))`` — then chars = c·len(gram) if c > 1.
    ``dup``: chars = Σ over runs with c ≥ 2 of c·len(gram).
    The '' sentinel for ``prev`` cannot collide with a real gram
    (tokens are non-empty and n ≥ 2) and its c = 0 run flushes to 0.
    """
    grams = F.when(F.size(t) >= n, F.transform(
        F.sequence(F.lit(1), F.size(t) - n + 1),
        lambda i: F.array_join(F.slice(t, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))
    s = F.array_sort(grams)
    long0 = F.lit(0).cast("long")
    long1 = F.lit(1).cast("long")
    if top:
        zero = F.struct(
            F.lit("").alias("prev"), long0.alias("c"),
            F.struct(long0.alias("c"), F.lit("").alias("gram"))
            .alias("best"))

        def step(a: Column, x: Column) -> Column:
            flushed = F.greatest(
                a["best"],
                F.struct(a["c"].alias("c"), a["prev"].alias("gram")))
            return F.when(x == a["prev"], F.struct(
                a["prev"].alias("prev"), (a["c"] + long1).alias("c"),
                a["best"].alias("best"))
            ).otherwise(F.struct(
                x.alias("prev"), long1.alias("c"),
                flushed.alias("best")))

        def fin(a: Column) -> Column:
            w = F.greatest(
                a["best"],
                F.struct(a["c"].alias("c"), a["prev"].alias("gram")))
            return (F.when(w["c"] > 1, w["c"] * F.length(w["gram"]))
                    .otherwise(long0))
    else:
        zero = F.struct(
            F.lit("").alias("prev"), long0.alias("c"),
            long0.alias("acc"))

        def _flush(a: Column) -> Column:
            return a["acc"] + F.when(
                a["c"] >= 2, a["c"] * F.length(a["prev"])).otherwise(long0)

        def step(a: Column, x: Column) -> Column:
            return F.when(x == a["prev"], F.struct(
                a["prev"].alias("prev"), (a["c"] + long1).alias("c"),
                a["acc"].alias("acc"))
            ).otherwise(F.struct(
                x.alias("prev"), long1.alias("c"),
                _flush(a).alias("acc")))

        def fin(a: Column) -> Column:
            return _flush(a)

    return F.aggregate(s, zero, step, fin)


def _gram_frac(t: Column, n_chars: Column, n: int, *,
               top: bool) -> Column:
    """top_/dup_{n}gram_char_frac — :func:`_gram_chars` over the staged
    token array, divided once at the end (same integer sums and
    (c, gram) struct-max tie-break as the old grouped aggregation)."""
    name = (f"top_{n}gram_char_frac" if top else f"dup_{n}gram_char_frac")
    val = _gram_chars(t, n, top=top)
    return F.when(n_chars > 0, val.cast("double")
                  / n_chars.cast("double")).otherwise(F.lit(0.0)).alias(name)


def _sql_unit_stats(source: str, unit_list: str, *, prefix: str) -> str:
    return f"""
    SELECT doc_id,
           CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS dup_{prefix}_frac,
           CASE WHEN MAX(n_chars) > 0 THEN
             CAST(SUM(CASE WHEN c > 1 THEN (c - 1) * length(u) ELSE 0 END)
                  AS DOUBLE) / CAST(MAX(n_chars) AS DOUBLE)
           ELSE 0e0 END AS dup_{prefix}_char_frac
    FROM (
      SELECT doc_id, n_chars, u, COUNT(*) AS c
      FROM (SELECT doc_id, n_chars,
                   unnest({unit_list}) AS u FROM {source})
      GROUP BY doc_id, n_chars, u
    )
    GROUP BY doc_id
    """


def gopher_repetition(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
) -> DataFrame:
    """Per-document Gopher repetition metrics, wide form.

    Output: ``id_col``, ``n_chars``, ``dup_line_frac``,
    ``dup_line_char_frac``, ``dup_para_frac``, ``dup_para_char_frac``,
    ``top_{n}gram_char_frac`` for n in ``top_ns``,
    ``dup_{n}gram_char_frac`` for n in ``dup_ns``.  Missing structure
    (no lines, too few tokens for an n-gram) yields 0.0, so every input
    document appears exactly once.

    Plan shape (r14 optimization): a pure per-document PROJECTION.
    Every metric is a within-document count, so it is computed in-row
    over the token/line arrays (duplicate sums via size/Σlen deltas
    against ``array_distinct``; n-gram counts via sorted-array value
    runs) instead of the old explode → corpus-sized
    groupBy(doc, n, gram) shuffle → three joins back onto the spine.
    Zero exchanges, one scan, no corpus-sized shuffle at any scale;
    values are bit-identical (same integer sums, same (c, gram)
    struct-max tie-break, one final BIGINT/BIGINT double division).
    """
    text = F.col(text_col)
    staged = df.select(
        F.col(id_col), F.length(text).alias("n_chars"),
        _nonempty_tokens(text).alias("__toks"),
        _lines(text, "\n").alias("__lines"),
        _lines(text, "\n\n").alias("__paras"))
    # second projection boundary: the distinct arrays are each read by
    # 2 metric expressions below — stage them so CollapseProject keeps
    # one evaluation per row (the minhash __sh pattern); each gram
    # metric is a single-pass aggregate over the staged __toks column,
    # referenced exactly once
    mid = staged.select(
        id_col, "n_chars", "__toks", "__lines", "__paras",
        F.array_distinct("__lines").alias("__ldist"),
        F.array_distinct("__paras").alias("__pdist"))
    nc = F.col("n_chars")
    toks = F.col("__toks")
    return mid.select(
        id_col, "n_chars",
        _unit_frac(F.col("__lines"), F.col("__ldist"))
        .alias("dup_line_frac"),
        _unit_frac(F.col("__paras"), F.col("__pdist"))
        .alias("dup_para_frac"),
        _unit_char_frac(F.col("__lines"), F.col("__ldist"), nc)
        .alias("dup_line_char_frac"),
        _unit_char_frac(F.col("__paras"), F.col("__pdist"), nc)
        .alias("dup_para_char_frac"),
        *[_gram_frac(toks, nc, n, top=True) for n in top_ns],
        *[_gram_frac(toks, nc, n, top=False) for n in dup_ns])


def sql_gopher_repetition(
    *,
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
    source: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin of :func:`gopher_repetition` (same integer sums,
    same final divisions, same tie-break)."""
    all_ns = ", ".join(str(n) for n in tuple(top_ns) + tuple(dup_ns))
    top_cols = ",\n           ".join(
        f"CAST(MAX(CASE WHEN n = {n} THEN top_chars END) AS DOUBLE)"
        f" / CAST(n_chars AS DOUBLE) AS top_{n}gram_char_frac"
        for n in top_ns)
    dup_cols = ",\n           ".join(
        f"CAST(MAX(CASE WHEN n = {n} THEN dupc END) AS DOUBLE)"
        f" / CAST(n_chars AS DOUBLE) AS dup_{n}gram_char_frac"
        for n in dup_ns)
    fracs = ([f"dup_{p}_frac" for p in ("line", "para")]
             + [f"dup_{p}_char_frac" for p in ("line", "para")]
             + [f"top_{n}gram_char_frac" for n in top_ns]
             + [f"dup_{n}gram_char_frac" for n in dup_ns])
    coalesced = ",\n           ".join(
        f"COALESCE({c}, 0e0) AS {c}" for c in fracs)
    line_src = ("(SELECT doc_id, n_chars, " + _sql_lines("text", "\\n")
                + " AS __u FROM base)")
    para_src = ("(SELECT doc_id, n_chars, " + _sql_lines("text", "\\n\\n")
                + " AS __u FROM base)")
    lstats = _sql_unit_stats(line_src, "__u", prefix="line")
    pstats = _sql_unit_stats(para_src, "__u", prefix="para")
    ne_toks = _sql_nonempty_tokens("text")
    return f"""
    WITH __src AS ({source}),
    base AS (SELECT doc_id, length(text) AS n_chars, text FROM __src),
    lstats AS ({lstats}),
    pstats AS ({pstats}),
    toks AS (SELECT doc_id, n_chars, {ne_toks} AS t FROM base),
    grams AS (
      SELECT doc_id, n_chars, n,
             unnest(list_transform(range(1, greatest(len(t) - n + 2, 1)),
               i -> array_to_string(
                      t[CAST(i AS INT):CAST(i + n - 1 AS INT)], ' ')))
               AS gram
      FROM toks CROSS JOIN (SELECT unnest([{all_ns}]) AS n)
    ),
    gcnt AS (SELECT doc_id, n_chars, n, gram, COUNT(*) AS c
             FROM grams GROUP BY doc_id, n_chars, n, gram),
    gstats AS (
      SELECT doc_id, n_chars, n,
             CASE WHEN (MAX(struct_pack(c := c, gram := gram))).c > 1
               THEN (MAX(struct_pack(c := c, gram := gram))).c
                    * length((MAX(struct_pack(c := c, gram := gram))).gram)
               ELSE 0 END AS top_chars,
             SUM(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END) AS dupc
      FROM gcnt GROUP BY doc_id, n_chars, n
    ),
    gwide AS (
      SELECT doc_id,
           {top_cols},
           {dup_cols}
      FROM gstats GROUP BY doc_id, n_chars
    )
    SELECT base.doc_id, base.n_chars,
           {coalesced}
    FROM base
    LEFT JOIN lstats ON lstats.doc_id = base.doc_id
    LEFT JOIN pstats ON pstats.doc_id = base.doc_id
    LEFT JOIN gwide ON gwide.doc_id = base.doc_id
    """


# --- Gopher document-quality rules (pure projection) -----------------------

GOPHER_THRESHOLDS = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    max_bullet_line_frac=0.9,
    max_ellipsis_end_frac=0.3,
    min_alpha_word_frac=0.8,
    min_stop_hits=2,
)

_RULES = ("words", "mean_word_len", "symbol", "bullet", "ellipsis",
          "alpha", "stopword")


def gopher_quality_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Gopher document-level quality rules: annotate every document with
    the seven rule booleans, ``keep`` (all pass) and the FIRST failing
    ``reason``.  One narrow projection — no shuffle, no UDF; filter on
    ``keep`` for the clean corpus.

    Raw features ride along (``n_words``, ``mean_word_len``,
    ``symbol_word_ratio``, ``bullet_line_frac``, ``ellipsis_end_frac``,
    ``alpha_word_frac``, ``stop_hits``) so the rules are auditable.
    """
    th = {**GOPHER_THRESHOLDS, **thresholds}
    text = F.col(text_col)
    # Stage the computation through projection boundaries (the minhash
    # __sh pattern): every metric references the tokenize/line-split
    # ARRAYS, and without the boundary Catalyst re-inlines the
    # split+filter into each of the ~20 referencing expressions
    # (CollapseProject keeps multi-referenced non-cheap aliases, so the
    # boundary holds and the text tokenizes ONCE per row).
    staged = df.select(
        id_col, text.alias("__text"),
        _nonempty_tokens(text).alias("__toks"),
        _lines(text, "\n").alias("__lines"))
    # second boundary: the scalar metrics (aggregates over the arrays)
    # are themselves referenced by 2-3 rule expressions each
    m = staged.select(id_col, *_quality_mid_cols())
    return m.select(
        id_col, *_quality_out_cols(th)
    ).withColumn("keep", F.col("reason").isNull())


def _quality_mid_cols() -> list[Column]:
    """Scalar quality metrics from the staged ``__text`` / ``__toks`` /
    ``__lines`` columns (shared by :func:`gopher_quality_filter` and
    the fused :func:`gopher_annotate`)."""
    toks = F.col("__toks")
    lines = F.col("__lines")
    text = F.col("__text")
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#")))
    n_ellipsis = (F.length(text)
                  - F.length(F.replace(text, F.lit("...")))) / F.lit(3)
    return [
        F.size(toks).alias("__nw"),
        F.aggregate(F.transform(toks, lambda t: F.length(t)),
                    F.lit(0), lambda a, x: a + x).alias("__sumlen"),
        (n_hash + n_ellipsis).alias("__nsym"),
        F.size(lines).alias("__nl"),
        F.size(F.filter(lines, lambda s: s.rlike(BULLET_RE)))
        .alias("__nbul"),
        F.size(F.filter(lines, lambda s: s.rlike(ELLIPSIS_END_RE)))
        .alias("__nell"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .alias("__nalpha"),
        F.size(F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS)))
        .alias("__nstop")]


def _quality_out_cols(th: dict) -> list[Column]:
    """Raw features, rule booleans and first-failure ``reason`` from
    the :func:`_quality_mid_cols` outputs."""
    n_words = F.col("__nw")
    # try_divide: NULL on n_words == 0, matching DuckDB's `/` (Spark 4
    # ANSI mode would raise instead).
    mean_wl = F.try_divide(F.col("__sumlen").cast("double"),
                           n_words.cast("double"))
    symbol_ratio = F.try_divide(F.col("__nsym").cast("double"),
                                n_words.cast("double"))
    n_lines = F.col("__nl")
    bullet_frac = F.when(n_lines > 0, F.col("__nbul").cast("double")
                         / n_lines.cast("double")).otherwise(F.lit(0.0))
    ell_frac = F.when(n_lines > 0, F.col("__nell").cast("double")
                      / n_lines.cast("double")).otherwise(F.lit(0.0))
    alpha_frac = F.try_divide(F.col("__nalpha").cast("double"),
                              n_words.cast("double"))
    stop_hits = F.col("__nstop")

    ok = {
        "words": (n_words >= th["min_words"])
        & (n_words <= th["max_words"]),
        "mean_word_len": (mean_wl >= th["min_mean_word_len"])
        & (mean_wl <= th["max_mean_word_len"]),
        "symbol": symbol_ratio <= th["max_symbol_word_ratio"],
        "bullet": bullet_frac <= th["max_bullet_line_frac"],
        "ellipsis": ell_frac <= th["max_ellipsis_end_frac"],
        "alpha": alpha_frac >= th["min_alpha_word_frac"],
        "stopword": stop_hits >= th["min_stop_hits"],
    }
    expr = None
    for r in _RULES:
        expr = (F.when(~ok[r], r) if expr is None
                else expr.when(~ok[r], r))
    return [
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ell_frac.alias("ellipsis_end_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        *[ok[r].alias(f"ok_{r}") for r in _RULES],
        expr.alias("reason"),
    ]


def gopher_annotate(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
    **thresholds,
) -> DataFrame:
    """Repetition metrics + quality rules in ONE per-document pass —
    column-for-column identical to
    ``gopher_repetition(df).join(gopher_quality_filter(df), id_col)``
    but with a single scan, a single tokenize, and zero joins (both
    operand families are per-document projections since the r14
    in-row repetition rewrite; the join added two corpus passes and a
    doc_id exchange pair for no information)."""
    th = {**GOPHER_THRESHOLDS, **thresholds}
    text = F.col(text_col)
    staged = df.select(
        F.col(id_col), F.length(text).alias("n_chars"),
        text.alias("__text"),
        _nonempty_tokens(text).alias("__toks"),
        _lines(text, "\n").alias("__lines"),
        _lines(text, "\n\n").alias("__paras"))
    mid = staged.select(
        id_col, "n_chars", "__toks", "__lines", "__paras",
        F.array_distinct("__lines").alias("__ldist"),
        F.array_distinct("__paras").alias("__pdist"),
        *_quality_mid_cols())
    nc = F.col("n_chars")
    toks = F.col("__toks")
    return mid.select(
        id_col, "n_chars",
        _unit_frac(F.col("__lines"), F.col("__ldist"))
        .alias("dup_line_frac"),
        _unit_frac(F.col("__paras"), F.col("__pdist"))
        .alias("dup_para_frac"),
        _unit_char_frac(F.col("__lines"), F.col("__ldist"), nc)
        .alias("dup_line_char_frac"),
        _unit_char_frac(F.col("__paras"), F.col("__pdist"), nc)
        .alias("dup_para_char_frac"),
        *[_gram_frac(toks, nc, n, top=True) for n in top_ns],
        *[_gram_frac(toks, nc, n, top=False) for n in dup_ns],
        *_quality_out_cols(th),
    ).withColumn("keep", F.col("reason").isNull())


def sql_gopher_quality_filter(
    *,
    source: str = "SELECT doc_id, text FROM documents",
    **thresholds,
) -> str:
    """DuckDB twin of :func:`gopher_quality_filter` (identical token
    split, regexes, integer counts and e-notation thresholds)."""
    th = {**GOPHER_THRESHOLDS, **thresholds}
    toks = _sql_nonempty_tokens("text")
    lines = _sql_lines("text", "\\n")
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    # e-notation literals only (decimal-literal trap)
    e = lambda x: f"{float(x):e}"  # noqa: E731
    conds = {
        "words": f"(n_words >= {th['min_words']}"
                 f" AND n_words <= {th['max_words']})",
        "mean_word_len": f"(mean_word_len >= {e(th['min_mean_word_len'])}"
                         f" AND mean_word_len <= {e(th['max_mean_word_len'])})",
        "symbol": f"symbol_word_ratio <= {e(th['max_symbol_word_ratio'])}",
        "bullet": f"bullet_line_frac <= {e(th['max_bullet_line_frac'])}",
        "ellipsis": f"ellipsis_end_frac <= {e(th['max_ellipsis_end_frac'])}",
        "alpha": f"alpha_word_frac >= {e(th['min_alpha_word_frac'])}",
        "stopword": f"stop_hits >= {th['min_stop_hits']}",
    }
    ok_cols = ",\n           ".join(
        f"{conds[r]} AS ok_{r}" for r in _RULES)
    reason = "CASE " + " ".join(
        f"WHEN NOT {conds[r]} THEN '{r}'" for r in _RULES) + " ELSE NULL END"
    return f"""
    WITH __src AS ({source}),
    feats AS (
      SELECT doc_id,
             len({toks}) AS n_words,
             CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)
               / CAST(len({toks}) AS DOUBLE) AS mean_word_len,
             CAST(length(text) - length(replace(text, '#', ''))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  AS DOUBLE) / CAST(len({toks}) AS DOUBLE)
               AS symbol_word_ratio,
             CASE WHEN len({lines}) > 0 THEN
               CAST(len(list_filter({lines},
                      s -> regexp_matches(s, '{BULLET_RE}'))) AS DOUBLE)
                 / CAST(len({lines}) AS DOUBLE) ELSE 0e0 END
               AS bullet_line_frac,
             CASE WHEN len({lines}) > 0 THEN
               CAST(len(list_filter({lines},
                      s -> regexp_matches(s, '{ELLIPSIS_END_RE}'))) AS DOUBLE)
                 / CAST(len({lines}) AS DOUBLE) ELSE 0e0 END
               AS ellipsis_end_frac,
             CAST(len(list_filter({toks}, t -> regexp_matches(t, '[a-z]')))
                  AS DOUBLE) / CAST(len({toks}) AS DOUBLE)
               AS alpha_word_frac,
             len(list_filter({toks}, t -> t IN ({stops}))) AS stop_hits
      FROM __src
    )
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
           bullet_line_frac, ellipsis_end_frac, alpha_word_frac, stop_hits,
           {ok_cols},
           {reason} AS reason,
           ({reason}) IS NULL AS keep
    FROM feats
    """
