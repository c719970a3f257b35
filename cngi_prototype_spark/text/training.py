"""Training-set assembly: sequence packing + deterministic mixture
sampling (beyond the reference — the last mile of a pretraining data
pipeline, after cleaning/dedup).

- :func:`pack_sequences` — the GPT-style concat-and-chunk: documents
  are concatenated in a deterministic order (doc_id asc) with an
  end-of-document token between them, and the token stream is cut into
  fixed-length training sequences. Output is the PLACEMENT table (one
  row per document × sequence it overlaps), which is what a loader
  needs to materialize any sequence shard independently.
- :func:`stratified_sample` / :func:`mixture_fractions` — deterministic
  per-stratum subsampling (domain/source mixing): the keep decision is
  a pure hash of (id, seed), so the sample is reproducible across
  engines and runs, composable with any upstream filter, and needs no
  shuffle at all. `mixture_fractions` computes per-stratum fractions
  from counts under temperature reweighting (p_s ∝ share^(1/T), the
  multilingual/multi-source mixing rule).

Scale shape: packing's only global state is the exclusive running
token total, computed with the distributed bucket-offset pattern
(token_frequencies' ranking scheme): per-bucket window cumsums run in
parallel, and only the bucket-size table (≤ n_buckets rows) is
window-scanned on one task. Sampling is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cngi_prototype_spark.text.analysis import _sql_tokens, _tokens


def _n_tokens(text):
    return F.size(F.filter(_tokens(text), lambda t: F.length(t) > 0))


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    eod_tokens: int = 1,
    n_buckets: int = 1024,
) -> DataFrame:
    """Pack documents into fixed-length training sequences →
    ``(doc_id, seq_id, tok_start, tok_end, seq_offset, n_tokens)``.

    The virtual token stream is ``doc₀ ++ EOD*eod_tokens ++ doc₁ ++
    ...`` in doc_id order; sequence ``s`` covers stream positions
    ``[s·seq_len, (s+1)·seq_len)``. A document overlapping sequences
    emits one row per overlap: its tokens ``[tok_start, tok_end)`` land
    at ``seq_offset`` inside the sequence (EOD positions are implicit —
    they are the gaps the placements leave). Empty documents still
    advance the stream by ``eod_tokens`` but emit no placement.

    Distributed cumsum: documents bucket by doc_id range (order-aligned
    buckets tile the global doc_id order), the per-bucket token totals
    cumsum on a metadata-sized table, and per-bucket window cumsums add
    the bucket offset back — no corpus-sized single-task window.
    """
    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    d = df.select(F.col(id_col).alias("doc_id"),
                  _n_tokens(F.col(text_col)).alias("n_tokens"),
                  (_n_tokens(F.col(text_col)) + F.lit(int(eod_tokens)))
                  .alias("_stride"))
    bounds = d.agg(F.min("doc_id").alias("lo"),
                   F.max("doc_id").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return d.select("doc_id", F.lit(0).cast("long").alias("seq_id"),
                        F.lit(0).alias("tok_start"),
                        F.lit(0).alias("tok_end"),
                        F.lit(0).alias("seq_offset"),
                        "n_tokens").limit(0)
    span = max(1, int(bounds["hi"]) - int(bounds["lo"]) + 1)
    width = max(1, -(-span // int(n_buckets)))
    b = d.withColumn(
        "_b", ((F.col("doc_id") - F.lit(int(bounds["lo"])))
               / F.lit(width)).cast("long"))
    sizes = b.groupBy("_b").agg(F.sum("_stride").alias("_bsz"))
    cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.withColumn(
        "_off", F.coalesce(F.sum("_bsz").over(cum), F.lit(0)))
    local = Window.partitionBy("_b").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    placed = (b.join(F.broadcast(offs.select("_b", "_off")), "_b")
              .withColumn("_start", F.col("_off")
                          + F.coalesce(F.sum("_stride").over(local),
                                       F.lit(0)))
              .filter(F.col("n_tokens") > 0))
    s0 = F.floor(F.col("_start") / F.lit(L)).cast("long")
    s1 = F.floor((F.col("_start") + F.col("n_tokens") - 1)
                 / F.lit(L)).cast("long")
    out = placed.select(
        "doc_id", "n_tokens", "_start",
        F.explode(F.sequence(s0, s1)).alias("seq_id"))
    return out.select(
        "doc_id", "seq_id",
        F.greatest(F.lit(0), (F.col("seq_id") * L - F.col("_start"))
                   .cast("int")).alias("tok_start"),
        F.least(F.col("n_tokens"),
                ((F.col("seq_id") + 1) * L - F.col("_start"))
                .cast("int")).alias("tok_end"),
        F.greatest(F.lit(0), (F.col("_start") - F.col("seq_id") * L)
                   .cast("int")).alias("seq_offset"),
        "n_tokens")


def sql_pack_sequences(seq_len: int, eod_tokens: int = 1,
                       table: str = "documents") -> str:
    """DuckDB twin of :func:`pack_sequences` (single window cumsum —
    the oracle does not need the distributed shape, only the values)."""
    L = int(seq_len)
    toks = _sql_tokens("text")
    return f"""
    WITH t AS (
      SELECT doc_id,
             len(list_filter({toks}, x -> len(x) > 0)) AS n_tokens
      FROM {table}
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens + {int(eod_tokens)}) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS strt
      FROM t
    )
    SELECT doc_id, s AS seq_id,
           CAST(GREATEST(0, s * {L} - strt) AS INT) AS tok_start,
           CAST(LEAST(n_tokens, (s + 1) * {L} - strt) AS INT) AS tok_end,
           CAST(GREATEST(0, strt - s * {L}) AS INT) AS seq_offset,
           n_tokens
    FROM c, UNNEST(range(strt // {L}, (strt + n_tokens - 1) // {L} + 1))
            AS r(s)
    WHERE n_tokens > 0
    """


def mixture_fractions(counts: dict, temperature: float = 1.0,
                      target_total: int | None = None) -> dict:
    """Per-stratum keep fractions from stratum row counts under
    temperature reweighting: sampling probability p_s ∝ share_s^(1/T)
    (T=1 keeps natural proportions; T→∞ approaches uniform across
    strata). Fractions are scaled so the expected sample size is
    ``target_total`` (default: the full corpus size, i.e. pure
    re-weighting), capped at 1.0 per stratum (no upsampling —
    deterministic hash sampling cannot repeat rows; oversubscribed
    strata saturate at keeping everything)."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    total = float(sum(counts.values()))
    if total == 0:
        return {k: 0.0 for k in counts}
    w = {k: (v / total) ** (1.0 / float(temperature))
         for k, v in counts.items()}
    z = sum(w.values())
    n_target = float(target_total if target_total is not None else total)
    return {k: min(1.0, (w[k] / z) * n_target / v) if v else 0.0
            for k, v in counts.items()}


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    *,
    by: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff
    ``md5(id|seed) mod 1e6 < fraction(stratum)·1e6``. Pure projection —
    no shuffle, no RNG state; the same (id, seed) always makes the same
    decision, so samples are reproducible, engine-independent (md5 is
    the cross-engine hash the gates already rely on) and stable under
    re-partitioning. Strata missing from ``fractions`` fall back to
    ``default_fraction``."""
    from cngi_prototype_spark.text.analysis import md5_num

    expr = F.lit(float(default_fraction))
    for k, frac in sorted(fractions.items()):
        expr = F.when(F.col(by) == k, F.lit(float(frac))).otherwise(expr)
    gate = md5_num(F.concat(F.col(id_col).cast("string"),
                            F.lit(f"|{int(seed)}"))) % 1_000_000
    return df.filter(gate < F.round(expr * 1_000_000).cast("long"))


def sql_stratified_sample(fractions: dict, by: str = "lang",
                          seed: int = 0, default_fraction: float = 0.0,
                          table: str = "documents") -> str:
    """DuckDB twin of :func:`stratified_sample` (same md5 gate).
    Stratum keys are string literals — single quotes escape by
    doubling — and ``by``/``table`` must be plain identifiers (this
    builds SQL text; an unchecked column name would be injectable)."""
    import re as _re

    from cngi_prototype_spark.text.analysis import sql_md5_num

    for ident in (by, table):
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", ident):
            raise ValueError(f"not a plain SQL identifier: {ident!r}")
    case = f"{float(default_fraction)!r}"
    for k, frac in sorted(fractions.items(), reverse=True):
        lit = str(k).replace("'", "''")
        case = (f"CASE WHEN {by} = '{lit}' THEN {float(frac)!r} "
                f"ELSE {case} END")
    gate = sql_md5_num(f"concat(CAST(doc_id AS VARCHAR), '|{int(seed)}')")
    return (f"SELECT * FROM {table} "
            f"WHERE {gate} % 1000000 < CAST(ROUND(({case}) * 1000000) "
            f"AS BIGINT)")
