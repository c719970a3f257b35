"""Cross-engine-reproducible aggregate expressions.

Problem: double-precision SUM depends on accumulation order, so a Spark
parallel sum and a DuckDB sequential sum over the same 60k doubles differ
in the last ulps — enough to break an exact value-hash comparison (the
driver's correctness gate) even though both are "right".

Solution: sum in DECIMAL(38,12) (exact, order-independent), cast the
exact sums to double, and derive ratios/variances from those doubles with
an explicitly-specified formula. Both engines then execute the identical
IEEE operations on identical inputs -> bit-identical results. Mirrors the
reference's own differential-test tolerance discipline
(``/root/reference/tests/test_ms_conversion.py:11-33``) but achieves
exact equality instead of 1e-8 closeness.

These are the ``precise=True`` code paths of the averaging/statistics
operators. The default (fast) paths use plain double sums: at 100 TB the
decimal accumulator costs ~2-3x in the agg, which matters; hash-exact
reproducibility is a test-gate concern, not a production one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,12)"


def dsum(c: Column) -> Column:
    """Order-independent exact sum, returned as double."""
    return F.sum(c.cast(DEC)).cast("double")


def wmean(value: Column, weight: Column, precise: bool = True) -> Column:
    """Weighted mean sum(v*w)/sum(w).

    This is the reference's core averaging formula (``cngi/vis/
    time_average.py:58-86``, ``chan_average.py:54-63`` — note
    chan_average.py:55-60 *multiplies* by the summed sigma^2, an apparent
    bug; we implement the intended sum(w*x)/sum(w), as SURVEY.md §7.4
    prescribes). NULL values are skipped by SQL semantics, matching the
    reference's NaN-skip over padded cells.
    """
    prod = value * weight
    # weight contributes only where value is non-null (NaN-skip semantics)
    w = F.when(value.isNotNull(), weight)
    if precise:
        return dsum(prod) / dsum(w)
    return F.sum(prod) / F.sum(w)


def mean(value: Column, precise: bool = True) -> Column:
    if precise:
        return dsum(value) / F.count(value).cast("double")
    return F.avg(value)


def var_samp(value: Column, precise: bool = True) -> Column:
    """Sample variance from exact sums: (sumsq - sum^2/n) / (n-1).

    Textbook two-moment formula; numerically safe here because the exact
    decimal sums remove accumulation error, leaving only the final
    double-rounding which both engines perform identically.
    """
    if precise:
        n = F.count(value).cast("double")
        s = dsum(value)
        ss = dsum(value * value)
        return (ss - s * s / n) / (n - F.lit(1.0))
    return F.var_samp(value)


def stddev(value: Column, precise: bool = True) -> Column:
    if precise:
        return F.sqrt(var_samp(value, precise=True))
    return F.stddev_samp(value)


def rms(value: Column, precise: bool = True) -> Column:
    """sqrt(mean(x^2)) — ``cngi/image/statistics.py`` rms."""
    if precise:
        return F.sqrt(dsum(value * value) / F.count(value).cast("double"))
    return F.sqrt(F.avg(value * value))


# --- SQL-text twins -------------------------------------------------------
# Oracle (DuckDB) SQL snippets guaranteed to compute the same bits as the
# expressions above. Keep the formulas in lockstep.

def sql_dsum(expr: str) -> str:
    # Two VARCHAR round-trips make DuckDB reproduce Spark's casts bit-for-bit:
    # 1. double -> VARCHAR -> DECIMAL: Spark's double->decimal cast goes
    #    through the double's SHORTEST string repr (BigDecimal.valueOf), while
    #    DuckDB's direct cast rounds the exact binary expansion — they differ
    #    at the 12th decimal for doubles needing >12 significant digits.
    #    DuckDB's double->VARCHAR is also shortest-repr, so text-then-decimal
    #    matches Spark.
    # 2. DECIMAL -> VARCHAR -> DOUBLE: DuckDB's direct decimal->double cast is
    #    not correctly rounded (int128/10^s in FP, two roundings); parsing the
    #    decimal's exact text IS correctly rounded, matching Spark's
    #    BigDecimal.doubleValue().
    return (
        "CAST(CAST(SUM(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,12)))"
        " AS VARCHAR) AS DOUBLE)"
    ).format(expr=expr)


def sql_wmean(value: str, weight: str) -> str:
    w_guarded = f"CASE WHEN ({value}) IS NOT NULL THEN ({weight}) END"
    return f"({sql_dsum(f'({value}) * ({weight})')} / {sql_dsum(w_guarded)})"


def sql_mean(value: str) -> str:
    return f"({sql_dsum(value)} / CAST(COUNT({value}) AS DOUBLE))"


def sql_var_samp(value: str) -> str:
    s, ss = sql_dsum(value), sql_dsum(f"({value}) * ({value})")
    n = f"CAST(COUNT({value}) AS DOUBLE)"
    return f"(({ss} - {s} * {s} / {n}) / ({n} - 1.0))"


def sql_stddev(value: str) -> str:
    return f"SQRT({sql_var_samp(value)})"


def sql_rms(value: str) -> str:
    return f"SQRT({sql_dsum(f'({value}) * ({value})')} / CAST(COUNT({value}) AS DOUBLE))"
