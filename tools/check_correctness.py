#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, sorted column
names, and values (rows sorted, exact match with per-column max-abs-diff
reporting on failure).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        return [f"row count: spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # The driver hashes *typed* values: DuckDB HUGEINT/DECIMAL vs
        # Spark BIGINT hash differently even when numerically equal
        # (the round-1 flag_summary failure). pandas kind is the proxy
        # we can see locally — flag any kind disagreement.
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        if sk != ok and not ({sk, ok} <= {"O", "U", "S"}):
            problems.append(f"col {c}: physical type mismatch "
                            f"spark={sdf[c].dtype} oracle={odf[c].dtype} "
                            f"(driver hashes typed values — cast the oracle)")
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            b = pd.to_numeric(ov, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(a) & np.isnan(b)
            diff = np.abs(np.where(both_nan, 0, a - b))
            exact = (np.where(both_nan, 0.0, a) == np.where(both_nan, 0.0, b)) | both_nan
            if not exact.all():
                problems.append(
                    f"col {c}: {int((~exact).sum())}/{len(a)} differ, max|d|={np.nanmax(diff):.3e}"
                )
            else:
                # The driver hashes raw float *bytes*, so -0.0 vs +0.0
                # (numerically equal) still flips the hash — the round-4
                # uv_degrid failure. Flag signbit disagreement on zeros.
                zflip = (a == b) & (np.signbit(a) != np.signbit(b))
                if zflip.any():
                    problems.append(
                        f"col {c}: {int(zflip.sum())} signed-zero byte "
                        f"mismatches (-0.0 vs +0.0 — driver hash flips)")
        else:
            neq = sv.astype(str) != ov.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                problems.append(f"col {c}: {int(neq.sum())}/{len(sv)} differ "
                                f"e.g. {sv[i]!r} vs {ov[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from cngi_prototype_spark.session import initialize_framework

    spark = initialize_framework(cores=8, app_name="check", shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_bad += 1
            print(f"FAIL {name} ({len(sdf)} rows):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - n_bad}/{len(qs)} selected queries OK")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
