"""Testdata-dtype smoke test: drift fails LOUDLY here, not as cascading
gate errors.

Round-3 postmortem: the driver regenerated events.parquet with a
different physical timestamp type (TIMESTAMP(NANOS) as int64 under a
legacy conf → TIMESTAMP(MICROS, NTZ)), and the first symptom was eight
unrelated correctness-gate failures plus a crashed benchmark. This test
pins the engine-facing dtype assumptions per table; when the sandbox
moves again, exactly one test fails and its message names the drifted
column.
"""

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# engine-facing expectations: column -> set of acceptable Spark dtypes.
# events.ts is deliberately multi-valued — queries._events branches on
# whichever of these it sees; anything else is unsupported drift.
EXPECTED = {
    "events": {
        "event_id": {"bigint"},
        "ts": {"bigint", "timestamp", "timestamp_ntz"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_linenumber": {"bigint", "int"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_totalprice": {"double"},
    },
    "customer": {
        "c_custkey": {"bigint"},
        "c_name": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<double>", "array<float>"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_dtypes_match_engine_assumptions(spark, table):
    df = spark.read.parquet(f"{SF}/{table}.parquet")
    dtypes = dict(df.dtypes)
    problems = []
    for col, accept in EXPECTED[table].items():
        got = dtypes.get(col)
        if got is None:
            problems.append(f"{table}.{col}: MISSING (have {sorted(dtypes)})")
        elif got not in accept:
            problems.append(
                f"{table}.{col}: dtype drifted to {got!r} "
                f"(engine assumes one of {sorted(accept)})")
    assert not problems, (
        "testdata dtype drift detected — update the source-side dtype "
        "branch (see queries._events) before chasing gate errors:\n  "
        + "\n  ".join(problems))
