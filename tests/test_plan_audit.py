"""Registry-wide plan audit on a representative subset (the full sweep
runs via tools/plan_audit.py and commits PLAN_AUDIT.json).

The subset spans the distinct plan families: relational agg (q1),
gridder fat-row path, window ops, LSH dedup, ANN, text tier, packing —
a plan regression in any family trips here first.
"""

from __future__ import annotations

from cngi_prototype_spark.plans.audit import (
    _struct_fields,
    audit_registry,
    parquet_scans,
)

SF_DIR = "/root/testdata/sf0.001"

SUBSET = {
    "q1_pricing_summary", "time_average", "flag_summary",
    "dedup_exact", "minhash_lsh_candidates", "ann_topk",
    "text_features", "pack_sequences", "imaging_weights",
    "split_dataset",
}


def test_struct_field_counter():
    assert _struct_fields("struct<a:int,b:string>") == 2
    assert _struct_fields("struct<a:array<struct<x:int,y:int>>,b:int>") == 2
    assert _struct_fields("struct<>") == 0
    assert _struct_fields("struct<a:map<string,array<int>>>") == 1
    # review finding: decimal(p,s) commas are type args, not fields
    assert _struct_fields("struct<a:decimal(12,2),b:int>") == 2
    assert _struct_fields(
        "struct<q:decimal(15,2),p:decimal(15,2),f:string>") == 3


def test_scan_parser_on_real_plan(spark):
    from cngi_prototype_spark.plans.inspect import explain_formatted

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity").filter("l_quantity > 10")
    scans = parquet_scans(explain_formatted(df))
    assert len(scans) == 1
    assert scans[0]["table"] == "lineitem"
    assert scans[0]["cols_read"] == 2


def test_shuffle_totals_delta(spark):
    # shuffle_totals sums the AppStatusStore, which EVICTS old stages
    # past spark.ui.retainedStages (the bench raises it to 100000 for
    # exactly this reason; the shared test session keeps the default).
    # In a long-lived session an eviction between the two samples can
    # shrink the total by more than a tiny query adds, so (a) shuffle
    # enough bytes to swamp any plausible eviction churn and (b) retry
    # once if an eviction still lands inside the window.
    from cngi_prototype_spark.plans.inspect import shuffle_totals

    assert shuffle_totals(spark) is not None  # py4j surface present
    from pyspark.sql import functions as F
    big = (spark.range(3_000_000)
           .select("id", F.col("id").alias("b"))
           .repartition(8))  # ~48 MB shuffled; noop keeps the columns
    for _ in range(2):
        s0 = shuffle_totals(spark)
        big.write.format("noop").mode("overwrite").save()
        s1 = shuffle_totals(spark)
        if s1["write"] > s0["write"] and s1["read"] > s0["read"]:
            break
    assert s1["write"] > s0["write"]
    assert s1["read"] > s0["read"]


def test_registry_subset_clean(spark):
    report = audit_registry(spark, SF_DIR, only=SUBSET)
    assert report["n_queries"] == len(SUBSET)
    assert report["violations"] == {}, report["violations"]


def test_estimated_size_helpers(spark):
    """r15: the Catalyst size-estimate helper returns a positive
    estimate on a real plan, derives rows with the caller's divisor,
    and degrades to None (never raises) when the py4j surface is
    missing — the documented version-drift fallback."""
    from cngi_prototype_spark.plans.inspect import (
        estimated_rows,
        estimated_size_bytes,
    )

    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    size = estimated_size_bytes(df)
    assert size is not None and size > 0
    rows = estimated_rows(df, bytes_per_row=1)
    assert rows == size  # divisor 1: rows == bytes

    class _NoJdf:  # no _jdf attribute -> AttributeError inside helper
        pass

    assert estimated_size_bytes(_NoJdf()) is None
    assert estimated_rows(_NoJdf(), bytes_per_row=8) is None
