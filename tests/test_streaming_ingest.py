"""Streaming time_average equals the batch operator; ingest helpers."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.sources.ingest import (
    assign_baseline,
    convert_time_mjd,
    describe_ms,
    split_auto_cross,
)
from cngi_prototype_spark.streaming.stream_ops import stream_time_average


@pytest.fixture()
def row_pdf():
    rng = np.random.default_rng(8)
    n = 400
    return pd.DataFrame({
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 100, n), unit="s"),
        "ant1": rng.integers(0, 4, n), "ant2": rng.integers(0, 4, n),
        "chan": rng.integers(0, 3, n), "pol": rng.integers(0, 2, n),
        "data_re": rng.normal(size=n), "data_im": rng.normal(size=n),
        "w": rng.uniform(0.5, 2.0, n),
        "ddi": rng.integers(0, 2, n),
    })


def test_assign_baseline_dense_and_stable(spark, row_pdf):
    df = assign_baseline(spark.createDataFrame(row_pdf))
    out = df.select("ant1", "ant2", "baseline").distinct().toPandas() \
        .sort_values(["ant1", "ant2"]).reset_index(drop=True)
    assert sorted(out.baseline) == list(range(len(out)))
    assert out.baseline.is_monotonic_increasing  # sorted like TaQL order


def test_split_auto_cross(spark, row_pdf):
    cross, auto = split_auto_cross(spark.createDataFrame(row_pdf))
    assert auto.filter(F.col("ant1") != F.col("ant2")).count() == 0
    assert cross.filter(F.col("ant1") == F.col("ant2")).count() == 0
    assert auto.count() + cross.count() == len(row_pdf)


def test_convert_time_mjd(spark):
    # 2000-01-01T12:00:00 UTC = MJD 51544.5 = 4453401600 MJD-seconds
    df = spark.range(1).select(convert_time_mjd(F.lit(51544.5 * 86400.0)).alias("t"))
    got = df.collect()[0][0]
    assert got.isoformat().startswith("2000-01-01T12:00:00")


def test_describe_ms(spark, row_pdf):
    df = assign_baseline(spark.createDataFrame(row_pdf)).withColumnRenamed("ts", "time")
    out = describe_ms(df).toPandas()
    assert set(out.ddi) == {0, 1}
    assert (out.rows > 0).all()
    assert (out["chans"] <= 3).all() and (out["pols"] <= 2).all()


def test_stream_time_average_equals_batch(spark, row_pdf):
    tmp = tempfile.mkdtemp()
    try:
        pdf = row_pdf.assign(bl=row_pdf.ant1 * 4 + row_pdf.ant2)
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{tmp}/in")
        schema = spark.read.parquet(f"{tmp}/in").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
        agg = stream_time_average(stream, window="10 seconds")
        q = (agg.writeStream.format("memory").queryName("stavg")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM stavg").toPandas()

        batch = (spark.read.parquet(f"{tmp}/in")
                 .groupBy(F.window("ts", "10 seconds").alias("win"), "bl", "chan", "pol")
                 .agg((F.sum(F.col("data_re") * F.col("w")) / F.sum("w")).alias("data_re"),
                      F.count(F.lit(1)).alias("n"))
                 .select(F.col("win.start").alias("win_start"), "bl", "chan", "pol",
                         "data_re", "n")).toPandas()
        m = got.merge(batch, on=["win_start", "bl", "chan", "pol"],
                      suffixes=("_s", "_b"))
        assert len(m) == len(batch) == len(got)
        np.testing.assert_allclose(m.data_re_s, m.data_re_b, rtol=1e-12)
        assert (m.n_samples == m.n).all()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dedup_exact(spark):
    import pandas as pd

    from cngi_prototype_spark.streaming.stream_ops import stream_dedup_exact

    tmp = tempfile.mkdtemp()
    try:
        pdf = pd.DataFrame({
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(range(12), unit="s"),
            "doc_id": range(12),
            "text": [f"doc {i % 4}" for i in range(12)],  # 4 uniques x3
        })
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{tmp}/in")
        schema = spark.read.parquet(f"{tmp}/in").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
        out = stream_dedup_exact(stream, text="text", time="ts")
        q = (out.writeStream.format("memory").queryName("sdedup")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sdedup").toPandas()
        assert len(got) == 4
        assert sorted(got.text) == [f"doc {i}" for i in range(4)]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_running_mean_accumulates_across_triggers(spark):
    import pandas as pd

    from cngi_prototype_spark.streaming.stream_ops import stream_running_mean

    tmp = tempfile.mkdtemp()
    try:
        rng = np.random.default_rng(3)
        n = 300
        pdf = pd.DataFrame({
            "bl": rng.integers(0, 5, n).astype("int64"),
            "chan": rng.integers(0, 2, n).astype("int64"),
            "pol": rng.integers(0, 2, n).astype("int64"),
            "data_re": rng.normal(size=n), "data_im": rng.normal(size=n),
            "w": rng.uniform(0.5, 2.0, n),
        })
        # two files -> maxFilesPerTrigger=1 forces TWO micro-batches, so
        # the final emission proves state carried across triggers
        spark.createDataFrame(pdf.iloc[:150]).write.mode("overwrite").parquet(f"{tmp}/in")
        spark.createDataFrame(pdf.iloc[150:]).coalesce(1).write.mode("append").parquet(f"{tmp}/in")
        schema = spark.read.parquet(f"{tmp}/in").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{tmp}/in"))
        out = stream_running_mean(stream)
        q = (out.writeStream.format("memory").queryName("srun")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY bl, chan, pol "
            "ORDER BY n_samples DESC) rk FROM srun) WHERE rk = 1").toPandas()

        exp = (pdf.assign(wr=pdf.data_re * pdf.w, wi=pdf.data_im * pdf.w)
               .groupby(["bl", "chan", "pol"])
               .agg(wr=("wr", "sum"), wi=("wi", "sum"), w=("w", "sum"),
                    n=("w", "size")).reset_index())
        merged = got.merge(exp, on=["bl", "chan", "pol"])
        assert len(merged) == len(exp)
        assert (merged.n_samples == merged.n).all()
        assert np.allclose(merged.data_re, merged.wr / merged.w_y)
        assert np.allclose(merged.data_im, merged.wi / merged.w_y)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_read_ms_lazy_surface(spark, row_pdf, tmp_path):
    from cngi_prototype_spark.sources.vis_io import (
        read_ms,
        read_simple_table,
        write_vis,
    )

    ms = str(tmp_path / "test.ms")
    df = assign_baseline(spark.createDataFrame(row_pdf)) \
        .withColumnRenamed("ts", "time")
    write_vis(df, f"{ms}/MAIN", partition_by=["ddi"])
    spark.createDataFrame(pd.DataFrame({
        "name": ["ea01", "ea02"], "dish_m": [25.0, 25.0],
    })).write.parquet(f"{ms}/ANTENNA.parquet")

    mxds = read_ms(spark, ms)
    assert set(mxds) == {"xds0", "xds1", "global"}
    assert set(mxds["global"]) == {"ANTENNA"}
    assert mxds["xds0"].filter("ddi <> 0").count() == 0
    total = sum(mxds[k].count() for k in ("xds0", "xds1"))
    assert total == len(row_pdf)

    ant = read_simple_table(spark, ms, "ANTENNA", add_row_id="antenna_id")
    got = ant.toPandas().sort_values("antenna_id")
    assert list(got.antenna_id) == [0, 1]

    # only one ddi requested -> only that partition entry
    sel = read_ms(spark, ms, ddis=[1], ignore=["ANTENNA"])
    assert set(sel) == {"xds1", "global"} and sel["global"] == {}


def test_read_vis_s3_credentials_map_to_hadoop_conf(spark):
    from cngi_prototype_spark.sources.vis_io import read_vis

    # local path still reads fine while creds land in the session conf
    df = read_vis(spark, "/root/testdata/sf0.001/events.parquet",
                  s3_key="AKTEST", s3_secret="SECRETTEST",
                  s3_endpoint="s3.example.com")
    assert df.count() > 0
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AKTEST"
    assert hconf.get("fs.s3a.secret.key") == "SECRETTEST"
    assert hconf.get("fs.s3a.endpoint") == "s3.example.com"


def test_stream_grid_accumulate_equals_batch(spark):
    """Online uv-grid accumulation over two micro-batch files equals
    the batch explode gridder on the union of rows."""
    import pandas as pd

    from cngi_prototype_spark.imaging.grid import GridParms, grid_visibilities
    from cngi_prototype_spark.streaming.stream_ops import stream_grid_accumulate

    gp = GridParms(n_u=32, n_v=32, cell_u=2e-5, cell_v=2e-5,
                   support=5, oversampling=100)
    rng = np.random.default_rng(12)

    def mk(n, seed0):
        return pd.DataFrame({
            "u": rng.uniform(-4000, 4000, n), "v": rng.uniform(-4000, 4000, n),
            "freq": np.full(n, 1.0e9),
            "chan": np.zeros(n, np.int32), "pol": np.zeros(n, np.int32),
            "data_re": rng.normal(size=n), "data_im": rng.normal(size=n),
            "weight": np.ones(n),
        })

    tmp = tempfile.mkdtemp()
    try:
        a, b = mk(300, 0), mk(200, 1)
        spark.createDataFrame(a).write.parquet(f"{tmp}/in/f0")
        spark.createDataFrame(b).write.parquet(f"{tmp}/in/f1")
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*"))
        acc = stream_grid_accumulate(stream, gp)
        q = (acc.writeStream.format("memory").queryName("sgrid")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sgrid").toPandas()

        both = pd.concat([a, b], ignore_index=True)
        ref, _ = grid_visibilities(spark.createDataFrame(both), gp,
                                   variant="explode")
        rp = ref.toPandas()
        m = got.merge(rp, on=["chan", "pol", "u_idx", "v_idx"],
                      suffixes=("_s", "_b"))
        assert len(m) == len(rp) == len(got)
        np.testing.assert_allclose(m.grid_re_s, m.grid_re_b, atol=1e-10)
        np.testing.assert_allclose(m.grid_im_s, m.grid_im_b, atol=1e-10)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ngram_contamination_lifts_to_streaming(spark):
    """Decontamination is broadcast-join + aggregation, so it runs
    unchanged over a document stream (update-mode state bounded by
    flagged pairs) — the live-ingest hygiene filter composition."""
    import pandas as pd

    from cngi_prototype_spark.dedup.dedup import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"])
    batches = [
        pd.DataFrame({"doc_id": [1, 2],
                      "text": ["alpha beta gamma delta something else",
                               "unrelated words only here friend"]}),
        pd.DataFrame({"doc_id": [3],
                      "text": ["beta gamma delta epsilon tail words"]}),
    ]
    tmp = tempfile.mkdtemp()
    try:
        for i, b in enumerate(batches):
            spark.createDataFrame(b).write.parquet(f"{tmp}/in/f{i}")
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*"))
        out = ngram_contamination(stream, bench, shingle_n=3, min_overlap=1)
        q = (out.writeStream.format("memory").queryName("contam_stream")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM contam_stream").toPandas()
        flags = {(r.doc_id, r.bench_id): r.n_overlap
                 for r in got.itertuples()}
        assert flags == {(1, 100): 2, (3, 100): 2}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_clean_chunks_pipeline_state_bounded(spark):
    """End-to-end live pipeline (ingest -> dedup -> decontaminate ->
    chunk): duplicate docs collapse to first arrival, contaminated
    docs are filtered statelessly, chunks match the batch operators on
    the surviving set — and the ONLY state is the dedup store, bounded
    by the watermark horizon (entries older than the horizon are
    evicted, asserted from the query's state metrics)."""
    import datetime

    import pandas as pd

    from cngi_prototype_spark.streaming.stream_ops import (
        stream_clean_chunks)

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    bench = spark.createDataFrame(
        [(100, "secret eval question answer key")], ["doc_id", "text"])
    # batch 0: two clean docs; batch 1: duplicate of doc 1 (same text)
    # + a contaminated doc; batch 2: far-future doc that pushes the
    # watermark past batch-0/1 event times, forcing state eviction
    batches = [
        pd.DataFrame({"doc_id": [1, 2], "ts": [ts(0), ts(1)],
                      "text": ["one two three four five six",
                               "alpha beta gamma delta epsilon"]}),
        pd.DataFrame({"doc_id": [3, 4], "ts": [ts(2), ts(3)],
                      "text": ["one two three four five six",
                               "contains secret eval question words"]}),
        pd.DataFrame({"doc_id": [5], "ts": [ts(600)],
                      "text": ["late arrival fresh content here"]}),
    ]
    tmp = tempfile.mkdtemp()
    try:
        for i, b in enumerate(batches):
            spark.createDataFrame(b).write.parquet(f"{tmp}/in/f{i}")
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*"))
        out = stream_clean_chunks(stream, bench, watermark="10 minutes",
                                  shingle_n=3, chunk_tokens=3)
        q = (out.writeStream.format("memory").queryName("clean_chunks")
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        progresses = [p for p in q.recentProgress
                      if p and p["stateOperators"]]
        got = spark.sql("SELECT * FROM clean_chunks").toPandas()
        # doc 3 deduped (same text as 1), doc 4 decontaminated
        assert set(got.doc_id) == {1, 2, 5}
        # chunks equal the batch operator over the surviving docs
        from cngi_prototype_spark.text.analysis import chunk_documents
        surv = spark.createDataFrame(
            pd.concat(batches)).filter("doc_id in (1, 2, 5)")
        want = chunk_documents(surv, chunk_tokens=3).toPandas()
        merged = got.merge(want, on=["doc_id", "chunk_id"],
                           suffixes=("", "_b"))
        assert len(merged) == len(want) == len(got)
        assert (merged.chunk_text == merged.chunk_text_b).all()
        # state property: never more rows than distinct docs inside
        # the watermark horizon; final trigger evicted the old entries
        assert all(p["stateOperators"][0]["numRowsTotal"] <= 4
                   for p in progresses)
        final = progresses[-1]["stateOperators"][0]
        assert final["numRowsTotal"] <= 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_neardup_incremental_equals_batch(spark, tmp_path):
    """Replaying document batches through neardup_dedup_batch must keep
    exactly the canonical set the batch MinHash/LSH pipeline keeps on
    the full corpus (min-id representative per duplicate cluster)."""
    from cngi_prototype_spark.dedup.dedup import (
        duplicate_clusters, minhash_lsh_candidates)
    from cngi_prototype_spark.streaming.stream_ops import (
        neardup_dedup_batch)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    docs = []
    for i in range(12):
        if i % 3 == 0:
            docs.append((i, base))                       # dup cluster
        elif i % 3 == 1:
            docs.append((i, base.replace("dog", f"cat{i}")))  # near-dup
        else:
            docs.append((i, f"totally different text number {i} "
                            f"with unique words alpha{i} beta{i}"))
    full = spark.createDataFrame(docs, ["doc_id", "text"])

    # batch truth: LSH candidates -> components -> min-id canonical
    cand = minhash_lsh_candidates(full)
    comp = duplicate_clusters(cand.select("id_a", "id_b"))
    batch_kept = {r.doc_id for r in full.join(
        comp.filter("doc_id != canonical_id"), "doc_id",
        "left_anti").collect()}

    # incremental replay in three arrival orders/batchings
    for cut in ((4, 8), (1, 6), (12,)):
        seen = None
        inc_kept = set()
        lo = 0
        for hi in list(cut) + [12]:
            if hi <= lo:
                continue
            b = spark.createDataFrame(docs[lo:hi], ["doc_id", "text"])
            kept, new_b = neardup_dedup_batch(b, seen)
            inc_kept |= {r.doc_id for r in kept.select("doc_id").collect()}
            nb = new_b.toPandas()
            seen_pdf = (nb if seen is None
                        else __import__("pandas").concat(
                            [seen.toPandas(), nb], ignore_index=True))
            seen = spark.createDataFrame(seen_pdf.drop_duplicates())
            lo = hi
        assert inc_kept == batch_kept, cut


def test_stream_dedup_neardup_end_to_end(spark, tmp_path):
    import os
    import time as _t

    from cngi_prototype_spark.streaming.stream_ops import (
        stream_dedup_neardup)

    base = ("pack my box with five dozen liquor jugs while the band "
            "played on and the crowd cheered loudly all night long")
    schema = "doc_id long, text string"
    os.makedirs(tmp_path / "in")
    spark.createDataFrame(
        [(0, base), (1, "unrelated first words entirely distinct")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in"))
    stream = spark.readStream.schema(schema).parquet(
        str(tmp_path / "in"))
    writer = stream_dedup_neardup(
        stream, str(tmp_path / "kept"), str(tmp_path / "buckets"),
        str(tmp_path / "ck"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    # second arrival: one near-dup of doc 0, one fresh doc
    spark.createDataFrame(
        [(2, base.replace("jugs", "cups")), (3, "another fresh doc "
          "with its own vocabulary zeta omega")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    kept = {r.doc_id for r in
            spark.read.parquet(str(tmp_path / "kept")).collect()}
    assert kept == {0, 1, 3}  # 2 recognized as near-dup ACROSS batches

    # bucket-store compaction (compact_store is generic over both
    # incremental stores; the gram store has its own lifecycle test):
    # fold the two batch partitions, then a fresh-checkpoint batch 3
    # must still recognize a near-dup of the batch-1 doc
    from cngi_prototype_spark.streaming.stream_ops import compact_store

    buckets = str(tmp_path / "buckets")
    pre = spark.read.parquet(buckets)
    distinct_keys = pre.drop("_batch").distinct().count()
    assert pre.select("_batch").distinct().count() == 2
    before, after = compact_store(spark, buckets, target_files=2)
    post = spark.read.parquet(buckets)
    assert after == distinct_keys == post.count()
    assert post.select("_batch").distinct().collect()[0][0] == 1

    spark.createDataFrame(
        [(4, base.replace("night", "day")),
         (5, "completely novel content qux quux corge")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in"))
    q = stream_dedup_neardup(
        spark.readStream.schema(schema).parquet(str(tmp_path / "in")),
        str(tmp_path / "kept"), buckets,
        str(tmp_path / "ck_post")).trigger(availableNow=True).start()
    q.awaitTermination(120)
    kept2 = {r.doc_id for r in
             spark.read.parquet(str(tmp_path / "kept")).collect()}
    # 4 is a near-dup of doc 0 (visible through the compacted store);
    # 5 is fresh. The fresh checkpoint re-delivers docs 0-3 too — their
    # own buckets are already in the compacted store, so the re-arrival
    # drops them (correct: the canonical copies live in the prior
    # runs' kept partitions, which this union still shows)
    assert 5 in kept2 and 4 not in kept2
    assert {0, 1, 3} <= kept2 and 2 not in kept2


def test_stream_dedup_neardup_replay_idempotent(spark, tmp_path):
    """foreachBatch can re-run a batch after failure; the _batch
    dynamic-overwrite sink must make a replay REPLACE its own output
    instead of appending twice (simulated with a fresh checkpoint over
    the same input, which re-delivers batch 0)."""
    import os

    from cngi_prototype_spark.streaming.stream_ops import (
        stream_dedup_neardup)

    schema = "doc_id long, text string"
    os.makedirs(tmp_path / "in")
    spark.createDataFrame(
        [(0, "some document words here"), (1, "other words entirely")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in"))
    for ck in ("ck1", "ck2"):  # second run = full replay of batch 0
        stream = spark.readStream.schema(schema).parquet(
            str(tmp_path / "in"))
        q = stream_dedup_neardup(
            stream, str(tmp_path / "kept"), str(tmp_path / "buckets"),
            str(tmp_path / ck)).trigger(availableNow=True).start()
        q.awaitTermination(120)
    kept = spark.read.parquet(str(tmp_path / "kept")).toPandas()
    assert sorted(kept.doc_id) == [0, 1]  # no duplicates from replay


def test_stream_pack_sequences_equals_batch(spark, tmp_path):
    """Batches arriving through stream_pack_sequences must produce
    exactly the placements of batch pack_sequences over the
    concatenated corpus (arrival order = packing order), with sequence
    ids continuing across the batch boundary — including a document
    that spans it."""
    import os

    from cngi_prototype_spark.text.training import pack_sequences
    from cngi_prototype_spark.streaming.stream_ops import (
        stream_pack_sequences)

    L = 4
    docs = [(0, "a b c d e"), (1, "f g"),            # batch 1
            (2, "h i j k l m n o p"), (3, "q")]      # batch 2
    schema = "doc_id long, text string"
    os.makedirs(tmp_path / "in")
    writer = None
    for lo, hi in ((0, 2), (2, 4)):
        spark.createDataFrame(docs[lo:hi], schema).coalesce(1) \
            .write.mode("append").parquet(str(tmp_path / "in"))
        stream = spark.readStream.schema(schema).parquet(
            str(tmp_path / "in"))
        writer = stream_pack_sequences(
            stream, str(tmp_path / "out"), str(tmp_path / "off"),
            str(tmp_path / "ck"), L)
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)
    cols = ["doc_id", "seq_id", "tok_start", "tok_end", "seq_offset",
            "n_tokens"]
    got = sorted(map(tuple, spark.read.parquet(str(tmp_path / "out"))
                     .select(*cols).collect()))
    want = sorted(map(tuple, pack_sequences(
        spark.createDataFrame(docs, schema), L).select(*cols).collect()))
    assert got == want


def test_stream_dedup_neardup_new_run_keeps_prior_state(spark, tmp_path):
    """Restarting with a FRESH checkpoint over populated kept/bucket
    stores is a new run, not a replay: batch ids restart at 0, so
    without a run epoch the first batch would dynamic-overwrite the
    prior run's _batch=0 partition (data loss) and hide every prior
    bucket behind the _batch < batch_id guard (re-admitted dups). The
    persisted base = max(_batch)+1 must keep prior partitions intact
    and prior buckets visible."""
    import os

    from cngi_prototype_spark.streaming.stream_ops import (
        stream_dedup_neardup)

    base_text = ("pack my box with five dozen liquor jugs while the "
                 "band played on and the crowd cheered loudly tonight")
    schema = "doc_id long, text string"
    os.makedirs(tmp_path / "in1")
    os.makedirs(tmp_path / "in2")
    spark.createDataFrame(
        [(0, base_text), (1, "unrelated first words entirely distinct")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in1"))
    q = stream_dedup_neardup(
        spark.readStream.schema(schema).parquet(str(tmp_path / "in1")),
        str(tmp_path / "kept"), str(tmp_path / "buckets"),
        str(tmp_path / "ck_run1")).trigger(availableNow=True).start()
    q.awaitTermination(120)

    # run 2: FRESH checkpoint, new input dir — one near-dup of run 1's
    # doc 0, one fresh doc
    spark.createDataFrame(
        [(2, base_text.replace("jugs", "cups")),
         (3, "another fresh doc with its own vocabulary zeta omega")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in2"))
    q = stream_dedup_neardup(
        spark.readStream.schema(schema).parquet(str(tmp_path / "in2")),
        str(tmp_path / "kept"), str(tmp_path / "buckets"),
        str(tmp_path / "ck_run2")).trigger(availableNow=True).start()
    q.awaitTermination(120)

    kept = spark.read.parquet(str(tmp_path / "kept")).toPandas()
    # prior run's partition intact (0, 1), cross-RUN near-dup dropped
    # (2), fresh doc kept (3)
    assert sorted(kept.doc_id) == [0, 1, 3]
    # run 2 landed in its own epoch partition, past run 1's
    assert kept._batch.min() == 0 and kept._batch.max() >= 1


def test_pin_run_base_legacy_checkpoint_detection(spark, tmp_path):
    """A checkpoint written by the pre-epoch code resumes with
    batch_id > 0 and no epoch file; pinning max(_batch)+1 there would
    shadow the in-flight batch's partial partition. Detection: that
    layout falls back to base=0; a genuinely fresh checkpoint (first
    batch_id == 0) still pins past the store; an existing epoch file
    always wins."""
    from cngi_prototype_spark.streaming.stream_ops import _pin_run_base

    store = str(tmp_path / "store")
    (spark.createDataFrame([(0, "a"), (1, "b")], "_batch long, v string")
     .write.partitionBy("_batch").parquet(store))

    # legacy same-checkpoint resume: batch_id 2, no epoch file -> base 0
    assert _pin_run_base(spark, str(tmp_path / "ep_legacy"), store, 2) == 0
    # fresh checkpoint: first batch id 0 -> past the store (max+1 = 2)
    assert _pin_run_base(spark, str(tmp_path / "ep_fresh"), store, 0) == 2
    # persisted epoch file wins on replay, whatever the batch id
    assert _pin_run_base(spark, str(tmp_path / "ep_fresh"), store, 7) == 2


def test_spans_incremental_equals_batch(spark):
    """spans_dedup_batch replayed over ANY monotone-id batching must
    equal remove_duplicate_spans over the concatenated corpus — the
    keeper is the first (batch, doc, position) occurrence, which with
    monotone ids is exactly the batch rule's min-(doc, position)."""
    from cngi_prototype_spark.dedup.dedup import (
        remove_duplicate_spans, spans_dedup_batch)

    phrase = "the quick brown fox jumps over the lazy dog"
    docs = [
        (0, f"alpha beta {phrase} gamma delta"),
        (1, "totally unrelated words one two three four five six"),
        (2, f"prefix words {phrase} and a tail of fresh tokens"),
        (3, f"{phrase} leading this document with more after"),
        (4, "another document with no repeats at all seven eight"),
        (5, f"double trouble {phrase} middle {phrase} end bits"),
    ]
    schema = "doc_id long, text string"
    batch_out = remove_duplicate_spans(
        spark.createDataFrame(docs, schema), n=6).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)

    for split in ([2, 4], [1, 3, 5], [6]):
        store = None
        outs = []
        lo = 0
        for hi in split + ([len(docs)] if split[-1] < len(docs) else []):
            b = spark.createDataFrame(docs[lo:hi], schema)
            rebuilt, new_g = spans_dedup_batch(b, store, n=6)
            outs.append(rebuilt.toPandas())
            new_pdf = new_g.toPandas()
            store_pdf = (new_pdf if store is None
                         else pd.concat([store.toPandas(), new_pdf]))
            store = spark.createDataFrame(store_pdf)
            lo = hi
        inc = pd.concat(outs).sort_values("doc_id").reset_index(drop=True)
        assert (inc.doc_id == batch_out.doc_id).all()
        assert (inc.n_tokens == batch_out.n_tokens).all(), split
        assert (inc.n_removed == batch_out.n_removed).all(), split
        assert (inc.text_dedup == batch_out.text_dedup).all(), split
    # sanity: something was actually removed across batches
    assert batch_out.n_removed.sum() > 0


def test_stream_dedup_spans_end_to_end(spark, tmp_path):
    """foreachBatch wiring: a phrase from batch 1 must be cut from a
    batch-2 document, outputs land in run-epoch partitions, and the
    gram store grows only by new fingerprints."""
    import os

    from cngi_prototype_spark.streaming.stream_ops import (
        stream_dedup_spans)

    phrase = "pack my box with five dozen liquor jugs tonight"
    schema = "doc_id long, text string"
    os.makedirs(tmp_path / "in")
    spark.createDataFrame(
        [(0, f"first doc says {phrase} and then stops")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in"))
    writer = stream_dedup_spans(
        spark.readStream.schema(schema).parquet(str(tmp_path / "in")),
        str(tmp_path / "out"), str(tmp_path / "grams"),
        str(tmp_path / "ck"), n=6)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    spark.createDataFrame(
        [(1, f"second doc repeats {phrase} word for word")],
        schema).coalesce(1).write.mode("append").parquet(
        str(tmp_path / "in"))
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out")).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.doc_id) == [0, 1]
    assert out.n_removed[0] == 0          # first occurrence kept
    assert out.n_removed[1] >= 8          # the repeated span removed
    assert phrase not in out.text_dedup[1]
    assert phrase in out.text_dedup[0]


def test_compact_store_lifecycle(spark, tmp_path):
    """Gram-store compaction: after two streamed batches, compact_store
    folds the per-batch partitions into one `_batch=0` partition with
    identical distinct keys, and a FRESH-checkpoint continuation over
    the compacted store cuts a batch-1 phrase exactly as the
    uncompacted store would. TTL mode (retain_min_batch past the end)
    expires the grams, so the same phrase is NOT cut — the documented
    bounded-state trade."""
    import os
    import shutil

    from cngi_prototype_spark.streaming.stream_ops import (
        compact_store, stream_dedup_spans)

    phrase = "sphinx of black quartz judge my vow again now here"
    schema = "doc_id long, text string"
    os.makedirs(tmp_path / "in")

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(str(tmp_path / "in"))

    def run(ck):
        writer = stream_dedup_spans(
            spark.readStream.schema(schema).parquet(str(tmp_path / "in")),
            str(tmp_path / "out"), str(tmp_path / "grams"), str(ck), n=6)
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)

    feed([(0, f"opening doc says {phrase} and then stops")])
    run(tmp_path / "ck1")
    feed([(1, "an unrelated middle doc with only fresh tokens here")])
    run(tmp_path / "ck1")

    grams = str(tmp_path / "grams")
    pre = spark.read.parquet(grams)
    distinct_keys = pre.drop("_batch").distinct().count()
    batches_before = pre.select("_batch").distinct().count()
    assert batches_before == 2
    # control copy: the uncompacted store
    shutil.copytree(grams, str(tmp_path / "grams_ctl"))

    before, after = compact_store(spark, grams, target_files=2)
    post = spark.read.parquet(grams)
    assert after == distinct_keys == post.count()
    # folded at the HIGH-WATER epoch (not 0): the epoch pin of the next
    # fresh checkpoint must land past every prior run's partitions
    assert post.select("_batch").distinct().collect()[0][0] == 1
    assert before >= after

    # continuation parity: batch 3 repeats the phrase; compacted and
    # control stores must produce the identical rebuilt document
    feed([(2, f"closing doc repeats {phrase} word for word")])
    run(tmp_path / "ck2")       # fresh checkpoint over compacted store
    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    # prior runs' OUTPUT partitions survive: the fresh run's epoch pins
    # past the compacted store's high-water _batch, so its dynamic
    # overwrite cannot land on doc 0/1's epochs (the pre-fix fold to
    # _batch=0 silently clobbered doc 1's partition here). The fresh
    # run re-delivers all input files, so docs 0-2 also appear under
    # the NEW epoch (double-delivery on re-feeding the same dir is the
    # caller's contract) — assert per-epoch, not globally.
    per_epoch = {b: sorted(g.doc_id) for b, g in out.groupby("_batch")}
    assert per_epoch[0] == [0] and per_epoch[1] == [1]
    assert per_epoch[2] == [0, 1, 2]
    got = out[(out.doc_id == 2) & (out._batch == 2)].iloc[0]
    assert phrase not in got.text_dedup and got.n_removed >= 8

    from cngi_prototype_spark.dedup.dedup import spans_dedup_batch
    ctl_store = spark.read.parquet(str(tmp_path / "grams_ctl"))
    ctl, _ = spans_dedup_batch(
        spark.createDataFrame(
            [(2, f"closing doc repeats {phrase} word for word")], schema),
        ctl_store, n=6)
    ctl_row = ctl.toPandas().iloc[0]
    assert ctl_row.text_dedup == got.text_dedup
    assert ctl_row.n_removed == got.n_removed

    # TTL: expire everything seen so far -> the phrase re-enters
    b, a = compact_store(spark, grams, retain_min_batch=10**6)
    assert a == 0
    # full expiry must NOT delete the store: an all-null sentinel row
    # keeps the high-water epoch pinned (deleting it reset the next
    # fresh run's base to 0 and clobbered prior output partitions)
    store = spark.read.parquet(grams)
    assert store.count() == 1
    assert store.agg(F.max("_batch")).head()[0] == 2
    assert store.drop("_batch").dropna(how="any").count() == 0
    # the sentinel never equi-joins: reading the expired store as
    # `seen` behaves exactly like no store — the phrase re-enters
    ttl, _ = spans_dedup_batch(
        spark.createDataFrame(
            [(9, f"late doc repeats {phrase} once more")], schema),
        store, n=6)
    trow = ttl.toPandas().iloc[0]
    assert phrase in trow.text_dedup and trow.n_removed == 0

    # streamed continuation AFTER full expiry: the fresh checkpoint
    # must pin past the expired epochs, so every prior run's output
    # partition survives its dynamic overwrite
    feed([(9, f"late doc repeats {phrase} once more")])
    run(tmp_path / "ck3")
    out3 = spark.read.parquet(str(tmp_path / "out")).toPandas()
    pe3 = {b_: sorted(g.doc_id) for b_, g in out3.groupby("_batch")}
    assert pe3[0] == [0] and pe3[1] == [1] and pe3[2] == [0, 1, 2]
    assert pe3[3] == [0, 1, 2, 9]  # fresh run re-delivers all inputs


def test_compact_store_swap_recovery(spark, tmp_path):
    """A compaction crash between the swap renames leaves the store
    path absent; _recover_store_swap (also run by _pin_run_base) must
    restore a consistent store in every distinguishable crash state."""
    from cngi_prototype_spark.streaming.stream_ops import (
        _pin_run_base, _recover_store_swap)

    jvm = spark._jvm

    def fs_for(p):
        jp = jvm.org.apache.hadoop.fs.Path(p)
        return jp.getFileSystem(spark._jsc.hadoopConfiguration()), jp

    def mk(p, batches):
        spark.createDataFrame(
            [(b, f"k{b}") for b in batches], "_batch long, v string") \
            .write.partitionBy("_batch").parquet(p)

    # state: src absent, committed tmp present (crash after 1st rename,
    # tmp fully written) -> finish the swap
    s1 = str(tmp_path / "s1")
    mk(s1 + "__compact_tmp", [5])
    mk(s1 + "__compact_bak", [0, 1])
    _recover_store_swap(spark, s1)
    assert spark.read.parquet(s1).agg(F.max("_batch")).head()[0] == 5
    fs, jp = fs_for(s1 + "__compact_bak")
    assert not fs.exists(jp)

    # state: src absent, NO tmp (crash between renames with tmp already
    # moved... or tmp uncommitted) -> roll back from bak
    s2 = str(tmp_path / "s2")
    mk(s2 + "__compact_bak", [0, 3])
    _recover_store_swap(spark, s2)
    assert spark.read.parquet(s2).agg(F.max("_batch")).head()[0] == 3

    # state: src present, stale tmp/bak garbage -> garbage removed
    s3 = str(tmp_path / "s3")
    mk(s3, [2])
    mk(s3 + "__compact_tmp", [9])
    _recover_store_swap(spark, s3)
    assert spark.read.parquet(s3).agg(F.max("_batch")).head()[0] == 2
    fs, jp = fs_for(s3 + "__compact_tmp")
    assert not fs.exists(jp)

    # _pin_run_base self-heals before pinning: a fresh checkpoint over
    # a mid-swap store pins past the RECOVERED high water, not 0
    s4 = str(tmp_path / "s4")
    mk(s4 + "__compact_bak", [0, 4])
    assert _pin_run_base(spark, str(tmp_path / "ep4"), s4, 0) == 5


def test_stream_dedup_compaction_schedule_invariance(spark, tmp_path):
    """Kept output is invariant under the in-stream compaction
    schedule (never / every 2nd batch / every batch) for BOTH
    incremental stores — the fold preserves exactly the distinct keys
    the `_batch < eb` read would see."""
    import os

    from cngi_prototype_spark.streaming.stream_ops import (
        stream_dedup_neardup, stream_dedup_spans)

    base = ("pack my box with five dozen liquor jugs while the band "
            "played on and the crowd cheered loudly all night long")
    phrase = "the five boxing wizards jump quickly over frozen lakes"
    schema = "doc_id long, text string"
    feeds = [
        [(0, base), (1, f"alpha beta {phrase} gamma delta")],
        [(2, base.replace("jugs", "cups")),
         (3, "fresh vocabulary zeta omega entirely new")],
        [(4, base.replace("night", "day")),
         (5, f"tail doc repeats {phrase} word for word")],
        [(6, "completely novel content qux quux corge")],
    ]

    def run_neardup(tag, every):
        indir = tmp_path / f"in_n_{tag}"
        os.makedirs(indir)
        for i, rows in enumerate(feeds):
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(str(indir))
            q = stream_dedup_neardup(
                spark.readStream.schema(schema).parquet(str(indir)),
                str(tmp_path / f"kept_{tag}"),
                str(tmp_path / f"buckets_{tag}"),
                str(tmp_path / f"ckn_{tag}"),
                compact_every=every).trigger(availableNow=True).start()
            q.awaitTermination(120)
        return {r.doc_id for r in spark.read.parquet(
            str(tmp_path / f"kept_{tag}")).select("doc_id").collect()}

    kept = {e: run_neardup(t, e)
            for t, e in (("off", None), ("mid", 2), ("all", 1))}
    assert kept[None] == kept[2] == kept[1]
    assert 0 in kept[None] and 2 not in kept[None]  # dedup still real

    def run_spans(tag, every):
        indir = tmp_path / f"in_s_{tag}"
        os.makedirs(indir)
        for rows in feeds:
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(str(indir))
            q = stream_dedup_spans(
                spark.readStream.schema(schema).parquet(str(indir)),
                str(tmp_path / f"out_{tag}"),
                str(tmp_path / f"grams_{tag}"),
                str(tmp_path / f"cks_{tag}"), n=6,
                compact_every=every).trigger(availableNow=True).start()
            q.awaitTermination(120)
        pdf = spark.read.parquet(str(tmp_path / f"out_{tag}")) \
            .select("doc_id", "text_dedup", "n_removed").toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        return pdf

    outs = {e: run_spans(t, e)
            for t, e in (("off", None), ("mid", 2), ("all", 1))}
    for e in (2, 1):
        pd.testing.assert_frame_equal(outs[None], outs[e])
    assert outs[None].n_removed.sum() > 0  # the span cut still real
