"""Structured-Streaming surface.

The reference is batch-only (SURVEY.md §2.9) — its closest analogs are
``time_average``'s uniform resampling (``cngi/vis/time_average.py:63-74``)
and incremental appends (``convert_ms(append=True)``, ``append_xds``).
This module lifts those semantics onto live sources:

- :func:`stream_time_average` — the tumbling-window weighted
  time-average of the batch operator, incrementally maintained with a
  watermark for late data. State per (window × baseline × chan × pol)
  key; partial aggregation keeps shuffle volume bounded by the key
  cardinality per trigger, identical to the batch plan.
- :func:`stream_append_vis` — append-mode parquet sink (the streaming
  twin of ``write_vis``'s incremental store).

Both return handles the caller starts with ``.trigger(...)``; tests use
``availableNow`` so the stream drains deterministically and must equal
the batch operator on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_time_average(
    stream_df: DataFrame,
    *,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    time: str = "ts",
    keys: tuple[str, ...] = ("bl", "chan", "pol"),
    data: tuple[str, ...] = ("data_re", "data_im"),
    weight: str = "w",
) -> DataFrame:
    """Watermarked tumbling-window weighted mean — streaming twin of
    ``operators.averaging.time_average(width=...)``: per window,
    ``sum(data·w)/sum(w)`` for data columns and ``sum(w)`` carried."""
    aggs = [
        (F.sum(F.col(c) * F.col(weight)) / F.sum(F.when(F.col(c).isNotNull(), F.col(weight))))
        .alias(c) for c in data
    ] + [F.sum(weight).alias(weight), F.count(F.lit(1)).alias("n_samples")]
    return (stream_df
            .withWatermark(time, watermark)
            .groupBy(F.window(F.col(time), window).alias("win"), *keys)
            .agg(*aggs)
            .select(F.col("win.start").alias("win_start"), *keys, *data,
                    weight, "n_samples"))


def stream_dedup_exact(
    stream_df: DataFrame,
    *,
    text: str = "text",
    time: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication — the live twin of
    ``dedup.dedup_exact``: keep the first document per content hash,
    with state bounded by the watermark (hashes older than the
    watermark are dropped from state, the standard streaming-dedup
    contract). Built-in stateful ``dropDuplicates``; at 100 TB/day the
    state store holds only the watermark horizon's hashes."""
    return (stream_df
            .withColumn("_content_md5", F.md5(F.col(text)))
            .withWatermark(time, watermark)
            .dropDuplicates(["_content_md5"]))


def stream_running_mean(
    stream_df: DataFrame,
    *,
    keys: tuple[str, ...] = ("bl", "chan", "pol"),
    data: tuple[str, ...] = ("data_re", "data_im"),
    weight: str = "w",
):
    """Custom stateful operator via ``applyInPandasWithState``: a
    cumulative weighted running mean per key, emitted every trigger —
    the streaming analog of an incremental calibration accumulator
    (reference self_cal keeps per-baseline gain solutions; here the
    state is the running (Σw, Σw·x, n) sufficient statistics, so the
    emitted mean is exact over the whole stream, not per window).

    State per key: 2·len(data)+2 doubles — bounded by key cardinality,
    not stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_fields = ", ".join(f"{k} long" for k in keys)
    out_schema = (f"{key_fields}, "
                  + ", ".join(f"{c} double" for c in data)
                  + f", {weight} double, n_samples long")
    state_schema = ("sw double, n long, "
                    + ", ".join(f"s_{c} double" for c in data))

    def update(key: tuple, pdfs, state: GroupState):
        if state.exists:
            st = list(state.get)
        else:
            st = [0.0, 0] + [0.0] * len(data)
        for pdf in pdfs:
            w = pdf[weight].to_numpy()
            st[0] += float(w.sum())
            st[1] += len(pdf)
            for i, c in enumerate(data):
                st[2 + i] += float((pdf[c].to_numpy() * w).sum())
        state.update(tuple(st))
        sw = st[0]
        row = list(key) + [st[2 + i] / sw if sw else None
                           for i in range(len(data))] + [sw, st[1]]
        yield pd.DataFrame([row], columns=[*keys, *data, weight, "n_samples"])

    return (stream_df.groupBy(*[F.col(k) for k in keys])
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def stream_append_vis(stream_df: DataFrame, outfile: str, checkpoint: str,
                      partition_by: tuple[str, ...] = ()):
    """Incremental parquet sink (write_vis append twin)."""
    w = stream_df.writeStream.format("parquet") \
        .option("path", outfile).option("checkpointLocation", checkpoint) \
        .outputMode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def stream_grid_accumulate(
    stream_df: DataFrame,
    gp,
    *,
    u: str = "u",
    v: str = "v",
    freq: str = "freq",
    weight: str = "weight",
    re: str = "data_re",
    im: str = "data_im",
    chan: str = "chan",
    pol: str = "pol",
) -> DataFrame:
    """Online imaging: incrementally accumulate the uv grid over a live
    visibility stream (beyond reference — its gridder is batch-only).

    The explode-taps gridder is a pure groupBy-sum, so it lifts onto
    Structured Streaming unchanged: per trigger, each micro-batch's
    taps partial-aggregate map-side and merge into the per-cell running
    sums in the state store. Emit in ``update`` output mode; the cell
    count bounds the state (≤ padded-grid size per plane), independent
    of how many visibilities have streamed through — the same property
    that bounds the batch shuffle. A downstream FFT consumer can image
    any snapshot of the sink table.
    """
    # the batch gridder's _prepare IS streaming-safe (pure row-local
    # exprs + filters) — reuse it so the geometry, in-bounds rule, and
    # the weight-null / zero-data row filter can never drift from the
    # batch contract (a hand-copied version here had already dropped
    # the zero-data filter)
    from cngi_prototype_spark.imaging.grid import (
        _cgk_at,
        _flit_arr,
        _prepare,
        _tap_explode,
        _tap_iu_iv,
    )

    geom = _prepare(stream_df, gp, u, v, freq, weight, re, im)
    # driver-cheap literals (r15): expr-string kernel LUT + exploded
    # tap-index sequence — see grid.py _flit_arr/_tap_explode
    cgk_lit = _flit_arr(gp.kernel_1d())
    sup, lo = gp.support, -gp.half
    tiu, tiv = _tap_iu_iv(sup, lo)
    sel = [chan, pol, "_u_c", "_v_c", "_du", "_dv", "_wd_re", "_wd_im"]
    e = (geom.select(*sel, _tap_explode(sup, lo))
         .select(*sel, tiu.alias("_tiu"), tiv.alias("_tiv")))
    conv = (_cgk_at(cgk_lit, gp.oversampling, 0,
                    F.col("_tiu") * gp.oversampling + F.col("_du"))
            * _cgk_at(cgk_lit, gp.oversampling, 0,
                      F.col("_tiv") * gp.oversampling + F.col("_dv")))
    return (e.groupBy(
        chan, pol,
        (F.col("_u_c") + F.col("_tiu")).alias("u_idx"),
        (F.col("_v_c") + F.col("_tiv")).alias("v_idx"))
        .agg(F.sum(conv * F.col("_wd_re")).alias("grid_re"),
             F.sum(conv * F.col("_wd_im")).alias("grid_im")))


def stream_clean_chunks(
    stream_df: DataFrame,
    bench: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    time: str = "ts",
    watermark: str = "1 hour",
    shingle_n: int = 3,
    min_overlap: int = 1,
    chunk_tokens: int = 128,
    overlap: int = 0,
    max_bench_grams: int = 65_536,
) -> DataFrame:
    """End-to-end live ingest hygiene: dedup → decontaminate → chunk,
    as ONE streaming query with ONE stateful operator.

    The composition is deliberately shaped so only deduplication holds
    state (``dropDuplicatesWithinWatermark`` on the content hash —
    state size bounded by distinct documents inside the watermark
    horizon, rows evicted as the watermark advances):

    - **decontaminate** runs STATELESS: the benchmark's distinct
      xxhash64 grams collect once (an eval set is bounded by
      construction — the same contract as the batch
      ``ngram_contamination`` broadcast) and ride the plan as an array
      literal; the filter is ``array_intersect`` per row, no join, no
      state. ``max_bench_grams`` guards the plan size — above it,
      decontaminate in batch first.
    - **chunk** is a pure projection (tokenize-once + sequence +
      explode), stateless by construction.

    Returns the unstarted chunk stream
    ``(doc_id, chunk_id, n_chunk_tokens, chunk_text)``.
    """
    from cngi_prototype_spark.text.analysis import shingles
    from cngi_prototype_spark.text.analysis import chunk_documents

    grams = [r[0] for r in bench.select(
        F.explode(F.transform(
            shingles(F.col(text), shingle_n),
            lambda g: F.xxhash64(g))).alias("g")).distinct().collect()]
    if len(grams) > max_bench_grams:
        raise ValueError(
            f"benchmark gram set ({len(grams)}) exceeds "
            f"max_bench_grams={max_bench_grams}; run batch "
            "ngram_contamination instead of inlining the set in the "
            "streaming plan")

    deduped = (stream_df
               .withWatermark(time, watermark)
               .withColumn("__h", F.xxhash64(F.col(text)))
               .dropDuplicatesWithinWatermark(["__h"]))
    doc_grams = F.transform(shingles(F.col(text), shingle_n),
                            lambda g: F.xxhash64(g))
    clean = deduped.filter(
        F.size(F.array_intersect(
            doc_grams, F.lit(sorted(grams)))) < min_overlap
        if grams else F.lit(True))
    return chunk_documents(clean.drop("__h"), text_col=text,
                           id_col=id_col, chunk_tokens=chunk_tokens,
                           overlap=overlap)


# --------------------------------------------------------------------------
# incremental NEAR-dup dedup (MinHash/LSH over a persistent bucket store)


def _hadoop_exists(spark, p: str) -> bool:
    """Store-existence through the path's own Hadoop FileSystem —
    object-store-safe, unlike driver-local ``os.path``."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _pin_run_base(spark, epoch_path: str, store_path: str,
                  first_batch_id: int = 0) -> int:
    """Pin this run's monotone partition epoch: foreachBatch batch ids
    restart at 0 with every fresh checkpoint, so raw ids over a
    long-lived store would dynamic-overwrite PRIOR runs' ``_batch=N``
    partitions and hide prior state behind ``_batch < id`` replay
    guards. base = (max existing ``_batch``) + 1, persisted ONCE under
    the run's own checkpoint dir so same-checkpoint replays reuse it
    (their overwrites stay within their own partitions) while a fresh
    checkpoint starts past every prior run.

    Legacy-checkpoint migration: a checkpoint created by the pre-epoch
    code resumes with ``first_batch_id > 0`` and NO epoch file. Pinning
    ``max(_batch)+1`` there would replay the in-flight batch into a NEW
    partition while its old partial partition stays visible below the
    ``_batch < eb`` guard — duplicate keepers. Detect that layout and
    fall back to base=0, which keeps the resume aligned with the
    partitions the legacy run already wrote (fresh checkpoints always
    start at batch 0, so the detection cannot misfire on them)."""
    # self-heal a store left mid-swap by a crashed compaction BEFORE
    # consulting it — an absent store here would mis-pin base=0
    _recover_store_swap(spark, store_path)
    if _hadoop_exists(spark, epoch_path):
        return int(spark.read.parquet(epoch_path).head()["base"])
    b = 0
    if first_batch_id == 0 and _hadoop_exists(spark, store_path):
        m = (spark.read.parquet(store_path)
             .agg(F.max("_batch")).head()[0])
        b = int(m) + 1 if m is not None else 0
    (spark.createDataFrame([(b,)], "base bigint")
     .write.mode("overwrite").parquet(epoch_path))
    return b


def _store_fs(spark, p: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _swap_paths(store_path: str) -> tuple[str, str]:
    """(tmp, bak) side paths of the compaction swap — ONE derivation
    shared by :func:`compact_store` and :func:`_recover_store_swap`;
    the crash-recovery contract depends on both probing identical
    paths."""
    base = store_path.rstrip("/")
    return base + "__compact_tmp", base + "__compact_bak"


def _rename_or_raise(fs, src, dst) -> None:
    """Hadoop FileSystem.rename signals failure by returning false,
    not raising — a swallowed false would report a failed swap as a
    successful compaction."""
    if not fs.rename(src, dst):
        raise OSError(f"compaction swap rename failed: {src} -> {dst}")


def _recover_store_swap(spark, store_path: str) -> None:
    """Repair a store left mid-swap by a crashed :func:`compact_store`.

    The swap is write-tmp → rename src→bak → rename tmp→src → delete
    bak. A crash between the two renames leaves the store path ABSENT —
    and an absent store resets `_pin_run_base`'s fresh-checkpoint pin to
    0, the exact clobber the epoch machinery exists to prevent. Repair
    rules (each state is distinguishable):

    - src present: any leftover tmp/bak is pre- or post-swap garbage —
      delete both.
    - src absent, tmp COMMITTED (has ``_SUCCESS``): the compacted copy
      was fully written before the first rename, so finish the swap
      (tmp→src, drop bak).
    - src absent, no committed tmp: roll back (bak→src, drop tmp).
    """
    fs, jsrc = _store_fs(spark, store_path)
    tmp, bak = _swap_paths(store_path)
    jtmp = spark._jvm.org.apache.hadoop.fs.Path(tmp)
    jbak = spark._jvm.org.apache.hadoop.fs.Path(bak)
    if fs.exists(jsrc):
        for j in (jtmp, jbak):
            if fs.exists(j):
                fs.delete(j, True)
        return
    jtmp_ok = spark._jvm.org.apache.hadoop.fs.Path(tmp + "/_SUCCESS")
    if fs.exists(jtmp) and fs.exists(jtmp_ok):
        _rename_or_raise(fs, jtmp, jsrc)
        if fs.exists(jbak):
            fs.delete(jbak, True)
    elif fs.exists(jbak):
        _rename_or_raise(fs, jbak, jsrc)
        if fs.exists(jtmp):
            fs.delete(jtmp, True)


def compact_store(
    spark,
    store_path: str,
    *,
    retain_min_batch: int | None = None,
    target_files: int = 8,
    fold_below: int | None = None,
    sum_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Offline compaction of a persistent incremental-dedup store (the
    gram store of :func:`stream_dedup_spans`, the bucket store of
    :func:`stream_dedup_neardup`): fold every ``_batch=N`` partition
    into ONE partition at the store's HIGH-WATER epoch (``max _batch``)
    of ``target_files`` files with duplicate keys collapsed. Returns
    ``(rows_before, rows_after)``.

    The fold target must be the high-water epoch, not 0: `_pin_run_base`
    pins a fresh run's base to ``max(_batch)+1`` **of this store**, and
    the SAME epoch numbers partition the kept/output sink — folding to
    0 would reset the pin and let the next run's dynamic overwrite
    clobber prior runs' output partitions (caught by the round-11
    bucket-store lifecycle test).

    Retention contract: without compaction the store grows by every
    distinct key ever seen — that is the OPERATOR's semantics (the
    ExactSubstr store is the paper's suffix-array content; near-dup
    buckets are the cluster representatives), so the floor is
    corpus-bound, not time-bound. What compaction bounds is the
    OVERHEAD above that floor: micro-batch partition sprawl (one
    directory + small files per batch, thousands after a week of
    triggers) and replay-attempt duplicates. For genuinely bounded
    state, ``retain_min_batch`` drops keys whose epoch is older than
    the cutoff BEFORE folding — a documented semantics trade: spans /
    near-dups are then deduplicated only against the retained window,
    and content last seen before it can re-enter the corpus.

    Offline use (``fold_below=None``): run ONLY while no stream is
    writing the store, stopped at a committed batch boundary (an
    uncommitted batch's partial partition would otherwise be folded
    into permanent state and escape its replay's own-partition
    exclusion). Start the next run on a fresh checkpoint:
    `_pin_run_base` then pins base = high-water + 1, immediately past
    the compacted partition, and the ``_batch < eb`` visibility guard
    sees the folded state exactly as it saw the original partitions
    while output partitions of prior epochs stay untouched.

    ``sum_cols`` marks ADDITIVE stores (the LM count store of
    :func:`stream_lm_counts`): the fold merges per-batch partial rows
    by summing those columns per remaining-key group instead of
    ``distinct()`` — which would keep same-key rows with different
    counts and double-count on re-aggregation.

    In-stream use (``fold_below=<current epoch>``): folds ONLY
    partitions with ``_batch < fold_below`` — all committed by
    structured streaming's batch ordering — at THEIR high-water epoch,
    leaving the current (possibly in-flight / replayable) partition
    untouched; replays of the current batch still see the folded state
    through their ``_batch < eb`` read and still overwrite only their
    own partition. This is what the streams' ``compact_every`` knob
    calls between batches.

    Full-expiry edge: when retention (or an already-empty fold) leaves
    ZERO rows, the store is NOT deleted — an absent store would reset
    `_pin_run_base`'s fresh-checkpoint pin to 0 and let the next run's
    dynamic overwrite clobber prior runs' OUTPUT partitions (the kept
    sink shares epoch numbering). Instead ONE all-null sentinel row is
    written at the high-water epoch: equi-joins never match NULL keys,
    so every consumer sees an empty store while the epoch stays
    pinned. Sentinels are dropped again on the next fold with real
    rows.

    The swap is write-aside → rename src→bak → rename tmp→src →
    delete bak; a crash between the renames is repaired by
    :func:`_recover_store_swap` (also invoked by `_pin_run_base`, so
    the next run self-heals). Still not atomic on object stores —
    never run two compactions concurrently."""
    _recover_store_swap(spark, store_path)
    raw = spark.read.parquet(store_path)
    keycols = [c for c in raw.columns if c != "_batch"]
    live = F.greatest(*[F.col(c).isNotNull() for c in keycols]) \
        if len(keycols) > 1 else F.col(keycols[0]).isNotNull()
    full = raw.filter(live)  # drop any prior full-expiry sentinel
    df, keep, hi_src = full, None, raw
    if fold_below is not None:
        df = full.filter(F.col("_batch") < int(fold_below))
        keep = full.filter(F.col("_batch") >= int(fold_below))
        hi_src = raw.filter(F.col("_batch") < int(fold_below))
    before = df.count()
    # epoch over the RAW subset: a sentinel-only store must keep its
    # pinned high-water epoch, not fold back to 0
    hiwater = hi_src.agg(F.max("_batch")).head()[0]
    if fold_below is not None and hiwater is None:
        return 0, 0  # nothing below the cut — in-stream no-op
    if retain_min_batch is not None:
        df = df.filter(F.col("_batch") >= int(retain_min_batch))
    if sum_cols:
        # additive store (e.g. the LM count store): the fold MERGES
        # per-batch partial counts by summation — distinct() would
        # keep same-key rows with different counts side by side and
        # double-count on the consumer's re-aggregation
        group_keys = [c for c in keycols if c not in sum_cols]
        folded = (df.drop("_batch").groupBy(*group_keys)
                  .agg(*[F.sum(c).alias(c) for c in sum_cols])
                  .select(*keycols))
    else:
        folded = df.drop("_batch").distinct()
    compacted = (folded
                 .repartition(int(target_files))
                 .withColumn("_batch", F.lit(int(hiwater or 0)))
                 .persist())
    after = compacted.count()
    out = compacted
    if after == 0:
        # epoch-preserving sentinel (see docstring); schema copied from
        # the store with every key column NULL
        from pyspark.sql import types as T
        sch = T.StructType([T.StructField(f.name, f.dataType, True)
                            for f in full.schema.fields
                            if f.name != "_batch"])
        out = (spark.createDataFrame(
            [tuple([None] * len(sch.fields))], sch)
            .withColumn("_batch", F.lit(int(hiwater or 0))))
    if keep is not None:
        out = out.unionByName(keep)
    tmp, bak = _swap_paths(store_path)
    (out.write.mode("overwrite")
     .partitionBy("_batch").parquet(tmp))
    compacted.unpersist()
    jvm = spark._jvm
    fs, jsrc = _store_fs(spark, store_path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jbak = jvm.org.apache.hadoop.fs.Path(bak)
    _rename_or_raise(fs, jsrc, jbak)
    _rename_or_raise(fs, jtmp, jsrc)
    fs.delete(jbak, True)
    return before, after


def neardup_dedup_batch(
    new_docs: DataFrame,
    seen_buckets: DataFrame | None,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """One incremental near-dup step: ``(kept_docs, new_buckets)``.

    A new document is a near-duplicate iff ANY of its MinHash band
    buckets already exists in ``seen_buckets`` (the standard LSH
    candidate rule) OR collides with an earlier-id document of the
    same batch. Kept documents contribute their buckets to the store;
    duplicates contribute nothing (the canonical representative's
    buckets already cover the cluster — identical to what the batch
    ``minhash_lsh_candidates`` + components pipeline keeps).

    Deterministic: within a batch, bucket ownership goes to the MIN
    doc_id, so replaying the same batches always keeps the same docs —
    the property the incremental-equals-batch test pins.

    Scale shape: signatures are a projection; the dedup decision is one
    left-anti join per batch against the store keyed (band, bhash) —
    shuffle bounded by bands × batch plus matching store buckets; no
    driver state. The store itself is a plain DataFrame/table the
    caller persists (see :func:`stream_dedup_neardup`).
    """
    from cngi_prototype_spark.dedup.dedup import minhash_signatures

    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(new_docs, text, id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
    band_cols = [
        F.md5(F.concat_ws("|", *[
            F.col(f"mh{b * rows_per_band + r}")
            for r in range(rows_per_band)])).alias(f"band{b}")
        for b in range(bands)
    ]
    melted = (sigs.select(id_col, *band_cols)
              .select(id_col, F.explode(F.array(*[
                  F.struct(F.lit(b).alias("band"),
                           F.col(f"band{b}").alias("bhash"))
                  for b in range(bands)])).alias("bb"))
              .select(id_col, "bb.band", "bb.bhash"))
    # hit the persistent store
    if seen_buckets is not None:
        hits_store = (melted.join(seen_buckets.select("band", "bhash"),
                                  ["band", "bhash"], "left_semi")
                      .select(id_col).distinct())
    else:
        hits_store = melted.select(id_col).limit(0)
    # within-batch collisions: bucket owner = min doc_id; later ids
    # sharing a bucket are duplicates of it
    w_owner = (melted.groupBy("band", "bhash")
               .agg(F.min(id_col).alias("_owner")))
    hits_batch = (melted.join(w_owner, ["band", "bhash"])
                  .filter(F.col(id_col) > F.col("_owner"))
                  .select(id_col).distinct())
    dup_ids = hits_store.unionByName(hits_batch).distinct()
    kept = new_docs.join(dup_ids, id_col, "left_anti")
    new_buckets = (melted.join(dup_ids, id_col, "left_anti")
                   .select("band", "bhash").distinct())
    return kept, new_buckets


def stream_dedup_neardup(
    stream_df: DataFrame,
    kept_path: str,
    bucket_path: str,
    checkpoint: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    compact_every: int | None = None,
):
    """Streaming near-duplicate dedup — the live twin of the MinHash/
    LSH batch pipeline: kept documents append to ``kept_path`` and
    their band buckets to ``bucket_path`` (the persistent store each
    micro-batch consults).

    Shaped as ``foreachBatch`` + the :func:`neardup_dedup_batch` core
    rather than a chained-stateful-operator query on purpose: the
    doc-level keep decision needs ALL of a document's bucket lookups,
    and two same-batch near-dups can split bucket ownership under
    ``dropDuplicatesWithinWatermark``, dropping BOTH — the incremental
    join form is deterministic (min-id ownership) and provably equal
    to replaying the batches through the batch rule. Returns the
    unstarted writer; callers add ``.trigger(...)`` and ``.start()``.

    Run epochs: foreachBatch batch ids restart at 0 with every fresh
    checkpoint, so raw ids over a long-lived store would (a) dynamic-
    overwrite a PRIOR run's ``_batch=N`` partitions — silent data loss
    — and (b) hide prior buckets behind the ``_batch < batch_id``
    replay guard, re-admitting duplicates. Each run therefore pins a
    monotone base = (max existing ``_batch``) + 1, persisted ONCE
    under the run's own checkpoint dir (``_neardup_epoch``), and
    partitions at ``base + batch_id``: a same-checkpoint replay reuses
    the persisted base and overwrites only its own partition, while a
    fresh checkpoint starts past every prior run's partitions with all
    prior state visible. Store existence goes through the Hadoop FS of
    each path (object stores included), never the driver-local ``os``.

    ``compact_every=N`` folds the bucket store's committed partitions
    (``_batch < eb``) every N batches via
    ``compact_store(fold_below=eb)`` — results are invariant under the
    compaction schedule (property-tested for never / mid-run / every
    batch) because the fold preserves exactly the distinct keys the
    ``_batch < eb`` read would see.
    """
    epoch_path = checkpoint.rstrip("/") + "/_neardup_epoch"
    run_base: list[int] = []

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not run_base:
            run_base.append(_pin_run_base(spark, epoch_path,
                                          bucket_path, batch_id))
        eb = run_base[0] + batch_id
        if (compact_every and batch_id > 0
                and batch_id % compact_every == 0
                and _hadoop_exists(spark, bucket_path)):
            compact_store(spark, bucket_path, fold_below=eb)
        seen = None
        if _hadoop_exists(spark, bucket_path):
            seen = (spark.read.parquet(bucket_path)
                    .filter(F.col("_batch") < eb))
        kept, new_b = neardup_dedup_batch(
            batch_df, seen, text=text, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n)
        # exactly-once on foreachBatch REPLAYS: outputs land in a
        # _batch=<base+id> partition with dynamic overwrite, so
        # re-running a failed batch replaces its own partition instead
        # of appending twice; the store read above excludes the current
        # partition id for the same reason (a partial previous attempt
        # must not shadow its own rows as "seen")
        for df, path in ((kept, kept_path), (new_b, bucket_path)):
            (df.withColumn("_batch", F.lit(eb))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("_batch").parquet(path))

    return (stream_df.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(step))


def stream_dedup_spans(
    stream_df: DataFrame,
    out_path: str,
    gram_path: str,
    checkpoint: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    compact_every: int | None = None,
):
    """Streaming ExactSubstr duplicate-span removal — the live twin of
    ``dedup.remove_duplicate_spans`` (Lee et al. 2021): each
    micro-batch's documents are rebuilt with every token n-gram already
    seen (earlier batches, or earlier (doc, position) in the same
    batch) removed, and the batch's new fingerprints append to the
    persistent gram store. Keeper = first occurrence in
    (batch, doc_id, position) order, so with monotone doc ids the
    accumulated output equals the batch operator over the concatenated
    corpus (property-tested).

    Same exactly-once + run-epoch conventions as
    :func:`stream_dedup_neardup`: outputs land in
    ``_batch=<base+id>`` partitions with dynamic overwrite, the store
    read excludes the current partition, and a fresh checkpoint over a
    populated store starts past every prior run's partitions with all
    prior grams visible. Store size ∝ distinct grams ever seen × 16 B —
    the paper's suffix array re-expressed as a hash set; that floor is
    corpus-bound by the operator's semantics. :func:`compact_store`
    bounds the overhead above it (per-batch partition sprawl, replay
    duplicates) and offers a TTL retention window for genuinely
    bounded state; ``compact_every=N`` runs that fold in-stream every
    N batches over the committed prefix (``fold_below=eb``), with
    results invariant under the schedule (property-tested).
    """
    from cngi_prototype_spark.dedup.dedup import spans_dedup_batch

    epoch_path = checkpoint.rstrip("/") + "/_spans_epoch"
    run_base: list[int] = []

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not run_base:
            run_base.append(_pin_run_base(spark, epoch_path, gram_path,
                                          batch_id))
        eb = run_base[0] + batch_id
        if (compact_every and batch_id > 0
                and batch_id % compact_every == 0
                and _hadoop_exists(spark, gram_path)):
            compact_store(spark, gram_path, fold_below=eb)
        seen = None
        if _hadoop_exists(spark, gram_path):
            seen = (spark.read.parquet(gram_path)
                    .filter(F.col("_batch") < eb))
        rebuilt, new_g = spans_dedup_batch(
            batch_df, seen, text_col=text, id_col=id_col, n=n)
        for df, path in ((rebuilt, out_path), (new_g, gram_path)):
            (df.withColumn("_batch", F.lit(eb))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("_batch").parquet(path))

    return (stream_df.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(step))


def stream_bm25_postings(
    stream_df: DataFrame,
    postings_path: str,
    checkpoint: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    compact_every: int | None = None,
):
    """Incremental inverted-index maintenance — the live twin of
    ``text.retrieval.bm25_postings``: each micro-batch's documents
    tokenize into ``(term, doc_id, tf, dl)`` postings that append to
    the persistent store. Documents are append-only with unique ids
    across batches (the same monotone-ids convention as
    :func:`stream_dedup_spans`), so a document's postings never change
    after its batch: the accumulated store IS the batch index, and
    ``bm25_topk_from_store`` scores it with the exact batch plan —
    equal to ``bm25_topk`` over the concatenated corpus for any
    batching (property-tested).

    Same exactly-once + run-epoch conventions as the other incremental
    stores: outputs land in ``_batch=<base+id>`` partitions with
    dynamic overwrite (a replay replaces only its own partition), the
    run pins its epoch base past every prior run's partitions, and
    ``compact_every=N`` folds the committed prefix in-stream via
    :func:`compact_store` (postings rows are unique per (doc, term),
    so the fold's distinct() preserves them verbatim). Unlike the
    dedup stores, a batch never reads the store — index maintenance is
    embarrassingly incremental.
    """
    from cngi_prototype_spark.text.retrieval import bm25_postings

    epoch_path = checkpoint.rstrip("/") + "/_bm25_epoch"
    run_base: list[int] = []

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not run_base:
            run_base.append(_pin_run_base(spark, epoch_path,
                                          postings_path, batch_id))
        eb = run_base[0] + batch_id
        if (compact_every and batch_id > 0
                and batch_id % compact_every == 0
                and _hadoop_exists(spark, postings_path)):
            compact_store(spark, postings_path, fold_below=eb)
        post = bm25_postings(batch_df, text_col=text, id_col=id_col)
        (post.withColumn("_batch", F.lit(eb))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch").parquet(postings_path))

    return (stream_df.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(step))


def stream_ivf_cells(
    stream_df: DataFrame,
    cells_path: str,
    checkpoint: str,
    *,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
):
    """Incremental IVF vector-index maintenance — the embedding-side
    twin of :func:`stream_bm25_postings`: each micro-batch's vectors
    assign to their nearest trained coarse centroid (a pure projection,
    centroids broadcast in the plan) and the ``(cell, neighbor_id,
    cv)`` inverted-list rows append to the persistent store;
    ``similarity.ann.ivf_topk_from_store`` probes it with the exact
    batch plan (equal-to-batch property-tested). The FAISS operating
    convention applies: centroids train once on a representative
    sample and the index adds forever — retrain offline and rebuild
    when recall drifts (assignments are centroid-relative, so a new
    codebook means a new store).

    Same exactly-once + run-epoch + ``compact_every`` conventions as
    the other incremental stores; vectors are append-only with unique
    ids across batches."""
    from cngi_prototype_spark.similarity.ann import ivf_cells

    epoch_path = checkpoint.rstrip("/") + "/_ivf_epoch"
    run_base: list[int] = []

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not run_base:
            run_base.append(_pin_run_base(spark, epoch_path,
                                          cells_path, batch_id))
        eb = run_base[0] + batch_id
        if (compact_every and batch_id > 0
                and batch_id % compact_every == 0
                and _hadoop_exists(spark, cells_path)):
            compact_store(spark, cells_path, fold_below=eb)
        cells = ivf_cells(batch_df, centroids, id_col=id_col,
                          vec_col=vec_col)
        (cells.withColumn("_batch", F.lit(eb))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch").parquet(cells_path))

    return (stream_df.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(step))


def stream_lm_counts(
    stream_df: DataFrame,
    counts_path: str,
    checkpoint: str,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    compact_every: int | None = None,
):
    """Incremental LM training — the live twin of
    ``text.lm.lm_counts``: each micro-batch's unigram/bigram counts
    append to the persistent store as per-batch partials. Counts are
    ADDITIVE over disjoint slices, so the accumulated store re-sums to
    the whole-corpus counts and
    ``lm_doc_logprob_from_store`` scores bit-identically to the batch
    operator trained on the concatenated corpus (property-tested).
    This is the third incremental-store flavor: dedup stores fold by
    ``distinct()``, index stores append immutable rows, count stores
    MERGE — ``compact_every`` therefore folds with
    ``compact_store(sum_cols=['c'])``.

    Same exactly-once + run-epoch conventions as the other stores.
    Unlike the index stores, rows here are per-batch PARTIALS, not
    facts — consumers must re-aggregate (the from_store reader does)."""
    from cngi_prototype_spark.text.lm import lm_counts

    epoch_path = checkpoint.rstrip("/") + "/_lm_epoch"
    run_base: list[int] = []

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not run_base:
            run_base.append(_pin_run_base(spark, epoch_path,
                                          counts_path, batch_id))
        eb = run_base[0] + batch_id
        if (compact_every and batch_id > 0
                and batch_id % compact_every == 0
                and _hadoop_exists(spark, counts_path)):
            compact_store(spark, counts_path, fold_below=eb,
                          sum_cols=["c"])
        counts = lm_counts(batch_df, text_col=text, id_col=id_col)
        (counts.withColumn("_batch", F.lit(eb))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch").parquet(counts_path))

    return (stream_df.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(step))


def stream_nb_counts(
    stream_df: DataFrame,
    counts_path: str,
    checkpoint: str,
    *,
    label_col: str = "lang",
    text: str = "text",
    compact_every: int | None = None,
):
    """Incremental Naive Bayes training — the live twin of
    ``text.classifier.nb_counts``: each micro-batch's class-conditional
    token counts (plus NULL-token per-class document counts, the prior
    numerators) append to the persistent store as per-batch partials.
    Counts are ADDITIVE over disjoint slices, so the accumulated store
    re-sums to the whole-corpus model and ``nb_classify_from_store``
    scores bit-identically to the batch operator trained on the
    concatenated corpus (property-tested). A count store like the LM
    store: ``compact_every`` folds with
    ``compact_store(sum_cols=['c'])``; rows are per-batch PARTIALS,
    consumers must re-aggregate (the from_store reader does)."""
    from cngi_prototype_spark.text.classifier import nb_counts

    epoch_path = checkpoint.rstrip("/") + "/_nb_epoch"
    run_base: list[int] = []

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not run_base:
            run_base.append(_pin_run_base(spark, epoch_path,
                                          counts_path, batch_id))
        eb = run_base[0] + batch_id
        if (compact_every and batch_id > 0
                and batch_id % compact_every == 0
                and _hadoop_exists(spark, counts_path)):
            compact_store(spark, counts_path, fold_below=eb,
                          sum_cols=["c"])
        counts = nb_counts(batch_df, label_col=label_col,
                           text_col=text)
        (counts.withColumn("_batch", F.lit(eb))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch").parquet(counts_path))

    return (stream_df.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(step))


# --------------------------------------------------------------------------
# incremental sequence packing (training-set assembly over live ingest)


def stream_pack_sequences(
    stream_df: DataFrame,
    out_path: str,
    offset_path: str,
    checkpoint: str,
    seq_len: int,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    eod_tokens: int = 1,
):
    """Streaming twin of ``text.training.pack_sequences``: documents
    arriving in micro-batches are appended to the SAME virtual token
    stream, so sequence ids continue across batches exactly as if the
    whole corpus had been packed at once (equal-to-batch property,
    provided arrival order is the packing order — streaming packs in
    ARRIVAL order, the natural semantics for an ingest pipeline).

    The only cross-batch state is the stream's token offset — one
    number, persisted as a tiny one-row parquet keyed by batch id (the
    exactly-once convention of :func:`stream_dedup_neardup`: a replay
    overwrites its own ``_batch`` partition and re-reads the offset as
    of the PREVIOUS batch). Within a batch the cumsum runs the same
    distributed bucket-offset scheme as the batch operator — the driver
    never sees per-document work.
    """
    from pyspark.sql import functions as _F

    from cngi_prototype_spark.text.training import pack_sequences

    def step(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = 0
        # Hadoop-FS existence like the other stores (the offset store
        # lives next to the output on the real sink's filesystem — a
        # driver-local os.path probe is wrong on object stores)
        if _hadoop_exists(spark, offset_path):
            prev = (spark.read.parquet(offset_path)
                    .filter(_F.col("_batch") < batch_id)
                    .agg(_F.max_by("offset", "_batch")).collect()[0][0])
            base = int(prev) if prev is not None else 0
        placed = pack_sequences(batch_df, seq_len, text_col=text,
                                id_col=id_col, eod_tokens=eod_tokens)
        # shift this batch's placements by the stream offset. seq ids
        # are NOT simply shifted (the offset is in tokens, not
        # sequences): re-derive them from the absolute token position.
        start_abs = (_F.col("seq_id") * seq_len + _F.col("seq_offset")
                     - _F.col("tok_start") + _F.lit(base))
        # every placement row of a doc reconstructs the SAME absolute
        # start; collapse to one row per doc before re-exploding over
        # the shifted span (else multi-sequence docs duplicate)
        shifted = (placed
                   .select(id_col, "n_tokens", start_abs.alias("_s"))
                   .dropDuplicates([id_col])
                   .select(
                       id_col, "n_tokens", "_s",
                       _F.explode(_F.sequence(
                           _F.floor(_F.col("_s") / seq_len).cast("long"),
                           _F.floor((_F.col("_s") + _F.col("n_tokens")
                                     - 1) / seq_len).cast("long")))
                       .alias("seq_id")))
        out = shifted.select(
            id_col, "seq_id",
            _F.greatest(_F.lit(0), (_F.col("seq_id") * seq_len
                                    - _F.col("_s")).cast("int"))
            .alias("tok_start"),
            _F.least(_F.col("n_tokens"),
                     ((_F.col("seq_id") + 1) * seq_len - _F.col("_s"))
                     .cast("int")).alias("tok_end"),
            _F.greatest(_F.lit(0), (_F.col("_s") - _F.col("seq_id")
                                    * seq_len).cast("int"))
            .alias("seq_offset"),
            "n_tokens")
        (out.withColumn("_batch", _F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch").parquet(out_path))
        # advance the stream offset by this batch's total stride —
        # computed with the SAME _n_tokens helper pack_sequences uses
        # (an inline re-tokenization here could silently drift from
        # the placements and corrupt every later batch's sequence ids)
        from cngi_prototype_spark.text.training import _n_tokens
        total = (batch_df.select(
            _F.sum(_n_tokens(_F.col(text)) + _F.lit(int(eod_tokens)))
            .alias("n")).collect()[0]["n"]) or 0
        (spark.createDataFrame([(int(base + total),)], "offset long")
         .withColumn("_batch", _F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch").parquet(offset_path))

    return (stream_df.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(step))
