"""Incremental LM count maintenance: the accumulated additive count
store scores identically to the batch operator trained on the
concatenated corpus, for any batching and invariant under sum-merge
compaction (the distinct()-fold would double-count — tested)."""

from __future__ import annotations

import os

import pytest

from cngi_prototype_spark.streaming.stream_ops import (
    compact_store,
    stream_lm_counts,
)
from cngi_prototype_spark.text.lm import (
    lm_doc_logprob,
    lm_doc_logprob_from_store,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran fast"),
    (2, "a dog sat on a log"),
    (3, "the dog and the cat"),
    (4, "entirely different words appear here"),
    (5, "the mat sat still"),
]
SCHEMA = "doc_id long, text string"


def _batch_answer(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    return {r.doc_id: (r.n_tokens, r.logprob_q, r.n_unseen)
            for r in lm_doc_logprob(docs, quantize=True).collect()}


def _store_answer(spark, tmp):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    return {r.doc_id: (r.n_tokens, r.logprob_q, r.n_unseen)
            for r in lm_doc_logprob_from_store(
                spark, f"{tmp}/counts", docs, quantize=True).collect()}


def _run_batches(spark, tmp, batches, *, compact_every=None):
    os.makedirs(f"{tmp}/in", exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(f"{tmp}/in")
        q = stream_lm_counts(
            spark.readStream.schema(SCHEMA).parquet(f"{tmp}/in"),
            f"{tmp}/counts", f"{tmp}/ck", compact_every=compact_every,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)


@pytest.mark.parametrize("splits", [[2, 4], [1, 2, 2, 1], [6]])
def test_incremental_equals_batch(spark, tmp_path, splits):
    assert sum(splits) == len(DOCS)
    batches, i = [], 0
    for s in splits:
        batches.append(DOCS[i:i + s])
        i += s
    _run_batches(spark, str(tmp_path), batches)
    assert _store_answer(spark, str(tmp_path)) == _batch_answer(spark)


@pytest.mark.parametrize("compact_every", [2, 1])
def test_compaction_schedule_invariance(spark, tmp_path, compact_every):
    _run_batches(spark, str(tmp_path), [DOCS[:2], DOCS[2:4], DOCS[4:]],
                 compact_every=compact_every)
    assert _store_answer(spark, str(tmp_path)) == _batch_answer(spark)


def test_offline_sum_merge_compaction(spark, tmp_path):
    _run_batches(spark, str(tmp_path), [DOCS[:3], DOCS[3:]])
    store = f"{tmp_path}/counts"
    pre = spark.read.parquet(store)
    # same (prev, w) keys exist in both batch partitions — the very
    # case where a distinct() fold would be WRONG
    dup_keys = (pre.groupBy("prev", "w").count()
                .filter("count > 1").count())
    assert dup_keys > 0
    compact_store(spark, store, sum_cols=["c"], target_files=2)
    post = spark.read.parquet(store)
    assert post.select("_batch").distinct().count() == 1
    assert (post.groupBy("prev", "w").count()
            .filter("count > 1").count()) == 0
    assert _store_answer(spark, str(tmp_path)) == _batch_answer(spark)


def test_distinct_fold_would_double_count(spark, tmp_path):
    """Negative control: folding the additive store WITHOUT sum_cols
    (the dedup stores' distinct()) changes the answer — documents why
    compact_store grew the sum-merge mode."""
    _run_batches(spark, str(tmp_path), [DOCS[:3], DOCS[3:]])
    compact_store(spark, f"{tmp_path}/counts", target_files=2)
    assert _store_answer(spark, str(tmp_path)) != _batch_answer(spark)
