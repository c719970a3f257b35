"""Incremental IVF index maintenance: the accumulated inverted-list
store probes identically to the batch ivf_topk over the concatenated
corpus, for any batching and invariant under compaction."""

from __future__ import annotations

import os

import pytest

from cngi_prototype_spark.similarity.ann import ivf_topk, ivf_topk_from_store
from cngi_prototype_spark.streaming.stream_ops import (
    compact_store,
    stream_ivf_cells,
)

CENTROIDS = [[1.0, 0.0, 0.0, 0.0],
             [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 1.0]]

VECS = [
    (0, [0.9, 0.1, 0.0, 0.1]), (1, [0.8, 0.3, 0.1, 0.0]),
    (2, [0.1, 0.9, 0.2, 0.0]), (3, [0.0, 1.1, 0.1, 0.1]),
    (4, [0.1, 0.0, 0.9, 0.8]), (5, [0.2, 0.1, 1.0, 1.1]),
    (6, [0.5, 0.5, 0.1, 0.0]), (7, [0.4, 0.1, 0.5, 0.6]),
    (8, [1.0, 0.0, 0.1, 0.2]), (9, [0.0, 0.2, 0.8, 0.9]),
]
QUERIES = [(100, [1.0, 0.1, 0.0, 0.0]), (101, [0.1, 0.1, 1.0, 1.0]),
           (102, [0.3, 0.9, 0.1, 0.0])]
SCHEMA = "vec_id long, embedding array<double>"


def _q_df(spark):
    return spark.createDataFrame(QUERIES, SCHEMA)


def _batch_answer(spark):
    corpus = spark.createDataFrame(VECS, SCHEMA)
    return {(r.query_id, r.neighbor_id): (r.rank, r.cos_sim)
            for r in ivf_topk(corpus, _q_df(spark), CENTROIDS,
                              k=4, nprobe=2).collect()}


def _run_batches(spark, tmp, batches, *, compact_every=None):
    os.makedirs(f"{tmp}/in", exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(f"{tmp}/in")
        q = stream_ivf_cells(
            spark.readStream.schema(SCHEMA).parquet(f"{tmp}/in"),
            f"{tmp}/cells", f"{tmp}/ck", centroids=CENTROIDS,
            compact_every=compact_every,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)


def _store_answer(spark, tmp):
    return {(r.query_id, r.neighbor_id): (r.rank, r.cos_sim)
            for r in ivf_topk_from_store(
                spark, f"{tmp}/cells", _q_df(spark), CENTROIDS,
                k=4, nprobe=2).collect()}


@pytest.mark.parametrize("splits", [[4, 6], [2, 3, 3, 2], [10]])
def test_incremental_equals_batch(spark, tmp_path, splits):
    assert sum(splits) == len(VECS)
    batches, i = [], 0
    for s in splits:
        batches.append(VECS[i:i + s])
        i += s
    _run_batches(spark, str(tmp_path), batches)
    assert _store_answer(spark, str(tmp_path)) == _batch_answer(spark)


@pytest.mark.parametrize("compact_every", [2, 1])
def test_compaction_schedule_invariance(spark, tmp_path, compact_every):
    _run_batches(spark, str(tmp_path), [VECS[:3], VECS[3:6], VECS[6:]],
                 compact_every=compact_every)
    assert _store_answer(spark, str(tmp_path)) == _batch_answer(spark)


def test_offline_compaction_preserves_results(spark, tmp_path):
    _run_batches(spark, str(tmp_path), [VECS[:5], VECS[5:]])
    before = spark.read.parquet(f"{tmp_path}/cells")
    n_keys = before.drop("_batch").distinct().count()
    _, after = compact_store(spark, f"{tmp_path}/cells", target_files=2)
    assert after == n_keys == len(VECS)
    assert _store_answer(spark, str(tmp_path)) == _batch_answer(spark)
