"""Incremental BM25 index maintenance: the accumulated postings store
scores identically to the batch operator over the concatenated corpus,
for any batching, across fresh-checkpoint runs, and invariant under
the in-stream compaction schedule."""

from __future__ import annotations

import os

import pytest

from cngi_prototype_spark.streaming.stream_ops import (
    compact_store,
    stream_bm25_postings,
)
from cngi_prototype_spark.text.retrieval import bm25_topk, bm25_topk_from_store

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox"),
    (2, "lorem ipsum dolor sit amet"),
    (3, "quick quick quick brown"),
    (4, "a dog and another dog chase the fox"),
    (5, "entirely unrelated text about spark plans"),
    (6, "fox dens and dog houses dot the field"),
    (7, "more filler words to pad the corpus"),
]
QUERIES = [(0, "quick fox"), (1, "lazy dog"), (2, "field corpus")]
SCHEMA = "doc_id long, text string"


def _batch_answer(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    return {(r.query_id, r.doc_id): (r.rank, r.score_q)
            for r in bm25_topk(docs, QUERIES, top_n=10,
                               quantize=True).collect()}


def _run_batches(spark, tmp, batches, *, compact_every=None):
    os.makedirs(f"{tmp}/in", exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(f"{tmp}/in")
        q = stream_bm25_postings(
            spark.readStream.schema(SCHEMA).parquet(f"{tmp}/in"),
            f"{tmp}/post", f"{tmp}/ck", compact_every=compact_every,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)


@pytest.mark.parametrize("splits", [
    [3, 5],          # two uneven batches
    [1, 2, 3, 2],    # four batches
    [8],             # everything at once
])
def test_incremental_equals_batch(spark, tmp_path, splits):
    assert sum(splits) == len(DOCS)
    batches, i = [], 0
    for s in splits:
        batches.append(DOCS[i:i + s])
        i += s
    _run_batches(spark, str(tmp_path), batches)
    got = {(r.query_id, r.doc_id): (r.rank, r.score_q)
           for r in bm25_topk_from_store(
               spark, f"{tmp_path}/post", QUERIES, top_n=10,
               quantize=True).collect()}
    assert got == _batch_answer(spark)


def test_fresh_checkpoint_run_extends_store(spark, tmp_path):
    # run 1 (docs 0-4) on its own checkpoint, run 2 (docs 5-7) on a
    # FRESH checkpoint and input dir: the epoch pin must place run 2
    # past run 1's partitions, and the union store must still equal
    # the batch answer
    _run_batches(spark, str(tmp_path), [DOCS[:5]])
    spark.createDataFrame(DOCS[5:], SCHEMA).coalesce(1).write.mode(
        "append").parquet(f"{tmp_path}/in2")
    q = stream_bm25_postings(
        spark.readStream.schema(SCHEMA).parquet(f"{tmp_path}/in2"),
        f"{tmp_path}/post", f"{tmp_path}/ck_fresh",
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    post = spark.read.parquet(f"{tmp_path}/post")
    assert post.select("_batch").distinct().count() == 2
    got = {(r.query_id, r.doc_id): (r.rank, r.score_q)
           for r in bm25_topk_from_store(
               spark, f"{tmp_path}/post", QUERIES, top_n=10,
               quantize=True).collect()}
    assert got == _batch_answer(spark)


@pytest.mark.parametrize("compact_every", [None, 2, 1])
def test_compaction_schedule_invariance(spark, tmp_path, compact_every):
    batches = [DOCS[:2], DOCS[2:4], DOCS[4:6], DOCS[6:]]
    _run_batches(spark, str(tmp_path), batches,
                 compact_every=compact_every)
    got = {(r.query_id, r.doc_id): (r.rank, r.score_q)
           for r in bm25_topk_from_store(
               spark, f"{tmp_path}/post", QUERIES, top_n=10,
               quantize=True).collect()}
    assert got == _batch_answer(spark)


def test_hybrid_serving_from_store_equals_batch(spark, tmp_path):
    """The live-serving composition: hybrid retrieval with the lexical
    shortlist drawn from the incrementally built postings store equals
    the batch hybrid over the concatenated corpus."""
    from cngi_prototype_spark.similarity.hybrid import (
        hybrid_search,
        hybrid_search_from_stores,
    )

    _run_batches(spark, str(tmp_path), [DOCS[:3], DOCS[3:6], DOCS[6:]])
    emb = spark.createDataFrame(
        [(d, [1.0 + d, 0.5 * d, 1.0]) for d, _ in DOCS],
        "vec_id long, embedding array<double>")
    qv = spark.createDataFrame(
        [(0, [1.0, 0.2, 0.3]), (1, [0.1, 1.0, 0.5]), (2, [0.4, 0.4, 1.0])],
        "query_id long, embedding array<double>")
    docs = spark.createDataFrame(DOCS, SCHEMA)
    want = {(r.query_id, r.doc_id): (r.rank, r.hybrid_score)
            for r in hybrid_search(docs, emb, QUERIES, qv,
                                   bm25_n=10, k=5).collect()}
    got = {(r.query_id, r.doc_id): (r.rank, r.hybrid_score)
           for r in hybrid_search_from_stores(
               spark, f"{tmp_path}/post", emb, QUERIES, qv,
               bm25_n=10, k=5).collect()}
    assert got == want


def test_rrf_serving_from_store_equals_batch(spark, tmp_path):
    """Store-served RRF equals batch RRF over the concatenated corpus:
    same shortlist, same integer ranks, same exact-rational fusion."""
    from cngi_prototype_spark.similarity.hybrid import (
        rrf_search,
        rrf_search_from_stores,
    )

    _run_batches(spark, str(tmp_path), [DOCS[:3], DOCS[3:6], DOCS[6:]])
    emb = spark.createDataFrame(
        [(d, [1.0 + d, 0.5 * d, 1.0]) for d, _ in DOCS],
        "vec_id long, embedding array<double>")
    qv = spark.createDataFrame(
        [(0, [1.0, 0.2, 0.3]), (1, [0.1, 1.0, 0.5]), (2, [0.4, 0.4, 1.0])],
        "query_id long, embedding array<double>")
    docs = spark.createDataFrame(DOCS, SCHEMA)
    want = {(r.query_id, r.doc_id):
            (r.lex_rank, r.vec_rank, r.rrf_score, r.rank)
            for r in rrf_search(docs, emb, QUERIES, qv,
                                bm25_n=10, k=5).collect()}
    got = {(r.query_id, r.doc_id):
           (r.lex_rank, r.vec_rank, r.rrf_score, r.rank)
           for r in rrf_search_from_stores(
               spark, f"{tmp_path}/post", emb, QUERIES, qv,
               bm25_n=10, k=5).collect()}
    assert got == want


def test_offline_compaction_preserves_scores(spark, tmp_path):
    _run_batches(spark, str(tmp_path), [DOCS[:4], DOCS[4:]])
    before = spark.read.parquet(f"{tmp_path}/post")
    n_keys = before.drop("_batch").distinct().count()
    _, after = compact_store(spark, f"{tmp_path}/post", target_files=2)
    assert after == n_keys
    got = {(r.query_id, r.doc_id): (r.rank, r.score_q)
           for r in bm25_topk_from_store(
               spark, f"{tmp_path}/post", QUERIES, top_n=10,
               quantize=True).collect()}
    assert got == _batch_answer(spark)
