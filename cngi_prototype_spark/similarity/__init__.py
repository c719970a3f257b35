"""Similarity search over embedding columns."""

from cngi_prototype_spark.similarity.ann import (  # noqa: F401
    brute_force_topk,
    cosine_pairs,
    lsh_topk,
)
