"""Sequence packing + mixture sampling (training-set assembly)."""

import numpy as np
import pytest

from cngi_prototype_spark.text.training import (
    mixture_fractions,
    pack_sequences,
    stratified_sample,
)

DOCS = [
    (0, "a b c d e"),          # 5 tokens
    (1, ""),                   # empty: advances stream by eod only
    (2, "f g"),                # 2
    (5, "h i j k l m n o p"),  # 9 (spans sequences at L=4)
    (9, "q"),                  # 1
]


def _ref_pack(docs, L, eod=1):
    """Pure-python reference packer."""
    out, pos = [], 0
    for did, text in sorted(docs):
        n = len([t for t in text.strip().lower().split() if t])
        if n:
            s0, s1 = pos // L, (pos + n - 1) // L
            for s in range(s0, s1 + 1):
                out.append((did, s, max(0, s * L - pos),
                            min(n, (s + 1) * L - pos),
                            max(0, pos - s * L), n))
        pos += n + eod
    return sorted(out)


@pytest.mark.parametrize("L,eod", [(4, 1), (7, 0), (3, 2)])
def test_pack_sequences_matches_reference(spark, L, eod):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(map(tuple, pack_sequences(
        df, L, eod_tokens=eod).collect()))
    assert got == _ref_pack(DOCS, L, eod)


def test_pack_sequences_bucket_count_invariant(spark):
    """The distributed bucket-offset cumsum must give identical
    placements for any bucket count (1 bucket = the naive single
    window)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = sorted(map(tuple, pack_sequences(df, 4, n_buckets=1).collect()))
    b = sorted(map(tuple, pack_sequences(df, 4, n_buckets=3).collect()))
    c = sorted(map(tuple, pack_sequences(df, 4,
                                         n_buckets=1024).collect()))
    assert a == b == c == _ref_pack(DOCS, 4)


def test_pack_sequences_coverage_invariants(spark):
    """Every token of every non-empty doc is placed exactly once, and
    no sequence is over-filled."""
    rng = np.random.default_rng(3)
    docs = [(i * 3, " ".join("tok%d" % k
                             for k in range(rng.integers(0, 30))))
            for i in range(50)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    L = 16
    rows = pack_sequences(df, L).collect()
    per_doc = {}
    per_seq = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.tok_start, r.tok_end))
        per_seq.setdefault(r.seq_id, 0)
        per_seq[r.seq_id] += r.tok_end - r.tok_start
        assert 0 <= r.seq_offset < L
        assert 0 <= r.tok_start < r.tok_end <= r.n_tokens
    for did, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0  # contiguous, no gap/overlap
        n = len([t for t in dict(docs)[did].split() if t])
        assert spans[-1][1] == n
    assert all(v <= L for v in per_seq.values())
    # all sequences except the last are fully used (tokens + eod gaps)
    assert max(per_seq) * L < sum(
        len([t for t in txt.split() if t]) + 1 for _, txt in docs)


def test_pack_sequences_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(df, 8).count() == 0
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, 0)


def test_mixture_fractions_temperature():
    counts = {"en": 900, "fr": 90, "sw": 10}
    nat = mixture_fractions(counts, temperature=1.0)
    assert all(abs(f - 1.0) < 1e-12 for f in nat.values())  # T=1 = keep
    flat = mixture_fractions(counts, temperature=1e9,
                             target_total=300)
    # near-uniform target: ~100 rows per stratum; sw saturates at 1.0
    assert flat["sw"] == 1.0
    assert 0.10 < flat["en"] < 0.13 and 0.9 < flat["fr"] <= 1.0
    up = mixture_fractions(counts, temperature=2.0)
    assert up["sw"] > nat["sw"] - 1e-12  # low-resource boosted or capped
    with pytest.raises(ValueError):
        mixture_fractions(counts, temperature=0)


def test_stratified_sample_deterministic_and_proportional(spark):
    rows = [(i, "t", ["en", "fr"][i % 2], "s") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    frac = {"en": 0.5, "fr": 0.1}
    a = stratified_sample(df, frac, seed=7).toPandas()
    b = stratified_sample(df, frac, seed=7).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # reproducible
    n_en = (a.lang == "en").sum()
    n_fr = (a.lang == "fr").sum()
    assert abs(n_en - 1000) < 120 and abs(n_fr - 200) < 70
    # different seed -> different (but same-sized-ish) sample
    c = stratified_sample(df, frac, seed=8).toPandas()
    assert sorted(c.doc_id) != sorted(a.doc_id)
    # unknown stratum drops by default
    d = stratified_sample(df.withColumn("lang", df.lang), {"xx": 1.0})
    assert d.count() == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000),
                  st.lists(st.sampled_from(["tok", "a", "bb", "ccc"]),
                           max_size=12).map(" ".join)),
        min_size=1, max_size=25, unique_by=lambda d: d[0]),
    L=st.integers(1, 9),
    eod=st.integers(0, 3),
)
def test_pack_sequences_property_matches_reference(spark, docs, L, eod):
    """Property form of the reference-packer check: any id set
    (sparse, unordered), any seq_len/eod, docs of any token count
    including empty."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple,
                     pack_sequences(df, L, eod_tokens=eod,
                                    n_buckets=3).collect()))
    assert got == _ref_pack(docs, L, eod)
