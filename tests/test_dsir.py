"""DSIR importance resampling: weight parity vs a pure-Python
reference (including the md5 bucket hash), target-affinity sanity,
and Gumbel-top-k selection determinism / weight-respecting limits."""

from __future__ import annotations

import hashlib
import math

import pytest

from cngi_prototype_spark.text.dsir import dsir_resample, dsir_weights

RAW = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry banana date"),
    (2, "apple apple apple apple"),
    (3, "totally different tokens here"),
    (4, "date cherry apple banana"),
    (5, "x"),
]
TGT = [
    (100, "apple banana apple"),
    (101, "apple cherry apple banana"),
]
SCHEMA = "doc_id long, text string"
B = 64  # small bucket count so collisions are exercised


def _md5num(s: str) -> int:
    acc = 0
    for ch in hashlib.md5(s.encode()).hexdigest()[:10]:
        acc = acc * 16 + int(ch, 16)
    return acc


def _feats(text: str) -> list[int]:
    ws = text.lower().strip().split() or [""]
    fs = list(ws) + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [_md5num(f) % B for f in fs]


def _ref_weights(raw, tgt):
    c_r: dict[int, int] = {}
    c_t: dict[int, int] = {}
    for _, t in raw:
        for b in _feats(t):
            c_r[b] = c_r.get(b, 0) + 1
    for _, t in tgt:
        for b in _feats(t):
            c_t[b] = c_t.get(b, 0) + 1
    n_r, n_t = sum(c_r.values()), sum(c_t.values())
    out = {}
    for d, t in raw:
        fs = _feats(t)
        s = sum(math.log((c_t.get(b, 0) + 1) / (n_t + B))
                - math.log((c_r.get(b, 0) + 1) / (n_r + B)) for b in fs)
        out[d] = (len(fs), s)
    return out


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, SCHEMA)


@pytest.fixture(scope="module")
def tgt_df(spark):
    return spark.createDataFrame(TGT, SCHEMA)


def test_weights_match_reference(spark, raw_df, tgt_df):
    want = _ref_weights(RAW, TGT)
    got = {r.doc_id: (r.n_features, r.logw)
           for r in dsir_weights(raw_df, tgt_df, buckets=B).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], rel=1e-9, abs=1e-9)


def test_quantized_tier_agrees(spark, raw_df, tgt_df):
    exact = {r.doc_id: r.logw
             for r in dsir_weights(raw_df, tgt_df, buckets=B).collect()}
    quant = {r.doc_id: r.logw_q
             for r in dsir_weights(raw_df, tgt_df, buckets=B,
                                   quantize=True).collect()}
    for d, s in exact.items():
        assert abs(quant[d] / 1e9 - s) < 1e-6


def test_target_affinity(spark, raw_df, tgt_df):
    """A doc whose unigrams AND bigrams all occur in the target must
    outweigh one made of tokens the target never uses. (Note doc 2,
    "apple apple...", scores LOW despite target-vocabulary unigrams:
    its "apple apple" bigram is raw-common but target-absent — the
    ratio estimator working as designed.)"""
    w = {r.doc_id: r.logw / r.n_features
         for r in dsir_weights(raw_df, tgt_df, buckets=B).collect()}
    assert w[0] > w[3]  # target-phrased doc vs target-absent vocab
    assert w[0] > w[2]  # ...and vs the degenerate repeated-token doc


def test_resample_deterministic(spark, raw_df, tgt_df):
    a = dsir_resample(raw_df, tgt_df, 3, seed=7, buckets=B).collect()
    b = dsir_resample(raw_df, tgt_df, 3, seed=7, buckets=B).collect()
    assert [(r.doc_id, r.rank) for r in a] == [(r.doc_id, r.rank)
                                               for r in b]
    assert sorted(r.rank for r in a) == [1, 2, 3]
    keys = [r.gumbel_key for r in sorted(a, key=lambda r: r.rank)]
    assert keys == sorted(keys, reverse=True)


def test_resample_seed_varies_selection(spark, raw_df, tgt_df):
    sets = {tuple(sorted(r.doc_id for r in
                         dsir_resample(raw_df, tgt_df, 3, seed=s,
                                       buckets=B).collect()))
            for s in range(6)}
    assert len(sets) > 1  # the draw actually depends on the seed


def test_low_temperature_is_argmax(spark, raw_df, tgt_df):
    """As temperature → 0 the Gumbel noise is dominated and the
    selection must equal the deterministic top-k by weight."""
    w = {r.doc_id: r.logw_q for r in
         dsir_weights(raw_df, tgt_df, buckets=B, quantize=True).collect()}
    want = set(sorted(w, key=lambda d: (-w[d], d))[:3])
    got = {r.doc_id for r in
           dsir_resample(raw_df, tgt_df, 3, seed=3, buckets=B,
                         temperature=1e-9).collect()}
    assert got == want


def test_resample_plan_is_take_ordered(spark, raw_df, tgt_df):
    """The top-k must plan as TakeOrderedAndProject (partial top-k +
    k-row merge), never a corpus-wide single-partition sort window."""
    plan = dsir_resample(raw_df, tgt_df, 3, seed=1, buckets=B) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
