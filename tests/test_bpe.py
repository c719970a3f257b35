"""BPE trainer/encoder vs a straightforward in-test reference
implementation (the Sennrich et al. algorithm over a word-count dict)."""

import collections

import pytest

from cngi_prototype_spark.text.bpe import apply_bpe, train_bpe_merges

CORPUS = ["low low low lower lower lowest",
          "new newer newest new new",
          "wider wide wide"]


def _ref_bpe(word_counts, n_merges, min_pair_count=2):
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # count desc, pair asc — the trainer's tie-break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _ref_encode(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])


def test_train_matches_reference_algorithm(spark, docs):
    counts = collections.Counter(
        w for t in CORPUS for w in t.split())
    want = _ref_bpe(counts, 8)
    got = train_bpe_merges(docs, 8)
    assert got == want
    assert len(got) == 8
    # the classic corpus learns "low" and "ne" early
    joined = ["".join(p) for p in got]
    assert "lo" in joined or "ow" in joined


def test_train_early_stop(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    # every pair occurs once -> below min_pair_count=2 -> no merges
    assert train_bpe_merges(df, 5) == []


def test_apply_bpe_matches_reference_encoder(spark, docs):
    merges = train_bpe_merges(docs, 6)
    out = apply_bpe(docs, merges).collect()
    assert out  # every word encodes
    for r in out:
        assert r.bpe_tokens == _ref_encode(r.word, merges)
        assert "".join(r.bpe_tokens) == r.word
    # positions cover the corpus exactly
    n_words = sum(len(t.split()) for t in CORPUS)
    assert len(out) == n_words


def test_distributed_loop_matches_local(spark, docs):
    """Force the DataFrame merge loop (driver_max_vocab=0) — it must
    produce the identical merges as the local/default path."""
    local = train_bpe_merges(docs, 8)
    dist = train_bpe_merges(docs, 8, driver_max_vocab=0)
    assert local == dist


def _seq_encode(word, merges):
    """Sequential-in-rank-order reference (the nested-replace twin's
    semantics): each merge applied everywhere, left to right."""
    syms = list(word)
    for a, b in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_gate_merges_sequential_equals_lowest_rank_first(spark):
    """The bpe_tokenize value gate rests on this equivalence: for the
    WELL-FORMED fixed merge list, apply_bpe's lowest-rank-first loop
    equals the sequential replace the DuckDB twin computes — checked
    over adversarial words (cascades, triples, overlaps) and random
    strings from the merge alphabet."""
    import random

    from cngi_prototype_spark.text.bpe import (
        BPE_GATE_MERGES, _check_well_formed)

    _check_well_formed(BPE_GATE_MERGES)
    rng = random.Random(11)
    words = ["ther", "anther", "thethe", "ingesting", "andand",
             "ononon", "restorestores", "atat", "thither", "ou"]
    words += ["".join(rng.choice("theinandorsgu")
                      for _ in range(rng.randint(1, 14)))
              for _ in range(300)]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)],
                               ["doc_id", "text"])
    got = {r.word: r.bpe_tokens
           for r in apply_bpe(df, BPE_GATE_MERGES).collect()}
    for w in set(words):
        assert got[w] == _seq_encode(w, BPE_GATE_MERGES), w
