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
