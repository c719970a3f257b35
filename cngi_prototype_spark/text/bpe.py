"""Byte-pair-encoding tokenizer training + encoding, corpus-scale.

The counting pass under BPE training (Sennrich et al. 2016,
arXiv:1508.07909) aggregates the corpus to a word-frequency vocabulary
first — the classic construction. The Spark shape keeps that split:

- **train_bpe_merges**: ONE corpus pass builds the (word, count)
  vocabulary (groupBy with map-side combine — the token_frequencies
  shuffle bound); every merge iteration then works on the VOCABULARY
  DataFrame only: explode adjacent symbol pairs weighted by word count,
  one partial/final aggregation, collect exactly the top pair
  (count desc, pair asc tie-break), and rewrite the symbol arrays with
  a pure-Catalyst left-to-right fold. Per-iteration cost scales with
  distinct words, never the corpus; lineage is checkpoint-truncated
  per merge (the fold nests otherwise).
- **apply_bpe**: encodes with vocabulary-sized work too — distinct
  tokens are encoded once in an Arrow-batched mapInPandas (broadcast
  merge ranks, the standard lowest-rank-first merge loop) and
  broadcast-joined back onto the corpus.

No reference analog (the reference is a radio-astronomy engine); this
is part of the training-data pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.text.analysis import _tokens


def _merge_pair_expr(symbols, a: str, b: str):
    """Catalyst fold: merge adjacent (a, b) occurrences left-to-right,
    exactly the greedy order of the classic implementation."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    df: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    min_pair_count: int = 2,
    driver_max_vocab: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus → ordered list of
    (left, right) symbol pairs. Ties break lexicographically
    (deterministic across partitionings); training stops early when no
    pair reaches ``min_pair_count``.

    Hybrid (the union-find pattern): the corpus pass always runs
    distributed, but the merge loop works on the VOCABULARY — below
    ``driver_max_vocab`` distinct words it runs the identical algorithm
    driver-side (one bounded collect instead of 2·n_merges
    vocabulary-sized jobs); the DataFrame loop is the
    larger-than-driver-memory route.
    """
    vocab = (df.select(F.explode(_tokens(F.col(text_col)))
                       .alias("word"))
             .filter(F.length("word") > 0)
             .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
             .withColumn("syms", F.split(F.col("word"), ""))
             .select("cnt", "syms"))
    vocab = vocab.localCheckpoint(eager=True)
    if vocab.count() <= driver_max_vocab:
        rows = vocab.collect()
        return _bpe_merges_local(
            [(int(r["cnt"]), list(r["syms"])) for r in rows],
            int(n_merges), int(min_pair_count))
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs = vocab.select(
            "cnt",
            F.explode(F.when(F.size("syms") >= 2, F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + 1).alias("b")))
            ).otherwise(F.array().cast(
                "array<struct<a:string,b:string>>"))).alias("p"))
        top = (pairs.groupBy("p.a", "p.b")
               .agg(F.sum("cnt").alias("n"))
               .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
               .limit(1).collect())
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            "cnt", _merge_pair_expr(F.col("syms"), a, b).alias("syms"))
        vocab = vocab.localCheckpoint(eager=True)
    return merges


def _bpe_merges_local(vocab: list[tuple[int, list[str]]],
                      n_merges: int, min_pair_count: int
                      ) -> list[tuple[str, str]]:
    """Driver-side merge loop — same counts, same (count desc, pair
    asc) tie-break, same greedy left-to-right rewrite as the
    distributed loop."""
    from collections import Counter

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for cnt, syms in vocab:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        new_vocab = []
        for cnt, syms in vocab:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab.append((cnt, out))
        vocab = new_vocab
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with learned merges →
    ``(doc_id, token_pos, word, bpe_tokens array<string>)``.

    Encoding cost is vocabulary-sized: distinct words encode once in
    Python (broadcast merge-rank dict, classic lowest-rank-first loop)
    and broadcast-join back onto the exploded corpus.
    """
    import pandas as pd
    import pyspark.sql.types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    words = (df.select(F.posexplode(_tokens(F.col(text_col)))
                       .alias("token_pos", "word"))
             .filter(F.length("word") > 0))
    distinct_words = words.select("word").distinct()

    schema = T.StructType([
        T.StructField("word", T.StringType()),
        T.StructField("bpe_tokens", T.ArrayType(T.StringType()))])

    def encode(it):
        r = bc.value
        for pdf in it:
            out = []
            for w in pdf["word"]:
                syms = list(w)
                while len(syms) > 1:
                    best, bi = None, -1
                    for i in range(len(syms) - 1):
                        rank = r.get((syms[i], syms[i + 1]))
                        if rank is not None and (best is None
                                                 or rank < best):
                            best, bi = rank, i
                    if best is None:
                        break
                    syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
                out.append(syms)
            yield pd.DataFrame({"word": pdf["word"],
                                "bpe_tokens": out})

    encoded = distinct_words.mapInPandas(encode, schema)
    base = df.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("token_pos", "word")
    ).filter(F.length("word") > 0)
    return base.join(F.broadcast(encoded), "word").select(
        id_col, "token_pos", "word", "bpe_tokens")


# Fixed well-formed merge list for the cross-engine value gate: every
# merge's parts are single characters or products of STRICTLY EARLIER
# merges, and every product string is produced by exactly one merge.
# Under that property the classic lowest-rank-first encode loop
# (apply_bpe) is equivalent to applying the merges sequentially in rank
# order, each left-to-right — because merging rank k only creates
# adjacencies involving its product, and any merge consuming that
# product has rank > k, no later application can enable an earlier
# merge. Sequential left-to-right is exactly what nested string
# `replace` computes, which makes the encoder SQL-expressible.
BPE_GATE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("s", "t"), ("in", "g"), ("o", "u"),
    ("the", "r"),
]


def _check_well_formed(merges: list[tuple[str, str]]) -> None:
    known: set[str] = set()
    for i, (a, b) in enumerate(merges):
        for part in (a, b):
            if len(part) > 1 and part not in known:
                raise ValueError(
                    f"merge {i} part {part!r} is neither a single char "
                    f"nor the product of an earlier merge")
        prod = a + b
        if prod in known:
            raise ValueError(f"duplicate product {prod!r} at merge {i}")
        known.add(prod)


def sql_apply_bpe(merges: list[tuple[str, str]],
                  text_col: str = "text", id_col: str = "doc_id",
                  table: str = "documents") -> str:
    """DuckDB twin of :func:`apply_bpe` for a WELL-FORMED fixed merge
    list (validated): wrap each symbol in ``|`` delimiters, apply each
    merge as one left-to-right non-overlapping ``replace`` (each symbol
    carries its own delimiters, so adjacent matches never share a
    boundary character), then unwrap. Restricted to printable-ASCII
    words below ``|`` (0x7c) so per-char splitting and the delimiter
    are engine-independent — the gate filters BOTH sides identically.
    """
    from cngi_prototype_spark.text.analysis import _sql_tokens

    _check_well_formed(merges)
    expr = "s"
    for a, b in merges:
        expr = f"replace({expr}, '|{a}||{b}|', '|{a}{b}|')"
    return f"""
    WITH toks AS (
      SELECT {id_col}, i - 1 AS token_pos, t[i] AS word
      FROM (SELECT {id_col}, {_sql_tokens(text_col)} AS t FROM {table}),
           UNNEST(range(1, len(t) + 1)) AS r(i)
      WHERE len(t[i]) > 0 AND regexp_matches(t[i], '^[\\x21-\\x7b]+$')
    ),
    w AS (
      SELECT {id_col}, token_pos, word,
             array_to_string(list_transform(str_split(word, ''),
                                            c -> '|' || c || '|'),
                             '') AS s
      FROM toks
    ),
    m AS (SELECT {id_col}, token_pos, word, {expr} AS s FROM w)
    SELECT {id_col}, token_pos, word,
           array_to_string(str_split(substr(s, 2, len(s) - 2), '||'),
                           ' ') AS bpe
    FROM m
    """
