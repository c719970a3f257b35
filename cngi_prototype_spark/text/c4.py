"""C4-style corpus cleaning (Raffel et al. 2020, JMLR 21(140) §2.2).

Implements the published C4 heuristics over the ``documents`` table:

- **Line filter** — keep a line only if it ends in a terminal
  punctuation mark (``. ! ?`` optionally followed by a closing quote),
  has at least ``min_words_per_line`` words, does not mention
  ``javascript``, and carries none of the cookie/policy boilerplate
  phrases the paper lists.
- **Page filter** — after line cleanup, drop the page if it has fewer
  than ``min_sentences`` sentences, contains ``lorem ipsum`` or a curly
  brace, or contains a blocklisted word (word-boundary match).
- **Three-sentence span dedup** — across the WHOLE corpus, any
  three-sentence span occurring more than once is removed from all but
  one document (first occurrence in ``(doc_id, position)`` order wins),
  at sentence granularity.

Every rule is a deterministic string/integer computation with a DuckDB
SQL twin (same regexes — Java regex and RE2 agree on every pattern used
here: no lookaround, no backrefs in patterns), so the driver gate
hash-matches bit-for-bit.

Scale design: the line/page filters are narrow projections (no shuffle,
no UDF, whole-stage codegen). Span dedup shuffles once on the span
fingerprint (md5 — shuffle volume ∝ number of spans, i.e. ∝ corpus
sentences), resolves first-occurrence with one min(struct) aggregation,
and rebuilds documents with one groupBy(doc) — no corpus-wide window,
no driver state; skewed span keys (boilerplate repeated millions of
times) collapse map-side in the min() partial aggregation.

Beyond-reference tier: casangi/cngi_prototype has no text operators;
these exist for the LLM-training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# sentence splitter sentinel: inserted after terminal punctuation that
# is followed by whitespace (ASCII record separator; never in text)
_RS = chr(30)
_SENT_SPLIT_PAT = r"([.!?])\s+"

TERMINAL_PUNCT_RE = "[.!?][\"']?$"

# the boilerplate phrases the C4 paper removes lines for
POLICY_PHRASES = ["terms of use", "privacy policy", "cookie policy",
                  "uses cookies", "use of cookies", "use cookies"]

# word-boundary blocklist (paper uses the public "List of Dirty,
# Naughty, Obscene..." list; default is a small illustrative subset —
# pass the full list for production runs)
DEFAULT_BADWORDS = ["fuck", "shit", "porn", "bitch", "xxx"]

C4_REASONS = ("sentences", "lorem", "brace", "badword")


def _split_sentences(text: Column) -> Column:
    """Non-empty trimmed sentences (terminal punctuation kept)."""
    marked = F.regexp_replace(text, _SENT_SPLIT_PAT, "$1" + _RS)
    return F.filter(F.transform(F.split(marked, _RS), lambda s: F.trim(s)),
                    lambda s: s != "")


def _sql_split_sentences(text: str) -> str:
    return (f"list_filter(list_transform(regexp_split_to_array("
            f"regexp_replace({text}, '{_SENT_SPLIT_PAT}', '\\1{_RS}', 'g'),"
            f" '{_RS}'), s -> trim(s)), s -> trim(s) <> '')")


def _line_ok(line: Column, min_words: int) -> Column:
    low = F.lower(line)
    n_words = F.size(F.filter(F.split(line, r"\s+"), lambda t: t != ""))
    ok = (line.rlike(TERMINAL_PUNCT_RE)
          & (n_words >= F.lit(min_words))
          & ~low.contains("javascript"))
    for p in POLICY_PHRASES:
        ok = ok & ~low.contains(p)
    return ok


def _sql_line_ok(line: str, min_words: int) -> str:
    words = (f"len(list_filter(regexp_split_to_array({line}, '\\s+'),"
             f" t -> t <> ''))")
    policy = " AND ".join(
        f"NOT contains(lower({line}), '{p}')" for p in POLICY_PHRASES)
    return (f"(regexp_matches({line}, '{TERMINAL_PUNCT_RE}')"
            f" AND {words} >= {min_words}"
            f" AND NOT contains(lower({line}), 'javascript')"
            f" AND {policy})")


def c4_clean(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    badwords: list[str] | None = None,
) -> DataFrame:
    """C4 line + page filter: one row per input document with the
    cleaned text, line/sentence counts, ``keep`` and the first failing
    ``reason`` (``sentences`` / ``lorem`` / ``brace`` / ``badword``).

    Pure projection — filter on ``keep`` and select ``text_clean`` for
    the cleaned corpus.
    """
    badwords = DEFAULT_BADWORDS if badwords is None else badwords
    text = F.col(text_col)
    lines = F.filter(F.transform(F.split(text, "\n"),
                                 lambda s: F.trim(s)), lambda s: s != "")
    kept = F.filter(lines, lambda s: _line_ok(s, min_words_per_line))
    base = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        F.array_join(kept, "\n").alias("text_clean"))
    clean = F.col("text_clean")
    low = F.lower(clean)
    n_sent = F.size(_split_sentences(clean))
    bad_re = "(?i)\\b(" + "|".join(badwords) + ")\\b"
    checks = {
        "sentences": n_sent >= F.lit(min_sentences),
        "lorem": ~low.contains("lorem ipsum"),
        "brace": ~clean.contains("{"),
        "badword": ~clean.rlike(bad_re),
    }
    reason = None
    for r in C4_REASONS:
        reason = (F.when(~checks[r], r) if reason is None
                  else reason.when(~checks[r], r))
    return base.select(
        id_col, "n_lines", "n_lines_kept",
        n_sent.alias("n_sentences"), "text_clean",
        reason.alias("reason")).withColumn("keep", F.col("reason").isNull())


def sql_c4_clean(
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    badwords: list[str] | None = None,
    source: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin of :func:`c4_clean` (same regexes, same phrase
    lists, same first-failure reason order)."""
    badwords = DEFAULT_BADWORDS if badwords is None else badwords
    line_ok = _sql_line_ok("s", min_words_per_line)
    n_sent = f"len({_sql_split_sentences('text_clean')})"
    bad_re = "\\b(" + "|".join(badwords) + ")\\b"
    checks = {
        "sentences": f"n_sentences >= {min_sentences}",
        "lorem": "NOT contains(lower(text_clean), 'lorem ipsum')",
        "brace": "NOT contains(text_clean, '{')",
        "badword": f"NOT regexp_matches(text_clean, '{bad_re}', 'i')",
    }
    reason = "CASE " + " ".join(
        f"WHEN NOT {checks[r]} THEN '{r}'" for r in C4_REASONS
    ) + " ELSE NULL END"
    return f"""
    WITH __c4src AS ({source}),
    _lines AS (
      SELECT doc_id,
             list_filter(list_transform(regexp_split_to_array(text, '\n'),
               s -> trim(s)), s -> s <> '') AS ls
      FROM __c4src
    ),
    _clean AS (
      SELECT doc_id, len(ls) AS n_lines,
             len(list_filter(ls, s -> {line_ok})) AS n_lines_kept,
             array_to_string(list_filter(ls, s -> {line_ok}), chr(10))
               AS text_clean
      FROM _lines
    ),
    _feat AS (
      SELECT doc_id, n_lines, n_lines_kept, {n_sent} AS n_sentences,
             text_clean
      FROM _clean
    )
    SELECT doc_id, n_lines, n_lines_kept, n_sentences, text_clean,
           {reason} AS reason,
           ({reason}) IS NULL AS keep
    FROM _feat
    """


def c4_span_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_sents: int = 3,
) -> DataFrame:
    """Corpus-wide C4 span dedup: every ``span_sents``-sentence window
    that occurs more than once anywhere in the corpus keeps only its
    first occurrence (min ``(doc_id, position)``); the other
    occurrences' sentences are dropped and each document is rebuilt
    from its surviving sentences (space-joined — C4 reconstructs from
    sentences too).

    Output: ``doc_id``, ``n_sentences``, ``n_removed``, ``text_dedup``
    (empty string if everything was removed). One shuffle on the span
    md5 + one groupBy(doc) rebuild; see module docstring for the scale
    argument.
    """
    text = F.col(text_col)
    docs = df.select(F.col(id_col).alias("_doc"),
                     _split_sentences(text).alias("_sents"))
    sent = docs.select(
        "_doc", F.posexplode_outer("_sents").alias("_idx", "_sent"))
    spans = docs.select("_doc", F.explode(
        F.when(F.size("_sents") >= span_sents, F.transform(
            F.sequence(F.lit(1), F.size("_sents") - span_sents + 1),
            lambda i: F.struct(
                (i - 1).alias("i"),
                F.md5(F.array_join(
                    F.slice("_sents", i, span_sents), " ")).alias("h"))))
        .otherwise(F.array().cast(
            "array<struct<i:int,h:string>>"))).alias("sp"))
    occ = spans.select("_doc", F.col("sp.i").alias("_i"),
                       F.col("sp.h").alias("_h"))
    keeper = occ.groupBy("_h").agg(
        F.min(F.struct(F.col("_doc"), F.col("_i"))).alias("_k"))
    dups = (occ.join(keeper, "_h")
            .filter(~((F.col("_doc") == F.col("_k._doc"))
                      & (F.col("_i") == F.col("_k._i")))))
    removed = dups.select(
        "_doc", F.explode(F.sequence(
            F.col("_i"), F.col("_i") + span_sents - 1)).alias("_idx")
    ).distinct()
    kept = sent.join(removed, ["_doc", "_idx"], "left_anti")
    rebuilt = kept.groupBy("_doc").agg(
        F.count("_sent").alias("_n_kept"),
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("_idx", "_sent"))),
            lambda x: x["_sent"]), " ").alias("text_dedup"))
    out = (docs.select("_doc", F.size("_sents").alias("n_sentences"))
           .join(rebuilt, "_doc", "left"))
    return out.select(
        F.col("_doc").alias(id_col), "n_sentences",
        (F.col("n_sentences")
         - F.coalesce(F.col("_n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"))


def sql_c4_span_dedup(
    *,
    span_sents: int = 3,
    source: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin of :func:`c4_span_dedup` (same sentence split, same
    md5 span keys, same first-occurrence rule)."""
    sents = _sql_split_sentences("text")
    return f"""
    WITH __sdsrc AS ({source}),
    _docs AS (SELECT doc_id AS _doc, {sents} AS _sents FROM __sdsrc),
    _sent AS (
      SELECT _doc, CAST(i - 1 AS BIGINT) AS _idx, _sents[i] AS _sent
      FROM _docs, unnest(range(1, len(_sents) + 1)) AS t(i)
    ),
    _occ AS (
      SELECT _doc, CAST(i - 1 AS BIGINT) AS _i,
             md5(array_to_string(
               _sents[CAST(i AS INT):CAST(i + {span_sents} - 1 AS INT)],
               ' ')) AS _h
      FROM _docs,
           unnest(range(1, len(_sents) - {span_sents} + 2)) AS t(i)
      WHERE len(_sents) >= {span_sents}
    ),
    _keeper AS (
      SELECT _h, MIN(struct_pack(d := _doc, i := _i)) AS _k
      FROM _occ GROUP BY _h
    ),
    _removed AS (
      SELECT DISTINCT o._doc, CAST(o._i + r AS BIGINT) AS _idx
      FROM _occ o JOIN _keeper k ON o._h = k._h,
           unnest(range(0, {span_sents})) AS t(r)
      WHERE NOT (o._doc = (k._k).d AND o._i = (k._k).i)
    ),
    _kept AS (
      SELECT s._doc, s._idx, s._sent
      FROM _sent s
      ANTI JOIN _removed r ON s._doc = r._doc AND s._idx = r._idx
    ),
    _rebuilt AS (
      SELECT _doc, COUNT(_sent) AS _n_kept,
             array_to_string(
               list_transform(
                 list_sort(list(struct_pack(i := _idx, s := _sent))),
                 x -> x.s), ' ') AS text_dedup
      FROM _kept GROUP BY _doc
    )
    SELECT d._doc AS doc_id, len(d._sents) AS n_sentences,
           len(d._sents) - COALESCE(r._n_kept, 0) AS n_removed,
           COALESCE(r.text_dedup, '') AS text_dedup
    FROM _docs d LEFT JOIN _rebuilt r ON d._doc = r._doc
    """
