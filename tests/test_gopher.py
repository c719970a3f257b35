"""Gopher repetition metrics + quality rules: hand-computable docs."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.text.gopher import (
    gopher_quality_filter,
    gopher_repetition,
    sql_gopher_quality_filter,
    sql_gopher_repetition,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(df, doc_id):
    return df.filter(F.col("doc_id") == doc_id).collect()[0]


class TestRepetition:
    def test_duplicate_lines(self, spark):
        # 4 lines, "dup" appears 3x -> 2 repeated occurrences
        text = "dup\nunique line\ndup\ndup"
        r = _row(gopher_repetition(_docs(spark, [(1, text)])), 1)
        assert r.dup_line_frac == pytest.approx(2 / 4)
        # repeated chars = 2*3 over len(text)=23
        assert r.dup_line_char_frac == pytest.approx(6 / len(text))

    def test_duplicate_paragraphs(self, spark):
        text = "para one\n\npara one\n\nother"
        r = _row(gopher_repetition(_docs(spark, [(1, text)])), 1)
        assert r.dup_para_frac == pytest.approx(1 / 3)
        assert r.dup_para_char_frac == pytest.approx(8 / len(text))
        assert r.dup_line_frac == pytest.approx(1 / 3)

    def test_top_ngram_char_frac(self, spark):
        # "a b" occurs twice (chars 3 each); all other 2-grams once
        text = "a b c a b"
        r = _row(gopher_repetition(_docs(spark, [(1, text)])), 1)
        assert r.top_2gram_char_frac == pytest.approx(2 * 3 / len(text))
        # every 3-gram is unique -> 0 by the top-gram-must-repeat rule
        assert r.top_3gram_char_frac == 0.0

    def test_dup_ngram_char_frac(self, spark):
        # the 5-gram "a b c d e" occurs twice; len("a b c d e") = 9
        text = "a b c d e a b c d e"
        r = _row(gopher_repetition(_docs(spark, [(1, text)])), 1)
        assert r.dup_5gram_char_frac == pytest.approx(2 * 9 / len(text))
        # no 7-token window repeats
        assert r.dup_7gram_char_frac == 0.0

    def test_clean_doc_all_zero_and_short_docs_survive(self, spark):
        df = gopher_repetition(_docs(spark, [
            (1, "every line here is different\nno repeats at all"),
            (2, "x"),  # 1 token: no 2-grams at all
            (3, ""),   # empty: every metric 0, row still present
        ]))
        rows = {r.doc_id: r for r in df.collect()}
        assert set(rows) == {1, 2, 3}
        for d in (1, 2, 3):
            r = rows[d]
            for c in df.columns[2:]:
                assert getattr(r, c) == 0.0, (d, c)

    def test_sql_twin_matches(self, spark):
        rows = [(1, "dup\nu v w\ndup\n\ndup"),
                (2, "a b c a b c a b"),
                (3, ""), (4, "x y"),
                (5, "w " * 60)]
        eng = gopher_repetition(_docs(spark, rows)).toPandas()
        eng = eng.sort_values("doc_id").reset_index(drop=True)
        eng = eng[sorted(eng.columns)]
        con = duckdb.connect()
        con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        ora = con.sql(sql_gopher_repetition()).df()
        ora = ora.sort_values("doc_id").reset_index(drop=True)
        ora = ora[sorted(ora.columns)]
        assert list(eng.columns) == list(ora.columns)
        for c in eng.columns:
            assert (eng[c] == ora[c]).all(), c


GOOD = ("the results be clear and ready to review , of course , "
        "and that should have been fine with everyone involved . ") * 3


class TestQualityFilter:
    def test_good_doc_keeps(self, spark):
        out = gopher_quality_filter(_docs(spark, [(1, GOOD)]))
        r = _row(out, 1)
        assert r.keep and r.reason is None

    def test_too_few_words(self, spark):
        r = _row(gopher_quality_filter(
            _docs(spark, [(1, "the and of that be have with to")])), 1)
        assert not r.keep and r.reason == "words"

    def test_symbol_ratio(self, spark):
        r = _row(gopher_quality_filter(
            _docs(spark, [(1, GOOD + "#" * 30)])), 1)
        assert not r.keep and r.reason == "symbol"
        assert r.symbol_word_ratio > 0.1

    def test_bullet_lines(self, spark):
        text = "\n".join("- these items belong under that heading"
                         for _ in range(20))
        r = _row(gopher_quality_filter(_docs(spark, [(1, text)]),
                                       min_words=5), 1)
        assert not r.keep and r.reason == "bullet"
        assert r.bullet_line_frac == 1.0

    def test_ellipsis_end_lines(self, spark):
        text = "\n".join("these thoughts trail onward with more threads..."
                         for _ in range(20))
        r = _row(gopher_quality_filter(_docs(spark, [(1, text)]),
                                       min_words=5,
                                       max_symbol_word_ratio=1.0), 1)
        assert not r.keep and r.reason == "ellipsis"

    def test_alpha_word_frac(self, spark):
        text = GOOD + " ".join(str(10000 + i) for i in range(200))
        r = _row(gopher_quality_filter(_docs(spark, [(1, text)])), 1)
        assert not r.keep and r.reason == "alpha"

    def test_stopword_rule(self, spark):
        text = " ".join(f"word{i}" for i in range(80))
        r = _row(gopher_quality_filter(_docs(spark, [(1, text)])), 1)
        assert not r.keep
        # alpha passes (tokens contain letters); stopword hits = 0
        assert r.reason == "stopword" and r.stop_hits == 0

    def test_sql_twin_matches(self, spark):
        rows = [(1, GOOD), (2, "# # #"), (3, ""),
                (4, "\n".join("- a list..." for _ in range(9)))]
        eng = gopher_quality_filter(_docs(spark, rows)).toPandas()
        eng = eng.sort_values("doc_id").reset_index(drop=True)
        eng = eng[sorted(eng.columns)]
        con = duckdb.connect()
        con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        ora = con.sql(sql_gopher_quality_filter()).df()
        ora = ora.sort_values("doc_id").reset_index(drop=True)
        ora = ora[sorted(ora.columns)]
        assert list(eng.columns) == list(ora.columns)
        for c in eng.columns:
            a, b = eng[c], ora[c]
            ok = (a == b) | (a.isna() & b.isna())
            assert ok.all(), (c, a[~ok], b[~ok])
