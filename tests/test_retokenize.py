"""Retokenization tests — reference layout_document retokenize behaviors
(tests/document/layout_document_test.py) and normalize_text.
"""
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.retokenize import (
    normalize_text,
    remove_empty_lines_and_blocks,
    retokenize_tokens,
)


def scalar(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("o"))
        .collect()[0]["o"]
    )


class TestNormalizeText:
    def test_ligatures(self, spark):
        assert scalar(spark, "eﬀect", normalize_text(F.col("text"))) == "effect"
        assert scalar(spark, "ﬁnd", normalize_text(F.col("text"))) == "find"

    def test_dashes_and_quotes(self, spark):
        assert scalar(spark, "a–b", normalize_text(F.col("text"))) == "a-b"
        assert scalar(spark, "“q”", normalize_text(F.col("text"))) == '"q"'
        assert scalar(spark, "’s", normalize_text(F.col("text"))) == "'s"

    def test_whitespace_collapse(self, spark):
        assert scalar(spark, "a   b", normalize_text(F.col("text"))) == "a b"


def tokens_df(spark, rows):
    """(doc, seq, text, x, width)"""
    full = [
        ("d", 1, 1, 1, seq, text, " ", "f1", "F", 10.0, None, None, None, None,
         x, 0.0, w, 12.0, 600.0, 800.0)
        for (seq, text, x, w) in rows
    ]
    return spark.createDataFrame(
        full,
        "doc_id string, page_number int, block_id int, line_id int, "
        "token_seq long, text string, whitespace string, font_id string, "
        "font_family string, font_size double, is_bold boolean, "
        "is_italics boolean, is_subscript boolean, is_superscript boolean, "
        "x double, y double, width double, height double, "
        "page_width double, page_height double",
    )


class TestRetokenize:
    def test_splits_on_punctuation_with_proportional_coords(self, spark):
        # 'ab,cd' (width 50 at x 100) → 'ab'(20) ','(10) 'cd'(20)
        df = tokens_df(spark, [(0, "ab,cd", 100.0, 50.0)])
        out = sorted(retokenize_tokens(df).collect(), key=lambda r: r["token_seq"])
        assert [r["text"] for r in out] == ["ab", ",", "cd"]
        assert [r["token_seq"] for r in out] == [0, 1, 2]
        assert out[0]["x"] == 100.0 and out[0]["width"] == 20.0
        assert out[1]["x"] == 120.0 and out[1]["width"] == 10.0
        assert out[2]["x"] == 130.0 and out[2]["width"] == 20.0

    def test_single_piece_token_unchanged(self, spark):
        df = tokens_df(spark, [(0, "word", 10.0, 40.0)])
        out = retokenize_tokens(df).collect()
        assert len(out) == 1
        assert out[0]["text"] == "word"
        assert out[0]["x"] == 10.0 and out[0]["width"] == 40.0

    def test_whitespace_only_token_dropped(self, spark):
        df = tokens_df(spark, [(0, "   ", 10.0, 30.0), (1, "keep", 50.0, 40.0)])
        out = retokenize_tokens(df).collect()
        assert [r["text"] for r in out] == ["keep"]
        assert out[0]["token_seq"] == 0  # re-minted sequence

    def test_normalization_applied_before_split(self, spark):
        # en-dash normalized to '-', then split as its own token
        df = tokens_df(spark, [(0, "a–b", 0.0, 30.0)])
        out = sorted(retokenize_tokens(df).collect(), key=lambda r: r["token_seq"])
        assert [r["text"] for r in out] == ["a", "-", "b"]

    def test_remove_empty(self, spark):
        df = tokens_df(spark, [(0, "  ", 0.0, 1.0), (1, "x", 1.0, 1.0)])
        assert remove_empty_lines_and_blocks(df).count() == 1


class TestPieceWhitespace:
    def test_only_last_piece_inherits_whitespace(self, spark):
        from sciencebeam_parser_spark.operators.retokenize import (
            retokenize_tokens,
        )

        df = tokens_df(spark, [(0, "e.g", 100.0, 30.0)])
        out = sorted(
            retokenize_tokens(df).collect(), key=lambda r: r["token_seq"]
        )
        assert [r["text"] for r in out] == ["e", ".", "g"]
        # reconstruction text+whitespace must equal the original "e.g "
        assert "".join(r["text"] + r["whitespace"] for r in out) == "e.g "
        assert [r["whitespace"] for r in out] == ["", "", " "]
