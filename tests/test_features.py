"""Feature generation tests — ports of tests/models/data_test.py and
tests/models/segmentation/data_test.py:63-233 behaviors.
"""
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.features import (
    add_line_indentation,
    add_repetitive_patterns,
    add_token_features,
    capitalisation_feature,
    digit_feature,
    linear_scaling_bin,
    punctuation_type_feature,
    suffix_feature,
)


def scalar(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("o"))
        .collect()[0]["o"]
    )


class TestScalarFeatures:
    def test_digit_feature(self, spark):
        t = F.col("text")
        assert scalar(spark, "123", digit_feature(t)) == "ALLDIGIT"
        assert scalar(spark, "a1b", digit_feature(t)) == "CONTAINSDIGITS"
        assert scalar(spark, "abc", digit_feature(t)) == "NODIGIT"

    def test_capitalisation_feature(self, spark):
        t = F.col("text")
        assert scalar(spark, "ABC", capitalisation_feature(t)) == "ALLCAP"
        assert scalar(spark, "Abc", capitalisation_feature(t)) == "INITCAP"
        assert scalar(spark, "abc", capitalisation_feature(t)) == "NOCAPS"
        assert scalar(spark, "A1", capitalisation_feature(t)) == "ALLCAP"

    def test_punctuation_type(self, spark):
        t = F.col("text")
        assert scalar(spark, "(", punctuation_type_feature(t)) == "OPENBRACKET"
        assert scalar(spark, "]", punctuation_type_feature(t)) == "ENDBRACKET"
        assert scalar(spark, ".", punctuation_type_feature(t)) == "DOT"
        assert scalar(spark, "-", punctuation_type_feature(t)) == "HYPHEN"
        assert scalar(spark, "'", punctuation_type_feature(t)) == "QUOTE"
        assert scalar(spark, ";;", punctuation_type_feature(t)) == "PUNCT"
        assert scalar(spark, "word", punctuation_type_feature(t)) == "NOPUNCT"

    def test_suffix_shorter_text_is_whole(self, spark):
        t = F.col("text")
        assert scalar(spark, "ab", suffix_feature(t, 4)) == "ab"
        assert scalar(spark, "abcdef", suffix_feature(t, 4)) == "cdef"

    def test_linear_scaling_bin_clamps(self, spark):
        df = spark.createDataFrame(
            [(0, 10), (5, 10), (10, 10), (12, 10)], "pos int, total int"
        )
        out = [
            r[0]
            for r in df.select(
                linear_scaling_bin(F.col("pos"), F.col("total"), 10)
            ).collect()
        ]
        # feature_linear_scaling_int: pos>=total → bin_count; pos<=0 → 0
        assert out == [0, 5, 10, 10]


def tokens_df(spark, rows):
    """rows: (doc, page, block, line, seq, text, family, size, x, y, w, h)"""
    return spark.createDataFrame(
        rows,
        "doc_id string, page_number int, block_id int, line_id int, "
        "token_seq long, text string, font_family string, font_size double, "
        "x double, y double, width double, height double",
    )


class TestAddTokenFeatures:
    def test_font_status_and_line_block_status(self, spark):
        df = tokens_df(
            spark,
            [
                ("d", 1, 1, 1, 0, "Hello", "Arial", 10.0, 0.0, 0.0, 5.0, 1.0),
                ("d", 1, 1, 1, 1, "World", "Arial", 12.0, 6.0, 0.0, 5.0, 1.0),
                ("d", 1, 1, 2, 2, "next", "Times", 12.0, 0.0, 2.0, 4.0, 1.0),
            ],
        )
        out = {r["token_seq"]: r for r in add_token_features(df).collect()}
        assert out[0]["font_status"] == "NEWFONT"  # first token
        assert out[1]["font_status"] == "SAMEFONT"
        assert out[2]["font_status"] == "NEWFONT"
        assert out[0]["font_size_status"] == "HIGHERFONT"  # no previous
        assert out[1]["font_size_status"] == "HIGHERFONT"  # 10 < 12
        assert out[2]["font_size_status"] == "SAMEFONTSIZE"
        assert out[0]["line_status"] == "LINESTART"
        assert out[1]["line_status"] == "LINEEND"
        assert out[2]["line_status"] == "LINESTART"  # single-token line: START wins
        assert out[0]["block_status"] == "BLOCKSTART"
        # 12.0 is the doc max, shared by tokens 1 and 2
        assert out[1]["is_largest_font"] is True
        assert out[0]["is_largest_font"] is False
        assert out[1]["prefix_2"] == "Wo"
        assert out[1]["suffix_3"] == "rld"

    def test_relative_font_size(self, spark):
        df = tokens_df(
            spark,
            [
                ("d", 1, 1, 1, 0, "a", "F", 8.0, None, None, None, None),
                ("d", 1, 1, 1, 1, "b", "F", 10.0, None, None, None, None),
                ("d", 1, 1, 1, 2, "c", "F", 12.0, None, None, None, None),
            ],
        )
        out = {r["token_seq"]: r for r in add_token_features(df).collect()}
        assert out[2]["is_largest_font"] is True
        assert out[0]["is_smallest_font"] is True
        assert out[2]["is_larger_than_avg_font"] is True
        assert out[1]["is_larger_than_avg_font"] is False  # 10 == mean


class TestLineIndentation:
    def test_indent_flips_on_and_carries(self, spark):
        # line 2 starts 3 units right of line 1 (char width 1) → indented;
        # line 3 same x as line 2 → carries indented; line 4 back left → off
        df = tokens_df(
            spark,
            [
                ("d", 1, 1, 1, 0, "aaaa", "F", 10.0, 0.0, 0.0, 4.0, 1.0),
                ("d", 1, 1, 2, 1, "bbbb", "F", 10.0, 3.0, 1.0, 4.0, 1.0),
                ("d", 1, 1, 3, 2, "cccc", "F", 10.0, 3.0, 2.0, 4.0, 1.0),
                ("d", 1, 1, 4, 3, "dddd", "F", 10.0, 0.0, 3.0, 4.0, 1.0),
            ],
        )
        out = {r["line_id"]: r["is_indented"] for r in add_line_indentation(df).collect()}
        assert out == {1: False, 2: True, 3: True, 4: False}


class TestRepetitivePatterns:
    def test_detects_repeated_header_line(self, spark):
        # same header line on first block of pages 1 and 2 → repetitive;
        # body lines unique. Pattern needs >= 8 letters.
        rows = []
        seq = 0
        for page in (1, 2):
            # block 0: repeated running header
            for i, w in enumerate(["Journal", "of", "Sparkology"]):
                rows.append(("d", page, page * 10, page * 100, seq, w, "F", 10.0, None, None, None, None))
                seq += 1
            # block 1: unique content line
            rows.append(
                ("d", page, page * 10 + 1, page * 100 + 1, seq, f"unique{page}content", "F", 10.0, None, None, None, None)
            )
            seq += 1
        df = tokens_df(spark, rows)
        out = add_repetitive_patterns(df)
        reps = {(r["page_number"], r["is_repetitive_pattern"], r["is_first_repetitive_pattern"])
                for r in out.filter(F.col("pattern") == "journal of sparkology").collect()}
        assert reps == {(1, True, True), (2, True, False)}

    def test_short_patterns_excluded(self, spark):
        rows = [
            ("d", 1, 1, 1, 0, "abc", "F", 10.0, None, None, None, None),
            ("d", 2, 2, 2, 1, "abc", "F", 10.0, None, None, None, None),
        ]
        out = add_repetitive_patterns(tokens_df(spark, rows))
        assert out.count() == 0  # pattern 'abc' < 8 chars
