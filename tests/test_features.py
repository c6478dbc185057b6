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


class TestSegmentationLineFeatures:
    """Port of tests/models/segmentation/data_test.py semantics — the
    34-feature line vector (models/segmentation/data.py:237-303)."""

    SCHEMA = (
        "doc_id long, page_number int, block_id long, line_id long, "
        "token_seq long, text string, font_family string, font_size double, "
        "is_bold boolean, is_italics boolean"
    )

    def _doc(self, spark, rows):
        from sciencebeam_parser_spark.operators.features import (
            segmentation_line_features,
        )

        df = spark.createDataFrame(rows, self.SCHEMA)
        return {
            (r["block_id"], r["line_id"]): r
            for r in segmentation_line_features(df).collect()
        }

    def _rows(self):
        # doc 1: page 0 has blocks 0 (2 lines) and 1 (1 line);
        # page 1 has block 2 (1 line). Fonts block-constant.
        mk = lambda seq, text, blk, line, page, fam, size, bold: (
            1, page, blk, line, seq, text, fam, size, bold, False
        )
        return [
            mk(1, "Running", 0, 0, 0, "f0", 10.0, True),
            mk(2, "head", 0, 0, 0, "f0", 10.0, True),
            mk(3, "Second", 0, 1, 0, "f0", 10.0, True),
            mk(4, "line.", 0, 1, 0, "f0", 10.0, True),
            mk(5, "Body", 1, 2, 0, "f1", 9.0, False),
            mk(6, "42", 2, 3, 1, "f1", 11.0, False),
        ]

    def test_status_features(self, spark):
        by_line = self._doc(spark, self._rows())
        l00, l01 = by_line[(0, 0)], by_line[(0, 1)]
        l10, l20 = by_line[(1, 2)], by_line[(2, 3)]
        assert l00["block_status"] == "BLOCKSTART"
        assert l01["block_status"] == "BLOCKEND"
        assert l10["block_status"] == "BLOCKSTART"  # single-line block
        assert l00["page_status"] == "PAGESTART"
        assert l01["page_status"] == "PAGEIN"
        assert l10["page_status"] == "PAGEEND"
        assert l20["page_status"] == "PAGESTART"  # first block of page 1

    def test_token_and_font_features(self, spark):
        by_line = self._doc(spark, self._rows())
        l00, l01, l10 = by_line[(0, 0)], by_line[(0, 1)], by_line[(1, 2)]
        assert l00["token_text"] == "Running"
        assert l00["second_token_text"] == "head"
        assert l01["token_text"] == "Second"
        # single-token line falls back to token_text
        assert by_line[(2, 3)]["second_token_text"] == "42"
        # selected token = first token of BLOCK: line 2 of block 0 carries
        # the block's first font, so font_status vs line 1 is SAMEFONT
        assert l00["font_status"] == "NEWFONT"  # first line of document
        assert l00["font_size_status"] == "HIGHERFONT"
        assert l01["font_status"] == "SAMEFONT"
        assert l01["font_size_status"] == "SAMEFONTSIZE"
        assert l10["font_status"] == "NEWFONT"  # f0 → f1
        assert l10["font_size_status"] == "LOWERFONT"  # 10 → 9
        assert l00["is_bold"] == "1" and l10["is_bold"] == "0"
        # digits → NOCAPS even though '42' has no lowercase
        assert by_line[(2, 3)]["cap_status"] == "NOCAPS"
        assert by_line[(2, 3)]["digit_status"] == "ALLDIGIT"
        assert by_line[(2, 3)]["is_single_char"] == "0"

    def test_punctuation_profile_and_data_line(self, spark):
        by_line = self._doc(spark, self._rows())
        l01 = by_line[(0, 1)]
        assert l01["line_punct_profile"] == "."
        assert l01["punct_profile_len"] == "1"
        l00 = by_line[(0, 0)]
        assert l00["line_punct_profile"] == "no"
        assert l00["punct_profile_len"] == "0"
        # whole-line feature replaces spaces with NBSP, so every data_line
        # is exactly 34 space-separated fields (segmentation/data.py:293)
        for row in by_line.values():
            assert len(row["data_line"].split(" ")) == 34
        assert l00["whole_line"] == "Running head"

    def test_repetitive_pattern(self, spark):
        # same first-line pattern on two pages → repetitive; first-seen once
        rows = []
        seq = 0
        for page, blk0 in ((0, 0), (1, 10)):
            for word in ("Journal", "of", "Important", "Results"):
                seq += 1
                rows.append(
                    (1, page, blk0, blk0 * 10, seq, word, "f0", 10.0,
                     False, False)
                )
            seq += 1
            rows.append(
                (1, page, blk0 + 1, (blk0 + 1) * 10, seq, "body", "f0",
                 10.0, False, False)
            )
        by_line = self._doc(spark, rows)
        assert by_line[(0, 0)]["is_repetitive"] == "1"
        assert by_line[(0, 0)]["is_first_repetitive"] == "1"
        assert by_line[(10, 100)]["is_repetitive"] == "1"
        assert by_line[(10, 100)]["is_first_repetitive"] == "0"
        # short pattern (<8 alpha chars) never counts
        assert by_line[(1, 10)]["is_repetitive"] == "0"


class TestHeaderTokenFeatures:
    """models/header/data.py:10-52 — 32-feature token vector."""

    SCHEMA = (
        "doc_id long, page_number int, block_id long, line_id long, "
        "token_seq long, text string, font_family string, font_size double, "
        "is_bold boolean, is_italics boolean, x double, width double"
    )

    def test_vector(self, spark):
        from sciencebeam_parser_spark.operators.features import (
            header_token_features,
        )

        # one block, two lines; second line indented (x 0 → 30, char_w 5)
        rows = [
            (1, 0, 0, 0, 1, "The", "f0", 10.0, False, False, 0.0, 15.0),
            (1, 0, 0, 0, 2, "Title", "f0", 12.0, True, False, 0.0, 25.0),
            (1, 0, 0, 1, 3, "by", "f1", 9.0, False, False, 30.0, 10.0),
            (1, 0, 0, 1, 4, "A.", "f1", 9.0, False, False, 30.0, 10.0),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        by_seq = {r["token_seq"]: r for r in header_token_features(df).collect()}
        t1, t2, t3, t4 = (by_seq[i] for i in (1, 2, 3, 4))
        assert t1["line_status"] == "LINESTART"
        assert t2["line_status"] == "LINEEND"
        assert t1["block_status"] == "BLOCKSTART"
        assert t4["block_status"] == "BLOCKEND"
        assert t3["block_status"] == "BLOCKIN"  # LINESTART but not line 0
        assert t1["alignment_status"] == "ALIGNEDLEFT"
        assert t3["alignment_status"] == "LINEINDENT"
        assert t1["font_status"] == "NEWFONT"
        assert t2["font_status"] == "SAMEFONT"
        assert t2["font_size_status"] == "HIGHERFONT"  # 10 → 12
        assert t3["font_size_status"] == "LOWERFONT"  # 12 → 9
        assert t4["font_size_status"] == "SAMEFONTSIZE"
        assert t2["is_largest_font"] == "1" and t1["is_largest_font"] == "0"
        assert t2["suffix_4"] == "itle" and t1["suffix_4"] == "The"
        assert t4["punct_type"] == "NOPUNCT"  # 'A.' is not a single '.'
        for r in by_seq.values():
            assert len(r["data_line"].split(" ")) == 32


class TestWordShape:
    """Port of tests/models/data_test.py:355-367 (get_word_shape_feature)."""

    def test_reference_cases(self, spark):
        from sciencebeam_parser_spark.operators.features import add_word_shape

        cases = {
            " ": " ",
            "This": "Xxxx",
            "Equals": "Xxxx",
            "O'Conor": "X'Xxxx",
            "McDonalds": "XxXxxx",
            "any-where": "xx-xxx",
            "1.First": "d.Xxxx",
            "ThisIsCamelCase": "XxXxXxXxxx",
            "This:happens": "Xx:xxx",
        }
        df = spark.createDataFrame(
            [(t,) for t in cases], "text string"
        )
        got = {
            r["text"]: r["word_shape"]
            for r in add_word_shape(df).collect()
        }
        assert got == cases
