"""Scalar parser tests — direct ports of the reference extract tests
(tests/models/citation/extract_test.py:40-133, header/fulltext/name extract
tests; FIXTURES.md F5 golden pairs).
"""
from pyspark.sql import functions as F

from sciencebeam_parser_spark.functions.parsers import (
    clean_abstract_text,
    detect_external_identifier,
    extract_year,
    is_two_letter_uppercase_given_name,
    normalize_name_part,
    parse_page_range,
    split_section_label,
)


def one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("out")).collect()[0]["out"]


class TestParsePageRange:
    def test_full_range(self, spark):
        out = one(spark, "321-330", parse_page_range("text"))
        assert (out["from_page"], out["to_page"]) == ("321", "330")

    def test_end_page_completion(self, spark):
        # citation/extract_test.py: "321-4" → 321-324
        out = one(spark, "321-4", parse_page_range("text"))
        assert (out["from_page"], out["to_page"]) == ("321", "324")

    def test_end_page_completion_two_digits(self, spark):
        out = one(spark, "1321-34", parse_page_range("text"))
        assert (out["from_page"], out["to_page"]) == ("1321", "1334")

    def test_single_page_no_range(self, spark):
        out = one(spark, "321", parse_page_range("text"))
        assert (out["from_page"], out["to_page"]) == (None, None)

    def test_spaces_trimmed(self, spark):
        out = one(spark, " 321 - 330 ", parse_page_range("text"))
        assert (out["from_page"], out["to_page"]) == ("321", "330")


class TestDetectExternalIdentifier:
    def test_doi(self, spark):
        out = one(spark, "doi: 10.1234/abc-def", detect_external_identifier("text"))
        assert (out["id_type"], out["value"]) == ("doi", "10.1234/abc-def")

    def test_pmid(self, spark):
        out = one(spark, "PMID: 1234567", detect_external_identifier("text"))
        assert (out["id_type"], out["value"]) == ("pmid", "1234567")

    def test_pmcid(self, spark):
        out = one(spark, "PMC1234567", detect_external_identifier("text"))
        assert (out["id_type"], out["value"]) == ("pmcid", "PMC1234567")

    def test_arxiv(self, spark):
        out = one(spark, "arXiv:2101.12345v1", detect_external_identifier("text"))
        assert (out["id_type"], out["value"]) == ("arxiv", "2101.12345v1")

    def test_no_match_returns_stripped_text(self, spark):
        out = one(spark, "just text", detect_external_identifier("text"))
        assert out["id_type"] is None
        assert out["value"] == "justtext"

    def test_doi_wins_over_pmid(self, spark):
        out = one(
            spark, "PMID: 123 doi:10.1234/x", detect_external_identifier("text")
        )
        assert out["id_type"] == "doi"


class TestExtractYear:
    def test_extracts_four_digit_year(self, spark):
        assert one(spark, "Published in 1998.", extract_year("text")) == 1998

    def test_year_with_spaces(self, spark):
        # whitespace stripped before matching (citation/extract.py:154-156)
        assert one(spark, "1 9 9 8", extract_year("text")) == 1998

    def test_no_year(self, spark):
        assert one(spark, "no year here", extract_year("text")) is None


class TestCleanAbstractText:
    def test_strips_abstract_prefix(self, spark):
        assert one(spark, "Abstract: This is it", clean_abstract_text("text")) == "This is it"

    def test_strips_summary_case_insensitive(self, spark):
        assert one(spark, "SUMMARY. Details", clean_abstract_text("text")) == "Details"

    def test_keeps_text_without_prefix(self, spark):
        assert one(spark, "Plain text", clean_abstract_text("text")) == "Plain text"


class TestSplitSectionLabel:
    def test_splits_label_and_title(self, spark):
        out = one(spark, "1.2 Methods", split_section_label("text"))
        assert (out["section_label"], out["section_title"]) == ("1.2", "Methods")

    def test_multi_level_label(self, spark):
        out = one(spark, "1.2.3. Deep Section", split_section_label("text"))
        assert out["section_label"] == "1.2.3."
        assert out["section_title"] == "Deep Section"

    def test_no_label(self, spark):
        out = one(spark, "Introduction", split_section_label("text"))
        assert out["section_label"] is None
        assert out["section_title"] == "Introduction"


class TestNameParts:
    def test_title_case(self, spark):
        assert one(spark, "SMITH", normalize_name_part("text")) == "Smith"

    def test_two_letter_uppercase_given_name(self, spark):
        assert one(spark, "JA", is_two_letter_uppercase_given_name("text")) is True
        assert one(spark, "Ja", is_two_letter_uppercase_given_name("text")) is False
        assert one(spark, "JAB", is_two_letter_uppercase_given_name("text")) is False
