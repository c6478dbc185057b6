"""Citation matching tests — ports of tests/processors/ref_matching_test.py."""
import pytest
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.ref_matching import (
    match_content_ids,
    normalized_key,
    token_prefix_key,
)


def expr_on(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(expr.alias("out"))
        .collect()[0]["out"]
    )


def run_match(spark, targets, citation_text):
    cit = spark.createDataFrame(
        [("d1", "c1", citation_text)], "doc_id string, citation_id string, text string"
    )
    tgt = spark.createDataFrame(
        [("d1", cid, text, i) for i, (cid, text) in enumerate(targets)],
        "doc_id string, content_id string, text string, target_seq long",
    )
    rows = match_content_ids(cit, tgt).collect()
    assert len(rows) == 1
    return rows[0]["target_content_id"]


class TestNormalizedKey:
    def test_lower_and_strip(self, spark):
        # ref_matching_test.py TestGetNormalizedKeyText
        assert expr_on(spark, "TeXt", normalized_key(F.col("text"))) == "text"
        assert expr_on(spark, "text.,;:", normalized_key(F.col("text"))) == "text"
        assert expr_on(spark, "text\n\r\t ", normalized_key(F.col("text"))) == "text"
        assert expr_on(spark, "text 123", normalized_key(F.col("text"))) == "text123"


class TestTokenPrefixKey:
    def test_prefixes(self, spark):
        # TestGetTokenPrefixNormalizedKeyText
        assert expr_on(spark, "figure 1", token_prefix_key(F.col("text"))) == "f1"
        assert (
            expr_on(spark, "figure 1", token_prefix_key(F.col("text"), 3)) == "fig1"
        )
        assert expr_on(spark, "figure 123", token_prefix_key(F.col("text"))) == "f123"
        assert (
            expr_on(spark, "figure x123a", token_prefix_key(F.col("text"))) == "fx123a"
        )


class TestMatchContentIds:
    def test_exact_match(self, spark):
        assert run_match(spark, [("id1", "Text 1"), ("id2", "Other 1")], "Text 1") == "id1"

    def test_case_insensitive(self, spark):
        assert run_match(spark, [("id1", "TeXt 1"), ("id2", "Other 1")], "tExt 1") == "id1"

    def test_ignores_punctuation(self, spark):
        assert run_match(spark, [("id1", "Text 1."), ("id2", "Other 1")], "Text 1:") == "id1"

    def test_prefix_match(self, spark):
        # 'Fig 1' → 'Figure 1' via token-prefix stage
        assert run_match(spark, [("id1", "Figure 1"), ("id2", "Other 1")], "Fig 1") == "id1"

    def test_partial_match_plurality(self, spark):
        # PartialContentIdMatcher: 'Smith 1999' votes id1 (2) over id2 (1)
        assert (
            run_match(
                spark,
                [("id1", "The title, Smith, 1999"), ("id2", "Other title, 1999")],
                "Smith 1999",
            )
            == "id1"
        )

    def test_tie_returns_null(self, spark):
        assert (
            run_match(
                spark,
                [("id1", "The title, Smith, 1999"), ("id2", "Other title, Smith, 1999")],
                "Smith 1999",
            )
            is None
        )

    def test_runner_up_tie_below_winner_still_matches(self, spark):
        # the tie check compares rank-1 vs rank-2 only (lead over the
        # desc-votes order): a tie BETWEEN the runners-up (votes 3,2,2)
        # must not block the clear winner
        assert (
            run_match(
                spark,
                [
                    ("id1", "The title, Smith, Jones, 1999"),
                    ("id2", "Other A, Smith, 1999"),
                    ("id3", "Other B, Smith, 1999"),
                ],
                "Smith Jones 1999",
            )
            == "id1"
        )

    def test_no_match_returns_null(self, spark):
        assert (
            run_match(
                spark,
                [("id1", "The title, Smooth"), ("id2", "Other title, X")],
                "Smith",
            )
            is None
        )

    def test_last_target_wins_on_key_collision(self, spark):
        # dict-build semantics: later target overwrites earlier
        assert (
            run_match(spark, [("id1", "Text 1"), ("id2", "Text 1")], "Text 1") == "id2"
        )

    def test_unmatched_citation_kept_with_null(self, spark):
        cit = spark.createDataFrame(
            [("d1", "c1", "nomatch zz"), ("d1", "c2", "Known")],
            "doc_id string, citation_id string, text string",
        )
        tgt = spark.createDataFrame(
            [("d1", "t1", "Known", 0)],
            "doc_id string, content_id string, text string, target_seq long",
        )
        out = {r["citation_id"]: r["target_content_id"] for r in match_content_ids(cit, tgt).collect()}
        assert out == {"c1": None, "c2": "t1"}
