"""BIO grouping tests — ports of the reference's entity-grouping behavior
(models/model.py:61-79; tests exercising iter_entities_including_other).
"""
import pytest
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.bio import (
    filter_by_labels,
    group_bio_entities,
    split_by_label,
    strip_tag_prefix,
)


def labeled_df(spark, rows):
    return spark.createDataFrame(
        [("doc1", i, label, text) for i, (label, text) in enumerate(rows)],
        "doc_id string, token_seq long, label string, text string",
    )


class TestStripTagPrefix:
    def test_strips_b_and_i_prefixes(self, spark):
        df = spark.createDataFrame(
            [("B-<title>",), ("I-<title>",), ("O",), ("<title>",)], "label string"
        )
        out = [r[0] for r in df.select(strip_tag_prefix("label")).collect()]
        assert out == ["<title>", "<title>", "O", "<title>"]


class TestGroupBioEntities:
    def test_groups_b_i_runs_into_single_entity(self, spark):
        df = labeled_df(
            spark,
            [("B-<title>", "The"), ("I-<title>", "Title"), ("B-<author>", "Smith")],
        )
        out = {
            r["tag"]: (r["token_start"], r["token_end"], r["n_tokens"], r["text"])
            for r in group_bio_entities(df, text_col="text").collect()
        }
        assert out["<title>"] == (0, 1, 2, "The Title")
        assert out["<author>"] == (2, 2, 1, "Smith")

    def test_new_entity_on_b_prefix_even_with_same_tag(self, spark):
        df = labeled_df(
            spark,
            [("B-<author>", "Smith"), ("B-<author>", "Jones")],
        )
        out = group_bio_entities(df).collect()
        assert len(out) == 2

    def test_new_entity_on_tag_change_without_b(self, spark):
        df = labeled_df(
            spark,
            [("I-<title>", "The"), ("I-<author>", "Smith")],
        )
        out = sorted(group_bio_entities(df).collect(), key=lambda r: r["token_start"])
        assert [r["tag"] for r in out] == ["<title>", "<author>"]

    def test_keeps_other_runs_and_can_drop_them(self, spark):
        df = labeled_df(
            spark,
            [("O", "x"), ("B-<title>", "T"), ("O", "y"), ("O", "z")],
        )
        out = group_bio_entities(df)
        assert out.count() == 3  # O-run, title, O-run
        assert group_bio_entities(df, keep_other=False).count() == 1

    def test_multiple_docs_are_independent(self, spark):
        rows = [
            ("d1", 0, "B-<title>", "A"),
            ("d1", 1, "I-<title>", "B"),
            ("d2", 0, "I-<title>", "C"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, token_seq long, label string, text string"
        )
        out = group_bio_entities(df, text_col="text")
        assert out.count() == 2
        texts = {r["doc_id"]: r["text"] for r in out.collect()}
        assert texts == {"d1": "A B", "d2": "C"}


class TestFilterByLabels:
    def test_semi_join_keeps_only_wanted_tags(self, spark):
        tokens = spark.createDataFrame(
            [("doc1", 0, "a"), ("doc1", 1, "b"), ("doc1", 2, "c")],
            "doc_id string, token_seq long, text string",
        )
        labels = labeled_df(
            spark,
            [("B-<header>", "a"), ("I-<body>", "b"), ("B-<header>", "c")],
        ).select("doc_id", "token_seq", "label")
        out = filter_by_labels(tokens, labels, ["<header>"])
        assert sorted(r["token_seq"] for r in out.collect()) == [0, 2]


class TestSplitByLabel:
    def test_adds_stripped_tag_column(self, spark):
        labels = labeled_df(spark, [("B-<header>", "a"), ("O", "b")])
        out = split_by_label(labels)
        assert {r["tag"] for r in out.collect()} == {"<header>", "O"}
