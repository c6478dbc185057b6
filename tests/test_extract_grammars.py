"""Tests for the stateful A16 extract grammars, porting the reference's
tests/models/{name,affiliation_address,reference_segmenter}/extract_test.py
cases onto the Spark fold implementations."""
from __future__ import annotations

import pandas as pd
import pytest

from sciencebeam_parser_spark.operators.extract_grammars import (
    extract_affiliations,
    extract_names,
    extract_reference_segments,
)


def _runs_df(spark, runs, doc_id="d1", group_id="g1"):
    rows = [
        {"doc_id": doc_id, "group_id": group_id, "entity_group": i,
         "tag": tag, "text": text}
        for i, (tag, text) in enumerate(runs)
    ]
    return spark.createDataFrame(rows)


def _names(spark, runs):
    out = (
        extract_names(_runs_df(spark, runs))
        .orderBy("name_seq", "part_seq")
        .collect()
    )
    names: dict[int, list] = {}
    for r in out:
        names.setdefault(r.name_seq, []).append((r.part_type, r.text, r.is_valid))
    return [names[k] for k in sorted(names)]


def _parts_text(name, part_type):
    return " ".join(t for pt, t, _ in name if pt == part_type)


class TestExtractNames:
    def test_multiple_authors_split_on_second_forename(self, spark):
        names = _names(spark, [
            ("<forename>", "John"), ("<surname>", "Smith"), ("<marker>", "1"),
            ("O", ","),
            ("<forename>", "Maria"), ("<surname>", "Madison"), ("<marker>", "2"),
        ])
        assert len(names) == 2
        assert _parts_text(names[0], "given_name") == "John"
        assert _parts_text(names[0], "surname") == "Smith"
        assert _parts_text(names[0], "marker") == "1"
        assert _parts_text(names[1], "given_name") == "Maria"
        assert _parts_text(names[1], "surname") == "Madison"
        assert _parts_text(names[1], "marker") == "2"

    def test_split_on_comma_before_marker(self, spark):
        names = _names(spark, [
            ("<marker>", "1"),
            ("<forename>", "John"), ("<surname>", "Smith"),
            ("O", ","),
            ("<marker>", "2"),
            ("<forename>", "Maria"), ("<surname>", "Madison"),
        ])
        assert len(names) == 2
        assert _parts_text(names[0], "marker") == "1"
        assert _parts_text(names[1], "marker") == "2"
        assert _parts_text(names[1], "surname") == "Madison"

    def test_split_on_second_title(self, spark):
        names = _names(spark, [
            ("<title>", "Mr"), ("<forename>", "John"), ("<surname>", "Smith"),
            ("<title>", "Ms"), ("<forename>", "Maria"), ("<surname>", "Madison"),
        ])
        assert len(names) == 2
        assert _parts_text(names[0], "name_title") == "Mr"
        assert _parts_text(names[1], "name_title") == "Ms"

    def test_does_not_split_on_second_middlename(self, spark):
        names = _names(spark, [
            ("<forename>", "John"), ("<middlename>", "M"), ("<middlename>", "J"),
            ("<surname>", "Smith"),
            ("<forename>", "Maria"), ("<surname>", "Madison"),
        ])
        assert len(names) == 2
        assert _parts_text(names[0], "middle_name") == "M J"

    def test_marker_splits_on_non_numeric_chars(self, spark):
        names = _names(spark, [
            ("<marker>", "1,a"),
            ("<forename>", "John"), ("<surname>", "Smith"),
        ])
        assert len(names) == 1
        markers = [t for pt, t, _ in names[0] if pt == "marker"]
        assert markers == ["1", "a"]
        delims = [t for pt, t, _ in names[0] if pt == "marker_delimiter"]
        assert delims == [","]

    def test_title_cases_name_parts(self, spark):
        names = _names(spark, [
            ("<forename>", "JOHN"), ("<surname>", "smith"),
        ])
        assert _parts_text(names[0], "given_name") == "John"
        assert _parts_text(names[0], "surname") == "Smith"

    def test_two_letter_uppercase_given_name_becomes_given_middle(self, spark):
        names = _names(spark, [
            ("<forename>", "JM"), ("<surname>", "Smith"),
        ])
        assert _parts_text(names[0], "given_name") == "J"
        assert _parts_text(names[0], "middle_name") == "M"

    def test_name_without_surname_is_invalid(self, spark):
        names = _names(spark, [("<forename>", "John")])
        assert names[0] == [("invalid_author_name", "John", "false")]


class TestExtractAffiliations:
    def _affs(self, spark, runs):
        out = (
            extract_affiliations(
                _runs_df(spark, runs).drop("group_id")
            )
            .orderBy("aff_id", "part_seq")
            .collect()
        )
        affs: dict = {}
        for r in out:
            affs.setdefault(r.aff_id, []).append((r.part_type, r.text))
        return affs

    def test_single_affiliation_with_marker(self, spark):
        affs = self._affs(spark, [
            ("<marker>", "1"),
            ("<institution>", "Uni A"),
            ("<settlement>", "Cityville"),
        ])
        assert affs == {
            "aff0": [("marker", "1"), ("institution", "Uni A"),
                     ("settlement", "Cityville")]
        }

    def test_preceding_other_text_stays_outside(self, spark):
        affs = self._affs(spark, [
            ("O", "Affiliations:"),
            ("<marker>", "1"),
            ("<institution>", "Uni A"),
        ])
        assert affs[None] == [("note", "Affiliations:")]
        assert ("institution", "Uni A") in affs["aff0"]

    def test_split_on_second_institution(self, spark):
        affs = self._affs(spark, [
            ("<institution>", "Uni A"),
            ("<institution>", "Uni B"),
        ])
        assert affs["aff0"] == [("institution", "Uni A")]
        assert affs["aff1"] == [("institution", "Uni B")]

    def test_country_trailing_dot_removed_with_suffix_note(self, spark):
        affs = self._affs(spark, [
            ("<marker>", "1"),
            ("<country>", "UK."),
        ])
        assert affs["aff0"] == [
            ("marker", "1"), ("country", "UK"), ("country-suffix", "."),
        ]


class TestExtractReferenceSegments:
    def _segs(self, spark, runs):
        return (
            extract_reference_segments(_runs_df(spark, runs).drop("group_id"))
            .orderBy("seq")
            .collect()
        )

    def test_single_raw_reference(self, spark):
        segs = self._segs(spark, [
            ("<label>", "1."),
            ("<reference>", "Smith J, Some title, Journal X 2020"),
        ])
        assert [(r.content_id, r.part_type) for r in segs] == [
            ("b0", "reference_label"), ("b0", "raw_reference_text"),
        ]

    def test_multiple_references_get_sequential_ids(self, spark):
        segs = self._segs(spark, [
            ("<label>", "1."), ("<reference>", "Ref one text here okay"),
            ("<label>", "2."), ("<reference>", "Ref two text here okay"),
        ])
        ids = [r.content_id for r in segs if r.part_type == "raw_reference_text"]
        assert ids == ["b0", "b1"]

    def test_short_first_unlabeled_reference_is_heading(self, spark):
        segs = self._segs(spark, [
            ("<reference>", "References"),
            ("<label>", "1."), ("<reference>", "Smith J, title, Journal 2020"),
        ])
        assert segs[0].part_type == "heading"
        assert segs[0].content_id is None
        assert segs[1].content_id == "b0"

    def test_long_first_unlabeled_reference_is_not_heading(self, spark):
        segs = self._segs(spark, [
            ("<reference>", "Smith J, Some quite long reference text 2020"),
        ])
        assert segs[0].part_type == "raw_reference_text"
        assert segs[0].content_id == "b0"

    def test_other_tags_become_notes(self, spark):
        segs = self._segs(spark, [
            ("<label>", "1."), ("<reference>", "Smith J, title, Journal 2020"),
            ("O", "stray text"),
        ])
        assert segs[-1].part_type == "note"
        assert segs[-1].content_id is None
