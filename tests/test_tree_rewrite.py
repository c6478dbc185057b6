"""Tests for A27 tree rewrite, gazetteer lookup, and A24 CV-box dedup +
merged-bbox aggregate."""
from __future__ import annotations

from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.graphic_matching import (
    dedup_cv_boxes,
    merged_bbox_agg,
)
from sciencebeam_parser_spark.operators.tree_rewrite import replace_entities
from sciencebeam_parser_spark.sources.gazetteer import (
    add_gazetteer_flag,
    read_gazetteer,
)


class TestReplaceEntities:
    def _entities(self, spark):
        return spark.createDataFrame(
            [
                ("d1", 1, "title", "Some Title"),
                ("d1", 2, "raw_reference_text", "Smith J 2020 ..."),
                ("d1", 3, "raw_reference_text", "Unparsed ref"),
                ("d1", 4, "note", "tail"),
            ],
            "doc_id string, entity_group int, entity_type string, text string",
        )

    def test_replaces_in_place_and_keeps_unparsed(self, spark):
        parsed = spark.createDataFrame(
            [
                ("d1", 2, 0, "reference", "Smith J 2020 ..."),
                ("d1", 2, 1, "ref_author", "Smith J"),
            ],
            "doc_id string, entity_group int, part_seq int, "
            "entity_type string, text string",
        )
        out = (
            replace_entities(
                self._entities(spark), parsed,
                target_types=["raw_reference_text"],
            )
            .orderBy("entity_seq")
            .collect()
        )
        assert [(r.entity_type, r.entity_seq) for r in out] == [
            ("title", 1), ("reference", 2), ("ref_author", 3),
            ("raw_reference_text", 4),  # no parsed rows → kept
            ("note", 5),
        ]

    def test_no_parsed_rows_is_identity_order(self, spark):
        parsed = spark.createDataFrame(
            [],
            "doc_id string, entity_group int, part_seq int, "
            "entity_type string, text string",
        )
        out = (
            replace_entities(
                self._entities(spark), parsed,
                target_types=["raw_reference_text"],
            )
            .orderBy("entity_seq")
            .collect()
        )
        assert [r.entity_type for r in out] == [
            "title", "raw_reference_text", "raw_reference_text", "note",
        ]


class TestGazetteer:
    def test_read_and_flag(self, spark, tmp_path):
        p = tmp_path / "countries.txt"
        p.write_text("France\nGermany\n\nJapan\n")
        gz = read_gazetteer(spark, str(p))
        assert sorted(r.term for r in gz.collect()) == [
            "france", "germany", "japan",
        ]
        tokens = spark.createDataFrame(
            [("t1", "france"), ("t2", "FRANCE"), ("t3", "Spain")],
            "token_id string, text string",
        )
        out = {
            r.token_id: r.is_in_gazetteer
            for r in add_gazetteer_flag(tokens, gz).collect()
        }
        assert out == {"t1": True, "t2": True, "t3": False}

    def test_merged_lookup_unions_paths(self, spark, tmp_path):
        p1, p2 = tmp_path / "a.txt", tmp_path / "b.txt"
        p1.write_text("alpha\n")
        p2.write_text("beta\nAlpha\n")
        gz = read_gazetteer(spark, [str(p1), str(p2)])
        assert sorted(r.term for r in gz.collect()) == ["alpha", "beta"]


class TestCvBoxDedup:
    def test_drops_overlapping_boxes_only(self, spark):
        cv = spark.createDataFrame(
            [
                # same box as existing → ratio 1.0 → dropped
                ("d1", 1, 10.0, 10.0, 100.0, 100.0),
                # disjoint → kept
                ("d1", 1, 500.0, 500.0, 50.0, 50.0),
                # overlaps but on another page → kept
                ("d1", 2, 10.0, 10.0, 100.0, 100.0),
            ],
            "doc_id string, page_number int, x double, y double, "
            "width double, height double",
        )
        existing = spark.createDataFrame(
            [("d1", 1, 10.0, 10.0, 100.0, 100.0)],
            "doc_id string, page_number int, x double, y double, "
            "width double, height double",
        )
        kept = dedup_cv_boxes(cv, existing).collect()
        assert sorted((r.page_number, r.x) for r in kept) == [
            (1, 500.0), (2, 10.0),
        ]

    def test_threshold_uses_larger_area(self, spark):
        # small box fully inside a 4x-larger one: ratio = 0.25 < 0.8 → kept
        cv = spark.createDataFrame(
            [("d1", 1, 0.0, 0.0, 50.0, 50.0)],
            "doc_id string, page_number int, x double, y double, "
            "width double, height double",
        )
        existing = spark.createDataFrame(
            [("d1", 1, 0.0, 0.0, 100.0, 100.0)],
            "doc_id string, page_number int, x double, y double, "
            "width double, height double",
        )
        assert dedup_cv_boxes(cv, existing).count() == 1


class TestMergedBboxAgg:
    def test_envelope(self, spark):
        boxes = spark.createDataFrame(
            [
                ("d1", 0.0, 0.0, 10.0, 10.0),
                ("d1", 20.0, 5.0, 10.0, 10.0),
            ],
            "doc_id string, x double, y double, width double, height double",
        )
        row = merged_bbox_agg(boxes, "doc_id").collect()[0]
        assert (row.x, row.y, row.width, row.height, row.n_boxes) == (
            0.0, 0.0, 30.0, 15.0, 2,
        )
