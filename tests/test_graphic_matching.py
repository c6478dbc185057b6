"""Graphic matching + page pruning tests — ports of
tests/processors/graphic_matching_test.py and graphic_provider_test.py
behaviors.
"""
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.graphic_matching import (
    cv_candidate_pages,
    match_graphics,
    mask_tokens_by_boxes,
    nearest_candidate_match,
    pages_with_uncommon_dimensions,
    with_successor_pages,
)


def graphics_df(spark, rows):
    """(doc, gid, type, nx, ny, nw, nh)"""
    return spark.createDataFrame(
        rows,
        "doc_id string, graphic_id int, graphic_type string, "
        "nx double, ny double, nw double, nh double",
    )


def candidates_df(spark, rows):
    """(doc, cid, nx, ny, nw, nh)"""
    return spark.createDataFrame(
        rows,
        "doc_id string, content_id string, nx double, ny double, nw double, nh double",
    )


class TestNearestCandidateMatch:
    def test_matches_nearest_under_threshold(self, spark):
        g = graphics_df(spark, [("d", 1, "bitmap", 0.1, 1.5, 0.2, 0.1)])
        c = candidates_df(
            spark,
            [("d", "fig_0", 0.1, 1.65, 0.2, 0.05), ("d", "fig_1", 0.1, 2.5, 0.2, 0.05)],
        )
        out = nearest_candidate_match(g, c).collect()
        assert len(out) == 1
        assert out[0]["content_id"] == "fig_0"

    def test_rejects_beyond_threshold(self, spark):
        g = graphics_df(spark, [("d", 1, "bitmap", 0.1, 1.0, 0.2, 0.1)])
        c = candidates_df(spark, [("d", "fig_0", 0.1, 2.5, 0.2, 0.05)])
        assert nearest_candidate_match(g, c).count() == 0

    def test_ignores_svg(self, spark):
        g = graphics_df(spark, [("d", 1, "svg", 0.1, 1.5, 0.2, 0.1)])
        c = candidates_df(spark, [("d", "fig_0", 0.1, 1.55, 0.2, 0.05)])
        assert nearest_candidate_match(g, c).count() == 0

    def test_best_graphic_wins_per_candidate(self, spark):
        g = graphics_df(
            spark,
            [
                ("d", 1, "bitmap", 0.1, 1.50, 0.2, 0.1),
                ("d", 2, "bitmap", 0.1, 1.60, 0.2, 0.1),
            ],
        )
        c = candidates_df(spark, [("d", "fig_0", 0.1, 1.71, 0.2, 0.05)])
        out = nearest_candidate_match(g, c).collect()
        assert len(out) == 1
        assert out[0]["graphic_id"] == 2  # closer (gap 0.01 vs 0.11)


class TestMatchGraphicsIterative:
    def test_loser_matches_next_round_via_extension(self, spark):
        # g2 is closest to fig_0; g1 loses round 1 but fig_0's box list is
        # extended with g2's box, bringing g1 within reach in round 2
        g = graphics_df(
            spark,
            [
                ("d", 1, "bitmap", 0.1, 1.30, 0.2, 0.1),
                ("d", 2, "bitmap", 0.1, 1.55, 0.2, 0.1),
            ],
        )
        c = candidates_df(spark, [("d", "fig_0", 0.1, 1.70, 0.2, 0.05)])
        out = {r["graphic_id"]: r["content_id"] for r in match_graphics(g, c).collect()}
        assert out == {1: "fig_0", 2: "fig_0"}

    def test_empty_groups(self, spark):
        g = graphics_df(spark, [("d", 1, "bitmap", 0.1, 1.3, 0.2, 0.1)])
        c = candidates_df(spark, [("other", "fig_0", 0.1, 1.7, 0.2, 0.05)])
        assert match_graphics(g, c).count() == 0


def pages_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, page_number int, page_width double, page_height double"
    )


class TestPagePruning:
    def test_uncommon_dimension_pages(self, spark):
        pages = pages_df(
            spark,
            [("d", 1, 600.0, 800.0), ("d", 2, 600.0, 800.0), ("d", 3, 1200.0, 800.0)],
        )
        out = [r["page_number"] for r in pages_with_uncommon_dimensions(pages).collect()]
        assert out == [3]

    def test_single_dimension_doc_yields_empty(self, spark):
        # len(counter) < 2 → no candidates (graphic_provider.py:104-106)
        pages = pages_df(spark, [("d", 1, 600.0, 800.0), ("d", 2, 600.0, 800.0)])
        assert pages_with_uncommon_dimensions(pages).count() == 0

    def test_cv_candidates_minus_bitmap_pages(self, spark):
        # mode dims = 600x800 (pages 1-2); pages 3-4 uncommon; page 3 is
        # dominated by a bitmap → only page 4 is a CV candidate
        pages = pages_df(
            spark,
            [("d", 1, 600.0, 800.0), ("d", 2, 600.0, 800.0),
             ("d", 3, 1200.0, 800.0), ("d", 4, 1200.0, 800.0)],
        )
        graphics = spark.createDataFrame(
            [("d", 1, 3, 0.0, 0.0, 1000.0, 700.0, "bitmap")],
            "doc_id string, graphic_id int, page_number int, x double, y double, "
            "width double, height double, graphic_type string",
        )
        out = [r["page_number"] for r in cv_candidate_pages(pages, graphics).collect()]
        assert out == [4]

    def test_successor_pages_union(self, spark):
        pages = pages_df(
            spark, [("d", 1, 1.0, 1.0), ("d", 2, 1.0, 1.0), ("d", 3, 1.0, 1.0)]
        )
        cands = spark.createDataFrame([("d", 1)], "doc_id string, page_number int")
        out = sorted(
            r["page_number"] for r in with_successor_pages(cands, pages).collect()
        )
        assert out == [1, 2]  # page 4 doesn't exist, so only 1 ∪ {2}


class TestMaskTokens:
    def test_removes_contained_tokens(self, spark):
        tokens = spark.createDataFrame(
            [
                ("d", 1, 0, "in", 10.0, 10.0, 5.0, 5.0),
                ("d", 1, 1, "out", 100.0, 100.0, 5.0, 5.0),
            ],
            "doc_id string, page_number int, token_seq long, text string, "
            "x double, y double, width double, height double",
        )
        boxes = spark.createDataFrame(
            [("d", 1, 0.0, 0.0, 50.0, 50.0)],
            "doc_id string, page_number int, x double, y double, width double, height double",
        )
        out = [r["text"] for r in mask_tokens_by_boxes(tokens, boxes).collect()]
        assert out == ["out"]


class TestMatcherChain:
    def test_later_stage_sees_only_remainder(self, spark):
        from sciencebeam_parser_spark.operators.graphic_matching import (
            chain_graphic_matchers,
        )

        graphics = spark.createDataFrame(
            [("d1", 1), ("d1", 2), ("d1", 3)],
            "doc_id string, graphic_id int",
        )

        def stage1(remaining):
            return remaining.filter(F.col("graphic_id") == 1).select(
                "doc_id", "graphic_id", F.lit("c1").alias("content_id")
            )

        seen = {}

        def stage2(remaining):
            seen["ids"] = sorted(
                r.graphic_id for r in remaining.select("graphic_id").collect()
            )
            return remaining.filter(F.col("graphic_id") == 2).select(
                "doc_id", "graphic_id", F.lit("c2").alias("content_id")
            )

        out = chain_graphic_matchers(
            graphics, [("s1", stage1), ("s2", stage2)]
        ).collect()
        # ChainedGraphicMatcher semantics (graphic_matching.py:74-94):
        # stage 2 only sees what stage 1 left unmatched; unmatched graphics
        # appear in no stage's output
        assert seen["ids"] == [2, 3]
        assert {(r.graphic_id, r.match_stage) for r in out} == {
            (1, "s1"), (2, "s2")
        }


class TestMatchGraphicsByText:
    """AbstractGraphicTextGraphicMatcher behaviors ported from
    tests/processors/graphic_matching_test.py: first matching line wins,
    exact key beats prefix key, prefix fallback (length 3), empty text
    stays unmatched."""

    def _match(self, spark, graphic_rows, candidate_rows):
        from sciencebeam_parser_spark.operators.graphic_matching import (
            match_graphics_by_text,
        )

        graphics = spark.createDataFrame(
            graphic_rows, "doc_id long, graphic_id int, ocr_text string"
        )
        cands = spark.createDataFrame(
            candidate_rows, "doc_id long, content_id string, label_text string"
        )
        return {
            (r["doc_id"], r["graphic_id"]): r["content_id"]
            for r in match_graphics_by_text(graphics, cands).collect()
        }

    def test_exact_normalized_match(self, spark):
        got = self._match(
            spark,
            [(1, 10, "Figure 2")],
            [(1, "c1", "Figure 1"), (1, "c2", "Figure 2")],
        )
        assert got == {(1, 10): "c2"}

    def test_prefix_fallback_matches_abbreviated_label(self, spark):
        # 'Fig 2' has no exact key match against 'Figure 2', but the
        # 3-char token-prefix key ('fig2') matches both sides
        got = self._match(
            spark,
            [(1, 10, "Fig 2")],
            [(1, "c1", "Figure 2")],
        )
        assert got == {(1, 10): "c1"}

    def test_first_matching_line_wins(self, spark):
        got = self._match(
            spark,
            [(1, 10, "garbage line\nFigure 1\nFigure 2")],
            [(1, "c1", "Figure 1"), (1, "c2", "Figure 2")],
        )
        assert got == {(1, 10): "c1"}

    def test_empty_text_unmatched(self, spark):
        got = self._match(
            spark,
            [(1, 10, ""), (1, 11, "\n\n")],
            [(1, "c1", "Figure 1")],
        )
        assert got == {}
