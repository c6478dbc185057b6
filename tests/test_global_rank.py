"""The two-phase global rank must be bit-identical to the single-window
form — on synthetic total orders AND on every consumer query's real
relation (q205, q233, q244, q280, q288)."""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sciencebeam_parser_spark.operators.global_rank import with_global_rank
from sciencebeam_parser_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

CONSUMERS = [
    "q205_zorder_layout",
    "q233_quantile_binning",
    "q244_rfm_segments",
    "q280_ccnet_perplexity_buckets",
    "q288_length_bucketed_batches",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture
def two_phase(spark):
    spark.conf.set("spark.sbp.globalRank.mode", "two-phase")
    yield
    spark.conf.unset("spark.sbp.globalRank.mode")


class TestTwoPhaseEquivalence:
    @pytest.mark.parametrize("n,ntile", [(1, None), (7, 3), (100, 16),
                                         (2, 5), (100, None)])
    def test_synthetic_total_order(self, spark, two_phase, n, ntile):
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 37 % 11).alias("k")
        )
        order = [F.desc("k"), F.asc("id")]
        got = _rows(with_global_rank(df, order, out="o", ntile_n=ntile))
        spark.conf.set("spark.sbp.globalRank.mode", "single")
        want = _rows(with_global_rank(df, order, out="o", ntile_n=ntile))
        assert got == want

    @pytest.mark.parametrize("name", CONSUMERS)
    def test_consumer_queries_identical(self, spark, two_phase, name):
        got = _rows(REGISTRY[name].build(spark, SF_DIR))
        spark.conf.set("spark.sbp.globalRank.mode", "single")
        want = _rows(REGISTRY[name].build(spark, SF_DIR))
        assert got == want and got

    def test_two_phase_plan_has_no_single_partition_exchange(
        self, spark, two_phase
    ):
        df = with_global_rank(
            spark.range(1000).select("id"), [F.asc("id")], out="o"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan

    def test_auto_default_resolves_single_below_threshold(self, spark):
        # default mode is auto; a small relation (estimate << 256 MB)
        # must produce the plain single-window plan, byte-identical to
        # explicit single mode
        df = with_global_rank(
            spark.range(10).select("id"), [F.asc("id")], out="o"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan and "SinglePartition" in plan
        spark.conf.set("spark.sbp.globalRank.mode", "single")
        try:
            explicit = with_global_rank(
                spark.range(10).select("id"), [F.asc("id")], out="o"
            )
            explicit_plan = (
                explicit._jdf.queryExecution().executedPlan().toString()
            )
            # expr ids and plan ids differ between otherwise identical plans
            norm = lambda s: re.sub(r"#\d+|plan_id=\d+", "#", s)
            assert norm(explicit_plan) == norm(plan)
        finally:
            spark.conf.unset("spark.sbp.globalRank.mode")

    def test_auto_engages_two_phase_above_threshold(self, spark):
        # the size signal, not a conf, flips the mode: with a 1 KB
        # threshold a few-thousand-row relation estimates over it and the
        # single-partition window disappears — results still identical
        spark.conf.set("spark.sbp.globalRank.autoThresholdBytes", "1024")
        try:
            df = spark.range(5000).select(
                F.col("id"), (F.col("id") * 37 % 11).alias("k")
            )
            auto = with_global_rank(df, [F.desc("k"), F.asc("id")], out="o")
            plan = auto._jdf.queryExecution().executedPlan().toString()
            assert "SinglePartition" not in plan
            got = _rows(auto)
        finally:
            spark.conf.unset("spark.sbp.globalRank.autoThresholdBytes")
        spark.conf.set("spark.sbp.globalRank.mode", "single")
        try:
            want = _rows(
                with_global_rank(df, [F.desc("k"), F.asc("id")], out="o")
            )
        finally:
            spark.conf.unset("spark.sbp.globalRank.mode")
        assert got == want


class TestTwoPhaseCumsum:
    def test_matches_single_window(self, spark, two_phase):
        from sciencebeam_parser_spark.operators.global_rank import (
            with_global_cumsum,
        )

        df = spark.range(257).select(
            F.col("id"),
            (F.col("id") * 7 % 13).alias("a"),
            (F.col("id") % 5).alias("b"),
        )
        got = _rows(
            with_global_cumsum(df, ["id"], {"ca": "a", "cb": "b"})
        )
        spark.conf.set("spark.sbp.globalRank.mode", "single")
        want = _rows(
            with_global_cumsum(df, ["id"], {"ca": "a", "cb": "b"})
        )
        assert got == want

    def test_q192_identical_in_both_modes(self, spark, two_phase):
        got = _rows(REGISTRY["q192_vocab_growth"].build(spark, SF_DIR))
        spark.conf.set("spark.sbp.globalRank.mode", "single")
        want = _rows(REGISTRY["q192_vocab_growth"].build(spark, SF_DIR))
        assert got == want and got
