"""Semantic tests for the graph/maintenance/stream-join query family
(queries/graph_ops.py): PageRank invariants, MERGE-upsert precedence,
stream-stream join vs its batch twin, BPE pair counting, negative
sampling shape."""
from __future__ import annotations

from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries import REGISTRY
from sciencebeam_parser_spark.queries.graph_ops import _PR_SCALE
from sciencebeam_parser_spark.queries.registry import table

SF_DIR = "/root/testdata/sf0.001"


class TestPageRank:
    def test_mass_conserved(self, spark):
        # total rank stays ~1 (integer floor division loses at most a few
        # units per node per iteration)
        rows = REGISTRY["q177_pagerank"].build(spark, SF_DIR).collect()
        total = sum(r["rank_scaled"] for r in rows)
        n = len(rows)
        assert n == 500
        # each of 3 iterations can floor-lose <= ~2 units per node
        assert total <= _PR_SCALE
        assert total >= _PR_SCALE - 10 * n

    def test_uniform_regular_graph_stays_uniform(self, spark):
        # the stride graph is 3-regular in AND out, so PageRank's fixed
        # point from a uniform start stays (near-)uniform: every node has
        # identical in-neighborhood structure
        rows = REGISTRY["q177_pagerank"].build(spark, SF_DIR).collect()
        vals = {r["rank_scaled"] for r in rows}
        assert len(vals) <= 3  # only floor-division jitter

    def test_deterministic_across_runs(self, spark):
        a = {
            r["doc_id"]: r["rank_scaled"]
            for r in REGISTRY["q177_pagerank"].build(spark, SF_DIR).collect()
        }
        b = {
            r["doc_id"]: r["rank_scaled"]
            for r in REGISTRY["q177_pagerank"].build(spark, SF_DIR).collect()
        }
        assert a == b


class TestSnapshotUpsert:
    def test_update_wins_and_inserts_survive(self, spark):
        rows = REGISTRY["q178_snapshot_upsert"].build(spark, SF_DIR).collect()
        by_key = {r["c_custkey"]: r for r in rows}
        # one row per key
        assert len(by_key) == len(rows)
        # every %5 key is the update version
        for k, r in by_key.items():
            if k % 5 == 0:
                assert r["row_source"] == "update"
                assert r["c_mktsegment"] == "UPDATED"
            else:
                assert r["row_source"] == "base"
        # keys ending in 7 exist only if inserted by the update batch
        for k in by_key:
            if k % 10 == 7:
                assert k % 5 == 0

    def test_no_join_in_plan(self, spark):
        # the MERGE is union + window: there must be NO join operator
        df = REGISTRY["q178_snapshot_upsert"].build(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "Window" in plan


class TestStreamStreamJoin:
    def test_matches_batch_twin(self, spark):
        got = sorted(
            (r["click_id"], r["purchase_id"])
            for r in REGISTRY["q179_stream_stream_join"]
            .build(spark, SF_DIR)
            .collect()
        )
        ev = table(spark, SF_DIR, "events")
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("cts"),
        )
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("pu"),
            F.col("ts").alias("pts"),
        )
        want = sorted(
            (r["click_id"], r["purchase_id"])
            for r in c.join(
                p,
                F.expr(
                    "pu = cu AND pts >= cts "
                    "AND pts < cts + INTERVAL 30 MINUTES"
                ),
            ).collect()
        )
        assert got == want


class TestBpePairCounts:
    def test_pairs_are_two_lowercase_chars(self, spark):
        rows = (
            REGISTRY["q180_bpe_pair_counts"].build(spark, SF_DIR).collect()
        )
        assert 0 < len(rows) <= 200
        for r in rows:
            assert len(r["pair"]) == 2
            assert r["pair"].islower()
        # ordered by count desc
        counts = [r["n_occurrences"] for r in rows]
        assert counts == sorted(counts, reverse=True)

    def test_topk_compiles_to_take_ordered(self, spark):
        df = REGISTRY["q180_bpe_pair_counts"].build(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestNegativeSampling:
    def test_two_negatives_per_anchor_no_self(self, spark):
        rows = (
            REGISTRY["q181_negative_sampling"].build(spark, SF_DIR).collect()
        )
        per_anchor: dict[int, list] = {}
        for r in rows:
            assert r["neg_id"] != r["anchor_id"]
            per_anchor.setdefault(r["anchor_id"], []).append(r["k"])
        assert all(sorted(ks) == [1, 2] for ks in per_anchor.values())
        assert len(per_anchor) == 500

    def test_stats_side_broadcasts(self, spark):
        df = REGISTRY["q181_negative_sampling"].build(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
