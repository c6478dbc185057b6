"""Semantic tests for the evaluation/mixture query family
(queries/eval_ops.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


class TestAnnRecall:
    def test_recall_bounds_and_quality(self, spark):
        rows = (
            REGISTRY["q182_ann_recall_eval"].build(spark, SF_DIR).collect()
        )
        assert len(rows) == 500  # one row per vector, incl. recall-0 ones
        for r in rows:
            assert 0 <= r["n_hit"] <= 5
            assert abs(r["recall_at_5"] - r["n_hit"] / 5.0) < 1e-9
        # single-table 8-plane LSH is sparse here (256 buckets over 500
        # vectors → ~2 candidates each): recall is nonzero but LOW —
        # which is precisely the deficiency this harness exists to
        # surface (the multi-table variant in operators/similarity.py is
        # the fix). Pin the measurement, not a wish.
        mean_recall = sum(r["recall_at_5"] for r in rows) / len(rows)
        assert 0 < mean_recall < 0.3

    def test_multitable_beats_single_table(self, spark):
        def mean_recall(name):
            rows = REGISTRY[name].build(spark, SF_DIR).collect()
            return sum(r["recall_at_5"] for r in rows) / len(rows)

        single = mean_recall("q182_ann_recall_eval")
        multi = mean_recall("q185_ann_multitable_recall")
        # 4 tables × 6 planes recalls several times better than one
        # 8-plane table (measured ~0.19 vs ~0.02 at sf0.001)
        assert multi > 3 * single


class TestTokenBudgetMixture:
    def test_budget_respected(self, spark):
        rows = (
            REGISTRY["q183_token_budget_mixture"]
            .build(spark, SF_DIR)
            .collect()
        )
        assert rows
        per_source: dict[str, list] = {}
        for r in rows:
            # take-while-below: every kept doc STARTED under budget
            assert r["token_start"] < r["budget"]
            per_source.setdefault(r["source"], []).append(r)
        from sciencebeam_parser_spark.queries.registry import table

        docs_per_source = {
            r["source"]: r["n"]
            for r in table(spark, SF_DIR, "documents")
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for source, rs in per_source.items():
            total = sum(r["n_tokens"] for r in rs)
            budget = rs[0]["budget"]
            if len(rs) < docs_per_source[source]:
                # budget was the binding constraint: filled to within one
                # doc below, overshoot bounded by one doc
                assert total >= budget - max(r["n_tokens"] for r in rs)
                assert total < budget + max(r["n_tokens"] for r in rs)
            # else: the source ran dry before its budget — everything
            # it had was taken, which the take-while gate guarantees

    def test_weights_drive_budgets(self, spark):
        rows = (
            REGISTRY["q183_token_budget_mixture"]
            .build(spark, SF_DIR)
            .collect()
        )
        budget_by_weight: dict[int, int] = {}
        for r in rows:
            budget_by_weight[r["weight"]] = r["budget"]
        ws = sorted(budget_by_weight)
        assert len(ws) >= 2
        for a, b in zip(ws, ws[1:]):
            assert budget_by_weight[a] < budget_by_weight[b]


class TestLeakageSafeSplit:
    def test_components_never_straddle_splits(self, spark):
        split_rows = (
            REGISTRY["q184_leakage_safe_split"].build(spark, SF_DIR).collect()
        )
        split_by_doc = {r["doc_id"]: r["split"] for r in split_rows}
        by_group: dict[int, set] = {}
        for r in split_rows:
            by_group.setdefault(r["group_key"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_group.values())
        # and the near-dup pairs themselves agree
        pairs = (
            REGISTRY["q62_dedup_minhash_lsh_pairs"]
            .build(spark, SF_DIR)
            .select("doc1", "doc2")
            .collect()
        )
        assert pairs
        for p in pairs:
            assert split_by_doc[p["doc1"]] == split_by_doc[p["doc2"]]

    def test_split_proportions(self, spark):
        rows = (
            REGISTRY["q184_leakage_safe_split"].build(spark, SF_DIR).collect()
        )
        n = len(rows)
        train = sum(r["split"] == "train" for r in rows)
        test = sum(r["split"] == "test" for r in rows)
        assert 0.6 < train / n < 0.95
        assert 0 < test / n < 0.25
