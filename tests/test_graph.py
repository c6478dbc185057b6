"""Connected-components (dedup clusters) tests."""
from sciencebeam_parser_spark.operators.graph import connected_components


def components_of(spark, edges):
    df = spark.createDataFrame(edges, "doc1 long, doc2 long")
    return {
        r["doc_id"]: r["component_id"]
        for r in connected_components(df).collect()
    }


class TestConnectedComponents:
    def test_two_components(self, spark):
        comp = components_of(spark, [(1, 2), (2, 3), (10, 11)])
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_converges_past_one_hop(self, spark):
        # a 6-node chain needs several propagation rounds
        comp = components_of(spark, [(i, i + 1) for i in range(1, 6)])
        assert set(comp.values()) == {1}
        assert len(comp) == 6

    def test_edge_direction_irrelevant(self, spark):
        a = components_of(spark, [(5, 2), (2, 9)])
        b = components_of(spark, [(2, 5), (9, 2)])
        assert a == b == {2: 2, 5: 2, 9: 2}

    def test_cycle(self, spark):
        comp = components_of(spark, [(1, 2), (2, 3), (3, 1)])
        assert comp == {1: 1, 2: 1, 3: 1}


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        from sciencebeam_parser_spark.operators.skew import salted_join

        left = spark.createDataFrame(
            [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], "k long, v string"
        )
        right = spark.createDataFrame(
            [(1, 10), (2, 20), (4, 40)], "k long, w long"
        )
        got = sorted(
            (r["k"], r["v"], r["w"])
            for r in salted_join(left, right, "k").collect()
        )
        want = sorted(
            (r["k"], r["v"], r["w"])
            for r in left.join(right, "k").collect()
        )
        assert got == want

    def test_left_join_keeps_unmatched(self, spark):
        from sciencebeam_parser_spark.operators.skew import salted_join

        left = spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
        right = spark.createDataFrame([(1, 10)], "k long, w long")
        rows = {
            r["k"]: r["w"]
            for r in salted_join(left, right, "k", how="left").collect()
        }
        assert rows == {1: 10, 9: None}

    def test_rejects_unsupported_how(self, spark):
        import pytest
        from sciencebeam_parser_spark.operators.skew import salted_join

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            salted_join(df, df, "k", how="full")


class TestStringIdComponents:
    def test_chain_of_string_ids_converges(self, spark):
        # regression: the convergence check used sum(comp), which is NULL
        # for string labels and terminated after ONE propagation round —
        # a 4-chain needs at least two rounds to reach the fixpoint
        from sciencebeam_parser_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
            "src string, dst string",
        )
        comp = {
            r.doc_id: r.component_id
            for r in connected_components(
                edges, src="src", dst="dst"
            ).collect()
        }
        assert comp == {"a": "a", "b": "a", "c": "a", "d": "a",
                        "x": "x", "y": "x"}
