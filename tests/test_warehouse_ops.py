"""Unit tests for the warehouse/layout and retrieval operator families
(warehouse_ops.py, retrieval_ops.py): HLL register math, bloom-filter
membership semantics, SCD2 interval construction, Z-order interleaving,
BM25 score math, record-linkage blocking, triangle counting on a known
graph, and parity-aHash banding.

Constructed-fixture style (no testdata dependency) per the repo's test
strategy.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries import REGISTRY


class TestHllMath:
    def test_rho_matches_python(self, spark):
        # rho = leading zeros of the 54-bit field + 1
        from sciencebeam_parser_spark.queries.warehouse_ops import _HLL_RHO_SQL

        rows = spark.createDataFrame(
            [(0,), (1,), (2,), (3,), (2**53,), (2**54 - 1,)], "rest long"
        ).select(F.expr(_HLL_RHO_SQL).alias("rho"), "rest").collect()
        for r in rows:
            if r.rest == 0:
                assert r.rho == 55
            else:
                assert r.rho == 54 - (r.rest.bit_length() - 1)

    def test_estimate_small_range_branch(self, spark):
        # all 64 registers empty but some rows: zeros>0 and raw small ->
        # linear counting 64*ln(64/zeros)
        from sciencebeam_parser_spark.queries.warehouse_ops import _HLL_EST_SQL

        df = spark.createDataFrame(
            [(63 * (1 << 55) + (1 << 54), 63)], "intsum long, zeros long"
        )
        est = df.select(F.expr(_HLL_EST_SQL).alias("e")).collect()[0].e
        assert est == pytest.approx(64 * math.log(64 / 63), rel=1e-12)

    def test_register_merge_is_union_sketch(self, spark):
        # sketch(A) merged with sketch(B) via max == sketch(A u B)
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q198_hll_distinct_sketch,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod

        ev = spark.createDataFrame(
            [("a", i) for i in range(40)] + [("b", i) for i in range(20, 60)],
            "event_type string, user_id long",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: ev  # noqa: ARG005
            out = {
                r.event_type: r
                for r in q198_hll_distinct_sketch(spark, "unused").collect()
            }
        finally:
            mod.table = orig
        assert out["__all__"].exact == 60
        # the merged estimate is within HLL's ~1.3/sqrt(64) error band
        assert abs(out["__all__"].estimate - 60) / 60 < 0.5
        assert out["a"].exact == 40 and out["b"].exact == 40


class TestBloomSemantics:
    def test_no_false_negatives(self, spark):
        # every true dim key must be a candidate (bloom property)
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q199_bloom_join_prune,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod

        sup = spark.createDataFrame(
            [(i, f"s{i}", 0, 9000.0 if i % 3 == 0 else 10.0) for i in range(30)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        )
        li = spark.createDataFrame(
            [(1, 1, i, 1, 1.0, 1.0, 0.0, 0.0, "N", "O") for i in range(30)],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: {"supplier": sup, "lineitem": li}[n]  # noqa: ARG005
            row = q199_bloom_join_prune(spark, "unused").collect()[0]
        finally:
            mod.table = orig
        assert row.n_true_match == 10
        assert row.n_candidates >= row.n_true_match  # no false negatives
        assert row.n_false_pos == row.n_candidates - row.n_true_match


class TestScd2:
    def test_intervals_chain(self, spark):
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q200_scd2_history,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod
        from datetime import datetime

        d = datetime
        orders = spark.createDataFrame(
            [
                (1, 7, "O", 1.0, d(2024, 1, 1), "1-URGENT"),
                (2, 7, "O", 1.0, d(2024, 2, 1), "1-URGENT"),  # no change
                (3, 7, "O", 1.0, d(2024, 3, 1), "3-MEDIUM"),  # change
                (4, 7, "O", 1.0, d(2024, 4, 1), "1-URGENT"),  # change back
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d_, n: orders  # noqa: ARG005
            rows = sorted(
                q200_scd2_history(spark, "unused").collect(),
                key=lambda r: r.version,
            )
        finally:
            mod.table = orig
        assert [r.priority for r in rows] == ["1-URGENT", "3-MEDIUM", "1-URGENT"]
        # intervals chain: effective_to of v equals effective_from of v+1
        assert rows[0].effective_to == rows[1].effective_from
        assert rows[1].effective_to == rows[2].effective_from
        assert rows[2].is_current and rows[2].effective_to is None


class TestZorder:
    def test_interleave_known_values(self, spark):
        from sciencebeam_parser_spark.queries.warehouse_ops import _ZVAL_SQL

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (65535, 65535), (5, 3)], "xb long, yb long"
        )
        rows = {
            (r.xb, r.yb): r.z
            for r in df.select("xb", "yb", F.expr(_ZVAL_SQL).alias("z")).collect()
        }

        def morton(x, y):
            z = 0
            for i in range(16):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        for (x, y), z in rows.items():
            assert z == morton(x, y)


class TestBm25:
    def test_score_matches_reference_formula(self, spark):
        from sciencebeam_parser_spark.queries.retrieval_ops import (
            _BM25_SCORE_SQL,
        )

        # one doc, hand-computed BM25 (k1=1.2, b=0.75)
        df = spark.createDataFrame(
            [(2, 0, 1, 100, 10, 3, 7, 1000)],
            "tf_dup long, tf_vector long, tf_join long, n_docs long,"
            " df_dup long, df_vector long, df_join long, total_dl long",
        ).withColumn("dl", F.lit(12).cast("long"))
        got = df.select(F.expr(_BM25_SCORE_SQL).alias("s")).collect()[0].s

        def term(tf, df_, n=100, dl=12, avgdl=10.0):
            idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
            return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

        want = term(2, 10) + term(0, 3) + term(1, 7)
        assert got == pytest.approx(want, rel=1e-12)


class TestTriangles:
    def test_known_graph(self, spark):
        # K4 has 4 triangles, 6 edges, transitivity 1.0
        from sciencebeam_parser_spark.queries.retrieval_ops import (
            q202_triangle_count,
        )
        import sciencebeam_parser_spark.queries.retrieval_ops as mod

        # stride-97 on 4 nodes: dst = (v + k*97) % 4 for k=1..3 ->
        # offsets 1,2,3 -> complete graph K4
        docs = spark.createDataFrame(
            [(i, "t", "en", "s", 1) for i in range(4)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: docs  # noqa: ARG005
            row = q202_triangle_count(spark, "unused").collect()[0]
        finally:
            mod.table = orig
        assert row.n_nodes == 4 and row.n_edges == 6
        assert row.n_triangles == 4
        assert row.transitivity == pytest.approx(1.0)


class TestAhash:
    def test_parity_bits_and_bands(self, spark):
        from sciencebeam_parser_spark.operators.multimodal import ahash_images

        media = spark.createDataFrame(
            [("a", bytes([0, 0, 1])), ("b", bytes([0, 0, 1])), ("c", bytes([5]))],
            "media_id string, content binary",
        )
        rows = {r.media_id: r for r in ahash_images(media).collect()}
        # bigrams of [0,0,1]: (0,0)->bucket 0 once, (0,1)->bucket 1 once
        # -> bits 0 and 1 set
        assert rows["a"].bands == [3, 0, 0, 0]
        assert rows["a"].bands == rows["b"].bands  # identical payloads
        assert rows["c"].bands == [0, 0, 0, 0]  # single byte: no bigrams
        assert rows["a"].n_bytes == 3

    def test_single_byte_edit_flips_few_bits(self, spark):
        from sciencebeam_parser_spark.operators.multimodal import ahash_images

        base = bytes(range(64)) * 3
        edited = bytes([1]) + base[1:]  # byte 0 -> 1
        media = spark.createDataFrame(
            [("x", base), ("y", edited)], "media_id string, content binary"
        )
        rows = {r.media_id: r.bands for r in ahash_images(media).collect()}
        ham = sum(
            bin(a ^ b).count("1") for a, b in zip(rows["x"], rows["y"])
        )
        # bigram (0,1) -> (1,1): bucket (0*31+1)%64=1 loses a count,
        # bucket (1*31+1)%64=32 gains one -> parities of 1 and 32 flip
        assert ham == 2


class TestSnapshotDiff:
    def test_classification(self, spark):
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q207_snapshot_diff,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod
        from datetime import datetime

        orders = spark.createDataFrame(
            [(k, 1, "O", 100.0 + k, datetime(2024, 1, 1), "1-URGENT")
             for k in range(1, 31)],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: orders  # noqa: ARG005
            rows = q207_snapshot_diff(spark, "unused").collect()
        finally:
            mod.table = orig
        by_type = {}
        for r in rows:
            by_type.setdefault(r.change_type, set()).add(r.o_orderkey)
        # inserts: %7==0 and %10!=0 -> {7,14,21,28}; deletes: %10==0 and
        # %7!=0 -> {10,20,30}; updates: in both and %3==0 (excl. 21,30)
        assert by_type["insert"] == {7, 14, 21, 28}
        assert by_type["delete"] == {10, 20, 30}
        assert by_type["update"] == {k for k in range(1, 31)
                                     if k % 3 == 0 and k % 7 and k % 10}
        for r in rows:
            if r.change_type == "update":
                assert r.new_price == r.old_price + 10


class TestIncrementalAgg:
    def test_merge_equals_recompute(self, spark):
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q208_incremental_agg,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod
        from datetime import datetime

        ev = spark.createDataFrame(
            [(i, datetime(2024, 1, 1, i % 24), i % 5, "t", float(i), "{}")
             for i in range(100)],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: ev  # noqa: ARG005
            merged = {
                (r.user_id, r.event_type): (r.n_events, r.total_value)
                for r in q208_incremental_agg(spark, "unused").collect()
            }
        finally:
            mod.table = orig
        full = {
            (r.user_id, r.event_type): (r.n, r.tv)
            for r in ev.groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
            .collect()
        }
        assert merged == full


class TestCountMin:
    def test_never_underestimates(self, spark):
        from sciencebeam_parser_spark.queries.retrieval_ops import (
            q209_count_min_heavy_hitters,
        )
        import sciencebeam_parser_spark.queries.retrieval_ops as mod

        docs = spark.createDataFrame(
            [(i, ("alpha " * 5 + "beta " * 3 + f"w{i} w{i+1}"), "en", "s", 1)
             for i in range(40)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: docs  # noqa: ARG005
            rows = q209_count_min_heavy_hitters(spark, "unused").collect()
        finally:
            mod.table = orig
        assert len(rows) == 15
        top = {r.word: r for r in rows}
        assert top["alpha"].exact == 200 and top["beta"].exact == 120
        for r in rows:
            assert r.estimate >= r.exact  # CMS can only overestimate
            assert r.overestimate == r.estimate - r.exact


class TestSetSimPrefixJoin:
    def test_complete_vs_bruteforce(self, spark):
        # prefix filtering must find EVERY pair at the threshold —
        # compare against brute-force jaccard over all pairs
        from sciencebeam_parser_spark.queries.retrieval_ops import (
            q211_setsim_prefix_join,
        )
        import sciencebeam_parser_spark.queries.retrieval_ops as mod
        import itertools

        texts = {
            1: "a b c d e f",
            2: "a b c d e g",     # shingle j = 3/5 = 0.6 >= 0.6
            3: "a b c d e f",     # j(1,3)=1.0
            4: "x y z w v u",
            5: "x y q w v u",     # shingle j = 2/6 < 0.6
            6: "m n",             # <3 words: no shingles, dropped
            7: "m n",
        }
        docs = spark.createDataFrame(
            [(k, v, "en", "s", len(v)) for k, v in texts.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: docs  # noqa: ARG005
            got = {
                (r.id_a, r.id_b): r.jaccard
                for r in q211_setsim_prefix_join(spark, "unused").collect()
            }
        finally:
            mod.table = orig

        def shingles(t):
            ws = t.split()
            return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

        want = {}
        for a, b in itertools.combinations(sorted(texts), 2):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if inter * 5 >= 3 * union:
                want[(a, b)] = round(inter / union, 4)
        assert (1, 2) in want and (1, 3) in want  # fixture sanity
        assert got == want


class TestKmeansInteger:
    def test_separated_clusters_converge(self, spark):
        from sciencebeam_parser_spark.queries.retrieval_ops import (
            q212_kmeans_integer,
            _KM_DIM,
        )
        import sciencebeam_parser_spark.queries.retrieval_ops as mod

        # 4 well-separated blobs of 5 vectors each; vec_id 0..3 are one
        # seed per blob, so Lloyd's must recover the blobs exactly
        def vec(center, jitter):
            v = [0.0] * _KM_DIM
            v[center] = 0.4
            v[(center + 1) % _KM_DIM] = jitter
            return v

        rows = []
        vid = 0
        for blob in range(4):
            for j in range(5):
                rows.append((vid if j == 0 else 100 + blob * 5 + j,
                             vec(blob * 10, 0.01 * j), blob))
                if j == 0:
                    vid += 1
        emb = spark.createDataFrame(
            [(i, v, l) for (i, v, l) in rows],
            "vec_id long, embedding array<float>, label int",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: emb  # noqa: ARG005
            out = sorted(
                q212_kmeans_integer(spark, "unused").collect(),
                key=lambda r: r.cluster_id,
            )
        finally:
            mod.table = orig
        assert [r.cluster_id for r in out] == [0, 1, 2, 3]
        assert all(r.n_members == 5 for r in out)


class TestHistogramQuantile:
    def test_uniform_data_quantiles(self, spark):
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q213_histogram_quantile_sketch,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod

        # l_extendedprice uniform 0..1000 in steps of 1 -> p50 ~ 500,
        # p90 ~ 900, p99 ~ 990 within one bin width (1000/128 ~ 7.8)
        li = spark.createDataFrame(
            [(1, 1, 1, 1, 1.0, float(i), 0.0, 0.0, "N", "O")
             for i in range(1001)],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: li  # noqa: ARG005
            row = q213_histogram_quantile_sketch(spark, "unused").collect()[0]
        finally:
            mod.table = orig
        assert row.n_total == 1001
        binw = 1000 / 128
        assert abs(row.p50_est - 500) <= binw
        assert abs(row.p90_est - 900) <= binw
        assert abs(row.p99_est - 990) <= binw


class TestSortedNeighborhood:
    def test_adjacent_names_match(self, spark):
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q214_sorted_neighborhood_dedup,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod

        part = spark.createDataFrame(
            [
                (1, "blue bolt", "B1", "t", 1, 1.0),
                (2, "blue bolts", "B1", "t", 1, 1.0),      # adjacent, lev 1
                (3, "blue widgetry", "B1", "t", 1, 1.0),   # lev > 5 to both
                (4, "red anvil", "B2", "t", 1, 1.0),
                (5, "red anvil", "B9", "t", 1, 1.0),       # lev 0, brand off
            ],
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: part  # noqa: ARG005
            got = {
                (r.id_a, r.id_b)
                for r in q214_sorted_neighborhood_dedup(spark, "unused").collect()
            }
        finally:
            mod.table = orig
        # (1,2) matches: adjacent in sort, lev 1, same brand.
        # (4,5) does not: brand differs. (2,3): lev too large.
        assert got == {(1, 2)}


class TestIvfTrainedIndex:
    def test_probe_results_are_exact_within_clusters(self, spark):
        from sciencebeam_parser_spark.queries.retrieval_ops import (
            q215_ivf_trained_index,
            _KM_DIM,
        )
        import sciencebeam_parser_spark.queries.retrieval_ops as mod

        # 8 separated blobs; queries (vec_id 0 and 100) sit inside blobs,
        # so their top-k must be exactly their blob's other members
        def vec(center, jitter):
            v = [0.0] * _KM_DIM
            v[center] = 0.4
            v[(center + 1) % _KM_DIM] = jitter
            return v

        rows = []
        for blob in range(8):
            rows.append((blob, vec(blob * 8, 0.0), blob))       # seeds 0..7
            for j in range(1, 5):
                rows.append((100 + blob * 10 + j, vec(blob * 8, 0.01 * j), blob))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: emb  # noqa: ARG005
            out = q215_ivf_trained_index(spark, "unused").collect()
        finally:
            mod.table = orig
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        # queries = vec_id % 100 == 0 -> {0, 100}; wait: 100+blob*10+j for
        # blob 0 j in 1..4 -> 101..104; only vec 0 matches % 100 == 0
        assert set(by_q) == {0}
        # top hits are blob 0's members 101..104 in jitter order
        ranked = sorted(by_q[0], key=lambda r: r.rnk)
        assert [r.vec_id for r in ranked][:4] == [101, 102, 103, 104]
        assert all(
            a.dist <= b.dist for a, b in zip(ranked, ranked[1:])
        )


class TestHistogramSkewRegression:
    def test_covering_bin_count_not_suffix_min(self, spark):
        # regression: bin_n must be the COVERING bin's count (c - cb
        # there), not min(n) over all later bins — a tiny tail bin used
        # to shrink the denominator and throw the interpolation far past
        # the covering bin
        from sciencebeam_parser_spark.queries.warehouse_ops import (
            q213_histogram_quantile_sketch,
        )
        import sciencebeam_parser_spark.queries.warehouse_ops as mod

        # 999 rows at value ~0 (bin 0), 1 row at 1000 (last bin): p50
        # falls in bin 0 whose count is 999; the tail bin has count 1
        rows = [(1, 1, 1, 1, 1.0, 0.0 + i * 1e-9, 0.0, 0.0, "N", "O")
                for i in range(999)]
        rows.append((1, 1, 1, 1, 1.0, 1000.0, 0.0, 0.0, "N", "O"))
        li = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string",
        )
        orig = mod.table
        try:
            mod.table = lambda s, d, n: li  # noqa: ARG005
            row = q213_histogram_quantile_sketch(spark, "unused").collect()[0]
        finally:
            mod.table = orig
        binw = 1000 / 128
        # p50 and p90 both land in bin 0; with the bug the denominator
        # was 1 and the estimate flew past 3900
        assert 0 <= row.p50_est <= binw
        assert 0 <= row.p90_est <= binw


class TestHllTimeRollup:
    def test_merge_equals_direct_sketch(self, spark):
        """Associativity: the estimate folded from daily registers must
        equal the estimate of a single sketch over the whole range —
        recomputed here in pure Python from the same md5 hash."""
        import hashlib

        import duckdb

        rows = {
            r["event_type"]: r
            for r in REGISTRY["q221_hll_time_rollup"]
            .build(spark, "/root/testdata/sf0.001")
            .collect()
        }
        con = duckdb.connect()
        pairs = con.execute(
            "SELECT DISTINCT event_type, user_id FROM "
            "'/root/testdata/sf0.001/events.parquet'"
        ).fetchall()
        regs: dict[str, list[int]] = {}
        exact: dict[str, set] = {}
        for et, uid in pairs:
            h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
            bucket, rest = h % 64, h >> 6
            rho = 55 if rest == 0 else 55 - rest.bit_length()
            regs.setdefault(et, [0] * 64)
            regs[et][bucket] = max(regs[et][bucket], rho)
            exact.setdefault(et, set()).add(h)
        for et, r in rows.items():
            rs = regs[et]
            intsum = sum(1 << (55 - x) for x in rs if x > 0) + sum(
                1 for x in rs if x == 0
            ) * (1 << 55)
            zeros = sum(1 for x in rs if x == 0)
            est = 0.709 * 4096 * 3.6028797018963968e16 / intsum
            if est <= 160 and zeros > 0:
                import math

                est = 64 * math.log(64 / zeros)
            assert abs(r["estimate"] - round(est, 3)) < 1e-6
            assert r["exact"] == len(exact[et])
