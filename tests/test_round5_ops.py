"""Semantic tests for the round-5 operator families: BPE train/encode
(q223/q224), integer EWMA spike gate (q225), product quantization
(q226/q228), and label-propagation communities (q229).

Each test checks the operator against an independent pure-Python model on
a tiny hand-built input — the same strategy as the reference's unit suite
(SURVEY §5), complementing the DuckDB oracles that run on the synthetic
corpus."""
from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sciencebeam_parser_spark.queries import REGISTRY
from sciencebeam_parser_spark.queries.analysis_ops import (
    _apply_merge,
    _bpe_train,
    _char_seq,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_bpe_train(word_counts: dict[str, int], vocab: int, rounds: int):
    """Reference BPE trainer: pair counts weighted by word frequency,
    best (non-self) pair by (weight desc, a, b), greedy left-to-right
    merge."""
    top = sorted(word_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab]
    seqs = {w: list(w) for w, _ in top}
    merges = []
    for _ in range(rounds):
        pairs: Counter = Counter()
        for w, syms in seqs.items():
            cnt = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                if a != b:
                    pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return seqs, merges


class TestBpe:
    WORDS = {
        "low": 5,
        "lower": 2,
        "lowest": 6,
        "newer": 3,
        "wider": 1,
    }

    def _wc_df(self, spark):
        return spark.createDataFrame(
            [(w, c) for w, c in self.WORDS.items()], "word string, cnt long"
        )

    def test_trained_merges_match_python_model(self, spark):
        _, bests = _bpe_train(self._wc_df(spark))
        got = [
            (r["a"], r["b"])
            for best in bests
            for r in best.collect()
        ]
        _, want = _py_bpe_train(self.WORDS, 100, 3)
        assert got == want

    def test_merged_sequences_match_python_model(self, spark):
        vocab, _ = _bpe_train(self._wc_df(spark))
        got = {r["word"]: r["seq"].split(" ") for r in vocab.collect()}
        want, _ = _py_bpe_train(self.WORDS, 100, 3)
        assert got == want

    def test_apply_merge_is_greedy_left_to_right(self, spark):
        # alternating overlaps: 'l o l o l o' with merge (o, l) — greedy
        # merges positions 2-3 and 4-5, leaving the leading l and the
        # trailing o untouched
        df = spark.createDataFrame(
            [("l o l o l o", "o", "l")], "seq string, a string, b string"
        )
        out = df.select(_apply_merge(F.col("seq")).alias("m")).first()["m"]
        assert out == "l ol ol o"

    def test_char_seq_round_trip(self, spark):
        df = spark.createDataFrame([("abc",)], "w string")
        assert df.select(_char_seq(F.col("w")).alias("s")).first()["s"] == "a b c"

    def test_empty_merge_round_passes_vocab_through(self, spark):
        # single-character word types yield NO adjacent pair in any round:
        # the left-join-on-TRUE plumbing must keep the vocabulary intact
        # (a cross join against the empty best-pair relation would wipe it)
        wc = spark.createDataFrame(
            [("a", 3), ("b", 2), ("c", 1)], "word string, cnt long"
        )
        vocab, bests = _bpe_train(wc)
        rows = {r["word"]: r["seq"] for r in vocab.collect()}
        assert rows == {"a": "a", "b": "b", "c": "c"}
        for best in bests:
            assert best.count() == 0

    def test_encode_covers_all_words_and_preserves_chars(self, spark):
        out = REGISTRY["q224_bpe_encode"].build(spark, SF_DIR).collect()
        assert len(out) > 0
        for r in out:
            # token concatenation reproduces the word byte-for-byte
            assert "".join(r["tokens"].split(" ")) == r["word"]
            assert r["n_tokens"] >= 1
            assert r["n_chars"] == len(r["word"])


class TestEwmaSpike:
    def test_ewma_weights_halve(self, spark):
        rows = REGISTRY["q225_ewma_spike"].build(spark, SF_DIR).collect()
        by_type: dict = {}
        for r in rows:
            by_type.setdefault(r["event_type"], []).append(r)
        for series in by_type.values():
            series.sort(key=lambda r: r["day"])
            for i, r in enumerate(series):
                hist = [s["n"] for s in series[max(0, i - 8):i]][::-1]
                num = sum(n * (1 << (8 - k)) for k, n in enumerate(hist, 1))
                den = sum((1 << (8 - k)) for k in range(1, len(hist) + 1))
                assert r["ewma_num"] == num
                assert r["ewma_den"] == den
                if den:
                    assert r["is_spike"] == (r["n"] * den > 2 * num)
                else:
                    assert r["is_spike"] is False

    def test_first_row_has_no_baseline(self, spark):
        rows = REGISTRY["q225_ewma_spike"].build(spark, SF_DIR).collect()
        firsts = {}
        for r in rows:
            cur = firsts.get(r["event_type"])
            if cur is None or r["day"] < cur["day"]:
                firsts[r["event_type"]] = r
        for r in firsts.values():
            assert r["ewma_den"] == 0
            assert r["ewma"] is None
            assert r["is_spike"] is False


class TestProductQuantization:
    def test_codes_in_codebook_range(self, spark):
        rows = REGISTRY["q226_pq_codes"].build(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            for m in range(4):
                assert 0 <= r[f"code{m}"] < 4
            assert r["total_err"] >= 0

    def test_codebook_seed_vectors_have_low_error(self, spark):
        # after 2 Lloyd rounds centroids move, but the 4 seed vectors
        # should still sit closer to SOME codebook entry than the corpus
        # median — sanity that assignment distances are real distances
        rows = REGISTRY["q226_pq_codes"].build(spark, SF_DIR).collect()
        errs = sorted(r["total_err"] for r in rows)
        median = errs[len(errs) // 2]
        seeds = [r for r in rows if r["vec_id"] < 4]
        assert seeds
        assert min(r["total_err"] for r in seeds) <= median

    def test_ivfpq_topk_shape(self, spark):
        rows = REGISTRY["q228_ivfpq_search"].build(spark, SF_DIR).collect()
        per_q: dict = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        for qid, rs in per_q.items():
            rs.sort(key=lambda r: r["rnk"])
            assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
            dists = [r["adc_dist"] for r in rs]
            assert dists == sorted(dists)
            assert all(r["vec_id"] != qid for r in rs)


class TestLabelPropagation:
    def test_two_triangles_converge_to_two_communities(self, spark):
        # graph: triangle {0,1,2} + triangle {10,11,12}; the PRODUCTION
        # loop (lpa_rounds) with min tie-break collapses each triangle to
        # its smallest id
        from sciencebeam_parser_spark.queries.graph_ops import lpa_rounds

        edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
        uedges = spark.createDataFrame(
            edges + [(b, a) for a, b in edges], "src long, dst long"
        )
        labels = spark.createDataFrame(
            [(v, v) for v in [0, 1, 2, 10, 11, 12]], "v long, label long"
        )
        got = {
            r["v"]: r["label"]
            for r in lpa_rounds(uedges, labels, rounds=2).collect()
        }
        assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}

    def test_isolated_node_keeps_label(self, spark):
        from sciencebeam_parser_spark.queries.graph_ops import lpa_rounds

        uedges = spark.createDataFrame(
            [(0, 1), (1, 0)], "src long, dst long"
        )
        labels = spark.createDataFrame(
            [(0, 0), (1, 1), (99, 99)], "v long, label long"
        )
        got = {
            r["v"]: r["label"]
            for r in lpa_rounds(uedges, labels, rounds=2).collect()
        }
        assert got[99] == 99

    def test_corpus_communities_are_nontrivial(self, spark):
        rows = REGISTRY["q229_label_propagation"].build(spark, SF_DIR).collect()
        n = len(rows)
        communities = {r["community"] for r in rows}
        # propagation must have merged labels: fewer communities than nodes
        assert 1 <= len(communities) < n
        # size column is consistent
        sizes = Counter(r["community"] for r in rows)
        for r in rows:
            assert r["community_size"] == sizes[r["community"]]


class TestRound5bOps:
    def test_transition_matrix_mass_conservation(self, spark):
        # every observed transition is counted exactly once: per-source
        # counts sum to the source totals the probabilities divide by
        rows = REGISTRY["q232_event_transitions"].build(spark, SF_DIR).collect()
        by_prev: dict = {}
        for r in rows:
            by_prev.setdefault(r["prev_type"], []).append(r)
        for prev, rs in by_prev.items():
            tot = sum(r["n"] for r in rs)
            for r in rs:
                assert abs(r["p"] - round(r["n"] / tot, 4)) < 1e-9

    def test_wau_bounds_daily_distinct(self, spark):
        # the 7-day rolling distinct can never be below any single day's
        # distinct users inside its window
        wau = {
            r["report_day"]: r["wau"]
            for r in REGISTRY["q234_rolling_distinct_users"]
            .build(spark, SF_DIR)
            .collect()
        }
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        daily = {
            r["day"]: r["n"]
            for r in ev.selectExpr("CAST(ts AS DATE) AS day", "user_id")
            .distinct()
            .groupBy("day")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        for day, n in daily.items():
            assert wau[day] >= n

    def test_rfm_covers_every_purchasing_user(self, spark):
        rows = REGISTRY["q244_rfm_segments"].build(spark, SF_DIR).collect()
        total = sum(r["n_users"] for r in rows)
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        n_buyers = (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct()
            .count()
        )
        assert total == n_buyers
        for r in rows:
            assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5

    def test_source_overlap_matrix_bounds(self, spark):
        rows = (
            REGISTRY["q249_source_overlap_matrix"]
            .build(spark, SF_DIR)
            .collect()
        )
        assert rows
        for r in rows:
            assert r["source_a"] < r["source_b"]
            assert r["n_shared"] <= min(r["n_a"], r["n_b"])
            assert 0.0 <= r["jaccard"] <= 1.0

    def test_label_outliers_ranked_descending(self, spark):
        rows = REGISTRY["q250_label_outliers"].build(spark, SF_DIR).collect()
        per_label: dict = {}
        for r in rows:
            per_label.setdefault(r["label"], []).append(r)
        for rs in per_label.values():
            rs.sort(key=lambda r: r["rnk"])
            dists = [r["dist"] for r in rs]
            assert dists == sorted(dists, reverse=True)

    def test_residual_and_raw_ivfpq_share_probe_sets(self, spark):
        # both searches probe the same coarse clusters, so each query's
        # CANDIDATE pool is identical — the top-5 may reorder (different
        # quantizers) but must come from the same clusters' members
        raw = REGISTRY["q228_ivfpq_search"].build(spark, SF_DIR).collect()
        res = REGISTRY["q248_residual_ivfpq_search"].build(spark, SF_DIR).collect()
        assert {r["query_id"] for r in raw} == {r["query_id"] for r in res}
        for rows in (raw, res):
            per_q: dict = {}
            for r in rows:
                per_q.setdefault(r["query_id"], []).append(r["adc_dist"])
            for dists in per_q.values():
                assert dists == sorted(dists)


class TestRound5cOps:
    def test_semdedup_audit_consistency(self, spark):
        rows = REGISTRY["q254_semdedup"].build(spark, SF_DIR).collect()
        assert rows
        total_kept = 0
        for r in rows:
            assert r["n_members"] == r["n_removed"] + r["n_kept"]
            assert r["n_kept"] >= 1  # each ball's min id always survives
            total_kept += r["n_kept"]
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        assert sum(r["n_members"] for r in rows) == emb.count()
        assert 0 < total_kept  # something survives

    def test_semdedup_lowest_id_survives(self, spark):
        # vec_id 0 has no lower-id mate anywhere, so it can never be
        # removed: its cluster's kept_id_sum accounts for it
        rows = REGISTRY["q254_semdedup"].build(spark, SF_DIR).collect()
        assert any(r["n_kept"] > 0 for r in rows)
        # global min id is kept: sum over clusters of kept ids misses 0
        # only if vec 0 was removed — reconstruct via per-cluster check
        # (kept_id_sum of the cluster containing 0 includes 0, i.e. the
        # other kept ids sum to kept_id_sum exactly; weak but engine-side
        # detailed assertion lives in the DuckDB oracle)
        assert sum(r["kept_id_sum"] for r in rows) >= 0

    def test_dsir_ranks_english_first(self, spark):
        # the target LM is trained on English: the top of the importance
        # ranking should be overwhelmingly English documents
        rows = REGISTRY["q255_dsir_importance"].build(spark, SF_DIR).collect()
        assert rows
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        lang = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
        top = sorted(rows, key=lambda r: r["rnk"])[:20]
        n_en = sum(1 for r in top if lang[r["doc_id"]] == "en")
        assert n_en >= 15
        # ranking is by descending importance
        imps = [r["imp_bits"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert imps == sorted(imps, reverse=True)

    def test_fertility_bounds(self, spark):
        rows = REGISTRY["q256_tokenizer_fertility"].build(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            # each word is >= 1 token and <= n_chars tokens
            assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
            assert 1.0 <= r["fertility"]
            assert 1.0 <= r["chars_per_token"]

    def test_fertility_accounts_every_word(self, spark):
        rows = REGISTRY["q256_tokenizer_fertility"].build(spark, SF_DIR).collect()
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        from sciencebeam_parser_spark.queries.text_ops import _words

        n_words = docs.select(F.explode(_words()).alias("w")).count()
        assert sum(r["n_words"] for r in rows) == n_words

    def test_compaction_plan_covers_inventory(self, spark):
        rows = REGISTRY["q257_compaction_plan"].build(spark, SF_DIR).collect()
        assert rows
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        total = docs.agg(F.sum("n_chars")).collect()[0][0]
        assert sum(r["total_bytes"] for r in rows) == total
        n_shards = docs.select("source", "lang").distinct().count()
        assert sum(r["n_shards"] for r in rows) == n_shards
        for r in rows:
            assert r["first_shard"] <= r["last_shard"]

    def test_skew_audit_sections_consistent(self, spark):
        rows = REGISTRY["q258_skew_audit"].build(spark, SF_DIR).collect()
        hot = [r for r in rows if r["section"] == "hot_key"]
        buckets = [r for r in rows if r["section"] == "bucket"]
        skew = [r for r in rows if r["section"] == "bucket_skew"]
        ev_n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        assert sum(r["n"] for r in hot) == ev_n
        assert sum(r["n"] for r in buckets) == ev_n
        assert len(skew) == 1
        assert skew[0]["n"] == max(r["n"] for r in buckets)
        # max-over-avg ratio >= 10000 bp (uniform) by definition
        assert skew[0]["share_bp"] >= 10000

    def test_join_size_estimate_overestimates_only(self, spark):
        rows = REGISTRY["q259_join_size_estimate"].build(spark, SF_DIR).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["estimate"] >= r["exact"] > 0
        assert r["overestimate"] == r["estimate"] - r["exact"]
        # exact equals the true join cardinality
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        clicks = ev.filter(F.col("event_type") == "click").select("user_id")
        buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
        assert r["exact"] == clicks.join(buys, "user_id").count()

    def test_pit_join_attributes_every_order_once(self, spark):
        rows = REGISTRY["q260_scd2_pit_join"].build(spark, SF_DIR).collect()
        n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
        # exactly-one-version containment: totals must equal the fact count
        assert sum(r["n_orders"] for r in rows) == n_orders
        assert all(r["version"] >= 1 for r in rows)

    def test_cdc_apply_partitions_keyspace(self, spark):
        rows = REGISTRY["q261_cdc_apply"].build(spark, SF_DIR).collect()
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        n_keys = orders.select("o_custkey").distinct().count()
        key_sum = (
            orders.select("o_custkey").distinct()
            .agg(F.sum("o_custkey")).collect()[0][0]
        )
        # live + deleted partitions the key space exactly
        assert sum(r["n_keys"] for r in rows) == n_keys
        assert sum(r["key_checksum"] for r in rows) == key_sum

    def test_rrf_fusion_ranks_and_membership(self, spark):
        rows = REGISTRY["q262_hybrid_rrf_fusion"].build(spark, SF_DIR).collect()
        assert rows
        per_q: dict = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
            # every fused item came from at least one list
            assert r["in_dense"] + r["in_lexical"] >= 1
        for rs in per_q.values():
            rs.sort(key=lambda r: r["fused_rank"])
            scores = [r["rrf_scaled"] for r in rs]
            assert scores == sorted(scores, reverse=True)
            assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
            # max possible: both lists rank-1 -> 2 * floor(1e6/61)
            assert scores[0] <= 2 * (1000000 // 61)

    def test_cusum_nonnegative_and_resets(self, spark):
        rows = REGISTRY["q263_cusum_drift"].build(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r["cusum_scaled"] >= 0  # S - running_min(S) >= 0
        # python reference: max(0, C + dev) recursion must agree exactly
        per_type: dict = {}
        for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
            c = per_type.get(r["event_type"], 0)
            c = max(0, c + (r["n"] * 7 - r["b7"]))
            per_type[r["event_type"]] = c
            assert r["cusum_scaled"] == c

    def test_chi2_additivity_and_nonnegative(self, spark):
        rows = REGISTRY["q264_distribution_drift"].build(spark, SF_DIR).collect()
        assert rows
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        assert sum(r["d"] for r in rows) == ev.count()
        for r in rows:
            assert r["chi2"] >= 0.0
            assert r["drifted"] == (r["chi2"] > 9.4877)

    def test_semi_join_emits_each_click_once(self, spark):
        rows = (
            REGISTRY["q265_stream_stream_semi_join"]
            .build(spark, SF_DIR)
            .collect()
        )
        assert rows
        ids = [r["click_id"] for r in rows]
        assert len(ids) == len(set(ids))  # at most once per click
        # semi output is a subset of the inner join's click side
        inner = REGISTRY["q179_stream_stream_join"].build(spark, SF_DIR).collect()
        assert set(ids) == {r["click_id"] for r in inner}

    def test_xml_gazetteer_parses_all_terms(self, spark):
        rows = (
            REGISTRY["q266_xml_gazetteer_roundtrip"]
            .build(spark, SF_DIR)
            .collect()
        )
        assert len(rows) == 40
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        expected = {
            r["c_name"].lower()
            for r in cust.filter(F.col("c_custkey") < 100)
            .orderBy("c_name")
            .limit(20)
            .collect()
        }
        for r in rows:
            assert r["is_in_gazetteer"] == (r["name"].lower() in expected)
        assert any(r["is_in_gazetteer"] for r in rows)

    def test_cluster_balanced_sample_caps_per_cluster(self, spark):
        rows = (
            REGISTRY["q267_cluster_balanced_sample"]
            .build(spark, SF_DIR)
            .collect()
        )
        assert rows
        per_c: dict = {}
        for r in rows:
            per_c.setdefault(r["cluster_id"], []).append(r)
        for rs in per_c.values():
            assert len(rs) <= 20
            assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))
        ids = [r["vec_id"] for r in rows]
        assert len(ids) == len(set(ids))  # strata partition the ids

    def test_standardize_matches_numpy(self, spark):
        import math

        rows = (
            REGISTRY["q268_embedding_standardize"]
            .build(spark, SF_DIR)
            .collect()
        )
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
        q = {
            r["vec_id"]: [math.floor(float(x) * 1000) for x in r["embedding"]]
            for r in emb
        }
        n = len(q)
        dims = len(next(iter(q.values())))
        s = [sum(v[i] for v in q.values()) for i in range(dims)]
        ss = [sum(v[i] * v[i] for v in q.values()) for i in range(dims)]
        for r in rows:
            v = q[r["vec_id"]]
            zs = []
            for i in range(dims):
                var_num = ss[i] * n - s[i] * s[i]
                if var_num == 0:
                    zs.append(0)
                else:
                    zs.append(
                        math.floor(
                            10000.0
                            * (v[i] * n - s[i])
                            / (n * math.sqrt(var_num * 1.0 / (n * n)))
                        )
                    )
            assert r["n_dims"] == dims
            assert r["z_checksum"] == sum(zs)
            assert r["z_min"] == min(zs)
            assert r["z_max"] == max(zs)


class TestCcnetPerplexityBuckets:
    def test_buckets_are_equidepth_and_ordered(self, spark):
        from sciencebeam_parser_spark.queries import REGISTRY

        rows = (
            REGISTRY["q280_ccnet_perplexity_buckets"]
            .build(spark, "/root/testdata/sf0.001")
            .collect()
        )
        assert rows
        by_bucket = {}
        for r in rows:
            by_bucket.setdefault(r.bucket, []).append(r.ppl_bits)
        # equi-depth: ntile(3) sizes differ by at most 1
        sizes = sorted(len(v) for v in by_bucket.values())
        assert set(by_bucket) == {"head", "middle", "tail"}
        assert sizes[-1] - sizes[0] <= 1
        # ordering: every head score <= every middle <= every tail
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])

    def test_scores_match_python_lm(self, spark):
        """Recompute one document's mean bigram NLL with a pure-Python
        add-one bigram LM built from the same whitespace tokens."""
        import math

        from sciencebeam_parser_spark.queries import REGISTRY
        from sciencebeam_parser_spark.queries.registry import table

        sf = "/root/testdata/sf0.001"
        docs = {
            r.doc_id: r.text.strip().split()
            for r in table(spark, sf, "documents").collect()
        }
        counts, heads = {}, {}
        for toks in docs.values():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        for (a, _), c in counts.items():
            heads[a] = heads.get(a, 0) + c
        vocab = len({b for _, b in counts})
        got = {
            r.doc_id: (r.n_bigrams, r.ppl_bits)
            for r in REGISTRY["q280_ccnet_perplexity_buckets"]
            .build(spark, sf)
            .collect()
        }
        for doc_id in list(docs)[:10]:
            toks = docs[doc_id]
            bgs = list(zip(toks, toks[1:]))
            if not bgs:
                assert doc_id not in got
                continue
            nll = [
                -math.log2((counts[bg] + 1.0) / (heads[bg[0]] + vocab))
                for bg in bgs
            ]
            n, bits = got[doc_id]
            assert n == len(bgs)
            assert abs(bits - sum(nll) / len(nll)) < 5e-4


class TestSpanCorruption:
    def test_matches_python_t5_model(self, spark):
        import hashlib

        from sciencebeam_parser_spark.queries import REGISTRY
        from sciencebeam_parser_spark.queries.registry import table

        sf = "/root/testdata/sf0.001"
        rows = {
            r.doc_id: r
            for r in REGISTRY["q286_span_corruption"].build(spark, sf).collect()
        }
        texts = {
            r.doc_id: r.text.strip().split()
            for r in table(spark, sf, "documents").collect()
        }

        def bucket(doc_id, span_id):
            h = hashlib.md5(f"{doc_id}:{span_id}".encode()).hexdigest()
            return int(h[:15], 16) % 100

        some_masked = False
        for doc_id in list(texts)[:15]:
            toks = texts[doc_id]
            spans = sorted(
                {
                    i // 3
                    for i in range(len(toks))
                    if bucket(doc_id, i // 3) < 15
                }
            )
            k_of = {s: i + 1 for i, s in enumerate(spans)}
            inp, tgt = [], []
            for i, tok in enumerate(toks):
                s = i // 3
                if s in k_of:
                    some_masked = True
                    if i % 3 == 0:
                        inp.append(f"<extra_id_{k_of[s]}>")
                        tgt.append(f"<extra_id_{k_of[s]}> {tok}")
                    else:
                        tgt.append(tok)
                else:
                    inp.append(tok)
            r = rows[doc_id]
            assert r.n_masked_spans == len(spans)
            assert r.input_text == " ".join(inp)
            assert r.target_text == " ".join(tgt)
        assert some_masked


class TestFimTransform:
    def test_psm_reorder(self, spark):
        from sciencebeam_parser_spark.queries import REGISTRY
        from sciencebeam_parser_spark.queries.registry import table

        sf = "/root/testdata/sf0.001"
        rows = {
            r.doc_id: r
            for r in REGISTRY["q287_fim_transform"].build(spark, sf).collect()
        }
        texts = {
            r.doc_id: r.text.strip().split()
            for r in table(spark, sf, "documents").collect()
        }
        for doc_id in list(texts)[:15]:
            toks = texts[doc_id]
            n = len(toks)
            lo, hi = (n * 2) // 5, (n * 3) // 5
            want = (
                "<PRE> " + " ".join(toks[:lo])
                + " <SUF> " + " ".join(toks[hi:])
                + " <MID> " + " ".join(toks[lo:hi])
            )
            assert rows[doc_id].n_tokens == n
            assert rows[doc_id].fim_text == want


class TestLengthBucketedBatches:
    def test_waste_below_random_batching(self, spark):
        """The sorted layout must beat the doc_id-order (quasi-random)
        layout on total padding waste — the point of the op."""
        from sciencebeam_parser_spark.queries import REGISTRY
        from sciencebeam_parser_spark.queries.registry import table

        sf = "/root/testdata/sf0.001"
        rows = (
            REGISTRY["q288_length_bucketed_batches"].build(spark, sf).collect()
        )
        sorted_waste = sum(r.padding_waste for r in rows)
        lens = [
            len(r.text.strip().split())
            for r in table(spark, sf, "documents")
            .orderBy("doc_id")
            .collect()
        ]
        random_waste = 0
        for i in range(0, len(lens), 32):
            chunk = lens[i : i + 32]
            random_waste += len(chunk) * max(chunk) - sum(chunk)
        assert sorted_waste < random_waste
        assert sum(r.n_docs for r in rows) == len(lens)
        # batches are genuinely length-ordered: batch maxima non-increasing
        maxima = [r.max_tokens for r in sorted(rows, key=lambda r: r.batch_id)]
        assert maxima == sorted(maxima, reverse=True)


class TestSpanCorruptionReconstruction:
    def test_input_plus_target_reconstructs_document(self, spark):
        """Denoising invariant: replacing each <extra_id_k> in the input
        with the tokens following that sentinel in the target must
        reproduce the original document exactly — for EVERY document."""
        import re

        from sciencebeam_parser_spark.queries import REGISTRY
        from sciencebeam_parser_spark.queries.registry import table

        sf = "/root/testdata/sf0.001"
        rows = (
            REGISTRY["q286_span_corruption"].build(spark, sf).collect()
        )
        originals = {
            r.doc_id: " ".join(r.text.strip().split())
            for r in table(spark, sf, "documents").collect()
        }
        sentinel = re.compile(r"<extra_id_(\d+)>")
        assert len(rows) == len(originals)
        for r in rows:
            spans = {}
            if r.target_text:
                parts = sentinel.split(r.target_text)
                # parts = ['', k1, ' tokens ', k2, ' tokens ', ...]
                for k, chunk in zip(parts[1::2], parts[2::2]):
                    spans[k] = chunk.strip()
            rebuilt = sentinel.sub(
                lambda m: spans[m.group(1)], r.input_text
            )
            rebuilt = " ".join(rebuilt.split())
            assert rebuilt == originals[r.doc_id], r.doc_id


class TestFunnelFormulations:
    def test_window_and_aggregation_funnels_are_equivalent(self, spark):
        # q138 default is the skew-proof aggregation form (BASELINE §13
        # A/B: ~2x uniform, ~4x under hot-key skew); the window form is
        # the reference semantics — they must agree row-exactly.
        from sciencebeam_parser_spark.queries.events_ops import (
            funnel_via_aggregation,
            funnel_via_windows,
        )
        from sciencebeam_parser_spark.queries.registry import table

        ev = table(spark, SF_DIR, "events")
        a = funnel_via_aggregation(ev)
        w = funnel_via_windows(ev)
        assert a.columns == w.columns
        assert a.exceptAll(w).count() == 0
        assert w.exceptAll(a).count() == 0
        assert a.count() > 0

    def test_salted_transitions_equivalent_to_window_form(self, spark):
        # q232 keeps the single-window default (A/B: salted LOSES at 100x
        # on this box — BASELINE §13); the range-salted escape hatch must
        # stay row-exact so flipping it at 1000x is a one-line change.
        from sciencebeam_parser_spark.queries import REGISTRY
        from sciencebeam_parser_spark.queries.events_ops import (
            transitions_via_salted_windows,
        )
        from sciencebeam_parser_spark.queries.registry import table

        ev = table(spark, SF_DIR, "events")
        a = REGISTRY["q232_event_transitions"].build(spark, SF_DIR)
        b = transitions_via_salted_windows(ev)
        assert sorted(a.columns) == sorted(b.columns)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
