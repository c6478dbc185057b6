"""Semantic tests for the corpus/signal-analysis family
(queries/analysis_ops.py): repetition signals, PMI collocations, gap-fill
resampling, embedding moment stats."""
from __future__ import annotations

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from sciencebeam_parser_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _py_words(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", text.strip().lower()) if w]


def _round4(x: float) -> float:
    """HALF_UP at 4 places — Spark's and DuckDB's round(), not Python's
    banker's rounding."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


class TestGopherRepetition:
    def test_matches_pure_python_model(self, spark):
        rows = {
            r["doc_id"]: r
            for r in REGISTRY["q216_gopher_repetition"].build(spark, SF_DIR).collect()
        }
        con = duckdb.connect()
        docs = con.execute(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
            "ORDER BY doc_id LIMIT 20"
        ).fetchall()
        for doc_id, text in docs:
            words = _py_words(text)
            if len(words) < 3:
                assert doc_id not in rows
                continue
            r = rows[doc_id]
            bi = [" ".join(words[i : i + 2]) for i in range(len(words) - 1)]
            tri = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
            top = Counter(words).most_common(1)[0][1]
            assert r["n_words"] == len(words)
            assert abs(r["top_word_frac"] - _round4(top / len(words))) < 1e-9
            assert abs(r["dup_bigram_frac"] - _round4(1 - len(set(bi)) / len(bi))) < 1e-9
            assert abs(r["dup_trigram_frac"] - _round4(1 - len(set(tri)) / len(tri))) < 1e-9

    def test_fracs_bounded(self, spark):
        for r in REGISTRY["q216_gopher_repetition"].build(spark, SF_DIR).collect():
            assert 0 < r["top_word_frac"] <= 1
            assert 0 <= r["dup_bigram_frac"] < 1
            assert 0 <= r["dup_trigram_frac"] < 1
            # a repeated trigram implies both its bigrams repeat
            if r["dup_trigram_frac"] > 0:
                assert r["dup_bigram_frac"] > 0


class TestPmiCollocations:
    def test_topk_ordering_and_support(self, spark):
        rows = REGISTRY["q217_pmi_collocations"].build(spark, SF_DIR).collect()
        assert len(rows) == 50
        keys = [(-r["pmi"], r["w1"], r["w2"]) for r in rows]
        assert keys == sorted(keys)
        for r in rows:
            assert r["c12"] >= 5

    def test_pmi_value_spotcheck(self, spark):
        """PMI of the globally most frequent pair recomputed from raw
        bigram counts (independent DuckDB aggregation, not the oracle)."""
        import math

        rows = REGISTRY["q217_pmi_collocations"].build(spark, SF_DIR).collect()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        from sciencebeam_parser_spark.queries.curation_ops import _WORDPOS_CTE

        for r in rows[:5]:
            c12, c1, c2, n = con.execute(
                "WITH " + _WORDPOS_CTE + """
                , lm AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1,2)
                SELECT (SELECT c12 FROM lm WHERE w1 = ? AND w2 = ?),
                       (SELECT sum(c12) FROM lm WHERE w1 = ?),
                       (SELECT sum(c12) FROM lm WHERE w2 = ?),
                       (SELECT sum(c12) FROM lm)
                """,
                [r["w1"], r["w2"], r["w1"], r["w2"]],
            ).fetchone()
            expect = _round4(math.log2(c12 * n / (c1 * c2)))
            assert abs(r["pmi"] - expect) < 1e-9
            assert r["c12"] == c12


class TestGapFillResample:
    def test_grid_contiguous_and_filled(self, spark):
        rows = REGISTRY["q218_gap_fill_resample"].build(spark, SF_DIR).collect()
        assert rows
        by_user: dict[int, list] = {}
        for r in rows:
            assert r["v_filled"] is not None  # grid starts at first obs
            by_user.setdefault(r["user_id"], []).append(r)
        for user, urows in by_user.items():
            urows.sort(key=lambda r: r["h"])
            # hourly contiguous grid
            for a, b in zip(urows, urows[1:]):
                assert (b["h"] - a["h"]).total_seconds() == 3600
            # forward fill: unobserved rows carry the previous value
            assert urows[0]["is_observed"] == 1
            prev = urows[0]["v_filled"]
            for r in urows[1:]:
                if r["is_observed"] == 0:
                    assert r["v_filled"] == prev
                prev = r["v_filled"]

    def test_observed_values_match_hourly_avg(self, spark):
        rows = REGISTRY["q218_gap_fill_resample"].build(spark, SF_DIR).collect()
        con = duckdb.connect()
        obs = {
            (u, h): v
            for u, h, v in con.execute(
                f"""SELECT user_id, date_trunc('hour', ts), round(avg(value), 4)
                FROM '{SF_DIR}/events.parquet' WHERE user_id % 10 = 0
                GROUP BY 1, 2"""
            ).fetchall()
        }
        observed = [r for r in rows if r["is_observed"] == 1]
        assert len(observed) == len(obs)
        for r in observed:
            assert abs(r["v_filled"] - obs[(r["user_id"], r["h"])]) < 1e-9


class TestEmbeddingDimStats:
    def test_shape_and_moments(self, spark):
        rows = REGISTRY["q219_embedding_dim_stats"].build(spark, SF_DIR).collect()
        labels = {r["label"] for r in rows}
        dims = {r["dim"] for r in rows}
        assert len(rows) == len(labels) * len(dims)
        assert dims == set(range(64))
        total = sum(r["n"] for r in rows) / 64
        assert total == 500  # every vector contributes to every dim
        for r in rows:
            assert r["var_pop"] >= -1e-9  # population variance (up to rounding)


class TestDuplicateSpanRemoval:
    def test_matches_pure_python_model(self, spark):
        """Recompute the Lee-et-al. span removal in pure Python over the
        whole sf0.001 corpus and compare every per-doc stat."""
        import hashlib
        from collections import Counter

        con = duckdb.connect()
        docs = con.execute(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
        gram_counts: Counter = Counter()
        words_by_doc = {}
        for doc_id, text in docs:
            words = _py_words(text)
            words_by_doc[doc_id] = words
            for i in range(len(words) - 4):
                gram_counts[" ".join(words[i : i + 5])] += 1
        rows = {
            r["doc_id"]: r
            for r in REGISTRY["q220_duplicate_span_removal"]
            .build(spark, SF_DIR)
            .collect()
        }
        checked_removed = 0
        for doc_id, words in words_by_doc.items():
            if not words:
                assert doc_id not in rows
                continue
            covered = set()
            for i in range(len(words) - 4):
                if gram_counts[" ".join(words[i : i + 5])] > 1:
                    covered.update(range(i, i + 5))
            kept = [w for i, w in enumerate(words) if i not in covered]
            r = rows[doc_id]
            assert r["n_words"] == len(words)
            assert r["n_removed"] == len(covered)
            assert r["n_kept"] == len(words) - len(covered)
            assert r["clean_md5"] == hashlib.md5(
                " ".join(kept).encode()
            ).hexdigest()
            checked_removed += len(covered)
        assert checked_removed > 0  # the corpus does contain repeated spans

    def test_counts_are_consistent(self, spark):
        for r in REGISTRY["q220_duplicate_span_removal"].build(spark, SF_DIR).collect():
            assert r["n_removed"] + r["n_kept"] == r["n_words"]
            assert r["n_removed"] >= 0


class TestBfsKhop:
    def test_matches_pure_python_bfs(self, spark):
        rows = {
            r["doc_id"]: r["dist"]
            for r in REGISTRY["q222_bfs_khop"].build(spark, SF_DIR).collect()
        }
        con = duckdb.connect()
        n = con.execute(
            f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        ).fetchone()[0]
        adj = {
            v: [
                (v + k * 97) % n
                for k in (1, 2, 3)
                if (v + k * 97) % n != v
            ]
            for v in range(n)
        }
        dist = {v: 0 for v in range(n) if v % 97 == 0}
        frontier = list(dist)
        for d in (1, 2, 3):
            nxt = []
            for v in frontier:
                for u in adj[v]:
                    if u not in dist:
                        dist[u] = d
                        nxt.append(u)
            frontier = nxt
        assert rows == dist
