"""Append-only band store (VERDICT r6 #1): the O(batch)-not-O(index)
write-path pin, manifest-commit idempotence/atomicity, executed
compaction, and the q296 end-to-end behavior pin."""
from __future__ import annotations

import json
import os

import pytest

from sciencebeam_parser_spark.operators.band_store import (
    AppendOnlyBandStore,
)

SF_DIR = "/root/testdata/sf0.001"


def _bands(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_hash string"
    )


@pytest.fixture()
def store(spark, tmp_path):
    s = AppendOnlyBandStore(spark, root=str(tmp_path / "bands"))
    yield s
    s.cleanup()


class TestAppendProbe:
    def test_empty_store_probe_collides_nothing(self, spark, store):
        probe = _bands(spark, [(1, 0, "aa"), (1, 1, "bb")])
        assert store.probe(probe).count() == 0

    def test_probe_is_existence_only(self, spark, store):
        store.append(_bands(spark, [(10, 0, "aa"), (11, 1, "bb")]), 0)
        probe = _bands(
            spark, [(1, 0, "aa"), (1, 1, "zz"), (2, 1, "bb"), (3, 2, "aa")]
        )
        hits = {r["doc_id"] for r in store.probe(probe).collect()}
        # doc 3 shares the hash but not the band position — no collision
        assert hits == {1, 2}

    def test_append_writes_only_the_batch(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a"), (1, 1, "b")]), 0)
        store.append(_bands(spark, [(2, 0, "c")]), 1)
        store.append(
            _bands(spark, [(3, 0, "d"), (3, 1, "e"), (3, 2, "f")]), 2
        )
        # THE pin: per-append writes are the batch's own rows, never the
        # accumulated index (the r6 shape re-wrote 2, 3, 6 ... rows)
        assert store.rows_written_per_append == [2, 1, 3]

    def test_retried_batch_overwrites_not_appends(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a"), (1, 1, "b")]), 0)
        # at-least-once delivery: the engine re-runs batch 0
        store.append(_bands(spark, [(1, 0, "a"), (1, 1, "b")]), 0)
        assert store.shards() == ["bands-batch-00000000"]
        index = store.read_index()
        assert index.count() == 2  # last write wins — no duplicates

    def test_manifest_commit_is_atomic_json(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a")]), 0)
        with open(os.path.join(store.root, "_MANIFEST.json")) as fh:
            manifest = json.load(fh)
        assert [s["path"] for s in manifest["shards"]] == [
            "bands-batch-00000000"
        ]
        # no torn temp file left behind after os.replace
        assert not os.path.exists(
            os.path.join(store.root, "_MANIFEST.json.tmp")
        )

    def test_uncommitted_shard_is_invisible(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a")]), 0)
        # a crashed attempt's orphan shard (written, never committed)
        orphan = _bands(spark, [(9, 0, "zz")])
        orphan.select("band_idx", "band_hash").write.parquet(
            os.path.join(store.root, "bands-batch-orphan")
        )
        probe = _bands(spark, [(5, 0, "zz")])
        assert store.probe(probe).count() == 0


class TestCompaction:
    def test_compaction_binpacks_and_preserves_content(self, spark, tmp_path):
        store = AppendOnlyBandStore(spark, root=str(tmp_path / "c"))
        for b in range(5):
            store.append(
                _bands(spark, [(b, 0, f"h{b}"), (b, 1, "shared")]), b
            )
        before = {
            (r["band_idx"], r["band_hash"])
            for r in store.read_index().collect()
        }
        assert len(store.shards()) == 5
        store.compact()
        # all five undersized shards pack into ONE bin (q257 next-fit)
        assert store.shards() == ["compact-g0001-b0000"]
        after_df = store.read_index()
        after = {
            (r["band_idx"], r["band_hash"]) for r in after_df.collect()
        }
        assert after == before  # content equality
        # the deferred distinct ran: 'shared' collapsed from 5 rows to 1
        assert after_df.count() == len(before)
        # old shard dirs are gone after the swap
        assert not os.path.exists(
            os.path.join(store.root, "bands-batch-00000000")
        )
        store.cleanup()

    def test_compaction_respects_target_bytes(self, spark, tmp_path):
        # a 1-byte target makes every shard "large": nothing merges
        store = AppendOnlyBandStore(
            spark, root=str(tmp_path / "t"), target_bytes=1
        )
        for b in range(3):
            store.append(_bands(spark, [(b, 0, f"h{b}")]), b)
        store.compact()
        assert len(store.shards()) == 3
        store.cleanup()

    def test_auto_compaction_every_n_appends(self, spark, tmp_path):
        store = AppendOnlyBandStore(
            spark, root=str(tmp_path / "a"), compact_every=2
        )
        for b in range(4):
            store.append(_bands(spark, [(b, 0, f"h{b}")]), b)
        assert store.n_compactions == 2
        # rewritten rows are bounded by one pass over the index per
        # compaction (amortized — never per-batch)
        assert store.rows_compacted <= 2 + 4
        store.cleanup()

    def test_probe_still_correct_across_compaction(self, spark, tmp_path):
        store = AppendOnlyBandStore(
            spark, root=str(tmp_path / "p"), compact_every=2
        )
        for b in range(4):
            store.append(_bands(spark, [(b, 0, f"h{b}")]), b)
        probe = _bands(spark, [(100, 0, "h2"), (101, 0, "nope")])
        hits = {r["doc_id"] for r in store.probe(probe).collect()}
        assert hits == {100}
        store.cleanup()


class TestQ296BehaviorPin:
    def test_q296_per_batch_writes_are_o_batch(self, spark):
        import sciencebeam_parser_spark.queries.curation_ops as co
        from sciencebeam_parser_spark.queries.registry import REGISTRY

        out = (
            REGISTRY["q296_streaming_dedup_index_growth"]
            .build(spark, SF_DIR)
            .collect()
        )
        assert len(out) > 0
        stats = co._LAST_Q296_STORE_STATS
        per_append = stats["rows_written_per_append"]
        assert stats["n_batches"] >= 2
        assert len(per_append) == stats["n_batches"]
        # O(batch) pin: a batch of B docs emits ≤ 4 bands per doc, so an
        # append may write at most 4·B rows — the r6 accumulator shape
        # re-materialized the FULL index per batch, so append k would
        # have written ~sum(bands of batches 0..k) and tripped this
        from sciencebeam_parser_spark.queries.registry import table

        n_docs = table(spark, SF_DIR, "documents").count()
        batch_size = max(100, (n_docs + 4) // 5)
        assert max(per_append) <= 4 * batch_size
        # compaction ran mid-stream (compact_every=3 over ~5 batches)
        assert stats["n_compactions"] >= 1
        # amortized rewrite bound: ≤ one pass over the bands per
        # compaction, not one per batch
        total_bands = sum(per_append)
        assert stats["rows_compacted"] <= stats["n_compactions"] * total_bands


class TestQ297CompactionExecute:
    def test_rewrite_preserves_every_row(self, spark):
        from sciencebeam_parser_spark.queries.registry import REGISTRY, table

        rows = (
            REGISTRY["q297_compaction_execute"].build(spark, SF_DIR).collect()
        )
        n_docs = table(spark, SF_DIR, "documents").count()
        n_cells = (
            table(spark, SF_DIR, "documents")
            .select("source", "lang")
            .distinct()
            .count()
        )
        # in-query asserts already pinned files_before == n_cells,
        # files_after == n_bins < files_before; here: content totals
        assert sum(r["n_docs"] for r in rows) == n_docs
        assert sum(r["n_cells"] for r in rows) == n_cells
        assert len(rows) < n_cells  # genuinely fewer files than cells


class TestPlanPins:
    def test_probe_plan_is_left_semi_scan(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a")]), 0)
        plan = (
            store.probe(_bands(spark, [(2, 0, "a")]))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # read-only existence probe: a semi join over the parquet scan,
        # and the write-path's old distinct-the-index shape is absent
        assert "LeftSemi" in plan
        assert "Scan parquet" in plan
