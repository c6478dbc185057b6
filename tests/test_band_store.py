"""Append-only band store (VERDICT r6 #1, r7 #3/#4): the
O(batch)-not-O(index) write-path pin, versioned-manifest OCC commits,
band-partitioned stats-pruned probes, executed compaction, vacuum, and
the q296 end-to-end behavior pin."""
from __future__ import annotations

import os
import threading

import pytest

from sciencebeam_parser_spark.operators.band_store import (
    AppendOnlyBandStore,
)
from sciencebeam_parser_spark.sinks.versioned_manifest import (
    read_head,
    read_version,
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

    def test_uncommitted_shard_is_invisible(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a")]), 0)
        # a crashed attempt's orphan shard (written, never committed)
        orphan = _bands(spark, [(9, 0, "zz")])
        orphan.select("band_hash").write.parquet(
            os.path.join(store.root, "bands-batch-orphan/band_idx=0")
        )
        probe = _bands(spark, [(5, 0, "zz")])
        assert store.probe(probe).count() == 0


class TestVersionedCommits:
    def test_each_append_commits_one_version(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a")]), 0)
        assert read_head(store.root) == 0
        store.append(_bands(spark, [(2, 0, "b")]), 1)
        assert read_head(store.root) == 1
        # version files are immutable history: v0 still reads back
        v0 = read_version(store.root, 0)
        assert [e["batch_id"] for e in v0] == [0]
        v1 = read_version(store.root, 1)
        assert sorted(e["batch_id"] for e in v1) == [0, 1]

    def test_entries_carry_band_and_hash_stats(self, spark, store):
        store.append(
            _bands(spark, [(1, 0, "aa"), (1, 0, "cc"), (1, 1, "mm")]), 0
        )
        by_band = {e["band_idx"]: e for e in store.entries()}
        assert set(by_band) == {0, 1}
        assert by_band[0]["min_hash"] == "aa"
        assert by_band[0]["max_hash"] == "cc"
        assert by_band[0]["rows"] == 2
        assert by_band[1]["rows"] == 1
        assert all(e["path"].startswith("bands-batch-") for e in by_band.values())

    def test_concurrent_appends_both_land_via_occ(self, spark, tmp_path):
        # two writers race: put-if-absent versions mean neither clobbers
        s = AppendOnlyBandStore(spark, root=str(tmp_path / "r"))
        dfs = {
            1: _bands(spark, [(1, 0, "a")]),
            2: _bands(spark, [(2, 0, "b")]),
        }
        barrier = threading.Barrier(2)
        errs = []

        def run(bid):
            try:
                barrier.wait()
                s.append(dfs[bid], bid)
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        ts = [threading.Thread(target=run, args=(b,)) for b in (1, 2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        assert read_head(s.root) == 1  # two commits, versions 0 and 1
        hashes = {r["band_hash"] for r in s.read_index().collect()}
        assert hashes == {"a", "b"}  # no lost update
        s.cleanup()

    def test_concurrent_append_and_compact_resolve(self, spark, tmp_path):
        # VERDICT r7 #4: the append-vs-OPTIMIZE race on one protocol —
        # whoever loses the version CAS re-reads and retries; compaction
        # aborts if its sources vanished. Final state must contain every
        # appended row exactly once per (band, hash).
        s = AppendOnlyBandStore(
            spark, root=str(tmp_path / "ac"), target_bytes=1 << 30
        )
        for b in range(4):
            s.append(_bands(spark, [(b, 0, f"h{b}")]), b)
        barrier = threading.Barrier(2)
        errs = []

        def appender():
            try:
                barrier.wait()
                s.append(_bands(spark, [(99, 0, "h99")]), 99)
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        def compactor():
            try:
                barrier.wait()
                s.compact()
            except Exception as exc:  # pragma: no cover
                errs.append(exc)

        ts = [
            threading.Thread(target=appender),
            threading.Thread(target=compactor),
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        hashes = sorted(
            r["band_hash"] for r in s.read_index().collect()
        )
        assert hashes == ["h0", "h1", "h2", "h3", "h99"]
        s.cleanup()


class TestProbePruning:
    def test_probe_prunes_untouched_bands(self, spark, store):
        # VERDICT r7 #3 pin: an increment touching a SUBSET of bands
        # reads fewer entries than the manifest lists
        # two rows per band cell -> wide [a_, z_] hash envelopes, so
        # only the band filter prunes here (range pruning has its own
        # test below)
        store.append(
            _bands(
                spark,
                [(1, b, f"a{b}") for b in range(4)]
                + [(1, b, f"z{b}") for b in range(4)],
            ),
            0,
        )
        probe = _bands(spark, [(9, 0, "a0"), (9, 1, "m1")])
        hits = {r["doc_id"] for r in store.probe(probe).collect()}
        assert hits == {9}
        assert store.probe_entries_total[-1] == 4
        assert store.probe_entries_scanned[-1] == 2  # bands 0 and 1 only

    def test_probe_prunes_disjoint_hash_ranges(self, spark, store):
        # stats skipping (q299's rule) on the band_hash envelope
        store.append(
            _bands(spark, [(1, 0, "aa"), (1, 0, "ab")]), 0
        )
        store.append(
            _bands(spark, [(2, 0, "xa"), (2, 0, "xb")]), 1
        )
        probe = _bands(spark, [(9, 0, "ab")])
        hits = {r["doc_id"] for r in store.probe(probe).collect()}
        assert hits == {9}
        assert store.probe_entries_total[-1] == 2
        # the [xa, xb] entry cannot overlap the [ab, ab] envelope
        assert store.probe_entries_scanned[-1] == 1

    def test_pruned_probe_remains_correct(self, spark, store):
        store.append(
            _bands(spark, [(1, 0, "aa"), (2, 1, "bb"), (3, 2, "cc")]), 0
        )
        probe = _bands(
            spark,
            [(10, 0, "aa"), (11, 1, "zz"), (12, 2, "cc"), (13, 3, "dd")],
        )
        hits = {r["doc_id"] for r in store.probe(probe).collect()}
        assert hits == {10, 12}


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
        assert len(store.entries()) == 10  # 5 batches x 2 band cells
        store.compact()
        # per-band next-fit: each band's five undersized cells pack into
        # ONE merged cell (bands never merge — pruning depends on it)
        ents = store.entries()
        assert len(ents) == 2
        assert sorted(e["band_idx"] for e in ents) == [0, 1]
        assert all(e["path"].startswith("compact-") for e in ents)
        after_df = store.read_index()
        after = {
            (r["band_idx"], r["band_hash"]) for r in after_df.collect()
        }
        assert after == before  # content equality
        # the deferred distinct ran: 'shared' collapsed from 5 rows to 1
        assert after_df.count() == len(before)
        # pre-compaction cells remain ON DISK until vacuum (time travel)
        assert os.path.exists(
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
        assert len(store.entries()) == 3
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

    def test_reopened_store_compaction_never_clobbers(self, spark, tmp_path):
        # ADVICE r7 regression: the old per-instance generation counter
        # reset to 0 on reopen and could overwrite a still-referenced
        # compact-g0001-* dir; nonce names make that impossible
        root = str(tmp_path / "reopen")
        s1 = AppendOnlyBandStore(spark, root=root)
        for b in range(3):
            s1.append(_bands(spark, [(b, 0, f"h{b}")]), b)
        s1.compact()
        first_compact = [e["path"] for e in s1.entries()]
        assert len(first_compact) == 1
        # a NEW instance on the same root (fresh counters)
        s2 = AppendOnlyBandStore(spark, root=root)
        for b in range(3, 6):
            s2.append(_bands(spark, [(b, 0, f"h{b}")]), b)
        s2.compact()
        hashes = sorted(r["band_hash"] for r in s2.read_index().collect())
        assert hashes == [f"h{b}" for b in range(6)]
        # the first compaction's output was merged, not overwritten:
        # its path is gone from entries but was never reused as a name
        second_paths = [e["path"] for e in s2.entries()]
        assert len(second_paths) == 1
        assert second_paths != first_compact
        s2.cleanup()


class TestVacuum:
    def test_vacuum_reclaims_pre_compaction_cells(self, spark, tmp_path):
        store = AppendOnlyBandStore(spark, root=str(tmp_path / "v"))
        for b in range(4):
            store.append(_bands(spark, [(b, 0, f"h{b}")]), b)
        store.compact()
        assert os.path.exists(
            os.path.join(store.root, "bands-batch-00000000")
        )
        deleted = store.vacuum(retain_versions=1)
        assert deleted  # the four superseded batch cells went away
        assert not os.path.exists(
            os.path.join(store.root, "bands-batch-00000000")
        )
        # the live index is untouched
        hashes = sorted(r["band_hash"] for r in store.read_index().collect())
        assert hashes == ["h0", "h1", "h2", "h3"]
        # manifests older than the retention window are gone; head stays
        head = read_head(store.root)
        assert head is not None
        assert not os.path.exists(
            os.path.join(store.root, "_MANIFEST-v0.json")
        )
        store.cleanup()

    def test_vacuum_removes_uncommitted_orphans(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a")]), 0)
        orphan = os.path.join(store.root, "compact-deadbeef-band00-b0000")
        _bands(spark, [(9, 0, "zz")]).select("band_hash").write.parquet(
            orphan
        )
        deleted = store.vacuum(retain_versions=1)
        assert "compact-deadbeef-band00-b0000" in deleted
        assert not os.path.exists(orphan)

    def test_vacuum_respects_retention(self, spark, store):
        store.append(_bands(spark, [(1, 0, "a")]), 0)
        store.append(_bands(spark, [(2, 0, "b")]), 1)
        # retain both versions: nothing referenced by either is deleted
        assert store.vacuum(retain_versions=2) == []
        assert os.path.exists(
            os.path.join(store.root, "_MANIFEST-v0.json")
        )


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
