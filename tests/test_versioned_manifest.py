"""Optimistic-concurrency manifest commits (the lakehouse conflict
protocol behind q299/q300's version files)."""
from __future__ import annotations

import os

import pytest

from sciencebeam_parser_spark.sinks.versioned_manifest import (
    ManifestConflictError,
    commit_version,
    read_head,
    read_version,
)


class TestOptimisticConcurrency:
    def test_put_if_absent_conflict(self, tmp_path):
        store = str(tmp_path)
        commit_version(store, 0, [{"path": "a"}])
        # writer A wins v1
        commit_version(store, 1, [{"path": "a"}, {"path": "b"}])
        # writer B raced to v1 with a DIFFERENT transaction: must lose
        # loudly, never clobber
        with pytest.raises(ManifestConflictError):
            commit_version(store, 1, [{"path": "a"}, {"path": "c"}])
        # the winner's snapshot is intact
        assert [e["path"] for e in read_version(store, 1)] == ["a", "b"]
        # loser retries against the winner's snapshot at the next version
        commit_version(store, 2, [{"path": "a"}, {"path": "b"}, {"path": "c"}])
        assert read_head(store) == 2

    def test_head_is_monotonic(self, tmp_path):
        store = str(tmp_path)
        commit_version(store, 0, [])
        commit_version(store, 5, [])
        # a late, lower-numbered commit (e.g. a straggling backfill of a
        # historical version) must not move HEAD backwards
        commit_version(store, 3, [])
        assert read_head(store) == 5

    def test_version_files_are_immutable_history(self, tmp_path):
        store = str(tmp_path)
        commit_version(store, 0, [{"path": "x"}])
        commit_version(store, 1, [{"path": "y"}])
        # time travel: every committed version stays readable verbatim
        assert [e["path"] for e in read_version(store, 0)] == ["x"]
        assert [e["path"] for e in read_version(store, 1)] == ["y"]

    def test_empty_store_head_none(self, tmp_path):
        assert read_head(str(tmp_path)) is None

    def test_no_torn_temp_files(self, tmp_path):
        store = str(tmp_path)
        commit_version(store, 0, [{"path": "a"}])
        leftovers = [f for f in os.listdir(store) if f.endswith(".tmp")]
        assert leftovers == []


class TestRealRace:
    def test_eight_threads_one_winner(self, tmp_path):
        import threading

        store = str(tmp_path)
        outcomes = []
        lock = threading.Lock()

        def writer(i):
            try:
                commit_version(store, 1, [{"path": f"writer-{i}"}])
                with lock:
                    outcomes.append(("win", i))
            except ManifestConflictError:
                with lock:
                    outcomes.append(("lose", i))

        threads = [
            threading.Thread(target=writer, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wins = [i for (o, i) in outcomes if o == "win"]
        assert len(wins) == 1  # O_EXCL: exactly one writer owns v1
        assert len(outcomes) == 8
        # the snapshot is the winner's, intact
        assert read_version(store, 1) == [{"path": f"writer-{wins[0]}"}]
