"""Append-only persisted MinHash-LSH band index (VERDICT r6 #1).

The streaming incremental-dedup loop (q296) must maintain a band index
across micro-batches.  The naive accumulator shape — ``union`` the new
bands into the in-memory index, ``distinct`` the FULL merged relation and
re-materialize it per batch — pays O(total index) per arriving increment,
i.e. quadratic total work in the number of batches: the classic
daily-rewrite compaction anti-shape at 100 TB.

This store replaces it with the accumulate-don't-rebuild shape (reference
analog: the training pipeline's cache that appends new documents instead
of regenerating, ``training/cli/generate_data.py:51-56``):

* ``append(bands, batch_id)`` writes ONLY the batch's own band rows as a
  batchId-keyed parquet shard (same idempotence contract as the q283
  streaming sink: a retried batch overwrites the SAME path, last write
  wins, so no ``distinct`` safety net is needed);
* a ``_MANIFEST.json`` lists committed shards; commits are atomic
  (``os.replace``), so a manifest reader sees either the old or the new
  inventory, never a torn one;
* ``probe(bands)`` is a ``left_semi`` join against the manifest-listed
  shards — a read-only scan, no rewrite.  Duplicate band rows across
  shards are harmless to a semi-join, so the store never re-distincts
  the index on the write path;
* every ``compact_every`` appends, undersized shards are bin-packed
  (next-fit over the file inventory in manifest order — the q257
  planner's packing rule) and rewritten as coalesced shards with a
  ``dropDuplicates`` flattening pass, then the manifest atomically
  swaps.  Compaction amortizes to one extra pass over the index per N
  batches instead of one per batch.

Per-batch cost is therefore O(batch write) + O(probe scan), and the
behavior counters (``rows_written_per_append``, ``rows_compacted``)
make that pinnable in tests: the write path must never write more rows
than the batch produced.

At 100 TB the shards live on the object store, the probe side is a
bucketed/partitioned layout on (band_idx, band_hash) so the semi-join
prunes, and per-bin compaction rewrites submit as concurrent jobs; the
commit protocol is unchanged.
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

_BAND_SCHEMA = "band_idx int, band_hash string"


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _dir_rows(path: str) -> int:
    """Exact committed row count from the parquet footers (no Spark job)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


class AppendOnlyBandStore:
    """Manifest-committed append-only parquet store of LSH band rows."""

    def __init__(
        self,
        spark: SparkSession,
        root: Optional[str] = None,
        compact_every: int = 0,
        target_bytes: int = 64 * 1024 * 1024,
        max_shard_files: int = 8,
    ):
        self.spark = spark
        self.root = root or tempfile.mkdtemp(prefix="sbp_bandstore_")
        os.makedirs(self.root, exist_ok=True)
        self.compact_every = compact_every
        self.target_bytes = target_bytes
        # a batch inherits the upstream partition count (32 on the test
        # box) but a small increment doesn't need 32 tiny files — the
        # probe pays a footer read per file per batch. coalesce (no
        # shuffle) caps it; at 100 TB raise this to keep the write
        # parallel (the lever is increment size / healthy file size).
        self.max_shard_files = max_shard_files
        # behavior counters — the O(batch)-not-O(index) pin reads these
        self.rows_written_per_append: List[int] = []
        self.rows_compacted = 0
        self.n_compactions = 0
        self._appends_since_compact = 0
        self._generation = 0

    # -- manifest commit protocol (q281/q283 contract) ---------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_MANIFEST.json")

    def shards(self) -> List[str]:
        try:
            with open(self._manifest_path(), encoding="utf-8") as fh:
                manifest = json.load(fh)
        except FileNotFoundError:
            return []
        return [s["path"] for s in manifest["shards"]]

    def _commit(self, shard_names: List[str]) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"shards": [{"path": s} for s in shard_names]}, fh)
        os.replace(tmp, self._manifest_path())  # atomic swap

    # -- read/probe path ----------------------------------------------------

    def read_index(self) -> Optional[DataFrame]:
        shards = self.shards()
        if not shards:
            return None
        paths = [os.path.join(self.root, s) for s in shards]
        return self.spark.read.schema(_BAND_SCHEMA).parquet(*paths)

    def probe(self, bands_df: DataFrame) -> DataFrame:
        """doc_ids of ``bands_df`` whose bands collide with the index.

        Read-only ``left_semi`` scan — existence is all the dedup gate
        needs, so duplicate index rows are harmless and nothing is
        rewritten.
        """
        index = self.read_index()
        if index is None:
            return (
                bands_df.select("doc_id").limit(0)
            )
        return (
            bands_df.join(index, ["band_idx", "band_hash"], "left_semi")
            .select("doc_id")
            .distinct()
        )

    # -- write path -----------------------------------------------------------

    def append(self, bands_df: DataFrame, batch_id: int) -> None:
        """Append ONLY this batch's bands, keyed by batchId.

        A retried batch overwrites the same shard path (last write wins)
        and re-commits the same manifest entry — idempotent without any
        full-index distinct.
        """
        shard = f"bands-batch-{batch_id:08d}"
        path = os.path.join(self.root, shard)
        (
            bands_df.select("band_idx", "band_hash")
            .coalesce(self.max_shard_files)
            .write.mode("overwrite")
            .parquet(path)
        )
        self.rows_written_per_append.append(_dir_rows(path))
        committed = self.shards()
        if shard not in committed:
            committed.append(shard)
        self._commit(committed)
        self._appends_since_compact += 1
        if self.compact_every and self._appends_since_compact >= self.compact_every:
            self.compact()

    # -- compaction (the q257 plan, executed) --------------------------------

    def compact(self) -> None:
        """Bin-pack undersized shards and atomically swap the manifest.

        Next-fit over the manifest-ordered file inventory (bin =
        floor(cumulative-bytes-before / target) — exactly q257's packing
        window, executed): each bin's shards are read back, flattened
        with ``dropDuplicates`` (the deferred ``distinct`` the write path
        skips), and rewritten as ONE coalesced shard.  The inventory is
        file-count-sized, so the driver-side plan is O(#files); per-bin
        rewrites are independent jobs (concurrent on a real cluster).
        """
        shards = self.shards()
        small = [
            s
            for s in shards
            if _dir_bytes(os.path.join(self.root, s)) < self.target_bytes
        ]
        self._appends_since_compact = 0
        if len(small) < 2:
            return
        keep = [s for s in shards if s not in small]
        # next-fit packing in manifest order (q257's rule)
        bins: List[List[str]] = []
        running = 0
        for s in small:
            size = _dir_bytes(os.path.join(self.root, s))
            bin_id = running // self.target_bytes
            if bin_id >= len(bins):
                bins.append([])
            bins[bin_id].append(s)
            running += size
        self._generation += 1
        new_shards: List[str] = []
        for i, members in enumerate(bins):
            out = f"compact-g{self._generation:04d}-b{i:04d}"
            out_path = os.path.join(self.root, out)
            (
                self.spark.read.schema(_BAND_SCHEMA)
                .parquet(*[os.path.join(self.root, m) for m in members])
                .dropDuplicates(["band_idx", "band_hash"])
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(out_path)
            )
            self.rows_compacted += _dir_rows(out_path)
            new_shards.append(out)
        # atomic swap: readers see the old inventory or the new, never both
        self._commit(keep + new_shards)
        self.n_compactions += 1
        for s in small:
            shutil.rmtree(os.path.join(self.root, s), ignore_errors=True)

    def cleanup(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
