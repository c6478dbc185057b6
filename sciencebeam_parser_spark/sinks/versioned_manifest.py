"""Versioned manifest commits with optimistic concurrency control.

The manifest-store queries (q299 DELETE + time travel, q300 MERGE) commit
each table version as an immutable ``_MANIFEST-v<k>.json`` plus a
``_HEAD`` pointer. Two writers racing to publish the same version number
is the classic lakehouse conflict (Delta's optimistic transaction
protocol): the commit must be an atomic PUT-IF-ABSENT on the version
file, the loser must observe the conflict and retry against the winner's
snapshot — never silently clobber it.

Locally the put-if-absent primitive is ``open(..., mode="x")`` (O_EXCL —
atomic on POSIX); on an object store it is the conditional-put /
if-none-match request the same code path would issue. ``_HEAD`` then
advances monotonically via tmp-write + ``os.replace`` (readers of a
version file never see a torn manifest either way, because version files
are immutable once created).

Retried work keyed by content (the band store's batchId shards) keeps
last-write-wins instead — idempotent re-delivery is not a conflict.
This module is for VERSION-numbered commits, where two DIFFERENT
transactions must never both believe they own v<k>.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional


class ManifestConflictError(RuntimeError):
    """Another writer already committed this version number."""


def manifest_path(store: str, version: int) -> str:
    return os.path.join(store, f"_MANIFEST-v{version}.json")


def commit_version(store: str, version: int, entries: List[dict]) -> None:
    """Atomically publish version ``version``; raise on conflict.

    The version file is created with O_EXCL — if a concurrent writer got
    there first, this transaction LOST and must re-read the winner's
    snapshot, re-validate (or re-apply) its changes, and retry at the
    next version number. ``_HEAD`` only advances after the version file
    durably exists, and never moves backwards.
    """
    payload = json.dumps({"version": version, "shards": entries})
    try:
        with open(manifest_path(store, version), "x", encoding="utf-8") as fh:
            fh.write(payload)
    except FileExistsError as exc:
        raise ManifestConflictError(
            f"version {version} already committed by another writer"
        ) from exc
    head = os.path.join(store, "_HEAD")
    current = read_head(store)
    if current is None or version > current:
        with open(head + ".tmp", "w", encoding="utf-8") as fh:
            fh.write(str(version))
        os.replace(head + ".tmp", head)


def read_head(store: str) -> Optional[int]:
    try:
        with open(os.path.join(store, "_HEAD"), encoding="utf-8") as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def read_version(store: str, version: int) -> List[dict]:
    with open(manifest_path(store, version), encoding="utf-8") as fh:
        return json.load(fh)["shards"]
