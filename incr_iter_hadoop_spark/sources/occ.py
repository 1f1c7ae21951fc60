"""Optimistic concurrency control for the on-disk stores (round 8).

Both stores (``PreserveStore``, ``Scd2Store``) commit every mutation
through ONE atomic meta-file replace. OCC adds the lakehouse-style
compare step at that commit point (Delta/Iceberg optimistic commit
discipline): each mutation captures the store's on-disk commit sequence
number when it BEGINS, and the commit re-reads the file and fails loudly
with ``ConcurrentWriteError`` if another writer advanced it in between —
so of two concurrent writers exactly one wins and the loser gets a
deterministic error instead of silently clobbering the winner's era /
version (the race previously only documented at ``scd2_store.py``'s
single-writer note).

The check-then-replace pair is itself not atomic (no file lock), so this
is a loud-failure contract for the documented single-writer deployment —
it turns a lost-update race into an error on the loser in every
interleaving where the winner's commit lands first — not a distributed
lock service. On a real cluster the meta file lives on an object store
whose conditional-put (ETag / if-match) would make the same compare
atomic; the sequence-number protocol here is exactly what such a backend
needs.
"""

from __future__ import annotations

import json
import os


class ConcurrentWriteError(RuntimeError):
    """Another writer committed to the store between this operation's
    begin and its commit. The store on disk is consistent (the other
    writer's commit is intact; this operation's data files are invisible
    orphans) — re-open the store and retry on fresh state."""


def disk_seq(meta_path: str) -> int | None:
    """The committed commit sequence on disk; ``None`` if the store does
    not exist yet. Pre-OCC metas (rounds ≤ 7) read as 0."""
    if not os.path.isfile(meta_path):
        return None
    with open(meta_path) as f:
        return int(json.load(f).get("commit_seq", 0))


def stamp_or_raise(
    meta: dict, meta_path: str, expect: int | None, op: str
) -> None:
    """The commit-time compare step: re-read the on-disk sequence, fail
    loudly if it moved since ``expect`` was captured, else stamp ``meta``
    with the next sequence number (the caller's atomic replace then
    publishes it)."""
    disk = disk_seq(meta_path)
    if disk != expect:
        raise ConcurrentWriteError(
            f"{op}: store at {os.path.dirname(meta_path)!r} advanced from "
            f"commit_seq {expect} to {disk} since this operation began — a "
            f"concurrent writer committed first (single-writer contract); "
            f"re-open the store and retry against its current state"
        )
    meta["commit_seq"] = (expect or 0) + 1
