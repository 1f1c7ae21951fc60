"""Optimistic concurrency control for the on-disk stores (round 8;
hardened round 9).

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

Round 9 closes the two gaps the round-8 contract documented:

- **The compare+replace pair is now atomic on POSIX filesystems**: the
  whole commit (re-read → compare → stamp → write → replace) runs under
  an ``flock`` on a per-store lock file, taken on a FRESH file
  descriptor per commit so it excludes both other processes AND other
  threads of the same process (BSD ``flock`` locks belong to the open
  file description, not the process — unlike POSIX ``lockf`` record
  locks, which a sibling thread would sail through). Losers still get
  the same deterministic ``ConcurrentWriteError``; the lock only closes
  the microsecond compare-vs-replace window, it never turns OCC into
  pessimistic waiting (it is held for one JSON read + one rename). On an
  object store without ``flock`` semantics the sequence-number protocol
  maps to conditional-put (ETag / if-match), which makes the same
  compare atomic server-side.
- **The tmp file is unique per writer** (``meta.json.tmp.<pid>.<token>``)
  so a racing loser can never publish or corrupt the winner's
  half-written bytes through a shared tmp path (ADVICE r8) — even on
  filesystems where the advisory lock is not honored.

``retrying`` is the ergonomics half of the contract: a
``ConcurrentWriteError`` loser whose mutation carries an idempotence
token can always just re-run the mutation against fresh state (if the
first attempt actually committed, the token dedupe turns the replay
into a no-op), so the streaming sinks — the realistic multi-writer
collision point (a CDC stream racing a manual backfill) — wrap their
store commits in it.
"""

from __future__ import annotations

import itertools
import json
import os

try:
    import fcntl

    _HAVE_FLOCK = True
except ImportError:  # non-POSIX: fall back to compare-then-replace
    _HAVE_FLOCK = False

# process-unique suffix counter for tmp names (pid alone is not enough:
# two THREADS of one process share the pid)
_TMP_COUNTER = itertools.count()


class ConcurrentWriteError(RuntimeError):
    """Another writer committed to the store between this operation's
    begin and its commit. The store on disk is consistent (the other
    writer's commit is intact; this operation's data files are invisible
    orphans) — re-open the store and retry on fresh state (or wrap the
    mutation in ``occ.retrying``; with an idempotence token the retry is
    provably safe)."""


def disk_seq(meta_path: str) -> int | None:
    """The committed commit sequence on disk; ``None`` if the store does
    not exist yet. Pre-OCC metas (rounds ≤ 7) read as 0."""
    if not os.path.isfile(meta_path):
        return None
    with open(meta_path) as f:
        return int(json.load(f).get("commit_seq", 0))


def commit_meta(
    meta: dict, meta_path: str, expect: int | None, op: str
) -> int:
    """The atomic commit: under the store's ``flock`` (where available),
    re-read the on-disk sequence, fail loudly if it moved since
    ``expect`` was captured, else stamp ``meta`` with the next sequence
    number and publish it via a unique-tmp ``os.replace``. Returns the
    new committed sequence."""
    store_dir = os.path.dirname(meta_path)
    os.makedirs(store_dir, exist_ok=True)
    lock_fd = None
    if _HAVE_FLOCK:
        # fresh fd per commit: flock is per-open-file-description, so
        # this excludes sibling threads as well as other processes
        lock_fd = os.open(
            os.path.join(store_dir, ".meta.lock"),
            os.O_CREAT | os.O_RDWR,
        )
        fcntl.flock(lock_fd, fcntl.LOCK_EX)
    try:
        disk = disk_seq(meta_path)
        if disk != expect:
            raise ConcurrentWriteError(
                f"{op}: store at {store_dir!r} advanced from commit_seq "
                f"{expect} to {disk} since this operation began — a "
                f"concurrent writer committed first (single-writer "
                f"contract); re-open the store and retry against its "
                f"current state"
            )
        meta["commit_seq"] = (expect or 0) + 1
        # unique per-writer tmp: a loser that raced past a (missing/
        # unhonored) lock can clobber only its OWN tmp, never the bytes
        # the winner is about to publish
        tmp = (
            f"{meta_path}.tmp.{os.getpid()}.{next(_TMP_COUNTER)}"
        )
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, meta_path)
        return int(meta["commit_seq"])
    finally:
        if lock_fd is not None:
            fcntl.flock(lock_fd, fcntl.LOCK_UN)
            os.close(lock_fd)


def retrying(fn, *, attempts: int = 3):
    """Run ``fn()`` and, on ``ConcurrentWriteError``, re-run it against
    fresh state up to ``attempts`` total tries (the store mutations call
    ``_occ_begin`` themselves, so a plain re-invocation re-reads the
    winner's committed meta). Safe whenever the mutation is idempotent
    under replay — which every token-carrying store commit is: if the
    losing attempt actually committed before the error surfaced (it
    cannot, but a caller-level crash-retry might), the token dedupe
    returns the committed version instead of double-applying. The last
    failure propagates."""
    last: ConcurrentWriteError | None = None
    for _ in range(max(1, attempts)):
        try:
            return fn()
        except ConcurrentWriteError as e:
            last = e
    raise last
