"""SCD Type-2 dimension store: the preserve-store layer mechanism applied
to versioned dimensions (round-6 unification of I6 with the r5 SCD2
operator).

``operators/incremental.py:scd2_apply`` is a pure transformation — it
versions a dimension inside one plan but persists nothing, so history was
only as durable as the caller's output. This store gives versioned
dimensions the same crash-consistency and time-travel contract the
refresh state has (``sources/preserve_store.py``, the MRBG-store analogue
— IFile.PreserveFile, incr-hadoop-0.1/src/mapred/org/apache/hadoop/
mapred/IFile.java:478-1100 — re-expressed as immutable layers):

- **Base** = bucketed, key-sorted external parquet: the dimension snapshot
  at era 0 (every row implicitly ``valid_from = 0``). Bucketing by the
  dimension key keeps point-in-time joins against co-bucketed facts
  exchange-free on the store side.
- **An era is a layer, not a rewrite**: ``apply_era(changes)`` writes ONLY
  the change rows (new attribute values per key, inserts for new keys) to
  ``layers/e<N>/`` — O(|changes|) I/O, append-only, history never touched.
- **Closes are derived, not stored**: a version opened at era *e* is
  closed by the NEXT version of the same key, so ``valid_to`` is
  ``lead(valid_from)`` over the key window at read time — one window, no
  stored mutation of prior rows. (``scd2_apply`` materializes the same
  close with a semi-join; deriving it keeps layers strictly append-only,
  which is what makes the commit trivial.)
- **The meta era bump is the atomic commit point** (the preserve store's
  version-bump discipline), and since r9 the layer write itself targets a
  UNIQUE STAGING directory renamed onto ``layers/e<N>`` inside the same
  commit critical section (``occ.commit_meta``): a crash before the
  commit leaves only an invisible ``.stage-*`` orphan (reclaimed by
  ``vacuum()``), and a concurrent loser's data files physically cannot
  land on a committed era name.
- **Time travel for free**: ``history_as_of(era)`` folds base + layers
  1..era; every committed era stays readable forever (layers are
  immutable and never compacted away — an SCD2 history IS its layers).

Scale: the base shuffle is paid once at ``initialize``; each era costs
O(|changes|) write. ``history_as_of`` unions the base scan with the layer
scans and pays one key-window shuffle — at 100 TB the window runs on the
dimension (small next to facts), and the downstream point-in-time join
stays an equi-join on the key with the validity range as a residual
filter (see ``scd2_point_in_time_join``), hash-joinable at any scale.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import occ

_META = "meta.json"
# idempotence tokens retained for this many trailing eras/versions (replays
# only ever target the most recent uncommitted batch; see apply_era)
_TOKEN_KEEP = 8


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)


class Scd2Store:
    """On-disk SCD Type-2 history: era-layered, crash-consistent,
    time-traveling. One instance per store path; safe to re-open across
    sessions (meta.json carries the schema and bucketing spec).

    CONCURRENCY CONTRACT (r8, hardened r9): single writer, many readers.
    The contract is ENFORCED optimistically — every mutation validates at
    its atomic meta commit (flock-guarded compare + staged-data publish +
    meta replace, ``occ.commit_meta``) that no other writer advanced the
    store since the mutation began, and the loser raises
    ``ConcurrentWriteError`` with the store unharmed: its staged data can
    never land on a committed era name. Readers never block and never
    observe partial commits. A loser can always re-run against fresh
    state — wrap token-carrying mutations in ``occ.retrying`` (the
    streaming sinks do) and the retry is idempotent under replay."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        stage_retention_sec: float | None = None,
    ):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._meta: dict | None = None
        # vacuum/sweep retention for in-flight staged artifacts (r10):
        # None → occ.STAGE_RETENTION_SEC. Widen for stores whose
        # mutations stage for longer than the default window (a sweep
        # must never reclaim a LIVE writer's staging); narrow in
        # tests/ops that need fast residue reclamation.
        self.stage_retention_sec = stage_retention_sec

    # -- metadata (same atomic-replace discipline as PreserveStore) --------

    def exists(self) -> bool:
        return os.path.isfile(os.path.join(self.path, _META))

    @property
    def meta(self) -> dict:
        if self._meta is None:
            with open(os.path.join(self.path, _META)) as f:
                self._meta = json.load(f)
        return self._meta

    def _meta_path(self) -> str:
        return os.path.join(self.path, _META)

    def _occ_begin(self) -> int | None:
        """Begin a mutation (single-writer OCC, round 8): drop the cached
        meta so the operation reads the CURRENT committed state, and
        capture the on-disk commit sequence the commit will be validated
        against (``_write_meta(..., expect=...)``)."""
        self._meta = None
        return occ.disk_seq(self._meta_path())

    def _write_meta(
        self,
        meta: dict,
        *,
        expect: int | None,
        op: str = "Scd2Store",
        publish=None,
    ) -> None:
        """Atomic commit point with the OCC compare step: if another
        writer committed since ``expect`` was captured at ``_occ_begin``,
        raise ``ConcurrentWriteError`` instead of silently clobbering the
        winner's era (exactly-one-of-two-writers-wins contract; pinned by
        tests/test_store_adversarial.py). The whole compare+stamp+replace
        runs under the store's ``flock`` with a unique per-writer tmp
        file (``occ.commit_meta``, r9), so the round-8 microsecond
        compare-vs-replace window is closed on POSIX filesystems.
        ``publish`` renames this mutation's STAGED data directories onto
        their final era names inside the same critical section — see
        ``occ.commit_meta``."""
        occ.commit_meta(
            meta,
            self._meta_path(),
            expect,
            op,
            publish,
            retention_sec=self.stage_retention_sec,
        )
        self._meta = meta

    @property
    def key_cols(self) -> list[str]:
        return list(self.meta["key_cols"])

    @property
    def era(self) -> int:
        """Latest COMMITTED era (0 = base snapshot only)."""
        return int(self.meta["era"])

    @property
    def open_end(self) -> int:
        return int(self.meta["open_end"])

    @property
    def snaps(self) -> list[int]:
        """Committed snapshot generations, ascending; 0 is the initialize
        base. ``history_as_of(e)`` reads from the newest generation ≤ e."""
        return sorted(int(s) for s in self.meta.get("snaps", [0]))

    @property
    def vacuumed_below(self) -> int:
        """Eras below this are unreadable (their pre-snapshot layers and
        generation bases were deleted by ``vacuum()``)."""
        return int(self.meta.get("vacuumed_below", 0))

    # -- storage -----------------------------------------------------------

    def _table_name(self, gen: int = 0) -> str:
        # the slug alone is NOT injective (/tmp/a-b and /tmp/a_b collide,
        # as do case-differing paths) and initialize() DROPs the name —
        # a short hash of the raw path makes distinct stores distinct
        # catalog entries (ADVICE r6)
        slug = re.sub(r"[^0-9a-zA-Z]+", "_", self.path).strip("_").lower()
        tag = hashlib.md5(self.path.encode()).hexdigest()[:8]
        suffix = "base" if gen == 0 else f"snap{gen}"
        return f"scd2_{slug}_{tag}_{suffix}"

    def _base_path(self, gen: int = 0) -> str:
        return os.path.join(
            self.path, "base" if gen == 0 else f"base_s{gen}"
        )

    def _layer_path(self, era: int) -> str:
        return os.path.join(self.path, f"layers/e{era}")

    def _gen_ddl(self, gen: int) -> str:
        # generation 0 stores the bare dimension (valid_from is implicitly
        # 0, nothing is deleted yet); snapshot generations persist the
        # folded multi-version history, so valid_from and the delete
        # tombstones are real columns
        ddl = self.meta["schema_ddl"]
        return (
            ddl
            if gen == 0
            else f"{ddl}, `valid_from` BIGINT, `_tombstone` BOOLEAN"
        )

    def _base(self, gen: int = 0) -> DataFrame:
        name = self._table_name(gen)
        if not self.spark.catalog.tableExists(name):
            m = self.meta
            keys = ", ".join(f"`{k}`" for k in m["key_cols"])
            self.spark.sql(
                f"CREATE TABLE {name} ({self._gen_ddl(gen)}) USING PARQUET"
                f" CLUSTERED BY ({keys}) SORTED BY ({keys})"
                f" INTO {m['num_buckets']} BUCKETS"
                f" LOCATION '{self._base_path(gen)}'"
            )
        return self.spark.table(name)

    def _gen_for(self, era: int) -> int:
        """The newest committed snapshot generation ≤ ``era`` whose
        pre-history is still on disk."""
        if era < self.vacuumed_below:
            raise ValueError(
                f"Scd2Store: era {era} was vacuumed (eras < "
                f"{self.vacuumed_below} are unreadable)"
            )
        return max(s for s in self.snaps if s <= era)

    def _layers_df(self, lo: int, hi: int) -> DataFrame | None:
        """Layers lo..hi as ONE multi-path scan with ``valid_from`` parsed
        from the layer directory name — constant plan size in era count
        (r6; same contract as PreserveStore._layers)."""
        if hi < lo:
            return None
        paths = [self._layer_path(e) for e in range(lo, hi + 1)]
        # anchored to the data-file position (layers/e<N>/part-*): an
        # unanchored leftmost match would pick up a "/layers/eN/"
        # segment from the STORE ROOT's own path (e.g. a store created
        # inside another store's layer dir) and stamp the wrong
        # valid_from on every row with no error (ADVICE r6)
        # explicit schema (the CURRENT one): no inference listing, and
        # layers written before an additive evolution (or before delete
        # support) read their missing columns as NULL instead of whatever
        # file the sampler picked — tombstone NULL normalizes to False
        ddl = self.meta["schema_ddl"] + ", `_tombstone` BOOLEAN"
        return (
            self.spark.read.schema(ddl)
            .parquet(*paths)
            .withColumn(
                "valid_from",
                F.regexp_extract(
                    F.input_file_name(), r"/layers/e(\d+)/[^/]+$", 1
                ).cast("bigint"),
            )
            .withColumn(
                "_tombstone",
                F.coalesce(F.col("_tombstone"), F.lit(False)),
            )
        )

    def _gen_pieces(
        self, era: int
    ) -> tuple[DataFrame, DataFrame | None]:
        """(generation base with a ``valid_from`` column, layers after the
        generation up to ``era`` or None). The base keeps its bucketed
        output partitioning — callers can window/join on the key with no
        Exchange on the base side."""
        g = self._gen_for(era)
        base = self._base(g)
        if g == 0:
            base = base.withColumn(
                "valid_from", F.lit(0).cast("bigint")
            ).withColumn("_tombstone", F.lit(False))
        else:
            # a generation's parquet (or a catalog entry registered before
            # delete support) may lack the column — normalize to False
            base = base.withColumn(
                "_tombstone",
                F.coalesce(F.col("_tombstone"), F.lit(False))
                if "_tombstone" in base.columns
                else F.lit(False),
            )
        return base, self._layers_df(g + 1, era)

    # -- lifecycle ---------------------------------------------------------

    def initialize(
        self,
        dim: DataFrame,
        key_cols: list[str],
        *,
        num_buckets: int = 16,
        open_end: int = 999_999,
    ) -> "Scd2Store":
        """Era-0 snapshot: every dimension row becomes the open version
        ``[0, open_end)``. One bucketed shuffle — paid exactly once.

        Same commit discipline as ``apply_era``: the base snapshot is
        STAGED first (unique directory, throwaway catalog entry) and
        renamed onto ``base`` inside the meta commit's critical section
        (r9), so a crash mid-write leaves ``exists() == False`` with only
        an invisible ``.stage-*`` orphan, and a concurrent initialize
        loser can never clobber the winner's published base.

        NULL key values are rejected (same contract as ``apply_era`` and
        ``PreserveStore``): a NULL-keyed version can never be closed by the
        key window nor matched by a point-in-time equi-join."""
        v0 = self._occ_begin()
        null_pred = None
        for k in key_cols:
            c = F.col(k).isNull()
            null_pred = c if null_pred is None else (null_pred | c)
        if dim.where(null_pred).limit(1).count():
            raise ValueError(
                f"Scd2Store.initialize: dimension contains NULL key values "
                f"in {list(key_cols)}; NULL keys cannot be versioned"
            )
        meta = {
            "key_cols": list(key_cols),
            "columns": list(dim.columns),
            "num_buckets": num_buckets,
            "open_end": open_end,
            "era": 0,
            "schema_ddl": _schema_ddl(dim),
        }
        staging = self._stage_bucketed(
            dim, num_buckets, key_cols, tag="base"
        )
        # a stale catalog entry from a previous store at this path may
        # carry the wrong schema/bucketing — drop it BEFORE the commit so
        # no window exists where it could serve the new files with the
        # old DDL; the first read re-registers from the committed meta
        # (_base), whichever meta that turns out to be
        self.spark.sql(f"DROP TABLE IF EXISTS {self._table_name()}")
        try:
            self._write_meta(
                meta,
                expect=v0,
                op="Scd2Store.initialize",
                publish=lambda: occ.publish_dir(staging, self._base_path()),
            )
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        return self

    def _stage_bucketed(
        self, df: DataFrame, n: int, keys: list[str], *, tag: str
    ) -> str:
        """Bucketed write into a UNIQUE STAGING directory (r9):
        ``bucketBy`` requires ``saveAsTable``, so the write goes through a
        throwaway catalog name pointed at the staging path and the entry
        is dropped immediately (the bucketing spec survives in meta — the
        final location is lazily re-registered by ``_base``). The O(data)
        Spark work happens here, outside the commit lock; the O(1) rename
        onto the final generation name happens inside the commit
        (``occ.commit_meta``'s publish step), so these files can never
        land on a committed name unless THIS mutation wins."""
        staging = os.path.join(self.path, occ.stage_name(tag))
        stage_tbl = (
            f"{self._table_name()}_stg"
            f"{hashlib.md5(staging.encode()).hexdigest()[:8]}"
        )
        return occ.stage_bucketed(
            self.spark, df, n, keys, staging, stage_tbl
        )

    def _stage_layer(
        self, changes: DataFrame, cols: list[str] | None = None
    ) -> str:
        """Layer write into a UNIQUE STAGING directory (r9) — the Spark
        work runs outside the commit lock; the O(1) rename onto
        ``layers/e<N>`` happens inside the commit (``occ.commit_meta``'s
        publish step). Pre-r9 the write targeted the final era path
        directly, so a loser whose write landed after the winner's commit
        could clobber the winner's same-numbered layer; staged files can
        never land on a committed name unless this mutation wins."""
        staging = os.path.join(
            self.path, "layers", occ.stage_name("layer")
        )
        changes.select(*(cols or self.meta["columns"])).write.mode(
            "overwrite"
        ).parquet(staging)
        return staging

    def apply_era(
        self,
        changes: DataFrame,
        *,
        deletes: DataFrame | None = None,
        token: str | None = None,
        snapshot_every: int | None = None,
    ) -> int:
        """Commit one era of changes (update rows for existing keys, insert
        rows for new keys; the attribute schema of the base dimension, plus
        optionally NEW columns — see below).

        **Additive schema evolution**: changes may carry attribute columns
        the store has never seen (the lakehouse ``mergeSchema`` contract —
        a dimension gains an attribute mid-history). The new columns are
        appended to the stored schema IN THE SAME atomic meta write as the
        era bump; every read from then on — any ``history_as_of`` era,
        ``pit_join``, ``snapshot`` — returns the latest schema, with NULL
        for versions written before the column existed (layers are read
        with the current explicit schema, so old files null-fill). Columns
        can only be ADDED: a change batch missing an existing column, or
        colliding with the derived ``valid_from``/``valid_to``/
        ``is_current`` names, is rejected loudly (dropping or retyping a
        column would silently corrupt every earlier layer's read).

        **Deletes** (the I7 retraction side applied to dimensions): rows of
        ``deletes`` (key columns; anything else is ignored) TERMINATE their
        key at this era — the current version's ``valid_to`` closes at
        ``era`` and no version is open afterwards, so the key vanishes
        from ``is_current`` reads and from ``pit_join`` matches at
        fact-eras ≥ the delete. Mechanism: the layer stores a TOMBSTONE
        row (NULL attributes, ``_tombstone = true``) that participates in
        the read-time close window — closing the prior version exactly
        like an update would — and is then filtered from every output, so
        layers stay append-only and history below the delete is
        untouched. A later era may re-insert the key (a fresh version
        opens; the gap stays unmatched). A key may not be both changed
        and deleted in one era.

        **Contract: at most ONE row per key per era, and keys are non-NULL**
        — enforced here, not assumed. Two versions of a key in a single era
        would share one ``valid_from``, so the read-time ``lead()`` window
        would assign one of them a zero-width ``[e, e)`` interval
        nondeterministically, silently diverging from chained
        ``scd2_apply``; NULL keys can never be matched by the key window or
        a downstream point-in-time equi-join. Both are rejected loudly
        BEFORE the layer write (one aggregate over the small changes set).

        ``token``: idempotence handle for at-least-once callers (Structured
        Streaming ``foreachBatch`` replays a micro-batch whose commit
        didn't land). A token is recorded IN THE SAME meta write as the era
        bump — one atomic commit — so a replayed apply with a seen token
        returns the already-committed era instead of double-applying the
        changes as a phantom era. Pass the micro-batch id (see
        ``streaming/incremental_stream.streaming_scd2_eras``). Retention is
        bounded: tokens older than ``_TOKEN_KEEP`` eras are pruned at each
        commit (replays only ever target the most recent uncommitted
        batch), so the meta commit stays O(1) over an unbounded stream.

        ``snapshot_every``: LSM-style cadence (the PreserveStore
        ``max_layers`` analogue) — when the layer count since the newest
        generation reaches it after this commit, ``snapshot()`` folds them
        into a new bucketed generation so read cost stays bounded over an
        unbounded era stream (older eras stay readable until ``vacuum()``).

        O(|changes|) write, zero reads of prior state: the close of the
        superseded versions is derived at read time, so nothing here needs
        to know which keys exist. The meta era bump at the end is the
        atomic commit point — a crash before it leaves the history exactly
        at the previous era."""
        v0 = self._occ_begin()
        if token is not None:
            seen = self.meta.get("era_tokens", {})
            if token in seen:
                # the first attempt may have committed the era and then
                # lost/crashed inside its cadence snapshot — re-check the
                # cadence condition on this dedupe path too, so a replayed
                # apply heals the skipped fold instead of returning with
                # read depth above the requested cadence (ADVICE r9)
                self._cadence_snapshot(snapshot_every)
                return int(seen[token])
        keys = self.key_cols
        cols = list(self.meta["columns"])
        missing = [c for c in cols if c not in changes.columns]
        if missing:
            raise ValueError(
                f"Scd2Store.apply_era: changes are missing existing "
                f"column(s) {missing}; schema evolution is additive only"
            )
        new_cols = [c for c in changes.columns if c not in cols]
        # reserved names: the derived validity columns AND the internal
        # tombstone marker — a changes batch smuggling '_tombstone' in
        # would otherwise be treated as a schema-evolution column, have
        # its values clobbered by the lit(False) below, and then crash
        # the layer write with an opaque duplicate-column error (ADVICE r7)
        clash = {
            "valid_from", "valid_to", "is_current", "_tombstone"
        } & set(new_cols)
        if clash:
            raise ValueError(
                f"Scd2Store.apply_era: new column(s) {sorted(clash)} "
                f"collide with the store's derived validity / internal "
                f"tombstone columns"
            )
        chk = changes.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("n_keys"),
            F.sum(
                F.when(
                    F.greatest(*[F.col(k).isNull() for k in keys])
                    if len(keys) > 1
                    else F.col(keys[0]).isNull(),
                    1,
                ).otherwise(0)
            ).alias("n_null"),
        ).first()
        if chk["n_null"]:
            raise ValueError(
                f"Scd2Store.apply_era: {chk['n_null']} change row(s) carry "
                f"NULL key values in {keys}; NULL keys cannot be versioned"
            )
        if chk["n_keys"] != chk["n"]:
            raise ValueError(
                f"Scd2Store.apply_era: changes carry duplicate keys "
                f"({chk['n']} rows, {chk['n_keys']} distinct {keys}); one "
                f"era admits at most one version per key — pre-aggregate "
                f"to last-change-wins or split into multiple eras"
            )
        layer = changes.select(*cols, *new_cols).withColumn(
            "_tombstone", F.lit(False)
        )
        if deletes is not None:
            ks = deletes.select(*keys).distinct()
            n_del = ks.count()
            if n_del:
                if ks.where(
                    F.greatest(*[F.col(k).isNull() for k in keys])
                    if len(keys) > 1
                    else F.col(keys[0]).isNull()
                ).limit(1).count():
                    raise ValueError(
                        f"Scd2Store.apply_era: deletes carry NULL key "
                        f"values in {keys}"
                    )
                both = changes.join(ks, keys, "left_semi").limit(1).count()
                if both:
                    raise ValueError(
                        "Scd2Store.apply_era: key(s) appear in BOTH "
                        "changes and deletes for one era — a key is "
                        "either updated or terminated, not both"
                    )
                types = {
                    f.name: f.dataType.simpleString()
                    for f in self.spark.createDataFrame(
                        [], self.meta["schema_ddl"]
                    ).schema.fields
                }
                types.update(
                    {
                        f.name: f.dataType.simpleString()
                        for f in changes.schema.fields
                        if f.name in new_cols
                    }
                )
                tombs = ks.select(
                    *keys,
                    *[
                        F.lit(None).cast(types[c]).alias(c)
                        for c in cols + new_cols
                        if c not in keys
                    ],
                ).withColumn("_tombstone", F.lit(True))
                layer = layer.unionByName(tombs)
        e = self.era + 1
        staging = self._stage_layer(layer, cols + new_cols + ["_tombstone"])
        meta = dict(self.meta)
        meta["era"] = e
        if new_cols:
            meta["columns"] = cols + new_cols
            meta["schema_ddl"] = (
                meta["schema_ddl"]
                + ", "
                + _schema_ddl(changes.select(*new_cols))
            )
            # invalidate the session's catalog entries BEFORE the commit:
            # the next read re-creates them from the (then-committed)
            # evolved DDL; a crash in between re-creates from the old meta
            # — consistent either way (the single-writer contract is now
            # ENFORCED at the commit below: _write_meta's OCC compare
            # fails any writer whose begin-state was superseded, r8)
            for g in self.snaps:
                self.spark.sql(
                    f"DROP TABLE IF EXISTS {self._table_name(g)}"
                )
        if token is not None:
            # retain a bounded window of tokens: at-least-once callers only
            # ever replay their MOST RECENT uncommitted batch, so tokens
            # more than _TOKEN_KEEP eras old are dead weight that would
            # otherwise make every atomic commit rewrite an O(total-eras)
            # meta.json — the one artifact snapshot() can't bound
            tokens = {
                t: ver
                for t, ver in meta.get("era_tokens", {}).items()
                if int(ver) > e - _TOKEN_KEEP
            }
            tokens[token] = e
            meta["era_tokens"] = tokens
        try:
            self._write_meta(
                meta,
                expect=v0,
                op="Scd2Store.apply_era",
                publish=lambda: occ.publish_dir(
                    staging, self._layer_path(e)
                ),
            )
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        self._cadence_snapshot(snapshot_every)
        return e

    def _cadence_snapshot(self, snapshot_every: int | None) -> None:
        """Fold when the layer count since the newest generation reaches
        the requested cadence. Runs AFTER the era commit (the fold is
        maintenance, not part of the era's atomicity) and is wrapped in
        ``occ.retrying`` against FRESH state per attempt (ADVICE r9): a
        snapshot losing an OCC race to a concurrent writer re-reads the
        committed meta, re-checks the cadence — a racing writer may have
        folded already, making this a no-op instead of the
        behind-newest-generation error — and folds at the then-latest
        era. Safe to retry: ``snapshot()`` is idempotent at a folded era
        and never deletes."""
        if snapshot_every is None:
            return

        def fold():
            self._meta = None  # fresh committed state per attempt
            e = self.era
            if e - max(self.snaps) >= snapshot_every:
                try:
                    self.snapshot(e)
                except ValueError as ve:
                    # a racing writer folded at a LATER era between this
                    # check and snapshot()'s own begin — their fold
                    # satisfies the cadence; anything else propagates
                    if "behind the newest generation" not in str(ve):
                        raise

        occ.retrying(fold)

    # -- reads -------------------------------------------------------------

    def _check_era(self, era: int | None) -> int:
        last = self.era
        if era is None:
            era = last
        if not (0 <= era <= last):
            raise ValueError(
                f"Scd2Store: era {era} not committed (latest {last})"
            )
        return era

    def history_as_of(self, era: int | None = None) -> DataFrame:
        """The full SCD2 history visible at ``era`` (default: latest
        committed): attribute columns + valid_from / valid_to / is_current.

        Reconstruction = generation base ∪ layers after it up to ``era``
        (ONE multi-path scan — constant plan size in era count, r6), then
        one key-window derives ``valid_to`` as the next version's open era
        (``open_end`` if none) — identical semantics to chaining
        ``scd2_apply`` once per era (pinned by tests/test_scd2_store.py),
        but from immutable on-disk layers. After ``snapshot(s)``, reads at
        era ≥ s fold the snapshot base + only the layers after s — the
        read cost is bounded by snapshot cadence instead of growing with
        total history depth — while eras < s stay readable from the older
        generation until ``vacuum()``."""
        era = self._check_era(era)
        h, layers = self._gen_pieces(era)
        if layers is not None:
            h = h.unionByName(layers)
        w = Window.partitionBy(*self.key_cols).orderBy("valid_from")
        # tombstones participate in the window (closing the version they
        # terminate) and are then dropped from the output
        return (
            h.withColumn(
                "valid_to",
                F.coalesce(
                    F.lead("valid_from").over(w), F.lit(self.open_end)
                ).cast("bigint"),
            )
            .where(~F.col("_tombstone"))
            .drop("_tombstone")
            .withColumn("is_current", F.col("valid_to") == self.open_end)
        )

    # -- snapshot / vacuum (bounded-depth reads without losing history) ----

    def snapshot(self, era: int | None = None) -> int:
        """Fold base + layers ≤ ``era`` (default: latest committed) into a
        new bucketed generation base holding the FULL multi-version history
        up to that era (``valid_from`` becomes a stored column — an SCD2
        store never discards versions, so a snapshot is a fold, not a
        truncation). Reads at era ≥ the snapshot then pay one bucketed
        scan + the layers SINCE it — constant in total history depth, which
        is what makes a never-compacting dimension viable at 1200
        refreshes/year. Older eras keep reading from the previous
        generation (time travel survives a snapshot) until ``vacuum()``.

        Same commit discipline as every other mutation: the new generation
        is STAGED first and renamed onto ``base_s<era>`` inside the meta
        commit's critical section (r9); a crashed snapshot leaves only an
        invisible ``.stage-*`` (or, if it died between publish and the
        meta replace, an uncommitted ``base_s<era>``) orphan that a retry
        republishes over and ``vacuum()`` reclaims."""
        v0 = self._occ_begin()
        era = self._check_era(era)
        if era in self.snaps:
            return era  # already a generation boundary — idempotent
        if era < max(self.snaps):
            raise ValueError(
                f"Scd2Store: cannot snapshot at era {era} behind the newest "
                f"generation {max(self.snaps)}"
            )
        h, layers = self._gen_pieces(era)
        if layers is not None:
            h = h.unionByName(layers)
        m = self.meta
        n = int(m["num_buckets"])
        keys = self.key_cols
        # tombstones fold into the generation unfiltered — they keep
        # closing the versions they terminated
        staging = self._stage_bucketed(
            h.select(*m["columns"], "valid_from", "_tombstone"),
            n,
            keys,
            tag=f"base_s{era}",
        )
        meta = dict(self.meta)
        meta["snaps"] = sorted(set(self.snaps) | {era})
        # drop a stale catalog entry for this generation name (e.g. from a
        # pre-crash attempt) BEFORE the commit — no window may exist where
        # an old entry serves the new files; reads re-register from meta
        self.spark.sql(f"DROP TABLE IF EXISTS {self._table_name(era)}")
        try:
            self._write_meta(
                meta,
                expect=v0,
                op="Scd2Store.snapshot",
                publish=lambda: occ.publish_dir(
                    staging, self._base_path(era)
                ),
            )
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        return era

    def vacuum(self, retain_sec: float = 0.0) -> None:
        """Delete every pre-newest-generation artifact: older generation
        bases and all layers ≤ the newest snapshot era (their content is
        folded into the newest generation, so no VERSION is lost — only
        the ability to read ``history_as_of(e)`` for e below the snapshot).
        Eras below the newest snapshot become unreadable and are rejected
        loudly. Same rewrite-then-vacuum split as ``PreserveStore`` and
        lakehouse table formats: ``snapshot()`` never deletes, so a reader
        holding a plan over the old generation keeps its files until the
        caller explicitly vacuums.

        COMMIT FIRST, DELETE AFTER (r8): vacuum is the one mutation whose
        side effects are irreversible, so the OCC compare must happen
        before any file is touched — a vacuum losing the race to a
        concurrent apply_era would otherwise destroy generations the
        winner's committed meta still references. Committing first makes
        the loser fail with NOTHING deleted. The delete phase is a
        DISK-SCAN SWEEP of everything the committed meta does not
        reference (``_sweep_orphans``, r9), not a precomputed list — so a
        crash between the commit and the deletes is no longer a permanent
        disk leak (the r8 residue): the next ``vacuum()`` re-derives the
        same orphan set from disk and reclaims it.

        ``retain_sec`` (r10 — the Delta ``VACUUM ... RETAIN`` discipline):
        retired artifacts are left on disk until ``retain_sec`` has
        elapsed since a retaining sweep FIRST saw them unreferenced
        (``occ.retention_clock`` — age runs from retirement, not the
        directory mtime: a generation written hours ago but retired one
        second ago must still be protected), so a vacuum loop can run
        CONCURRENTLY with readers/writers whose in-flight scans still
        hold plans over a just-retired generation (a writer's own
        cadence ``snapshot()`` read is such a scan). Default 0 keeps the
        quiesced-caller contract: reclaim immediately."""
        v0 = self._occ_begin()
        newest = max(self.snaps)
        if self.snaps != [newest] or self.vacuumed_below < newest:
            meta = dict(self.meta)
            meta["snaps"] = [newest]
            meta["vacuumed_below"] = newest
            self._write_meta(meta, expect=v0, op="Scd2Store.vacuum")
        self._sweep_orphans(retain_sec)

    def _sweep_orphans(self, retain_sec: float = 0.0) -> None:
        """Reclaim every directory the COMMITTED meta no longer references
        (r9): generation bases not in ``snaps`` (retired by a vacuum that
        died between its commit and its deletes, or left by a crashed
        ``snapshot()`` — a retry rewrites them from scratch) and layer
        directories at or below ``vacuumed_below``. Orphans are invisible
        to every reader — readers only follow meta — so deleting them
        needs no commit and cannot race a reader onto missing files.

        Runs UNDER the store's commit lock with a fresh meta read, so a
        commit landing concurrently (e.g. a retrying writer between this
        vacuum's own commit and its sweep) can never have its
        just-published directories mistaken for orphans. ``.stage-*``
        directories are reclaimed only past the stage retention window
        (``stage_retention_sec`` / ``occ.STAGE_RETENTION_SEC``) — inside
        the window they may be the LIVE staging of an in-flight mutation
        whose commit is about to rename them into place. Where ``flock``
        is unavailable the same retention window gates FINAL-POSITIONED
        unreferenced directories too (``occ.final_is_sweepable``): with
        the lock a no-op, an unreferenced ``base_s<g>`` may be a
        concurrent snapshot's just-published generation whose meta
        replace hasn't landed yet, and sweeping it would turn that
        writer's commit into committed data loss (ADVICE r9)."""
        ret = self.stage_retention_sec
        with occ.store_lock(self.path):
            self._meta = None  # the committed meta as of THIS lock hold
            snaps = set(self.snaps)
            vb = self.vacuumed_below
            for d in os.listdir(self.path):
                p = os.path.join(self.path, d)
                if d.startswith(".stage-"):
                    if not occ.stage_is_young(p, ret):
                        shutil.rmtree(p, ignore_errors=True)
                    continue
                m = re.fullmatch(r"base_s(\d+)", d)
                g = int(m.group(1)) if m else (0 if d == "base" else None)
                if g is None or g in snaps:
                    continue
                if not occ.final_is_sweepable(p, ret):
                    continue
                if not occ.retention_clock(p, retain_sec):
                    continue  # VACUUM RETAIN: in-flight readers may
                    # still hold plans over this just-retired generation
                    # (clock runs from first-sight-as-unreferenced, not
                    # the dir mtime — r10 review)
                self.spark.sql(
                    f"DROP TABLE IF EXISTS {self._table_name(g)}"
                )
                shutil.rmtree(p, ignore_errors=True)
            lroot = os.path.join(self.path, "layers")
            if os.path.isdir(lroot):
                for d in os.listdir(lroot):
                    p = os.path.join(lroot, d)
                    m = re.fullmatch(r"e(\d+)", d)
                    if d.startswith(".stage-"):
                        if not occ.stage_is_young(p, ret):
                            shutil.rmtree(p, ignore_errors=True)
                    elif m and int(m.group(1)) <= vb:
                        if not occ.retention_clock(p, retain_sec):
                            continue  # VACUUM RETAIN (see above)
                        # committed-and-vacuumed layers: safe without the
                        # final_is_sweepable gate even lock-free — a
                        # concurrent apply_era publishes era committed+1
                        # > vacuumed_below, never a name at or below it
                        shutil.rmtree(p, ignore_errors=True)

    # -- point-in-time join ------------------------------------------------

    def pit_join(
        self,
        facts: DataFrame,
        era_col: str,
        as_of: int | None = None,
        era_cache: dict | None = None,
    ) -> DataFrame:
        """Join each fact row to the dimension version valid at the fact's
        own era (``facts[era_col]`` ∈ [version.valid_from, version.valid_to)
        — THE standard warehouse query over a versioned dimension), reading
        history from the store so the join is durable and co-bucketed.

        Plan (the 100 TB story — at scale, shuffling the FACTS is the whole
        cost, and this plan never does):

        - **cold branch** (keys untouched by any layer after the
          generation — the overwhelming majority under SCD2's
          few-changes-per-era premise): generation base is bucketed on the
          key, so the valid_to window runs with NO Exchange, and facts
          bucketed on the same key/count sort-merge join it with NO
          Exchange on either side (pinned by
          tests/test_scd2_store.py::test_pit_join_cold_branch_no_exchange).
        - **hot branch** (keys with a post-generation layer row —
          O(|changes|)): their full history (generation rows for those
          keys ∪ layers) pays one small window shuffle, then BROADCASTS
          into the facts — no fact movement. The broadcast is safe for the
          same reason the store is append-only: an era is a changes batch,
          small next to the dimension; a full-dimension rewrite should be
          a new ``initialize``/``snapshot``, not an era.

        Output: facts columns + the dimension attribute columns of the
        matched version (validity bookkeeping dropped). Facts whose key has
        no version, or whose era falls outside every version's range
        (e.g. negative), are dropped — inner PIT semantics.

        ``era_cache`` (r14, VERDICT r13 ask #8 — for callers that join MANY
        fact batches against the same committed era, e.g. each micro-batch
        of ``streaming_pit_enrich``): a caller-owned dict this method uses
        to memoize the prepared history pieces (touched keys + cold/hot
        history as lazy ``localCheckpoint``s) keyed on the resolved era.
        Batch 0 materializes them through its own join; later batches at
        the same era skip the touched-keys job and the base window/anti/
        semi re-derivation entirely. The cache holds DataFrames derived
        from the store's COMMITTED state only — values are invalidated
        when the resolved era moves, so results are identical with or
        without it. Checkpoint RDDs are freed by the ContextCleaner when
        the caller drops the dict (the standard localCheckpoint
        lifecycle); pass ``None`` (default) for the plain at-rest plan."""
        as_of = self._check_era(as_of)
        keys = self.key_cols
        attrs = [c for c in self.meta["columns"] if c not in keys]
        # fact extracts commonly carry their own SCD bookkeeping columns;
        # a silent ambiguous-reference failure (or worse, positional
        # mis-resolution in the final select) is the wrong way to find out
        clash = (set(facts.columns) - set(keys)) & (
            {"valid_from", "valid_to"} | set(attrs)
        )
        if clash:
            raise ValueError(
                f"Scd2Store.pit_join: facts columns {sorted(clash)} collide "
                f"with the store's validity/attribute columns — rename them "
                f"on the facts side first"
            )
        w = Window.partitionBy(*keys).orderBy("valid_from")
        valid_to = F.coalesce(
            F.lead("valid_from").over(w), F.lit(self.open_end)
        ).cast("bigint")
        era_ok = (F.col(era_col) >= F.col("valid_from")) & (
            F.col(era_col) < F.col("valid_to")
        )
        out_cols = facts.columns + attrs

        # tombstones stay in until AFTER the window computes valid_to
        # (they close the version they terminate), then leave the join
        live = ~F.col("_tombstone")

        base, layers = self._gen_pieces(as_of)
        if layers is None:
            hist = base.withColumn("valid_to", valid_to).where(live)
            return facts.join(hist, keys).where(era_ok).select(*out_cols)

        if era_cache is not None and era_cache.get("as_of") == as_of:
            touched, cold_hist, hot_hist = era_cache["pieces"]
        else:
            # materialized once: three subtrees reference it (two
            # broadcasts + the hot union's layer scan feeds it), and
            # re-running the layer scan + distinct per subtree would
            # triple the (small) layer work. localCheckpoint over persist:
            # registered queries can never unpersist after the driver
            # collects, and checkpoint RDDs are freed by the
            # ContextCleaner when the DataFrame drops.
            touched = (
                layers.select(*keys).distinct().localCheckpoint(eager=True)
            )
            cold_hist = (
                base.join(F.broadcast(touched), keys, "left_anti")
                .withColumn("valid_to", valid_to)
                .where(live)
            )
            hot_hist = (
                base.join(F.broadcast(touched), keys, "left_semi")
                .unionByName(layers)
                .withColumn("valid_to", valid_to)
                .where(live)
            )
            if era_cache is not None:
                # lazy checkpoints: the first batch's join materializes
                # them (no extra warm-up job), every later batch at this
                # era reuses the stored partitions instead of re-running
                # the window + anti/semi derivation over the full base.
                # LogicalRDD keeps the physical partitioning/ordering, so
                # the cold branch's no-Exchange property survives reuse.
                cold_hist = cold_hist.localCheckpoint(eager=False)
                hot_hist = hot_hist.localCheckpoint(eager=False)
                era_cache.clear()
                era_cache.update(
                    as_of=as_of, pieces=(touched, cold_hist, hot_hist)
                )
        cold = facts.join(cold_hist, keys).where(era_ok)
        hot = facts.join(F.broadcast(hot_hist), keys).where(era_ok)
        return cold.select(*out_cols).unionByName(hot.select(*out_cols))
