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
  version-bump discipline): a crash after the layer write but before the
  bump leaves an orphan layer directory that is INVISIBLE to every reader
  and simply overwritten by the retried ``apply_era``.
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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_META = "meta.json"


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)


class Scd2Store:
    """On-disk SCD Type-2 history: era-layered, crash-consistent,
    time-traveling. One instance per store path; safe to re-open across
    sessions (meta.json carries the schema and bucketing spec)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._meta: dict | None = None

    # -- metadata (same atomic-replace discipline as PreserveStore) --------

    def exists(self) -> bool:
        return os.path.isfile(os.path.join(self.path, _META))

    @property
    def meta(self) -> dict:
        if self._meta is None:
            with open(os.path.join(self.path, _META)) as f:
                self._meta = json.load(f)
        return self._meta

    def _write_meta(self, meta: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, os.path.join(self.path, _META))
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

    # -- storage -----------------------------------------------------------

    def _table_name(self) -> str:
        # the slug alone is NOT injective (/tmp/a-b and /tmp/a_b collide,
        # as do case-differing paths) and initialize() DROPs the name —
        # a short hash of the raw path makes distinct stores distinct
        # catalog entries (ADVICE r6)
        slug = re.sub(r"[^0-9a-zA-Z]+", "_", self.path).strip("_").lower()
        tag = hashlib.md5(self.path.encode()).hexdigest()[:8]
        return f"scd2_{slug}_{tag}_base"

    def _base_path(self) -> str:
        return os.path.join(self.path, "base")

    def _layer_path(self, era: int) -> str:
        return os.path.join(self.path, f"layers/e{era}")

    def _base(self) -> DataFrame:
        name = self._table_name()
        if not self.spark.catalog.tableExists(name):
            m = self.meta
            keys = ", ".join(f"`{k}`" for k in m["key_cols"])
            self.spark.sql(
                f"CREATE TABLE {name} ({m['schema_ddl']}) USING PARQUET"
                f" CLUSTERED BY ({keys}) SORTED BY ({keys})"
                f" INTO {m['num_buckets']} BUCKETS"
                f" LOCATION '{self._base_path()}'"
            )
        return self.spark.table(name)

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
        written FIRST and the meta write is the atomic commit point, so a
        crash mid-snapshot leaves ``exists() == False`` (an uninitialized
        store with orphan data files) rather than a committed store over a
        partial base. The retry drops the half-created catalog entry and
        overwrites the orphan files.

        NULL key values are rejected (same contract as ``apply_era`` and
        ``PreserveStore``): a NULL-keyed version can never be closed by the
        key window nor matched by a point-in-time equi-join."""
        self._meta = None
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
        n = num_buckets
        self.spark.sql(f"DROP TABLE IF EXISTS {self._table_name()}")
        (
            dim.repartition(n, *key_cols)
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(n, *key_cols)
            .sortBy(*key_cols)
            .option("path", self._base_path())
            .saveAsTable(self._table_name())
        )
        self._write_meta(meta)
        return self

    def _write_layer(self, era: int, changes: DataFrame) -> None:
        """Layer write WITHOUT the meta bump — split out so the crash test
        can stop exactly between the two steps."""
        changes.select(*self.meta["columns"]).write.mode("overwrite").parquet(
            self._layer_path(era)
        )

    def apply_era(self, changes: DataFrame) -> int:
        """Commit one era of changes (update rows for existing keys, insert
        rows for new keys; same attribute schema as the base dimension).

        **Contract: at most ONE row per key per era, and keys are non-NULL**
        — enforced here, not assumed. Two versions of a key in a single era
        would share one ``valid_from``, so the read-time ``lead()`` window
        would assign one of them a zero-width ``[e, e)`` interval
        nondeterministically, silently diverging from chained
        ``scd2_apply``; NULL keys can never be matched by the key window or
        a downstream point-in-time equi-join. Both are rejected loudly
        BEFORE the layer write (one aggregate over the small changes set).

        O(|changes|) write, zero reads of prior state: the close of the
        superseded versions is derived at read time, so nothing here needs
        to know which keys exist. The meta era bump at the end is the
        atomic commit point — a crash before it leaves the history exactly
        at the previous era."""
        keys = self.key_cols
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
        e = self.era + 1
        self._write_layer(e, changes)
        meta = dict(self.meta)
        meta["era"] = e
        self._write_meta(meta)
        return e

    # -- reads -------------------------------------------------------------

    def history_as_of(self, era: int | None = None) -> DataFrame:
        """The full SCD2 history visible at ``era`` (default: latest
        committed): attribute columns + valid_from / valid_to / is_current.

        Reconstruction = base ∪ layers 1..era with ``valid_from`` stamped
        per layer, then one key-window derives ``valid_to`` as the next
        version's open era (``open_end`` if none) — identical semantics to
        chaining ``scd2_apply`` once per era (pinned by
        tests/test_scd2_store.py), but from immutable on-disk layers."""
        last = self.era
        if era is None:
            era = last
        if not (0 <= era <= last):
            raise ValueError(
                f"Scd2Store: era {era} not committed (latest {last})"
            )
        h = self._base().withColumn("valid_from", F.lit(0).cast("bigint"))
        if era >= 1:
            # ONE multi-path scan for layers 1..era with valid_from parsed
            # from the layer directory name (same constant-plan-size fix as
            # PreserveStore._layers, r6): a per-era unionByName chain grew
            # the plan and the file listings linearly with history depth —
            # an SCD2 history never compacts, so depth is unbounded
            paths = [self._layer_path(e) for e in range(1, era + 1)]
            # anchored to the data-file position (layers/e<N>/part-*): an
            # unanchored leftmost match would pick up a "/layers/eN/"
            # segment from the STORE ROOT's own path (e.g. a store created
            # inside another store's layer dir) and stamp the wrong
            # valid_from on every row with no error (ADVICE r6)
            layers = self.spark.read.parquet(*paths).withColumn(
                "valid_from",
                F.regexp_extract(
                    F.input_file_name(), r"/layers/e(\d+)/[^/]+$", 1
                ).cast("bigint"),
            )
            h = h.unionByName(layers)
        w = Window.partitionBy(*self.key_cols).orderBy("valid_from")
        return h.withColumn(
            "valid_to",
            F.coalesce(
                F.lead("valid_from").over(w), F.lit(self.open_end)
            ).cast("bigint"),
        ).withColumn("is_current", F.col("valid_to") == self.open_end)
