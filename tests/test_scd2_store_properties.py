"""Property-based dual execution for the Scd2Store (round 8 — the SURVEY
§5.2 discipline applied to the store's FULL mutation surface): for ANY
random sequence of {apply_era, deletes, schema evolution, snapshot,
vacuum}, ``history_as_of(e)`` at EVERY still-readable era must equal a
pure-Python SCD2 model that knows nothing about layers, generations, or
tombstone encoding — only the semantics: a version opened at era i is
closed by the key's next version (or a delete), evolution NULL-backfills
older versions, snapshot changes nothing, vacuum only narrows the
readable range.

The deterministic suites pin chosen interleavings; this pins the cross
product the suites can't enumerate (e.g. delete → evolve → reinsert →
snapshot → era → vacuum)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incr_iter_hadoop_spark.sources.scd2_store import Scd2Store

# r14 (VERDICT r13 ask #6): stress/property suite excluded from the
# default run so the driver's verify window completes; run everything
# with  pytest -m "slow or not slow"  (see pytest.ini).
pytestmark = pytest.mark.slow


OPEN_END = 999_999
KEYS = st.integers(0, 5)

# one era: disjoint change/delete key sets (a key is updated or
# terminated, never both — apply_era enforces it loudly)
_era = st.tuples(
    st.dictionaries(KEYS, st.integers(-9, 9), max_size=4),
    st.lists(KEYS, max_size=2, unique=True),
).map(lambda t: ("era", t[0], [k for k in t[1] if k not in t[0]]))

_ops = st.lists(
    st.one_of(
        _era,
        st.just(("evolve",)),
        st.just(("snapshot",)),
        st.just(("vacuum",)),
    ),
    min_size=1,
    max_size=6,
)


def _model_history(versions, e, evolved, open_end=OPEN_END):
    """versions: list of (key, attrs|None, valid_from); attrs None =
    tombstone. Returns the set of expected history rows at era ``e`` under
    the CURRENT schema (``evolved`` widens every row with a w slot —
    NULL-backfilled where the version predates the evolution)."""
    per_key: dict[int, list] = {}
    for k, attrs, vf in versions:
        if vf <= e:
            per_key.setdefault(k, []).append((vf, attrs))
    out = set()
    for k, lst in per_key.items():
        lst.sort(key=lambda t: t[0])
        for i, (vf, attrs) in enumerate(lst):
            vt = lst[i + 1][0] if i + 1 < len(lst) else open_end
            if attrs is None:
                continue  # tombstone: closes the predecessor, never shown
            if evolved:
                out.add(
                    (k, attrs["v"], attrs.get("w"), vf, vt, vt == open_end)
                )
            else:
                out.add((k, attrs["v"], vf, vt, vt == open_end))
    return out


def _store_rows(store, e, evolved):
    cols = (
        ["k", "v", "w", "valid_from", "valid_to", "is_current"]
        if evolved
        else ["k", "v", "valid_from", "valid_to", "is_current"]
    )
    return {
        tuple(r[c] for c in cols)
        for r in store.history_as_of(e).collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_random_op_sequence_matches_pure_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("prop_scd2")
    store = Scd2Store(spark, str(tmp / "s"))
    base = {0: 0, 1: 1, 2: 2}  # keys 3-5 start absent (insert paths)
    store.initialize(
        spark.createDataFrame(
            [(k, float(v)) for k, v in base.items()], "k bigint, v double"
        ),
        key_cols=["k"],
        num_buckets=2,
    )
    versions = [(k, {"v": float(v)}, 0) for k, v in base.items()]
    evolved = False
    era = 0
    readable_min = 0
    snaps = [0]

    for op in ops:
        if op[0] in ("era", "evolve"):
            if op[0] == "evolve":
                # the evolving era: a deterministic update that CARRIES the
                # new column; afterwards every era must include it
                # (additive-only contract — apply_era rejects dropping it)
                changes, dels = {0: 7}, []
            else:
                changes, dels = op[1], op[2]
            era += 1
            wide = evolved or op[0] == "evolve"
            if wide:
                df = spark.createDataFrame(
                    [(k, float(v), float(v) + 0.5) for k, v in changes.items()],
                    "k bigint, v double, w double",
                )
            else:
                df = spark.createDataFrame(
                    [(k, float(v)) for k, v in changes.items()],
                    "k bigint, v double",
                )
            deletes_df = (
                spark.createDataFrame([(k,) for k in dels], "k bigint")
                if dels
                else None
            )
            store.apply_era(df, deletes=deletes_df)
            for k, v in changes.items():
                attrs = {"v": float(v)}
                if wide:
                    attrs["w"] = float(v) + 0.5
                versions.append((k, attrs, era))
            for k in dels:
                versions.append((k, None, era))
            evolved = evolved or op[0] == "evolve"
        elif op[0] == "snapshot":
            store.snapshot(era)
            if era not in snaps:
                snaps.append(era)
        elif op[0] == "vacuum":
            store.vacuum()
            newest = max(snaps)
            if newest > 0:
                readable_min = newest
                snaps = [newest]

        # invariant sweep: every still-readable era agrees with the model
        for e in range(readable_min, era + 1):
            got = _store_rows(store, e, evolved)
            assert got == _model_history(versions, e, evolved), (e, ops)
        if readable_min > 0:
            with pytest.raises(ValueError, match="vacuum"):
                store.history_as_of(readable_min - 1)
