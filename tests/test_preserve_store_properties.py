"""Property-based dual execution for the preserve store (SURVEY §5.2): for
ANY sequence of (+/-) deltas, layered refresh must equal a one-shot groupBy
over the effective contribution set — including non-invertible MAX,
vanished/reappeared groups, and refreshes after compaction."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incr_iter_hadoop_spark.sources.preserve_store import PreserveStore

AGG = {
    "total": "CAST(SUM(v) AS DOUBLE)",
    "n": "CAST(COUNT(1) AS BIGINT)",
    "mx": "CAST(MAX(v) AS DOUBLE)",
}

# rows: (group 0-4, source 0-9, value) — small domains force collisions,
# retractions of real rows, and whole-group vanishes
row = st.tuples(
    st.integers(0, 4), st.integers(0, 9), st.integers(-50, 50)
)
base_rows = st.lists(row, min_size=1, max_size=12, unique_by=lambda r: (r[0], r[1]))
delta_ops = st.lists(
    st.tuples(row, st.sampled_from(["+", "-"])), min_size=1, max_size=6
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=base_rows, deltas=st.lists(delta_ops, min_size=1, max_size=3))
def test_layered_refresh_equals_recompute(spark, tmp_path_factory, base, deltas):
    tmp = tmp_path_factory.mktemp("prop_store")
    store = PreserveStore(spark, str(tmp / "s"))
    store.initialize(
        spark.createDataFrame(
            [(g, s, float(v)) for g, s, v in base], "g bigint, s bigint, v double"
        ),
        group_keys=["g"],
        source_keys=["s"],
        agg_sql=AGG,
        num_buckets=2,
    )
    # model: dict (g, s) -> v mirroring the store's retraction semantics.
    # The delta contract requires (group, source) to uniquely identify a
    # contribution, so collapse each batch to ONE net op per key: the last
    # '+' wins (as a '-' then '+'), a trailing '-' is a plain retraction.
    model = {(g, s): float(v) for g, s, v in base}
    for i, batch in enumerate(deltas):
        net: dict[tuple[int, int], tuple[str, float]] = {}
        for (g, s, v), op in batch:
            net[(g, s)] = (op, float(v))
        clean = []
        for (g, s), (op, v) in net.items():
            if op == "+":
                if (g, s) in model:
                    clean.append((g, s, 0.0, "-"))
                clean.append((g, s, v, "+"))
                model[(g, s)] = v
            else:
                clean.append((g, s, 0.0, "-"))
                model.pop((g, s), None)
        store.refresh(
            spark.createDataFrame(
                clean, "g bigint, s bigint, v double, op string"
            ),
            # alternate pruning paths across batches
            inline_keys=0 if i % 2 else 5000,
        )
    # fold mid-sequence state through a compaction on the last example shapes
    if len(deltas) >= 2:
        store.compact()
    got = {
        r["g"]: (r["total"], r["n"], r["mx"])
        for r in store.current_results().collect()
    }
    expect: dict[int, tuple[float, int, float]] = {}
    for (g, _s), v in model.items():
        t, n, m = expect.get(g, (0.0, 0, float("-inf")))
        expect[g] = (t + v, n + 1, max(m, v))
    assert got == expect
