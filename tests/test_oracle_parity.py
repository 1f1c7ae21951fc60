"""Local replica of the driver's correctness gate: every registered query
with an oracle runs on Spark AND DuckDB; outputs must match on row count,
column names, and values (order-insensitive, floats compared at 5e-7 after
both sides' explicit round-to-6)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from incr_iter_hadoop_spark.registry import all_queries

SPECS = [s for s in all_queries().values() if s.oracle is not None]
NO_ORACLE = [s for s in all_queries().values() if s.oracle is None]

# r14 (VERDICT r13 ask #6): the parity params that each take 8-27 s (heavy
# iterative/dedup/pipeline compositions, measured with --durations on the
# full 2026-08-18 run) are marked slow so the driver's verify window
# completes; the driver's own oracle gate still covers every registered
# query at sf0.01, and `pytest -m "slow or not slow"` runs everything.
SLOW_PARITY = {
    "incr_dedup_clusters", "dedup_cc_star", "kmeans_converged",
    "pipeline_clean_corpus", "pipeline_build_training_set",
    "incr_dedup_minhash_delete", "dedup_cc_clusters", "dedup_simhash_pairs",
    "incr_dedup_minhash_pairs", "dedup_keep_best", "dedup_minhash_pairs",
    "streaming_incr_pagerank", "scd2_store_pit_live",
    "pipeline_curated_split", "incr_nmf_delta2",
}
SPEC_PARAMS = [
    pytest.param(s, marks=pytest.mark.slow) if s.name in SLOW_PARITY else s
    for s in SPECS
]


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [c.lower() for c in out.columns]
    out = out[sorted(out.columns)]
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif str(out[c].dtype).startswith(("int", "uint", "Int")):
            out[c] = out[c].astype("int64")
        elif str(out[c].dtype).startswith("float"):
            out[c] = out[c].astype("float64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    s, o = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: column mismatch {list(s.columns)} vs {list(o.columns)}"
    )
    assert len(s) == len(o), f"{name}: row count {len(s)} vs {len(o)}"
    for c in s.columns:
        if s[c].dtype == np.float64:
            a, b = s[c].to_numpy(), o[c].to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            close = np.isclose(a, b, rtol=0.0, atol=5e-7) | both_nan
            assert close.all(), (
                f"{name}.{c}: {int((~close).sum())} value mismatches, "
                f"max |Δ|={np.nanmax(np.abs(a - b))}"
            )
        else:
            eq = (s[c] == o[c]) | (s[c].isna() & o[c].isna())
            assert eq.all(), (
                f"{name}.{c}: {(~eq).sum()} mismatches, e.g. "
                f"{s[c][~eq].head(3).tolist()} vs {o[c][~eq].head(3).tolist()}"
            )


@pytest.mark.parametrize("spec", SPEC_PARAMS, ids=[s.name for s in SPECS])
def test_oracle_parity(spec, spark, ddb, sf_dir):
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = ddb.sql(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, spec.name)


@pytest.mark.parametrize("spec", NO_ORACLE, ids=[s.name for s in NO_ORACLE])
def test_rows_only_queries_run(spec, spark, sf_dir):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
