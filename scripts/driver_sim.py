"""Simulate the correctness driver: run the first-50 window at sf0.01,
value-exact vs the DuckDB oracles.

The real driver takes ``__spark_entry__.queries()`` in dict order, runs the
first 50 against a bare ``local[*]`` session, runs the matching
``oracle_sql()`` on DuckDB (tables pre-registered as views over the same
parquet), sorts columns by name, and compares row count, lower-cased schema,
and a value hash. This script reproduces that pipeline so a window rotation
can be proven green BEFORE the round ends.

Usage: python scripts/driver_sim.py [sf_dir] [only_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df_pandas):
    """Driver-style canonical form: columns sorted by name, rows sorted."""
    p = df_pandas.reindex(sorted(df_pandas.columns), axis=1)
    p = p.sort_values(by=list(p.columns), kind="mergesort", ignore_index=True)
    return p


def cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)


def value_sig(p):
    rows = []
    for t in p.itertuples(index=False, name=None):
        rows.append("|".join(cell(v) for v in t))
    rows.sort()
    return "\n".join(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    window = list(qs)[:50]
    if only:
        # explicit names may target any registered query, windowed or not
        window = [n for n in qs if n in only]
    bad = 0
    for i, name in enumerate(window):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            sp = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{i:2d} {name}: SPARK ERR {type(e).__name__}: {e}")
            bad += 1
            continue
        if name not in oracles:
            print(f"{i:2d} {name}: rows-only ({len(sp)} rows) {time.time()-t0:.1f}s")
            continue
        try:
            op = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{i:2d} {name}: ORACLE ERR {type(e).__name__}: {e}")
            bad += 1
            continue
        sp_c, op_c = canon(sp), canon(op)
        scols = [c.lower() for c in sp_c.columns]
        ocols = [c.lower() for c in op_c.columns]
        if scols != ocols:
            print(f"{i:2d} {name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            bad += 1
            continue
        if len(sp_c) != len(op_c):
            print(f"{i:2d} {name}: ROWS MISMATCH spark={len(sp_c)} oracle={len(op_c)}")
            bad += 1
            continue
        ssig, osig = value_sig(sp_c), value_sig(op_c)
        if ssig != osig:
            print(f"{i:2d} {name}: VALUE MISMATCH")
            for a, b in zip(ssig.split("\n"), osig.split("\n")):
                if a != b:
                    print(f"     spark : {a}\n     oracle: {b}")
                    break
            bad += 1
            continue
        print(f"{i:2d} {name}: ok ({len(sp_c)} rows) {time.time()-t0:.1f}s")
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'} / {len(window)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
