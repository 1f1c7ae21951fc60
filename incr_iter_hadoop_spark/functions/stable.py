"""Order-stable aggregates for oracle-hash reproducibility.

``ROUND(SUM(double), 6)`` is NOT reproducible across engines (or even runs):
a distributed sum's floating-point error depends on partition order, and when
the true value sits near a 1e-6 rounding boundary the rounded result flips —
observed as intermittent value-hash mismatches vs the DuckDB oracle at
sf0.01+ (|Δ| = exactly 1e-6).

Fix: accumulate in DECIMAL — exact and order-independent — then cast back to
double. Both engines cast the same input doubles to the same decimals, sum
them exactly in any order, and convert the identical decimal to the identical
double. Cost at scale: decimal sums are ~2× a double sum, still partial-agg
(map-side combine) and shuffle-light; correctness of the hash gate wins.

Use these for every SUM/AVG over price-magnitude doubles that feeds query
output; plain doubles stay fine for convergence metrics and intermediate
math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 21 integer digits headroom: exact for sums up to 1e21 at 6 fractional digits
_DEC = "decimal(27,6)"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM: decimal accumulate → double → round."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)).cast("double"), scale)


def davg(col: Column | str) -> Column:
    """Order-independent AVG over non-null values: exact decimal sum cast to
    double, divided by count. Deliberately UNROUNDED — the two operands are
    bit-identical on both engines, so the IEEE division result is too, while
    a final ROUND is engine-specific on .xx5 ties (Spark rounds via exact
    BigDecimal HALF_UP; DuckDB via round(x·10^s)/10^s whose multiply error
    flips systematic ties — observed at sf0.01)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def dsum_sql(expr: str, scale: int = 6) -> str:
    """Oracle-side twin of dsum for DuckDB SQL strings. ROUND here is safe:
    the decimal sum has ≤6 fractional digits, so both engines' ROUND is the
    identity on the shared double."""
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE), {scale})"


def davg_sql(expr: str) -> str:
    """Oracle-side twin of davg (unrounded, see davg)."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
