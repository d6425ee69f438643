"""Multi-dimensional data layout: Z-order (Morton) interleaving for
data-skipping writes.

A 100 TB table is read through its min/max column statistics: sorting
by one column clusters that column's predicate ranges but scatters
every other column's. Interleaving the bits of two key columns
(Z-order — what Delta's ``OPTIMIZE ZORDER BY`` and ClickHouse's
``mortonEncode`` do) gives every interleaved column locality
proportional to sqrt of the file count, so 2-D predicates
(``user BETWEEN … AND ts BETWEEN …``) prune files on both axes.

The kernel is pure 64-bit integer arithmetic (the classic mask-shift
bit spread), expressible identically in any engine — the query face is
fully oracle-checkable. Usage at scale::

    z = z_value(F.col("cx"), F.col("cy"))
    write_sorted_parquet(df.withColumn("z", z), path, ["z"])

i.e. one range-partitioned sort on the z key, then the parquet footers
carry tight min/max on BOTH cx and cy per file.

The reference engine has no layout surface (its inputs are flat CSV);
declared new surface, SURVEY.md E81.

Division of labor with ``sources/sinks.py::write_zorder_parquet``:
the sink is the production WRITER (N columns, min/max or
equal-frequency rank bucketing, range-partitioned file split); this
module is the 2-D interleave KERNEL in its oracle-checkable form —
the same spread schedule generates both the Column expression and the
DuckDB SQL, so the arithmetic itself carries a driver-checked row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 32-bit int's bits to the even bit
# positions of a 64-bit word. The DuckDB oracle embeds the SAME
# constants (z_spread_steps is the spec both engines share).
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def z_spread_steps() -> tuple[tuple[int, int], ...]:
    """The (shift, mask) spread schedule — exposed so oracle SQL can be
    generated from the same literals the Column expression uses."""
    return _SPREAD_STEPS


def _spread(col: Column) -> Column:
    x = col.cast("long")
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order key of two NON-NEGATIVE ints: interleave the low
    ``bits`` bits (x on even positions, y on odd). ``bits <= 31`` keeps
    every intermediate below 2⁶³, so the arithmetic is overflow-free
    two's-complement in any engine. Inputs are masked to ``bits`` first
    — callers quantize/offset floats or negatives to unsigned grid
    coordinates themselves (the operator cannot guess the domain).
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in 1..31, got {bits}")
    lim = F.lit((1 << bits) - 1)
    xs = _spread(x.cast("long").bitwiseAND(lim))
    ys = _spread(y.cast("long").bitwiseAND(lim))
    return xs.bitwiseOR(F.shiftleft(ys, 1))


def z_value_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical computation as portable SQL text (DuckDB and
    Spark SQL share ``&``, ``|``, ``<<`` on BIGINT) — the generated
    oracle can never drift from the Column form because both are
    produced from ``_SPREAD_STEPS``."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in 1..31, got {bits}")

    def spread(e: str) -> str:
        for shift, mask in _SPREAD_STEPS:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    lim = (1 << bits) - 1
    xs = spread(f"(CAST({x_expr} AS BIGINT) & {lim})")
    ys = spread(f"(CAST({y_expr} AS BIGINT) & {lim})")
    return f"({xs} | ({ys} << 1))"
