"""operators/layout.py: Z-order interleaving — bit-level spec, Column
vs generated-SQL agreement, and the data-skipping property the key
exists to provide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_hw_23_24_spark.operators.layout import (
    z_value,
    z_value_sql,
)


def _py_z(x: int, y: int, bits: int) -> int:
    """Independent bit-by-bit reference (no shared constants)."""
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_bitwise_reference(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 5, 255, 4095, 65535)
            for y in (0, 1, 7, 100, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.select("x", "y", z_value(F.col("x"), F.col("y"),
                                       bits=16).alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_z(x & 0xFFFF, y & 0xFFFF, 16), (x, y)


def test_z_value_sql_agrees_with_column_form(spark):
    import duckdb

    rows = [(i * 37 % 4096, i * 101 % 4096) for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(r.z for r in
                 df.select(z_value(F.col("x"), F.col("y"),
                                   bits=12).alias("z")).collect())
    con = duckdb.connect()
    want = sorted(t[0] for t in con.sql(
        "SELECT " + z_value_sql("x", "y", bits=12)
        + " FROM (SELECT unnest($1) AS x, unnest($2) AS y)",
        params=[[r[0] for r in rows], [r[1] for r in rows]]).fetchall())
    con.close()
    assert got == want


def test_z_value_masks_inputs_and_validates_bits(spark):
    df = spark.createDataFrame([(1 << 20, 3)], "x long, y long")
    # bits=12 masks x to its low 12 bits (0) -> z = spread(3)<<1 = 0b1010
    assert df.select(z_value(F.col("x"), F.col("y"), bits=12)
                     .alias("z")).collect()[0].z == 10
    with pytest.raises(ValueError, match="bits"):
        z_value(F.col("x"), F.col("y"), bits=0)
    with pytest.raises(ValueError, match="bits"):
        z_value_sql("x", "y", bits=32)


def test_zorder_sort_gives_two_dimensional_file_locality(spark):
    """The point of the key: range-split the z-sorted grid and BOTH
    coordinates have per-chunk spans near sqrt(chunk size), where a
    one-column sort leaves the other column's span at full width."""
    side = 64
    rows = [(x, y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(rows, "x long, y long")
    zs = (df.select("x", "y", z_value(F.col("x"), F.col("y"),
                                      bits=6).alias("z"))
          .orderBy("z").collect())
    chunk = 256                          # 16 files of a 4096-cell grid
    for i in range(0, len(zs), chunk):
        part = zs[i:i + chunk]
        xs = [r.x for r in part]
        ys = [r.y for r in part]
        # a 256-cell z-range is a 16x16 tile: span 15 on each axis
        assert max(xs) - min(xs) <= 16
        assert max(ys) - min(ys) <= 16
