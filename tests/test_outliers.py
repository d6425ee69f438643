"""Golden + property tests for exact and approximate outlier detection.

Goldens: TestN15 with D=1.0 M=3 K=9 L=2 → 9 exact outliers, 7 sure,
4 uncertain (reference `Homework_1/Data/Example/Output_TestN15_1_3_9_2.pdf`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_hw_23_24_spark.operators.outliers import (
    cell_grid_stats,
    exact_outliers,
    mr_approx_outliers,
)

D, M = 1.0, 3


def test_exact_outliers_testn15_golden(testn15):
    out = exact_outliers(testn15, D, M)
    assert out.count() == 9


def test_mr_approx_testn15_golden(testn15):
    row = mr_approx_outliers(testn15, D, M).collect()[0]
    assert row["sure_outliers"] == 7
    assert row["uncertain_points"] == 4


def test_exact_matches_bruteforce(testn15):
    # Grid-join exact algorithm == O(N²) brute force on the same points.
    pts = [(r.x, r.y) for r in testn15.collect()]
    brute = []
    for x1, y1 in pts:
        n = sum(1 for x2, y2 in pts if (x1 - x2) ** 2 + (y1 - y2) ** 2 < D * D)
        if n <= M:
            brute.append(((x1, y1), n))
    got = {((r.x, r.y), r.n_neighbors)
           for r in exact_outliers(testn15, D, M).collect()}
    assert got == set(brute)


def test_sandwich_property(testn15):
    """sure ⊆ exact-outliers ⊆ sure ∪ uncertain (First Assignment.pdf)."""
    n_exact = exact_outliers(testn15, D, M).count()
    row = mr_approx_outliers(testn15, D, M).collect()[0]
    assert row["sure_outliers"] <= n_exact
    assert n_exact <= row["sure_outliers"] + row["uncertain_points"]


def test_cell_stats_self_inclusion(testn15):
    # every cell's N3/N7 include its own size
    bad = cell_grid_stats(testn15, D).where(
        (F.col("n3") < F.col("size")) | (F.col("n7") < F.col("n3"))
    )
    assert bad.count() == 0


def test_size_gt_m_short_circuit_matches_full_stats(spark, testn15):
    """The HW2 size>M skip (G016HW2.java:256-260): the pruned path must
    return exactly the full-stats rows restricted to size ≤ M cells —
    same n3/n7 — and fan out strictly fewer probe rows."""
    full = {(r.ci, r.cj): (r.size, r.n3, r.n7)
            for r in cell_grid_stats(testn15, D).collect()}
    pruned = {(r.ci, r.cj): (r.size, r.n3, r.n7)
              for r in cell_grid_stats(testn15, D, m=M).collect()}
    assert pruned == {k: v for k, v in full.items() if v[0] <= M}
    assert any(v[0] > M for v in full.values())  # the skip is non-vacuous

    # the skip is a size ≤ M filter on the aggregated stats inside the
    # same single-scan no-join plan (the full path filters on
    # isnotnull(size) instead — never on a threshold)
    plan = cell_grid_stats(testn15, D, m=M)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Generate explode" in plan
    assert "Join" not in plan
    assert "(size" in plan and "<= 3" in plan, plan
    full_plan = cell_grid_stats(testn15, D)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "<= 3" not in full_plan


@pytest.mark.parametrize("n_parts", [1, 7])
def test_partition_invariance(testn15, n_parts):
    df = testn15.repartition(n_parts)
    row = mr_approx_outliers(df, D, M).collect()[0]
    assert (row["sure_outliers"], row["uncertain_points"]) == (7, 4)
    assert exact_outliers(df, D, M).count() == 9
