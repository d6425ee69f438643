"""Distance-based (M,D)-outlier detection, Spark-first.

Reference semantics (verified against ``G019HW1.java``):

* ``exactOutliers`` (``G019HW1.java:119-167``): a point is an outlier
  iff at most M points (self included — the inner loop counts the point
  against itself at distance 0) lie at Euclidean distance **strictly
  less than** D. Reports the outlier count and the first K outliers by
  non-decreasing neighbor count.
* ``MRApproxOutliers`` (``G019HW1.java:177-284``; HW2 variant
  ``G016HW2.java:229-316``): grid with cell side Λ = D/(2√2); per-cell
  size; N3/N7 = total points in the 3×3 / 7×7 cell neighborhood (self
  included). Sure outliers = Σ size over cells with N7 ≤ M; uncertain
  = Σ size over cells with N3 ≤ M < N7; plus the first K cells by
  non-decreasing size.

Architecture vs the reference: the reference runs exact detection as a
driver-side O(N²) double loop (gated at N ≤ 200 000) and MRApprox Step
B as a driver loop over collected cells. Here **both** are single
distributed DataFrame pipelines:

* exact: grid-bucket points with cell side D, offset-explode the 3×3
  neighborhood into an equi-join (a point's < D neighbors can only lie
  in adjacent cells), then filter on true squared distance. This is a
  hash join + hash aggregate — shuffle-scalable where the reference is
  driver-bound; no N ≤ 200k guard needed.
* approx: cell histogram → 7×7 offset-explode equi-join → conditional
  aggregation; the whole thing is one Catalyst plan with map-side
  partial aggregation (the reference's hand-coded ``reduceByKey``
  combine comes free).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import cell_ids, dist_sq, neighbor_offsets


def _neighbor_counts(points: DataFrame, d: float,
                     prune_m: int | None = None) -> DataFrame:
    """Per-point count of neighbors at distance < d (self included).

    Scalable exact algorithm: bucket into a grid of side d; any pair at
    distance < d falls in the same or Chebyshev-adjacent cells, so the
    candidate set is an equi-join on shifted cell ids — O(N·density)
    work instead of O(N²).

    ``prune_m``: when only points with ≤ m neighbors are wanted (the
    outlier case), points in a dense cell of side 0.7·d holding > m
    points are provably non-outliers — every same-cell pair is within
    0.7√2·d < d — and are dropped from the probe side before the join.
    This is the reference's size>M skip (``G016HW2.java:256-260``)
    lifted from cells to the exact detector; on clustered data it
    shrinks the expensive join by ~an order of magnitude.
    """
    probe_side = points
    if prune_m is not None:
        dense_side = 0.7 * d
        dense = cell_ids(points, dense_side)
        sparse_cells = dense.groupBy("ci", "cj") \
            .agg(F.count("*").alias("dcount")) \
            .where(F.col("dcount") <= prune_m) \
            .select("ci", "cj")
        # no broadcast hint: sparse-cell count grows with the data, so a
        # forced broadcast OOMs at scale — AQE picks broadcast when the
        # cell list is actually small
        probe_side = dense.join(sparse_cells, ["ci", "cj"], "left_semi") \
            .select(points.columns)
    pts = cell_ids(points, d)
    probe_pts = cell_ids(probe_side, d)

    # Each point, re-keyed to every neighboring cell it must probe —
    # a 3×3 literal-offset explode (exact for cell side d), fully
    # inside codegen.
    probes = (
        probe_pts.select("ci", "cj", "pid", "x", "y",
                         F.explode(neighbor_offsets(1)).alias("o"))
        .select(
            (F.col("ci") + F.col("o.di")).alias("ci"),
            (F.col("cj") + F.col("o.dj")).alias("cj"),
            F.col("pid").alias("a_pid"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
        )
    )
    candidates = pts.select("ci", "cj",
                            F.col("x").alias("bx"), F.col("y").alias("by"))
    return (
        probes.join(candidates, ["ci", "cj"])  # shuffled hash equi-join
        .where(dist_sq(F.col("ax"), F.col("ay"),
                       F.col("bx"), F.col("by")) < d * d)
        .groupBy("a_pid", "ax", "ay")
        .agg(F.count("*").alias("n_neighbors"))
        .select(F.col("a_pid").alias("pid"),
                F.col("ax").alias("x"), F.col("ay").alias("y"),
                "n_neighbors")
    )


def exact_outliers(points: DataFrame, d: float, m: int) -> DataFrame:
    """All exact (M,D)-outliers with their neighbor counts.

    Input: DataFrame with columns (pid, x, y). Output: (pid, x, y,
    n_neighbors) for every point with n_neighbors ≤ m (self included),
    i.e. the reference's ``notOutliers.size() < M + 1`` rule.
    Order with ``.orderBy('n_neighbors').limit(k)`` for the report —
    Catalyst turns that into TakeOrderedAndProject (true top-k),
    unlike the reference's full sort (``G019HW1.java:148-153``).
    The dense-cell prune (see ``_neighbor_counts``) drops provably
    non-outlier probes before the join without changing the result.
    """
    return _neighbor_counts(points, d, prune_m=m) \
        .where(F.col("n_neighbors") <= m)


def cell_grid_stats(points: DataFrame, d: float,
                    m: int | None = None) -> DataFrame:
    """Step A+B of MRApproxOutliers as one plan: per-cell (size, n3, n7).

    Cell side Λ = D/(2√2) (``G019HW1.java:181``). The 7×7 neighborhood
    sum is an offset-explode equi-join against the cell histogram; the
    3×3 sum is the conditional slice |di|≤1 ∧ |dj|≤1 of the same
    fan-out, so one join serves both.

    ``m`` encodes the HW2 size>M short-circuit (``G016HW2.java:
    256-260``): a cell with size > M already has n3 ≥ size > M from its
    self-contribution alone, so it can never be sure or uncertain — the
    reference's Step-B driver loop skips it, and here it is dropped by
    a ``size ≤ m`` filter on the aggregated stats, inside the same
    single-scan plan. A join formulation that additionally skips the
    49× explode for big cells was built and measured, then rejected:
    the histogram feeds both join sides, so it needs either two full
    point scans or a localCheckpoint barrier (2× the dominant cost at
    100 TB, or pinned executor memory + an AQE-opaque ExistingRDD), and
    benched 1.65 s vs 1.1 s for this form at sf0.1. The explode the
    join saves is CELL-scale — every big cell must still fan out as a
    *contributor* to its small neighbors — so the saving cannot grow
    with the data while the extra scan does.
    """
    lam = d / (2.0 * math.sqrt(2.0))
    cells = cell_ids(points, lam).groupBy("ci", "cj") \
        .agg(F.count("*").alias("size"))
    o = F.col("o")

    # Single-scan path: contribution of every cell to each 7×7 neighbor,
    # tagged with whether it lands in the 3×3 slice and whether it is
    # the cell's own (0,0) contribution. ONE aggregation then yields
    # size, n3 and n7 simultaneously; empty target cells are exactly
    # those that never receive a self-contribution → filtered, no
    # join-back, and the input is scanned once.
    contribs = cells.select(
        "ci", "cj", "size", F.explode(neighbor_offsets(3)).alias("o"),
    ).select(
        (F.col("ci") + o.di).alias("ci"),
        (F.col("cj") + o.dj).alias("cj"),
        F.col("size").alias("contrib"),
        ((F.abs(o.di) <= 1) & (F.abs(o.dj) <= 1)).alias("in3"),
        ((o.di == 0) & (o.dj == 0)).alias("is_self"),
    )
    return (
        contribs.groupBy("ci", "cj")
        .agg(F.sum(F.when(F.col("is_self"), F.col("contrib"))).alias("size"),
             F.sum(F.when(F.col("in3"), F.col("contrib")).otherwise(0))
             .alias("n3"),
             F.sum("contrib").alias("n7"))
        .where(F.col("size").isNotNull() if m is None
               else F.col("size") <= m)
        .select("ci", "cj", "size", "n3", "n7")
    )


def mr_approx_outliers(points: DataFrame, d: float, m: int) -> DataFrame:
    """One-row summary (sure_outliers, uncertain_points) — C2's report.

    sure = Σ size where N7 ≤ M; uncertain = Σ size where N3 ≤ M < N7
    (algebraically identical to the reference's
    ``totalPoints - insideR7`` / ``insideR7 - insideR3`` accumulators,
    ``G019HW1.java:262-275``). Runs the size>M short-circuit path —
    cells skipped by it can satisfy neither predicate, so the sums are
    unchanged.
    """
    stats = cell_grid_stats(points, d, m=m)
    return stats.agg(
        F.coalesce(F.sum(F.when(F.col("n7") <= m, F.col("size"))), F.lit(0))
        .alias("sure_outliers"),
        F.coalesce(
            F.sum(F.when((F.col("n3") <= m) & (F.col("n7") > m),
                         F.col("size"))), F.lit(0))
        .alias("uncertain_points"),
    )
