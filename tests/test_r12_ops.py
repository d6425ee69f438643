"""Operator tests for the round-12 additions (E172+)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


def test_reciprocal_ivf_recovers_planted_partners(spark):
    """One-hot A vectors and their scaled copies in B, every vector
    its own pinned list, nprobe=1: each direction's nearest list IS
    the planted partner's, so all pairs come back mutual with
    cosine 1."""
    from big_data_hw_23_24_spark.operators.similarity import (
        reciprocal_best_match_ivf)

    dim = 8
    a = _emb(spark, [(i, [1.0 if d == i else 0.0 for d in range(dim)])
                     for i in range(dim)])
    b = _emb(spark, [(100 + i,
                      [0.9 if d == i else 0.0 for d in range(dim)])
                     for i in range(dim)])
    got = sorted((r.id_a, r.id_b, r.cosine) for r in
                 reciprocal_best_match_ivf(
                     a, b, nprobe=1, cent_below_b=200,
                     cent_below_a=dim).collect())
    assert got == [(i, 100 + i, 1.0) for i in range(dim)]


def test_reciprocal_ivf_subset_of_exact_candidates(spark):
    """With nprobe covering every list, IVF-mutual equals the exact
    mutual set (the gate's recall-1 configuration)."""
    from big_data_hw_23_24_spark.operators.similarity import (
        reciprocal_best_match, reciprocal_best_match_ivf)

    import random
    rng = random.Random(7)
    a = _emb(spark, [(i, [rng.uniform(-1, 1) for _ in range(6)])
                     for i in range(10)])
    b = _emb(spark, [(100 + i, [rng.uniform(-1, 1) for _ in range(6)])
                     for i in range(30)])
    exact = {(r.id_a, r.id_b) for r in
             reciprocal_best_match(a, b).collect()}
    # cent_below covers all ids on both sides -> every vector is a
    # list; nprobe >= list count -> every list probed -> exact scan
    pred = {(r.id_a, r.id_b) for r in
            reciprocal_best_match_ivf(a, b, nprobe=200,
                                      cent_below_b=200,
                                      cent_below_a=100).collect()}
    assert pred == exact
