"""Operator tests for the r11 additions: record linkage (blocked +
sorted-neighborhood), calendar gaps, Benford audit, media header
parse, B-cubed evaluation."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=12, deadline=None)


def test_blocked_fuzzy_drops_oversized_blocks(spark):
    """A degenerate block (empty key, 'smith') is a quadratic bucket;
    the max_block guard must drop it entirely, not explode."""
    from big_data_hw_23_24_spark.operators.linkage import (
        blocked_fuzzy_pairs)

    rows = [(i, f"mega entity {i % 2}", "mega") for i in range(50)]
    rows += [(100, "small alpha", "ok"), (101, "small alphb", "ok"),
             (102, "other words", "ok2")]
    df = spark.createDataFrame(rows, "doc_id long, e string, blk string")
    got = {(r.id_a, r.id_b, r.dist)
           for r in blocked_fuzzy_pairs(df, "e", F.col("blk"),
                                        max_dist=2, max_block=10)
           .collect()}
    # the 50-row mega block contributes nothing; the small block pairs
    assert got == {(100, 101, 1)}
    # raising the cap readmits the mega block
    n = blocked_fuzzy_pairs(df, "e", F.col("blk"), max_dist=2,
                            max_block=100).count()
    assert n > 100  # 50 rows over 2 near-identical entities


@given(ents=st.lists(st.text(alphabet="abc", min_size=0, max_size=4),
                     min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_snm_matches_rank_window_definition(spark, ents):
    """On random short strings (heavy ties), the bucket-adjacency SNM
    equals the definitional rank-window self-join — across forced
    partition boundaries."""
    from big_data_hw_23_24_spark.operators.linkage import (
        sorted_neighborhood_pairs)

    w, md = 3, 1
    rows = [(i, e) for i, e in enumerate(ents)]
    df = spark.createDataFrame(rows, "doc_id long, e string")
    got = {(r.id_a, r.id_b, r.rank_gap, r.dist)
           for r in sorted_neighborhood_pairs(
               df, "e", window=w, max_dist=md,
               num_partitions=4).collect()}
    # brute force: rank by (e, id), all pairs within w ranks
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    want = set()

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    for i in range(len(ranked)):
        for j in range(i + 1, min(i + w + 1, len(ranked))):
            d = lev(ranked[i][1], ranked[j][1])
            if d <= md:
                want.add((ranked[i][0], ranked[j][0], j - i, d))
    assert got == want


def test_calendar_gaps_recovers_planted_runs(spark):
    """Missing-day runs aggregate into (start, end, n_days) islands;
    a gapless group reports nothing; boundaries (first/last day) are
    outside the spine by construction."""
    from big_data_hw_23_24_spark.operators.timeseries import (
        calendar_gaps)

    days = [f"2024-02-{d:02d}" for d in range(1, 21)]
    rows = [("a", d) for d in days if d[-2:] not in ("05", "06", "11")]
    rows += [("b", d) for d in days]
    df = spark.createDataFrame(rows, "grp string, day string") \
        .select("grp", F.col("day").cast("date").alias("day"))
    got = {(r.grp, r.gap_start, r.gap_end, r.n_days)
           for r in calendar_gaps(df, "day", "grp").collect()}
    assert got == {("a", "2024-02-05", "2024-02-06", 2),
                   ("a", "2024-02-11", "2024-02-11", 1)}


def test_benford_digits_from_integer_cents(spark):
    """First digit comes from integer cents, never floor(log10): 0.05
    → 5 cents → digit 5; 999.995-style float hazards can't flip it.
    Non-positive values are excluded; proportions sum to 1."""
    from big_data_hw_23_24_spark.operators.grouped import (
        BENFORD_P, benford_report)

    rows = [(1, 123.45), (2, 0.05), (3, 9000.0), (4, 1.0),
            (5, -7.0), (6, 0.0), (7, 19.99)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r.digit: r for r in benford_report(df, "v").collect()}
    assert set(got) == {1, 5, 9}
    assert got[1].n_obs == 3          # 123.45, 1.00, 19.99
    assert got[5].n_obs == 1          # 0.05 -> "5"
    assert got[9].n_obs == 1          # 9000.0
    assert abs(sum(r.p_obs for r in got.values()) - 1.0) < 1e-6
    assert got[1].p_benford == BENFORD_P[1]


def test_media_header_roundtrip_and_quarantine(spark):
    """Assemble → binary → parse equals the synthesis spec; corrupt
    (truncated) payloads quarantine with null dims."""
    from big_data_hw_23_24_spark.operators.multimodal import (
        parse_media_headers, synth_media_headers)

    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(30)], "doc_id long, text string")
    got = {r.media_id: r for r in
           parse_media_headers(synth_media_headers(docs)).collect()}
    assert len(got) == 30
    for i in range(30):
        r = got[i]
        if i % 13 == 0:
            assert (r.format, r.width, r.height, r.header_ok,
                    r.n_bytes) == ("unknown", None, None, False, 3)
        else:
            assert r.format == {0: "png", 1: "jpeg", 2: "wav"}[i % 3]
            assert r.width == 16 + i % 640
            assert r.height == 16 + (i * 7) % 480
            assert r.header_ok
            assert r.n_bytes == 8 + len(f"body {i}".encode())
    # foreign bytes (no synthesized header) quarantine too
    alien = spark.createDataFrame([(99, bytearray(b"GIF89a....."))],
                                  "media_id long, media binary")
    a = parse_media_headers(alien).collect()[0]
    assert (a.format, a.header_ok) == ("unknown", False)


def test_bcubed_hand_example(spark):
    """Worked example (Amigó et al. 2009 style): pred splits one truth
    cluster and merges across another — averages computed by hand."""
    from big_data_hw_23_24_spark.operators.dedup import bcubed_report

    #   truth clusters: {1,2,3}, {4,5}
    #   pred  clusters: {1,2},   {3,4,5}
    rows = [(1, "p1", "t1"), (2, "p1", "t1"), (3, "p2", "t1"),
            (4, "p2", "t2"), (5, "p2", "t2")]
    df = spark.createDataFrame(rows, "doc_id long, pred string, truth string")
    r = bcubed_report(df).collect()[0]
    # precision: d1,d2 -> 2/2; d3 -> 1/3; d4,d5 -> 2/3  => avg 0.733333
    # recall:    d1,d2 -> 2/3; d3 -> 1/3; d4,d5 -> 2/2  => avg 0.733333
    assert r.n_docs == 5
    assert r.b3_precision == pytest.approx(0.733333, abs=1e-6)
    assert r.b3_recall == pytest.approx(0.733333, abs=1e-6)
    assert r.b3_f1 == pytest.approx(0.733333, abs=1e-6)
