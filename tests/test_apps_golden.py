"""Reference-parity CLI apps vs the published golden outputs.

Goldens: Output_TestN15_1_3_9_2.pdf (9/7/4) and
output_uber10k_0.02_10_5_2.pdf (236 outliers / 165 sure / 195
uncertain) from Homework_1/Data/Example/.
"""

from __future__ import annotations

import os
import re

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")
TESTN15 = os.path.join(FIXTURES, "testn15.csv")
UBER10K = "/root/reference/Homework_1/Data/uber-10k.csv"


def _grab(lines, pattern):
    for ln in lines:
        m = re.match(pattern, ln)
        if m:
            return m.group(1)
    raise AssertionError(f"no line matches {pattern!r} in {lines}")


def test_hw1_testn15_golden(spark):
    from big_data_hw_23_24_spark.apps.hw1 import run

    lines = run(spark, TESTN15, 1.0, 3, 9, 2)
    assert _grab(lines, r"Number of points: (\d+)") == "15"
    assert _grab(lines, r"Number of Outliers = (\d+)") == "9"
    assert _grab(lines, r"Number of sure outliers = (\d+)") == "7"
    assert _grab(lines, r"Number of uncertain points = (\d+)") == "4"
    # the 9 printed outlier points = the golden's set
    pts = {ln for ln in lines if ln.startswith("Point: ")}
    golden = {
        "Point: (3.21, 4.6)", "Point: (0.5, 4.1)", "Point: (1.1, 5.0)",
        "Point: (1.51, 3.2)", "Point: (4.32, 4.3)", "Point: (1.11, 5.1)",
        "Point: (1.52, 3.6)", "Point: (4.11, 4.11)", "Point: (0.4, 0.9)",
    }
    assert pts == golden
    # golden cell list: nine singleton cells (tie order differs — set compare)
    cells = {re.sub(r"\s+", " ", ln) for ln in lines if ln.startswith("Cell: ")}
    assert cells == {
        "Cell: (4, 10) Size = 1", "Cell: (2, 3) Size = 1",
        "Cell: (9, 13) Size = 1", "Cell: (1, 2) Size = 1",
        "Cell: (11, 11) Size = 1", "Cell: (12, 12) Size = 1",
        "Cell: (1, 11) Size = 1", "Cell: (2, 2) Size = 1",
        "Cell: (4, 9) Size = 1",
    }


@pytest.mark.slow
def test_hw1_uber10k_golden(spark):
    from big_data_hw_23_24_spark.apps.hw1 import run

    lines = run(spark, UBER10K, 0.02, 10, 5, 2)
    assert _grab(lines, r"Number of points: (\d+)") == "10000"
    assert _grab(lines, r"Number of Outliers = (\d+)") == "236"
    assert _grab(lines, r"Number of sure outliers = (\d+)") == "165"
    assert _grab(lines, r"Number of uncertain points = (\d+)") == "195"


def test_hw2_testn15_format_and_properties(spark):
    import numpy as np

    from big_data_hw_23_24_spark.apps.hw2 import run
    from big_data_hw_23_24_spark.operators.clustering import sequential_fft

    lines = run(spark, TESTN15, 3, 4, 2)
    assert any(re.match(r"Running time of MRFFT Round [123] = \d+ ms", ln)
               for ln in lines)
    radius = float(_grab(lines, r"Radius = ([0-9.]+)"))
    # 2-approx sanity vs sequential FFT on the full 15 points
    pts = np.loadtxt(TESTN15, delimiter=",")
    centers = sequential_fft(pts, 4)
    d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    seq_radius = float(np.sqrt(d2.min(axis=1).max()))
    assert radius <= 2 * seq_radius + 1e-6
    assert radius > 0


def test_hw3_report_format_matches_golden_shape(spark):
    from big_data_hw_23_24_spark.apps.hw3 import report_lines
    from big_data_hw_23_24_spark.streaming.frequent_stream import (
        FrequentItemsMonitor,
    )

    # deterministic stream: 10 heavy items (freq 0.08 each), unique tail
    n = 10_000
    items = []
    for i in range(n):
        items.append(i % 10 if i % 100 < 80 else 1_000_000 + i)
    monitor = FrequentItemsMonitor(n=n, phi=0.07, eps=0.03, delta=0.1)
    monitor.histogram = {}
    from collections import Counter
    monitor.histogram.update(Counter(items))
    monitor.stream_length = n
    monitor.reservoir.add_many(items)
    monitor.sticky.add_many(items)

    lines = report_lines(monitor, "8888")
    text = "\n".join(lines)
    # exact section structure of Output1M_007_003_01_8888.txt
    for header in ["INPUT PROPERTIES", "EXACT ALGORITHM",
                   "RESERVOIR SAMPLING", "STICKY SAMPLING"]:
        assert header in lines
    assert re.search(r"n = 10000 phi = 0\.07 epsilon = 0\.03 "
                     r"delta = 0\.1 port = 8888", text)
    assert _grab(lines, r"Number of true frequent items = (\d+)") == "10"
    assert _grab(lines, r"Size m of the sample = (\d+)") == "15"
    # ± annotation lines look exactly like the golden's
    assert re.search(r"^\d+ [+-]$", text, re.M)
    # sticky recovers all true frequent items (published behavior at ε=0.03)
    sticky_idx = lines.index("STICKY SAMPLING")
    sticky_plus = {int(ln.split()[0]) for ln in lines[sticky_idx:]
                   if re.match(r"^\d+ \+$", ln)}
    assert sticky_plus == set(range(10))


def test_wordcount_app(spark, tmp_path):
    from big_data_hw_23_24_spark.apps.wordcount import run

    p = tmp_path / "lines.txt"
    p.write_text("a b a\nc a b\n")
    lines = run(spark, str(p), 2)
    assert lines[0] == "Number of distinct words = 3"
    assert lines[1] == "Total word occurrences = 6"
    assert lines[2] == "Average word length = 1.0"
