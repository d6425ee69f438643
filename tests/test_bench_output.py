"""bench.py's stdout contract: ONE JSON line that fits the round
driver's tail-capture buffer (last 2000 chars of output). Round 6 lost
its official bench record when the line outgrew the buffer — these
tests pin the guard that keeps that from recurring.
"""

from __future__ import annotations

import json

from bench import HEADLINE, format_output_line


def test_current_headline_set_fits_the_buffer():
    # The line is ALWAYS the slowest-20 fallback now (full per-query
    # detail lives in BENCH_DETAIL.json); what must hold is that it
    # parses, fits the driver's 2000-char tail buffer, and carries the
    # full-set total. The live headline count is pinned HERE (comments
    # elsewhere don't tally it).
    assert len(HEADLINE) == 187  # +media_wav_decode in r14
    timings = {n: 1.234 for n in HEADLINE}
    line = format_output_line(timings, 0.1)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert parsed["estimator"] == "min3_warmed"
    assert parsed["value"] == round(sum(timings.values()), 3)
    if "n_queries" in parsed:  # fallback form
        assert parsed["n_queries"] == len(HEADLINE)
        assert parsed["queries_full"] == "BENCH_DETAIL.json"
        assert len(parsed["queries"]) == 20
    else:
        assert parsed["queries"] == timings


def test_overflow_falls_back_to_slowest_20():
    timings = {f"query_with_a_long_descriptive_name_{i:03d}": i / 1000.0
               for i in range(200)}
    line = format_output_line(timings, 0.1)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["n_queries"] == 200
    assert len(parsed["queries"]) == 20
    assert parsed["queries_full"] == "BENCH_DETAIL.json"
    # the retained subset is the slowest 20, and the total still
    # reflects ALL queries
    assert min(parsed["queries"].values()) >= 0.180
    assert parsed["value"] == round(sum(timings.values()), 3)


def test_load_start_rides_the_line_when_sampled():
    # r15 (r14 verdict item 2): the 1-min loadavg at bench start must
    # ride the one-line JSON so PERF diffs are load-qualifiable without
    # BENCH_DETAIL (which later passes overwrite). Additions-only: the
    # field appears only when sampled, existing keys are untouched.
    timings = {n: 1.234 for n in HEADLINE}
    line = format_output_line(timings, 0.1, load_start=4.1467)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["load_start"] == 4.15
    assert parsed["value"] == round(sum(timings.values()), 3)
    # overflow fallback carries it too
    big = {f"query_with_a_long_descriptive_name_{i:03d}": i / 1000.0
           for i in range(200)}
    over = json.loads(format_output_line(big, 0.1, load_start=0.3))
    assert over["load_start"] == 0.3
    # and absent when not sampled (old callers unchanged)
    assert "load_start" not in json.loads(format_output_line(timings, 0.1))
