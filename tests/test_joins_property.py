"""Property tests for the join rewrites: on random keyed sequences the
rewritten plans must equal the brute-force O(n·m) reference semantics
exactly — the rewrite is a performance transformation, never a
semantic one. (asof_join is type-generic over the time column: these
run it on plain longs, the registry runs it on timestamps.)"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(st.integers(0, 2),      # key
              st.integers(0, 50)),    # time
    min_size=0, max_size=10)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(left=_rows, right=_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    from big_data_hw_23_24_spark.operators.joins import asof_join

    lrows = [(i, k, t) for i, (k, t) in enumerate(left)]
    rrows = [(i, k, t, t * 10 + i) for i, (k, t) in enumerate(right)]
    l = spark.createDataFrame(lrows, "lid long, k long, t long") \
        if lrows else None
    r = spark.createDataFrame(rrows, "rid long, rk long, rt long, pay long")
    if l is None:
        return
    got = {(row.lid, row.rid, row.pay) for row in
           asof_join(l, r, "k", "rk", "t", "rt",
                     ["rid", "pay"], tiebreak_col="rid").collect()}

    want = set()
    for lid, k, t in lrows:
        cand = [(rt, rid, pay) for rid, rk, rt, pay in rrows
                if rk == k and rt <= t]
        if cand:
            rt, rid, pay = max(cand)  # latest time, then max tiebreak id
            want.add((lid, rid, pay))
        else:
            want.add((lid, None, None))
    assert got == want


def test_asof_join_ignores_null_right_times(spark):
    """A right row with NULL time must match NO left row (contract:
    r.t <= l.t). Nulls sort first in the carry-forward window, so
    without the explicit filter its payload would leak into every
    left row of the key."""
    from big_data_hw_23_24_spark.operators.joins import asof_join

    l = spark.createDataFrame([(0, 1, 10)], "lid long, k long, t long")
    r = spark.createDataFrame([(7, 1, None, 777), (8, 1, 5, 55)],
                              "rid long, rk long, rt long, pay long")
    got = {(row.lid, row.rid, row.pay) for row in
           asof_join(l, r, "k", "rk", "t", "rt",
                     ["rid", "pay"], tiebreak_col="rid").collect()}
    assert got == {(0, 8, 55)}

    # when the null-time row is the ONLY candidate: no match at all
    r2 = spark.createDataFrame([(7, 1, None, 777)],
                               "rid long, rk long, rt long, pay long")
    got2 = {(row.lid, row.rid, row.pay) for row in
            asof_join(l, r2, "k", "rk", "t", "rt",
                      ["rid", "pay"], tiebreak_col="rid").collect()}
    assert got2 == {(0, None, None)}


@given(left=_rows, right=_rows, window=st.integers(1, 20))
@settings(**_SETTINGS)
def test_range_join_matches_bruteforce(spark, left, right, window):
    from big_data_hw_23_24_spark.operators.joins import time_bucket_range_join

    base = datetime.datetime(2024, 1, 1)
    ts = lambda t: base + datetime.timedelta(seconds=t)
    lrows = [(i, k, ts(t)) for i, (k, t) in enumerate(left)]
    rrows = [(i, k, ts(t)) for i, (k, t) in enumerate(right)]
    if not lrows or not rrows:
        return
    l = spark.createDataFrame(lrows, "lid long, k long, t timestamp")
    r = spark.createDataFrame(rrows, "rid long, rk long, rt timestamp")
    got = {(row.lid, row.rid) for row in
           time_bucket_range_join(l, r, "k", "rk", "t", "rt",
                                  window).collect()}
    want = {(lid, rid)
            for lid, k, t in lrows
            for rid, rk, rt in rrows
            if rk == k and t <= rt < t + datetime.timedelta(seconds=window)}
    assert got == want


@given(n=st.integers(0, 200), size=st.integers(1, 40),
       stride_frac=st.integers(1, 10))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_token_chunks_random_shapes(spark, n, size, stride_frac):
    """For arbitrary (n_tokens, size, stride ≤ size): chunks tile the
    token range with the exact formula count, every token is covered,
    and concatenating stride-aligned prefixes reconstructs the doc."""
    import math

    from big_data_hw_23_24_spark.operators.textstats import token_chunks

    stride = max(1, size * stride_frac // 10)  # 10%..100% of size
    text = " ".join(f"w{i}" for i in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(token_chunks(docs, size=size, stride=stride).collect(),
                 key=lambda r: r.chunk_id)
    if n == 0:
        assert got == []
        return
    expect_chunks = 1 + math.ceil(max(n - size, 0) / stride)
    assert len(got) == expect_chunks
    covered = set()
    for r in got:
        start = r.chunk_id * stride
        toks = r.chunk_text.split(" ") if r.chunk_text else []
        assert toks == [f"w{i}" for i in
                        range(start, min(start + size, n))]
        assert r.n_chunk_tokens == len(toks)
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(n))
