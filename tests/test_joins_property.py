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
