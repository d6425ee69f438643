"""Property tests for the r9/r10 operator tiers: on random inputs
the distributed plans must match pure-Python reference semantics
exactly (trending decay, KMV merge, triangle counts, skyline,
A-priori, attribution, block dedup) or respect their stated
guarantees (winnowing co-selection, keep-one ⊆ strip-all, GK rank
bounds). Example counts are kept small — every example runs real
Spark jobs."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# slow tier (r15): every operator probed here keeps its full-value
# oracle-parity row in the default suite run — these randomized
# reference sweeps are the belt-and-braces layer, opted out of the
# driver's budgeted default run (pytest -m slow restores them; the
# builder runs them before every round close)
pytestmark = pytest.mark.slow

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


# --- E141: time-decayed trending --------------------------------------------

@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),   # item
              st.integers(0, 25)),                # days before "now"
    min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_trending_matches_python_reference(spark, rows):
    from big_data_hw_23_24_spark.operators.timeseries import trending_items

    D = 86_400_000_000
    now = 1_700_000_000_000_000
    df = spark.createDataFrame([(it, now - d * D) for it, d in rows],
                               "item string, ts long")
    got = {r.item: (r.n_events, r.decayed_micros)
           for r in trending_items(df, k=10).collect()}
    # the operator's "now" is the corpus max day = the event with the
    # SMALLEST days-before offset
    dmin = min(d for _, d in rows)
    want: dict[str, tuple[int, int]] = {}
    for it, d in rows:
        ago = d - dmin
        w = 1_000_000 // (2 ** ago) if ago <= 19 else 0
        n, s = want.get(it, (0, 0))
        want[it] = (n + 1, s + w)
    assert got == want


# --- E135: KMV sketch mergeability -------------------------------------------

@given(items=st.lists(st.integers(0, 500), min_size=1, max_size=120),
       cut=st.integers(0, 120))
@settings(**_SETTINGS)
def test_kmv_merge_equals_whole_on_random_splits(spark, items, cut):
    from big_data_hw_23_24_spark.operators.frequent import (
        kmv_merge, kmv_sketch)

    # a sentinel row in BOTH slices (and the whole) keeps every input
    # non-empty for any random cut without changing set semantics
    def frame(xs):
        return spark.createDataFrame(
            [("g", str(x)) for x in xs] + [("g", "-sentinel-")],
            "grp string, item string")

    merged = sorted(r.h for r in kmv_merge(
        kmv_sketch(frame(items[:cut]), "item", "grp", k=16),
        kmv_sketch(frame(items[cut:]), "item", "grp", k=16),
        k=16).collect())
    whole = sorted(r.h for r in
                   kmv_sketch(frame(items), "item", "grp", k=16).collect())
    assert merged == whole


# --- E131: keep-one is a per-doc subset of strip-all ---------------------------

_texts = st.lists(
    st.lists(st.sampled_from(["w%d" % i for i in range(12)]),
             min_size=0, max_size=14).map(" ".join),
    min_size=2, max_size=5)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_keepone_removes_subset_of_stripall(spark, texts):
    from big_data_hw_23_24_spark.operators.textstats import (
        remove_repeated_spans, remove_repeated_spans_keepone)

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    strip = {r.doc_id: r.n_removed for r in
             remove_repeated_spans(docs, n=3, min_docs=2).collect()}
    keep = {r.doc_id: r.n_removed for r in
            remove_repeated_spans_keepone(docs, n=3, min_docs=2).collect()}
    for d in strip:
        assert keep[d] <= strip[d]
        if strip[d] == 0:
            assert keep[d] == 0


# --- E132: winnowing co-selection guarantee -------------------------------------

@given(blob=st.text(alphabet="abcdefgh", min_size=27, max_size=40),
       off1=st.integers(0, 15), off2=st.integers(0, 15))
@settings(**_SETTINGS)
def test_char_winnow_coselects_any_shared_27_run(spark, blob, off1, off2):
    """The published guarantee: a shared run of >= w+k-1 = 27 chars
    co-selects at least one fingerprint in both docs, at ANY pair of
    offsets (prefixes drawn from a DISJOINT alphabet so the planted
    run is the only shared content)."""
    from big_data_hw_23_24_spark.operators.textstats import char_span_flags

    d1 = "X" * off1 + blob + " one tail here."
    d2 = "Y" * off2 + blob + " other ending!!"
    docs = spark.createDataFrame([(1, d1), (2, d2)],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in char_span_flags(docs).collect()}
    assert out[1].n_flagged >= 1
    assert out[2].n_flagged >= 1


# --- E143: triangles match brute force ------------------------------------------

@given(baskets=st.lists(
    st.sets(st.integers(0, 7), min_size=2, max_size=4),
    min_size=2, max_size=8))
@settings(**_SETTINGS)
def test_triangles_match_bruteforce(spark, baskets):
    from big_data_hw_23_24_spark.operators.graph import item_triangles

    rows = [(u, it) for u, b in enumerate(baskets) for it in b]
    ev = spark.createDataFrame(rows, "user_id long, item long")
    got = {r.item: (r.degree, r.n_triangles)
           for r in item_triangles(ev, cap=20, min_co=2).collect()}
    # brute force: edge iff >= 2 users share the pair (cap never binds
    # at basket size <= 4)
    from collections import Counter
    pair_users = Counter()
    for b in baskets:
        for x, y in combinations(sorted(b), 2):
            pair_users[(x, y)] += 1
    edges = {p for p, n in pair_users.items() if n >= 2}
    nodes = {v for e in edges for v in e}
    deg = {v: sum(v in e for e in edges) for v in nodes}
    tri = {v: 0 for v in nodes}
    for a, b_, c in combinations(sorted(nodes), 3):
        if {(a, b_), (b_, c), (a, c)} <= edges:
            tri[a] += 1
            tri[b_] += 1
            tri[c] += 1
    assert got == {v: (deg[v], tri[v]) for v in nodes}


# --- E138: pre-tokenizer vs a third implementation -------------------------------

@given(text=st.text(
    alphabet="abcXY z0189'.,!-\n\t",
    min_size=0, max_size=60))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pretokenize_matches_python_re(spark, text):
    """Three-way agreement: the Spark plan (Java regex) must classify
    exactly like Python's re module on the same pattern — with the
    DuckDB oracle (RE2) already pinned by parity, all three regex
    engines agree on the leftmost-first alternation semantics."""
    import re

    from big_data_hw_23_24_spark.operators.tokenizer import (
        PRETOKEN_PATTERN, pretokenize_stats)

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = pretokenize_stats(docs).collect()[0]
    toks = re.findall(PRETOKEN_PATTERN, text)
    words = [t for t in text.split(" ") if t]
    assert r.n_pretokens == len(toks)
    assert r.n_words == sum(bool(re.fullmatch(r" ?[A-Za-z]+", t))
                            for t in toks)
    assert r.n_numbers == sum(bool(re.fullmatch(r" ?[0-9]+", t))
                              for t in toks)
    assert r.n_contractions == sum(
        bool(re.fullmatch(r"'(s|t|re|ve|m|ll|d)", t)) for t in toks)
    assert r.n_ws_tokens == len(words)


# --- E136: SCD2 invariants on random snapshot pairs --------------------------------

@given(old_ids=st.sets(st.integers(0, 8), max_size=6),
       new_ids=st.sets(st.integers(0, 8), max_size=6),
       changed=st.sets(st.integers(0, 8), max_size=4))
@settings(**_SETTINGS)
def test_scd2_invariants_on_random_snapshots(spark, old_ids, new_ids,
                                             changed):
    from big_data_hw_23_24_spark.operators.diff import scd2_history

    if not old_ids and not new_ids:
        return
    old = spark.createDataFrame(
        [(i, f"text {i}") for i in sorted(old_ids)] or [(None, None)],
        "doc_id long, text string").where(F.col("doc_id").isNotNull())
    new = spark.createDataFrame(
        [(i, f"text {i} v2" if i in changed else f"text {i}")
         for i in sorted(new_ids)] or [(None, None)],
        "doc_id long, text string").where(F.col("doc_id").isNotNull())
    hist = scd2_history(old, new).collect()
    by_id: dict[int, list] = {}
    for r in hist:
        by_id.setdefault(r.doc_id, []).append(r)
    assert set(by_id) == old_ids | new_ids
    for i, rs in by_id.items():
        # exactly one current row iff the id is live in the new
        # snapshot; closed intervals are never current
        assert sum(r.is_current for r in rs) == (1 if i in new_ids else 0)
        for r in rs:
            assert (r.valid_to is None) == r.is_current
        # modified ids carry exactly two rows (closed old + open new)
        if i in old_ids and i in new_ids and i in changed:
            assert len(rs) == 2
        if i in old_ids and i in new_ids and i not in changed:
            assert len(rs) == 1


# --- E149: 2-D skyline ---------------------------------------------------------

@given(pts=st.lists(
    st.tuples(st.integers(0, 6),                  # x (minimize)
              st.integers(0, 6)),                 # y (maximize)
    min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_skyline_matches_dominance_definition(spark, pts):
    """On random (small-domain, so ties and exact duplicates are
    frequent) point sets, the range-partitioned prefix-max skyline
    equals the brute-force dominance definition with min-id election —
    including across partition boundaries (4 partitions forced)."""
    from big_data_hw_23_24_spark.operators.ranking import skyline_2d

    rows = [(i, float(x), y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y int")
    got = sorted((r.id, r.x, r.y)
                 for r in skyline_2d(df, "x", "y", "id",
                                     num_partitions=4).collect())
    kept = []
    for i, x, y in rows:
        dominated = any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for j, x2, y2 in rows if j != i)
        dup_earlier = any(j < i and x2 == x and y2 == y
                          for j, x2, y2 in rows)
        if not dominated and not dup_earlier:
            kept.append((i, x, y))
    assert got == sorted(kept)
    # frontier invariant (minimize x, maximize y): along increasing x
    # the kept ys strictly increase — a later point only survives by
    # beating every cheaper point's y
    ys = [y for _, _, y in sorted(kept, key=lambda t: t[1])]
    assert all(a < b for a, b in zip(ys, ys[1:]))


# --- E148: A-priori frequent triples ---------------------------------------------

@given(rows=st.lists(
    st.tuples(st.integers(0, 5),                  # basket
              st.integers(0, 7)),                 # item
    min_size=1, max_size=40),
    minsup=st.integers(1, 3))
@settings(**_SETTINGS)
def test_itemset_triples_match_unpruned_definition(spark, rows, minsup):
    """On random small baskets the semi-join-pruned A-priori plan
    equals the brute-force definition exactly — downward closure is an
    optimization, never a semantics change."""
    from itertools import combinations as comb

    from big_data_hw_23_24_spark.operators.graph import itemset_triples

    df = spark.createDataFrame(rows, "o long, i long")
    got = {(r.item_a, r.item_b, r.item_c): r.support
           for r in itemset_triples(df, "o", "i", minsup=minsup).collect()}
    baskets: dict[int, set[int]] = {}
    for o, i in rows:
        baskets.setdefault(o, set()).add(i)
    want: dict[tuple, int] = {}
    for items in baskets.values():
        for t in comb(sorted(items), 3):
            want[t] = want.get(t, 0) + 1
    want = {t: s for t, s in want.items() if s >= minsup}
    assert got == want


# --- E152: U-shaped attribution --------------------------------------------------

@given(rows=st.lists(
    st.tuples(st.integers(0, 2),                    # user
              st.sampled_from(["purchase", "click", "view", "error"]),
              st.integers(0, 48)),                  # hour offset
    min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_attribution_conserves_credit(spark, rows):
    """Every conversion distributes exactly 1M ppm minus only the
    middle-share flooring remainder (< n per conversion), and matches
    a pure-Python U-shaped reference exactly."""
    from big_data_hw_23_24_spark.operators.timeseries import (
        attribution_report)

    H = 3_600_000_000
    data = [(i, u, t, (1_700_000_000_000_000 + h * H))
            for i, (u, t, h) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, event_type string, ts long")
    got = {r.channel: (r.n_touches, r.credit_ppm)
           for r in attribution_report(
               df, "purchase", ["click", "view"],
               lookback_hours=24).collect()}
    # pure-Python reference
    want: dict[str, list] = {}
    unatt = 0
    for cid, u, t, cts in data:
        if t != "purchase":
            continue
        touches = sorted((ts, i, ty) for i, uu, ty, ts in data
                         if uu == u and ty in ("click", "view")
                         and cts - 24 * H <= ts < cts)
        n = len(touches)
        if n == 0:
            unatt += 1
            continue
        for r, (_, _, ty) in enumerate(touches, 1):
            c = (1_000_000 if n == 1 else 500_000 if n == 2
                 else 400_000 if r in (1, n) else 200_000 // (n - 2))
            ch = want.setdefault(ty, [0, 0])
            ch[0] += 1
            ch[1] += c
    want_d = {ch: tuple(v) for ch, v in want.items()}
    want_d["(none)"] = (0, unatt * 1_000_000)
    assert got == want_d


# --- E147: block dedup matches a pure-Python reference ----------------------------

@given(texts=st.lists(
    st.text(alphabet="abXY", min_size=0, max_size=40),
    min_size=2, max_size=6))
@settings(**_SETTINGS)
def test_block_dedup_matches_python_reference(spark, texts):
    from big_data_hw_23_24_spark.operators.multimodal import (
        block_dedup_pairs, media_from_documents)

    B, MIN_SHARED, MAX_DF = 4, 2, 3
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {(r.media_a, r.media_b): (r.n_shared_blocks, r.full_dup)
           for r in block_dedup_pairs(media_from_documents(docs),
                                      block_bytes=B, min_shared=MIN_SHARED,
                                      max_df=MAX_DF).collect()}
    # reference: aligned blocks, df-guard, pair counting
    blocks: dict[int, list] = {}
    for i, t in enumerate(texts):
        b = t.encode()
        blocks[i] = [(j, b[j * B:(j + 1) * B]) for j in
                     range((len(b) + B - 1) // B)]
    from collections import Counter
    df_cnt = Counter(bl for bs in blocks.values() for bl in bs)
    want: dict[tuple, int] = {}
    for i in blocks:
        for j in blocks:
            if i < j:
                n = sum(1 for bl in blocks[i]
                        if df_cnt[bl] <= MAX_DF and bl in blocks[j])
                if n >= MIN_SHARED:
                    want[(i, j)] = n
    assert {p: n for p, (n, _) in got.items()} == want
    for (i, j), (_, full) in got.items():
        assert full == (texts[i].encode() == texts[j].encode())


# --- E145: percentile drift invariants on random data ------------------------------

@given(vals=st.lists(st.integers(0, 40), min_size=3, max_size=60))
@settings(**_SETTINGS)
def test_percentile_drift_exact_mode_displacement_is_zero(spark, vals):
    """With accuracy > n the GK sketch is exact rank selection, so the
    displacement is structurally 0 and the compressing sketch stays
    within its deterministic bound — on ANY input, ties included."""
    from big_data_hw_23_24_spark.operators.grouped import percentile_drift

    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "grp string, value double")
    out = percentile_drift(df, "grp", "value").collect()
    assert len(out) == 3
    for r in out:
        assert r.rank_displacement == 0
        assert r.sketch_within_bound
        assert r.n == len(vals)


# --- E153: KMV set-op estimator sanity on disjoint/identical sets -------------------

def test_kmv_setops_extremes(spark):
    """Two identical sets estimate Jaccard exactly 1; two disjoint
    sets (hash-disjoint with overwhelming probability at this size)
    estimate 0 — and est_intersection follows rho exactly."""
    from big_data_hw_23_24_spark.operators.frequent import (
        kmv_set_ops, kmv_sketch)

    rows = ([("a", f"x{i}") for i in range(100)]
            + [("b", f"x{i}") for i in range(100)]       # b == a
            + [("c", f"z{i}") for i in range(100)])      # c disjoint
    df = spark.createDataFrame(rows, "grp string, item string")
    ops = {(r.grp_a, r.grp_b): r
           for r in kmv_set_ops(
               kmv_sketch(df, "item", "grp", k=32)).collect()}
    assert ops[("a", "b")].est_jaccard == 1.0
    assert ops[("a", "b")].n_common == 32
    assert ops[("a", "c")].est_jaccard == 0.0
    assert ops[("a", "c")].est_intersection == 0.0
    assert ops[("b", "c")].est_jaccard == 0.0


# --- E154: incremental view maintenance ---------------------------------------------

@given(old_rows=st.lists(
    st.tuples(st.integers(0, 9),                   # doc id
              st.sampled_from(["s0", "s1", "s2"]),  # group
              st.integers(0, 5)),                  # n words
    min_size=0, max_size=10, unique_by=lambda r: r[0]),
    new_rows=st.lists(
    st.tuples(st.integers(0, 9),
              st.sampled_from(["s0", "s1", "s2"]),
              st.integers(0, 5)),
    min_size=0, max_size=10, unique_by=lambda r: r[0]))
@settings(**_SETTINGS)
def test_incremental_stats_equal_full_recompute(spark, old_rows, new_rows):
    """On ANY pair of snapshots — including docs that change text,
    MOVE groups, appear, or vanish — the delta-maintained stats equal
    a full recompute of the new snapshot exactly."""
    from big_data_hw_23_24_spark.operators.diff import incremental_stats

    def frame(rows):
        data = [(i, g, " ".join(f"w{i}x{j}" for j in range(n)))
                for i, g, n in rows]
        return spark.createDataFrame(
            data or [(None, None, None)],
            "doc_id long, source string, text string"
        ).where(F.col("doc_id").isNotNull())

    old, new = frame(old_rows), frame(new_rows)
    got = {r.source: (r.n_docs, r.n_tokens)
           for r in incremental_stats(old, new, "source").collect()}
    want: dict[str, list] = {}
    for i, g, n in new_rows:
        w = want.setdefault(g, [0, 0])
        w[0] += 1
        w[1] += n
    assert got == {g: tuple(v) for g, v in want.items() if v[0] > 0}


# --- E155: hierarchy rollup matches the recursive definition -----------------------

@given(keys=st.sets(st.integers(0, 9999), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_hierarchy_rollup_matches_python_closure(spark, keys):
    """The unrolled ancestor closure equals a pure-Python recursion on
    random sparse key sets (ancestors need NOT be present as nodes —
    they still accumulate their descendants' values)."""
    from big_data_hw_23_24_spark.operators.graph import hierarchy_rollup

    rows = [(k, (k % 7) + 0.25) for k in sorted(keys)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {r.node: (r.n_desc, r.subtree_cents)
           for r in hierarchy_rollup(df, "k", "v").collect()}
    import math
    want: dict[int, list] = {}
    for k, v in rows:
        c = math.floor(v * 100)
        a = k
        while True:
            w = want.setdefault(a, [0, 0])
            w[0] += 1
            w[1] += c
            if a < 10:
                break
            a //= 10
    assert got == {a: tuple(w) for a, w in want.items()}
