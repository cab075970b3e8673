"""Property-based tests (hypothesis) for operators with INDEPENDENT pure-
Python oracles — randomized structure finds the edge cases hand fixtures
miss (tie timestamps, self-loops, hub keys, empty strata)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1) + timedelta(seconds=s)


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=40
)


@settings(max_examples=12, deadline=None)
@given(edges=edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    from vectrain_spark.operators.canonicalize import connected_components

    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    got = {r["id"]: r["canon"] for r in connected_components(e).collect()}
    # union-find oracle
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for ab in edges for n in ab}
    # canonical label = min member of the component
    comp: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp[r] = min(comp.get(r, n), n)
    want = {n: comp[find(n)] for n in nodes}
    if not edges:
        want = {0: 0}
    assert got == want


asof_cases = st.tuples(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=0, max_size=25),
)


@settings(max_examples=12, deadline=None)
@given(case=asof_cases)
def test_asof_join_matches_python_scan(spark, case):
    from vectrain_spark.operators.events import asof_join

    lrows, rrows = case
    # enforce the unique-(key, ts) right-side precondition
    rmap = {}
    for i, (k, s) in enumerate(rrows):
        rmap[(k, s)] = i
    left = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(lrows)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, _ts(s), v) for (k, s), v in rmap.items()] or [(99, _ts(0), 0)],
        "user_id long, ts timestamp, r_val long",
    )
    got = {
        r["event_id"]: r["r_val"]
        for r in asof_join(left, right, key="user_id", ts="ts").collect()
    }
    rside = list(rmap.items()) if rmap else [((99, 0), 0)]
    want = {}
    for i, (k, s) in enumerate(lrows):
        best = None
        for (rk, rs), v in rside:
            if rk == k and rs <= s and (best is None or rs > best[0]):
                best = (rs, v)
        want[i] = best[1] if best else None
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    r1=st.sampled_from([0.1, 0.3, 0.5]),
)
def test_stratified_sampling_nested_and_exact(spark, ids, r1):
    """Smaller rates are subsets of larger ones, and membership equals the
    pure-Python md5 bucket rule exactly."""
    import hashlib

    from vectrain_spark.operators.corpus import SAMPLE_BUCKETS, stratified_sample

    docs = spark.createDataFrame(
        [(i, "t", "en") for i in ids], "doc_id long, text string, lang string"
    )
    small = {r["doc_id"] for r in stratified_sample(docs, {"en": r1}).collect()}
    big = {r["doc_id"] for r in stratified_sample(docs, {"en": r1 * 2}).collect()}
    assert small <= big
    want = {
        i for i in ids
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % SAMPLE_BUCKETS
        < r1 * SAMPLE_BUCKETS
    }
    assert small == want
