"""Unit tests for round-4h operators: SNM blocking, RDFS entailment,
temporal functional conflicts."""

from __future__ import annotations

import datetime as dt


def test_snm_candidates_hand_computed(spark):
    """Window-3 sweep of six records whose sorted key order is known:
    sorted by (key, id) -> ann(1), anna(2), anne(3), bob(4), bob(6),
    bobby(5); pairs are exactly the rank-distance-1 and -2 neighbors."""
    from vectrain_spark.operators.linking import snm_candidates

    recs = spark.createDataFrame(
        [
            (1, "ann"),
            (2, "anna"),
            (3, "anne"),
            (4, "bob"),
            (5, "bobby"),
            (6, "bob"),
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in snm_candidates(recs, "name", "id", window=3).collect()
    }
    # sorted order: 1,2,3,4,6,5 -> ranks 0..5
    assert got == {
        (1, 2): 1,
        (1, 3): 2,
        (2, 3): 1,
        (2, 4): 2,
        (3, 4): 1,
        (3, 6): 2,
        (4, 6): 1,
        (4, 5): 2,
        (6, 5): 1,
    }


def test_snm_pair_budget_holds_under_total_key_skew(spark):
    """Adversarial blocking-key skew: EVERY record shares one key. A
    naive key-equality block emits n^2/2 pairs; SNM must still emit
    exactly sum_{d=1}^{w-1}(n-d) — the O(n*w) budget is unconditional."""
    from vectrain_spark.operators.linking import snm_candidates

    n, w = 200, 4
    recs = spark.createDataFrame(
        [(i, "same") for i in range(n)], "id long, name string"
    )
    cnt = snm_candidates(recs, "name", "id", window=w).count()
    assert cnt == sum(n - d for d in range(1, w))


def test_ontology_infer_types_diamond(spark):
    """Diamond hierarchy + a multi-typed entity: inferred types are the
    union of every asserted class's ancestor chain, deduplicated."""
    from vectrain_spark.operators.graph import ontology_infer_types

    hier = spark.createDataFrame(
        [
            ("Cat", "Pet"),
            ("Cat", "Feline"),
            ("Pet", "Animal"),
            ("Feline", "Animal"),
            ("Dog", "Pet"),
        ],
        "cls string, super string",
    )
    assertions = spark.createDataFrame(
        [("tom", "Cat"), ("rex", "Dog"), ("tom", "Dog")],
        "entity string, cls string",
    )
    got = {
        (r["entity"], r["type"])
        for r in ontology_infer_types(assertions, hier).collect()
    }
    assert got == {
        ("tom", "Cat"),
        ("tom", "Pet"),
        ("tom", "Feline"),
        ("tom", "Animal"),
        ("tom", "Dog"),
        ("rex", "Dog"),
        ("rex", "Pet"),
        ("rex", "Animal"),
    }


def test_functional_conflicts_hand_computed(spark):
    """Three versions of s1/p: objs A [t1, t3), B [t2, open), C [t4, t5)
    with t3 <= t4 — A/B overlap on [t2, t3), B/C on [t4, t5), A/C are
    disjoint (the gap matters). Open intervals survive as NULL."""
    from vectrain_spark.operators.temporal import functional_conflicts

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    hist = spark.createDataFrame(
        [
            ("s1", "p", "A", t("2024-01-01"), t("2024-03-01"), False),
            ("s1", "p", "B", t("2024-02-01"), None, True),
            ("s1", "p", "C", t("2024-04-01"), t("2024-05-01"), False),
            # different key: never pairs with s1
            ("s2", "p", "A", t("2024-01-01"), None, True),
        ],
        "subj string, pred string, obj string, valid_from timestamp,"
        " valid_to timestamp, is_current boolean",
    )
    rows = {
        (r["subj"], r["obj_a"], r["obj_b"]): (r["overlap_from"], r["overlap_to"])
        for r in functional_conflicts(hist, ["subj", "pred"], "obj").collect()
    }
    assert rows == {
        ("s1", "A", "B"): (t("2024-02-01"), t("2024-03-01")),
        ("s1", "B", "C"): (t("2024-04-01"), t("2024-05-01")),
    }


def test_luby_mis_is_independent_and_maximal(spark):
    """On a path-plus-triangle graph the selected set must be (a) an
    independent set — no edge joins two members — and (b) maximal —
    every non-member is adjacent to a member; 6 rounds decide every
    node of this small graph."""
    from vectrain_spark.operators.graph import luby_mis

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),  # path
        ("x", "y"), ("y", "z"), ("x", "z"),              # triangle
        ("e", "x"),                                       # bridge
    ]
    pairs = spark.createDataFrame(edges, "a string, b string")
    mis = {r["id"] for r in luby_mis(pairs, rounds=6).collect()}
    nodes = {n for e in edges for n in e}
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # independence
    assert not any(b in mis for a in mis for b in adj[a])
    # maximality
    assert all(adj[n] & mis for n in nodes - mis)


def test_luby_mis_deterministic_across_runs(spark):
    """Seeded coins: two runs over the same graph select the identical
    (id, round) schedule."""
    from vectrain_spark.operators.graph import luby_mis

    pairs = spark.createDataFrame(
        [(f"v{i}", f"v{(i * 5 + 2) % 23}") for i in range(40) if i != (i * 5 + 2) % 23],
        "a string, b string",
    )
    one = sorted(map(tuple, luby_mis(pairs, rounds=4).collect()))
    two = sorted(map(tuple, luby_mis(pairs, rounds=4).collect()))
    assert one == two and one
