"""Unit tests for round-4g operators."""

from __future__ import annotations

import pytest


def _write_docs(spark, tmp_path, rows):
    """Materialize a tiny documents table shaped like the driver's."""
    df = spark.createDataFrame(
        [
            (i, text, "en", "src0", len(text))
            for i, text in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_kn_lm_hand_computed(spark, tmp_path):
    """Interpolated Kneser-Ney on a 2-doc corpus, checked against the
    textbook formula by hand: bigram counts (a,b)=2, (b,a)=1, (a,c)=1,
    D=0.75, T=3 bigram types."""
    from vectrain_spark.driver_queries import q_text_kn_lm

    sf_dir = _write_docs(spark, tmp_path, ["a b a b", "a c"])
    got = {(r["w1"], r["w2"]): r for r in q_text_kn_lm(spark, sf_dir).collect()}

    assert got[("a", "b")]["cnt"] == 2
    # (2-0.75)/3 + (0.75*2/3)*(1/3)
    assert got[("a", "b")]["p_kn"] == pytest.approx(0.583333, abs=1e-6)
    # (1-0.75)/1 + (0.75*1/1)*(1/3)
    assert got[("b", "a")]["p_kn"] == pytest.approx(0.5, abs=1e-6)
    # (1-0.75)/3 + (0.75*2/3)*(1/3)
    assert got[("a", "c")]["p_kn"] == pytest.approx(0.25, abs=1e-6)
    assert len(got) == 3


def test_resolve_redirects_doubling_and_cycle(spark):
    """A depth-3 chain resolves with exact hop counts in log rounds; a
    2-cycle comes back resolved=False instead of hanging."""
    from vectrain_spark.operators.webcorpus import resolve_redirects

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),  # chain a->b->c->d
        ("q", "d"),                          # direct hit on the terminal
        ("x", "y"), ("y", "x"),              # redirect cycle
    ]
    redirects = spark.createDataFrame(edges, "src string, dst string")
    got = {r["src"]: r for r in resolve_redirects(redirects, max_rounds=4).collect()}

    assert (got["a"]["final_url"], got["a"]["hops"]) == ("d", 3)
    assert (got["b"]["final_url"], got["b"]["hops"]) == ("d", 2)
    assert (got["c"]["final_url"], got["c"]["hops"]) == ("d", 1)
    assert (got["q"]["final_url"], got["q"]["hops"]) == ("d", 1)
    assert all(got[s]["resolved"] for s in "abcq")
    # the cycle never terminates a follow: flagged, not looped
    assert not got["x"]["resolved"] and not got["y"]["resolved"]
    assert len(got) == 6


def test_simrank_textbook_graph(spark):
    """Jeh & Widom's canonical example: Univ -> {ProfA, ProfB} ->
    {StudA, StudB}. Profs share an in-neighbor (round 1); students
    become similar ONLY via the recursion (round 2 propagates the
    profs' similarity one hop down) — the property that separates
    SimRank from one-shot co-citation."""
    from vectrain_spark.operators.graph import simrank

    edges = [("u", "pa"), ("u", "pb"), ("pa", "sa"), ("pb", "sb")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["a"], r["b"]): r["s"] for r in simrank(e).collect()}

    # s(pa,pb) = C * |common| / (1*1) = 0.8, stable across rounds
    assert got[("pa", "pb")] == pytest.approx(0.8, abs=1e-6)
    # s(sa,sb) = C * s(pa,pb) = 0.64 — zero under plain co-citation
    assert got[("sa", "sb")] == pytest.approx(0.64, abs=1e-6)
    assert len(got) == 2


def test_ccnet_buckets_tercile_sizes(spark):
    """Bucket sizes follow the ntile contract (larger thirds first) and
    better-scoring docs land in better buckets."""
    from vectrain_spark.operators.textstats import ccnet_buckets

    # 10 docs: doc k repeats a common bigram k times, so coverage rises
    # with k (docs 0/1 too short for any bigram are excluded upstream)
    docs = spark.createDataFrame(
        [(k, "x y " * k, "en") for k in range(10)],
        "doc_id long, text string, lang string",
    )
    got = ccnet_buckets(docs).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # doc 0 is empty-ish ("" after trim -> 1 token), doc 1 has 2 tokens
    # (1 bigram); scored docs = 9 -> 3/3/3
    assert {b: len(v) for b, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3
    }
    # every head score >= every middle score >= every tail score
    lo_head = min(r["avg_p"] for r in by_bucket["head"])
    hi_mid = max(r["avg_p"] for r in by_bucket["middle"])
    lo_mid = min(r["avg_p"] for r in by_bucket["middle"])
    hi_tail = max(r["avg_p"] for r in by_bucket["tail"])
    assert lo_head >= hi_mid >= lo_mid >= hi_tail


def test_scc_one_way_bridge_keeps_cycles_apart(spark):
    """Two 3-cycles joined by a ONE-WAY bridge: weakly connected (one
    WCC) but two separate SCCs — plus a DAG tail that stays singleton."""
    from vectrain_spark.operators.graph import strongly_connected_components

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # cycle 1
        ("c", "p"),                            # one-way bridge
        ("p", "q"), ("q", "r"), ("r", "p"),   # cycle 2
        ("r", "z"),                            # DAG tail
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r for r in strongly_connected_components(e).collect()}

    assert {got[n]["scc_id"] for n in "abc"} == {"a"}
    assert {got[n]["scc_id"] for n in "pqr"} == {"p"}
    assert got["z"]["scc_id"] == "z" and got["z"]["scc_size"] == 1
    assert got["a"]["scc_size"] == 3 and got["p"]["scc_size"] == 3
    assert len(got) == 7


def test_kmeans_parallel_seed_invariants(spark):
    """k-means|| on a two-cluster line: the seed is the minimum vec_id,
    every attraction weight is accounted for (weights partition the
    corpus), and the far cluster gets sampled (cost-proportional
    admission has to reach it — that is the algorithm's whole point)."""
    from vectrain_spark.operators.similarity import kmeans_parallel_seed

    rows = [(i, [float(i % 4), 0.0]) for i in range(8)]
    rows += [(100 + i, [1000.0 + i % 4, 0.0]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kmeans_parallel_seed(emb, l=4, rounds=2).collect()

    by_id = {r["vec_id"]: r for r in got}
    assert by_id[0]["round_added"] == 0          # min vec_id seeds
    assert sum(r["weight"] for r in got) == 16   # weights partition corpus
    assert all(r["round_added"] in (0, 1, 2) for r in got)
    # the 1000-away cluster dominates the cost, so sampling must hit it
    assert any(r["vec_id"] >= 100 for r in got)


def test_skyline_dominance_and_ties(spark):
    """Hand-checkable 2-D skyline (min price, max size): dominated rows
    drop, incomparable rows stay, exact duplicates BOTH stay (neither
    strictly beats the other)."""
    from vectrain_spark.operators.pareto import skyline_2d

    rows = [
        (1, 1.0, 10),   # skyline (cheapest)
        (2, 2.0, 20),   # skyline (bigger, pricier — incomparable with 1)
        (3, 3.0, 15),   # dominated by 2 (pricier AND smaller)
        (4, 2.0, 20),   # duplicate of 2 -> both stay
        (5, 2.0, 5),    # dominated by 2 (same price, smaller)
        (6, 5.0, 25),   # skyline (biggest)
        (7, 1.0, 9),    # dominated by 1 (same price, smaller)
    ]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    got = sorted(r["id"] for r in skyline_2d(df, "price", "size").collect())
    assert got == [1, 2, 4, 6]


def test_bowtie_classes_textbook_shape(spark):
    """A literal bow-tie: in-tail -> 2-cycle core -> out-tail, plus a
    disconnected island."""
    from vectrain_spark.operators.graph import bowtie_classes

    edges = [
        ("i2", "i1"), ("i1", "a"),            # IN chain
        ("a", "b"), ("b", "a"),               # 2-cycle core
        ("b", "o1"), ("o1", "o2"),            # OUT chain
        ("z1", "z2"),                          # disconnected island
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["cls"] for r in bowtie_classes(e).collect()}

    assert got["a"] == "core" and got["b"] == "core"
    assert got["i1"] == "in" and got["i2"] == "in"
    assert got["o1"] == "out" and got["o2"] == "out"
    assert got["z1"] == "other" and got["z2"] == "other"


def test_word_entropy_hand_computed(spark):
    """Entropy of hand-built distributions: uniform over 4 words = 2
    bits; constant word = 0 bits; 'a a b' = H(2/3, 1/3)."""
    import math

    from vectrain_spark.operators.textstats import word_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en"),
            (2, "x x x x x", "en"),
            (3, "a a b", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r for r in word_entropy(docs).collect()}

    assert got[1]["entropy"] == pytest.approx(2.0, abs=1e-6)
    assert got[1]["ttr"] == 1.0 and got[1]["n_types"] == 4
    assert got[2]["entropy"] == 0.0 and got[2]["n_tokens"] == 5
    h3 = math.log2(3) - (2 * math.log2(2)) / 3
    assert got[3]["entropy"] == pytest.approx(h3, abs=1e-6)


def test_image_ahash_near_dup_banding(spark):
    """An image, a 3-byte-perturbed copy, an exact copy, and a corrupt
    blob: the exact copy hashes identically (dist 0), the perturbed one
    stays within a small Hamming distance and is FOUND by the banded
    join, and the corrupt blob quarantines with a NULL hash."""
    from vectrain_spark.operators.multimodal import (
        ahash_dup_pairs,
        encode_bmp,
        image_ahash,
    )

    base = encode_bmp(7, 16, 16)
    tweaked = bytearray(base)
    for off in (54 + 10, 54 + 200, 54 + 500):
        tweaked[off] = (tweaked[off] + 9) % 256
    media = spark.createDataFrame(
        [
            (1, base),
            (2, bytes(tweaked)),
            (4, base),
            (9, b"\x00not an image"),
        ],
        "media_id long, content binary",
    )
    hashes = image_ahash(media)
    rows = {r["media_id"]: r for r in hashes.collect()}
    assert rows[9]["error"] is not None and rows[9]["hash_hi"] is None
    assert (rows[1]["hash_hi"], rows[1]["hash_lo"]) == (
        rows[4]["hash_hi"],
        rows[4]["hash_lo"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in ahash_dup_pairs(hashes, max_dist=6).collect()
    }
    assert pairs[(1, 4)] == 0            # exact copy: distance 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6  # perturbed copy found


def test_events_sax_hand_series(spark, tmp_path):
    """8 days, one per PAA window, counts [1x7, 9]: mean 2, population
    std sqrt(7) -> the spike window z-scores to +2.6458 ('d'), the flat
    days to -0.378 ('b')."""
    import datetime

    from vectrain_spark.driver_queries import q_events_sax

    rows = []
    eid = 0
    for day in range(1, 9):
        for _ in range(9 if day == 8 else 1):
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 12), 1, "view", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {r["w"]: r for r in q_events_sax(spark, str(tmp_path)).collect()}

    assert len(got) == 8 and all(got[w]["n_days"] == 1 for w in got)
    assert got[7]["symbol"] == "d"
    assert got[7]["z"] == pytest.approx(7 / 7**0.5, abs=1e-6)
    for w in range(7):
        assert got[w]["symbol"] == "b"
        assert got[w]["z"] == pytest.approx(-1 / 7**0.5, abs=1e-6)


def test_betweenness_brandes_hand_cases(spark):
    """Brandes from one seed on a path and on a diamond: the path gives
    delta(b)=2, delta(c)=1, delta(d)=0; the diamond splits the two
    shortest paths, giving each middle node 0.5."""
    from vectrain_spark.operators.graph import betweenness_sampled

    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "seed string")
    got = {
        r["v"]: r["betweenness"]
        for r in betweenness_sampled(path, seeds).collect()
    }
    assert got == {"b": 2.0, "c": 1.0, "d": 0.0}

    diamond = spark.createDataFrame(
        [("s", "x"), ("s", "y"), ("x", "t"), ("y", "t")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",)], "seed string")
    got = {
        r["v"]: r["betweenness"]
        for r in betweenness_sampled(diamond, seeds).collect()
    }
    assert got == {"x": 0.5, "y": 0.5, "t": 0.0}


def test_quotient_graph_star_plus_triangle(spark):
    """A 4-leaf star and a triangle: three role classes (hub, leaf,
    triangle corner), one hub-leaf super-edge carrying 4 original
    edges, one within-class triangle super-edge carrying 3."""
    from vectrain_spark.operators.graph import quotient_graph

    pairs = spark.createDataFrame(
        [("hub", "l1"), ("hub", "l2"), ("hub", "l3"), ("hub", "l4"),
         ("t1", "t2"), ("t1", "t3"), ("t2", "t3")],
        "a string, b string",
    )
    rows = quotient_graph(pairs).collect()
    by_edges = {r["n_edges"]: r for r in rows}
    assert len(rows) == 2
    star = by_edges[4]
    assert {star["n_nodes_a"], star["n_nodes_b"]} == {1, 4}  # hub vs leaves
    tri = by_edges[3]
    assert tri["class_a"] == tri["class_b"]  # within-class super-loop
    assert tri["n_nodes_a"] == 3


def test_betweenness_small_graph_dispatch_matches_scale_path(spark):
    """The round-6 cost-based dispatch (driver-side layered Brandes at or
    under SCC_SMALL_GRAPH_EDGES deduped edges) must match the batched
    dataflow: identical node sets, and values equal up to one ulp of the
    6-dp per-layer rounding (summation order at an exact .xxxxxx5
    boundary is the one freedom BOTH engines already tolerate — the
    driver gate fixture is sigma=1/integer-delta, where the paths are
    bit-identical; the unique-shortest-path fixture below asserts exact
    equality)."""
    import random

    from vectrain_spark.operators.graph import betweenness_sampled

    # branching random digraphs: values may sit on rounding boundaries
    for seed_n, n, m in [(3, 16, 40), (5, 22, 55)]:
        rng = random.Random(seed_n)
        nodes = [f"v{i:02d}" for i in range(n)]
        edge_list = sorted({(rng.choice(nodes), rng.choice(nodes)) for _ in range(m)})
        e = spark.createDataFrame(edge_list, "src string, dst string")
        seeds = spark.createDataFrame([(nodes[0],), (nodes[1],), (nodes[2],)], "seed string")
        local = {
            r["v"]: r["betweenness"]
            for r in betweenness_sampled(e, seeds).collect()
        }
        dist = {
            r["v"]: r["betweenness"]
            for r in betweenness_sampled(e, seeds, small_graph_max_edges=0).collect()
        }
        assert local.keys() == dist.keys(), (seed_n, local, dist)
        for v in local:
            assert abs(local[v] - dist[v]) <= 1.1e-6, (seed_n, v, local[v], dist[v])

    # unique-shortest-path fixture (the gate's regime: sigma = 1
    # everywhere, integer deltas): both paths must agree EXACTLY
    ring = [(f"r{i}", f"r{(i + 1) % 6}") for i in range(6)]
    ring += [("r0", "s0"), ("s0", "s1"), ("s1", "s2")]
    e = spark.createDataFrame(ring, "src string, dst string")
    seeds = spark.createDataFrame([("r0",), ("r1",)], "seed string")
    local = {
        r["v"]: r["betweenness"] for r in betweenness_sampled(e, seeds).collect()
    }
    dist = {
        r["v"]: r["betweenness"]
        for r in betweenness_sampled(e, seeds, small_graph_max_edges=0).collect()
    }
    assert local == dist, (local, dist)
