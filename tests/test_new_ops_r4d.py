"""Unit tests for the round-4d operators: TruthFinder-style fact fusion,
MinHash-sketched neighbor similarity, and anchor-text alias mining."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# fuse_facts
# ---------------------------------------------------------------------------


def _claims(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "subj", "pred", "obj"])
    )


def test_fuse_facts_reweighting_flips_the_winner(spark):
    """The defining behavior: after source-accuracy re-weighting, the
    fused object can DIFFER from the unweighted modal object."""
    from vectrain_spark.operators.fusion import fuse_facts

    rows = []
    # contested slot: o1 (2 bad sources) vs o2 (2 good sources) — round-1
    # votes tie 2-2, so the unweighted winner is 'o1' (lexicographic)
    rows += [
        ("bad1", "s", "pA", "o1"),
        ("bad2", "s", "pA", "o1"),
        ("good1", "s", "pA", "o2"),
        ("good2", "s", "pA", "o2"),
    ]
    # calibration slots: good sources + an anchor agree on 'w', each bad
    # source dissents with 'v' — so good accuracy 3/4, bad accuracy 1/4
    for i in (1, 2, 3):
        rows += [
            ("good1", f"s{i}", "pW", "w"),
            ("good2", f"s{i}", "pW", "w"),
            ("anchor", f"s{i}", "pW", "w"),
            ("bad1", f"s{i}", "pW", "v"),
            ("bad2", f"s{i}", "pW", "v"),
        ]
    out = {
        (r["subj"], r["pred"]): r
        for r in fuse_facts(_claims(spark, rows)).collect()
    }
    contested = out[("s", "pA")]
    # good acc = floor(3/4 * 1e6) = 750000; bad acc = 250000
    assert contested["obj"] == "o2"  # re-weighting flipped the tie-break
    assert contested["weight_micro"] == 2 * 750000
    assert contested["n_sources"] == 2
    assert contested["n_alternatives"] == 2
    for i in (1, 2, 3):
        r = out[(f"s{i}", "pW")]
        assert r["obj"] == "w"
        # w's supporters: good1 (750000), good2 (750000), anchor (1000000)
        assert r["weight_micro"] == 750000 + 750000 + 1000000
        assert r["n_sources"] == 3
        assert r["n_alternatives"] == 2


def test_fuse_facts_duplicate_claims_collapse(spark):
    """A source repeating the same claim counts once (distinct)."""
    from vectrain_spark.operators.fusion import fuse_facts

    rows = [
        ("u", "s", "p", "x"),
        ("u", "s", "p", "x"),
        ("u", "s", "p", "x"),
        ("v", "s", "p", "y"),
    ]
    out = fuse_facts(_claims(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # both sources 100% accurate (each has one claim; winner1='x' by
    # votes tie -> asc... votes: x=1, y=1, winner 'x'): acc(u)=1e6,
    # acc(v)=0 -> weighted winner 'x' with weight 1e6 from u alone
    assert r["obj"] == "x"
    assert r["n_sources"] == 1
    assert r["weight_micro"] == 1000000
    assert r["n_alternatives"] == 2


# ---------------------------------------------------------------------------
# neighbor_minhash
# ---------------------------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))


def _mh(value: str, k: int) -> int:
    """Reference implementation of the engine hash: first 15 hex digits
    of md5(value || '|mh' || k)."""
    return int(hashlib.md5(f"{value}|mh{k}".encode()).hexdigest()[:15], 16)


def test_neighbor_minhash_finds_unconnected_twin(spark):
    """Two nodes with IDENTICAL neighbor sets but NO connecting edge get
    a full-signature match — the pair the exact wedge path cannot see."""
    from vectrain_spark.operators.graph import neighbor_minhash

    rows = [("x", f"n{i}") for i in range(4)] + [
        ("y", f"n{i}") for i in range(4)
    ]
    # a decoy with disjoint neighbors
    rows += [("z", f"m{i}") for i in range(4)]
    out = {
        (r["a"], r["b"]): r
        for r in neighbor_minhash(_pairs(spark, rows)).collect()
    }
    assert ("x", "y") in out
    assert out[("x", "y")]["n_equal"] == 8
    assert out[("x", "y")]["est_jaccard"] == 1.0
    # any emitted candidate shares at least one full band (2 components)
    assert all(r["n_equal"] >= 2 for r in out.values())


def test_neighbor_minhash_signature_matches_reference_hash(spark):
    """The grouped min-aggregate reproduces min_k over md5 reference
    hashes — the determinism contract the DuckDB oracle relies on."""
    from vectrain_spark.operators.graph import neighbor_minhash

    rows = [("x", f"n{i}") for i in range(4)] + [
        ("y", f"n{i}") for i in range(4)
    ]
    out = neighbor_minhash(_pairs(spark, rows)).collect()
    pair = [r for r in out if (r["a"], r["b"]) == ("x", "y")][0]
    # x's neighbor set is {n0..n3} plus nothing else; y identical — so
    # est 1.0 must hold against hand-computed signatures too
    sigs_x = [min(_mh(f"n{i}", k) for i in range(4)) for k in range(8)]
    sigs_y = sigs_x
    assert pair["n_equal"] == sum(a == b for a, b in zip(sigs_x, sigs_y))


# ---------------------------------------------------------------------------
# anchor_aliases
# ---------------------------------------------------------------------------


def _pages(spark, rows):
    df = pd.DataFrame(rows, columns=["url", "html"])
    df["html"] = df["html"].map(lambda s: s.encode())
    df["warc_ts"] = pd.Timestamp("2024-01-01")
    df["lang"] = "en"
    return spark.createDataFrame(df[["url", "warc_ts", "html", "lang"]])


def test_anchor_aliases_counts_commonness_and_rank(spark):
    from vectrain_spark.operators.webcorpus import anchor_aliases

    pages = _pages(
        spark,
        [
            (
                "https://a.example/1",
                '<a href="/x">Acme</a> <a href="/x">Acme</a>'
                ' <a href="https://b.example/y">Acme</a>',
            ),
            ("https://a.example/2", '<a href="/x">Acme</a>'),
        ],
    )
    out = {r["url"]: r for r in anchor_aliases(pages).collect()}
    # relative hrefs absolutize against the SOURCE page's host
    x = out["https://a.example/x"]
    assert x["n_links"] == 3 and x["n_pages"] == 2
    assert x["rank"] == 1 and x["commonness"] == 0.75
    y = out["https://b.example/y"]
    assert y["n_links"] == 1 and y["rank"] == 2 and y["commonness"] == 0.25


def test_anchor_aliases_cap_bounds_candidates(spark):
    from vectrain_spark.operators.webcorpus import anchor_aliases

    html = " ".join(f'<a href="/t{i}">Hub</a>' for i in range(10))
    pages = _pages(spark, [("https://h.example/p", html)])
    out = anchor_aliases(pages, per_anchor_cap=3).collect()
    assert len(out) == 3
    assert sorted(r["rank"] for r in out) == [1, 2, 3]
    # commonness still reflects the UNCAPPED total (each target 1/10)
    assert all(r["commonness"] == 0.1 for r in out)


# ---------------------------------------------------------------------------
# characteristic_sets
# ---------------------------------------------------------------------------


def test_characteristic_sets_groups_by_exact_pred_set(spark):
    from vectrain_spark.operators.rules import characteristic_sets

    rows = [
        # two entities with shape {p, q}, one with {p}, one with {p,q,r}
        ("a", "p", "x", 1),
        ("a", "q", "x", 1),
        ("b", "q", "y", 1),
        ("b", "p", "y", 1),
        ("b", "p", "z", 1),  # extra triple, same shape
        ("c", "p", "x", 1),
        ("d", "p", "x", 1),
        ("d", "q", "x", 1),
        ("d", "r", "x", 1),
        ("d", "r", "x", 1),  # duplicate triple collapses
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "pred", "dst", "cnt"])
    )
    out = {r["cset"]: r for r in characteristic_sets(df).collect()}
    assert set(out) == {"p,q", "p", "p,q,r"}
    pq = out["p,q"]
    assert pq["n_preds"] == 2 and pq["n_entities"] == 2
    assert pq["n_triples"] == 5  # a:2 + b:3
    assert pq["avg_deg"] == 2.5
    assert out["p"]["n_entities"] == 1 and out["p"]["n_triples"] == 1
    assert out["p,q,r"]["n_triples"] == 3  # duplicate (d,r,x) collapsed


# ---------------------------------------------------------------------------
# quantile_sketch
# ---------------------------------------------------------------------------


def test_quantile_sketch_error_bounded_by_bin_width(spark):
    from vectrain_spark.operators.sketch import quantile_sketch

    rows = [("a", float(i)) for i in range(1, 101)]  # 1..100
    rows += [("b", 7.0)] * 5  # degenerate group: all equal
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["lang", "x"]))
    out = {
        (r["grp"], r["q"]): r["est"]
        for r in quantile_sketch(df, "x", "lang").collect()
    }
    width = (100.0 - 1.0) / 64
    # exact p50 of 1..100 is 50/50.5; estimate must land within one bin
    assert abs(out[("a", 0.5)] - 50.5) <= width
    assert abs(out[("a", 0.9)] - 90.0) <= width
    assert abs(out[("a", 0.99)] - 99.0) <= width
    # hi == lo group: every quantile collapses to the single value
    for q in (0.5, 0.9, 0.99):
        assert out[("b", q)] == 7.0


def test_quantile_sketch_is_mergeable(spark):
    """The defining scale property: sketching two halves with the SAME
    bounds and summing bin counts equals sketching the whole — verified
    indirectly by permutation invariance (partition order cannot change
    the estimate, unlike a streaming GK sketch)."""
    from vectrain_spark.operators.sketch import quantile_sketch

    rows = [("a", float((i * 37) % 101)) for i in range(101)]  # shuffled 0..100
    df1 = spark.createDataFrame(pd.DataFrame(rows, columns=["lang", "x"]))
    df2 = spark.createDataFrame(
        pd.DataFrame(list(reversed(rows)), columns=["lang", "x"])
    ).repartition(7)
    a = sorted(quantile_sketch(df1, "x", "lang").collect(), key=lambda r: r["q"])
    b = sorted(quantile_sketch(df2, "x", "lang").collect(), key=lambda r: r["q"])
    assert [(r["q"], r["est"]) for r in a] == [(r["q"], r["est"]) for r in b]


# ---------------------------------------------------------------------------
# hyperball
# ---------------------------------------------------------------------------


def test_hyperball_monotone_and_saturating_on_a_path(spark):
    """On a path graph a-b-c-d the neighborhood function must grow
    monotonically with t and saturate once t reaches the diameter (3)."""
    from vectrain_spark.operators.graph import hyperball

    edges = spark.createDataFrame(
        pd.DataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], columns=["src", "dst"]
        )
    )
    out = {r["t"]: r for r in hyperball(edges, max_t=3).collect()}
    nfs = [out[t]["nf_est"] for t in range(4)]
    assert nfs == sorted(nfs)  # balls only grow
    assert nfs[0] < nfs[3]  # the path is connected, so growth happens
    assert out[3]["frac"] == 1.0
    # t=2 already reaches 3 of 4 nodes from every endpoint and all 4
    # from the middle — strictly more than t=1's immediate neighborhoods
    assert nfs[1] < nfs[2] <= nfs[3]
