"""Unit tests for round-4i operators: CUSUM change points, Datafly
k-anonymity."""

from __future__ import annotations

import datetime as dt


def test_cusum_finds_a_step_change(spark):
    """Daily counts 1,1,1,5,5 (step up on day 4): n=5, S=13, scaled
    deviations n*x-S = -8,-8,-8,12,12 -> C = -8,-16,-24,-12,0; peak
    |C|=24 lands on day 3, the last pre-shift day."""
    from vectrain_spark.operators.events import cusum_changepoints

    rows = []
    counts = {1: 1, 2: 1, 3: 1, 4: 5, 5: 5}
    eid = 0
    for day, c in counts.items():
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, day, 12, 0), "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = cusum_changepoints(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_days"], r["total_events"]) == (5, 13)
    assert r["cp_day"] == "2024-01-03"
    assert r["cusum_peak"] == 24


def test_cusum_tie_breaks_to_earliest_day(spark):
    """Counts 3,1,3 (n=3, S=7): scaled devs 2,-4,2 -> C = 2,-2,0;
    |C| ties at 2 on days 1 and 2 -> earliest day wins."""
    from vectrain_spark.operators.events import cusum_changepoints

    rows = []
    eid = 0
    for day, c in {1: 3, 2: 1, 3: 3}.items():
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 2, day), "view"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    r = cusum_changepoints(ev).collect()[0]
    assert r["cp_day"] == "2024-02-01"
    assert r["cusum_peak"] == 2


def test_datafly_ladder_levels_and_suppression(spark):
    """k=2 ladder: six 'en' docs share (src, bucket10) in pairs ->
    level 0; a lone (src, size) 'en' doc generalizes to level 1 via a
    shared bucket20, or level 2 via the language class; a singleton
    language is suppressed (level 3, class 0)."""
    from vectrain_spark.operators.privacy import datafly_k_anon

    docs = spark.createDataFrame(
        [
            # level-0 pair: same (lang, source, b10=3)
            (1, "en", "a", 35),
            (2, "en", "a", 37),
            # b10 differs (2 vs 3) and source unique -> level 1 via
            # b20=1 shared with the pair above
            (3, "en", "b", 25),
            # b20=3 unshared -> only the language class (n=4) -> level 2
            (4, "en", "c", 70),
            # singleton language -> suppressed
            (5, "zz", "a", 15),
        ],
        "doc_id long, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["anon_level"], r["class_n"])
        for r in datafly_k_anon(docs, k=2).collect()
    }
    assert got[1] == (0, 2)
    assert got[2] == (0, 2)
    assert got[3] == (1, 3)  # b20=1 holds docs 1,2,3
    assert got[4] == (2, 4)
    assert got[5] == (3, 0)


def test_datafly_all_released_at_finest_when_classes_big(spark):
    """Uniform corpus: every row satisfies k at level 0."""
    from vectrain_spark.operators.privacy import datafly_k_anon

    docs = spark.createDataFrame(
        [(i, "en", "s", 12) for i in range(10)],
        "doc_id long, lang string, source string, n_chars long",
    )
    out = datafly_k_anon(docs, k=5).collect()
    assert all(r["anon_level"] == 0 and r["class_n"] == 10 for r in out)


def test_sq_encode_endpoints_and_flat_dims(spark):
    """1-D corpus {0, 0.5, 1}: codes 0, 127, 255; a constant dim
    (mx == mn) encodes 0 everywhere."""
    from vectrain_spark.operators.similarity import sq_encode

    vecs = spark.createDataFrame(
        [(0, [0.0, 7.0]), (1, [0.5, 7.0]), (2, [1.0, 7.0])],
        "vec_id long, emb array<double>",
    )
    got = {r["vec_id"]: r["codes"] for r in sq_encode(vecs).collect()}
    assert got == {0: [0, 0], 1: [127, 0], 2: [255, 0]}


def test_sq_topk_ranks_by_integer_code_distance(spark):
    """Two tight clusters far apart: each query's nearest neighbors in
    code space are its own cluster, exact integer d2."""
    from vectrain_spark.operators.similarity import sq_topk

    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(3)]
    rows += [(i + 3, [10.0 + i * 0.01, 10.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    got = sq_topk(emb, n_queries=1, k=2).collect()
    assert [r["n_id"] for r in got] == [1, 2]
    assert all(r["d2"] < 100 for r in got)


def test_nb_langid_separable_corpus_diagonal_confusion(spark):
    """Two languages with disjoint trigram inventories: every held-out
    doc (doc_id % 5 == 0) lands on the diagonal."""
    from vectrain_spark.operators.textstats import nb_langid_confusion

    rows = []
    for i in range(10):
        rows.append((2 * i, "aa", "aaaa aaa aaaa aaa"))
        rows.append((2 * i + 1, "bb", "bbbb bbb bbbb bbb"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in nb_langid_confusion(docs).collect()
    }
    assert set(got) == {("aa", "aa"), ("bb", "bb")}
    assert sum(got.values()) == 4  # doc_ids 0,5,10,15 are held out


def test_nb_langid_oov_doc_tie_breaks_to_first_lang(spark):
    """A held-out doc whose trigrams never occur in training scores
    t_d * lp0 for every language; with balanced training mass the
    scores tie and the lexicographically first language wins."""
    from vectrain_spark.operators.textstats import nb_langid_confusion

    rows = [
        (1, "aa", "aaaa aaaa"),
        (2, "bb", "bbbb bbbb"),
        (3, "aa", "aaaa aaaa"),
        (4, "bb", "bbbb bbbb"),
        (5, "bb", "zzzz zzzz"),  # held out, fully OOV
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in nb_langid_confusion(docs).collect()
    }
    assert got == {("bb", "aa"): 1}


def _kruskal(nodes, edges):
    """Reference MST: Kruskal under the same (w, a, b) total order."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return set(out)


def test_boruvka_matches_kruskal_on_known_graph(spark):
    """Square + diagonal: MST is the three cheapest edges."""
    from vectrain_spark.operators.graph import boruvka_msf

    edges = [
        ("a", "b", 1),
        ("b", "c", 2),
        ("c", "d", 3),
        ("a", "d", 4),
        ("a", "c", 5),
    ]
    df = spark.createDataFrame(edges, "a string, b string, w long")
    got = {(r["a"], r["b"], r["w"]) for r in boruvka_msf(df).collect()}
    assert got == {("a", "b", 1), ("b", "c", 2), ("c", "d", 3)}


def test_boruvka_matches_kruskal_on_random_graph(spark):
    """27-node deterministic pseudo-random graph: Boruvka's forest ==
    Kruskal's under the identical tie order, edge for edge."""
    from vectrain_spark.operators.graph import boruvka_msf

    nodes = [f"v{i:02d}" for i in range(27)]
    edges = []
    for i in range(27):
        for j in range(i + 1, 27):
            if (i * 31 + j * 17) % 5 == 0:
                edges.append((nodes[i], nodes[j], (i * 13 + j * 7) % 40))
    df = spark.createDataFrame(edges, "a string, b string, w long")
    got = {(r["a"], r["b"], r["w"]) for r in boruvka_msf(df, rounds=5).collect()}
    assert got == _kruskal(nodes, edges)


def test_boruvka_equal_weights_deterministic_tie_break(spark):
    """Triangle of weight-1 edges: the (w, a, b) order always keeps
    (a,b) and (a,c)."""
    from vectrain_spark.operators.graph import boruvka_msf

    df = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("a", "c", 1)],
        "a string, b string, w long",
    )
    got = {(r["a"], r["b"]) for r in boruvka_msf(df).collect()}
    assert got == {("a", "b"), ("a", "c")}


def test_rpq_min_mid_hops_on_hand_graph(spark):
    """s: a->b; m: b->c, c->d, d->b (cycle); e: b->x, d->y.
    a reaches b at h=0 -> x; d at h=2 -> y; the b-revisit at h=3 must
    NOT overwrite the h=0 minimum."""
    from vectrain_spark.operators.graph import rpq_bounded

    edges = spark.createDataFrame(
        [
            ("a", "b", "s"),
            ("b", "c", "m"),
            ("c", "d", "m"),
            ("d", "b", "m"),
            ("b", "x", "e"),
            ("d", "y", "e"),
        ],
        "src string, dst string, pred string",
    )
    got = {
        (r["src"], r["dst"]): r["min_mid_hops"]
        for r in rpq_bounded(edges, "s", "m", "e").collect()
    }
    assert got == {("a", "x"): 0, ("a", "y"): 2}


def test_rpq_zero_mid_hops_only(spark):
    """No m edges at all: the Kleene segment contributes only the
    empty path, so results are exactly s-then-e concatenations."""
    from vectrain_spark.operators.graph import rpq_bounded

    edges = spark.createDataFrame(
        [("a", "b", "s"), ("b", "z", "e"), ("q", "w", "e")],
        "src string, dst string, pred string",
    )
    got = [
        (r["src"], r["dst"], r["min_mid_hops"])
        for r in rpq_bounded(edges, "s", "m", "e").collect()
    ]
    assert got == [("a", "z", 0)]


def test_ams_exact_join_size_and_register_sums(spark):
    """Stream A = {x, x, y}, B = {x, z}: exact join size = 2 (the two
    x's of A match the one x of B); every register is |c| <= stream
    length and c parity == stream-length parity (sum of ±1's)."""
    from vectrain_spark.operators.sketch import ams_join_size

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "k string")
    b = spark.createDataFrame([("x",), ("z",)], "k string")
    rows = ams_join_size(a, "k", b, "k", counters=4).collect()
    assert len(rows) == 4
    assert all(r["exact_join"] == 2 for r in rows)
    for r in rows:
        assert abs(r["c_a"]) <= 3 and r["c_a"] % 2 != 0  # 3 signs
        assert abs(r["c_b"]) <= 2 and r["c_b"] % 2 == 0  # 2 signs
        assert r["est"] == r["c_a"] * r["c_b"]
    meds = {r["median_est"] for r in rows}
    assert len(meds) == 1
    ests = sorted(r["est"] for r in rows)
    assert meds.pop() == ests[2]  # upper median of 4


def test_ams_f2_unbiased_on_uniform_stream(spark):
    """Self-join of 64 distinct keys: F2 = 64; the mean of the
    squared registers should land near 64 (tug-of-war unbiasedness —
    loose band, deterministic hashes so the assertion is stable)."""
    from vectrain_spark.operators.sketch import ams_join_size

    a = spark.createDataFrame([(f"k{i}",) for i in range(64)], "k string")
    rows = ams_join_size(a, "k", a, "k", counters=8).collect()
    assert all(r["exact_join"] == 64 for r in rows)
    mean_est = sum(r["est"] for r in rows) / len(rows)
    assert 16 <= mean_est <= 256


def test_unimax_waterfill_caps_small_langs_and_splits_rest(spark):
    """Corpora 10/20/1000 chars, budget 50% (=515), cap 2 epochs:
    'aa' capped at 20, 'bb' capped at 40, 'cc' takes the remaining
    455 (under its 2000 cap) -> uncapped, epochs 0.455."""
    from vectrain_spark.operators.corpus import unimax_allocation

    docs = spark.createDataFrame(
        [(1, "aa", 10), (2, "bb", 20), (3, "cc", 1000)],
        "doc_id long, lang string, n_chars long",
    )
    got = {r["lang"]: r for r in unimax_allocation(docs).collect()}
    assert got["aa"]["allocated"] == 20 and got["aa"]["capped"]
    assert got["bb"]["allocated"] == 40 and got["bb"]["capped"]
    assert got["cc"]["allocated"] == 455 and not got["cc"]["capped"]
    assert got["cc"]["epochs_used_ppm"] == 455000
    # no language exceeds its epoch cap
    for r in got.values():
        assert r["epochs_used_ppm"] <= 2_000_000


def test_unimax_equal_langs_split_evenly(spark):
    """Four equal languages: nobody hits the 2-epoch cap at a 50%
    budget; each gets exactly budget/4 (= half an epoch)."""
    from vectrain_spark.operators.corpus import unimax_allocation

    docs = spark.createDataFrame(
        [(i, f"l{i}", 100) for i in range(4)],
        "doc_id long, lang string, n_chars long",
    )
    got = unimax_allocation(docs).collect()
    assert all(not r["capped"] and r["allocated"] == 50 for r in got)
    assert all(r["epochs_used_ppm"] == 500000 for r in got)


def test_cusum_detects_total_stop_via_densified_days(spark):
    """100 events/day on days 1-3, silence on days 4-6 (another type
    keeps the global calendar open): with zero-filled days the series
    is 100,100,100,0,0,0 -> n=6, S=300, devs 300,300,300,-300,-300,-300
    -> C peaks at |900| on day 3, the last pre-cliff day."""
    import datetime as dt

    from vectrain_spark.operators.events import cusum_changepoints

    rows = []
    eid = 0
    for day in (1, 2, 3):
        for _ in range(100):
            rows.append((eid, dt.datetime(2024, 3, day), "click"))
            eid += 1
    for day in range(1, 7):  # keeps min..max span at 6 days
        rows.append((eid, dt.datetime(2024, 3, day), "view"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = {r["event_type"]: r for r in cusum_changepoints(ev).collect()}
    click = got["click"]
    assert click["n_days"] == 6
    assert click["total_events"] == 300
    assert click["cp_day"] == "2024-03-03"
    assert click["cusum_peak"] == 900


def test_pseudo_diameter_on_path_graph(spark):
    """Path a-b-c-d-e: sweep from 'a' reaches 'e' at ecc 4; re-sweep
    from 'e' finds 'a' at distance 4 = the exact diameter."""
    from vectrain_spark.operators.graph import pseudo_diameter

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    r = pseudo_diameter(edges).collect()[0]
    assert r["seed_node"] == "a"
    assert r["far_node"] == "e"
    assert r["ecc1"] == 4.0
    assert r["far2_node"] == "a"
    assert r["diameter_lb"] == 4.0


def test_pseudo_diameter_second_sweep_improves_bound(spark):
    """Seed 'a' sits mid-structure (ecc 2); the re-sweep from its
    farthest node 'd' spans the true diameter 4 (path d-c-a-b-e) —
    the double sweep doubles the first sweep's bound here."""
    from vectrain_spark.operators.graph import pseudo_diameter

    # a-b, a-c, c-d, b-e: from 'a' both d and e are at 2 (tie -> 'd');
    # from 'd': c=1, a=2, b=3, e=4 -> diameter_lb 4, exact here
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("c", "d"), ("b", "e")],
        "src string, dst string",
    )
    r = pseudo_diameter(edges).collect()[0]
    assert r["ecc1"] == 2.0  # from 'a': d and e both at 2
    assert r["far_node"] == "d"  # tie (d, e) -> min id
    assert r["diameter_lb"] == 4.0  # d..e path length
    assert r["far2_node"] == "e"


def test_bm25_hand_computed_single_term(spark):
    """Three docs, query {'cat'}: N=3, df=2 -> idf_micro =
    floor(ln((3-2+.5)/(2+.5)+1)*1e6) = floor(ln(1.6)*1e6) = 470003.
    S=6 tokens, doc 1 (dl=2, tf=1): 470003*22*1*6 // (10*6*1+3*6+9*2*3)
    = 62040396 // 132 = 470003*132... check: denominator
    10*6+18+54 = 132, numerator 470003*132 = 62040396 -> score 470003.
    doc 2 (dl=3, tf=2): num 470003*22*2*6 = 124080792,
    den 10*6*2+18+9*3*3 = 219 -> 566578."""
    from vectrain_spark.operators.index import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "cat dog"),
            (2, "cat cat mouse"),
            (3, "bird"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bm25_topk(docs, ("cat",), k=5).collect()}
    assert set(got) == {1, 2}
    assert got[1]["score_micro"] == 470003
    assert got[2]["score_micro"] == 124080792 // 219
    assert got[2]["rank"] == 1  # higher tf, shorter-normalized


def test_bm25_multi_term_sums_and_ranks(spark):
    """Docs hitting both query terms outrank single-hit docs of equal
    length; ties break to the smaller doc_id."""
    from vectrain_spark.operators.index import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark table"),
            (2, "spark spark"),
            (3, "table мир"),
            (4, "nothing here"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ("spark", "table"), k=4).collect()
    by_rank = [r["doc_id"] for r in rows]
    assert by_rank[0] == 1  # two hits beats one
    assert 4 not in by_rank
    assert all(r["n_hits"] >= 1 for r in rows)


def test_single_linkage_equals_direct_components(spark):
    """MSF-route clusters == direct sub-threshold CC on a graph where
    the threshold severs the only bridge: {a,b,c} chained cheap, bridge
    c-d expensive, {d,e} cheap."""
    from vectrain_spark.operators.canonicalize import connected_components
    from vectrain_spark.operators.graph import single_linkage_clusters

    edges = [
        ("a", "b", 1),
        ("b", "c", 2),
        ("c", "d", 9),  # above threshold: severed
        ("d", "e", 3),
        ("a", "c", 8),  # redundant heavy edge the MSF drops anyway
    ]
    df = spark.createDataFrame(edges, "a string, b string, w long")
    got = {
        r["id"]: r["cluster"]
        for r in single_linkage_clusters(df, threshold=5).collect()
    }
    direct = spark.createDataFrame(
        [(a, b) for a, b, w in edges if w <= 5], "src string, dst string"
    )
    want = {
        r["id"]: r["canon"] for r in connected_components(direct).collect()
    }
    want.setdefault("a", "a")
    assert got == want
    assert got["a"] == got["b"] == got["c"]
    assert got["d"] == got["e"]
    assert got["a"] != got["d"]


def test_single_linkage_isolated_nodes_self_cluster(spark):
    """Every edge above threshold: every node is its own cluster."""
    from vectrain_spark.operators.graph import single_linkage_clusters

    df = spark.createDataFrame(
        [("x", "y", 99), ("y", "z", 99)], "a string, b string, w long"
    )
    got = {
        r["id"]: r["cluster"]
        for r in single_linkage_clusters(df, threshold=5).collect()
    }
    assert got == {"x": "x", "y": "y", "z": "z"}


def test_attribution_removal_effect_hand_computed(spark):
    """Two-channel funnel: u1 view->click->purchase, u2 view->null.
    Matrix: start->view 1.0; view->click .5, view->null .5;
    click->conv 1.0. Full p_conv = .5. Removing 'view' kills the only
    path (start->view redirects to null): p=0, effect 1. Removing
    'click': view->click redirects to null: p=0, effect 1."""
    import datetime as dt

    from vectrain_spark.operators.events import attribution_removal_effect

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 1, "view"),
        (2, dt.datetime(2024, 1, 1, 1), 1, "click"),
        (3, dt.datetime(2024, 1, 1, 2), 1, "purchase"),
        (4, dt.datetime(2024, 1, 1, 0), 2, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["channel"]: r for r in attribution_removal_effect(ev).collect()
    }
    assert set(got) == {"view", "click"}
    for ch in ("view", "click"):
        assert got[ch]["p_conv_full"] == 0.5
        assert got[ch]["p_conv_removed"] == 0.0
        assert got[ch]["removal_effect"] == 1.0


def test_attribution_partial_removal_effect(spark):
    """Two disjoint converting paths (view->purchase, click->purchase)
    with equal traffic: removing either channel halves p_conv ->
    removal effect 0.5 each."""
    import datetime as dt

    from vectrain_spark.operators.events import attribution_removal_effect

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 1, "view"),
        (2, dt.datetime(2024, 1, 1, 1), 1, "purchase"),
        (3, dt.datetime(2024, 1, 1, 0), 2, "click"),
        (4, dt.datetime(2024, 1, 1, 1), 2, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["channel"]: r for r in attribution_removal_effect(ev).collect()
    }
    assert got["view"]["p_conv_full"] == 1.0
    assert got["view"]["removal_effect"] == 0.5
    assert got["click"]["removal_effect"] == 0.5


def test_fellegi_sunter_separates_matches_from_nonmatches(spark):
    """Pairs where matches agree on every field and non-matches on
    none: m=(3+1)/(3+2)=.8, u=(0+1)/(3+2)=.2 per field -> agreement
    weight log2(4)=2.0 (2_000_000 micro), disagreement log2(.2/.8)=-2
    -> match score 6e6, non-match -6e6."""
    import math

    from vectrain_spark.operators.linking import fellegi_sunter_scores

    pairs = spark.createDataFrame(
        [
            (1, 2, "abcx", "abcx", True),
            (3, 4, "defy", "defy", True),
            (5, 6, "ghiz", "ghiz", True),
            (7, 8, "abcx", "zz", False),
            (9, 10, "defy", "qqqqq", False),
            (11, 12, "ghiz", "pp", False),
        ],
        "id_a long, id_b long, key_a string, key_b string, is_match boolean",
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in fellegi_sunter_scores(pairs).collect()
    }
    m, u = (3 + 1.0) / (3 + 2.0), (0 + 1.0) / (3 + 2.0)
    wa = math.floor(math.log2(m / u) * 1e6)
    wd = math.floor(math.log2((1.0 - m) / (1.0 - u)) * 1e6)
    for k, r in got.items():
        if r["is_match"]:
            assert r["score_micro"] == 3 * wa == 6_000_000
            assert r["a_prefix3"] and r["a_length"] and r["a_lastchar"]
        else:
            assert r["score_micro"] == 3 * wd  # -6000003: float 0.2/0.8


def test_fellegi_sunter_mixed_agreement_scores_between(spark):
    """A non-match pair that coincidentally agrees on length scores
    higher than a full disagreement but lower than a full match."""
    from vectrain_spark.operators.linking import fellegi_sunter_scores

    pairs = spark.createDataFrame(
        [
            (1, 2, "abcx", "abcx", True),
            (3, 4, "abcx", "zzzz", False),  # length agrees only
            (5, 6, "abcx", "qq", False),
        ],
        "id_a long, id_b long, key_a string, key_b string, is_match boolean",
    )
    got = {
        (r["id_a"], r["id_b"]): r["score_micro"]
        for r in fellegi_sunter_scores(pairs).collect()
    }
    assert got[(5, 6)] < got[(3, 4)] < got[(1, 2)]


def test_rendezvous_minimal_disruption_invariant(spark):
    """Growing 8 -> 10 shards: every moved key lands on a NEW shard
    (8 or 9) — old shards never trade keys — and the moved fraction
    sits near the theoretical 2/10."""
    from pyspark.sql import functions as F

    from vectrain_spark.operators.skew import rendezvous_assign

    keys = spark.range(2000).select(F.col("id").alias("k"))
    a = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(keys, "k", 8).collect()
    }
    b = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(keys, "k", 10).collect()
    }
    moved = [k for k in a if a[k] != b[k]]
    assert all(b[k] >= 8 for k in moved)  # moves only onto new shards
    frac = len(moved) / len(a)
    assert 0.12 <= frac <= 0.28  # ~0.2 expected
    # balance: each of the 8 shards holds a sane share
    from collections import Counter

    hist = Counter(a.values())
    assert set(hist) == set(range(8))
    assert min(hist.values()) > 2000 / 8 * 0.6


def test_rendezvous_assignment_is_deterministic(spark):
    from pyspark.sql import functions as F

    from vectrain_spark.operators.skew import rendezvous_assign

    keys = spark.range(100).select(F.col("id").alias("k"))
    one = sorted(
        (r["key"], r["shard"])
        for r in rendezvous_assign(keys, "k", 5).collect()
    )
    two = sorted(
        (r["key"], r["shard"])
        for r in rendezvous_assign(keys, "k", 5).collect()
    )
    assert one == two
