"""Round-3 operators: batch sessionization, Gopher rules, neighbor Jaccard."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from vectrain_spark.operators.events import sessionize
from vectrain_spark.operators.graph import neighbor_jaccard
from vectrain_spark.operators.textstats import gopher_rules

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_sessionize_splits_on_gap(spark):
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: 3 events tight, then a 31-min hole, then 2 more
        (0, 1, T0, 1.0),
        (1, 1, T0 + 10 * s, 2.0),
        (2, 1, T0 + 20 * s, 3.0),
        (3, 1, T0 + 20 * s + dt.timedelta(minutes=31), 4.0),
        (4, 1, T0 + 20 * s + dt.timedelta(minutes=31, seconds=5), 5.0),
        # user 2: exactly at the gap boundary (1800s) -> same session
        (5, 2, T0, 10.0),
        (6, 2, T0 + dt.timedelta(seconds=1800), 10.0),
        # user 2: one microsecond past the gap -> new session
        (7, 2, T0 + dt.timedelta(seconds=3600, microseconds=1), 1.5),
    ]
    out = sessionize(_ev(spark, rows), gap_sec=1800).toPandas()
    u1 = out[out.user_id == 1].sort_values("sess_seq")
    assert list(u1.n_events) == [3, 2]
    assert list(u1.total_value) == [6.0, 9.0]
    assert u1.iloc[0].duration_us == 20_000_000
    u2 = out[out.user_id == 2].sort_values("sess_seq")
    assert list(u2.n_events) == [2, 1]
    # second session starts exactly at its event's microsecond timestamp
    assert int(u2.iloc[1].start_us - u2.iloc[0].start_us) == 3_600_000_001


def test_sessionize_ties_break_on_event_id(spark):
    rows = [(9, 1, T0, 1.0), (3, 1, T0, 2.0)]  # identical ts, ids 9 and 3
    out = sessionize(_ev(spark, rows)).toPandas()
    assert len(out) == 1 and out.iloc[0].n_events == 2


def test_gopher_rules_flags(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    # passes everything: 16 words, stopwordy, mean len 4.125
                    "the quick brown foxes jumped over the lazy dogs in that field for fun today again",
                    "too short",  # fails n_words and stops
                    # digit-heavy: 16 words, >30% contain digits
                    "the of x1 x2 x3 x4 x5 x6 x7 x8 pad pad pad pad pad pad",
                ],
            }
        )
    )
    out = gopher_rules(docs).toPandas().set_index("doc_id").sort_index()
    assert out.loc[0].keep == 1
    assert (out.loc[0][["ok_words", "ok_word_len", "ok_stops", "ok_digits"]] == 1).all()
    assert out.loc[1].ok_words == 0 and out.loc[1].keep == 0
    assert out.loc[2].ok_digits == 0 and out.loc[2].keep == 0
    assert out.loc[2].n_words == 16
    assert abs(out.loc[2].digit_word_frac - 0.5) < 1e-9


def test_neighbor_jaccard_square_with_diagonal(spark):
    # square 1-2-3-4-1 plus diagonal 1-3:
    #   N(1)={2,3,4} N(2)={1,3} N(3)={1,2,4} N(4)={1,3}
    pairs = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)], columns=["a", "b"])
    )
    out = neighbor_jaccard(pairs).toPandas()
    got = {(r.a, r.b): (r.common, r.jaccard) for r in out.itertuples()}
    assert got[(1, 2)] == (1, round(1 / 4, 6))  # common {3}, union {1,2,3,4}
    assert got[(1, 3)] == (2, round(2 / 4, 6))  # common {2,4}
    assert got[(2, 3)] == (1, round(1 / 4, 6))
    assert len(out) == 5  # one row per input edge, none invented


def test_cms_never_undercounts_and_merges(spark):
    from vectrain_spark.operators.sketch import cms_estimates, cms_sketch

    words = spark.createDataFrame(
        pd.DataFrame({"word": ["a", "b", "c", "a", "a", "b", "d", "e", "f", "g"]})
    )
    est = cms_estimates(words, "word", depth=2, width=2).toPandas()
    assert len(est) == 7
    assert (est.cms_est >= est.exact_cnt).all()  # the CMS guarantee
    assert (est.overcount > 0).any()  # width 2 forces collisions
    # mergeability: sketch(A) + sketch(B) == sketch(A union B), counter-wise
    half1 = spark.createDataFrame(pd.DataFrame({"word": ["a", "b", "c", "a", "a"]}))
    half2 = spark.createDataFrame(pd.DataFrame({"word": ["b", "d", "e", "f", "g"]}))
    merged = (
        cms_sketch(half1, "word", 2, 2)
        .unionAll(cms_sketch(half2, "word", 2, 2))
        .groupBy("row", "bucket")
        .sum("cnt")
        .withColumnRenamed("sum(cnt)", "cnt")
        .toPandas()
        .sort_values(["row", "bucket"])
        .reset_index(drop=True)
    )
    whole = (
        cms_sketch(words, "word", 2, 2)
        .toPandas()
        .sort_values(["row", "bucket"])
        .reset_index(drop=True)
    )
    assert merged.astype("int64").equals(whole.astype("int64"))


def test_hits_star_graph(spark):
    # star: h -> a1..a3; one reverse edge a1 -> h
    from vectrain_spark.operators.graph import hits

    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": ["h", "h", "h", "a1"], "dst": ["a1", "a2", "a3", "h"]}
        )
    )
    out = hits(edges, n_iter=3).toPandas().set_index("id")
    # h is the dominant hub (points at everything), a1..a3 the authorities
    assert out.loc["h"].hub > out.loc["a1"].hub
    assert out.loc["a1"].auth > out.loc["h"].hub * 0  # present
    assert abs(out.hub.sum() - 1.0) < 1e-4  # L1-normalized
    assert abs(out.auth.sum() - 1.0) < 1e-4
    # a1 gets the same authority as a2/a3 (all fed only by h)
    assert out.loc["a1"].auth == out.loc["a2"].auth == out.loc["a3"].auth


def test_hits_matches_numpy_power_iteration(spark):
    import numpy as np
    from vectrain_spark.operators.graph import hits

    rng = [("n%d" % (i % 5), "n%d" % ((i * 3 + 1) % 5)) for i in range(12)]
    rng = [(s, d) for s, d in rng if s != d]
    edges = spark.createDataFrame(pd.DataFrame(rng, columns=["src", "dst"]))
    out = hits(edges, n_iter=5).toPandas().set_index("id").sort_index()
    ids = sorted(set(s for s, _ in rng) | set(d for _, d in rng))
    idx = {n: i for i, n in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d in set(rng):
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(ids))
    for _ in range(5):
        a = A.T @ h
        a = np.round(a / a.sum(), 8)
        h = A @ a
        h = np.round(h / h.sum(), 8)
    np.testing.assert_allclose(out.hub.values, np.round(h, 6), atol=2e-6)
    np.testing.assert_allclose(out.auth.values, np.round(a, 6), atol=2e-6)


def test_label_propagation_two_cliques(spark):
    from vectrain_spark.operators.graph import label_propagation

    # two triangles bridged by one edge: LPA should keep them separate
    pairs = [
        ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
        ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
        ("a3", "b1"),
    ]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["a", "b"]))
    out = label_propagation(df, rounds=4).toPandas().set_index("id")
    assert len(set(out.loc[["a1", "a2", "a3"]].label)) == 1
    assert len(set(out.loc[["b1", "b2", "b3"]].label)) == 1
    assert out.loc["a1"].label != out.loc["b2"].label
    assert set(out.community_size) <= {3, 4}


def test_label_propagation_deterministic_tiebreak(spark):
    from vectrain_spark.operators.graph import label_propagation

    # node m has one neighbor in each of two labels -> smallest label wins
    pairs = [("aaa", "m"), ("zzz", "m")]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["a", "b"]))
    out1 = label_propagation(df, rounds=1).toPandas().set_index("id")
    assert out1.loc["m"].label == "aaa"


def test_bloom_pruned_join_matches_plain_join(spark):
    from vectrain_spark.operators.bloom import (
        bloom_build, bloom_filter_col, bloom_pruned_join,
    )

    fact = spark.createDataFrame(
        pd.DataFrame({"k": list(range(200)), "v": [i * 2 for i in range(200)]})
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [3, 17, 99, 150], "name": ["a", "b", "c", "d"]})
    )
    got = bloom_pruned_join(fact, dim, "k").toPandas().sort_values("k")
    want = fact.join(dim, "k").toPandas().sort_values("k")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # the filter really prunes: most of the 200 fact keys are dropped
    bitmap = bloom_build(dim, "k")
    n = fact.filter(bloom_filter_col(F.col("k"), bitmap)).count()
    assert 4 <= n < 100


def test_bloom_no_false_negatives_property(spark):
    from vectrain_spark.operators.bloom import bloom_build, bloom_filter_col

    keys = ["key%d" % (i * 7919) for i in range(50)]
    dim = spark.createDataFrame(pd.DataFrame({"k": keys}))
    bitmap = bloom_build(dim, "k", m_bits=512, k=4)
    # every inserted key must test positive, even in a crowded filter
    hits = dim.filter(bloom_filter_col(F.col("k"), bitmap, m_bits=512, k=4))
    assert hits.count() == 50


def test_shortest_paths_unweighted_equals_hops(spark):
    from vectrain_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": ["s", "s", "a", "b", "c"], "dst": ["a", "b", "c", "c", "d"]}
        )
    )
    seeds = spark.createDataFrame(pd.DataFrame({"seed": ["s"]}))
    out = shortest_paths(edges, seeds, rounds=4).toPandas().set_index("id")
    assert out.loc["s"].dist == 0.0
    assert out.loc["a"].dist == 1.0 and out.loc["b"].dist == 1.0
    assert out.loc["c"].dist == 2.0
    assert out.loc["d"].dist == 3.0


def test_shortest_paths_weighted_prefers_strong_edges(spark):
    from vectrain_spark.operators.graph import shortest_paths

    # s->a (cnt 10, cost .1) -> t (cnt 10, cost .1)  beats  s->t (cnt 1, cost 1)
    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": ["s", "a", "s"],
                "dst": ["a", "t", "t"],
                "cnt": [10, 10, 1],
            }
        )
    )
    seeds = spark.createDataFrame(pd.DataFrame({"seed": ["s"]}))
    out = shortest_paths(edges, seeds, rounds=3, weight="cnt").toPandas().set_index("id")
    assert abs(out.loc["t"].dist - 0.2) < 1e-9


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from vectrain_spark.operators.graph import pagerank, personalized_pagerank

    # chain a -> b -> c -> d plus back-edge d -> a
    edges = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b", "c", "d"], "dst": ["b", "c", "d", "a"]})
    )
    seeds = spark.createDataFrame(pd.DataFrame({"seed": ["a"]}))
    out = personalized_pagerank(edges, seeds, n_iter=5).toPandas().set_index("id")
    # seed and its immediate successor dominate; mass decays with distance
    assert out.loc["a"]["rank"] > out.loc["c"]["rank"]
    assert out.loc["b"]["rank"] > out.loc["c"]["rank"]
    # global pagerank on this symmetric cycle is uniform — PPR is not
    g = pagerank(edges, n_iter=5).toPandas().set_index("id")
    assert g["rank"].nunique() == 1
    assert out["rank"].nunique() > 1


def test_pmi_pairs_window_semantics(spark):
    from vectrain_spark.operators.textstats import pmi_pairs

    # "a b c a b c ..." x6: distance-1 pairs ab/bc/ac(c..a wrap), distance-2
    docs = spark.createDataFrame(
        [(0, "a b c " * 6), (1, "a b c " * 6)], "doc_id long, text string"
    )
    out = {(r.wa, r.wb): r for r in pmi_pairs(docs, min_pair=5).collect()}
    # each doc: tokens a,b,c x6 = 18; d1 pairs: (a,b)x6 (b,c)x6 (a,c)x5;
    # d2: (a,c)x6 (a,b)x5 (b,c)x5  -> over 2 docs
    assert out[("a", "b")].c_ab == 22 and out[("b", "c")].c_ab == 22
    assert out[("a", "c")].c_ab == 22
    assert out[("a", "b")].c_a == 12  # 'a' appears 6x per doc
    # uniform corpus: all ratios equal and > 1 (co-occurrence enriched)
    ratios = {r.pmi_ratio for r in out.values()}
    assert len(ratios) == 1 and ratios.pop() > 1.0
    # pure JVM path
    plan = pmi_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_bpe_pair_counts_hand_corpus(spark):
    """'aaab aaab ab' -> word freqs {aaab:2, ab:1}; pairs: aa×2/word,
    ab×1/word -> aa:4, ab:3."""
    from vectrain_spark.operators.textstats import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ab"), (3, "x")], "doc_id: long, text: string"
    )
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(docs).collect()}
    assert got == {"aa": 4, "ab": 3}


def test_bpe_pair_counts_weights_by_occurrence(spark):
    """The same word in many docs counts once per occurrence (wordcount
    weighting), and 1-char words contribute no pairs."""
    from vectrain_spark.operators.textstats import bpe_pair_counts

    docs = spark.createDataFrame(
        [(i, "zq a") for i in range(5)], "doc_id: long, text: string"
    )
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(docs).collect()}
    assert got == {"zq": 5}


def test_degree_histogram_log2_buckets(spark):
    """Degrees 1,2,3,4,8 -> buckets 0,1,1,2,3."""
    from vectrain_spark.operators.graph import degree_histogram

    rows = []
    for src, deg in (("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 8)):
        rows += [(src, f"n{i}", "p") for i in range(deg)]
    edges = spark.createDataFrame(rows, "src: string, dst: string, pred: string")
    got = {r["bucket"]: r["n_nodes"] for r in degree_histogram(edges).collect()}
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}


def test_degree_histogram_distincts_parallel_edges(spark):
    """Duplicate (src,dst,pred) rows collapse before counting."""
    from vectrain_spark.operators.graph import degree_histogram

    edges = spark.createDataFrame(
        [("a", "b", "p")] * 4 + [("a", "c", "p")],
        "src: string, dst: string, pred: string",
    )
    got = {r["bucket"]: r["n_nodes"] for r in degree_histogram(edges).collect()}
    assert got == {1: 1}


def test_random_walks_matches_python_oracle(spark):
    """Replay the md5-choice walk in pure Python on a hand graph."""
    import hashlib

    from vectrain_spark.operators.graph import random_walks

    edges = [
        ("a", "b", "p"), ("a", "c", "p"), ("b", "c", "p"),
        ("c", "a", "p"), ("c", "d", "p"),  # d is a sink
    ]
    edf = spark.createDataFrame(edges, "src: string, dst: string, pred: string")
    got = {
        (r["start"], r["step"]): r["node"]
        for r in random_walks(edf, length=3).collect()
    }
    adj = {"a": ["b", "c"], "b": ["c"], "c": ["a", "d"]}
    for start in adj:
        node = start
        assert got[(start, 0)] == start
        for t in (1, 2, 3):
            if node not in adj:
                assert (start, t) not in got
                continue
            nbrs = adj[node]
            h = int(hashlib.md5(f"{start}|{node}|{t}".encode()).hexdigest()[:15], 16)
            node = nbrs[h % len(nbrs)]
            assert got[(start, t)] == node, (start, t)


def test_random_walks_stop_at_sinks(spark):
    """A pure chain into a sink: every walk is a prefix, no rows invented
    past the sink, and walks are deterministic across partitionings."""
    from vectrain_spark.operators.graph import random_walks

    edf = spark.createDataFrame(
        [("a", "b", "p"), ("b", "c", "p")], "src: string, dst: string, pred: string"
    )
    a = random_walks(edf, length=3).toPandas()
    b = random_walks(edf.repartition(7), length=3).toPandas()
    key = ["start", "step"]
    assert (
        a.sort_values(key).values.tolist() == b.sort_values(key).values.tolist()
    )
    # a: a->b->c stop (deg(c)=0); b: b->c stop
    got = {(r.start, r.step): r.node for r in a.itertuples()}
    assert got == {
        ("a", 0): "a", ("a", 1): "b", ("a", 2): "c",
        ("b", 0): "b", ("b", 1): "c",
    }


def test_walk_skipgrams_window_and_multiplicity(spark):
    """Two walks sharing a (b,c) transition: window-2 pairs from walk
    [a,b,c] are (a,b),(b,a),(b,c),(c,b),(a,c),(c,a); multiplicity adds
    across walks."""
    from vectrain_spark.operators.graph import walk_skipgrams

    walks = spark.createDataFrame(
        [
            ("w1", 0, "a"), ("w1", 1, "b"), ("w1", 2, "c"),
            ("w2", 0, "b"), ("w2", 1, "c"),
        ],
        "start: string, step: long, node: string",
    )
    got = {(r.center, r.context): r.cnt for r in walk_skipgrams(walks).collect()}
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1,
        ("b", "c"): 2, ("c", "b"): 2,
        ("a", "c"): 1, ("c", "a"): 1,
    }
