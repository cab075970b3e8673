"""Round-4 operators: KG schema/rule mining, metapath caps, k-truss,
TransE evaluation, DSIR importance weights."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectrain_spark.operators.graph import k_truss, transe_eval
from vectrain_spark.operators.rules import (
    metapath_counts,
    pred_cardinality,
    rule_confidence,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "pred", "dst"])
    )


def test_pred_cardinality_functional_vs_multi(spark):
    rows = [
        # born_in: every subject exactly one object -> functionality 1.0
        ("a", "born_in", "x"),
        ("b", "born_in", "y"),
        ("c", "born_in", "x"),
        # knows: a has two objects -> functionality 2/3
        ("a", "knows", "b"),
        ("a", "knows", "c"),
        ("b", "knows", "c"),
    ]
    out = (
        pred_cardinality(_edges(spark, rows))
        .toPandas()
        .set_index("pred")
    )
    assert out.loc["born_in"].n_pairs == 3
    assert out.loc["born_in"].functionality == 1.0
    # 2 distinct objects over 3 pairs
    assert out.loc["born_in"].inv_functionality == round(2 / 3, 6)
    assert out.loc["knows"].functionality == round(2 / 3, 6)
    assert out.loc["knows"].inv_functionality == round(2 / 3, 6)


def test_rule_confidence_direct_and_inverse(spark):
    rows = [
        # capital_of(x,y) always implies city_in(x,y): conf 1.0
        ("paris", "capital_of", "fr"),
        ("rome", "capital_of", "it"),
        ("paris", "city_in", "fr"),
        ("rome", "city_in", "it"),
        ("lyon", "city_in", "fr"),
        # has_capital is the inverse of capital_of
        ("fr", "has_capital", "paris"),
    ]
    out = rule_confidence(_edges(spark, rows)).toPandas()
    d = out.set_index(["pred_body", "pred_head", "kind"])
    r = d.loc[("capital_of", "city_in", "dir")]
    assert r.support == 2 and r.confidence == 1.0
    # city_in => capital_of holds 2 of 3 times
    r = d.loc[("city_in", "capital_of", "dir")]
    assert r.support == 2 and r.confidence == round(2 / 3, 6)
    # inverse rule: capital_of(x,y) => has_capital(y,x), 1 of 2 bodies
    r = d.loc[("capital_of", "has_capital", "inv")]
    assert r.support == 1 and r.confidence == 0.5
    r = d.loc[("has_capital", "capital_of", "inv")]
    assert r.support == 1 and r.confidence == 1.0
    # a predicate is trivially its own 'dir' head -> must be excluded
    assert ("city_in", "city_in", "dir") not in d.index


def test_metapath_counts_and_hub_cap(spark):
    rows = [
        ("a", "p", "m"),
        ("b", "p", "m"),
        ("m", "q", "x"),
        ("m", "q", "y"),
        # a second, low-degree mid
        ("c", "p", "n"),
        ("n", "q", "z"),
    ]
    out = metapath_counts(_edges(spark, rows)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    # paths through m: 2 in x 2 out = 4; through n: 1 -> 5 total
    assert (r.pred_a, r.pred_b, r.n_paths, r.n_pairs) == ("p", "q", 5, 5)
    # cap at degree 3: m has degree 4 (2 in + 2 out) and is excluded as a
    # mid; only the path through n survives
    capped = metapath_counts(_edges(spark, rows), max_mid_degree=3).toPandas()
    assert len(capped) == 1 and capped.iloc[0].n_paths == 1
    # endpoints are not capped, only mids: a/b/c/x/y/z all still appear
    assert capped.iloc[0].n_pairs == 1


def test_metapath_distinct_pairs_vs_paths(spark):
    rows = [
        # two parallel paths a->m1->z and a->m2->z: 2 paths, 1 pair
        ("a", "p", "m1"),
        ("a", "p", "m2"),
        ("m1", "q", "z"),
        ("m2", "q", "z"),
    ]
    out = metapath_counts(_edges(spark, rows)).toPandas()
    assert out.iloc[0].n_paths == 2 and out.iloc[0].n_pairs == 1


def test_k_truss_strips_star_keeps_clique(spark):
    # a 4-clique (every edge in 2 triangles) + a star hub tail that
    # touches the clique but forms no triangles
    clique = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")
    ]
    star = [("a", "s1"), ("a", "s2"), ("a", "s3")]
    pairs = spark.createDataFrame(
        pd.DataFrame(clique + star, columns=["a", "b"])
    )
    out = k_truss(pairs, k=4, rounds=3).toPandas()
    got = {tuple(r) for r in out[["a", "b"]].itertuples(index=False)}
    assert got == set(clique)
    assert (out.support == 2).all()


def test_k_truss_requires_k3(spark):
    pairs = spark.createDataFrame(pd.DataFrame([("a", "b")], columns=["a", "b"]))
    with pytest.raises(ValueError):
        k_truss(pairs, k=2)


def test_transe_eval_metrics_sane_and_deterministic(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    emb_df = spark.createDataFrame(
        [(i, rng.standard_normal(8).round(3).tolist()) for i in range(20)],
        "vec_id: long, embedding: array<double>",
    )
    rows = [
        ("a", "p", "x"),
        ("b", "p", "y"),
        ("c", "q", "x"),
        ("d", "q", "z"),
        ("e", "q", "w"),
    ]
    e = _edges(spark, rows)
    out = transe_eval(e, emb_df, n_neg=4).toPandas().set_index("pred")
    assert set(out.index) == {"p", "q"}
    assert out.loc["p"].n_triples == 2 and out.loc["q"].n_triples == 3
    for _, r in out.iterrows():
        assert 0.0 < r.mrr <= 1.0
        assert 0.0 <= r.hits1 <= r.hits3 <= 1.0
        assert r.mean_rank >= 1.0
        # rank is bounded by 1 + n_neg
        assert r.mean_rank <= 5.0
    again = transe_eval(e, emb_df, n_neg=4).toPandas().set_index("pred")
    pd.testing.assert_frame_equal(out, again)


def test_dsir_prefers_target_like_docs(spark):
    from vectrain_spark.operators.corpus import dsir_logweights

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "lang": ["en", "en", "de", "de"],
                "text": [
                    "alpha beta gamma",
                    "alpha beta delta",
                    "zeta eta theta",
                    "alpha beta gamma",  # german doc with target-ish text
                ],
            }
        )
    )
    out = (
        dsir_logweights(docs, F.col("lang") == "en", buckets=32)
        .toPandas()
        .set_index("doc_id")
    )
    assert (out.n_tokens == 3).all()
    # docs made of target-distribution tokens outscore off-target ones,
    # regardless of their own label (doc 3 shares doc 0's text)
    assert out.loc[0].logw > out.loc[2].logw
    assert out.loc[3].logw == out.loc[0].logw


def test_dsir_empty_tokens_dropped(spark):
    from vectrain_spark.operators.corpus import dsir_logweights

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "lang": ["en", "de"], "text": ["  a   b ", "c"]}
        )
    )
    out = dsir_logweights(docs, F.col("lang") == "en").toPandas()
    assert dict(zip(out.doc_id, out.n_tokens)) == {0: 2, 1: 1}


def test_mmr_diversifies_vs_pure_topk(spark):
    import numpy as np

    # 6 near-identical docs along e1 (most query-relevant), 4 docs along
    # distinct other axes with lower relevance; query = e1 + small mix
    rows = []
    q = [1.0, 0.15, 0.1, 0.05]
    rows.append((0, q))
    for i in range(1, 7):
        rows.append((i, [1.0, 0.001 * i, 0.0, 0.0]))
    axes = [[0.5, 1.0, 0.0, 0.0], [0.5, 0.0, 1.0, 0.0], [0.5, 0.0, 0.0, 1.0]]
    for j, a in enumerate(axes):
        rows.append((7 + j, a))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id: long, embedding: array<double>",
    )
    from vectrain_spark.operators.similarity import knn_bruteforce, mmr_rerank

    topk = knn_bruteforce(emb, n_queries=1, k=4).toPandas()
    mmr = mmr_rerank(emb, n_queries=1, pool=9, k=4, lam=0.5).toPandas()
    # pure top-k drowns in the near-duplicate cluster
    assert sum(topk.n_id <= 6) == 4
    # MMR keeps the best cluster member but swaps redundant ones for
    # the diverse axes
    assert sum(mmr.n_id <= 6) < 4
    assert mmr.pick.tolist() == [1, 2, 3, 4] or set(mmr.pick) == {1, 2, 3, 4}
    # pick 1 is the pure-relevance winner
    top1 = topk[topk["rank"] == 1].n_id.iloc[0]
    assert mmr[mmr.pick == 1].n_id.iloc[0] == top1


def test_mmr_deterministic(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, rng.standard_normal(6).round(3).tolist()) for i in range(30)],
        "vec_id: long, embedding: array<double>",
    )
    from vectrain_spark.operators.similarity import mmr_rerank

    a = mmr_rerank(emb, n_queries=2, pool=10, k=3).toPandas()
    b = mmr_rerank(emb, n_queries=2, pool=10, k=3).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.sort_values(["q_id", "pick"]).reset_index(drop=True),
        b.sort_values(["q_id", "pick"]).reset_index(drop=True),
    )


def _cc_pairs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))


def test_incremental_cc_equals_batch(spark):
    from vectrain_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    base = [("b", "a"), ("c", "b"), ("e", "d"), ("g", "f")]
    # the wave merges two old components (a,b,c)+(d,e), attaches a brand
    # new node to an old component, and creates a new isolated pair
    wave = [("c", "e"), ("h", "f"), ("x", "y")]
    labels = connected_components(_cc_pairs(spark, base))
    inc = (
        incremental_components(labels, _cc_pairs(spark, wave))
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    batch = (
        connected_components(_cc_pairs(spark, base + wave))
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, batch)
    got = dict(zip(inc.id, inc.canon))
    assert got["e"] == "a" and got["d"] == "a"  # merged across the wave
    assert got["h"] == "f" and got["x"] == "x" and got["y"] == "x"


def test_incremental_cc_noop_wave(spark):
    from vectrain_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    base = [("b", "a"), ("c", "a")]
    labels = connected_components(_cc_pairs(spark, base))
    # wave edges entirely inside one existing component: nothing changes
    inc = (
        incremental_components(labels, _cc_pairs(spark, [("c", "b")]))
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert dict(zip(inc.id, inc.canon)) == {"a": "a", "b": "a", "c": "a"}


def test_sequence_patterns_counts(spark):
    from vectrain_spark.operators.events import sequence_patterns

    rows = [
        # user 1: s v p v v  -> 'svp' x1 at [0:3]? adjacent: s,v,p yes;
        # 'vv' x1; 'vp' x1 (non-overlapping, leftmost-first)
        (0, 1, "2024-01-01 00:00:00.000000", "signup"),
        (1, 1, "2024-01-01 00:00:01.000000", "view"),
        (2, 1, "2024-01-01 00:00:02.000000", "purchase"),
        (3, 1, "2024-01-01 00:00:03.000000", "view"),
        (4, 1, "2024-01-01 00:00:04.000000", "view"),
        # user 2: v v v v -> 'vv' x2 non-overlapping, no vp/svp
        (5, 2, "2024-01-01 00:00:00.000000", "view"),
        (6, 2, "2024-01-01 00:00:01.000000", "view"),
        (7, 2, "2024-01-01 00:00:02.000000", "view"),
        (8, 2, "2024-01-01 00:00:03.000000", "view"),
        # user 3: purchase only; unknown type ignored
        (9, 3, "2024-01-01 00:00:00.000000", "purchase"),
        (10, 3, "2024-01-01 00:00:01.000000", "refund"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    )
    out = sequence_patterns(
        ev,
        {"signup": "s", "view": "v", "purchase": "p"},
        {"svp": "svp", "vv": "vv", "vp": "vp"},
    ).toPandas().set_index("pattern")
    assert out.loc["svp"].n_users == 1 and out.loc["svp"].n_matches == 1
    assert out.loc["vv"].n_users == 2 and out.loc["vv"].n_matches == 3
    assert out.loc["vp"].n_users == 1 and out.loc["vp"].n_matches == 1


def test_sequence_patterns_tie_order(spark):
    from vectrain_spark.operators.events import sequence_patterns

    # identical timestamps: event_id breaks the tie -> 'vp', not 'pv'
    rows = [
        (1, 7, "2024-01-01 00:00:00.000000", "view"),
        (2, 7, "2024-01-01 00:00:00.000000", "purchase"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    )
    out = sequence_patterns(
        ev,
        {"view": "v", "purchase": "p"},
        {"vp": "vp", "pv": "pv"},
    ).toPandas().set_index("pattern")
    assert out.loc["vp"].n_matches == 1 and out.loc["pv"].n_matches == 0
