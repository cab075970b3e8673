"""Unit tests for the round-4c operators: predicate reciprocity,
DistMult scoring, N-Triples export, and priority sampling."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "pred", "dst", "cnt"])
    )


def test_pred_reciprocity_sym_inv_and_loops(spark):
    from vectrain_spark.operators.rules import pred_reciprocity

    rows = [
        # 'partner': fully symmetric (both directions present)
        ("a", "partner", "b", 1),
        ("b", "partner", "a", 1),
        # 'owns'/'ownedBy': inverses of each other (inv_any, not sym)
        ("a", "owns", "c", 1),
        ("c", "ownedBy", "a", 1),
        # 'likes': one-way only, plus a self-loop (excluded from ratios)
        ("a", "likes", "b", 1),
        ("d", "likes", "d", 1),
    ]
    out = {
        r["pred"]: r
        for r in pred_reciprocity(_edges(spark, rows)).collect()
    }
    assert out["partner"].asDict() == {
        "pred": "partner", "n_pairs": 2, "n_loops": 0, "n_sym": 2,
        "n_inv_any": 2, "sym_ratio": 1.0, "inv_ratio": 1.0,
    }
    assert out["owns"]["n_sym"] == 0 and out["owns"]["n_inv_any"] == 1
    assert out["ownedBy"]["inv_ratio"] == 1.0
    # likes: 2 pairs, 1 loop; the non-loop pair has no reverse anywhere
    # EXCEPT via 'partner' (b->a exists) -> inv_any = 1, sym = 0
    assert out["likes"].asDict() == {
        "pred": "likes", "n_pairs": 2, "n_loops": 1, "n_sym": 0,
        "n_inv_any": 1, "sym_ratio": 0.0, "inv_ratio": 1.0,
    }


def test_pred_reciprocity_all_loops_zero_ratio(spark):
    from vectrain_spark.operators.rules import pred_reciprocity

    out = pred_reciprocity(
        _edges(spark, [("x", "self", "x", 1)])
    ).collect()
    assert out[0]["n_loops"] == 1 and out[0]["sym_ratio"] == 0.0


def test_distmult_symmetry_and_topk(spark):
    """DistMult is invariant under h<->t swap — the defining contrast
    with TransE — and the per-pred top-k keeps rank<=k deterministic."""
    from vectrain_spark.operators.graph import distmult_scores

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": list(range(8)),
                "embedding": [
                    [float(i % 3) - 1.0, 0.5 * i, 1.0] for i in range(8)
                ],
            }
        )
    )
    edges = _edges(
        spark,
        [("a", "p", "b", 1), ("b", "p", "a", 1), ("a", "p", "c", 1),
         ("c", "q", "a", 1)],
    )
    out = distmult_scores(edges, emb, k=2).collect()
    by = {(r["src"], r["pred"], r["dst"]): r["score"] for r in out}
    # symmetric pair scores identical
    assert by[("a", "p", "b")] == by[("b", "p", "a")]
    ranks = [(r["pred"], r["rank"]) for r in out]
    assert all(rk <= 2 for _, rk in ranks)
    # deterministic: same result on re-run
    again = {(r["src"], r["pred"], r["dst"]): r["score"]
             for r in distmult_scores(edges, emb, k=2).collect()}
    assert by == again


def test_to_ntriples_escapes_and_line(spark):
    from vectrain_spark.operators.rdf import to_ntriples

    out = to_ntriples(
        _edges(spark, [("a b", "has part", "c<d>", 2),
                       ("100%", "p|q", "e\\f", 1)])
    ).collect()
    rows = {r["subject"]: r for r in out}
    s1 = "<http://kg.local/e/a%20b>"
    assert s1 in rows
    r1 = rows[s1]
    assert r1["predicate"] == "<http://kg.local/p/has%20part>"
    assert r1["object"] == "<http://kg.local/e/c%3Cd%3E>"
    assert r1["line"] == f"{s1} <http://kg.local/p/has%20part> <http://kg.local/e/c%3Cd%3E> ."
    # '%' escapes FIRST (no double-escaping), '|' and '\' encode
    r2 = rows["<http://kg.local/e/100%25>"]
    assert r2["predicate"] == "<http://kg.local/p/p%7Cq>"
    assert r2["object"] == "<http://kg.local/e/e%5Cf>"
    assert r2["cnt"] == 1


def test_priority_sample_deterministic_and_weighted(spark):
    from vectrain_spark.operators.corpus import priority_sample

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(1000)),
                # one giant-weight row must always be sampled
                "n_chars": [10] * 999 + [10_000_000],
            }
        )
    )
    out = priority_sample(docs, k=50)
    got = out.collect()
    assert len(got) == 50
    ids = [r["doc_id"] for r in got]
    assert 999 in ids  # the heavy row is (practically surely) included
    # deterministic across runs
    assert ids == [r["doc_id"] for r in priority_sample(docs, k=50).collect()]
    # priorities are sorted descending in the output
    prios = [r["priority"] for r in got]
    assert prios == sorted(prios, reverse=True)


def test_priority_sample_skips_nonpositive_weights(spark):
    from vectrain_spark.operators.corpus import priority_sample

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "n_chars": [0, -5, 7]})
    )
    got = priority_sample(docs, k=10).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_transition_matrix_counts_and_probs(spark):
    from vectrain_spark.operators.events import transition_matrix

    rows = [
        # user 1: a -> b -> a   (ties impossible: distinct ts)
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 00:01:00", 1, "b"),
        (3, "2024-01-01 00:02:00", 1, "a"),
        # user 2: a -> a (same ts -> event_id breaks the tie: 4 then 5)
        (5, "2024-01-01 00:00:00", 2, "a"),
        (4, "2024-01-01 00:00:00", 2, "b"),
        # user 3: single event -> no transition
        (6, "2024-01-01 00:00:00", 3, "c"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["prev_type"], r["next_type"]): (r["cnt"], r["prob"])
        for r in transition_matrix(ev).collect()
    }
    # user 1 contributes a->b and b->a; user 2 (tie broken by event_id
    # 4 < 5) contributes b->a
    assert got[("a", "b")] == (1, 1.0)
    assert got[("b", "a")] == (2, 1.0)
    assert ("c", "a") not in got and len(got) == 2
