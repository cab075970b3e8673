"""Unit tests for the round-4b operators: SCD2 fact history, incremental
view maintenance, the linear quality probe, and the linking P/R harness."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _ts(s: str) -> str:
    return f"2024-0{s}-01 00:00:00"


def test_fact_history_gaps_and_islands(spark):
    from vectrain_spark.operators.temporal import fact_history

    t1, t2, t3 = _ts("1"), _ts("3"), _ts("5")
    rows = [
        # fact a: present at all three -> one open interval
        ("a", t1), ("a", t2), ("a", t3),
        # fact b: [1,0,1] -> two intervals, first closed at t2, second open
        ("b", t1), ("b", t3),
        # fact c: [1,1,0] -> one closed interval [t1, t3)
        ("c", t1), ("c", t2),
        # fact d: appears only at t3 -> open interval [t3, null)
        ("d", t3),
    ]
    facts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "warc_ts"])
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = (
        fact_history(facts, ["k"])
        .select(
            "k",
            F.date_format("valid_from", "yyyy-MM-dd").alias("vf"),
            F.date_format("valid_to", "yyyy-MM-dd").alias("vt"),
            "is_current",
        )
        .toPandas()
        .sort_values(["k", "vf"])
        .reset_index(drop=True)
    )
    got = [
        (r.k, r.vf, r.vt if isinstance(r.vt, str) else None, bool(r.is_current))
        for r in out.itertuples()
    ]
    assert got == [
        ("a", "2024-01-01", None, True),
        ("b", "2024-01-01", "2024-03-01", False),
        ("b", "2024-05-01", None, True),
        ("c", "2024-01-01", "2024-05-01", False),
        ("d", "2024-05-01", None, True),
    ]


def test_fact_history_single_snapshot_all_current(spark):
    from vectrain_spark.operators.temporal import fact_history

    facts = spark.createDataFrame(
        pd.DataFrame([("x", _ts("1")), ("y", _ts("1"))], columns=["k", "warc_ts"])
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = fact_history(facts, ["k"]).toPandas()
    assert len(out) == 2
    assert out.valid_to.isna().all() and out.is_current.all()


def test_apply_changelog_agg_maintains_groups(spark):
    from vectrain_spark.catalog import apply_changelog_agg

    base = spark.createDataFrame(
        pd.DataFrame(
            [("en", 2, 30), ("de", 1, 7)], columns=["lang", "n", "s"]
        )
    )
    # delete both en rows (group vanishes), update the de row (7 -> 9),
    # insert two fr rows (new group appears)
    chg = spark.createDataFrame(
        pd.DataFrame(
            [
                ("delete", "en", 10),
                ("delete", "en", 20),
                ("update_pre", "de", 7),
                ("update_post", "de", 9),
                ("insert", "fr", 5),
                ("insert", "fr", 6),
            ],
            columns=["_op", "lang", "v"],
        )
    )
    out = (
        apply_changelog_agg(base, chg, ["lang"], "n", {"s": "v"})
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert list(out.itertuples(index=False)) == [
        ("de", 1, 9),
        ("fr", 2, 11),
    ]


def test_quality_probe_separates_and_is_deterministic(spark):
    from vectrain_spark.operators.corpus import quality_probe_scores

    rows = []
    for i in range(20):
        good = i % 2 == 0
        text = ("alpha beta gamma delta " if good else "zork quux blarg frob ") * 3
        rows.append((i, text, "en" if good else "xx"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    out = quality_probe_scores(docs, F.col("lang") == "en").toPandas()
    assert len(out) == 20
    pos = out[out.label == 1].score.mean()
    neg = out[out.label == 0].score.mean()
    assert pos > neg  # the probe learned the separation in two steps
    again = quality_probe_scores(docs, F.col("lang") == "en").toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_link_eval_pr_tradeoff(spark):
    from vectrain_spark.operators.linking import link_eval_pr

    aliases = spark.createDataFrame(
        pd.DataFrame(
            [(0, "Vendor0"), (1, "Vendor1")], columns=["entity_id", "alias"]
        ).astype({"entity_id": "int64"})
    )
    inst = spark.createDataFrame(
        pd.DataFrame(
            [
                ("Vendor0", 0),     # exact, score 1.0, correct
                ("Vendor", 0),      # ambiguous -> entity 0, correct
                ("Vendor", 1),      # ambiguous -> entity 0, WRONG for gold 1
                ("Zebra9999", 1),   # no candidate at lev<=2 -> never emitted
            ],
            columns=["mention", "gold_entity"],
        ).astype({"gold_entity": "int64"})
    )
    out = (
        link_eval_pr(inst, aliases, [0.99, 0.5])
        .toPandas()
        .set_index("threshold")
    )
    hi = out.loc[0.99]
    assert (hi.n_gold, hi.n_pred, hi.n_correct) == (4, 1, 1)
    assert hi.precision == 1.0 and hi.recall == 0.25
    lo = out.loc[0.5]
    # at 0.5 both 'Vendor' instances emit (score 0.857143) -> 3 emitted,
    # 2 correct; the unlinkable mention still caps recall below 1
    assert (lo.n_gold, lo.n_pred, lo.n_correct) == (4, 3, 2)
    assert lo.precision == pytest.approx(0.666667)
    assert lo.recall == 0.5


def test_quality_probe_skips_empty_docs(spark):
    from vectrain_spark.operators.corpus import quality_probe_scores

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(1, "alpha beta", "en"), (2, "", "en"), (3, "   ", "xx")],
            columns=["doc_id", "text", "lang"],
        )
    )
    out = quality_probe_scores(docs, F.col("lang") == "en").toPandas()
    # token-less docs contribute no features and emit no score row
    assert sorted(out.doc_id) == [1]


def test_fact_history_composite_key(spark):
    from vectrain_spark.operators.temporal import fact_history

    t1, t2 = _ts("1"), _ts("3")
    facts = spark.createDataFrame(
        pd.DataFrame(
            [("u1", "s", "p", t1), ("u1", "s", "p", t2), ("u1", "s", "q", t1)],
            columns=["url", "subj", "pred", "warc_ts"],
        )
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = fact_history(facts, ["url", "subj", "pred"]).toPandas()
    cur = out[out.is_current]
    closed = out[~out.is_current]
    assert len(out) == 2 and len(cur) == 1 and len(closed) == 1
    assert cur.iloc[0].pred == "p" and closed.iloc[0].pred == "q"
