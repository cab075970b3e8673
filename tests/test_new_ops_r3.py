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
