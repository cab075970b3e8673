"""As-of join semantics and JSON property promotion on hand-written
frames: inclusive boundary, latest-wins, left-outer nulls, key isolation."""

from __future__ import annotations

from datetime import datetime

from vectrain_spark.operators.events import asof_join, extract_event_props


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(10)),   # right rows at 5 and 9 precede -> matches 9
            (2, 100, _ts(4)),    # no right row at-or-before -> null
            (3, 100, _ts(5)),    # EQUAL ts -> inclusive match
            (4, 200, _ts(30)),   # other key: must not see key-100 rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(5), 50),
            (100, _ts(9), 90),
            (100, _ts(12), 120),  # AFTER left@10 -> never matched by it
            (300, _ts(1), 10),    # unrelated key
        ],
        "user_id long, ts timestamp, r_val long",
    )
    got = {
        r["event_id"]: r["r_val"]
        for r in asof_join(left, right, key="user_id", ts="ts").collect()
    }
    assert got == {1: 90, 2: None, 3: 50, 4: None}


def test_asof_join_deterministic_across_partitioning(spark):
    rows_l = [(i, i % 5, _ts(i % 50)) for i in range(200)]
    rows_r = [(i % 5, _ts((i * 7) % 50), i) for i in range(40)]
    left = spark.createDataFrame(rows_l, "event_id long, user_id long, ts timestamp")
    right = (
        spark.createDataFrame(rows_r, "user_id long, ts timestamp, r_val long")
        # enforce the unique-(key, ts) precondition on the fixture
        .groupBy("user_id", "ts").agg({"r_val": "max"})
        .withColumnRenamed("max(r_val)", "r_val")
    )
    a = sorted(map(tuple, asof_join(left.repartition(1), right).collect()))
    b = sorted(map(tuple, asof_join(left.repartition(13), right.repartition(7)).collect()))
    assert a == b and len(a) == 200


def test_extract_event_props_types_and_missing(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "s": "x"}'), (2, '{"s": "y"}'), (3, "not json")],
        "event_id long, props string",
    )
    got = {
        r["event_id"]: (r["prop_k"], r["prop_s"])
        for r in extract_event_props(df, {"k": "bigint", "s": "string"}).collect()
    }
    assert got == {1: (7, "x"), 2: (None, "y"), 3: (None, None)}


def test_asof_join_null_attribute_on_matched_row(spark):
    """A NULL attribute on the MATCHED right row must come through as NULL —
    never stitched from an older right row (per-column carry bug)."""
    left = spark.createDataFrame(
        [(1, 7, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _ts(5), 50, "a"), (7, _ts(9), None, "b")],
        "user_id long, ts timestamp, r_val long, r_tag string",
    )
    row = asof_join(left, right, key="user_id", ts="ts").collect()[0]
    # matched row is ts=9: r_val NULL, r_tag 'b' — no mixing with ts=5
    assert row["r_val"] is None and row["r_tag"] == "b"


def test_interval_join_bounds_and_bucket_spans(spark):
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from vectrain_spark.operators.events import interval_join

    t0 = dt.datetime(2024, 1, 10, 0, 0, 0)
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2],
                "ts": [
                    t0,                                  # == start (inclusive)
                    t0 + dt.timedelta(days=2, hours=23),  # inside, 3rd bucket
                    t0 + dt.timedelta(days=3),            # == end (inclusive)
                    t0 + dt.timedelta(days=3, seconds=1),  # past end
                    t0 + dt.timedelta(days=1),            # other user
                ],
                "v": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1],
                "win_id": [100],
                "start_ts": [t0],
                "end_ts": [t0 + dt.timedelta(days=3)],
            }
        )
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    out = interval_join(ev, iv).toPandas()
    assert sorted(out.v) == [1.0, 2.0, 3.0]
    assert "_b" not in out.columns
    # overlapping windows each match independently, no duplicates within one
    iv2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "win_id": [100, 200],
                "start_ts": [t0, t0 + dt.timedelta(days=1)],
                "end_ts": [
                    t0 + dt.timedelta(days=3),
                    t0 + dt.timedelta(days=4),
                ],
            }
        )
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    out2 = interval_join(ev, iv2).toPandas()
    counts = out2.groupby(["win_id"]).size().to_dict()
    assert counts == {100: 3, 200: 3}
    assert len(out2) == len(out2.drop_duplicates(["win_id", "ts", "v"]))
