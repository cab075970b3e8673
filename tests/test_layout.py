"""Physical-layout scale demos: bucketed co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Bucketing both tables on the join key at write time (Iceberg:
``bucket(N, key)`` partition transform; Spark: ``bucketBy``) makes the
join a per-bucket zip — NO exchange on either side. This test proves the
engine's tables can be laid out that way and that Spark's planner
actually elides the exchanges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_elides_both_exchanges(spark, tmp_path, no_broadcast):
    left = spark.range(10_000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("key"), (F.col("id") * 3).alias("rv")
    )
    for name, df in (("b_left", left), ("b_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "key")
            .sortBy("key")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    try:
        j = spark.table("b_left").join(spark.table("b_right"), "key")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located layout: neither side shuffles
        assert "Exchange" not in plan
        assert j.count() == 10_000
        got = j.filter(F.col("key") == 7).collect()[0]
        assert (got["lv"], got["rv"]) == (14, 21)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_unbucketed_join_pays_exchanges(spark, no_broadcast):
    """Control: the same join over plain DataFrames shuffles both sides —
    the bucketed layout is what removes them, not the planner mood."""
    left = spark.range(10_000).select(F.col("id").alias("key"))
    right = spark.range(10_000).select(F.col("id").alias("key"))
    plan = (
        left.join(right, "key")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan
