"""Salted join / two-phase aggregate: result parity with the naive forms,
salt-spread verification on a hub-skewed fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectrain_spark.operators.skew import salted_join, two_phase_agg


def _skewed_fact(spark):
    # 10k rows, 90% on one hub key
    return spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("key"),
        (F.col("id") * 3).alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    fact = _skewed_fact(spark)
    build = spark.range(100).select(
        F.col("id").alias("key"), F.concat(F.lit("dim-"), "id").alias("label")
    )
    got = salted_join(fact, build, "key", salt_from=["row_id"], s=8)
    want = fact.join(build, "key")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_spreads_hub_key(spark):
    """The hub key's fact rows must land in every salt bucket — the
    property that turns one straggler reducer into s busy ones."""
    fact = _skewed_fact(spark)
    spread = (
        fact.withColumn(
            "_salt", F.pmod(F.xxhash64("row_id"), F.lit(8)).cast("int")
        )
        .filter(F.col("key") == 7)
        .groupBy("_salt")
        .count()
    ).collect()
    assert len(spread) == 8
    counts = [r["count"] for r in spread]
    assert min(counts) > 0.5 * max(counts)  # roughly even


def test_two_phase_agg_equals_plain_agg(spark):
    fact = _skewed_fact(spark)
    got = two_phase_agg(
        fact,
        "key",
        salt_from=["row_id"],
        aggs={"n": "count(v)", "total": "sum(v)", "lo": "min(v)", "hi": "max(v)"},
    )
    want = fact.groupBy("key").agg(
        F.count("v").alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_rejects_build_preserving_joins(spark):
    """right/full outer would emit each unmatched build row s times (the
    build side is exploded s-fold) — parity would break silently, so the
    operator refuses (ADVICE r2)."""
    import pytest

    fact = _skewed_fact(spark)
    build = spark.range(100).select(F.col("id").alias("key"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(fact, build, "key", salt_from=["row_id"], how=how)
    # fact-preserving joins still work
    n = salted_join(fact, build, "key", salt_from=["row_id"], how="left_semi").count()
    assert n == fact.join(build, "key", "left_semi").count()
