"""Explicit skew handling: salted joins and two-phase aggregates.

The north rule demands partitioning/shuffle/skew handled explicitly. Most
of the engine gets skew-safety structurally — algebraic aggregates
(map-side partial combine IS the salting answer for count/min/sum) and
AQE skew-join splitting — but AQE only splits SORT-MERGE join partitions
at runtime; an iterative or pre-AQE context (or a deliberately
partitioned join whose partitioning must be preserved) sometimes needs
the classic manual construction. These utilities make it first-class:

* :func:`salted_join` — fact rows get a deterministic salt in [0, s);
  the (small-ish but not broadcastable) build side is exploded s-fold
  with every salt value; the join key becomes (key, salt), so a hub key's
  rows spread over s reducers instead of one straggler.
* :func:`two_phase_agg` — pre-aggregate on (key, salt), then finish on
  key: the first exchange carries at most s rows per hot key.

Both are result-identical to their naive forms (asserted in
tests/test_skew.py) and deterministic: the salt comes from xxhash64 of
the fact row's own columns, never from rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    key: str,
    salt_from: list[str],
    s: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (huge, skewed on ``key``) with ``build`` (too big to
    broadcast, small enough to explode s-fold) on ``key``.

    ``salt_from`` names fact columns whose hash spreads a hot key's rows
    across salts (use a unique row id; using ``key`` itself would put the
    whole hub back on one reducer). Result == fact.join(build, key, how)
    with the salt column dropped.

    ``how`` is restricted to the fact-preserving joins (inner, left,
    left_semi, left_anti, cross): the construction explodes every build
    row s-fold, so any join that must preserve UNMATCHED build rows
    (right/full outer) would emit each of them s times — parity with the
    naive join breaks silently. Those joins raise instead.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving — the s-fold "
            "exploded build side would duplicate unmatched build rows "
            "(use inner/left/left_semi/left_anti)"
        )
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(s))
    f = fact.withColumn("_salt", salt.cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(s)]))
    )
    return f.join(b, [key, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    salt_from: list[str],
    aggs: dict[str, str],
    s: int = 16,
) -> DataFrame:
    """Skew-proof groupBy(key) for ALGEBRAIC aggregates: sum/count/min/max
    run once per (key, salt) and once more per key. ``aggs`` maps output
    column -> 'fn(col)' with fn in {sum, count, min, max}.

    (Spark's own hash aggregate already partial-combines map-side, which
    covers most skew; the explicit form exists for when the first pass
    must ALSO bound reducer-side state, e.g. feeding an iterative loop
    that repartitions by key.)
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refin = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    parsed = {}
    for out, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(")
        assert fn in fns, f"non-algebraic aggregate {fn}"
        parsed[out] = (fn, col)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(s))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[fns[fn](col).alias(out) for out, (fn, col) in parsed.items()])
    )
    return phase1.groupBy(key).agg(
        *[refin[fn](out).alias(out) for out, (fn, _) in parsed.items()]
    )
