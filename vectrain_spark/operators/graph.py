"""Graph analytics over the materialized KG edge table: PageRank and
k-hop neighborhood expansion.

The reference delegates every post-ingest query to Qdrant (it only
*writes* the index, /root/reference/internal/app/storages/qdrant/
store.go:40-49); the north_star materializes an adjacency/edge table
instead — these operators are the query surface that table exists for.

Scale design:
* PageRank is the canonical iterative-DataFrame-join workload: the edge
  table is hash-partitioned on ``src`` ONCE and persisted, so every
  iteration's contribution join reuses the same partitioning (one-time
  shuffle, then per-iteration joins co-locate); the per-``dst`` sum is a
  two-phase aggregate (map-side partial combine collapses hub fan-in
  before the exchange — the skew answer for algebraic aggregates);
  ``localCheckpoint`` truncates the lineage so the plan stays flat
  across iterations instead of growing exponentially.
* k-hop is two self-joins with the seed side broadcast — at web scale
  seeds are a handful of entities, so no shuffle touches the edge table
  beyond its own partitioning.

Determinism / oracle parity: ranks are rounded to 8 decimals per
iteration (both engines then iterate on IDENTICAL doubles — the 1e-16
summation-order noise can never compound) and 6 decimals on output,
matching the unrolled-CTE DuckDB oracle built by
:func:`pagerank_oracle_sql`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
N_ITER = 5
ITER_ROUND = 8
OUT_ROUND = 6


def pagerank(
    edges: DataFrame,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    weight: str | None = None,
) -> DataFrame:
    """(src, dst[, ...]) directed edges -> (id, rank) after ``n_iter``
    synchronous iterations of rank(v) = (1-d) + d * sum(rank(u)/outdeg(u)).

    Uses the non-normalized formulation (ranks sum to ~|V|, dangling mass
    is dropped) — the classic iterative-join PageRank; deterministic given
    the edge set.

    ``weight`` names an edge-weight column (e.g. the KG's triple count):
    each out-edge then carries rank * w / total_out_weight(src) instead of
    an equal share; parallel edges are pre-summed per (src, dst).
    """
    if weight is None:
        e = edges.select("src", "dst").distinct().withColumn("w", F.lit(1.0))
    else:
        e = edges.groupBy("src", "dst").agg(
            F.sum(F.col(weight).cast("double")).alias("w")
        )
    # one-time partitioning by src: every iteration's contribution join
    # then co-locates without further exchanges of the edge table.
    # Partition count adapts to the edge count (one cheap count on the
    # pre-aggregated edge set): entity graphs distilled from a corpus are
    # often orders of magnitude smaller than the corpus itself, and 5
    # iterations x several exchanges of empty 32-way partitions is pure
    # scheduler overhead — while a web-scale edge set still fans out to
    # the session's full parallelism.
    spark = edges.sparkSession
    n_edges = e.count()
    parts = max(
        1, min(spark.sparkContext.defaultParallelism, n_edges // 50_000 + 1)
    )
    e = e.repartition(parts, "src").persist()
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outw")).persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    base = 1.0 - damping
    for _ in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .select("dst", (F.col("rank") * F.col("w") / F.col("outw")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce("s", F.lit(0.0)),
                    ITER_ROUND,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    out = ranks.select("id", F.round("rank", OUT_ROUND).alias("rank"))
    e.unpersist()
    outdeg.unpersist()
    nodes.unpersist()
    return out


def pagerank_oracle_sql(
    edges_sql: str,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    weight_sql: str | None = None,
) -> str:
    """Unrolled-CTE DuckDB reconstruction of :func:`pagerank`.

    ``edges_sql`` must select (src, dst[, weight col]). Each iteration is
    one CTE level with the identical per-iteration rounding.
    ``weight_sql`` names the weight column for the weighted variant.
    """
    base = 1.0 - damping
    if weight_sql is None:
        e_cte = f"e AS (SELECT src, dst, 1.0::DOUBLE AS w FROM (SELECT DISTINCT src, dst FROM ({edges_sql})))"
    else:
        e_cte = (
            f"e AS (SELECT src, dst, sum({weight_sql})::DOUBLE AS w"
            f" FROM ({edges_sql}) GROUP BY src, dst)"
        )
    parts = [
        e_cte,
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "od AS (SELECT src, sum(w) AS outw FROM e GROUP BY src)",
        "r0 AS (SELECT id, 1.0::DOUBLE AS rank FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.id,
         round({base} + {damping} * coalesce(c.s, 0.0), {ITER_ROUND}) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(r.rank * e.w / od.outw) AS s
    FROM e JOIN r{i-1} r ON r.id = e.src JOIN od ON od.src = e.src
    GROUP BY e.dst
  ) c ON c.dst = n.id
)"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT id, round(rank, {OUT_ROUND}) AS rank FROM r{n_iter}"
    )


def co_mentions(edges: DataFrame) -> DataFrame:
    """Co-citation similarity over the KG edge table: pairs of target
    entities that share at least one source, with the shared-source count
    and the Jaccard of their in-neighbor sets — the classic
    related-entity / "customers also bought" signal, and the directed
    graph's stand-in for triangle counting (the KG edge table is
    near-bipartite subject->object, so literal triangles are vacuous).

    -> (a, b, common, jaccard) with a < b.

    Scale design: one self-join of the distinct (src, dst) edge set on
    src — the output per source is outdeg^2/2, so hub SOURCES dominate
    cost. For a web KG out-degree is bounded by the predicate vocabulary
    (vs in-degree, which is the unbounded hub axis — popular entities),
    making src the cheap join side by construction; a corpus with
    unbounded out-degree would cap or sample per-src fanout first. The
    in-degree table is entity-sized and broadcast onto the pair list.
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (
        e.select("src", F.col("dst").alias("a"))
        .join(e.select("src", F.col("dst").alias("b")), "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    deg_a = F.broadcast(deg.select(F.col("dst").alias("a"), F.col("deg").alias("deg_a")))
    deg_b = F.broadcast(deg.select(F.col("dst").alias("b"), F.col("deg").alias("deg_b")))
    return (
        pairs.join(deg_a, "a")
        .join(deg_b, "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def k_hop(edges: DataFrame, seeds: DataFrame, k: int = 2) -> DataFrame:
    """BFS frontier expansion: (seed, node, hops) for every node reachable
    from a seed in 1..k directed hops, hops = the MINIMUM distance.

    The seed frontier is broadcast each hop (seeds are query-sized); the
    edge table is only ever the probe side of the join.
    """
    e = edges.select("src", "dst").distinct()
    frontier = seeds.select(F.col("seed"), F.col("seed").alias("node"))
    reached = None
    for hop in range(1, k + 1):
        frontier = (
            F.broadcast(frontier.select("seed", F.col("node").alias("src")))
            .join(e, "src")
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        step = frontier.select("seed", "node", F.lit(hop).cast("int").alias("hops"))
        reached = step if reached is None else reached.unionAll(step)
    return (
        reached.groupBy("seed", "node")
        .agg(F.min("hops").alias("hops"))
        .filter(F.col("seed") != F.col("node"))
    )
