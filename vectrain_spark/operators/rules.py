"""KG schema / rule mining over the materialized edge table.

The reference stops at storing vectors (internal/app/pipeline/
pipeline.go:259-263 embeds and upserts); a knowledge-graph construction
pipeline additionally has to VALIDATE the graph it built — which
predicates behave like keys, which relations are inverses of each other,
which relation paths exist — because those constraints drive both
downstream cleaning (a "functional" predicate with two objects per
subject flags a linking error) and link-prediction features. The
operators here are the standard mining trio:

- :func:`pred_cardinality` — AMIE's functionality / inverse-functionality
  scores (Galarraga et al. 2013): key-constraint discovery.
- :func:`rule_confidence` — AMIE-style closed Horn rules of length 1,
  p(x,y) => q(x,y) and p(x,y) => q(y,x): redundant/inverse relation
  discovery.
- :func:`metapath_counts` — 2-hop relation-path statistics (the Path
  Ranking Algorithm's feature space, Lao & Cohen 2010).

Every operator is a pure DataFrame program over (src, pred, dst) with
exact integer supports and single-division ratios rounded to 6 — fully
reproducible by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pred_cardinality(edges: DataFrame) -> DataFrame:
    """Per-predicate cardinality constraints -> (pred, n_pairs, n_subj,
    n_obj, functionality, inv_functionality).

    functionality(p) = #distinct subjects / #distinct (subject, object)
    pairs — 1.0 means every subject has exactly one object (p behaves
    like a key / N:1 relation); inv_functionality mirrors for objects.
    The AMIE fun/ifun statistics that decide which argument a rule miner
    should corrupt and which linking errors to flag.

    Scale shape: one distinct on the (src, pred, dst) triple (the edge
    table is already distinct per canonical triple) and one map-side-
    combining groupBy(pred) with count + two approx-free count_distincts
    re-expressed as exact two-phase aggregates: count(distinct x) over a
    predicate-keyed group would hold the distinct set per reducer, so we
    pre-distinct (pred, src) / (pred, dst) projections — each a narrow
    shuffle — and count plain rows. Predicate vocabulary is tiny, so the
    final joins broadcast.
    """
    pairs = edges.select("pred", "src", "dst").distinct()
    n_pairs = pairs.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    n_subj = (
        pairs.select("pred", "src")
        .distinct()
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n_subj"))
    )
    n_obj = (
        pairs.select("pred", "dst")
        .distinct()
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n_obj"))
    )
    return (
        n_pairs.join(F.broadcast(n_subj), "pred")
        .join(F.broadcast(n_obj), "pred")
        .select(
            "pred",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_subj").cast("long").alias("n_subj"),
            F.col("n_obj").cast("long").alias("n_obj"),
            F.round(F.col("n_subj") / F.col("n_pairs"), 6).alias(
                "functionality"
            ),
            F.round(F.col("n_obj") / F.col("n_pairs"), 6).alias(
                "inv_functionality"
            ),
        )
    )


def pred_cardinality_oracle_sql(edges_sql: str) -> str:
    return f"""
WITH e AS MATERIALIZED (SELECT DISTINCT pred, src, dst FROM ({edges_sql}))
SELECT pred,
       count(*)::BIGINT AS n_pairs,
       count(DISTINCT src)::BIGINT AS n_subj,
       count(DISTINCT dst)::BIGINT AS n_obj,
       round(count(DISTINCT src) / count(*), 6) AS functionality,
       round(count(DISTINCT dst) / count(*), 6) AS inv_functionality
FROM e GROUP BY pred
"""


def rule_confidence(edges: DataFrame, min_support: int = 1) -> DataFrame:
    """Length-1 closed Horn rules body(x,y) => head(x,y) (kind 'dir')
    and body(x,y) => head(y,x) (kind 'inv') -> (pred_body, pred_head,
    kind, n_body, support, confidence).

    support = #entity pairs satisfying both atoms; confidence =
    support / #pairs satisfying the body (AMIE's standard confidence —
    no PCA correction, which keeps the oracle exact). High-confidence
    'dir' rules surface redundant/implied predicates; 'inv' rules
    surface inverse relations (the schema facts a KG-construction pass
    uses to canonicalize relation direction).

    Scale shape: both supports are self-joins of the distinct edge list
    ON THE FULL (x, y) ENTITY-PAIR KEY — co-partitioned hash joins whose
    key cardinality is the edge count itself, so no hub entity can pivot
    a blow-up (per-key fan-out is bounded by the predicate vocabulary on
    each side, never by a node's degree). Body sizes ride back in via a
    broadcast of the predicate-sized support table.
    """
    pairs = edges.select("pred", "src", "dst").distinct()
    n_body = pairs.groupBy("pred").agg(F.count(F.lit(1)).alias("n_body"))
    b = pairs.select(
        F.col("pred").alias("pred_body"), "src", "dst"
    )
    h_dir = pairs.select(F.col("pred").alias("pred_head"), "src", "dst")
    h_inv = pairs.select(
        F.col("pred").alias("pred_head"),
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
    )
    def _supp(head: DataFrame, kind: str) -> DataFrame:
        return (
            b.join(head, ["src", "dst"])
            .filter(
                (F.col("pred_body") != F.col("pred_head"))
                if kind == "dir"
                else F.lit(True)
            )
            .groupBy("pred_body", "pred_head")
            .agg(F.count(F.lit(1)).alias("support"))
            .withColumn("kind", F.lit(kind))
        )
    supp = _supp(h_dir, "dir").unionByName(_supp(h_inv, "inv"))
    nb = F.broadcast(n_body).withColumnRenamed("pred", "pred_body")
    return (
        supp.filter(F.col("support") >= min_support)
        .join(nb, "pred_body")
        .select(
            "pred_body",
            "pred_head",
            "kind",
            F.col("n_body").cast("long").alias("n_body"),
            F.col("support").cast("long").alias("support"),
            F.round(F.col("support") / F.col("n_body"), 6).alias(
                "confidence"
            ),
        )
    )


def rule_confidence_oracle_sql(edges_sql: str, min_support: int = 1) -> str:
    return f"""
WITH e AS MATERIALIZED (SELECT DISTINCT pred, src, dst FROM ({edges_sql})),
nb AS (SELECT pred, count(*) AS n_body FROM e GROUP BY pred),
supp AS (
  SELECT b.pred AS pred_body, h.pred AS pred_head, 'dir' AS kind,
         count(*) AS support
  FROM e b JOIN e h ON h.src = b.src AND h.dst = b.dst AND h.pred <> b.pred
  GROUP BY 1, 2
  UNION ALL
  SELECT b.pred, h.pred, 'inv', count(*)
  FROM e b JOIN e h ON h.src = b.dst AND h.dst = b.src
  GROUP BY 1, 2
)
SELECT pred_body, pred_head, kind, nb.n_body::BIGINT AS n_body,
       support::BIGINT AS support,
       round(support / nb.n_body, 6) AS confidence
FROM supp JOIN nb ON nb.pred = supp.pred_body
WHERE support >= {min_support}
"""


def metapath_counts(
    edges: DataFrame, max_mid_degree: int | None = None
) -> DataFrame:
    """2-hop relation-path statistics: for every ordered predicate pair,
    the number of path instances x -pred_a-> m -pred_b-> y and the
    number of distinct (x, y) endpoint pairs they connect ->
    (pred_a, pred_b, n_paths, n_pairs). The feature space of the Path
    Ranking Algorithm (Lao & Cohen 2010) and the raw material for
    length-2 rule mining.

    Scale shape: the path join pivots on the MIDDLE entity, so an
    unbounded hub mid with in-degree d_in and out-degree d_out emits
    d_in * d_out rows — the same wedge explosion triangle counting
    caps. ``max_mid_degree`` is that cap, IMPLEMENTED: mids whose total
    (in + out) distinct-edge degree exceeds it are excluded from path
    enumeration (the standard PRA practice of dropping ultra-hub
    intermediates, which contribute no discriminative path evidence).
    The degree pre-filter is one aggregate + a co-partitioned semi-join;
    with the cap set, per-mid fan-out is bounded by cap^2. The gate runs
    with a cap and mirrors the identical filter in its oracle, so the
    capped path is what correctness verifies. n_pairs uses a two-phase
    distinct (project-distinct then count) keyed by the pair, never a
    per-group distinct set.
    """
    e = edges.select("pred", "src", "dst").distinct()
    if max_mid_degree is not None:
        deg = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") <= max_mid_degree)
            .select("id")
        )
        a = e.join(deg.withColumnRenamed("id", "dst"), "dst", "left_semi")
        b = e.join(deg.withColumnRenamed("id", "src"), "src", "left_semi")
    else:
        a, b = e, e
    paths = a.select(
        F.col("pred").alias("pred_a"),
        F.col("src").alias("x"),
        F.col("dst").alias("m"),
    ).join(
        b.select(
            F.col("pred").alias("pred_b"),
            F.col("src").alias("m"),
            F.col("dst").alias("y"),
        ),
        "m",
    )
    n_paths = paths.groupBy("pred_a", "pred_b").agg(
        F.count(F.lit(1)).alias("n_paths")
    )
    n_pairs = (
        paths.select("pred_a", "pred_b", "x", "y")
        .distinct()
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return n_paths.join(n_pairs, ["pred_a", "pred_b"]).select(
        "pred_a",
        "pred_b",
        F.col("n_paths").cast("long").alias("n_paths"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
    )


def metapath_oracle_sql(
    edges_sql: str, max_mid_degree: int | None = None
) -> str:
    if max_mid_degree is not None:
        deg = f"""
deg AS (
  SELECT id FROM (
    SELECT id, count(*) AS deg FROM (
      SELECT src AS id FROM e UNION ALL SELECT dst FROM e
    ) GROUP BY id
  ) WHERE deg <= {max_mid_degree}
),
a AS (SELECT * FROM e WHERE dst IN (SELECT id FROM deg)),
b AS (SELECT * FROM e WHERE src IN (SELECT id FROM deg)),"""
    else:
        deg = """
a AS (SELECT * FROM e),
b AS (SELECT * FROM e),"""
    return f"""
WITH e AS MATERIALIZED (SELECT DISTINCT pred, src, dst FROM ({edges_sql})),{deg}
paths AS MATERIALIZED (
  SELECT a.pred AS pred_a, b.pred AS pred_b, a.src AS x, b.dst AS y
  FROM a JOIN b ON b.src = a.dst
)
SELECT pred_a, pred_b, count(*)::BIGINT AS n_paths,
       count(DISTINCT (x, y))::BIGINT AS n_pairs
FROM paths GROUP BY pred_a, pred_b
"""


def pred_reciprocity(edges: DataFrame) -> DataFrame:
    """Per-predicate reciprocity / symmetry profile -> (pred, n_pairs,
    n_loops, n_sym, n_inv_any, sym_ratio, inv_ratio).

    For each predicate p over the distinct edge set:
      - n_pairs: distinct (src, dst) pairs under p;
      - n_loops: self-loop pairs (src == dst) — trivially symmetric, so
        they are reported separately rather than inflating sym_ratio;
      - n_sym: non-loop pairs whose REVERSE pair also exists under the
        SAME predicate — the symmetry support (a symmetric relation like
        'partnersWith' scores ~1.0, a functional one ~0.0);
      - n_inv_any: non-loop pairs whose reverse exists under ANY
        predicate — the inverse-pair support that, read together with
        :func:`rule_confidence`'s p(x,y) => q(y,x) rules, tells relation
        canonicalization which predicates to fold into one direction.

    sym_ratio / inv_ratio divide by the non-loop pair count (rounded to
    6). This is the schema statistic KG-embedding model selection keys
    on: high-symmetry graphs favor DistMult-family bilinear scorers,
    antisymmetric ones TransE-family (see :func:`graph.distmult_scores`).

    Scale shape: the reverse-existence checks are LEFT SEMI equi-joins
    of the distinct pair set against its own (dst, src) projection —
    co-partitioned shuffles keyed on both endpoints, so no wedge or
    hub explosion is possible (contrast neighbor_jaccard, which needs a
    degree cap); the rollup is one map-side-combining groupBy(pred).
    """
    pairs = edges.select("pred", "src", "dst").distinct()
    nonloop = pairs.filter(F.col("src") != F.col("dst"))
    rev_same = nonloop.select(
        "pred", F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    rev_any = (
        nonloop.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .distinct()
    )
    sym = (
        nonloop.join(rev_same, ["pred", "src", "dst"], "left_semi")
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n_sym"))
    )
    inv = (
        nonloop.join(rev_any, ["src", "dst"], "left_semi")
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n_inv_any"))
    )
    base = pairs.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_loops"),
    )
    return (
        base.join(F.broadcast(sym), "pred", "left")
        .join(F.broadcast(inv), "pred", "left")
        .select(
            "pred",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_loops").cast("long").alias("n_loops"),
            F.coalesce("n_sym", F.lit(0)).cast("long").alias("n_sym"),
            F.coalesce("n_inv_any", F.lit(0)).cast("long").alias("n_inv_any"),
            F.when(
                F.col("n_pairs") > F.col("n_loops"),
                F.round(
                    F.coalesce("n_sym", F.lit(0))
                    / (F.col("n_pairs") - F.col("n_loops")),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("sym_ratio"),
            F.when(
                F.col("n_pairs") > F.col("n_loops"),
                F.round(
                    F.coalesce("n_inv_any", F.lit(0))
                    / (F.col("n_pairs") - F.col("n_loops")),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("inv_ratio"),
        )
    )


def pred_reciprocity_oracle_sql(edges_sql: str) -> str:
    return f"""
WITH e AS MATERIALIZED (SELECT DISTINCT pred, src, dst FROM ({edges_sql})),
nl AS MATERIALIZED (SELECT * FROM e WHERE src <> dst),
rev AS (SELECT DISTINCT dst AS src, src AS dst FROM nl),
sym AS (
  SELECT pred, count(*) AS n_sym FROM nl
  WHERE EXISTS (SELECT 1 FROM nl r
                WHERE r.pred = nl.pred AND r.src = nl.dst AND r.dst = nl.src)
  GROUP BY pred
),
inv AS (
  SELECT pred, count(*) AS n_inv_any FROM nl
  WHERE EXISTS (SELECT 1 FROM rev r
                WHERE r.src = nl.src AND r.dst = nl.dst)
  GROUP BY pred
),
base AS (
  SELECT pred, count(*) AS n_pairs,
         sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS n_loops
  FROM e GROUP BY pred
)
SELECT base.pred AS pred,
       n_pairs::BIGINT AS n_pairs,
       n_loops::BIGINT AS n_loops,
       coalesce(n_sym, 0)::BIGINT AS n_sym,
       coalesce(n_inv_any, 0)::BIGINT AS n_inv_any,
       CASE WHEN n_pairs > n_loops
            THEN round(coalesce(n_sym, 0) / (n_pairs - n_loops), 6)
            ELSE 0.0 END AS sym_ratio,
       CASE WHEN n_pairs > n_loops
            THEN round(coalesce(n_inv_any, 0) / (n_pairs - n_loops), 6)
            ELSE 0.0 END AS inv_ratio
FROM base
LEFT JOIN sym ON sym.pred = base.pred
LEFT JOIN inv ON inv.pred = base.pred
"""


def characteristic_sets(edges: DataFrame) -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011) over the
    edge table -> (cset, n_preds, n_entities, n_triples, avg_deg).

    A subject's characteristic set is the SET of predicates it appears
    with — the emergent "type" of schema-less RDF. Grouping subjects by
    identical predicate sets yields the structure summary every RDF
    store builds for cardinality estimation and implicit-schema
    discovery: how many entity shapes exist, how populous each is, and
    the average out-degree inside each shape. For the KG build, shapes
    with suspiciously few members are linking/extraction error
    candidates (a 'Vendor' missing half its predicates), and the shape
    count itself tracks schema drift across crawls.

    Determinism: the set is canonicalized by sort_array before the
    comma join, so partition order never leaks; counts are exact
    integers and the single avg division is rounded to 6.

    Scale shape (100 TB): two hash aggregations — distinct triples
    group by subject (carrying a collect_set bounded by the PREDICATE
    VOCABULARY, never by degree), then group by the set string, whose
    cardinality is at most 2^|preds| but in practice tiny (real RDF:
    a few thousand sets over billions of triples — the paper's own
    finding). No joins, no windows, map-side combine on both levels.
    """
    e = edges.select("src", "pred", "dst").distinct()
    per = e.groupBy("src").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("pred"))).alias("cset"),
        F.count(F.lit(1)).alias("deg"),
    )
    return (
        per.groupBy("cset")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum("deg").alias("n_triples"),
            F.round(F.sum("deg") / F.count(F.lit(1)), 6).alias("avg_deg"),
        )
        .withColumn("n_preds", F.size(F.split(F.col("cset"), ",")))
        .select("cset", "n_preds", "n_entities", "n_triples", "avg_deg")
    )


def characteristic_sets_oracle_sql(edges_sql: str) -> str:
    """DuckDB reconstruction of characteristic_sets."""
    return f"""
WITH e AS MATERIALIZED (SELECT DISTINCT src, pred, dst FROM ({edges_sql})),
per AS (
  SELECT src,
         array_to_string(list_sort(list(DISTINCT pred)), ',') AS cset,
         count(*) AS deg
  FROM e GROUP BY src
)
SELECT cset,
       len(string_split(cset, ','))::INTEGER AS n_preds,
       count(*)::BIGINT AS n_entities,
       sum(deg)::BIGINT AS n_triples,
       round(sum(deg) / count(*), 6) AS avg_deg
FROM per GROUP BY cset
"""
