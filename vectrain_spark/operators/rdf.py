"""RDF / N-Triples serialization of the materialized edge table.

The reference materializes its output as vectors in a Qdrant collection
(internal/app/storages/qdrant/store.go:100-105 upserts points); a
knowledge-graph pipeline's materialize stage additionally needs an
INTEROP surface — the W3C N-Triples line format is the lingua franca
every triple store (Jena, Virtuoso, Blazegraph, Wikidata dumps) bulk-
loads. This operator turns (src, pred, dst, cnt) edges into one
N-Triples line per edge under a deterministic base IRI.

Serialization is pure JVM string concat + literal-replace chains
(whole-stage codegen; no UDF), so a 10^12-edge export is a map-only
stage writable straight to text files, and the DuckDB oracle replays
the identical replace chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = "http://kg.local/"

# the characters N-Triples (W3C RDF 1.1 grammar, IRIREF production)
# forbids raw inside <...> IRIs, percent-encoded. '%' FIRST so already-
# written escapes are not double-escaped; order is part of the contract
# and the oracle replays it verbatim.
_IRI_ESCAPES = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("\\", "%5C"),
]


def _iri_escape(col):
    out = col
    for raw, enc in _IRI_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(enc))
    return out


def to_ntriples(edges: DataFrame, base: str = BASE) -> DataFrame:
    """(subject, predicate, object, cnt, line): each canonical edge as
    its N-Triples serialization ``<s> <p> <o> .`` with entities under
    ``{base}e/`` and predicates under ``{base}p/``, names percent-
    encoded per the IRIREF grammar. ``cnt`` (the triple's evidence
    count) rides along as a plain column for the caller to emit as a
    side table — N-Triples itself carries no weights."""
    s = F.concat(
        F.lit(f"<{base}e/"), _iri_escape(F.col("src").cast("string")), F.lit(">")
    )
    p = F.concat(
        F.lit(f"<{base}p/"), _iri_escape(F.col("pred").cast("string")), F.lit(">")
    )
    o = F.concat(
        F.lit(f"<{base}e/"), _iri_escape(F.col("dst").cast("string")), F.lit(">")
    )
    return edges.select(
        s.alias("subject"),
        p.alias("predicate"),
        o.alias("object"),
        F.col("cnt").cast("long").alias("cnt"),
        F.concat_ws(" ", s, p, o, F.lit(".")).alias("line"),
    )


def ntriples_oracle_sql(edges_sql: str, base: str = BASE) -> str:
    def esc(expr: str) -> str:
        out = expr
        for raw, enc in _IRI_ESCAPES:
            r = raw.replace("'", "''")
            out = f"replace({out}, '{r}', '{enc}')"
        return out

    s = f"'<{base}e/' || {esc('CAST(src AS VARCHAR)')} || '>'"
    p = f"'<{base}p/' || {esc('CAST(pred AS VARCHAR)')} || '>'"
    o = f"'<{base}e/' || {esc('CAST(dst AS VARCHAR)')} || '>'"
    return f"""
WITH e AS MATERIALIZED (SELECT src, pred, dst, cnt FROM ({edges_sql}))
SELECT {s} AS subject,
       {p} AS predicate,
       {o} AS object,
       cnt::BIGINT AS cnt,
       {s} || ' ' || {p} || ' ' || {o} || ' .' AS line
FROM e
"""
