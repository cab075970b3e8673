"""K2 — declared-schema payload coercion over an open map column.

Reference analog: the Qdrant sink receives an open ``map<string,string>``
payload and casts it into the collection's declared typed fields, filling
Go zero values for absent keys and aborting on parse failure
(/root/reference/internal/app/storages/qdrant/store.go:53-89 +
client.go:10-22 ``oneof=int float bool text`` field validation). The Spark
re-expression is a pure Catalyst projection (whole-stage codegen, no
Python):

* ``element_at(payload, field)`` -> ``try_cast`` to the declared type;
* ABSENT key (null lookup)      -> the type's zero default (0 / 0.0 /
  false / '') — the reference's zero-value fill;
* PRESENT but unparsable value  -> strict mode tags the row with a
  ``parse_error:<field>`` error column (the X3 quarantine contract —
  stricter than silently zeroing, matching the reference's abort) while
  still emitting the zero default so downstream schemas stay total;
  non-strict mode zero-fills silently.

Column pruning note: the projection touches only the payload column and the
declared fields, so a parquet scan under it reads nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZEROS = {
    "tinyint": "0",
    "smallint": "0",
    "int": "0",
    "integer": "0",
    "bigint": "0",
    "long": "0",
    "float": "0.0",
    "double": "0.0",
    "boolean": "false",
    "string": "''",
    "date": "'1970-01-01'",
    "timestamp": "'1970-01-01 00:00:00'",
}


def _zero(typ: str) -> Column:
    t = typ.lower()
    if t not in _ZEROS:
        raise ValueError(f"unsupported declared type: {typ}")
    return F.expr(f"CAST({_ZEROS[t]} AS {t})")


def coerce_payload(
    df: DataFrame,
    schema: dict[str, str],
    payload_col: str = "payload",
    strict: bool = True,
) -> DataFrame:
    """Project ``payload_col: map<string,string>`` into typed columns.

    ``schema`` maps field name -> Spark SQL type name. Returns the input
    columns (minus the payload map) plus one typed column per declared
    field; with ``strict=True`` adds an ``error`` column carrying
    ``parse_error:<field>`` for the FIRST declared field whose present
    value failed to parse (null when clean) — route those rows to
    quarantine or fail fast, per the X3/B2 contract.
    """
    out_cols = [F.col(c) for c in df.columns if c != payload_col]
    errors: list[Column] = []
    for field, typ in schema.items():
        raw = F.element_at(F.col(payload_col), F.lit(field))
        cast = raw.try_cast(typ)
        value = F.when(raw.isNull(), _zero(typ)).otherwise(
            F.coalesce(cast, _zero(typ))
        )
        out_cols.append(value.alias(field))
        if strict:
            errors.append(
                F.when(raw.isNotNull() & cast.isNull(), F.lit(f"parse_error:{field}"))
            )
    if strict:
        out_cols.append(F.coalesce(*errors, F.lit(None).cast("string")).alias("error"))
    return df.select(*out_cols)


def coerce_payload_or_fail(
    df: DataFrame, schema: dict[str, str], payload_col: str = "payload"
) -> DataFrame:
    """Strict coercion that ABORTS the job if any row fails to parse — the
    reference's batch-abort semantics (store.go:86-89 returns the error up
    through the pipeline). Prefer routing to quarantine; use this when the
    sink schema must be total."""
    coerced = coerce_payload(df, schema, payload_col, strict=True)
    bad = coerced.filter(F.col("error").isNotNull())
    first = bad.select("error").first()
    if first is not None:
        raise ValueError(f"payload coercion failed: {first['error']}")
    return coerced.drop("error")
