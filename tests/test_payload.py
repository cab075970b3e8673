"""K2 payload coercion: zero defaults, parse-error tagging, abort mode."""

from __future__ import annotations

import pandas as pd
import pytest

from vectrain_spark.operators.payload import coerce_payload, coerce_payload_or_fail

SCHEMA = {"n": "bigint", "x": "double", "ok": "boolean", "tag": "string"}


def _fixture(spark):
    rows = [
        (1, {"n": "42", "x": "3.5", "ok": "true", "tag": "hello"}),  # clean
        (2, {"n": "7"}),  # absent keys -> zero defaults
        (3, {"n": "notanint", "x": "1.0"}),  # parse failure on n
        (4, {}),  # everything absent
        (5, {"ok": "FALSE", "x": "-0.25"}),  # case-insensitive bool
    ]
    return spark.createDataFrame(rows, "doc_id int, payload map<string,string>")


def test_coerce_zero_defaults_and_errors(spark):
    out = (
        coerce_payload(_fixture(spark), SCHEMA)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, ["n", "x", "ok", "tag"]].tolist() == [42, 3.5, True, "hello"]
    assert out.loc[1, ["n", "x", "ok", "tag"]].tolist() == [7, 0.0, False, ""]
    assert out.loc[2, "n"] == 0 and out.loc[2, "error"] == "parse_error:n"
    assert out.loc[3, ["n", "x", "ok", "tag"]].tolist() == [0, 0.0, False, ""]
    assert out.loc[4, "ok"] == False and out.loc[4, "x"] == -0.25  # noqa: E712
    assert out["error"].notna().sum() == 1  # only the planted failure
    # payload column is consumed, declared columns are typed
    assert "payload" not in out.columns
    assert str(out["n"].dtype) == "int64" and str(out["x"].dtype) == "float64"


def test_coerce_non_strict_zero_fills_silently(spark):
    out = coerce_payload(_fixture(spark), SCHEMA, strict=False).toPandas()
    assert "error" not in out.columns
    assert out.loc[out["doc_id"] == 3, "n"].iloc[0] == 0


def test_coerce_or_fail_aborts_on_parse_error(spark):
    with pytest.raises(ValueError, match="parse_error:n"):
        coerce_payload_or_fail(_fixture(spark), SCHEMA)
    clean = _fixture(spark).filter("doc_id <> 3")
    out = coerce_payload_or_fail(clean, SCHEMA)
    assert out.count() == 4 and "error" not in out.columns


def test_coerce_rejects_unknown_type(spark):
    with pytest.raises(ValueError, match="unsupported declared type"):
        coerce_payload(_fixture(spark), {"n": "struct<a:int>"})
