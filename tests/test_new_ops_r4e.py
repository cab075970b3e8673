"""Round-4e operator tests: content-defined substring dedup and friends."""

import pandas as pd
import pytest

from pyspark.sql import functions as F


PASSAGE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronauts calibrate the auxiliary navigation array before "
    "the long descent through the crimson atmosphere begins"
)


def test_substring_pairs_survive_offset_shift(spark):
    """The planted passage sits at DIFFERENT offsets in docs 1 and 2
    (stride-aligned windows would never line up) and is absent from
    doc 3; content-defined anchors must pair (1,2) and nothing else."""
    from vectrain_spark.operators.dedup import substring_dup_pairs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "intro words first. " + PASSAGE + " trailing remarks",
                    "a very different and much longer preamble than before "
                    "precedes the reused text: " + PASSAGE,
                    "completely unrelated content about maritime law and "
                    "the taxation of eighteenth century shipping manifests "
                    "with no reused passage anywhere inside this document",
                ],
            }
        )
    )
    out = substring_dup_pairs(docs).toPandas()
    assert [(r.a, r.b) for r in out.itertuples()] == [(1, 2)]
    assert out.n_shared.iloc[0] >= 2


def test_substring_posting_cap_drops_boilerplate(spark):
    """A fingerprint shared by more docs than max_posting is cut before
    the self-join: 5 docs sharing one passage produce NO pairs at
    max_posting=4 (the df-cut), all 10 pairs at the default cap."""
    from vectrain_spark.operators.dedup import substring_dup_pairs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(5)),
                "text": [f"unique head {i} then " + PASSAGE for i in range(5)],
            }
        )
    )
    assert substring_dup_pairs(docs, max_posting=4).count() == 0
    assert substring_dup_pairs(docs).count() == 10
