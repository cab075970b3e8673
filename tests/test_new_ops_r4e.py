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


def test_c4_filters_verdicts(spark):
    from vectrain_spark.operators.textclean import c4_filters

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "A first proper sentence ends here.\nshort\n"
                    "Another good sentence follows!\nAnd a third one?",
                    "Enable javascript to continue reading this page.\n"
                    "Only one proper sentence remains here.",
                    "lorem ipsum dolor sit amet fills this doc.\n"
                    "A fine sentence one.\nA fine sentence two!\nA fine three?",
                    "var f = function() { return 1; }\nGood sentence one.\n"
                    "Good sentence two!\nGood sentence three?",
                ],
            }
        )
    )
    out = c4_filters(docs).toPandas().set_index("doc_id")
    assert bool(out.loc[1].keep) and out.loc[1].n_kept == 3
    # javascript line dropped -> only 1 kept line -> doc fails
    assert out.loc[2].n_kept == 1 and not bool(out.loc[2].keep)
    assert bool(out.loc[3].has_lorem) and not bool(out.loc[3].keep)
    assert bool(out.loc[4].has_brace) and not bool(out.loc[4].keep)


def test_robots_filter_prefix_semantics(spark):
    from vectrain_spark.operators.webcorpus import robots_filter

    frontier = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "https://a.example/private/page1",
                    "https://a.example/public/page2",
                    "https://b.example/private/page3",  # b has no rules
                    "https://a.example/priv",           # shorter than prefix
                ]
            }
        )
    )
    rules = spark.createDataFrame(
        pd.DataFrame({"host": ["a.example"], "prefix": ["/private"]})
    )
    got = sorted(r.url for r in robots_filter(frontier, rules).collect())
    assert got == [
        "https://a.example/priv",
        "https://a.example/public/page2",
        "https://b.example/private/page3",
    ]


def test_kmv_set_ops_small_sets_are_exact(spark):
    """Below k the merged sketch has seen everything: union is exact and
    the intersection estimate equals the true intersection."""
    from vectrain_spark.operators.sketch import kmv_set_ops

    rows = [("A", f"v{i}") for i in range(40)] + [
        ("B", f"v{i}") for i in range(20, 70)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["sid", "v"]))
    out = kmv_set_ops(df, "sid", "v").toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.est_union == 70 and r.est_inter == 20
    assert abs(r.jaccard_est - 20 / 70) < 1e-6


def test_degree_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: every edge pairs the
    hub (deg n) with a leaf (deg 1) -> r = -1 exactly."""
    from vectrain_spark.operators.graph import degree_assortativity

    # star alone has zero variance once symmetrized? no: stubs are
    # (n,1) and (1,n) mirrored -> r = -1; add no extra edges
    pairs = spark.createDataFrame(
        pd.DataFrame({"a": [0, 0, 0, 0], "b": [1, 2, 3, 4]})
    )
    out = degree_assortativity(pairs).collect()[0]
    assert out.n_edges == 4 and out.r == -1.0


def test_readability_monotone_in_complexity(spark):
    from vectrain_spark.operators.textstats import readability

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "The cat sat. The dog ran. It was fun.",
                    "Extraordinarily convoluted administrative prerequisites "
                    "necessitate interdepartmental coordination procedures.",
                    "no punctuation at all here",
                ],
            }
        )
    )
    out = readability(docs).toPandas().set_index("doc_id")
    assert out.loc[1].flesch > out.loc[2].flesch
    assert out.loc[3].n_sentences == 1  # floored, stays finite


def test_schema_evolution_rename_add_and_guards(spark, tmp_path):
    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    b1 = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "size": [10, 20]})
    )
    s1 = cat.write_evolving("t", b1, mode="replace")
    cat.rename_column("t", "size", "length")
    cat.add_column("t", "score", "double", default=0.5)
    b2 = spark.createDataFrame(
        pd.DataFrame({"id": [3], "length": [30], "score": [0.9]})
    )
    cat.write_evolving("t", b2)

    got = (
        cat.read_evolved(spark, "t").toPandas().sort_values("id").reset_index(drop=True)
    )
    assert list(got.columns) == ["id", "length", "score"]
    assert got.length.tolist() == [10, 20, 30]
    assert got.score.tolist() == [0.5, 0.5, 0.9]

    # time travel to the pre-evolution snapshot sees the original name
    old = cat.read_evolved(spark, "t", snapshot_id=s1)
    assert list(old.columns) == ["id", "size"]

    # guards: stale-schema append, double rename, duplicate add
    with pytest.raises(ValueError, match="use rename_column"):
        cat.write_evolving("t", b1)  # still says 'size'
    with pytest.raises(ValueError, match="no column"):
        cat.rename_column("t", "size", "width")
    with pytest.raises(ValueError, match="already exists"):
        cat.add_column("t", "score", "double")
