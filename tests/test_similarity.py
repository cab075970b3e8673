"""Similarity search: exact kNN baseline + IVF recall."""

from __future__ import annotations

import numpy as np
import pytest

from vectrain_spark.operators.similarity import ann_ivf, knn_bruteforce

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


def _numpy_topk(pdf, n_queries=10, k=5):
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for qi in range(len(ids)):
        if ids[qi] >= n_queries:
            continue
        sims = (mat @ mat[qi]) / (norms * norms[qi])
        order = [
            (round(-s, 6), i)
            for s, i in zip(sims, ids)
            if i != ids[qi]
        ]
        order.sort(key=lambda t: (t[0], t[1]))
        out[int(ids[qi])] = [int(i) for _, i in order[:k]]
    return out


def test_knn_matches_numpy(spark, emb):
    got = knn_bruteforce(emb).toPandas()
    want = _numpy_topk(emb.toPandas())
    for q_id, grp in got.groupby("q_id"):
        ordered = grp.sort_values("rank")["n_id"].tolist()
        assert ordered == want[int(q_id)], q_id
    assert set(got["q_id"].unique()) == set(want)
    # scores are valid cosines
    assert got["score"].between(-1.000001, 1.000001).all()


def test_ann_ivf_recall(spark, emb):
    exact = knn_bruteforce(emb, n_queries=10, k=5).toPandas()
    approx = ann_ivf(spark, emb, n_queries=10, k=5, n_cells=16, n_probe=8).toPandas()
    hits = tot = 0
    for q in exact["q_id"].unique():
        e = set(exact.loc[exact.q_id == q, "n_id"])
        a = set(approx.loc[approx.q_id == q, "n_id"])
        hits += len(e & a)
        tot += len(e)
    recall = hits / tot
    # probing half the cells on clustered data: well above chance; bound is
    # intentionally loose (approximate operator), exactness is the baseline's job
    assert recall >= 0.5, recall


def test_embedding_near_dups_lsh_recall(spark, emb):
    from vectrain_spark.operators.similarity import (
        embedding_near_dups_exact,
        embedding_near_dups_lsh,
        neardup_embedding_corpus,
    )

    corpus = neardup_embedding_corpus(emb).cache()
    exact = {(r["a"], r["b"]): r["score"] for r in embedding_near_dups_exact(corpus).collect()}
    lsh = {(r["a"], r["b"]): r["score"] for r in embedding_near_dups_lsh(spark, corpus).collect()}
    assert exact  # planted dups exist
    # precision is exact (scores verified); recall near-1 by banding math
    assert set(lsh) <= set(exact) or all(lsh[k] >= 0.9 for k in lsh)
    recall = len(set(lsh) & set(exact)) / len(exact)
    assert recall >= 0.99, recall
    # scores agree exactly on shared pairs (same float64 expression)
    assert all(exact[k] == lsh[k] for k in set(lsh) & set(exact))


def test_ann_ivf_deterministic(spark, emb):
    a = ann_ivf(spark, emb).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    b = ann_ivf(spark, emb.repartition(7)).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_maxsim_matches_python_oracle(spark):
    import numpy as np

    from vectrain_spark.operators.similarity import maxsim_topk

    rng = np.random.RandomState(7)
    vecs = rng.rand(24, 8).astype("float32")  # 6 docs x 4 vectors
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(24)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["q_doc"], r["rank"]): (r["doc"], round(r["score"], 6))
        for r in maxsim_topk(df, group=4, n_queries=2, k=2).collect()
    }

    def cos(a, b):
        a, b = a.astype("float64"), b.astype("float64")
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    import itertools

    want = {}
    for qd in range(2):
        scores = []
        for dd in range(6):
            if dd == qd:
                continue
            s = sum(
                max(cos(vecs[qd * 4 + qi], vecs[dd * 4 + di]) for di in range(4))
                for qi in range(4)
            )
            scores.append((dd, round(s, 6)))
        scores.sort(key=lambda t: (-t[1], t[0]))
        for rk, (dd, s) in enumerate(scores[:2], 1):
            want[(qd, rk)] = (dd, s)
    assert got == want


def test_kmeans_refine_improves_balance_not_recall_regression(spark, emb):
    """VERDICT r2 ask #6: seeded Lloyd refinement must (a) stay exactly
    deterministic, (b) measurably reduce cell-size skew vs the raw
    lowest-vec_ids init, (c) not regress recall vs brute force."""
    import numpy as np

    from vectrain_spark.operators.similarity import (
        _vecs,
        assign_cells,
        centroids_df,
        kmeans_refine,
    )

    vecs = _vecs(emb)
    init = centroids_df(emb, 16)
    refined = kmeans_refine(vecs, init, iters=2)

    def sizes(cents):
        pdf = assign_cells(vecs, cents).groupBy("cell").count().toPandas()
        full = np.zeros(16)
        full[pdf["cell"].to_numpy()] = pdf["count"].to_numpy()
        return full

    s0, s1 = sizes(init), sizes(refined)
    assert s0.sum() == s1.sum()  # every vector still lands somewhere
    # skew (relative std of cell sizes) must drop
    assert np.std(s1) < np.std(s0), (np.std(s0), np.std(s1))

    # determinism across partitionings (scaled-integer means)
    r2 = kmeans_refine(_vecs(emb.repartition(5)), init, iters=2)
    a = {r["cell"]: list(r["c_emb"]) for r in refined.collect()}
    b = {r["cell"]: list(r["c_emb"]) for r in r2.collect()}
    assert a == b

    # recall with refinement >= the old floor
    exact = knn_bruteforce(emb, n_queries=10, k=5).toPandas()
    approx = ann_ivf(spark, emb, n_queries=10, k=5, n_cells=16, n_probe=8).toPandas()
    hits = tot = 0
    for q in exact["q_id"].unique():
        e = set(exact.loc[exact.q_id == q, "n_id"])
        hits += len(e & set(approx.loc[approx.q_id == q, "n_id"]))
        tot += len(e)
    assert hits / tot >= 0.5, hits / tot


def test_semantic_dedup_within_cluster_only(spark, emb):
    from pyspark.sql import functions as F

    from vectrain_spark.operators.similarity import (
        assign_cells,
        centroids_df,
        kmeans_refine,
        neardup_embedding_corpus,
        semantic_dedup,
        _vecs,
    )

    corpus = neardup_embedding_corpus(emb)
    out = semantic_dedup(corpus).cache()
    rows = out.collect()
    # every exact copy (vec_id + 100000) lands in the same cluster as its
    # original (identical vector -> identical argbest) and scores 1.0
    exact = {
        (r.a, r.b): r.score
        for r in rows
        if r.a < 100000 and r.b == r.a + 100000
    }
    n_base = corpus.filter(F.col("vec_id") < 100000).count()
    assert len(exact) == n_base and all(s == 1.0 for s in exact.values())
    # pairs never cross clusters: recompute assignment and check
    vecs = _vecs(corpus)
    cents = kmeans_refine(vecs, centroids_df(corpus), iters=2)
    cell_of = {r.vec_id: r.cell for r in assign_cells(vecs, cents).collect()}
    assert all(cell_of[r.a] == cell_of[r.b] == r.cell for r in rows)
    # cheaper than all-pairs: pair count strictly below the n^2 bound
    n = vecs.count()
    assert out.count() < n * (n - 1) // 2
    out.unpersist()


def test_pq_topk_recall_and_codes(spark, emb):
    """PQ ADC ranking: (1) deterministic across runs, (2) recall vs the
    euclid brute-force baseline is well above chance for a 64x-compressed
    representation, (3) every vector gets exactly one code per subspace."""
    from vectrain_spark.operators.similarity import pq_topk

    got = pq_topk(spark, emb).toPandas()
    again = pq_topk(spark, emb).toPandas()
    key = ["q_id", "rank"]
    assert (
        got.sort_values(key).reset_index(drop=True)["n_id"].tolist()
        == again.sort_values(key).reset_index(drop=True)["n_id"].tolist()
    )
    assert set(got.groupby("q_id").size().unique()) == {5}
    exact = knn_bruteforce(emb, n_queries=10, k=5, metric="euclid").toPandas()
    hits = tot = 0
    for q in exact["q_id"].unique():
        e = set(exact.loc[exact.q_id == q, "n_id"])
        a = set(got.loc[got.q_id == q, "n_id"])
        hits += len(e & a)
        tot += len(e)
    # 16 codes x 4 subspaces over sf0.001 (~600 vecs): chance overlap of a
    # 5-list is ~5/600; PQ should land far above that
    assert hits / tot >= 0.2, hits / tot


def test_pq_rejects_indivisible_dims(spark, emb):
    from vectrain_spark.operators.similarity import pq_topk

    with pytest.raises(ValueError):
        pq_topk(spark, emb, m=7)


def test_semantic_dedup_cell_cap_is_exact_and_bounds_blocks(spark, emb):
    """Skewed fixture: duplicate-heavy corpora collapse into one hot
    k-means cell; the cell cap must (1) leave the RESULT bit-identical
    to the uncapped run and (2) bound every slice-block's side size, so
    no single task ever holds the whole hot cell (VERDICT r3 wrong #3)."""
    from pyspark.sql import functions as F

    from vectrain_spark.operators.similarity import (
        _blocked_cell_pairs,
        assign_cells,
        centroids_df,
        kmeans_refine,
        neardup_embedding_corpus,
        semantic_dedup,
        _vecs,
    )

    corpus = neardup_embedding_corpus(emb)
    key = lambda df: sorted(
        (r.cell, r.a, r.b, r.score) for r in df.collect()
    )
    uncapped = key(semantic_dedup(corpus, cell_cap=1 << 30))
    capped = key(semantic_dedup(corpus, cell_cap=8))
    assert capped == uncapped and len(uncapped) > 0
    # per-block bound: with cap=8, no (cell, i, j) block's build side may
    # exceed the cap by more than hash-slice imbalance allows
    vecs = _vecs(corpus)
    cents = kmeans_refine(vecs, centroids_df(corpus), iters=2)
    assigned = vecs.join(assign_cells(vecs, cents), "vec_id")
    cap = 8
    counts = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
    sliced = (
        assigned.join(F.broadcast(counts), "cell")
        .withColumn(
            "_S",
            F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(cap))).cast("int"),
        )
        .withColumn("_s", F.pmod(F.xxhash64("vec_id"), F.col("_S")).cast("int"))
    )
    max_slice = (
        sliced.groupBy("cell", "_s").count().agg(F.max("count")).first()[0]
    )
    hot = counts.agg(F.max("_n")).first()[0]
    assert hot > cap  # the fixture really is skewed
    assert max_slice <= 4 * cap  # bounded per-task side, not the hot cell
    # and the blocked enumeration emits each pair exactly once
    pairs = _blocked_cell_pairs(assigned, cap).select("cell", "a", "b")
    assert pairs.count() == pairs.distinct().count()
