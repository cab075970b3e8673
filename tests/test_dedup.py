"""Dedup operators: exact, MinHash+LSH, SimHash — vs brute-force baselines."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vectrain_spark.operators.dedup import (
    dedup_corpus,
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash_docs,
    simhash_pairs,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return dedup_corpus(spark.read.parquet(DOCS)).cache()


def _shingles(text: str, n: int = 3) -> set[str]:
    w = " ".join(text.lower().split()).split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_exact_dedup(spark, corpus):
    out = exact_dedup(corpus).toPandas()
    pdf = corpus.toPandas()
    # every base doc has exactly one planted exact copy (+1e6)
    n_docs = (pdf["doc_id"] < 1000000).sum()
    assert (out["dup_cnt"] >= 2).sum() == n_docs
    # for every duplicate group the survivor is the min id = the original
    assert (out.loc[out["dup_cnt"] >= 2, "keep_id"] < 1000000).all()
    assert out["dup_cnt"].sum() == len(pdf)


def test_minhash_equals_bruteforce(spark, corpus):
    got = {
        (r["a"], r["b"]): r["jaccard"] for r in minhash_pairs(corpus).collect()
    }
    pdf = corpus.toPandas()
    sh = {int(d): _shingles(t) for d, t in zip(pdf["doc_id"], pdf["text"])}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
        if j >= 0.8:
            want[(a, b)] = j
    assert got == want
    assert want  # fixture actually plants near-dups


def _bruteforce_jaccard(pdf: pd.DataFrame, threshold: float) -> dict:
    sh = {int(d): _shingles(t) for d, t in zip(pdf["doc_id"], pdf["text"])}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        if not sh[a] or not sh[b]:
            continue
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
        if j >= threshold:
            want[(a, b)] = j
    return want


def test_ngram_jaccard_exact_vs_bruteforce(spark, corpus):
    """Prefix-filtered join must be EXACT — set-equal to brute force, not
    just high recall."""
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus).collect()
    }
    want = _bruteforce_jaccard(corpus.toPandas(), 0.8)
    assert got == want
    assert want  # fixture actually plants near-dups


def test_ngram_jaccard_exact_at_low_threshold(spark, corpus):
    """t=0.5 exercises longer prefixes and the length filter across very
    different set sizes — exactness must hold at any threshold."""
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    want = _bruteforce_jaccard(corpus.toPandas(), 0.5)
    assert got == want


def test_simhash_pairs_equal_bruteforce(spark, corpus):
    got = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(corpus).collect()}
    sims = {r["doc_id"]: r["simhash"] for r in simhash_docs(corpus).collect()}
    want = {}
    for a, b in itertools.combinations(sorted(sims), 2):
        h = bin(sims[a] ^ sims[b]).count("1")
        if h <= 3:
            want[(a, b)] = h
    # pigeonhole banding is exact: set equality, not approximate
    assert got == want
    # exact duplicates have hamming 0
    assert all(want[(d, d + 1000000)] == 0 for d in sims if d + 1000000 in sims and d < 1000000)


def test_simhash_matches_python_md5(spark):
    """Spark conv(md5)/bit math == independent Python reimplementation."""
    import hashlib

    pdf = pd.DataFrame({"doc_id": [1], "text": ["alpha beta gamma alpha"]})
    corpus = spark.createDataFrame(pdf)
    got = simhash_docs(corpus).collect()[0]["simhash"]

    words = "alpha beta gamma alpha".split(" ")
    sums = [0] * 60
    for w in words:
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for j in range(60):
            sums[j] += 1 if (h >> j) & 1 else -1
    want = sum(1 << j for j in range(60) if sums[j] > 0)
    assert got == want


def test_short_docs_never_crash_shingling(spark):
    """Docs with <3 words must yield empty shingle sets (and be excluded
    from minhash/fingerprints), not crash the job with a descending
    F.sequence (regression: INVALID_PARAMETER_VALUE.START)."""
    import pandas as pd

    from vectrain_spark.operators.dedup import shingles_col
    from vectrain_spark.operators.textstats import fingerprints

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["", "one", "two words", "three words here", "a b c d"],
        }
    )
    df = spark.createDataFrame(pdf)
    out = df.select("doc_id", shingles_col().alias("sh")).toPandas()
    sizes = {int(r.doc_id): len(r.sh) for r in out.itertuples()}
    assert sizes == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}
    # minhash pairs: short docs silently excluded, job completes
    assert minhash_pairs(df).collect() == []
    fp = fingerprints(df).toPandas()
    assert set(fp["doc_id"]) == {4, 5}


def test_incremental_minhash_matches_old_and_wave(spark):
    from vectrain_spark.operators.dedup import incremental_minhash_pairs

    base = " ".join(f"tok{i}" for i in range(40))
    old = spark.createDataFrame(
        [(1, base), (2, "totally different words " + " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base + " trailing extra"),       # near-dup of old 1
            (11, base + " trailing extra"),       # near-dup of old 1 AND new 10
            (12, "fresh " + " ".join(f"q{i}" for i in range(30))),  # no match
        ],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]) for r in incremental_minhash_pairs(old, new, 0.8).collect()}
    # 10->1, 11->1 (old matches), 11->10 (same-wave, later keeps earlier);
    # 12 matches nothing; no old-old pairs ever
    assert got == {(10, 1), (11, 1), (11, 10)}


def test_incremental_minhash_precomputed_index_parity(spark):
    """Production path: the old side's (hashed, sigs) index is built once
    with minhash_signature_index and passed per wave — the result must be
    identical to the self-contained form (which re-derives it inline)."""
    from vectrain_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signature_index,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    old = spark.createDataFrame(
        [(1, base), (2, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base + " trailing extra"), (11, base + " trailing extra")],
        "doc_id long, text string",
    )
    hashed, sigs = minhash_signature_index(old)
    hashed, sigs = hashed.persist(), sigs.persist()  # caller-owned lifecycle
    try:
        got = sorted(
            map(tuple, incremental_minhash_pairs(
                old, new, 0.8, old_index=(hashed, sigs)).collect())
        )
        want = sorted(
            map(tuple, incremental_minhash_pairs(old, new, 0.8).collect())
        )
        assert got == want and len(got) > 0
    finally:
        hashed.unpersist()
        sigs.unpersist()


def test_sentence_dup_profile(spark):
    import pandas as pd

    from vectrain_spark.operators.dedup import sentence_dup_profile

    shared = "this sentence appears in two documents verbatim"
    uniq = "a perfectly unique sentence lives only here %d"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    f"{shared}. {uniq % 0}. short",          # short gets filtered
                    f"{shared}. {uniq % 1}",
                    f"{uniq % 2}. {uniq % 2}",                # self-duplicate
                ],
            }
        )
    )
    out = sentence_dup_profile(docs).toPandas().set_index("doc_id")
    assert out.loc[0].n_sentences == 2 and out.loc[0].n_dup == 1
    assert out.loc[1].n_dup == 1
    assert out.loc[2].n_sentences == 2 and out.loc[2].n_dup == 2
    assert out.loc[2].dup_ratio == 1.0
