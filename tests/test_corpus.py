"""Corpus-hygiene operators: PII scan/mask, stratified sampling,
per-stratum stats — value-checked against plain-Python references."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from vectrain_spark.operators.corpus import (
    SAMPLE_BUCKETS,
    corpus_stats,
    pii_scan,
    stratified_sample,
)

PII_ROWS = [
    (0, "plain text nothing here"),
    (1, "mail me at jane.doe+spam@mail.example.org today"),
    (2, "server 192.168.0.1 and card 4111 1111 1111 1234"),
    (3, "call +1-555-0199 or +44-020-7946 twice a@b.io"),
    (4, "two mails x@y.co z@w.net and ip 10.0.0.255"),
]


def _mask_py(t: str) -> str:
    t = re.sub(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>", t)
    t = re.sub(r"[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{4}", "<CARD>", t)
    t = re.sub(r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>", t)
    t = re.sub(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>", t)
    return t


def test_pii_scan_counts_and_mask(spark):
    df = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scan(df).collect()}
    want_counts = {
        0: (0, 0, 0, 0),
        1: (1, 0, 0, 0),
        2: (0, 0, 1, 1),
        3: (1, 2, 0, 0),  # '+44-020-7946' matches the phone shape; a@b.io is a mail
        4: (2, 0, 1, 0),
    }
    for doc_id, text in PII_ROWS:
        g = got[doc_id]
        assert (
            g["n_emails"], g["n_phones"], g["n_ips"], g["n_cards"]
        ) == want_counts[doc_id], doc_id
        assert g["masked_hash"] == hashlib.md5(_mask_py(text).encode()).hexdigest()


def test_stratified_sample_deterministic_and_nested(spark):
    docs = spark.createDataFrame(
        [(i, "t", ["en", "es", "de"][i % 3]) for i in range(300)],
        "doc_id long, text string, lang string",
    )
    s_half = stratified_sample(docs, {"en": 0.5, "es": 0.5, "de": 0.5})
    s_quarter = stratified_sample(docs, {"en": 0.25, "es": 0.25, "de": 0.25})
    ids_half = {r["doc_id"] for r in s_half.collect()}
    ids_quarter = {r["doc_id"] for r in s_quarter.collect()}
    # fixed per-row buckets make smaller samples SUBSETS of larger ones
    assert ids_quarter <= ids_half
    # deterministic across repartitioning
    ids_again = {
        r["doc_id"] for r in stratified_sample(
            docs.repartition(7), {"en": 0.5, "es": 0.5, "de": 0.5}
        ).collect()
    }
    assert ids_again == ids_half
    # rate ~ proportion (md5 buckets are uniform; wide tolerance)
    assert 0.3 * 300 < len(ids_half) < 0.7 * 300
    # default_rate keeps unlisted strata entirely
    kept_all = stratified_sample(docs, {"en": 0.0}, default_rate=1.0)
    langs = {r["lang"] for r in kept_all.collect()}
    assert langs == {"es", "de"}


def test_stratified_sample_bucket_matches_md5(spark):
    docs = spark.createDataFrame(
        [(42, "t", "en")], "doc_id long, text string, lang string"
    )
    row = stratified_sample(docs, {}, default_rate=1.0).collect()[0]
    want = int(hashlib.md5(b"42").hexdigest()[:15], 16) % SAMPLE_BUCKETS
    assert row["bucket"] == want


def test_corpus_stats_vs_pandas(spark):
    import numpy as np

    rows = [(i, " ".join(["w"] * (5 + i % 17)), "en" if i % 2 else "fr")
            for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r.asDict() for r in corpus_stats(docs).collect()}
    for lang in ("en", "fr"):
        toks = np.array(
            [5 + i % 17 for i, _, l in rows if l == lang], dtype="float64"
        )
        g = got[lang]
        assert g["n_docs"] == len(toks)
        assert g["total_tokens"] == int(toks.sum())
        assert g["avg_tokens"] == round(float(toks.mean()), 6)
        # numpy's linear interpolation == Spark percentile == quantile_cont
        assert g["p50_tokens"] == round(float(np.percentile(toks, 50)), 6)
        assert g["p90_tokens"] == round(float(np.percentile(toks, 90)), 6)
        assert g["p99_tokens"] == round(float(np.percentile(toks, 99)), 6)


def test_pack_sequences_contiguous_and_partition_invariant(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from vectrain_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(20)),
                "lang": ["en" if i % 2 == 0 else "de" for i in range(20)],
                "text": ["w " * (i * 7 % 30 + 1) for i in range(20)],
            }
        )
    )
    out = pack_sequences(docs, capacity=16).toPandas()
    for lang, grp in out.groupby("lang"):
        g = grp.sort_values("doc_id").reset_index(drop=True)
        # offsets are the exact prefix sums in doc_id order, starting at 0
        assert g.start_offset.iloc[0] == 0
        expect = g.n_tokens.cumsum().shift(1, fill_value=0)
        assert list(g.start_offset) == list(expect)
        # windows: floor arithmetic, and straddling docs span >1 bin
        assert (g.first_bin == g.start_offset // 16).all()
        assert (g.last_bin == (g.start_offset + g.n_tokens - 1) // 16).all()
    assert (out.n_bins >= 1).all() and (out.n_bins > 1).any()
    # identical results under a different input partitioning
    out2 = pack_sequences(docs.repartition(7), capacity=16).toPandas()
    a = out.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    b = out2.sort_values(["lang", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_mixture_weights_sqrt_temperature(spark):
    from vectrain_spark.operators.corpus import mixture_weights

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "web"),
            (2, "a b c d e f g h i j k l m n o p", "en", "web"),
            (3, "a b c d", "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r["domain"]: r for r in mixture_weights(docs).collect()}
    assert rows["web"]["n_docs"] == 2 and rows["web"]["n_tokens"] == 20
    assert rows["books"]["n_tokens"] == 4
    # raw share 20/24 vs 4/24; sqrt temper: sqrt(20)/(sqrt(20)+sqrt(4))
    import math

    w_web = round(math.sqrt(20), 9)
    w_books = round(math.sqrt(4), 9)
    assert rows["web"]["token_share"] == round(20 / 24, 6)
    assert rows["web"]["mix_weight"] == round(w_web / (w_web + w_books), 6)
    assert rows["books"]["mix_weight"] == round(w_books / (w_web + w_books), 6)
    # tempering moves weight toward the minority domain
    assert rows["books"]["mix_weight"] > 4 / 24


def test_chunk_documents_hand_computed(spark):
    """10 tokens, size 4, stride 3: ceil((10-4)/3) = 2 extra windows, so
    starts 1/4/7 and the LAST window (7..10) already covers the tail —
    no degenerate 4th window; an 11th token would add one (start 10,
    2-token tail). A 3-token doc yields one whole-doc chunk; overlap
    between consecutive windows is exactly size - stride."""
    from vectrain_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y z")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(docs, size=4, stride=3).collect()
    }
    got1 = [
        (rows[(1, k)]["tok_start"], rows[(1, k)]["tok_end"],
         rows[(1, k)]["n_tokens"], rows[(1, k)]["chunk_text"])
        for k in range(3)
    ]
    assert got1 == [
        (1, 4, 4, "a b c d"),
        (4, 7, 4, "d e f g"),
        (7, 10, 4, "g h i j"),
    ]
    assert (2, 0) in rows and rows[(2, 0)]["chunk_text"] == "x y z"
    assert rows[(2, 0)]["n_tokens"] == 3
    assert len(rows) == 4

    docs11 = spark.createDataFrame(
        [(3, "a b c d e f g h i j k")], "doc_id long, text string"
    )
    tail = {
        r["chunk_idx"]: r
        for r in chunk_documents(docs11, size=4, stride=3).collect()
    }
    assert len(tail) == 4
    assert (
        tail[3]["tok_start"], tail[3]["tok_end"],
        tail[3]["n_tokens"], tail[3]["chunk_text"],
    ) == (10, 11, 2, "j k")
