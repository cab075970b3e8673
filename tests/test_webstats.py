"""Unit tests for the web-corpus operators added in round 2: repetition
ratios (textstats.repetition_stats), URL normalization/dedup/domain
rollups (operators.urls), and co-citation similarity (graph.co_mentions).
Hand-computed expectations on tiny frames; the sf-scale oracle parity is
covered by test_driver_contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vectrain_spark.operators.graph import co_mentions
from vectrain_spark.operators.textstats import repetition_stats
from vectrain_spark.operators.urls import (
    domain_stats,
    normalize_url,
    url_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_repetition_hand_case(spark):
    # "a b a b a": 2-grams [a b, b a, a b, b a] -> n2=4 top2=2 frac=0.5
    # 3-grams [a b a, b a b, a b a] -> n3=3, dup=2, frac=0.666667
    out = (
        repetition_stats(_docs(spark, [(1, "a b a b a")]))
        .toPandas()
        .iloc[0]
    )
    assert out["n_grams2"] == 4
    assert out["top2_cnt"] == 2
    assert out["top2_frac"] == 0.5
    assert out["n_grams3"] == 3
    assert out["dup3_cnt"] == 2
    assert out["dup3_frac"] == 0.666667


def test_repetition_no_3grams_and_short_docs(spark):
    out = repetition_stats(
        _docs(spark, [(1, "x y"), (2, "solo")])
    ).toPandas()
    # one-word doc has no 2-grams -> no row; two-word doc has no 3-grams
    assert list(out["doc_id"]) == [1]
    assert out.iloc[0]["n_grams3"] == 0
    assert out.iloc[0]["dup3_frac"] == 0.0


def test_repetition_unique_text(spark):
    out = repetition_stats(_docs(spark, [(7, "one two three four")])).toPandas()
    assert out.iloc[0]["top2_frac"] == round(1 / 3, 6)
    assert out.iloc[0]["dup3_cnt"] == 0


def test_normalize_url_cases(spark):
    cases = {
        "https://WWW.Site.Example.com/Page/9/?utm_source=x&ref=abc#frag":
            "https://site.example.com/page/9",
        "http://www.a.io/": "http://a.io",
        "https://a.io/p?id=3&utm_campaign=z": "https://a.io/p?id=3",
        "https://a.io/p?utm_a=1&utm_b=2": "https://a.io/p",
        "https://a.io/wwwx/p": "https://a.io/wwwx/p",
    }
    df = spark.createDataFrame(pd.DataFrame({"url": list(cases)}))
    got = df.select("url", normalize_url(F.col("url")).alias("n")).toPandas()
    for _, row in got.iterrows():
        assert row["n"] == cases[row["url"]], row["url"]


def test_url_dedup_collapses_spellings(spark):
    rows = [
        (1, "https://www.a.io/x/"),
        (2, "https://a.io/x?utm_source=f"),
        (3, "https://a.io/y"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "url"]))
    out = url_dedup(df).toPandas().set_index("url_norm")
    assert out.loc["https://a.io/x", "keep_id"] == 1
    assert out.loc["https://a.io/x", "dup_cnt"] == 2
    assert out.loc["https://a.io/y", "dup_cnt"] == 1


def test_domain_stats_hosts_and_totals(spark):
    rows = [
        (1, "https://www.a.example.com/1", "en", 10),
        (2, "https://a.example.com/2", "de", 30),
        (3, "https://b.example.org/1", "en", 5),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "lang", "n_chars"])
    )
    out = domain_stats(df).toPandas().set_index("host")
    assert out.loc["a.example.com", "n_docs"] == 2
    assert out.loc["a.example.com", "n_langs"] == 2
    assert out.loc["a.example.com", "total_chars"] == 40
    assert out.loc["a.example.com", "avg_chars"] == 20.0
    assert out.loc["a.example.com", "tld"] == "com"
    assert out.loc["b.example.org", "tld"] == "org"


def test_co_mentions_hand_graph(spark):
    # s1 -> {x, y, z}; s2 -> {x, y}: pairs (x,y): common 2,
    # deg x=2, y=2 -> jaccard 2/(2+2-2)=1.0; (x,z),(y,z): common 1,
    # deg z=1 -> 1/(2+1-1)=0.5
    rows = [("s1", "x"), ("s1", "y"), ("s1", "z"), ("s2", "x"), ("s2", "y")]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))
    out = co_mentions(edges).toPandas().set_index(["a", "b"])
    assert out.loc[("x", "y"), "common"] == 2
    assert out.loc[("x", "y"), "jaccard"] == 1.0
    assert out.loc[("x", "z"), "jaccard"] == 0.5
    assert out.loc[("y", "z"), "jaccard"] == 0.5
    assert len(out) == 3


def test_co_mentions_duplicate_edges_ignored(spark):
    rows = [("s1", "x"), ("s1", "x"), ("s1", "y")]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))
    out = co_mentions(edges).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["common"] == 1


def test_decontaminate_finds_copy_and_overlap(spark):
    # bench doc 1; doc 10 is an exact copy (all 8-grams shared);
    # doc 11 shares one 8-gram window; doc 12 is clean
    t = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows_c = [
        (10, t),
        (11, "x " + " ".join(f"w{i}" for i in range(8)) + " y z"),
        (12, "a b c d e f g h i j"),
        (1, t),  # benchmark member itself -> excluded
    ]
    from vectrain_spark.operators.textclean import decontaminate

    corpus = _docs(spark, rows_c)
    bench = _docs(spark, [(1, t)])
    out = decontaminate(corpus, bench).toPandas().set_index("doc_id")
    assert set(out.index) == {10, 11}
    assert out.loc[10, "n_shared_grams"] == 3  # 10 words -> 3 distinct 8-grams
    assert out.loc[11, "n_shared_grams"] == 1


def test_remove_boilerplate_lines_order_and_hash(spark):
    import hashlib

    from vectrain_spark.operators.textclean import remove_boilerplate_lines

    rows = [
        ("u1", "nav\nunique one\nfooter"),
        ("u2", "nav\nunique two\nfooter"),
        ("u3", "solo\nnav"),
    ]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    out = remove_boilerplate_lines(df).toPandas().set_index("url")
    assert out.loc["u1", "n_lines"] == 3 and out.loc["u1", "n_kept"] == 1
    assert (
        out.loc["u1", "clean_hash"]
        == hashlib.md5(b"unique one").hexdigest()
    )
    # u3 keeps 'solo' only; order preserved
    assert out.loc["u3", "clean_hash"] == hashlib.md5(b"solo").hexdigest()


def test_remove_boilerplate_all_lines_removed(spark):
    import hashlib

    import pandas as pd

    from vectrain_spark.operators.textclean import remove_boilerplate_lines

    rows = [("u1", "same"), ("u2", "same")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    out = remove_boilerplate_lines(df).toPandas()
    assert set(out["n_kept"]) == {0}
    assert set(out["clean_hash"]) == {hashlib.md5(b"").hexdigest()}


def test_tfidf_hand_case(spark):
    import math

    from vectrain_spark.operators.index import tfidf_top_terms

    # N=2: "a a b" and "b c". idf(a)=ln(3/2)+1, idf(b)=ln(3/3)+1=1, idf(c)=ln(3/2)+1
    out = (
        tfidf_top_terms(_docs(spark, [(1, "a a b"), (2, "b c")]), k=3)
        .toPandas()
        .set_index(["doc_id", "term"])
    )
    assert out.loc[(1, "a"), "score"] == round(2 * (math.log(3 / 2) + 1), 6)
    assert out.loc[(1, "b"), "score"] == 1.0
    assert out.loc[(1, "a"), "rk"] == 1  # highest score in doc 1
    assert out.loc[(2, "c"), "rk"] == 1  # idf(c) > idf(b)
    assert out.loc[(1, "a"), "df"] == 1 and out.loc[(1, "b"), "df"] == 2


def test_inverted_index_postings_cap_and_totals(spark):
    from vectrain_spark.operators.index import inverted_index

    rows = [(i, "tok") for i in range(8)] + [(100, "tok tok rare")]
    out = inverted_index(_docs(spark, rows), cap=5).toPandas().set_index("term")
    assert out.loc["tok", "df"] == 9
    assert out.loc["tok", "total_tf"] == 10  # doc 100 has it twice
    assert out.loc["tok", "postings"] == "0,1,2,3,4"  # capped, ascending
    assert out.loc["rare", "postings"] == "100"


def test_crawl_frontier_excludes_fetched_and_caps_per_shard(spark):
    import pandas as pd

    from vectrain_spark.operators.webcorpus import crawl_frontier

    html = (
        '<a href="/cat/1/0">x</a><a href="/cat/1/0">y</a>'
        '<a href="/cat/2/0">z</a><a href="https://docs.example/p0">self</a>'
        '<a href="/ad/1/1">w</a>'
    ).encode()
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://docs.example/p0", "https://docs.example/p1"],
                "warc_ts": pd.Timestamp("2024-01-01"),
                "html": [html, html],
                "lang": "en",
            }
        )
    )
    out = crawl_frontier(pages, per_shard_cap=1).toPandas()
    # already-fetched p0 never re-enters the frontier
    assert "https://docs.example/p0" not in set(out.url)
    # cap=1 keeps only the top in-link url per shard; /cat/1/0 has 4 refs
    cat = out[out.shard == "docs.example/cat"]
    assert list(cat.url) == ["https://docs.example/cat/1/0"]
    assert cat.iloc[0].n_refs == 4 and cat.iloc[0].n_pages == 2
    assert list(out[out.shard == "docs.example/ad"].url) == [
        "https://docs.example/ad/1/1"
    ]


def test_crawl_frontier_absolutizes_against_source_host(spark):
    # relative hrefs resolve against EACH page's own scheme+host, not a
    # fixture literal (ADVICE r3 finding)
    import pandas as pd

    from vectrain_spark.operators.webcorpus import crawl_frontier

    html = b'<a href="/x/1">r</a>'
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://a.example/p", "http://b.example/q"],
                "warc_ts": pd.Timestamp("2024-01-01"),
                "html": [html, html],
                "lang": "en",
            }
        )
    )
    out = crawl_frontier(pages).toPandas()
    assert set(out.url) == {"https://a.example/x/1", "http://b.example/x/1"}
    assert set(out.shard) == {"a.example/x", "b.example/x"}
