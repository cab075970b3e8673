"""Unit tests for round-4f operators."""

from __future__ import annotations

import pytest

from vectrain_spark.operators.graph import local_clustering


def test_local_clustering_shapes(spark):
    # triangle {1,2,3} + pendant 4 hanging off 3 + isolated star 10-(11..14)
    edges = [
        (1, 2), (1, 3), (2, 3),          # triangle
        (3, 4),                          # pendant
        (10, 11), (10, 12), (10, 13), (10, 14),  # star
    ]
    pairs = spark.createDataFrame(edges, "a int, b int")
    got = {r["id"]: r for r in local_clustering(pairs).collect()}

    # triangle corners 1 and 2: deg 2, 1 triangle, coefficient 1.0
    assert got[1]["deg"] == 2 and got[1]["triangles"] == 1
    assert got[1]["clustering"] == 1.0
    # node 3: deg 3 (two triangle edges + pendant), 1 triangle of C(3,2)=3
    assert got[3]["deg"] == 3 and got[3]["triangles"] == 1
    assert got[3]["clustering"] == pytest.approx(1 / 3, abs=1e-6)
    # pendant 4: deg 1 -> defined as 0.0, no NULL/deg-0 division
    assert got[4]["deg"] == 1 and got[4]["triangles"] == 0
    assert got[4]["clustering"] == 0.0
    # star center: high degree, zero triangles -> 0.0 (hub-noise signature)
    assert got[10]["deg"] == 4 and got[10]["triangles"] == 0
    assert got[10]["clustering"] == 0.0
    # every node of the input appears exactly once
    assert sorted(got) == [1, 2, 3, 4, 10, 11, 12, 13, 14]


def test_rotate_scores_math(spark):
    """With a ONE-row embedding matrix every md5 lookup resolves to the
    same vector v, so score(h,r,t) = -||v o rot(v) - v|| is computable
    by hand: replay the exact fold (8-dp-rounded cos/sin, left-to-right
    sum, clamp, 6-dp round) in pure Python and demand equality."""
    import math

    from vectrain_spark.operators.graph import rotate_scores

    v = [0.25, -1.5, 2.0, 0.75, -0.5, 1.25]  # d=6 -> 3 complex pairs
    emb = spark.createDataFrame(
        [(0, v)], "vec_id long, embedding array<double>"
    )
    edges = spark.createDataFrame(
        [("e1", "p", "e2", 1)], "src string, pred string, dst string, cnt int"
    )
    got = rotate_scores(edges, emb, k=5).collect()
    assert len(got) == 1

    acc = 0.0
    for i in range(3):
        r_re = round(math.cos(v[i]), 8)
        r_im = round(math.sin(v[i]), 8)
        d_re = v[2 * i] * r_re - v[2 * i + 1] * r_im - v[2 * i]
        d_im = v[2 * i] * r_im + v[2 * i + 1] * r_re - v[2 * i + 1]
        acc = acc + (d_re * d_re + d_im * d_im)
    expect = round(-math.sqrt(max(acc, 0.0)), 6)
    assert got[0]["score"] == pytest.approx(expect, abs=1e-9)
    assert got[0]["rank"] == 1


def test_rotate_zero_phase_is_translation_free(spark):
    """Zero phases rotate by identity, so any (h, h) self-edge scores
    exactly 0 — the rotation family's symmetry fixpoint."""
    from vectrain_spark.operators.graph import rotate_scores

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    edges = spark.createDataFrame(
        [("a", "self", "a", 1)], "src string, pred string, dst string, cnt int"
    )
    got = rotate_scores(edges, emb, k=5).collect()
    assert len(got) == 1 and got[0]["score"] == 0.0


def test_wl_colors_structural_roles(spark):
    """P3 path: the two ends are isomorphic (same color), the middle is
    not; star: center vs leaves split into exactly two colors."""
    from vectrain_spark.operators.graph import wl_refinement

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13)], "a int, b int"
    )
    got = {r["id"]: r["color"] for r in wl_refinement(pairs, rounds=2).collect()}
    assert got[1] == got[3] and got[1] != got[2]
    assert got[11] == got[12] == got[13] and got[10] != got[11]
    # path nodes and star leaves have different 2-ball structure
    assert got[1] != got[11]


def test_wl_colors_mirror_graphs_match(spark):
    """Two disjoint copies of the same graph (a mirror site's template
    subgraph) produce IDENTICAL color multisets — the dedup-blocking
    property the operator exists for."""
    from collections import Counter

    from vectrain_spark.operators.graph import wl_refinement

    copy_a = [(1, 2), (2, 3), (1, 3), (3, 4)]          # triangle + pendant
    copy_b = [(101, 102), (102, 103), (101, 103), (103, 104)]
    pairs = spark.createDataFrame(copy_a + copy_b, "a int, b int")
    got = wl_refinement(pairs, rounds=2).collect()
    ca = Counter(r["color"] for r in got if r["id"] < 100)
    cb = Counter(r["color"] for r in got if r["id"] > 100)
    assert ca == cb
    # and within one copy, the pendant differs from the triangle corners
    colors_a = {r["id"]: r["color"] for r in got if r["id"] < 100}
    assert colors_a[4] != colors_a[1]
    assert colors_a[1] == colors_a[2]  # the two symmetric corners agree


def test_warc_roundtrip_hostile_payloads(spark):
    """Strict Content-Length framing: an html body that CONTAINS the
    record magic b'WARC/1.0\\r\\n...' and raw non-UTF8 bytes must
    round-trip byte-identically, and the warcinfo record is skipped."""
    import datetime

    from vectrain_spark.operators.warc import pages_to_warc, parse_warc

    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("https://a.example/1", ts,
         b"<html>WARC/1.0\r\nWARC-Type: response\r\n\r\nfake</html>", "en"),
        ("https://a.example/2", ts, b"\xff\xfe raw bytes \x00\x01", "de"),
        ("https://a.example/3", ts, b"plain", ""),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, lang string"
    )
    back = parse_warc(pages_to_warc(pages, n_files=2)).collect()
    got = {r["url"]: r for r in back}
    assert sorted(got) == [u for u, *_ in rows]
    for url, ts0, html, lang in rows:
        assert bytes(got[url]["html"]) == html, url
        assert got[url]["lang"] == lang
        assert got[url]["warc_ts"] == ts0


def test_warc_single_file_many_records(spark):
    """All records forced into ONE segment: the splitter must walk the
    whole concatenation (warcinfo + N responses) without desync."""
    import datetime

    from vectrain_spark.operators.warc import pages_to_warc, parse_warc

    ts = datetime.datetime(2024, 5, 6, 7, 8, 9)
    rows = [
        (f"https://b.example/{i}", ts, f"<p>doc {i}</p>".encode(), "en")
        for i in range(20)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, lang string"
    )
    files = pages_to_warc(pages, n_files=1)
    assert files.count() == 1
    back = parse_warc(files)
    assert back.count() == 20
    assert back.filter("warc_ts = timestamp'2024-05-06 07:08:09'").count() == 20


def test_modularity_two_triangles(spark):
    """Two disjoint triangles under the perfect partition: each
    community contributes 3/6 - (6/12)^2 = 0.25, so Q = 0.5; merging
    everything into ONE community gives Q = 1 - 1 = 0."""
    from vectrain_spark.operators.graph import modularity

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    pairs = spark.createDataFrame(edges, "a int, b int")
    perfect = spark.createDataFrame(
        [(i, 1 if i <= 3 else 2) for i in range(1, 7)], "id int, label int"
    )
    rows = modularity(pairs, perfect).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_nodes"] == 3 and r["intra_edges"] == 3 and r["deg_sum"] == 6
        assert r["contribution"] == pytest.approx(0.25, abs=1e-9)
    lumped = spark.createDataFrame(
        [(i, 1) for i in range(1, 7)], "id int, label int"
    )
    (only,) = modularity(pairs, lumped).collect()
    assert only["contribution"] == pytest.approx(0.0, abs=1e-9)


def test_bpe_train_hand_computed(spark):
    """Corpus 'abab abab cd' x weights: round 1 must pick ('a','b') —
    'ab' appears twice per 'abab' — and the back-to-back occurrences in
    one word must BOTH merge in the same round (the double-space
    residue case); round 2 then merges ('ab','ab')."""
    from vectrain_spark.operators.textstats import bpe_train

    docs = spark.createDataFrame(
        [(1, "abab abab"), (2, "abab zq")], "doc_id long, text string"
    )
    got = {r["rank"]: r for r in bpe_train(docs, merges=2).collect()}
    assert got[1]["left"] == "a" and got[1]["right"] == "b"
    assert got[1]["merged"] == "ab"
    # 'abab' x3 occurrences -> 2 'ab' pairs each = 6; 'zq' adds ('z','q')=1
    assert got[1]["cnt"] == 6
    # after merging: 'abab' -> tokens [ab, ab] -> round-2 argmax (ab, ab)
    assert got[2]["left"] == "ab" and got[2]["right"] == "ab"
    assert got[2]["merged"] == "abab" and got[2]["cnt"] == 3


def test_bpe_train_fully_merged_words_are_safe(spark):
    """A vocabulary whose every word collapses to ONE token must not
    crash pair generation in later rounds (empty-sequence guard)."""
    from vectrain_spark.operators.textstats import bpe_train

    docs = spark.createDataFrame([(1, "xy xy xy")], "doc_id long, text string")
    got = bpe_train(docs, merges=2).collect()
    assert len(got) >= 1
    assert got[0]["merged"] == "xy"


def test_bpe_encode_counts_merged_tokens(spark):
    """'abab' x3 + 'zq': after 2 merges [a+b, ab+ab] the vocabulary
    encodes as {abab: 3, z..q pieces or zq merged depending on argmax};
    token counts must be consistent with the final segmentation and
    single-char words survive encoding."""
    from vectrain_spark.operators.textstats import bpe_encode_tokens

    docs = spark.createDataFrame(
        [(1, "abab abab"), (2, "abab zq q")], "doc_id long, text string"
    )
    got = {r["token"]: r["cnt"] for r in
           bpe_encode_tokens(docs, merges=2, top_n=30).collect()}
    # merges: (a,b) then (ab,ab) -> 'abab' is one token occurring 3x
    assert got["abab"] == 3
    # 'zq' never merged (its pair count 1 loses both argmaxes)
    assert got["z"] == 1 and got["q"] == 2  # 'q' = 1 in zq + 1 single word


def test_label_spread_path_and_isolation(spark):
    """Path 1-2-3-4-5 seeded {1: A, 5: B}: wave 1 types 2=A and 4=B,
    wave 2 resolves 3's 1-1 tie to the smaller type 'A'; seeds never
    relabel; the disconnected edge 10-11 stays untyped (omitted)."""
    from vectrain_spark.operators.graph import label_spread

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a int, b int"
    )
    seeds = spark.createDataFrame([(1, "A"), (5, "B")], "id int, type string")
    got = {r["id"]: r["type"] for r in label_spread(pairs, seeds, 3).collect()}
    assert got == {1: "A", 5: "B", 2: "A", 4: "B", 3: "A"}


def test_local_clustering_matches_triangle_counts(spark):
    # the coefficient's numerator must agree with triangle_counts exactly
    from vectrain_spark.operators.graph import triangle_counts

    edges = [(a, b) for a in range(1, 8) for b in range(a + 1, 8)
             if (a * 7 + b) % 3 != 0]
    pairs = spark.createDataFrame(edges, "a int, b int")
    lc = {r["id"]: r["triangles"] for r in local_clustering(pairs).collect()}
    tc = {r["id"]: r["triangles"] for r in triangle_counts(pairs).collect()}
    for node, tri in tc.items():
        assert lc[node] == tri
    for node, tri in lc.items():
        assert tc.get(node, 0) == tri


def test_textrank_equals_pagerank_on_hand_built_word_graph(spark):
    """TextRank must equal weighted pagerank over the pair graph the
    tokenizer induces: three docs repeating 'alpha beta' five times
    (plus tail words below min_pair) produce exactly the alpha<->beta
    edge, so ranks come from the closed two-node weighted chain."""
    from vectrain_spark.operators.graph import pagerank
    from vectrain_spark.operators.textstats import textrank_words

    docs = spark.createDataFrame(
        [
            (1, "alpha beta " * 3 + "gamma"),
            (2, "beta alpha beta alpha"),
            (3, "alpha beta delta"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r["rank"] for r in textrank_words(docs, min_pair=5).collect()}
    # pair (alpha,beta) occurs: doc1 adjacents a-b,b-a... count manually:
    # doc1 tokens: a b a b a b gamma -> ab pairs 5 of which (a,b)=5? pairs:
    # (a,b),(b,a),(a,b),(b,a),(a,b),(b,gamma) -> least/greatest folds to 5x(a,b)
    # doc2: (a,b)x3; doc3: (a,b)x1,(b,delta) -> total 9 >= 5; all others < 5
    e = spark.createDataFrame(
        [("alpha", "beta", 9), ("beta", "alpha", 9)], "src string, dst string, cnt long"
    )
    want = {r["id"]: r["rank"] for r in pagerank(e, weight="cnt").collect()}
    assert got == want
    # symmetric two-node graph: equal ranks
    assert got["alpha"] == got["beta"]


def test_textrank_drops_self_pairs(spark):
    """Stuttered tokens ('spam spam ...') must not create a self-loop
    edge that would concentrate rank on the stutter word."""
    from vectrain_spark.operators.textstats import textrank_words

    docs = spark.createDataFrame(
        [(1, "spam " * 12 + "ham spam ham spam ham spam ham spam ham")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["rank"] for r in textrank_words(docs, min_pair=5).collect()}
    assert set(got) == {"spam", "ham"}
    assert got["spam"] == got["ham"]
