"""Unit tests for round-4i operators: CUSUM change points, Datafly
k-anonymity."""

from __future__ import annotations

import datetime as dt


def test_cusum_finds_a_step_change(spark):
    """Daily counts 1,1,1,5,5 (step up on day 4): n=5, S=13, scaled
    deviations n*x-S = -8,-8,-8,12,12 -> C = -8,-16,-24,-12,0; peak
    |C|=24 lands on day 3, the last pre-shift day."""
    from vectrain_spark.operators.events import cusum_changepoints

    rows = []
    counts = {1: 1, 2: 1, 3: 1, 4: 5, 5: 5}
    eid = 0
    for day, c in counts.items():
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, day, 12, 0), "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = cusum_changepoints(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_days"], r["total_events"]) == (5, 13)
    assert r["cp_day"] == "2024-01-03"
    assert r["cusum_peak"] == 24


def test_cusum_tie_breaks_to_earliest_day(spark):
    """Counts 3,1,3 (n=3, S=7): scaled devs 2,-4,2 -> C = 2,-2,0;
    |C| ties at 2 on days 1 and 2 -> earliest day wins."""
    from vectrain_spark.operators.events import cusum_changepoints

    rows = []
    eid = 0
    for day, c in {1: 3, 2: 1, 3: 3}.items():
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 2, day), "view"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    r = cusum_changepoints(ev).collect()[0]
    assert r["cp_day"] == "2024-02-01"
    assert r["cusum_peak"] == 2


def test_datafly_ladder_levels_and_suppression(spark):
    """k=2 ladder: six 'en' docs share (src, bucket10) in pairs ->
    level 0; a lone (src, size) 'en' doc generalizes to level 1 via a
    shared bucket20, or level 2 via the language class; a singleton
    language is suppressed (level 3, class 0)."""
    from vectrain_spark.operators.privacy import datafly_k_anon

    docs = spark.createDataFrame(
        [
            # level-0 pair: same (lang, source, b10=3)
            (1, "en", "a", 35),
            (2, "en", "a", 37),
            # b10 differs (2 vs 3) and source unique -> level 1 via
            # b20=1 shared with the pair above
            (3, "en", "b", 25),
            # b20=3 unshared -> only the language class (n=4) -> level 2
            (4, "en", "c", 70),
            # singleton language -> suppressed
            (5, "zz", "a", 15),
        ],
        "doc_id long, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["anon_level"], r["class_n"])
        for r in datafly_k_anon(docs, k=2).collect()
    }
    assert got[1] == (0, 2)
    assert got[2] == (0, 2)
    assert got[3] == (1, 3)  # b20=1 holds docs 1,2,3
    assert got[4] == (2, 4)
    assert got[5] == (3, 0)


def test_datafly_all_released_at_finest_when_classes_big(spark):
    """Uniform corpus: every row satisfies k at level 0."""
    from vectrain_spark.operators.privacy import datafly_k_anon

    docs = spark.createDataFrame(
        [(i, "en", "s", 12) for i in range(10)],
        "doc_id long, lang string, source string, n_chars long",
    )
    out = datafly_k_anon(docs, k=5).collect()
    assert all(r["anon_level"] == 0 and r["class_n"] == 10 for r in out)
