"""Catalog snapshot semantics: append/replace, atomicity contract, time travel."""

from __future__ import annotations

import pandas as pd
import pytest

from vectrain_spark.catalog import Catalog, GroupManifest


def test_append_and_replace(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df1 = spark.createDataFrame(pd.DataFrame({"x": [1, 2]}))
    df2 = spark.createDataFrame(pd.DataFrame({"x": [3]}))
    s1 = cat.write("t", df1, mode="append", meta={"group": 0})
    s2 = cat.write("t", df2, mode="append", meta={"group": 1})
    assert (s1, s2) == (1, 2)
    assert sorted(r["x"] for r in cat.read(spark, "t").collect()) == [1, 2, 3]
    # time travel to snapshot 1
    assert sorted(r["x"] for r in cat.read(spark, "t", snapshot_id=1).collect()) == [1, 2]
    # replace starts a fresh chain
    cat.write("t", df2, mode="replace")
    assert sorted(r["x"] for r in cat.read(spark, "t").collect()) == [3]
    ops = [m["op"] for m in cat.snapshots("t")]
    assert ops == ["append", "append", "replace"]


def test_read_missing_table_raises(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "nope")


def test_group_manifest_resume_and_fingerprint(tmp_path):
    m = GroupManifest(str(tmp_path), "cfgA")
    assert m.completed() == set()
    m.mark_done(0, {"triples": 10})
    m.mark_done(2)
    assert m.completed() == {0, 2}
    # same fingerprint resumes
    assert GroupManifest(str(tmp_path), "cfgA").completed() == {0, 2}
    # changed config invalidates the checkpoint (not resumable)
    assert GroupManifest(str(tmp_path), "cfgB").completed() == set()


def test_compact_preserves_rows_and_time_travel(spark, tmp_path):
    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    for i in range(5):
        cat.write(
            "t",
            spark.range(i * 10, (i + 1) * 10).selectExpr("id", "id * 2 AS v"),
            mode="append",
            meta={"group": i},
        )
    head_before = cat.snapshots("t")[-1]
    rows_before = sorted(map(tuple, cat.read(spark, "t").collect()))
    snap = cat.compact(spark, "t", target_files=2)
    m = cat.snapshots("t")[-1]
    assert m["snapshot_id"] == snap and m["op"] == "replace"
    assert len(m["data_dirs"]) == 1 and len(head_before["data_dirs"]) == 5
    assert sorted(map(tuple, cat.read(spark, "t").collect())) == rows_before
    # old snapshots stay time-travelable after compaction
    old = cat.read(spark, "t", snapshot_id=3)
    assert old.count() == 30


def test_expire_snapshots_retention(spark, tmp_path):
    import os

    import pytest

    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    for i in range(5):
        cat.write(
            "t",
            spark.range(i * 10, (i + 1) * 10).selectExpr("id"),
            mode="append",
            meta={"group": i},
        )
    rows_before = sorted(r["id"] for r in cat.read(spark, "t").collect())
    assert cat.expire_snapshots("t", keep_last=2) == 3
    # head unchanged and fully readable
    assert sorted(r["id"] for r in cat.read(spark, "t").collect()) == rows_before
    # retention window still time-travelable (snap 4 = first 40 rows)
    assert cat.read(spark, "t", snapshot_id=4).count() == 40
    # expired snapshots are gone: manifest deleted, read raises
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "t", snapshot_id=2)
    assert cat.snapshots("t")[0]["parent"] is None
    assert len(cat.snapshots("t")) == 2
    # appends keep working on the re-rooted chain
    cat.write("t", spark.range(100, 110).selectExpr("id"), mode="append")
    assert cat.read(spark, "t").count() == 60
    # no-op when inside the retention window
    assert cat.expire_snapshots("t", keep_last=10) == 0


def test_expire_snapshots_reclaims_replaced_dirs(spark, tmp_path):
    import os

    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.write("t", spark.range(10).selectExpr("id"), mode="append")
    old_dir = cat.snapshots("t")[-1]["data_dirs"][0]
    cat.write("t", spark.range(5).selectExpr("id"), mode="replace")
    assert os.path.exists(old_dir)
    assert cat.expire_snapshots("t", keep_last=1) == 1
    # the replaced snapshot's data dir is physically reclaimed
    assert not os.path.exists(old_dir)
    assert cat.read(spark, "t").count() == 5


def test_schema_evolution_merge_read(spark, tmp_path):
    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.write("t", spark.range(3).selectExpr("id"), mode="append")
    # later append widens the schema with a new nullable column
    cat.write("t", spark.range(3, 5).selectExpr("id", "id * 2 AS extra"), mode="append")
    merged = cat.read(spark, "t", merge_schema=True)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows[4] == 8 and rows[0] is None  # pre-evolution rows null-filled
    assert merged.count() == 5


def test_cluster_sort_order_gives_skippable_files(spark, tmp_path):
    """After cluster(cols=[x]): per-file [min,max] ranges must be (nearly)
    disjoint — the parquet-footer evidence that a range predicate skips
    whole files. Before clustering, every file spans ~the whole domain."""
    from pyspark.sql import functions as F

    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    df = spark.range(20_000).select(
        F.col("id"),
        (F.xxhash64("id") % 10_000).alias("v"),  # scattered, not sorted
    )
    cat.write("t", df.repartition(8), mode="replace")

    def file_ranges(col):
        return (
            cat.read(spark, "t")
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        )

    before = file_ranges("v")
    # unclustered: every file spans nearly the whole domain
    assert all(r["hi"] - r["lo"] > 15_000 for r in before)

    cat.cluster(spark, "t", ["v"], target_files=8)
    after = sorted(((r["lo"], r["hi"]) for r in file_ranges("v")))
    # clustered: ranges are non-overlapping -> any point predicate matches
    # exactly one file
    for (lo1, hi1), (lo2, hi2) in zip(after, after[1:]):
        assert hi1 <= lo2
    # and the rows are all still there
    total = cat.read(spark, "t").count()
    assert total == 20_000


def test_cluster_zorder_localizes_both_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "whz"))
    df = spark.range(40_000).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(7)) % 1000).alias("y"),
    )
    cat.write("t", df.repartition(8), mode="replace")
    cat.cluster(spark, "t", ["x", "y"], target_files=16, zorder=True)
    stats = (
        cat.read(spark, "t")
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(stats) >= 8
    # z-ordering bounds BOTH dimensions' per-file spread well below the
    # full domain (2000 wide incl. negatives from the modulo)
    med_sx = sorted(r["sx"] for r in stats)[len(stats) // 2]
    med_sy = sorted(r["sy"] for r in stats)[len(stats) // 2]
    assert med_sx < 1200 and med_sy < 1200
    assert cat.read(spark, "t").count() == 40_000


def test_delete_where_copy_on_write(spark, tmp_path):
    from pyspark.sql import functions as F

    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "whd"))
    cat.write("t", spark.range(100).select("id"), mode="replace")
    head = cat.snapshots("t")[-1]["snapshot_id"]
    cat.delete_where(spark, "t", "id % 10 = 0")
    assert cat.read(spark, "t").count() == 90
    assert cat.read(spark, "t").filter(F.col("id") % 10 == 0).count() == 0
    # pre-delete snapshot still audits the removed rows
    assert cat.read(spark, "t", snapshot_id=head).count() == 100
    # manifest records the predicate
    assert cat.snapshots("t")[-1]["meta"]["deleted_where"] == "id % 10 = 0"


def test_update_where_copy_on_write(spark, tmp_path):
    from pyspark.sql import functions as F

    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "whu"))
    df = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    cat.write("t", df, mode="replace")
    head = cat.snapshots("t")[-1]["snapshot_id"]
    cat.update_where(spark, "t", {"v": "v + 100"}, "id >= 7")
    got = {r["id"]: r["v"] for r in cat.read(spark, "t").collect()}
    assert got == {i: (i * 2 + 100 if i >= 7 else i * 2) for i in range(10)}
    # pre-update snapshot unchanged
    old = {r["id"]: r["v"] for r in cat.read(spark, "t", snapshot_id=head).collect()}
    assert old == {i: i * 2 for i in range(10)}


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    are NOT MATCHED and must be kept, not silently dropped."""
    from vectrain_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "whn"))
    df = spark.createDataFrame(
        [(1, "a@x.com"), (2, None), (3, "b@x.com")], "id long, email string"
    )
    cat.write("t", df, mode="replace")
    cat.delete_where(spark, "t", "email = 'a@x.com'")
    got = sorted(r["id"] for r in cat.read(spark, "t").collect())
    assert got == [2, 3]  # NULL-email row survives


def test_cluster_zorder_guards_bad_input(spark, tmp_path):
    """ADVICE r2: wrong column count and empty/all-NULL clustering columns
    must raise a clear ValueError, not an opaque TypeError (both reachable
    from `main.py --maintain cluster --zorder`)."""
    cat = Catalog(str(tmp_path))
    cat.write("t", spark.createDataFrame([(1, 2)], "x long, y long"))
    with pytest.raises(ValueError, match="exactly 2"):
        cat.cluster(spark, "t", ["x"], zorder=True)
    cat.write("empty", spark.createDataFrame([], "x long, y long"))
    with pytest.raises(ValueError, match="empty table or all-NULL"):
        cat.cluster(spark, "empty", ["x", "y"], zorder=True)
    cat.write(
        "nulls",
        spark.createDataFrame([(None, 1), (None, 2)], "x long, y long"),
    )
    with pytest.raises(ValueError, match="empty table or all-NULL"):
        cat.cluster(spark, "nulls", ["x", "y"], zorder=True)


def test_concurrent_process_commits_lose_nothing(tmp_path):
    """VERDICT r2 ask #3: two separate PROCESSES appending N snapshots each
    to one table — the link-based optimistic commit must keep every
    update: final chain = 2N contiguous snapshots whose cumulative data
    dirs contain all 2N staged dirs (Spark-free via _commit_staged; the
    staging half is independent of the commit protocol)."""
    import subprocess
    import sys

    script = r"""
import os, sys
sys.path.insert(0, {repo!r})
from vectrain_spark.catalog import Catalog
root, tag, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
cat = Catalog(root)
for i in range(n):
    d = os.path.join(root, "t", "data", f"w-{{tag}}-{{i}}")
    os.makedirs(d, exist_ok=True)
    cat._commit_staged("t", d, "append", {{"writer": tag, "i": i}})
""".format(repo="/root/repo")
    n = 20
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(tmp_path), tag, str(n)]
        )
        for tag in ("A", "B")
    ]
    for p in procs:
        assert p.wait() == 0
    cat = Catalog(str(tmp_path))
    chain = cat.snapshots("t")
    assert len(chain) == 2 * n
    assert [m["snapshot_id"] for m in chain] == list(range(1, 2 * n + 1))
    assert [m["parent"] for m in chain] == [None] + list(range(1, 2 * n))
    final_dirs = set(chain[-1]["data_dirs"])
    assert len(final_dirs) == 2 * n  # every writer's every commit survived
    for tag in ("A", "B"):
        for i in range(n):
            assert any(f"w-{tag}-{i}" in d for d in final_dirs)


def test_merge_into_upsert(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    base = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    cat.write("t", base)
    src = spark.createDataFrame(
        pd.DataFrame({"k": [2, 4], "v": ["B", "d"]})
    )
    cat.merge_into(spark, "t", src, ["k"])
    got = {r["k"]: r["v"] for r in cat.read(spark, "t").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # old snapshot untouched (copy-on-write)
    old = {r["k"]: r["v"] for r in cat.read(spark, "t", snapshot_id=1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_merge_into_delete_mode_and_validation(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    base = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    cat.write("t", base)
    src = spark.createDataFrame(pd.DataFrame({"k": [2, 9], "v": ["x", "y"]}))
    cat.merge_into(spark, "t", src, ["k"], when_matched="delete")
    got = {r["k"]: r["v"] for r in cat.read(spark, "t").collect()}
    # matched key 2 removed; unmatched source key 9 inserted
    assert got == {1: "a", 9: "y"}
    with pytest.raises(ValueError):
        cat.merge_into(spark, "t", src.drop("v"), ["k"])
    with pytest.raises(ValueError):
        cat.merge_into(spark, "t", src, ["k"], when_matched="upsert")


def test_snapshot_cdc_classes(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    a = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", None]})
    )
    s1 = cat.write("t", a)
    b = spark.createDataFrame(
        pd.DataFrame({"k": [2, 3, 4], "v": ["B", None, "d"]})
    )
    s2 = cat.write("t", b, mode="replace")
    cdc = cat.snapshot_cdc(spark, "t", s1, s2, ["k"]).collect()
    by_op = {}
    for r in cdc:
        by_op.setdefault(r["_op"], []).append((r["k"], r["v"]))
    assert by_op["insert"] == [(4, "d")]
    assert by_op["delete"] == [(1, "a")]
    assert by_op["update_pre"] == [(2, "b")]
    assert by_op["update_post"] == [(2, "B")]
    # key 3: NULL value unchanged -> no change rows (NULL-tagged fingerprint)
    assert all(k != 3 for rows in by_op.values() for k, _ in rows)


def test_wap_branch_isolation_publish_and_drop(spark, tmp_path):
    from pyspark.sql import functions as F

    cat = Catalog(str(tmp_path / "wh"))
    base = spark.range(0, 10).select(F.col("id").alias("k"))
    cat.write("t", base)
    bt = cat.create_branch("t", "audit")
    cat.write(bt, spark.range(100, 105).select(F.col("id").alias("k")), mode="append")
    # isolation: branch sees 15, main still 10
    assert cat.read(spark, bt).count() == 15
    assert cat.read(spark, "t").count() == 10
    snap = cat.publish_branch("t", "audit")
    assert snap == 2
    cat.drop_branch("t", "audit")
    # published rows survive the branch drop (hardlinked under main)
    got = sorted(r.k for r in cat.read(spark, "t").collect())
    assert got == list(range(10)) + list(range(100, 105))


def test_wap_fast_forward_refuses_diverged_main(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    cat = Catalog(str(tmp_path / "wh"))
    cat.write("t", spark.range(0, 5).select(F.col("id").alias("k")))
    bt = cat.create_branch("t", "audit")
    cat.write(bt, spark.range(10, 12).select(F.col("id").alias("k")), mode="append")
    # main moves underneath the audit
    cat.write("t", spark.range(20, 22).select(F.col("id").alias("k")), mode="append")
    with pytest.raises(ValueError, match="moved since branch"):
        cat.publish_branch("t", "audit")
    # explicit opt-out appends the delta onto the new head
    cat.publish_branch("t", "audit", require_fast_forward=False)
    assert cat.read(spark, "t").count() == 9
    # duplicate branch names are rejected while the branch exists
    with pytest.raises(ValueError, match="already exists"):
        cat.create_branch("t", "audit")
    with pytest.raises(ValueError, match="invalid branch"):
        cat.create_branch("t", "bad/name")


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    cat.write("t", spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["a"]})))
    dup = spark.createDataFrame(pd.DataFrame({"k": [2, 2], "v": ["x", "y"]}))
    with pytest.raises(ValueError, match="duplicate keys"):
        cat.merge_into(spark, "t", dup, ["k"])


def test_snapshot_cdc_null_key_rows_are_not_lost(spark, tmp_path):
    # rows whose key column is NULL must still classify (presence markers,
    # not key-nullness) — ADVICE r3 finding
    cat = Catalog(str(tmp_path))
    a = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([None, 1], dtype="Int64"), "v": ["a", "x"]})
    )
    s1 = cat.write("t", a)
    b = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([None, 2], dtype="Int64"), "v": ["A", "y"]})
    )
    s2 = cat.write("t", b, mode="replace")
    cdc = cat.snapshot_cdc(spark, "t", s1, s2, ["k"]).collect()
    by_op = {}
    for r in cdc:
        by_op.setdefault(r["_op"], []).append((r["k"], r["v"]))
    # NULL-key row changed value: update pair, never dropped
    assert (None, "a") in by_op["update_pre"]
    assert (None, "A") in by_op["update_post"]
    assert by_op["delete"] == [(1, "x")]
    assert by_op["insert"] == [(2, "y")]


def test_wap_publish_rechecks_fast_forward_under_commit_lock(spark, tmp_path):
    # the in-lock build() re-check: simulate a racer that lands a commit
    # AFTER publish_branch's early precondition check by moving main and
    # verifying the commit-time parent check (parent != base) also raises
    from pyspark.sql import functions as F

    cat = Catalog(str(tmp_path / "wh"))
    cat.write("t", spark.range(0, 5).select(F.col("id").alias("k")))
    bt = cat.create_branch("t", "audit")
    cat.write(bt, spark.range(10, 12).select(F.col("id").alias("k")), mode="append")
    orig_head = cat._head

    def racing_head(table):
        h = orig_head(table)
        if table == "t" and not getattr(racing_head, "raced", False):
            # sneak a concurrent commit in AFTER the early check reads head
            racing_head.raced = True
            cat.write("t", spark.range(20, 21).select(F.col("id").alias("k")),
                      mode="append")
            return h  # early check still sees the pre-race head
        return h

    cat._head = racing_head
    try:
        with pytest.raises(ValueError, match="moved since branch"):
            cat.publish_branch("t", "audit")
    finally:
        cat._head = orig_head


def test_scan_prune_skips_files_and_preserves_result(spark, tmp_path):
    """write_with_stats range-partitions into 8 files with per-file
    n min/max in the manifest; a narrow range scan must open FEWER
    files than the table holds and return exactly the naive filter."""
    from pyspark.sql import functions as F

    cat = Catalog(str(tmp_path))
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    cat.write_with_stats(spark, "t", df, ["k"], mode="replace", files=8)
    got, report = cat.scan(spark, "t", "k", lo=100, hi=200)
    assert report["files_total"] == 8
    assert report["files_read"] < report["files_total"]
    rows = sorted(r["k"] for r in got.collect())
    assert rows == list(range(100, 201))


def test_scan_prune_unbounded_and_empty_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    cat = Catalog(str(tmp_path))
    df = spark.range(1_000).select(F.col("id").alias("k"))
    cat.write_with_stats(spark, "t", df, ["k"], mode="replace", files=4)
    full, rep = cat.scan(spark, "t", "k")
    assert rep["files_read"] == rep["files_total"] == 4
    assert full.count() == 1_000
    none, rep2 = cat.scan(spark, "t", "k", lo=5_000)
    assert rep2["files_read"] == 0
    assert none.count() == 0


def test_scan_reads_statless_snapshots_conservatively(spark, tmp_path):
    """An append committed WITHOUT stats must always be read — pruning
    may never drop a file it knows nothing about."""
    from pyspark.sql import functions as F

    cat = Catalog(str(tmp_path))
    a = spark.range(100).select(F.col("id").alias("k"))
    cat.write_with_stats(spark, "t", a, ["k"], mode="replace", files=2)
    b = spark.range(100, 200).select(F.col("id").alias("k"))
    cat.write("t", b, mode="append")  # plain write: no stats
    got, rep = cat.scan(spark, "t", "k", lo=150, hi=160)
    # both stats files prunable, but every statless file must be kept
    assert rep["files_read"] < rep["files_total"]
    assert sorted(r["k"] for r in got.collect()) == list(range(150, 161))
