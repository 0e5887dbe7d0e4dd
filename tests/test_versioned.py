"""Versioned-layer (time travel / rollback / vacuum) tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from synthea2omop_etl_spark.sources.versioned import (
    commit_version,
    list_versions,
    read_manifest,
    read_version,
    rollback,
    vacuum,
    version_diff,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def nations(spark):
    return spark.read.parquet(f"{SF}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def test_commit_read_time_travel(spark, tmp_path, nations):
    t = str(tmp_path / "tbl")
    v0 = commit_version(nations.where("n_nationkey < 10"), t)
    v1 = commit_version(nations.where("n_nationkey >= 10"), t, mode="append")
    v2 = commit_version(nations.where("n_nationkey < 5"), t, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert list_versions(t) == [0, 1, 2]
    assert read_version(spark, t, 0).count() == 10
    assert read_version(spark, t, 1).count() == 25
    assert read_version(spark, t, 2).count() == 5
    assert read_version(spark, t).count() == 5  # latest
    # appended version is exactly the union, row for row
    got = {r["n_nationkey"] for r in read_version(spark, t, 1).collect()}
    assert got == {r["n_nationkey"] for r in nations.collect()}


def test_rollback_is_metadata_only(spark, tmp_path, nations):
    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    commit_version(nations.limit(3), t, mode="overwrite")  # the "bad load"
    v = rollback(t, 0)
    assert v == 2
    assert read_version(spark, t).count() == 25
    m = read_manifest(t, 2)
    assert m["rolled_back_to"] == 0
    assert m["files"] == read_manifest(t, 0)["files"]  # no data copied
    # the bad version stays readable for forensics
    assert read_version(spark, t, 1).count() == 3


def test_vacuum_reclaims_only_unreferenced(spark, tmp_path, nations):
    t = str(tmp_path / "tbl")
    commit_version(nations, t)                              # v0
    commit_version(nations.limit(3), t, mode="overwrite")   # v1
    rollback(t, 0)                                          # v2 -> v0's files
    from synthea2omop_etl_spark.sources.versioned import read_manifest

    v1_files = set(read_manifest(t, 1)["files"])
    removed = vacuum(t, keep_versions=1, min_age_seconds=0)
    # v1 dropped; v2 references v0's files so v0's data files must survive
    assert list_versions(t) == [2]
    assert removed and set(removed) == v1_files
    assert read_version(spark, t).count() == 25
    # latest still fully readable after reclaim
    assert read_version(spark, t, 2).count() == 25


def test_version_diff_cdc(spark, tmp_path, nations):
    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    changed = nations.withColumn(
        "n_regionkey",
        F.when(F.col("n_nationkey") == 0, F.lit(99)).otherwise(
            F.col("n_regionkey")
        ),
    ).where("n_nationkey != 1")
    commit_version(changed, t, mode="overwrite")
    d = version_diff(
        spark, t, 0, 1, ["n_nationkey"], ["n_name", "n_regionkey"]
    )
    by_type = {
        r["change_type"]: r["n"]
        for r in d.groupBy("change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"removed": 1, "changed": 1}


def test_concurrent_commit_detected(tmp_path, nations):
    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    # simulate a racing writer having published v1 already
    import json

    with open(os.path.join(t, "_manifests", "v1.json"), "w") as fh:
        json.dump({"version": 1, "mode": "append", "files": []}, fh)
    from synthea2omop_etl_spark.sources.versioned import _publish

    with pytest.raises(ValueError, match="already committed"):
        _publish(t, {"version": 1, "mode": "append", "files": []})


def test_stream_versioned_sink_time_travel_and_replay(spark, tmp_path):
    """Each micro-batch lands as a table version; a fresh-checkpoint replay
    of already-committed batches is a no-op (batch-id high-water-mark)."""
    import shutil

    from synthea2omop_etl_spark.sources.versioned import (
        list_versions,
        read_manifest,
        read_version,
    )
    from synthea2omop_etl_spark.streaming.events import read_events_stream
    from synthea2omop_etl_spark.streaming.sink import stream_versioned_sink

    src = tmp_path / "src"
    src.mkdir()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.where("event_id % 2 = 0").coalesce(1).write.parquet(str(src / "w0"))
    for i, f in enumerate(sorted(src.glob("w0/part-*.parquet"))):
        shutil.copy(f, src / f"part-{i}.parquet")
    shutil.rmtree(src / "w0")

    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    stream_versioned_sink(stream, t, ckpt).awaitTermination(120)
    v_after_wave1 = list_versions(t)
    assert len(v_after_wave1) == 1
    n1 = read_version(spark, t).count()
    assert n1 == ev.where("event_id % 2 = 0").count()
    assert read_manifest(t, v_after_wave1[-1])["batch_id"] == 0

    # wave 2: a new file lands; restart from the same checkpoint
    ev.where("event_id % 2 = 1").coalesce(1).write.parquet(str(src / "w1"))
    for f in sorted(src.glob("w1/part-*.parquet")):
        shutil.copy(f, src / "part-9.parquet")
    shutil.rmtree(src / "w1")
    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    stream_versioned_sink(stream, t, ckpt).awaitTermination(120)
    assert len(list_versions(t)) == 2
    assert read_version(spark, t).count() == ev.count()
    assert read_version(spark, t, v_after_wave1[-1]).count() == n1  # time travel

    # replay from a FRESH checkpoint: batch ids restart at 0, both <= the
    # high-water-mark — nothing recommits
    stream = read_events_stream(spark, str(src))
    stream_versioned_sink(stream, t, str(tmp_path / "ckpt2")).awaitTermination(120)
    assert len(list_versions(t)) == 2
    assert read_version(spark, t).count() == ev.count()


def test_commit_expectations_gate(spark, tmp_path, nations):
    """A violated expectation rejects the commit before publish; passing
    expectations are recorded in the manifest as the audit trail."""
    from synthea2omop_etl_spark.sources.versioned import (
        ExpectationError,
        commit_version,
        list_versions,
        read_manifest,
    )

    t = str(tmp_path / "tbl")
    exp = {
        "pk_not_null": "n_nationkey IS NOT NULL",
        "region_in_range": "n_regionkey BETWEEN 0 AND 4",
    }
    v = commit_version(nations, t, expectations=exp)
    assert read_manifest(t, v)["expectations_passed"] == sorted(exp)

    bad = nations.withColumn(
        "n_regionkey",
        F.when(F.col("n_nationkey") < 3, F.lit(None)).otherwise(
            F.col("n_regionkey")
        ),
    )
    with pytest.raises(ExpectationError, match="region_in_range"):
        commit_version(bad, t, mode="append", expectations=exp)
    assert list_versions(t) == [0]  # nothing published


def test_merge_into_update_insert(spark, tmp_path, nations):
    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        merge_into,
        read_version,
    )

    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    src = spark.createDataFrame(
        [(0, "RENAMED", 9), (99, "NEWLAND", 4)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    v = merge_into(spark, t, src, ["n_nationkey"])
    assert v == 1
    cur = {r["n_nationkey"]: r for r in read_version(spark, t).collect()}
    assert len(cur) == 26
    assert cur[0]["n_name"] == "RENAMED" and cur[0]["n_regionkey"] == 9
    assert cur[99]["n_name"] == "NEWLAND"
    assert cur[5]["n_name"] == read_version(spark, t, 0).where(
        "n_nationkey = 5"
    ).collect()[0]["n_name"]  # untouched rows ride through
    # pre-merge table is still one time-travel read away
    assert read_version(spark, t, 0).count() == 25


def test_merge_into_partial_update_and_delete(spark, tmp_path, nations):
    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        merge_into,
        read_version,
    )

    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    # update only n_regionkey; n_name in source must be ignored
    src = nations.where("n_nationkey < 3").select(
        "n_nationkey",
        F.lit("IGNORED").alias("n_name"),
        (F.col("n_regionkey") + 100).alias("n_regionkey"),
    )
    merge_into(spark, t, src, ["n_nationkey"], update_cols=["n_regionkey"])
    cur = {r["n_nationkey"]: r for r in read_version(spark, t).collect()}
    assert cur[0]["n_regionkey"] >= 100 and cur[0]["n_name"] != "IGNORED"

    # delete_missing: full-snapshot reconciliation keeps only source keys
    merge_into(
        spark, t,
        nations.where("n_nationkey < 10"),
        ["n_nationkey"], delete_missing=True,
    )
    assert read_version(spark, t).count() == 10


def test_merge_into_rejects_ambiguous_source(spark, tmp_path, nations):
    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        merge_into,
    )

    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    dup = nations.limit(1).unionAll(nations.limit(1))
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(spark, t, dup, ["n_nationkey"])


def test_merge_into_insert_fills_missing_columns(spark, tmp_path, nations):
    """Source lacking a non-update target column inserts NULL there."""
    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        merge_into,
        read_version,
    )

    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    src = spark.createDataFrame([(77, 2)], ["n_nationkey", "n_regionkey"])
    merge_into(spark, t, src, ["n_nationkey"], update_cols=["n_regionkey"])
    row = read_version(spark, t).where("n_nationkey = 77").collect()[0]
    assert row["n_name"] is None and row["n_regionkey"] == 2


@pytest.mark.slow
def test_stream_merge_sink_cdc_apply(spark, tmp_path):
    """Change stream merges into a versioned table: later batches update
    earlier keys; in-batch duplicate keys collapse to the last row;
    fresh-checkpoint replays are no-ops."""
    import shutil

    from synthea2omop_etl_spark.sources.versioned import (
        list_versions,
        read_version,
    )
    from synthea2omop_etl_spark.streaming.sink import stream_merge_sink

    src = tmp_path / "cdc"
    src.mkdir()
    w0 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 1.0), (2, "b2", 2.0)],  # in-batch dup key 2
        ["id", "name", "v"],
    )
    w0.coalesce(1).write.parquet(str(src / "t0"))
    for i, f in enumerate(sorted(src.glob("t0/part-*.parquet"))):
        shutil.copy(f, src / f"part-{i}.parquet")
    shutil.rmtree(src / "t0")

    schema = w0.schema
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).parquet(str(src))
    stream_merge_sink(stream, t, ["id"], ckpt).awaitTermination(120)
    cur = {r["id"]: r for r in read_version(spark, t).collect()}
    assert len(cur) == 2 and cur[2]["name"] == "b2" and cur[2]["v"] == 2.0

    # wave 2: update id=1, insert id=3
    w1 = spark.createDataFrame([(1, "a9", 9.0), (3, "c", 3.0)], schema)
    w1.coalesce(1).write.parquet(str(src / "t1"))
    for f in sorted(src.glob("t1/part-*.parquet")):
        shutil.copy(f, src / "part-9.parquet")
    shutil.rmtree(src / "t1")
    stream = spark.readStream.schema(schema).parquet(str(src))
    stream_merge_sink(stream, t, ["id"], ckpt).awaitTermination(120)
    cur = {r["id"]: r for r in read_version(spark, t).collect()}
    assert len(cur) == 3 and cur[1]["v"] == 9.0 and cur[3]["name"] == "c"
    n_versions = len(list_versions(t))

    # fresh checkpoint: same files, batch ids restart — no recommit
    stream = spark.readStream.schema(schema).parquet(str(src))
    stream_merge_sink(stream, t, ["id"], str(tmp_path / "ck2")).awaitTermination(120)
    assert len(list_versions(t)) == n_versions
    assert {r["id"] for r in read_version(spark, t).collect()} == {1, 2, 3}


def test_manifest_stats_pruned_read(spark, tmp_path):
    """stats_cols records footer min/max in the manifest; read_version
    prune skips files whose range can't match — fewer input files, same
    answer after the residual filter."""
    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        read_manifest,
        read_version,
    )

    t = str(tmp_path / "tbl")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # three disjoint key-range commits = three stat-disjoint file sets
    for lo, hi in [(0, 500), (500, 1000), (1000, 1500)]:
        commit_version(
            orders.where(f"o_orderkey >= {lo} AND o_orderkey < {hi}")
            .repartition(2),
            t, mode="append", stats_cols=["o_orderkey"],
        )
    m = read_manifest(t, 2)
    assert len(m["files"]) == 6
    assert all("o_orderkey" in s for s in m["file_stats"].values())

    full = read_version(spark, t)
    assert full.count() == orders.count()

    pruned = read_version(spark, t, prune=("o_orderkey", 1200, None))
    assert len(pruned.inputFiles()) == 2  # only the third commit's files
    want = orders.where("o_orderkey >= 1200").count()
    assert pruned.where("o_orderkey >= 1200").count() == want

    # range matching nothing: empty frame, schema intact
    none = read_version(spark, t, prune=("o_orderkey", 10_000, None))
    assert none.count() == 0 and none.schema == full.schema

    # column without stats: conservative full file list
    all_files = read_version(spark, t, prune=("o_custkey", 0, 1))
    assert len(all_files.inputFiles()) == 6


def test_catalog_atomic_snapshot(spark, tmp_path, nations):
    """Catalog pins one version per table; partial-table commits carry
    forward unchanged pins; catalog rollback flips every table at once."""
    from synthea2omop_etl_spark.sources.catalog import (
        commit_catalog,
        list_catalog_versions,
        read_catalog,
        read_catalog_manifest,
        rollback_catalog,
    )

    root = str(tmp_path / "cat")
    regions = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    v0 = commit_catalog(root, {"nation": nations, "region": regions})
    assert v0 == 0
    snap0 = read_catalog(spark, root)
    assert snap0["nation"].count() == 25 and snap0["region"].count() == 5

    # update only nation; region pin carries forward
    v1 = commit_catalog(root, {"nation": nations.limit(3)})
    assert v1 == 1
    m = read_catalog_manifest(root, 1)
    assert m["tables"]["nation"] == 1 and m["tables"]["region"] == 0
    snap1 = read_catalog(spark, root)
    assert snap1["nation"].count() == 3 and snap1["region"].count() == 5
    # the old snapshot still resolves in full
    old = read_catalog(spark, root, 0)
    assert old["nation"].count() == 25

    # atomic all-table rollback
    v2 = rollback_catalog(root, 0)
    assert v2 == 2
    assert read_catalog(spark, root)["nation"].count() == 25
    assert list_catalog_versions(root) == [0, 1, 2]


def test_merge_into_idempotent_replay(spark, tmp_path, nations):
    """Merging the same source twice leaves the table content unchanged
    (a new version lands, but rows are identical) — the retry story."""
    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        merge_into,
        read_version,
    )

    t = str(tmp_path / "tbl")
    commit_version(nations, t)
    src = spark.createDataFrame(
        [(0, "X", 9), (50, "Y", 1)], ["n_nationkey", "n_name", "n_regionkey"]
    )
    merge_into(spark, t, src, ["n_nationkey"])
    first = sorted(tuple(r) for r in read_version(spark, t).collect())
    merge_into(spark, t, src, ["n_nationkey"])
    second = sorted(tuple(r) for r in read_version(spark, t).collect())
    assert first == second


def test_concurrent_commit_cas_one_winner_per_slot(spark, tmp_path, nations):
    """Two interleaved committers: the loser's CAS retry lands on the next
    version, no manifest is ever replaced, and both data sets are intact
    (the round-5 single-writer contract upgraded to real CAS)."""
    import threading

    from synthea2omop_etl_spark.sources.versioned import VersionConflictError

    t = str(tmp_path / "tbl")
    commit_version(nations, t)  # v0
    a = nations.limit(5).withColumn("writer", F.lit("a"))
    b = nations.limit(7).withColumn("writer", F.lit("b"))
    results: dict[str, int] = {}
    barrier = threading.Barrier(2)

    def run(name, df):
        barrier.wait()
        results[name] = commit_version(df, t, mode="append")

    ts = [threading.Thread(target=run, args=(n, d)) for n, d in
          [("a", a), ("b", b)]]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    # both committed, to DIFFERENT versions
    assert sorted(results.values()) == [1, 2]
    assert list_versions(t) == [0, 1, 2]
    # the final version contains v0 + both appends (the loser re-read its
    # parent on retry, so nothing was lost or doubled)
    assert read_version(spark, t, 2).count() == nations.count() + 5 + 7
    # every manifest is valid JSON with strictly growing file lists
    n0 = len(read_manifest(t, 0)["files"])
    n1 = len(read_manifest(t, 1)["files"])
    n2 = len(read_manifest(t, 2)["files"])
    assert n0 < n1 < n2

    # direct slot collision still raises after retries are exhausted
    from synthea2omop_etl_spark.sources.versioned import _publish

    with pytest.raises(VersionConflictError):
        _publish(t, {"version": 2, "mode": "append", "files": []})


def test_footer_stats_unorderable_and_date_types(spark, tmp_path):
    """Types whose footer stats can't be merged order-preservingly record
    NOTHING (prune conservatively keeps the file — the old str() path
    merged '9.5'/'10.2' lexicographically and silently dropped matching
    files); date stats become ISO strings whose lexicographic order is
    chronological, and double stats stay numeric."""
    from decimal import Decimal

    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        read_manifest,
        read_version,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [
            (Decimal("9.50"), 9.5, "2020-01-05"),
            (Decimal("10.20"), 10.2, "2020-03-01"),
        ],
        "amt decimal(10,2), amtd double, d string",
    ).select("amt", "amtd", F.to_date("d").alias("d")).coalesce(1)
    commit_version(df, t, stats_cols=["amt", "amtd", "d"])
    stats = next(iter(read_manifest(t, 0)["file_stats"].values()))
    # decimal: pyarrow can't surface stats — none recorded, prune keeps
    assert "amt" not in stats
    assert read_version(spark, t, prune=("amt", 11, None)).count() == 2
    # double: numeric min/max, numeric prune bounds work
    assert stats["amtd"] == [9.5, 10.2]
    assert read_version(spark, t, prune=("amtd", 10, 11)).count() == 2
    assert read_version(spark, t, prune=("amtd", 11, None)).count() == 0
    # date: ISO strings, chronological == lexicographic
    assert stats["d"] == ["2020-01-05", "2020-03-01"]
    assert read_version(spark, t, prune=("d", "2020-04-01", None)).count() == 0
    assert read_version(spark, t, prune=("d", None, "2020-02-01")).count() == 2


def test_vacuum_protect_pins(spark, tmp_path, nations):
    """protect= keeps an old version's manifest and files alive through a
    vacuum that would otherwise reap them."""
    t = str(tmp_path / "tbl")
    commit_version(nations, t)                             # v0
    commit_version(nations.limit(3), t, mode="overwrite")  # v1
    commit_version(nations.limit(5), t, mode="overwrite")  # v2
    vacuum(t, keep_versions=1, protect=[0], min_age_seconds=0)
    assert list_versions(t) == [0, 2]
    assert read_version(spark, t, 0).count() == nations.count()
    with pytest.raises(Exception):
        read_manifest(t, 1)


def test_vacuum_catalog_preserves_carried_pins(spark, tmp_path, nations):
    """A catalog pin carried forward across versions must survive
    vacuum_catalog even when the table gained many newer versions — the
    ADVICE failure mode where per-table vacuum broke read_catalog."""
    from synthea2omop_etl_spark.sources.catalog import (
        commit_catalog,
        read_catalog,
        vacuum_catalog,
    )

    root = str(tmp_path / "cat")
    dim = nations.limit(4)
    commit_catalog(root, {"dim": dim, "fact": nations})        # cat v0
    # fact churns; dim's pin (table v0) is carried forward every time
    for i in range(3):
        commit_catalog(root, {"fact": nations.limit(10 + i)})  # cat v1-3
    removed = vacuum_catalog(root, keep_catalog_versions=2,
                             keep_table_versions=1, min_age_seconds=0)
    # latest catalog still resolves EVERY table, including dim@v0
    tables = read_catalog(spark, root)
    assert tables["dim"].count() == 4
    assert tables["fact"].count() == 12
    # the previous surviving catalog version resolves too
    tables2 = read_catalog(spark, root, version=2)
    assert tables2["dim"].count() == 4 and tables2["fact"].count() == 11
    # churned fact versions outside the survivors were reclaimed
    assert removed


def test_commit_catalog_rejects_reserved_extra(tmp_path, nations):
    from synthea2omop_etl_spark.sources.catalog import commit_catalog

    root = str(tmp_path / "cat")
    with pytest.raises(ValueError, match="reserved|manifest key"):
        commit_catalog(root, {"dim": nations}, extra={"tables": {}})


def test_stream_merge_sink_order_col_across_partitions(spark, tmp_path):
    """One key's change rows land in DIFFERENT files of the same
    micro-batch (a multi-partition source): order_col decides the
    survivor by CDC sequence, not by arbitrary partition order — the
    ADVICE failure mode where a stale value could win."""
    import shutil

    from synthea2omop_etl_spark.sources.versioned import read_version
    from synthea2omop_etl_spark.streaming.sink import stream_merge_sink

    src = tmp_path / "cdc"
    src.mkdir()
    newer = spark.createDataFrame([(1, "new", 5)], ["id", "name", "seq"])
    older = spark.createDataFrame([(1, "old", 2), (2, "b", 1)],
                                  ["id", "name", "seq"])
    # two separate files, both present before the stream starts → one
    # micro-batch, key 1 split across input partitions
    for i, df in enumerate([older, newer]):  # stale file sorts LAST
        df.coalesce(1).write.parquet(str(src / f"t{i}"))
        for f in sorted(src.glob(f"t{i}/part-*.parquet")):
            shutil.copy(f, src / f"part-{i}.parquet")
        shutil.rmtree(src / f"t{i}")

    t = str(tmp_path / "tbl")
    stream = spark.readStream.schema(newer.schema).parquet(str(src))
    stream_merge_sink(
        stream, t, ["id"], str(tmp_path / "ckpt"), order_col="seq"
    ).awaitTermination(120)
    cur = {r["id"]: r for r in read_version(spark, t).collect()}
    assert cur[1]["name"] == "new" and cur[1]["seq"] == 5
    assert cur[2]["name"] == "b"


@pytest.mark.slow
def test_stream_sink_txn_app_identity(spark, tmp_path):
    """The replay guard keys on (txn_app_id, batch_id): a restarted stream
    with a DIFFERENT logical identity is not mistaken for a replay even
    though its batch ids restart at 0 — with the old raw-batch-id guard
    its first micro-batches were silently dropped."""
    import shutil

    from synthea2omop_etl_spark.sources.versioned import (
        list_versions,
        read_version,
    )
    from synthea2omop_etl_spark.streaming.sink import stream_merge_sink

    src = tmp_path / "cdc"
    src.mkdir()
    w0 = spark.createDataFrame([(1, "a", 0)], ["id", "name", "seq"])
    w0.coalesce(1).write.parquet(str(src / "t0"))
    for f in sorted(src.glob("t0/part-*.parquet")):
        shutil.copy(f, src / "part-0.parquet")
    shutil.rmtree(src / "t0")

    t = str(tmp_path / "tbl")
    stream = spark.readStream.schema(w0.schema).parquet(str(src))
    stream_merge_sink(
        stream, t, ["id"], str(tmp_path / "ck0"),
        order_col="seq", txn_app_id="app-a",
    ).awaitTermination(120)
    assert len(list_versions(t)) == 1

    # same identity, fresh checkpoint, same source: replay → no-op
    stream = spark.readStream.schema(w0.schema).parquet(str(src))
    stream_merge_sink(
        stream, t, ["id"], str(tmp_path / "ck1"),
        order_col="seq", txn_app_id="app-a",
    ).awaitTermination(120)
    assert len(list_versions(t)) == 1

    # source grows; a re-pointed stream under a NEW identity applies its
    # batch (batch_id 0 again) instead of being swallowed by the old HWM.
    # Its one availableNow batch re-reads the old file too — order_col
    # makes the re-merge converge on the newest change per key.
    w1 = spark.createDataFrame([(1, "a2", 1), (2, "b", 1)],
                               ["id", "name", "seq"])
    w1.coalesce(1).write.parquet(str(src / "t1"))
    for f in sorted(src.glob("t1/part-*.parquet")):
        shutil.copy(f, src / "part-1.parquet")
    shutil.rmtree(src / "t1")
    stream = spark.readStream.schema(w0.schema).parquet(str(src))
    stream_merge_sink(
        stream, t, ["id"], str(tmp_path / "ck2"),
        order_col="seq", txn_app_id="app-b",
    ).awaitTermination(120)
    cur = {r["id"]: r["name"] for r in read_version(spark, t).collect()}
    assert cur == {1: "a2", 2: "b"}


def test_vacuum_grace_window_spares_inflight_data(spark, tmp_path, nations):
    """An unreferenced data directory younger than min_age_seconds is NOT
    reclaimed — it may belong to a commit that wrote data but has not yet
    claimed its manifest (the write-then-claim protocol)."""
    import os

    t = str(tmp_path / "tbl")
    commit_version(nations, t)                             # v0
    commit_version(nations.limit(3), t, mode="overwrite")  # v1
    # default grace: v0's (now unreferenced) fresh data dir survives
    assert vacuum(t, keep_versions=1) == []
    # age the directories and vacuum again: reclaimed
    data_root = os.path.join(t, "data")
    for d in os.listdir(data_root):
        os.utime(os.path.join(data_root, d), (0, 0))
    assert vacuum(t, keep_versions=1) != []
    assert read_version(spark, t).count() == 3


def test_vacuum_catalog_reclaims_orphan_tables(spark, tmp_path, nations):
    """A table directory no surviving catalog manifest pins (crashed
    commit_catalog, dropped table) is vacuumed down instead of
    accumulating forever."""
    import os

    from synthea2omop_etl_spark.sources.catalog import (
        commit_catalog,
        vacuum_catalog,
    )

    root = str(tmp_path / "cat")
    commit_catalog(root, {"dim": nations.limit(4)})
    # crashed protocol: a table committed twice but never cataloged
    orphan = os.path.join(root, "orphan_tbl")
    commit_version(nations, orphan)
    commit_version(nations.limit(2), orphan, mode="overwrite")
    removed = vacuum_catalog(root, keep_table_versions=1, min_age_seconds=0)
    # the orphan's superseded version was reclaimed; its newest survives
    assert removed
    assert list_versions(orphan) == [1]
    assert read_version(spark, orphan).count() == 2
    # the cataloged table untouched
    from synthea2omop_etl_spark.sources.catalog import read_catalog

    assert read_catalog(spark, root)["dim"].count() == 4


def test_replay_guard_survives_interleaved_writer(spark, tmp_path):
    """A replayed batch is skipped even when ANOTHER stream committed in
    between — the per-app txns map carries every app's high-water mark
    forward, so the newest manifest always knows app A's mark."""
    import shutil

    from synthea2omop_etl_spark.sources.versioned import (
        list_versions,
        read_manifest,
        read_version,
    )
    from synthea2omop_etl_spark.streaming.sink import stream_versioned_sink

    def make_src(d, df):
        d.mkdir()
        df.coalesce(1).write.parquet(str(d / "t"))
        for f in sorted(d.glob("t/part-*.parquet")):
            shutil.copy(f, d / "part-0.parquet")
        shutil.rmtree(d / "t")

    a_rows = spark.createDataFrame([(1, "a")], ["id", "v"])
    b_rows = spark.createDataFrame([(2, "b")], ["id", "v"])
    src_a, src_b = tmp_path / "sa", tmp_path / "sb"
    make_src(src_a, a_rows)
    make_src(src_b, b_rows)
    t = str(tmp_path / "tbl")

    # A commits batch 0, then B (different identity) commits batch 0
    stream_versioned_sink(
        spark.readStream.schema(a_rows.schema).parquet(str(src_a)),
        t, str(tmp_path / "ckA"), txn_app_id="app-a",
    ).awaitTermination(120)
    stream_versioned_sink(
        spark.readStream.schema(b_rows.schema).parquet(str(src_b)),
        t, str(tmp_path / "ckB"), txn_app_id="app-b",
    ).awaitTermination(120)
    assert len(list_versions(t)) == 2
    # newest manifest carries BOTH apps' marks
    m = read_manifest(t, list_versions(t)[-1])
    assert set(m["txns"]) == {"app-a", "app-b"}

    # A replays from a fresh checkpoint: with only a newest-manifest probe
    # B's commit would shadow A's mark and batch 0 would re-append
    stream_versioned_sink(
        spark.readStream.schema(a_rows.schema).parquet(str(src_a)),
        t, str(tmp_path / "ckA2"), txn_app_id="app-a",
    ).awaitTermination(120)
    assert len(list_versions(t)) == 2  # no duplicate commit
    assert read_version(spark, t).count() == 2


def test_insert_if_absent_respects_unbucketed_birth_layout(spark, tmp_path):
    """Appending with bucket_key to a layer BORN unbucketed must not mix
    __bucket=K/ dirs into a flat layout (partition discovery would reject
    the tree for every later reader)."""
    from pyspark.sql import functions as F

    from synthea2omop_etl_spark.sources.writers import insert_if_absent

    path = str(tmp_path / "map")
    w1 = spark.range(10).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    insert_if_absent(spark, w1, path, ["k"])  # unbucketed birth
    w2 = spark.range(10, 20).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    insert_if_absent(spark, w2, path, ["k"], bucket_key="k", n_buckets=8)
    got = spark.read.parquet(path)
    assert got.count() == 20
    assert "__bucket" not in got.columns


def test_bloom_pruned_point_lookup(spark, tmp_path):
    """commit_version(bloom_cols=) records per-file bitmaps; read_version
    prune_eq skips files whose bitmap proves the key absent — the
    high-cardinality id-lookup path min/max stats can't serve."""
    from synthea2omop_etl_spark.sources.versioned import (
        commit_version,
        read_manifest,
        read_version,
    )

    t = str(tmp_path / "tbl")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # three commits with disjoint key sets → three bloom-disjoint file sets
    for lo, hi in [(0, 500), (500, 1000), (1000, 1500)]:
        commit_version(
            orders.where(f"o_orderkey >= {lo} AND o_orderkey < {hi}")
            .coalesce(1),
            t, mode="append", bloom_cols=["o_orderkey"],
        )
    m = read_manifest(t, 2)
    assert len(m["files"]) == 3
    assert all("o_orderkey" in b for b in m["file_blooms"].values())
    assert m["bloom_params"] == {"m_bits": 8192, "k": 3}

    # pick a real key from the middle commit
    key = orders.where(
        "o_orderkey >= 500 AND o_orderkey < 1000"
    ).agg({"o_orderkey": "min"}).collect()[0][0]
    hit = read_version(spark, t, prune_eq=("o_orderkey", key))
    # at least one file skipped (bloom FP rate permits a stray extra)
    assert 1 <= len(hit.inputFiles()) <= 2
    assert hit.where(f"o_orderkey = {key}").count() == 1

    # absent key: bitmaps prove absence (superset contract: a rare bloom
    # FP may keep a stray file, so assert through the caller's filter)
    none = read_version(spark, t, prune_eq=("o_orderkey", 10**9))
    assert len(none.inputFiles()) <= 1
    assert none.where(f"o_orderkey = {10**9}").count() == 0
    assert none.schema == read_version(spark, t).schema

    # column without bitmaps: conservative full list
    all_files = read_version(spark, t, prune_eq=("o_custkey", 1))
    assert len(all_files.inputFiles()) == 3

    # combined range + point pruning composes
    both = read_version(
        spark, t, prune=("o_orderkey", None, None),
        prune_eq=("o_orderkey", key),
    )
    assert both.where(f"o_orderkey = {key}").count() == 1
