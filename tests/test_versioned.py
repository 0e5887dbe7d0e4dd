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
    removed = vacuum(t, keep_versions=1)
    # v1 dropped; v2 references v0's files so the v0 data dir must survive
    assert list_versions(t) == [2]
    assert removed and all("data/v1" in f for f in removed)
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
