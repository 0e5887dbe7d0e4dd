"""Partition-scoped backfill: equals a full recompute, touches only the
affected partitions, handles moved keys and fully-emptied partitions,
and replays idempotently."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from synthea2omop_etl_spark.operators.linkage import snapshot_diff
from synthea2omop_etl_spark.plans.backfill import (
    affected_partitions,
    backfill_aggregate,
)


def _build(src):
    return src.groupBy("day", "kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("total"),
    )


def _rows(spark, path):
    return {
        tuple(r)
        for r in spark.read.parquet(path)
        .select("day", "kind", "n", "total")
        .collect()
    }


def _mtimes(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(k, k % 5, "a" if k % 2 else "b", float(k)) for k in range(200)],
        ["id", "day", "kind", "v"],
    )


def test_backfill_matches_full_recompute(spark, base, tmp_path):
    target = str(tmp_path / "agg")
    _build(base).write.partitionBy("day").parquet(target)

    # Change day 1 rows, move one key from day 2 to day 4, add day 5.
    new = (
        base.withColumn(
            "v", F.when(F.col("day") == 1, F.col("v") + 100).otherwise(F.col("v"))
        )
        .withColumn(
            "day", F.when(F.col("id") == 2, F.lit(4)).otherwise(F.col("day"))
        )
        .unionByName(
            spark.createDataFrame([(900, 5, "a", 1.0)], base.columns)
        )
    )
    diff = snapshot_diff(base, new, ["id"], ["day", "kind", "v"])
    parts = affected_partitions(diff, "day")
    assert sorted(parts) == [1, 2, 4, 5]  # old AND new side of the move

    before = _mtimes(target)
    report = backfill_aggregate(new, _build, "day", target, parts)
    assert report["partitions_rebuilt"] == 4
    assert report["partitions_emptied"] == 0
    assert _rows(spark, target) == {
        tuple(r) for r in _build(new).collect()
    }
    # Untouched partitions (day 0 and 3) keep their exact files.
    after = _mtimes(target)
    untouched = {p: t for p, t in before.items() if "/day=0/" in p or "/day=3/" in p}
    assert untouched and all(after[p] == t for p, t in untouched.items())

    # Idempotent replay: running the same backfill again converges.
    backfill_aggregate(new, _build, "day", target, parts)
    assert _rows(spark, target) == {tuple(r) for r in _build(new).collect()}


def test_backfill_emptied_partition_is_dropped(spark, base, tmp_path):
    target = str(tmp_path / "agg2")
    _build(base).write.partitionBy("day").parquet(target)

    new = base.where(F.col("day") != 2)  # day 2 disappears entirely
    diff = snapshot_diff(base, new, ["id"], ["day", "kind", "v"])
    parts = affected_partitions(diff, "day")
    assert parts == [2]
    report = backfill_aggregate(new, _build, "day", target, parts)
    assert report["partitions_emptied"] == 1
    assert _rows(spark, target) == {tuple(r) for r in _build(new).collect()}
    assert not os.path.isdir(os.path.join(target, "day=2"))


def test_backfill_contracts(spark, base, tmp_path):
    target = str(tmp_path / "agg3")
    # empty change set: no-op, table untouched (never created here)
    assert backfill_aggregate(base, _build, "day", target, []) == {
        "partitions_rebuilt": 0,
        "rows_written": 0,
    }
    assert not os.path.exists(target)
    # build dropping the partition column is rejected
    with pytest.raises(ValueError):
        backfill_aggregate(
            base, lambda s: s.groupBy("kind").count(), "day", target, [1]
        )
    # a change set with neither direct nor old_/new_ columns is rejected
    with pytest.raises(ValueError):
        affected_partitions(base.select("id"), "day")


def test_cli_backfill(spark, base, tmp_path, capsys):
    import json as _json

    from synthea2omop_etl_spark.cli import main

    old_p = str(tmp_path / "old")
    new_p = str(tmp_path / "new")
    target = str(tmp_path / "agg_cli")
    base.write.parquet(old_p)
    new = base.withColumn(
        "v", F.when(F.col("day") == 1, F.col("v") + 9).otherwise(F.col("v"))
    )
    new.write.parquet(new_p)
    (
        base.groupBy("day", "kind")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .write.partitionBy("day")
        .parquet(target)
    )

    assert main([
        "backfill", "--old", old_p, "--new", new_p, "--keys", "id",
        "--partition-col", "day", "--group-cols", "day,kind",
        "--sum-cols", "v", "--target", target,
    ]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["affected_partitions"] == ["1"]
    got = {
        tuple(r)
        for r in spark.read.parquet(target)
        .select("day", "kind", "n_rows", "sum_v")
        .collect()
    }
    want = {
        tuple(r)
        for r in spark.read.parquet(new_p)
        .groupBy("day", "kind")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == want

    # partition col outside group cols is a usage error
    assert main([
        "backfill", "--old", old_p, "--new", new_p, "--keys", "id",
        "--partition-col", "day", "--group-cols", "kind",
        "--target", target,
    ]) == 2
