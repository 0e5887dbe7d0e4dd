"""SCD Type-2 dimension maintenance: versioned attributes with
(valid_from, valid_to) ranges, NULL valid_to marking the current row.

The reference's dimensions are overwrite-in-place (provider/care_site
re-derived per load, `etl_pipeline/etl_setup.py` CREATE TABLE AS); a
warehouse at scale keeps history instead. This is the standard SCD2
merge expressed as pure set algebra — one join against the *current*
slice, three unions, no MERGE statement and no driver loop:

    history  (valid_to IS NOT NULL)        → passes through untouched
    current ⋉ changed update               → closed (valid_to = batch ts)
    current without a differing update     → passes through
    changed update + brand-new key         → inserted as current

Change detection is null-safe (<=>) over the tracked columns only, so
attribute NULLs neither mask nor fabricate changes. A batch carries ONE
effective timestamp; duplicate keys within a batch collapse to a single
row deterministically (ordered by the tracked columns) — apply batches
in chronological order for full history.

At 100 TB: the join is keyed on the dimension key (dims are the small
side of a star — usually broadcastable); history rides through as a
scan-union with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.operators.dedupe import first_per_group


def scd2_init(
    snapshot: DataFrame, valid_from, key: str, tracked: list[str]
) -> DataFrame:
    """Bootstrap an SCD2 table from a first snapshot (all rows current)."""
    return snapshot.select(
        key,
        *tracked,
        F.lit(valid_from).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )


def _differs(tracked: list[str], left: str, right: str) -> Column:
    """Null-safe any-column-changed predicate."""
    out = F.lit(False)
    for c in tracked:
        out = out | ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
    return out


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    batch_ts,
    key: str,
    tracked: list[str],
) -> DataFrame:
    """Fold one update batch into an SCD2 table. Pure; returns the new table.

    ``updates`` needs (key, *tracked). Idempotent for identical attribute
    values: an update equal to the current row is a no-op, so replaying a
    batch does not create spurious versions.
    """
    ts = F.lit(batch_ts).cast("timestamp")
    latest = first_per_group(
        updates.select(key, *tracked),
        [key],
        [F.col(c).asc_nulls_first() for c in tracked],
    ).alias("u")

    history = dim.where(F.col("valid_to").isNotNull())
    current = dim.where(F.col("valid_to").isNull()).alias("c")

    changed_keys = (
        current.join(latest, on=key, how="inner")
        .where(_differs(tracked, "c", "u"))
        .select(key)
    )
    closed = (
        current.join(changed_keys, key, "left_semi")
        .withColumn("valid_to", ts)
    )
    unchanged = current.join(changed_keys, key, "left_anti")

    new_versions = (
        latest.join(current, key, "left_anti")  # brand-new keys
        .unionByName(latest.join(changed_keys, key, "left_semi"))
        .select(
            key,
            *tracked,
            ts.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    return (
        history.unionByName(closed)
        .unionByName(unchanged)
        .unionByName(new_versions)
    )


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current slice (the reference's overwrite-in-place view)."""
    return dim.where(F.col("valid_to").isNull())


def scd2_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time slice: rows whose validity range covers ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return dim.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
