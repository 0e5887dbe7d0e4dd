"""Record linkage and snapshot-reconciliation operators.

The reference validates its migrations by re-running INSERT..SELECT batches
and counting matches (etl_pipeline/etl_setup.py resume semantics;
query_achilles_results.sh row-count reconciliation). At 100 TB you do not
re-run — you *diff*: compare yesterday's materialized layer against today's
and classify per-key changes. ``snapshot_diff`` is that operator.

``blocked_fuzzy_pairs`` is the approximate-matching counterpart: an
edit-distance self-match that never goes all-pairs. Candidate generation is
an equi-join on cheap blocking keys (Catalyst hash join, shuffle on the
block key only), and the quadratic levenshtein verify runs inside each
block. This is the standard record-linkage blocking design (Fellegi-Sunter
style pipelines); at 1000 executors the block key is the unit of
parallelism, so choose keys with bounded selectivity — audit candidate
blocking keys with operators/skew.py:skew_report before shipping one, so
a pathological block surfaces as a diagnostic row instead of a straggler
task.

Both operators are pure DataFrame compositions — no UDFs, fully
whole-stage-codegen'd, and both are oracle-graded against DuckDB (its
``levenshtein`` agrees with Spark's on UTF-8 strings).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block_cols: Sequence[Column | str],
    max_distance: int = 3,
) -> DataFrame:
    """Self-match rows whose ``name_col`` is within ``max_distance`` edits.

    Returns (k1, k2, name1, name2, edit_distance) with k1 < k2 — each
    unordered pair once. Only pairs sharing every blocking key are
    considered: recall is bounded by the blocking scheme (a pair split
    across blocks is never seen), which is the explicit contract of
    blocking-based linkage — the alternative, all-pairs levenshtein, is
    O(n²) rows and does not exist at scale.

    The expensive comparison runs on DISTINCT names per block, not rows:
    real corpora carry many exact copies of a name, and a row-level
    self-join is quadratic in the copy count (10x replication = 100x
    levenshtein work — measured exactly that on the 10x scale-stress
    set). Here the verify cost is quadratic only in a block's distinct
    names; the expansion back to key pairs is two equi-joins whose output
    is the answer itself, so its size is irreducible. All shuffles are
    equi-joins on (block, name) — blocks remain the skew unit.
    """
    nb = len(block_cols)
    blocks = [
        F.col(c).alias(f"_bk{i}") if isinstance(c, str) else c.alias(f"_bk{i}")
        for i, c in enumerate(block_cols)
    ]
    side = df.select(
        F.col(key_col).alias("_k"), F.col(name_col).alias("_n"), *blocks
    )
    bcols = [f"_bk{i}" for i in range(nb)]
    names = side.select(*bcols, "_n").distinct()
    left = names.toDF(*(*(f"b{i}" for i in range(nb)), "n1"))
    right = names.toDF(*(*(f"c{i}" for i in range(nb)), "n2"))
    cond = [left[f"b{i}"] == right[f"c{i}"] for i in range(nb)]
    # lex-ordered distinct-name pairs: each unordered name pair once,
    # identical names pair with themselves (their copies still match)
    name_pairs = (
        left.join(right, cond, "inner")
        .where(F.col("n1") <= F.col("n2"))
        .withColumn("edit_distance", F.levenshtein("n1", "n2"))
        .where(F.col("edit_distance") <= max_distance)
        .select(*(f"b{i}" for i in range(nb)), "n1", "n2", "edit_distance")
    )
    s1 = side.toDF(*("ka", "n1", *(f"b{i}" for i in range(nb))))
    s2 = side.toDF(*("kb", "n2", *(f"c{i}" for i in range(nb))))
    expanded = (
        name_pairs.join(s1, [f"b{i}" for i in range(nb)] + ["n1"])
        .join(
            s2,
            [s2[f"c{i}"] == name_pairs[f"b{i}"] for i in range(nb)]
            + [s2["n2"] == name_pairs["n2"]],
        )
        # n1 < n2 rows carry every (ka, kb) combo once; n1 == n2 rows
        # need the key order to keep each unordered pair once
        .where((F.col("n1") < name_pairs["n2"]) | (F.col("ka") < F.col("kb")))
    )
    lo = F.col("ka") < F.col("kb")
    return expanded.select(
        F.when(lo, F.col("ka")).otherwise(F.col("kb")).alias("k1"),
        F.when(lo, F.col("kb")).otherwise(F.col("ka")).alias("k2"),
        F.when(lo, F.col("n1")).otherwise(name_pairs["n2"]).alias("name1"),
        F.when(lo, name_pairs["n2"]).otherwise(F.col("n1")).alias("name2"),
        "edit_distance",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify per-key changes between two snapshots of one table.

    Full outer join on ``keys``; each key is labeled ``added`` (new only),
    ``removed`` (old only), ``changed`` (both sides, any compare column
    differs under null-safe equality), or ``unchanged``. Output carries the
    key columns, ``change_type``, and ``old_``/``new_`` copies of every
    compare column.

    One shuffle per side on the key — the minimum for a key-aligned diff.
    When both snapshots are written bucketed by the key
    (sources/writers.py:write_bucketed), the exchange disappears entirely
    and the diff is a zipper merge per bucket; that is the intended
    deployment at 100 TB (diff two daily layers without a shuffle).
    ``unchanged`` rows are dropped by default so the output is the change
    set, not the table.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, list(keys), "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = joined.withColumn("change_type", change).select(
        *keys,
        "change_type",
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out


def apply_snapshot_diff(
    old: DataFrame,
    diff: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Replay a ``snapshot_diff`` change set onto the old snapshot.

    Inverse of ``snapshot_diff``: ``apply(old, diff(old, new)) == new``
    row-for-row (the round-trip property test_linkage.py pins). Removed
    and changed keys are anti-joined out of ``old``; added and changed
    rows enter with their ``new_`` values. This is the incremental-layer
    maintenance path: ship the (small) change set, not the snapshot —
    the anti-join broadcasts when the change set is small relative to the
    table, so replay touches the big side map-side only.
    """
    drop_keys = diff.where(
        F.col("change_type").isin("removed", "changed")
    ).select(*keys)
    kept = old.join(F.broadcast(drop_keys), list(keys), "left_anti")
    incoming = diff.where(
        F.col("change_type").isin("added", "changed")
    ).select(
        *keys, *[F.col(f"new_{c}").alias(c) for c in compare_cols]
    )
    return kept.select(*keys, *compare_cols).unionByName(incoming)
