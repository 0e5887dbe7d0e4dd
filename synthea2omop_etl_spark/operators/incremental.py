"""Incremental aggregate maintenance: merge a delta into a base aggregate
without recomputing from raw history.

The reference re-runs its INSERT..SELECT aggregates from scratch per load
(`etl_pipeline/etl_setup.py:230-279` resume semantics re-derive whole
tables); at 100 TB you keep the *aggregate* table and fold each arriving
batch into it. That works exactly when every maintained statistic is a
commutative monoid merge:

- count/sum  → SUM of partials
- min/max    → MIN/MAX of partials
- avg        → maintained as (sum, count), derived at read time
- distinct   → HLL registers (operators/sketches.py), merged by
  ``max(max_rho)`` per bucket — the reason registers, not estimates,
  are the stored representation.

Spark-first shape: the delta is pre-aggregated (map-side combine over
only the new rows), then a unionByName + one groupBy over (keys) whose
input is |base groups| + |delta groups| rows — never the raw history.
The same merge serves backfill (N deltas at once) and compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported merge kinds → combining function over partial columns.
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summation
    "min": F.min,
    "max": F.max,
}


def aggregate_batch(
    df: DataFrame, keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Partial-aggregate one batch. ``specs``: out_col → (kind, in_col).

    kind ∈ {sum, count, min, max}. The output is mergeable state — feed
    it to ``merge_aggregates`` along with any prior state.
    """
    aggs = []
    for out, (kind, col) in specs.items():
        if kind == "count":
            aggs.append(F.count(col).alias(out))
        elif kind in _MERGE:
            aggs.append(getattr(F, kind)(col).alias(out))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    states: list[DataFrame], keys: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Fold any number of partial-aggregate states into one.

    Input cardinality is the sum of group counts, not row counts — the
    incremental-maintenance property. Associative and commutative, so
    daily → monthly → yearly roll-ups compose from the same states.
    """
    if not states:
        raise ValueError("no states to merge")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    aggs = [
        _MERGE[kind](out).alias(out) for out, (kind, _) in specs.items()
    ]
    return u.groupBy(*keys).agg(*aggs)


def merge_hll_registers(
    states: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Merge HLL register tables (from operators.sketches.hll_registers).

    Register merge is ``max`` per (group, bucket) — lossless: the merged
    registers are identical to registers computed over the union of the
    raw inputs, so incremental distinct counts carry NO extra error.
    """
    if not states:
        raise ValueError("no states to merge")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols, "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
