"""Z-order (Morton-curve) clustered write layout for data skipping.

The reference leans on Postgres btree indexes for selective access
(`etl_pipeline/etl_setup.py` CREATE INDEX passim); a Spark/parquet engine
gets the same effect from *layout*: cluster rows so every file's min/max
envelope is tight on the filter columns, and the scan planner (file-level
stats) plus parquet row-group pruning skip the rest. A plain sort gives
one tight column; a Z-order interleave gives *every* participating column
a tight envelope at once — the standard lakehouse multi-dimensional
clustering technique.

Spark-first mechanics, all JVM expressions:

- per-column normalization to a ``2^bits`` integer grid using range
  boundaries from ``approxQuantile`` (sampled, driver-cheap, no global
  sort — at 100 TB a percent_rank normalization would be a full shuffle);
- bit interleave via ``shiftleft``/``bitwiseOR`` expression unrolling
  (bits × cols terms, whole-stage-codegen friendly);
- ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` → one range
  Exchange, files tile the curve.

``skipping_stats`` quantifies the win straight from parquet footers: the
fraction of files whose [min,max] envelope excludes a point predicate —
the number the scan planner actually uses.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grid_bucket(col: str, cuts: list[float], bits: int) -> Column:
    """Map a numeric column onto the 2^bits grid via range-boundary cuts.

    ``cuts`` are the interior quantile boundaries (len == 2^bits - 1); the
    CASE ladder is a binary-search-shaped nest Catalyst folds into a
    single codegen'd expression. NULLs land on cell 0.
    """
    c = F.col(col)
    expr: Column = F.lit(len(cuts))  # above the last cut
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(c <= F.lit(cuts[i]), F.lit(i)).otherwise(expr)
    return F.coalesce(expr, F.lit(0))


def zorder_column(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, Column]:
    """Attach a Morton interleave column over ``cols``.

    Grid boundaries come from one ``approxQuantile`` pass per column
    (sampled; relativeError 1/2^bits keeps cells balanced enough for
    tiling). Returns (df, z) where z interleaves the per-column grid
    cells bit by bit — at most 63 total bits.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    levels = (1 << bits) - 1
    probs = [i / (levels + 1) for i in range(1, levels + 1)]
    buckets = []
    for col in cols:
        cuts = df.stat.approxQuantile(col, probs, 1.0 / (levels + 1))
        # approxQuantile can repeat boundaries on skewed data; keep sorted
        # unique so the CASE ladder stays monotone.
        uniq: list[float] = []
        for v in cuts:
            if not uniq or v > uniq[-1]:
                uniq.append(v)
        buckets.append(_grid_bucket(col, uniq, bits))
    z: Column = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for cell in buckets:
            bit = F.shiftright(cell.cast("long"), b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return df, z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet tiled along the Z-curve of ``cols``.

    One range Exchange on z (sampled boundaries — no skew collapse), a
    partition-local sort, and the parquet writer's per-file/per-row-group
    min-max stats do the rest at read time.
    """
    base, z = zorder_column(df, cols, bits)
    (
        base.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def skipping_stats(path: str, col: str, value: float) -> dict:
    """Fraction of parquet files a point predicate ``col = value`` skips.

    Reads only footers (pyarrow) — the same min/max envelopes the scan
    uses for file pruning. Returns {files, skipped, skip_fraction}.
    """
    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    skipped = 0
    for f in files:
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            skipped += 1
            continue
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None and (value < lo or value > hi):
            skipped += 1
    return {
        "files": len(files),
        "skipped": skipped,
        "skip_fraction": skipped / max(1, len(files)),
    }
