"""Z-order (Morton-curve) file layout — multi-column data skipping.

A linearly sorted layer prunes well on ONE column: min/max footer stats
(sources/versioned.py) are tight on the sort key and useless on every
other column. The Delta OPTIMIZE ZORDER BY treatment fixes that by
sorting on an interleaved-bit curve over several columns at once, so
each output file covers a small rectangle of the multi-dimensional key
space and min/max stats stay selective on EVERY z-ordered column.

Spark-first shape, per the "maintenance op, not hot path" budget:

- Each column is first rank-normalized into ``2^bits`` equi-population
  buckets using approxQuantile boundaries (one driver-side array of
  ≤256 floats per column — skew-robust where a min/max linear scale
  would collapse a Zipf column into one bucket). The bucket id is the
  count of boundaries ≤ value, computed by a codegen ``aggregate`` fold
  over the broadcast boundary array — no join, no UDF.
- Bucket ids are bit-interleaved into one integer z-value with plain
  shift/mask arithmetic (pure Catalyst expressions).
- ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` gives each
  output file a contiguous z-range — one full shuffle, exactly what any
  clustering rewrite costs — and the parquet footer then records tight
  per-file min/max for all interleaved columns.

At 100 TB this is the periodic OPTIMIZE job: one range shuffle of the
layer, after which every point/range predicate on any z-column skips
most files via the manifest stats index (read_version(prune=...)),
instead of only predicates on a single sort key. Boundaries come from
approxQuantile at 1% relative error — bucket SIZES wobble, bucket
MEMBERSHIP stays deterministic for a given boundary array, and layout
quality is insensitive to boundary error at these widths.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.sources.writers import write_then_swap

_SUPPORTED = ("int", "bigint", "smallint", "tinyint", "float", "double",
              "date", "timestamp", "timestamp_ntz")


def _as_double(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_micros(col).cast("double")
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    return col.cast("double")


def zorder_expr(bounds: dict[str, list[float]], dtypes: dict[str, str]) -> Column:
    """Bit-interleaved z-value over rank-bucketed columns.

    ``bounds[col]`` are the ascending interior bucket boundaries
    (len = 2^bits − 1); the bucket id is the number of boundaries ≤ the
    value (NULLs land in bucket 0, sorting first — the same convention
    as NULLS FIRST). Interleaving takes bit k of column i to output bit
    ``k·n_cols + i`` so all columns contribute equally at every scale.
    """
    cols = list(bounds)
    n = len(cols)
    bits = (len(next(iter(bounds.values()))) + 1).bit_length() - 1
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = _as_double(F.col(c), dtypes[c])
        arr = F.array(*[F.lit(float(b)) for b in bounds[c]])
        bucket = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(v.isNotNull() & (v >= b), 1).otherwise(0),
        ).cast("bigint")
        for k in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, k).bitwiseAND(F.lit(1)), k * n + i
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bits: int = 8,
    rel_err: float = 0.01,
) -> DataFrame:
    """Return ``df`` clustered on the z-curve over ``cols`` into
    ``n_files`` range partitions (callers write the result; see
    :func:`write_zordered` for the write-then-swap wrapper)."""
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"unknown z-order column {c!r}")
        if dtypes[c] not in _SUPPORTED:
            raise ValueError(
                f"z-order column {c!r} has unsupported type {dtypes[c]!r}"
                f" (supported: {_SUPPORTED})"
            )
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    num = df.select(
        *[_as_double(F.col(c), dtypes[c]).alias(c) for c in cols]
    )
    quantiles = num.approxQuantile(list(cols), probs, rel_err)
    bounds = {c: qs for c, qs in zip(cols, quantiles)}
    z = zorder_expr(bounds, dtypes).alias("__z")
    return (
        df.select("*", z)
        .repartitionByRange(max(1, n_files), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    target_file_mb: int = 128,
    bits: int = 8,
) -> dict:
    """OPTIMIZE-ZORDER a layer in place: cluster ``df`` on the z-curve
    and write-then-swap to ``path``, sizing the file count from the
    incoming plan's estimated bytes (fallback 1 file per 2M rows when
    the estimate is unavailable). Returns {"files", "cols"}."""
    try:
        est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        est_bytes = int(min(est, 1 << 50))
    except Exception:
        est_bytes = 0
    if est_bytes > 0:
        n_files = max(1, -(-est_bytes // (target_file_mb * 1024 * 1024)))
    else:
        n_files = max(1, -(-df.count() // 2_000_000))
    out = zorder_layout(df, cols, n_files, bits=bits)
    write_then_swap(out, path)
    spark = df.sparkSession
    files = spark.read.parquet(path).inputFiles()
    return {"files": len(files), "cols": list(cols)}


def stats_pruned_fraction(
    spark, path: str, col: str, lo, hi
) -> tuple[int, int]:
    """(files that could be skipped, total files) for a range predicate
    on ``col`` using parquet FOOTER min/max only — the observable the
    z-order layout optimizes. Pure metadata read; used by tests and the
    CLI layout report, conservative on missing stats (counts the file
    as unprunable)."""
    import pyarrow.parquet as pq

    files = [
        f[len("file:"):] if f.startswith("file:") else f
        for f in spark.read.parquet(path).inputFiles()
    ]
    skip = 0
    for f in files:
        try:
            md = pq.ParquetFile(os.path.abspath(f)).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            i = idx[col]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no stats")
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) > hi or max(maxs) < lo:
                skip += 1
        except Exception:
            continue
    return skip, len(files)
