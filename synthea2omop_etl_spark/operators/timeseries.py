"""Hypertable-style time-bucket rollup with gap-fill + LOCF.

The reference has no time-series surface (its events are OMOP dated
facts), but a training-data/metrics pipeline needs dense per-bucket
series: bucket → aggregate → fill the empty buckets → carry the last
observation forward. Spark-first shape:

- the bucket spectrum per group comes from ``sequence(min, max)`` +
  ``explode`` — generated distributed, never on the driver;
- the fill join is group-local (same keys as the aggregate → AQE reuses
  the exchange);
- LOCF is ``last(value, ignorenulls=True)`` over an unbounded-preceding
  window partitioned by group — one pass, no self-join.

At 100 TB the bucket spectrum is tiny relative to the events (hours ×
groups), so the generated side broadcasts; the heavy side is touched by
exactly one shuffle (the bucket aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _floor_round(c: Column, decimals: int = 4) -> Column:
    """Floor-based half-up rounding (ties toward +inf) — the repo's
    cross-engine rounding convention for DERIVED floats. Both engines run
    the IDENTICAL double multiply/floor/divide, so results agree even on
    .xxxx5-boundary values, where Spark's F.round (BigDecimal.valueOf =
    shortest-decimal-repr HALF_UP) and DuckDB's ROUND (rounds the exact
    binary value) disagree by the last digit. DuckDB twin:
    ``FLOOR(x * 1e{d} + 0.5) / 1e{d}``. Use plain F.round only on values
    that are exact in both engines (integers, decimal sums)."""
    scale = F.lit(float(10**decimals))
    return F.floor(c * scale + F.lit(0.5)) / scale


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    aggs: dict[str, Column],
    bucket: str = "hour",
    locf_cols: list[str] | None = None,
    zero_cols: list[str] | None = None,
) -> DataFrame:
    """Dense per-(group, bucket) aggregate series.

    ``aggs`` maps output name → aggregate Column over the bucketed rows.
    ``locf_cols`` are filled with the last non-null prior value per group;
    ``zero_cols`` are filled with 0 (the count convention).
    """
    bucketed = (
        df.withColumn("__b", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy(*group_cols, "__b")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    spectrum = (
        bucketed.groupBy(*group_cols)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            *group_cols,
            F.explode(
                F.sequence(
                    F.col("__lo"),
                    F.col("__hi"),
                    F.expr(f"interval 1 {bucket}"),
                )
            ).alias("__b"),
        )
    )
    dense = spectrum.join(bucketed, [*group_cols, "__b"], "left")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = dense
    for c in locf_cols or []:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in zero_cols or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out.withColumnRenamed("__b", "bucket_ts")


def duck_gapfill_hourly(
    table: str,
    ts_col: str,
    group_col: str,
    agg_sql: dict[str, str],
    locf_cols: list[str],
    zero_cols: list[str],
) -> str:
    """DuckDB SQL equivalent of an hourly ``time_bucket_gapfill`` (oracle)."""
    agg_list = ", ".join(f"{sql} AS {n}" for n, sql in agg_sql.items())
    locf = ", ".join(
        f"last_value(b.{c} IGNORE NULLS) OVER "
        f"(PARTITION BY s.{group_col} ORDER BY s.h) AS {c}"
        for c in locf_cols
    )
    zeros = ", ".join(f"COALESCE(b.{c}, 0) AS {c}" for c in zero_cols)
    cols = ", ".join(x for x in [locf, zeros] if x)
    return f"""
    WITH bucketed AS (
      SELECT {group_col}, date_trunc('hour', {ts_col}) AS h, {agg_list}
      FROM {table} GROUP BY 1, 2
    ),
    spans AS (
      SELECT {group_col}, MIN(h) AS lo, MAX(h) AS hi FROM bucketed GROUP BY 1
    ),
    spectrum AS (
      SELECT {group_col},
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM spans
    )
    SELECT s.{group_col}, s.h AS bucket_ts, {cols}
    FROM spectrum s
    LEFT JOIN bucketed b ON b.{group_col} = s.{group_col} AND b.h = s.h
    """


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    window_rows: int = 10,
) -> DataFrame:
    """Exponentially-weighted moving average per key — the standard
    smoothing/decay aggregate (pandas ``ewm(alpha).mean()`` seeded at the
    window's first value), bounded to the last ``window_rows`` rows.

    Recurrence s ← α·x + (1−α)·s folded LEFT-TO-RIGHT over the window's
    values: ``collect_list`` over a ROWS frame materializes the bounded
    history (≤ window_rows values per row — constant state, no
    whole-partition buffering), and one ``aggregate`` lambda folds it.
    All JVM expressions inside whole-stage codegen; total work is
    O(rows × window_rows) with NO shuffle beyond the one key/order sort
    every windowed aggregate needs. The bounded frame is also what keeps
    the weights in float range — an unbounded two-pass formulation needs
    (1−α)^(−i) terms that overflow past a few thousand rows.

    ``order_cols`` must be a total order per key (add a unique tiebreaker
    column) or the fold order — and hence the result — is ambiguous.
    ``value_col`` must be non-NULL (shared contract with
    :func:`holt_linear`): Spark's collect_list silently drops NULLs from
    the frame while DuckDB's list() keeps them, so a NULL would make the
    two folds walk different histories.

    Adds ``ewma`` (4-dp floor-half-up rounded via :func:`_floor_round` —
    the repo's cross-engine rounding convention for derived floats) to
    the input. DuckDB twin: ``list(x) OVER (ROWS n PRECEDING)`` +
    ``list_reduce`` with the identical lambda — graded as
    ``ewma_prices``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    hist = F.collect_list(F.col(value_col).cast("double")).over(w)
    a = F.lit(float(alpha))

    def fold(lst: Column) -> Column:
        rest = F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0)))
        return F.aggregate(
            rest,
            F.element_at(lst, 1),
            lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
        )

    # materialize the window ONCE: folding the window expression directly
    # makes the analyzer instantiate one collect_list per reference
    # (slice/size/element_at → 3 buffers per row); folding the COLUMN
    # keeps a single window buffer
    return (
        df.withColumn("__hist", hist)
        .withColumn("ewma", _floor_round(fold(F.col("__hist")), 4))
        .drop("__hist")
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    lookback: int = 20,
    min_history: int = 8,
    z_thresh: float = 3.0,
    decimals: int = 2,
) -> DataFrame:
    """Flag rows whose value is a rolling-window outlier for their key.

    The classic self-baselining anomaly detector: per key, compare each
    observation against the mean/stddev of its own PRECEDING ``lookback``
    observations (frame excludes the current row, so an anomaly never
    suppresses itself) and keep rows with |z| > ``z_thresh``. Rows with
    fewer than ``min_history`` predecessors are warm-up and never flag.

    One window sort per key is the entire cost — no self-join against a
    baseline table, no second scan. State per row is the bounded frame
    (three running aggregates over <= lookback rows), so partitions size
    by key cardinality, not history length. ``order_cols`` must totally
    order each key's rows (pass a unique id as tiebreaker).

    Cross-engine determinism: the window sums run in the INTEGER domain
    (values scaled by 10^decimals and rounded to bigint), so Σc and Σc²
    are exact regardless of summation order; mean and stddev are then
    derived with a fixed IEEE expression both engines evaluate
    identically — a float window-average differs between engines at
    ~1e-13, which is enough to flip a 4dp rounding boundary.

    Returns the flagged rows only: key, order cols, value, baseline mean
    (4dp), baseline stddev (4dp), z (4dp).
    """
    scale = float(10**decimals)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    c = F.floor(F.col(value_col).cast("double") * scale + 0.5).cast("bigint")
    base = df.select(
        key_col,
        *order_cols,
        (c.cast("double") / scale).alias("v"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(c).over(w).cast("double").alias("s"),
        F.sum(c * c).over(w).cast("double").alias("q"),
    )
    mu = F.col("s") / (F.col("n") * scale)
    sd = (
        F.sqrt(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        )
        / scale
    )
    z = (F.col("v") - mu) / sd
    base = base.select(
        key_col, *order_cols, "v", "n",
        mu.alias("mu"), sd.alias("sd"), z.alias("z"),
    )
    z = F.col("z")
    return (
        base.where(
            (F.col("n") >= min_history)
            & (F.col("sd") > 0)
            & (F.abs(z) > z_thresh)
        )
        .select(
            key_col,
            *order_cols,
            F.round("v", 4).alias("value"),
            F.round("mu", 4).alias("baseline_mean"),
            F.round("sd", 4).alias("baseline_sd"),
            F.round(z, 4).alias("z"),
        )
        .orderBy(key_col, *order_cols)
    )


def duck_rolling_zscore_anomalies(
    table: str,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    lookback: int = 20,
    min_history: int = 8,
    z_thresh: float = 3.0,
    decimals: int = 2,
) -> str:
    """DuckDB twin of :func:`rolling_zscore_anomalies` (identical
    integer-domain window sums and IEEE derivation)."""
    scale = float(10**decimals)
    order_sql = ", ".join(order_cols)
    frame = (
        f"PARTITION BY {key_col} ORDER BY {order_sql} "
        f"ROWS BETWEEN {lookback} PRECEDING AND 1 PRECEDING"
    )
    return f"""
    WITH ints AS (
      SELECT {key_col}, {order_sql},
             CAST(floor(CAST({value_col} AS DOUBLE) * {scale} + 0.5)
                  AS BIGINT) AS c
      FROM {table}
    ), base AS (
      SELECT {key_col}, {order_sql},
             CAST(c AS DOUBLE) / {scale} AS v,
             COUNT(*) OVER ({frame}) AS n,
             CAST(SUM(c) OVER ({frame}) AS DOUBLE) AS s,
             CAST(SUM(c * c) OVER ({frame}) AS DOUBLE) AS q
      FROM ints
    ), derived AS (
      SELECT {key_col}, {order_sql}, v, n,
             s / (n * {scale}) AS mu,
             sqrt((q - s * s / n) / (n - 1)) / {scale} AS sd
      FROM base
    )
    SELECT {key_col}, {order_sql},
           ROUND(v, 4) AS value,
           ROUND(mu, 4) AS baseline_mean,
           ROUND(sd, 4) AS baseline_sd,
           ROUND((v - mu) / sd, 4) AS z
    FROM derived
    WHERE n >= {min_history} AND sd > 0
      AND abs((v - mu) / sd) > {z_thresh}
    ORDER BY {key_col}, {order_sql}
    """


def mean_shift_changepoint(
    df: DataFrame,
    order_col: str,
    value_col: str,
    min_segment: int = 5,
) -> DataFrame:
    """Single change-point detection: the split maximizing the before/
    after mean gap, computed entirely from prefix sums.

    Every candidate split's two means come from ONE cumulative window
    over the ordered series (sum/count so far vs totals), so the whole
    search is O(n) after the sort — not the O(n²) literal "recompute both
    means per candidate". The single-partition window is bounded by the
    series length (one row per ``order_col`` value — a calendar, not a
    fact table; aggregate first).

    The winning split is picked by rank on the 2dp-ROUNDED gap with
    ``order_col`` as tiebreaker — raw-float argmax is not reproducible
    across engines when two candidates differ below summation noise;
    rounding makes near-ties explicit and the tiebreaker deterministic.

    Output (single row): split point (last value of the left segment),
    n_before/n_after, mean_before/mean_after/abs_shift (2dp).
    """
    w_cum = (
        Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    v = F.col(value_col).cast("double")
    cand = df.select(
        F.col(order_col).alias("split_at"),
        F.sum(v).over(w_cum).alias("cs"),
        F.count(F.lit(1)).over(w_cum).alias("cn"),
        F.sum(v).over(w_all).alias("ts"),
        F.count(F.lit(1)).over(w_all).alias("tn"),
    ).where(
        (F.col("cn") >= min_segment)
        & (F.col("tn") - F.col("cn") >= min_segment)
    )
    mb = F.col("cs") / F.col("cn")
    ma = (F.col("ts") - F.col("cs")) / (F.col("tn") - F.col("cn"))
    scored = cand.select(
        "split_at",
        F.col("cn").alias("n_before"),
        (F.col("tn") - F.col("cn")).alias("n_after"),
        F.round(mb, 2).alias("mean_before"),
        F.round(ma, 2).alias("mean_after"),
        F.round(F.abs(ma - mb), 2).alias("abs_shift"),
    )
    w_rank = Window.partitionBy(F.pmod(F.lit(0), F.lit(1))).orderBy(
        F.col("abs_shift").desc(), F.col("split_at")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def duck_mean_shift_changepoint(
    series_sql: str,
    order_col: str,
    value_col: str,
    min_segment: int = 5,
) -> str:
    """DuckDB twin of :func:`mean_shift_changepoint`; ``series_sql`` is a
    subquery producing the ordered series (order_col, value_col)."""
    return f"""
    WITH series AS ({series_sql}), cand AS (
      SELECT {order_col} AS split_at,
             SUM(CAST({value_col} AS DOUBLE)) OVER (ORDER BY {order_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
             COUNT(*) OVER (ORDER BY {order_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
             SUM(CAST({value_col} AS DOUBLE)) OVER () AS ts,
             COUNT(*) OVER () AS tn
      FROM series
    ), scored AS (
      SELECT split_at, CAST(cn AS BIGINT) AS n_before,
             CAST(tn - cn AS BIGINT) AS n_after,
             ROUND(cs / cn, 2) AS mean_before,
             ROUND((ts - cs) / (tn - cn), 2) AS mean_after,
             ROUND(abs((ts - cs) / (tn - cn) - cs / cn), 2) AS abs_shift
      FROM cand
      WHERE cn >= {min_segment} AND tn - cn >= {min_segment}
    )
    SELECT split_at, n_before, n_after, mean_before, mean_after, abs_shift
    FROM scored
    ORDER BY abs_shift DESC, split_at
    LIMIT 1
    """


def acf(
    df: DataFrame, order_col: str, value_col: str, max_lag: int = 7
) -> DataFrame:
    """Autocorrelation function of a (typically pre-aggregated) series
    at lags 1..``max_lag`` — the seasonality/persistence read-out that
    tells a forecaster which lags matter.

    r_k = Σ(x_t − x̄)(x_{t−k} − x̄) / Σ(x_t − x̄)² with the GLOBAL mean
    x̄ in both factors (the standard ACF estimator). Execution shape:

    - x̄ rides along every row via an unbounded window over the
      non-foldable ``pmod`` partition constant (the bounded-summary
      trick from the verify gotchas — ``F.lit(0)`` would constant-fold
      the partition spec away);
    - all ``max_lag`` lag columns come from ONE ordered window pass
      (one sort), then a single combinable aggregate produces every
      numerator plus the shared denominator in one row;
    - the per-lag rows are unpivoted from that 1-row frame with an
      ``explode`` of literal structs — O(max_lag) output, no joins.

    Intended for series that are small AFTER aggregation (daily
    revenue: ~2.4k rows regardless of SF — the raw facts were already
    reduced by the caller's groupBy); the single-partition sort is over
    that reduced series, never the fact table. Lags whose overlap is
    empty (series shorter than k) return NULL, matching SUM-over-empty
    in both engines.

    Output: (lag, acf 4dp), lag 1..max_lag, ordered by lag.
    """
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    w_ord = w_all.orderBy("t")
    base = df.select(
        F.col(order_col).alias("t"),
        F.col(value_col).cast("double").alias("x"),
    )
    s1 = base.select("t", "x", F.avg("x").over(w_all).alias("mx"))
    lag_cols = [
        F.lag("x", k).over(w_ord).alias(f"x_{k}")
        for k in range(1, max_lag + 1)
    ]
    s2 = s1.select("x", "mx", *lag_cols)
    d = F.col("x") - F.col("mx")
    aggs = [F.sum(d * d).alias("den")] + [
        F.sum(d * (F.col(f"x_{k}") - F.col("mx"))).alias(f"num_{k}")
        for k in range(1, max_lag + 1)
    ]
    row = s2.agg(*aggs)
    structs = [
        F.struct(
            F.lit(k).alias("lag"),
            F.round(F.col(f"num_{k}") / F.col("den"), 4).alias("acf"),
        )
        for k in range(1, max_lag + 1)
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.lag", "s.acf")
        .orderBy("lag")
    )


def duck_acf(series_sql: str, order_col: str, value_col: str,
             max_lag: int = 7) -> str:
    """DuckDB twin of :func:`acf`; ``series_sql`` yields the ordered
    series (same arithmetic, same single global mean)."""
    lags = ", ".join(
        f"lag(x, {k}) OVER (ORDER BY t) AS x_{k}"
        for k in range(1, max_lag + 1)
    )
    nums = ", ".join(
        f"SUM((x - mx) * (x_{k} - mx)) AS num_{k}"
        for k in range(1, max_lag + 1)
    )
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS lag, ROUND(num_{k} / den, 4) AS acf FROM a"
        for k in range(1, max_lag + 1)
    )
    return f"""
    WITH base AS (
      SELECT {order_col} AS t, CAST({value_col} AS DOUBLE) AS x
      FROM ({series_sql})
    ), s1 AS (
      SELECT t, x, AVG(x) OVER () AS mx FROM base
    ), s2 AS (
      SELECT x, mx, {lags} FROM s1
    ), a AS (
      SELECT SUM((x - mx) * (x - mx)) AS den, {nums} FROM s2
    )
    {sel}
    ORDER BY lag
    """


def holt_linear(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    window_rows: int = 10,
    horizon: int = 1,
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per key — the
    trending twin of :func:`ewma` for series where simple EWMA lags a
    drift. Same execution shape: ``collect_list`` over a bounded ROWS
    frame (constant per-row state, one key-sort shuffle), ONE
    ``aggregate`` fold — but the accumulator is a (level, trend) STRUCT:

        s' = α·x + (1−α)·(s + b)
        b' = β·(s' − s) + (1−β)·b          seeded s=x₁, b=0

    s' is inlined twice in the lambda, IDENTICALLY in the Spark and
    DuckDB variants, so both engines execute the same arithmetic. Adds
    ``holt_level``, ``holt_trend`` and ``holt_forecast`` (level +
    horizon·trend — the h-step-ahead linear forecast), all 4-dp rounded.

    ``order_cols`` must be a total order per key (unique tiebreaker) or
    the fold order — and hence the result — is ambiguous. ``value_col``
    must be non-NULL (shared contract with :func:`ewma`): Spark's
    collect_list drops NULLs from the window buffer while DuckDB's
    list() keeps them, so a NULL would NULL-poison the DuckDB fold's
    level/trend where Spark merely skips the value.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    hist = F.collect_list(F.col(value_col).cast("double")).over(w)
    a, b = F.lit(float(alpha)), F.lit(float(beta))
    one = F.lit(1.0)

    def step(acc: Column, x: Column) -> Column:
        s_new = a * x + (one - a) * (acc["s"] + acc["b"])
        return F.struct(
            s_new.alias("s"),
            (b * ((a * x + (one - a) * (acc["s"] + acc["b"])) - acc["s"])
             + (one - b) * acc["b"]).alias("b"),
        )

    def fold(lst: Column) -> Column:
        rest = F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0)))
        init = F.struct(
            F.element_at(lst, 1).alias("s"), F.lit(0.0).alias("b")
        )
        return F.aggregate(rest, init, step)

    # floor-based half-up via the module convention (_floor_round):
    # observed on trend values of money series — see that helper's note
    def r4(c: Column) -> Column:
        return _floor_round(c, 4)

    # single window buffer — see the ewma note (3 references to the raw
    # window expression would instantiate 3 collect_list buffers per row)
    return (
        df.withColumn("__hist", hist)
        .withColumn("__acc", fold(F.col("__hist")))
        .drop("__hist")
        .withColumn("holt_level", r4(F.col("__acc.s")))
        .withColumn("holt_trend", r4(F.col("__acc.b")))
        .withColumn(
            "holt_forecast",
            r4(F.col("__acc.s") + F.lit(float(horizon)) * F.col("__acc.b")),
        )
        .drop("__acc")
    )


def duck_holt_linear(
    rows_sql: str,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    window_rows: int = 10,
    horizon: int = 1,
) -> str:
    """DuckDB twin of :func:`holt_linear`: the same bounded window list,
    the same fold via list_transform + list_reduce. DuckDB's list_reduce
    seeds from the FIRST element, so the transform maps each value x to
    the seed shape [x, 0.0] — the reduce then applies the recurrence
    from element 2 on, exactly like the Spark fold's slice-from-2.

    The accumulator is a 2-element LIST [level, trend], NOT a struct:
    DuckDB (≤1.0) evaluates a struct-pack lambda's fields sequentially
    against a mutated accumulator — the 'b' field would see the NEW 's'
    — which silently corrupts any recurrence whose fields read each
    other. list_value evaluates both children against the pristine
    accumulator. ``rows_sql`` yields key/order/value columns."""
    # ::DOUBLE on the smoothing constants so (1 - β) is the same IEEE
    # double Spark computes — DuckDB's bare (1 - 0.3) is DECIMAL 0.7
    # exactly, one ulp off double 1.0-0.3, which flips 4dp rounding on
    # boundary rows
    a = f"{float(alpha)!r}::DOUBLE"
    bb = f"{float(beta)!r}::DOUBLE"
    order = ", ".join(order_cols)
    s_new = f"({a} * x[1] + (1 - {a}) * (acc[1] + acc[2]))"
    return f"""
    WITH __r AS ({rows_sql}),
    __h AS (
      SELECT *,
        list_reduce(
          list_transform(
            list(CAST({value_col} AS DOUBLE)) OVER (
              PARTITION BY {key_col}
              ORDER BY {order}
              ROWS BETWEEN {window_rows - 1} PRECEDING AND CURRENT ROW
            ),
            x -> [x, 0.0::DOUBLE]
          ),
          (acc, x) -> [
            CAST({s_new} AS DOUBLE),
            CAST({bb} * ({s_new} - acc[1])
                 + (1 - {bb}) * acc[2] AS DOUBLE)
          ]
        ) AS __acc
      FROM __r
    )
    SELECT * EXCLUDE (__acc),
           FLOOR(__acc[1] * 1e4 + 0.5) / 1e4 AS holt_level,
           FLOOR(__acc[2] * 1e4 + 0.5) / 1e4 AS holt_trend,
           FLOOR((__acc[1] + {float(horizon)!r} * __acc[2]) * 1e4 + 0.5)
             / 1e4 AS holt_forecast
    FROM __h
    """
