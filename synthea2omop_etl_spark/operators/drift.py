"""Distribution-drift metrics: PSI over numeric columns, KL/JS over
token distributions.

A training-data pipeline has to answer "did this source shift?" before
it answers anything else — drift between the corpus a model was tuned on
and the corpus being ingested today is the silent failure mode of every
refresh. Two standard read-outs:

- **PSI (population stability index)** over a numeric column: bin the
  metric on REFERENCE-derived bounds, compare binned proportions;
  PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref). The monitoring-industry rule
  of thumb (PSI < 0.1 stable, > 0.25 shifted) rides on per-bin terms,
  which this operator returns alongside the total.
- **KL / Jensen–Shannon divergence** over token distributions: the
  text-corpus twin — token counts per segment, Laplace-smoothed over the
  UNION vocabulary, KL both directions plus the symmetric bounded JS.

Spark-first shape: the reference bounds (min/max) and the segment totals
enter the plan as broadcast one-row aggregates (crossJoin), never a
driver collect; binning/tokenizing is map-side; each metric is then one
combinable groupBy on a small key domain (``bins`` cells, or the corpus
vocabulary — Zipf-skewed, but the per-key state is two longs, so skew
costs nothing). All arithmetic (Laplace smoothing included) is integer
counts until the final ln/ratio, expressed identically in DuckDB for
hash grading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import tokens


def psi_drift(
    df: DataFrame,
    value_col: str,
    seg_col: str,
    ref_val: str,
    cur_val: str,
    bins: int = 10,
) -> DataFrame:
    """PSI between the ``ref_val`` and ``cur_val`` segments of ``df``.

    Bin bounds come from the REFERENCE segment only (the deployed
    convention: the monitoring bins are frozen when the reference
    snapshot is taken); current values outside the reference range clamp
    into the edge bins. Laplace-smoothed with +0.5 per bin so an empty
    bin on either side stays finite. Output: one row per bin
    (bin, n_ref, n_cur, p_ref 6dp, p_cur 6dp, psi_term 6dp) plus the
    total in every row (psi_total 6dp) so the read-out is self-contained.
    """
    both = df.where(F.col(seg_col).isin([ref_val, cur_val])).select(
        F.col(value_col).cast("double").alias("v"),
        (F.col(seg_col) == ref_val).cast("long").alias("is_ref"),
    )
    bounds = both.where(F.col("is_ref") == 1).agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    raw_bin = F.floor((F.col("v") - F.col("lo")) / width).cast("bigint")
    bin_ = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw_bin))
    per_bin = (
        both.crossJoin(F.broadcast(bounds))
        .select(bin_.alias("bin"), "is_ref")
        .groupBy("bin")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    tot_ref = F.sum("n_ref").over(w_all)
    tot_cur = F.sum("n_cur").over(w_all)
    p_ref = (F.col("n_ref") + 0.5) / (tot_ref + 0.5 * bins)
    p_cur = (F.col("n_cur") + 0.5) / (tot_cur + 0.5 * bins)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    with_terms = per_bin.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round(term, 6).alias("psi_term"),
        term.alias("_t"),
    )
    return with_terms.select(
        "bin",
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        "psi_term",
        F.round(F.sum("_t").over(w_all), 6).alias("psi_total"),
    ).orderBy("bin")


def duck_psi_drift(
    table: str,
    value_col: str,
    seg_col: str,
    ref_val: str,
    cur_val: str,
    bins: int = 10,
) -> str:
    """DuckDB twin of :func:`psi_drift` (identical binning + smoothing)."""
    return f"""
    WITH both_seg AS (
      SELECT CAST({value_col} AS DOUBLE) AS v,
             CASE WHEN {seg_col} = '{ref_val}' THEN 1 ELSE 0 END AS is_ref
      FROM {table} WHERE {seg_col} IN ('{ref_val}', '{cur_val}')
    ), bounds AS (
      SELECT MIN(v) AS lo, MAX(v) AS hi FROM both_seg WHERE is_ref = 1
    ), per_bin AS (
      SELECT LEAST({bins} - 1, GREATEST(0,
               CAST(floor((v - lo) / ((hi - lo) / {float(bins)}))
                    AS BIGINT))) AS bin,
             CAST(SUM(is_ref) AS BIGINT) AS n_ref,
             CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
      FROM both_seg, bounds GROUP BY 1
    ), terms AS (
      SELECT bin, n_ref, n_cur,
             (n_ref + 0.5) / (SUM(n_ref) OVER () + 0.5 * {bins}) AS pr,
             (n_cur + 0.5) / (SUM(n_cur) OVER () + 0.5 * {bins}) AS pc
      FROM per_bin
    )
    SELECT bin, n_ref, n_cur,
           ROUND(pr, 6) AS p_ref, ROUND(pc, 6) AS p_cur,
           ROUND((pc - pr) * ln(pc / pr), 6) AS psi_term,
           ROUND(SUM((pc - pr) * ln(pc / pr)) OVER (), 6) AS psi_total
    FROM terms ORDER BY bin
    """


def kl_token_drift(
    df: DataFrame, text_col: str, seg_col: str, ref_val: str
) -> DataFrame:
    """KL/JS divergence between the token distribution of segment
    ``ref_val`` and that of everything else.

    Token counts per side come from one explode + conditional-sum pass;
    the union vocabulary is the groupBy key domain itself (no outer
    join). Laplace +0.5 over the union vocabulary keeps both
    distributions strictly positive. Output (single row): vocab_size,
    n_ref_tokens, n_cur_tokens, kl_ref_cur (6dp), kl_cur_ref (6dp),
    js (6dp).
    """
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    # the tokenize + explode runs map-side on the scan's task count —
    # widen a narrow source first (r12; no co-location need →
    # round-robin; results partitioning-independent). Byte floor: skip
    # the exchange on sources too small to amortize it.
    pairs = spread_if_narrow(df, min_bytes_per_slot=128 << 10).select(
        (F.col(seg_col) == ref_val).cast("long").alias("is_ref"),
        F.explode(tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    per_tok = pairs.groupBy("token").agg(
        F.sum("is_ref").alias("cp"),
        F.sum(1 - F.col("is_ref")).alias("cq"),
    )
    w_all = Window.partitionBy(F.pmod(F.lit(0), F.lit(1)))
    v = F.count(F.lit(1)).over(w_all)
    np_, nq = F.sum("cp").over(w_all), F.sum("cq").over(w_all)
    smoothed = per_tok.select(
        "cp",
        "cq",
        ((F.col("cp") + 0.5) / (np_ + 0.5 * v)).alias("p"),
        ((F.col("cq") + 0.5) / (nq + 0.5 * v)).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    return smoothed.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("cp").alias("n_ref_tokens"),
        F.sum("cq").alias("n_cur_tokens"),
        F.round(
            F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6
        ).alias("kl_ref_cur"),
        F.round(
            F.sum(F.col("q") * F.log(F.col("q") / F.col("p"))), 6
        ).alias("kl_cur_ref"),
        F.round(
            F.sum(
                F.col("p") / 2 * F.log(F.col("p") / m)
                + F.col("q") / 2 * F.log(F.col("q") / m)
            ),
            6,
        ).alias("js"),
    )


def duck_kl_token_drift(
    table: str, text_col: str, seg_col: str, ref_val: str
) -> str:
    """DuckDB twin of :func:`kl_token_drift`."""
    return f"""
    WITH pairs AS (
      SELECT CASE WHEN {seg_col} = '{ref_val}' THEN 1 ELSE 0 END AS is_ref,
             unnest(regexp_split_to_array(trim({text_col}), '\\s+')) AS token
      FROM {table} WHERE len(trim({text_col})) > 0
    ), per_tok AS (
      SELECT token, CAST(SUM(is_ref) AS BIGINT) AS cp,
             CAST(SUM(1 - is_ref) AS BIGINT) AS cq
      FROM pairs WHERE token <> '' GROUP BY 1
    ), smoothed AS (
      SELECT cp, cq,
             (cp + 0.5) / (SUM(cp) OVER () + 0.5 * COUNT(*) OVER ()) AS p,
             (cq + 0.5) / (SUM(cq) OVER () + 0.5 * COUNT(*) OVER ()) AS q
      FROM per_tok
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(cp) AS BIGINT) AS n_ref_tokens,
           CAST(SUM(cq) AS BIGINT) AS n_cur_tokens,
           ROUND(SUM(p * ln(p / q)), 6) AS kl_ref_cur,
           ROUND(SUM(q * ln(q / p)), 6) AS kl_cur_ref,
           ROUND(SUM(p / 2 * ln(p / ((p + q) / 2))
                     + q / 2 * ln(q / ((p + q) / 2))), 6) AS js
    FROM smoothed
    """
