"""Inverted-index construction over a document corpus.

The search-side primitive the llm_ops family was missing: token → posting
list. Built as explode → two-level aggregation, all JVM-side:

1. tokenize (shared ``tokens()`` splitter from text.py) and explode —
   map-side, no shuffle;
2. distinct (token, doc_id) then groupBy token — Spark plans the distinct
   as a partial+final aggregate on the same (token,) hash partitioning the
   final groupBy needs, so AQE coalesces the pair into one exchange;
3. per token: document frequency + the first ``k`` doc ids (ascending) as
   a comma-joined string.

Scale notes: the shuffle key is the token, i.e. Zipf-skewed — stopword
tokens are exactly the heavy hitters. The ``min_df``/``max_df_frac``
fences are therefore not just an IR-quality knob but the skew control:
dropping tokens in more than ``max_df_frac`` of docs removes the largest
posting lists before they concentrate on one reducer. The truncated
posting list bounds per-token state (slice of a sorted collect_set), so no
group's aggregation buffer exceeds O(df) ids pre-truncation; for corpora
where df itself is unbounded, cap with the same two-pass rank trick used
in operators/percentiles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import tokens


def posting_lists(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 10,
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Build truncated posting lists: (token, doc_freq, posting) where
    ``posting`` is the first ``k`` doc ids ascending, comma-joined.

    ``min_df`` drops hapax noise; ``max_df_frac`` drops stopword-frequency
    tokens (df > frac·N). N is computed as a scalar subquery-style
    broadcast (cross join of a 1-row aggregate), not a driver collect.
    """
    pairs = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokens(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
    )
    n_docs = df.select(
        F.countDistinct(id_col).cast("double").alias("_n_docs")
    )
    agg = pairs.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.array_join(
            F.slice(F.array_sort(F.collect_set("doc_id")), 1, k), ","
        ).alias("posting"),
    )
    return (
        agg.crossJoin(F.broadcast(n_docs))
        .where(
            (F.col("doc_freq") >= min_df)
            & (F.col("doc_freq") <= F.col("_n_docs") * F.lit(max_df_frac))
        )
        .select("token", "doc_freq", "posting")
    )
