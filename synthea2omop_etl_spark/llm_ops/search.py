"""BM25 ranking — the retrieval scorer on top of the inverted-index
layer (llm_ops/index.py builds the postings; this ranks).

Okapi BM25 with the standard k1/b parametrization and the
non-negative idf variant ln(1 + (N − df + ½)/(df + ½)) (the Lucene
form — never negative for df > N/2, so stopword-ish query terms degrade
gracefully instead of flipping sign).

Spark-first shape, and why it scales:
- The query's term set is a literal ``isin`` filter applied DIRECTLY to
  the exploded (doc, token) pairs — term frequencies are only aggregated
  for query terms, so the shuffle carries O(matching pairs), not the
  corpus vocabulary.
- Document length (ALL tokens, not just query terms) is a map-side
  ``size(tokens())`` — no second explode.
- Corpus constants (N, avgdl) and per-term df are broadcast one-row /
  |terms|-row aggregates (crossJoin / broadcast join), never a driver
  collect.
- The final top-k is a rank over the 4dp-ROUNDED score with doc_id as
  tiebreaker: raw-float ordering is not reproducible across engines for
  near-tie scores; rounding makes ties explicit and the cut
  deterministic — the same convention as every other hash-graded float
  ranking in this repo.

At 100 TB the only data-sized shuffle is the per-(doc, term) count whose
key domain is |query terms| × |matching docs|; everything else is
broadcast. For high-QPS serving you'd precompute the posting lists once
(index.py) and ship deltas — this operator is the batch/eval-time scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import tokens


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for the query ``terms``.

    Output: rank, doc id, n_terms_hit, score (4dp) — ranked by rounded
    score desc, id asc.
    """
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    # per-row tokenization feeds two consumers (doc lengths + the term
    # explode) and inherits the scan's task count — widen a narrow
    # source first (r12; results partitioning-independent). Byte floor:
    # tokenize-and-count is only moderately heavy, so sources too small
    # to amortize the exchange pass through.
    docs = spread_if_narrow(df, id_col, min_bytes_per_slot=128 << 10).select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("toks"),
    )
    lens = docs.select("doc_id", F.size("toks").alias("dl"))
    corpus = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("token"))
        .where(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        tf.join(F.broadcast(df_), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("c"), 4).alias("score"),
    )
    # The cut itself is orderBy+limit — Spark plans TakeOrderedAndProject
    # (per-partition partial top-k, driver merge of k·partitions rows),
    # NOT a single-partition global sort. Only the <= k survivors get the
    # rank window (non-foldable constant partition, bounded input).
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.partitionBy(F.pmod(F.lit(0), F.lit(1))).orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "n_terms_hit", "score")
        .orderBy("rank")
    )


def duck_bm25_topk(
    table: str,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 50,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (identical idf/tf arithmetic)."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH docs AS (
      SELECT {id_col} AS doc_id,
             CASE WHEN len(trim({text_col})) = 0 THEN []
                  ELSE regexp_split_to_array(trim({text_col}), '\\s+')
             END AS toks
      FROM {table}
    ), lens AS (
      SELECT doc_id, len(toks) AS dl FROM docs
    ), corpus AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
      FROM lens
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
      WHERE token IN ({term_list})
      GROUP BY 1, 2
    ), dfreq AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
             ROUND(SUM(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * ({k1} + 1))
               / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))
             ), 4) AS score
      FROM tf
      JOIN dfreq USING (token)
      JOIN lens ON lens.doc_id = tf.doc_id
      CROSS JOIN corpus
      GROUP BY 1
    )
    SELECT * FROM (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS INT) AS rank,
             doc_id, n_terms_hit, score
      FROM scored
    ) WHERE rank <= {k}
    ORDER BY rank
    """


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_const: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) —
    the standard hybrid-retrieval combiner: given N independently ranked
    lists over the same id space (e.g. BM25 lexical + embedding-cosine
    vector), each candidate scores Σ_lists 1/(k_const + rank), rewarding
    agreement without any score calibration between retrievers.

    Output: (rank, id_col, n_lists, rrf_score) — top ``k`` by the
    6dp floor-rounded score desc, id asc (the repo's derived-float
    convention, so the DuckDB twin ranks identically). ``n_lists`` is
    how many input lists carried the candidate.

    Plan shape: union of the (already tiny, top-k-sized) rank lists →
    ONE combinable groupBy → TakeOrderedAndProject cut → rank window
    over the ≤k survivors. Nothing corpus-sized moves — fusion cost is
    independent of corpus scale by construction.
    """
    from functools import reduce

    from synthea2omop_etl_spark.operators.timeseries import _floor_round

    slim = [
        df.select(
            F.col(id_col).alias("__id"),
            F.col(rank_col).cast("int").alias("__r"),
        )
        for df in ranked
    ]
    scored = (
        reduce(DataFrame.unionByName, slim)
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            _floor_round(
                F.sum(F.lit(1.0) / (F.lit(float(k_const)) + F.col("__r"))),
                6,
            ).alias("rrf_score"),
        )
    )
    top = scored.orderBy(
        F.col("rrf_score").desc(), F.col("__id").asc()
    ).limit(k)
    w = Window.partitionBy(F.pmod(F.lit(0), F.lit(1))).orderBy(
        F.col("rrf_score").desc(), F.col("__id").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", F.col("__id").alias(id_col), "n_lists", "rrf_score")
        .orderBy("rank")
    )
