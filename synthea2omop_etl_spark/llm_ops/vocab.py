"""Frequency-ranked vocabulary build + token-id encoding.

The tokenization step of a pretraining pipeline, distributed:

- ``build_vocab``: token → id by (frequency desc, token asc). The ranking
  window runs over the VOCABULARY (distinct tokens), not the corpus — a
  natural-language vocabulary is 10⁴-10⁶ rows regardless of corpus size,
  so the single-partition window is over data that fits trivially in one
  task; the corpus-sized work (the frequency count) is an ordinary
  map-side-combinable aggregate. Ids start at 1; 0 is reserved for OOV.

- ``encode_documents``: text → space-joined id sequence. posexplode keeps
  token order through the shuffle-free explode; the vocab joins in via
  broadcast (it is small by construction); order is restored per document
  by sorting (pos, id) structs inside the aggregation buffer — each
  document's buffer holds only its own tokens, so state is bounded by
  document length, not corpus size.

Real subword tokenizers (BPE/WordPiece) differ in how the vocab is
LEARNED (iterative merges), not in how it is applied — application is
exactly this broadcast-join shape, which is the part that must scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import tokens


def build_vocab(
    df: DataFrame, text_col: str, max_size: int | None = None
) -> DataFrame:
    """(token, n_uses, token_id) ranked by (frequency desc, token asc)."""
    freq = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_uses"))
    )
    # vocabulary-sized window: single partition over distinct tokens only
    w = Window.orderBy(F.col("n_uses").desc(), F.col("token").asc())
    vocab = freq.withColumn(
        "token_id", F.row_number().over(w).cast("long")
    )
    if max_size is not None:
        vocab = vocab.where(F.col("token_id") <= max_size)
    return vocab


def encode_documents(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """(id_col, n_tokens, ids) — ids is the space-joined token-id
    sequence in document order; OOV tokens encode as 0."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    ).where(F.col("token") != "")
    joined = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(0)).alias("tid"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tid"))),
        lambda s: s["tid"].cast("string"),
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.array_join(ordered, " ").alias("ids"),
    )
