"""Bigram language-model quality scoring — the KenLM-perplexity-filter
stand-in for training-data curation.

Real pipelines (CCNet/Gopher lineage) score candidate documents with an
n-gram LM trained on a trusted corpus and drop the high-perplexity tail.
No LM toolkit exists in this environment, so this is the same shape built
from Spark primitives end-to-end: train = two aggregations over the
trusted slice; score = a join from each document's bigrams to the count
tables and one average of log-probabilities. Everything stays in
whole-stage codegen — tokenize/slice/zip are JVM expressions, the joins
are plain equi-joins (AQE broadcasts the count tables while they fit; at
100 TB the model tables shard and the join shuffles on w1/w2, which is
exactly how distributed KenLM scoring jobs behave).

Smoothing is add-alpha over the training vocabulary:

    p(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)

where c(w1) is the count of w1 as a bigram LEFT context and V the
trained vocabulary size. Unseen bigrams and unseen contexts fall back to
the same formula with c=0 — scored, not crashed, which is the point of
smoothing. A document with no bigrams (0-1 tokens) scores NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import tokens


def bigram_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, order preserved by
    construction (slice+zip, no posexplode/sort needed)."""
    arr = tokens(text_col)
    # clamp: a 0-token doc would hand slice length -1 (runtime error)
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    zipped = F.arrays_zip(
        F.slice(arr, 1, n1).alias("w1"),
        F.slice(arr, 2, n1).alias("w2"),
    )
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    # per-row tokenize + pair-zip + explode runs map-side on the scan's
    # task count — widen a narrow source first (r12; results
    # partitioning-independent). Byte floor: the lm_doc_score chain
    # walks this path three times, and spreading a sub-MB source lost
    # more to the exchanges than the fan-out bought back (sf0.1 A/B
    # 3.24 s vs 1.49 s unfloored-vs-untouched; sf1 won 2.24 s vs 3.99).
    return (
        spread_if_narrow(docs, id_col, min_bytes_per_slot=128 << 10)
        .select(F.col(id_col).alias("id"), F.explode(zipped).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_model(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the LM: (bigram_counts[w1,w2,cb],
    context_counts[w1,cl], vocab[1 row: __vs]).

    The context table is the bigram table RE-aggregated — c(w1) =
    Σ_w2 c(w1,w2) by definition — so the training corpus is tokenized
    and shuffled once, not twice, and the second aggregation runs over
    the (much smaller) bigram count table (r12, guide §2.3/§2.4). The
    vocabulary size stays a LAZY 1-row frame (broadcast into the scoring
    projection) instead of an eager ``collect()``: no driver-paced job at
    model-build time, and the whole score executes as one action."""
    pairs = bigram_pairs(docs, text_col, id_col)
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    contexts = bigrams.groupBy("w1").agg(F.sum("cb").alias("cl"))
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    vocab = (
        # same narrow-scan tokenize (and the same byte floor) as pairs
        spread_if_narrow(docs, min_bytes_per_slot=128 << 10)
        .select(F.explode(tokens(text_col)).alias("t"))
        .agg(F.coalesce(F.countDistinct("t"), F.lit(0)).alias("__vs"))
    )
    return bigrams, contexts, vocab


def _logprob(alpha: float, vocab_size: Column | int) -> Column:
    cb = F.coalesce(F.col("cb"), F.lit(0))
    cl = F.coalesce(F.col("cl"), F.lit(0))
    return F.log((cb + alpha) / (cl + alpha * vocab_size))


def lm_quality_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document LM quality: (id_col, n_bigrams, n_oov, lm_score).

    ``lm_score`` is the mean bigram log-probability (higher = more like
    the training corpus; -lm_score is log-perplexity), rounded to 4
    decimals. ``n_oov`` counts bigrams never seen in training — the
    coverage signal quality gates read alongside the score. ``model``
    defaults to self-training on ``docs`` (corpus-internal typicality)."""
    if model is None:
        model = train_bigram_model(docs, text_col, id_col)
    bigrams, contexts, vocab = model
    if isinstance(vocab, DataFrame):
        # lazy 1-row vocab frame: broadcast-crossed into the projection
        vs: Column | int = F.col("__vs")
        attach = lambda d: d.crossJoin(F.broadcast(vocab))  # noqa: E731
    else:
        # legacy int form (callers that computed their own model tuple)
        vs = int(vocab)
        attach = lambda d: d  # noqa: E731
    pairs = bigram_pairs(docs, text_col, id_col)
    scored = (
        attach(pairs.join(bigrams, ["w1", "w2"], "left")
               .join(contexts, ["w1"], "left"))
        .select(
            "id",
            F.col("cb").isNull().cast("int").alias("oov"),
            _logprob(alpha, vs).alias("lp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").alias("n_oov"),
        F.round(F.avg("lp"), 4).alias("lm_score"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            "lm_score",
        )
    )
