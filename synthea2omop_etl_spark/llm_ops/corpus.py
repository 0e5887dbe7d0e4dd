"""End-to-end corpus curation: the llm_ops stages composed into one
declarative plan — the LLM-corpus analogue of plans/pipeline.py's OMOP DAG.

Stage order follows the standard web-corpus recipe (quality gate before
dedup: garbage is cheap to drop and shrinks every later stage; exact
dedup before near-dup: the md5 groupBy is one cheap shuffle and removes
the mass MinHash would otherwise re-discover):

1. quality gate      — composite score ≥ threshold (text.quality_score)
2. language gate     — lang_id_guess ∈ allowed set
3. exact dedup       — keep min doc_id per md5(text) (one hash-groupBy)
4. near-dup removal  — MinHash/LSH verified pairs; the LARGER id of each
                       pair drops (deterministic survivor policy)
5. split assignment  — hash-stable train/val/test (curation.split_assign)

Everything is one lazy DataFrame chain: Catalyst pushes the quality and
language predicates into the same scan, the whole prefix is computed
once, and the only shuffles are the two dedup stages (md5 groupBy; LSH
band join over survivors — already bounded, and now over a *filtered*
corpus). At 100 TB you materialize keep2 (the exact-deduped layer) to
parquet between stages 3 and 4 — the minhash packed layer's
persist_path= contract.

The whole composition is hash-graded: llm_ops/oracles._minhash_ctes
takes a source relation, so the DuckDB oracle runs the identical chain
over the identically filtered corpus (see queries.corpus_curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.curation import split_assign
from synthea2omop_etl_spark.llm_ops.dedup import minhash_lsh_candidates
from synthea2omop_etl_spark.llm_ops.text import lang_id_guess, quality_score
from synthea2omop_etl_spark.operators.dedupe import first_per_group

#: most-recent cached gated+exact-deduped layer (bounded at ONE entry) —
#: the swap idiom shared with dedup._swap_packed_cache / sketches bloom
#: bits: both the minhash input and the survivor anti-join read this
#: layer, and without the cache each branch would re-run the quality/
#: language gates and the dedup window over the raw scan.
_GATED_CACHE: list[DataFrame] = []


#: bounded ONE-entry slot for the widened (repartitioned) raw layer —
#: released on the next curate_corpus call, like _GATED_CACHE below.
_SPREAD_CACHE: list[DataFrame] = []


#: cache the widened raw layer only when the input is genuinely small:
#: "narrow" (fewer files than slots) does NOT imply small — one multi-GB
#: parquet file is narrow, and caching the whole text corpus in executor
#: storage is exactly the pressure the persist_path contract avoids
#: (ADVICE r09). Above this byte total the spread layer stays uncached:
#: the repartition still buys the fan-out parallelism, it just recomputes.
_SPREAD_CACHE_MAX_BYTES = 8 << 30


def _input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the frame's input files via the Hadoop FS
    API (works for file:// and remote stores alike); None when the
    source is not file-backed or the probe fails."""
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


def _swap_spread_cache(df: DataFrame) -> DataFrame:
    while _SPREAD_CACHE:
        try:
            _SPREAD_CACHE.pop().unpersist()
        except Exception:
            pass
    _SPREAD_CACHE.append(df)
    return df.cache()


def _swap_gated_cache(df: DataFrame) -> DataFrame:
    while _GATED_CACHE:
        try:
            _GATED_CACHE.pop().unpersist()
        except Exception:
            pass
    _GATED_CACHE.append(df)
    return df.cache()


def curate_corpus(
    docs: DataFrame,
    quality_min: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    lm_score_min: float | None = None,
    persist_path: str | None = None,
) -> DataFrame:
    """Surviving documents + their split assignment.

    Input needs (doc_id, text); all other columns ride along. Output is
    the input columns + ``split``.

    ``lm_score_min`` adds the perplexity-filter stage (off by default to
    keep the graded composition stable): a bigram LM self-trained on the
    quality+language-gated slice scores every gated doc, and docs whose
    mean bigram log-prob falls below the threshold drop before dedup —
    CCNet's "perplexity against a clean LM" gate with the gated corpus
    standing in for the clean corpus. Adds two count-table joins; docs
    with no bigrams (NULL score) are kept (no evidence ≠ bad).

    ``persist_path``: materialize the gated+exact-deduped layer (and the
    minhash packed-signature layer) to parquet under this directory
    instead of executor-memory cache — the 100 TB contract: the layer is
    consumed by BOTH the signature build and the survivor anti-join, and
    a memory cache refills under pressure exactly when the data is big;
    a parquet layer is filled once and scanned columnar thereafter.
    Results are bit-identical either way.
    """
    # The regex-heavy gates evaluate wherever the scan runs, and Catalyst
    # pushes filters back through a bare repartition — so a narrow input
    # (few/single-row-group files) runs them on as many cores as it has
    # files. When the spread gate fires (narrow = small), CACHE the
    # widened layer: InMemoryRelation is an optimizer barrier, so the
    # gates, md5 dedup window, and signature pack all read it 32-wide.
    # The bounded swap slot keeps repeated calls flat (same idiom as the
    # gated-layer cache below). Wide inputs (the 100 TB case) take the
    # untouched pushdown path.
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    spread = spread_if_narrow(docs, "doc_id")
    if spread is not docs:
        nbytes = _input_bytes(docs)
        if nbytes is not None and nbytes <= _SPREAD_CACHE_MAX_BYTES:
            docs = _swap_spread_cache(spread)
        else:
            # narrow but big (or unprobeable): widen without caching —
            # the gates still run 32-wide, they just recompute per branch
            docs = spread
    gated = docs.where(
        (quality_score("text") >= F.lit(quality_min))
        & (lang_id_guess("text").isin(*langs))
    )
    if lm_score_min is not None:
        from synthea2omop_etl_spark.llm_ops.lm_score import lm_quality_score

        scores = lm_quality_score(gated).select(
            "doc_id", "lm_score"
        )
        gated = (
            gated.join(scores, "doc_id", "left")
            .where(
                F.col("lm_score").isNull()
                | (F.col("lm_score") >= F.lit(lm_score_min))
            )
            .drop("lm_score")
        )
    exact = first_per_group(
        gated.withColumn("__h", F.md5("text")),
        ["__h"],
        [F.col("doc_id").asc()],
    ).drop("__h")
    if persist_path:
        import os

        exact_path = os.path.join(persist_path, "exact")
        exact.write.mode("overwrite").parquet(exact_path)
        exact = docs.sparkSession.read.parquet(exact_path)
        packed_path = os.path.join(persist_path, "packed")
    else:
        exact = _swap_gated_cache(exact)
        packed_path = None
    pairs = minhash_lsh_candidates(
        exact,
        "text",
        "doc_id",
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        shingle_n=shingle_n,
        persist_path=packed_path,
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = exact.join(drops, "doc_id", "left_anti")
    return survivors.withColumn(
        "split", split_assign(F.col("doc_id").cast("string"))
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """Per-split corpus accounting: doc count and raw char volume."""
    return curated.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
    )
