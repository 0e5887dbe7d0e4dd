"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard training-data hygiene step (every serious corpus pipeline
removes eval-set overlap before training). Semantics: a corpus doc is
contaminated when it shares ≥ ``min_shared`` DISTINCT word n-gram shingles
with the benchmark set as a whole.

Scale shape (100 TB corpus, small benchmark):
- both sides hash shingles to mod-P int64 (md5-derived, hashing.py — so
  the whole pipeline carries an exact DuckDB oracle);
- the benchmark shingle set is DISTINCT'd and **broadcast** — corpus
  shingles explode map-side and hash-join the broadcast set with no
  corpus shuffle;
- the only shuffle is the final count-distinct per corpus doc, keyed on
  doc id (map-side combinable after the join prunes to matching shingles
  — typically a tiny fraction of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.dedup import word_shingle_hashes


def decontaminate_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Per corpus doc: number of distinct shingles shared with the
    benchmark set and the contamination flag.

    Output: (doc_id, n_shared, contaminated) for every corpus doc —
    uncontaminated docs carry n_shared = 0, so the result doubles as the
    keep/drop routing table for the training pipeline.
    """
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    # Row-amplifying md5-shingle explode: widen a narrow scan first
    # (round-robin — no downstream co-location need) so the per-shingle
    # hashing runs on every slot instead of inheriting the source file
    # count (r12; single-row-group parquet decodes in ONE task).
    c_sh = spread_if_narrow(corpus).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(word_shingle_hashes(F.col(text_col), shingle_n))
        ).alias("h"),
    )
    b_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(
                    word_shingle_hashes(F.col(text_col), shingle_n)
                )
            ).alias("h")
        )
        .distinct()
    )
    # (doc_id, h) rows are already unique — the corpus side exploded
    # array_distinct per doc — so the distinct count is a plain count:
    # one map-side-combinable aggregate instead of the two-phase
    # distinct-aggregate rewrite (one Exchange, not two; r12 guide §2.4).
    shared = (
        c_sh.join(F.broadcast(b_sh), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias(
                "contaminated"
            ),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_n: int = 3,
) -> DataFrame:
    """Pairwise shingle-Jaccard between corpus sources — the governance
    view of cross-source contamination (mirror sites, syndicated content,
    scraped duplicates SHARED between feeds, which doc-level dedup only
    removes after the redundant ingest has been paid for).

    Output: ``(group_a, group_b, n_shared, jaccard)`` for every unordered
    source pair sharing ≥1 distinct word-``shingle_n``-gram; Jaccard =
    |A∩B| / (|A|+|B|−|A∩B|), floor-half-up 4dp.

    Scale shape: the corpus reduces to DISTINCT (source, shingle) rows —
    one combinable aggregate — before any pairing; the self-join fans out
    per shingle only across the sources containing it (≤ n_sources, a
    constant), and the intersection/size counts are map-side combinable.
    The per-source set sizes join back broadcast (n_sources rows). No
    corpus-sized shuffle after the initial reduction.
    """
    from synthea2omop_etl_spark.llm_ops.dedup import word_shingle_hashes
    from synthea2omop_etl_spark.llm_ops.text import _round4
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    # no spread keys → round-robin: hashing on the ~n_sources-ary group
    # column would cap the explode at n_sources partitions, and keying on
    # text re-collides duplicate documents (ADVICE r09)
    # the reduced (source, shingle) layer feeds THREE consumers (sizes +
    # both self-join sides); a lazy localCheckpoint computes the explode
    # + distinct once (the funnel-stage idiom — without it each branch
    # re-runs the corpus-sized shingle hashing, r12)
    sets = (
        spread_if_narrow(docs)
        .select(
            F.col(group_col).alias("g"),
            F.explode(word_shingle_hashes(text_col, shingle_n)).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sets.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    a, b = sets.alias("a"), sets.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.g") < F.col("b.g")),
        )
        .groupBy(
            F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = F.broadcast(sizes.select(F.col("g").alias("group_a"), F.col("n").alias("na")))
    sb = F.broadcast(sizes.select(F.col("g").alias("group_b"), F.col("n").alias("nb")))
    union_n = F.col("na") + F.col("nb") - F.col("n_shared")
    return (
        inter.join(sa, "group_a")
        .join(sb, "group_b")
        .select(
            "group_a",
            "group_b",
            "n_shared",
            _round4(F.col("n_shared") / union_n).alias("jaccard"),
        )
    )
