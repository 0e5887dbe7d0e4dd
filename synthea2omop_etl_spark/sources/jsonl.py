"""JSONL corpus source/sink — the LLM-training-data interchange format.

Beyond-reference surface (the reference ingests CSV only,
`etl_pipeline/etl_setup.py:326-336`): web-scale text corpora ship as
gzipped JSONL shards, and the scale rules differ from CSV:

- **schema is pinned, never inferred** — inference is a full extra pass
  over 100 TB; callers pass the StructType (or use ``document_schema``);
- **corrupt records are split, not dropped**: PERMISSIVE mode routes
  unparseable lines to ``_corrupt_record``; ``read_jsonl_split`` returns
  (good, bad) DataFrames so the pipeline can quarantine bad shards the
  way the reference quarantines malformed CSV rows (S3,
  `python/preprocess_synthea_csv.py:155-229`) — same design, different
  wire format;
- column pruning pushes into the JSON parser (Spark's JacksonParser
  parses only requested fields), so ``select('text')`` over a wide
  corpus stays cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents-table shape as a JSONL corpus schema.
def document_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )


_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Line-source JSONL parse with the corrupt-record column attached.

    text source + ``from_json`` rather than ``spark.read.json``: the json
    source forbids filtering on only the corrupt column without caching
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), while this shape keeps both the
    good and quarantine branches as single-pass plans over one text scan
    — the right contract at corpus scale (no cache, no second read).
    """
    full = schema.add(T.StructField(_CORRUPT, T.StringType()))
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("j")
    )
    return parsed.select("j.*")


def read_jsonl_projected(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Fast-path JSONL read WITHOUT corrupt-record capture.

    Dropping the quarantine contract is what unlocks parser-side column
    pruning: with a corrupt column present, Catalyst must keep the full
    schema (corruptness is defined against every declared field), but
    here OptimizeJsonExprs shrinks the ``from_json`` schema to exactly
    the selected fields — a wide corpus read projected to ``text`` parses
    only ``text``. Use this for analytics over already-validated shards;
    use ``read_jsonl_split`` at the ingest boundary.
    """
    parsed = spark.read.text(path).select(
        F.from_json(F.col("value"), schema).alias("j")
    )
    return parsed.select("j.*")


def read_jsonl_split(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): parsed rows vs quarantined raw lines."""
    df = read_jsonl(spark, path, schema)
    good = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, bad


def write_jsonl(
    df: DataFrame, path: str, compression: str = "gzip", n_files: int | None = None
) -> None:
    """Shard-friendly JSONL sink (gzip by default, like public corpora)."""
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").option("compression", compression).json(path)
