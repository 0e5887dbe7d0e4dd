"""JSONL corpus source: schema-pinned parse, corrupt-line quarantine,
round-trip through the gzip sink."""

from __future__ import annotations

import gzip

from synthea2omop_etl_spark.sources.jsonl import (
    document_schema,
    read_jsonl_split,
    write_jsonl,
)
from synthea2omop_etl_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_jsonl_split_quarantines_bad_lines(spark, tmp_path):
    shard = tmp_path / "shard.jsonl"
    lines = [
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}',
        '{"doc_id": 2, "text": "beta", "lang": "de", "source": "s", "n_chars": 4}',
        "{not json at all",
        '{"doc_id": "also-bad-type-but-parseable": }',
        '{"doc_id": 3, "text": "gamma"}',  # missing fields -> nulls, still good
    ]
    shard.write_text("\n".join(lines) + "\n")
    good, bad = read_jsonl_split(spark, str(shard), document_schema())
    g = {r["doc_id"]: r for r in good.collect()}
    assert set(g) == {1, 2, 3}
    assert g[3]["lang"] is None  # missing field, not corrupt
    raw = [r["raw_line"] for r in bad.collect()]
    assert len(raw) == 2 and all(x.startswith("{") for x in raw)


def test_jsonl_roundtrip_gzip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out, n_files=4)
    good, bad = read_jsonl_split(spark, out, document_schema())
    assert bad.count() == 0
    assert good.count() == docs.count()
    # gzip shards on disk (public-corpus convention)
    import os

    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert parts and all(f.endswith(".gz") for f in parts)
    with gzip.open(os.path.join(out, parts[0]), "rt") as fh:
        first = fh.readline()
    assert first.strip().startswith("{")


def test_jsonl_parse_prunes_columns(spark, tmp_path):
    """Column pruning reaches the JSON parser: ReadSchema carries only the
    selected field."""
    docs = load_table(spark, SF, "documents").limit(100)
    out = str(tmp_path / "c2")
    write_jsonl(docs, out)
    from synthea2omop_etl_spark.sources.jsonl import read_jsonl_projected

    fast = read_jsonl_projected(spark, out, document_schema())
    plan = fast.select("text")._jdf.queryExecution().optimizedPlan().toString()
    # OptimizeJsonExprs prunes the from_json schema to the selected field:
    # the parser never materializes the unused corpus columns. (The
    # quarantining reader intentionally keeps the full schema — corruptness
    # is defined against every declared field.)
    assert "StructField(text" in plan
    assert "n_chars" not in plan
    # and the data is identical to the quarantining reader's good branch
    good, _ = read_jsonl_split(spark, out, document_schema())
    assert fast.count() == good.count()
