"""synthea2omop_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference Synthea→OMOP ETL stack (see SURVEY.md), re-expressed Spark-first:
DataFrame/SQL logical plans optimized by Catalyst, parquet-columnar storage,
broadcast joins for dimensions, AQE for runtime re-planning.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, tuned shuffle partitions)
- ``sources``    readers (CSV permissive + malformed-row repair, parquet, TSV
                 vocabulary) and writers (parquet layers, insert-if-absent)
- ``operators``  the generic operator library: cast-or-null typing, dense-id
                 assignment, dedupe/first-per-group, anti-join upsert,
                 measurement/observation routing, concept mapping
- ``functions``  scalar function surface (date/string/math parity helpers)
- ``domains``    one pure DataFrame→DataFrame transform per OMOP domain
- ``derived``    observation_period, cost, death derived tables
- ``analytics``  achilles_lite characterization analytics
- ``llm_ops``    beyond-reference large-scale ops: dedup (exact/minhash/
                 simhash/jaccard/embedding), ANN similarity, text analysis,
                 multimodal column plumbing
- ``plans``      step DAG + JSON checkpointing (resume / force-restart)
- ``streaming``  Structured Streaming ingest over the events table
"""

__version__ = "0.1.0"
