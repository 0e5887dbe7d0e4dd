from synthea2omop_etl_spark.analytics.achilles_lite import (  # noqa: F401
    age_at_first_observation,
    concept_distribution,
    record_counts,
    run_sql,
    top_k_concepts,
    visit_duration_distribution,
)
