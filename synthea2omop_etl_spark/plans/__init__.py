from synthea2omop_etl_spark.plans.pipeline import (  # noqa: F401
    ETL_STEPS,
    Checkpoint,
    run_pipeline,
)
