from synthea2omop_etl_spark.domains.conditions import condition_occurrence  # noqa: F401
from synthea2omop_etl_spark.domains.devices import device_exposure  # noqa: F401
from synthea2omop_etl_spark.domains.medications import drug_exposure  # noqa: F401
from synthea2omop_etl_spark.domains.observations import (  # noqa: F401
    measurement_and_observation,
)
from synthea2omop_etl_spark.domains.payer import payer_plan_period  # noqa: F401
from synthea2omop_etl_spark.domains.person import person  # noqa: F401
from synthea2omop_etl_spark.domains.procedures import procedure_occurrence  # noqa: F401
from synthea2omop_etl_spark.domains.provider import care_site, provider  # noqa: F401
from synthea2omop_etl_spark.domains.visits import visit_occurrence  # noqa: F401
