from synthea2omop_etl_spark.derived.cost import cost  # noqa: F401
from synthea2omop_etl_spark.derived.death import death  # noqa: F401
from synthea2omop_etl_spark.derived.eras import (  # noqa: F401
    condition_era,
    drug_era,
)
from synthea2omop_etl_spark.derived.observation_period import (  # noqa: F401
    observation_period,
)
