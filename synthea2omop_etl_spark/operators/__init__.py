from synthea2omop_etl_spark.operators.dedupe import (  # noqa: F401
    anti_join_new_rows,
    first_per_group,
)
from synthea2omop_etl_spark.operators.idmap import (  # noqa: F401
    assign_dense_ids,
    build_id_map,
)
from synthea2omop_etl_spark.operators.split import route_numeric  # noqa: F401
from synthea2omop_etl_spark.operators.typing import (  # noqa: F401
    NUMERIC_RE,
    TIMESTAMP_RE,
    UUID_RE,
    cast_or_null,
    enum_or_null,
    null_if_empty,
)
