from synthea2omop_etl_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
    sessionized_stats,
)
from synthea2omop_etl_spark.streaming.joins import (  # noqa: F401
    attribution_join,
    attribution_join_left,
)
from synthea2omop_etl_spark.streaming.etl import (  # noqa: F401
    incremental_person_etl,
    incremental_visit_etl,
    read_csv_stream,
    read_patients_stream,
)
