from synthea2omop_etl_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
    sessionized_stats,
)
