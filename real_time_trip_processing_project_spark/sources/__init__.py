from real_time_trip_processing_project_spark.sources.readers import (
    load_fixture,
    read_trip_end_csv,
    read_trip_start_csv,
)

__all__ = ["load_fixture", "read_trip_start_csv", "read_trip_end_csv"]
