"""PySpark-native trip analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference "NSP Bolt Ride" real-time trip pipeline (CSV trip events -> two
keyed streams -> keyed correlate/upsert store -> daily KPI aggregation),
re-expressed Spark-first:

- Structured Streaming + ``applyInPandasWithState`` for the trip state
  machine (reference: ``src/lambda_functions/trip_processor.py``).
- DataFrame/SQL analytics for the daily KPI job (reference:
  ``src/glue_scripts/daily_kpi_aggregation.py``).
- File-based sources/sinks (directories as streams, parquet as the keyed
  store) replacing Kinesis / DynamoDB / S3.

Plus the large-scale training-data-pipeline extensions: dedup, similarity
search, text analysis, multimodal columns.
"""

from real_time_trip_processing_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
