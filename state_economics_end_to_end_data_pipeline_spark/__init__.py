"""PySpark-native analytics engine with the data-processing capabilities of
xHunterW/State_Economics_End-to-End_Data_Pipeline, rebuilt Spark-first.

The reference (see SURVEY.md) is a pandas/Airflow batch ETL: 4 messy raw
economics sources -> 11 normalized relational tables -> Postgres -> profiling
-> tiny query API. This package re-expresses every operator in that pipeline
as idiomatic Spark DataFrame primitives (explicit schemas, unpivot, broadcast
joins, dropDuplicates, aggregate-based profiling) and extends the surface with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns), each designed for 100 TB scale: no driver-side collects
in hot paths, declarative plans that Catalyst can push down/prune, broadcast
only for true dimensions, AQE-friendly shuffles.
"""

__version__ = "0.1.0"
