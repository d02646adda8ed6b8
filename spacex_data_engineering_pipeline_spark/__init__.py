"""spacex_data_engineering_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (Nesher123/spacex-data-engineering-pipeline):
incremental ingestion with watermarks and change detection, PK upserts,
snapshot aggregations, and SQL analytics — plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).

Everything is expressed through the DataFrame / Spark SQL API so Catalyst
and Tungsten own the physical plan: predicate pushdown, column pruning,
broadcast-vs-shuffle join selection, whole-stage codegen, and AQE.
"""

__version__ = "0.1.0"
