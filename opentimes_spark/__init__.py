"""opentimes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dfsnow/opentimes, rebuilt Spark-first.

Layers (mirroring the reference's architecture, SURVEY.md §0):
  io/         — sources & sinks (partitioned parquet, sorted layout writer)
  functions/  — scalar function library (geoid, text, vectors, geometry)
  operators/  — composite operators (weighted mean, chunking, matrix,
                dedup, similarity, spatial joins, rollup catalog)
  plans/      — query registry exposed through __spark_entry__
  streaming/  — structured-streaming recipes over the events table
"""

__version__ = "0.1.0"
