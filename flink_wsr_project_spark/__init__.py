"""flink_wsr_project_spark — a PySpark-native analytics engine.

A brand-new engine with the query semantics of the reference project
Loky-Li/Flink-WSR-Project (a Flink 1.10 event-time stream-analytics
tutorial suite), re-expressed Spark-first:

* batch DataFrame / Spark SQL as the primary (oracle-checkable)
  correctness surface,
* Structured Streaming + ``applyInPandasWithState`` for the streaming
  forms of the same queries,
* plus the large-scale training-data-pipeline operators (dedup,
  similarity search, text analysis) the reference never had.

Layout:
    session.py    — SparkSession factory tuned for local[N] testing
    schemas.py    — explicit StructTypes for every record type
    sources/      — readers & parsers (CSV / log-line / rate simulator)
    operators/    — reusable operator builders (windows, topn, distinct,
                    sequence, joins, dedup, similarity, text)
    plans/        — the query registry consumed by __spark_entry__.py
    streaming/    — Structured Streaming variants + stateful ops
"""

__version__ = "0.1.0"
