"""PySpark-native analytics engine with the query capabilities of
``marcochang1028/Analysis-of-Flight-Delay-Data-by-MapReduce``.

The reference is five hand-coded Hadoop MapReduce jobs (Delay, Late,
WordCount, WebLog1, WebLog2 — see SURVEY.md §2). This package re-expresses
that surface — and a large-scale training-data-pipeline extension tier
(dedup, similarity search, text analysis, multimodal columns, streaming) —
as idiomatic Spark DataFrame plans: declarative logical plans that Catalyst
optimizes (predicate pushdown, column pruning, partial aggregation) and
Tungsten executes with whole-stage codegen.

Layout
------
- ``session``    : SparkSession factory tuned for local testing + cluster scale
- ``schema``     : typed StructType schemas (flight punctuality, weblog, corpus)
- ``sources``    : readers (parquet/csv/text, reference CSV dialect) and sinks
- ``functions``  : scalar/array column expressions (no Python row UDFs)
- ``operators``  : reusable relational + pipeline operators (agg, dedup,
                   similarity, text, multimodal)
- ``plans``      : end-to-end query plans (the reference's five queries in
                   native shape, plus the synthetic-table registrations the
                   driver's correctness harness runs)
- ``streaming``  : Structured Streaming variants (windowed aggs, stateful)
"""

__version__ = "0.1.0"
