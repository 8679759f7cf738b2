"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``analysis_of_flight_delay_data_by_mapreduce_spark``
(see ``plans/synthetic.py`` for the registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from analysis_of_flight_delay_data_by_mapreduce_spark.plans import synthetic


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 Delay shape — pivoted weighted mean) on sf0.001."""
    return synthetic.QUERIES["q1_delay"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(synthetic.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(synthetic.ORACLES)
