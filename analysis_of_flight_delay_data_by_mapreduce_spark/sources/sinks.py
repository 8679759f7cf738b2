"""Sinks (SURVEY §2.1 S5).

The engine's results are DataFrames; these writers exist for parity with the
reference's ``key \\t value`` text output (``Program/Delay.java:204``) and
for materializing pipeline outputs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Tab-separated text output — the reference's output shape
    (one ``part-*`` file per reducer ≙ one per Spark task)."""
    df.write.mode(mode).option("sep", "\t").option("header", "false").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar sink. ``partition_by`` yields hive-style directory
    partitioning so downstream scans prune (the 100 TB default)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
