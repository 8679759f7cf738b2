"""Readers and sinks.

Parquet is the engine's primary format (columnar scan, predicate pushdown,
row-group min/max skipping). CSV/text readers exist for parity with the
reference's native inputs (SURVEY §1, §2.1).
"""

from .readers import (
    read_flight_csv,
    read_parquet_table,
    read_synthetic,
    read_text_corpus,
    read_weblog,
)
from .sinks import upsert_partitions, write_parquet, write_tsv

__all__ = [
    "read_flight_csv",
    "read_parquet_table",
    "read_synthetic",
    "read_text_corpus",
    "read_weblog",
    "upsert_partitions",
    "write_parquet",
    "write_tsv",
]
