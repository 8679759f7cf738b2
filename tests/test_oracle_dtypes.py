"""Dtype parity between every DuckDB oracle and its Spark query.

The round-2 driver marked five value-correct queries red because DuckDB
widens un-cast integer ``SUM`` (plain and windowed) to HUGEINT while the
driver's value hash is dtype-sensitive. The local check_oracle hash
stringifies values (dtype-insensitive), so this audit compares the TYPES
themselves: for each oracle-backed query, the DuckDB relation's column
types must map 1:1 onto the Spark DataFrame schema. Catches HUGEINT
widening, int32/int64 drift, and decimal-scale mismatches before the
driver does.
"""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as entrymod
from analysis_of_flight_delay_data_by_mapreduce_spark.schema import SYNTHETIC_TABLES

from conftest import SF_DIR


def _canon_duck(t: str) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")
    return {
        "BIGINT": "BIGINT",
        "INTEGER": "INT",
        "SMALLINT": "INT",  # both hash-stringify as the same int repr,
        "TINYINT": "INT",  # but Spark never emits sub-int here anyway
        "DOUBLE": "DOUBLE",
        "FLOAT": "FLOAT",
        "VARCHAR": "STRING",
        "BOOLEAN": "BOOLEAN",
        "DATE": "DATE",
        "TIMESTAMP": "TIMESTAMP",
        "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
        "BLOB": "BINARY",
    }.get(t, t)  # HUGEINT etc. fall through and fail the comparison


def _canon_spark(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return t.upper().replace(" ", "")
    return {
        "bigint": "BIGINT",
        "int": "INT",
        "smallint": "INT",
        "tinyint": "INT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "STRING",
        "boolean": "BOOLEAN",
        "date": "DATE",
        # testdata timestamps are NTZ micros normalized to session-TZ UTC;
        # DuckDB sees naive TIMESTAMP — values stringify identically.
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BINARY",
    }.get(t, t.upper())


def test_every_oracle_matches_spark_dtypes(spark):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in SYNTHETIC_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    problems: list[str] = []
    for name, sql in oracles.items():
        rel = con.sql(sql)
        duck = {c: _canon_duck(ty) for c, ty in zip(rel.columns, rel.types)}
        df = queries[name](spark, SF_DIR)
        spk = {f.name: _canon_spark(f.dataType.simpleString()) for f in df.schema.fields}
        if sorted(duck) != sorted(spk):
            problems.append(f"{name}: columns differ duck={sorted(duck)} spark={sorted(spk)}")
            continue
        for c in duck:
            if duck[c] != spk[c]:
                problems.append(f"{name}.{c}: duck={duck[c]} spark={spk[c]}")
    con.close()
    assert not problems, "oracle/spark dtype drift:\n" + "\n".join(problems)
