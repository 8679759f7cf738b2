"""Bucketed tables: co-located joins without a shuffle (100 TB posture).

A fact-to-fact join (lineitem ⋈ orders) shuffles both sides every query.
Writing both tables bucketed (and sorted) by the join key moves that
shuffle to write time, once: subsequent joins read co-located buckets and
plan as a sort-merge join with NO Exchange on either side — at scale, the
single biggest recurring-shuffle eliminator for star-schema fact joins.

Uses ``bucketBy``+``sortBy``+``saveAsTable`` (bucket metadata lives in the
session catalog; a production deployment uses a shared metastore).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    Idempotent in local mode: drops any catalog entry AND a stale warehouse
    location left by a previous session (the in-memory catalog forgets
    tables across sessions but the files remain; a production deployment
    with a shared metastore doesn't hit this).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if loc and os.path.exists(loc):
        shutil.rmtree(loc)
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join_ready(
    spark: SparkSession,
    left: str,
    right: str,
    key: str,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables on ``key`` — plans without Exchange.

    ``force_sort_merge`` adds a MERGE hint: at test scale Catalyst would
    otherwise broadcast the small side (also shuffle-free, and the right
    call there); the hint exhibits the bucketed-SMJ plan that a
    fact-to-fact join takes when neither side fits in memory.
    """
    lt, rt = spark.table(left), spark.table(right)
    if force_sort_merge:
        lt = lt.hint("merge")
    return lt.join(rt, key)
