"""Corpus-prep pipeline: quality gate, exact dedup, near dedup compose."""

from __future__ import annotations

from analysis_of_flight_delay_data_by_mapreduce_spark.plans.pipeline import (
    prepare_corpus,
)

from test_dedup import BASE, FAR, NEAR


def test_prepare_corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1 → dropped
        (3, NEAR),  # near dup of 1 → dropped (jaccard >> 0.5)
        (4, FAR),
        (5, "!!! ??? ;;; 123"),  # low quality → dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(docs, min_quality=0.4, near_dup_jaccard=0.5)
    survivors = {r.doc_id for r in out.collect()}
    assert survivors == {1, 4}
    assert set(out.columns) == {"doc_id", "text", "quality"}
