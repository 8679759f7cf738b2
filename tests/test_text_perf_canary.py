"""Long-document perf canary (VERDICT r5 item 4).

Every text operator is otherwise only exercised on the ~350-char synthetic
docs, which is how the pre-fix winnow fold's O(n²)-per-doc recompute hid
(0.37s at sf0.1, 134s at 1,000 × 2k-char docs). For each hot text op this
times a FIXED doc count at two doc lengths (1k vs 4k chars) after a JIT
warm-up: a linear-in-length op scales ≤~4× (minus fixed overheads it is
usually well under), while the pre-fix fold scaled ~16× (verified: it
fails this test). The 9× threshold leaves >2× headroom for timer noise on
a loaded box while still failing quadratic forms by construction.

Ops covered: rolling_fingerprint, chunk_documents, bm25_scores,
quality_features, scrub_pii, CMS build (explode + grid aggregation),
DSIR importance scoring, trained-BPE token counting.
"""
from __future__ import annotations

import time

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.selection import (
    dsir_importance_topk,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sketch import cms_build
from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
    bm25_scores,
    bpe_token_count,
    chunk_documents,
    quality_features,
    rolling_fingerprint,
    scrub_pii,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.functions import word_tokens

N_DOCS = 400
RATIO_MAX = 9.0  # linear ≈ 4x, pre-fix quadratic fold ≈ 16x
FLOOR_S = 0.05  # below this the short-side timing is all overhead


def _docs(spark, n_tokens: int) -> DataFrame:
    """N_DOCS deterministic documents of n_tokens ~7-char tokens each
    (≈ 8·n_tokens chars). Pure Catalyst generation — no Python row data,
    so building the frame costs nothing against the timings."""
    return (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_tokens)),
                    lambda i: F.concat(
                        F.lit("tok"), ((F.col("id") * 31 + i) % 9973).cast("string")
                    ),
                ),
            ).alias("text"),
        )
        .cache()
    )


def _force(df: DataFrame) -> None:
    """Evaluate EVERY output column (a bare count would let Catalyst prune
    the expensive expressions away)."""
    df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
        F.expr("bit_xor(h)")  # never overflows, unlike SUM under ANSI
    ).collect()


def _timed(fn, docs: DataFrame) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        _force(fn(docs))
        best = min(best, time.monotonic() - t0)
    return best


_BM25_IDF = {"tok1": 1.5, "tok7": 1.2, "tok31": 0.8}

OPS = {
    "rolling_fingerprint": lambda d: rolling_fingerprint(d, "doc_id", "text"),
    "chunk_documents": lambda d: chunk_documents(d, "doc_id", "text"),
    "bm25_scores": lambda d: bm25_scores(
        d, "doc_id", "text", list(_BM25_IDF), _BM25_IDF, avgdl=300.0
    ),
    "quality_features": lambda d: quality_features(d, "text"),
    "scrub_pii": lambda d: scrub_pii(d, "text"),
    "cms_build": lambda d: cms_build(
        d.select(F.explode(word_tokens(F.col("text"))).alias("tok")), "tok"
    ),
    "dsir_importance": lambda d: dsir_importance_topk(
        d, "doc_id", "text", list(range(-32, 32)), k=N_DOCS
    ),
    "bpe_token_count": lambda d: d.select(
        "doc_id", word_tokens(F.col("text")).alias("__toks")
    ).select(
        "doc_id",
        bpe_token_count(
            F.col("__toks"), [("t", "o"), ("to", "k"), ("1", "2")]
        ).alias("n"),
    ),
}


@pytest.fixture(scope="module")
def corpora(spark):
    short = _docs(spark, 125)  # ≈1k chars
    long = _docs(spark, 500)  # ≈4k chars
    short.count(), long.count()
    yield {"short": short, "long": long}
    short.unpersist(), long.unpersist()


@pytest.mark.parametrize("name", sorted(OPS))
def test_linear_scaling_in_document_length(corpora, name):
    op = OPS[name]
    _force(op(corpora["short"]))  # JIT warm-up: codegen compiles here
    t_short = _timed(op, corpora["short"])
    t_long = _timed(op, corpora["long"])
    assert t_long <= RATIO_MAX * max(t_short, FLOOR_S), (
        f"{name}: {t_long:.2f}s at 4k chars vs {t_short:.2f}s at 1k chars "
        f"(ratio {t_long / max(t_short, 1e-9):.1f}x) — superlinear in "
        f"document length; check for per-element recompute of an O(n) "
        f"expression inside a HOF lambda (the word_shingles/winnow trap)"
    )
