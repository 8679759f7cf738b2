"""Similarity search over embedding columns (extension tier).

Two paths, per the brute-force-baseline / scale-path pattern:

- **cosine_topk** — exact brute force: broadcast the query vector as a
  literal, score every row with a Catalyst higher-order-function cosine
  (JVM, no UDF), ``ORDER BY score DESC LIMIT k``. Spark plans the limit as
  ``TakeOrderedAndProject`` — per-partition top-k heaps then a driver merge
  of k·partitions rows, NOT a global sort. This is the right exact answer
  at any scale when you need it.
- **cosine_topk_lsh** — the approximate scale path: random-hyperplane
  sign-bit buckets (multi-probe: the query's bucket plus all buckets at
  hamming distance ≤ ``probe_radius``), exact cosine only within probed
  buckets. At 100 TB the bucketed table is written partitioned by bucket so
  a query prunes to a handful of partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cosine_similarity

__all__ = [
    "random_hyperplanes",
    "cosine_scores",
    "cosine_topk",
    "bucketize_hyperplane",
    "cosine_topk_lsh",
]


def random_hyperplanes(n_bits: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-bit LSH (fixed seed so
    bucket assignments are reproducible across runs and engines)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim).tolist()


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_scores(
    df: DataFrame, vec_col: str, query_vec: list[float], out: str = "score"
) -> DataFrame:
    """Exact cosine similarity of every row's ``vec_col`` vs the query."""
    return df.withColumn(out, cosine_similarity(F.col(vec_col), _query_lit(query_vec)))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    out: str = "score",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity (ties broken by id so
    results are deterministic). Plans as TakeOrderedAndProject: no global
    sort, no full shuffle."""
    scored = cosine_scores(df, vec_col, query_vec, out)
    return (
        scored.select(id_col, out)
        .orderBy(F.col(out).desc(), F.col(id_col).asc())
        .limit(k)
    )


def bucketize_hyperplane(
    df: DataFrame, vec_col: str, hyperplanes: list[list[float]], out: str = "bucket"
) -> DataFrame:
    """Sign-bit LSH bucket id for each vector (one bit per hyperplane).

    ``hyperplanes`` are generated driver-side with a fixed seed and inlined
    as literals — tiny (bits × dim floats), effectively a broadcast.
    """
    bucket = None
    for i, hp in enumerate(hyperplanes):
        lit_hp = F.array(*[F.lit(float(x)) for x in hp])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), lit_hp, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(d >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return df.withColumn(out, bucket)


def _hamming_neighbors(bucket: int, bits: int, radius: int) -> list[int]:
    """All bucket ids within hamming distance ``radius`` (multi-probe set)."""
    out = {bucket}
    frontier = {bucket}
    for _ in range(radius):
        nxt = set()
        for b in frontier:
            for i in range(bits):
                nxt.add(b ^ (1 << i))
        out |= nxt
        frontier = nxt
    return sorted(out)


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    hyperplanes: list[list[float]],
    k: int = 10,
    probe_radius: int = 1,
    out: str = "score",
) -> DataFrame:
    """Approximate top-k: prune to LSH buckets near the query's bucket, then
    exact cosine within the candidates.

    The bucket filter is a literal IN-list → pushed down to the scan
    (partition pruning when the table is written partitioned by bucket).
    Recall improves with ``probe_radius`` at linear candidate cost.
    """
    import numpy as np

    q = np.asarray(query_vec, dtype="float64")
    q_bucket = 0
    for i, hp in enumerate(hyperplanes):
        if float(np.dot(q, np.asarray(hp, dtype="float64"))) >= 0:
            q_bucket |= 1 << i
    probes = _hamming_neighbors(q_bucket, len(hyperplanes), probe_radius)

    bucketed = bucketize_hyperplane(df, vec_col, hyperplanes)
    cands = bucketed.filter(F.col("bucket").isin(probes))
    scored = cosine_scores(cands, vec_col, query_vec, out)
    return (
        scored.select(id_col, out)
        .orderBy(F.col(out).desc(), F.col(id_col).asc())
        .limit(k)
    )
