"""operators.selection — DSIR importance weighting (plus the CMS
inner-product join-size estimator it ships alongside in the sketch
tier). The distributed score must equal an independent pure-Python
replica bit-for-bit (everything is integer), the trainer must be
deterministic, and planted target-like documents must outrank
off-target ones."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.selection import (
    dsir_importance_topk,
    train_dsir_logratios_parquet,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sketch import (
    cms_build,
    cms_inner_product,
)

from conftest import SF_DIR
import os

DOCS = os.path.join(SF_DIR, "documents.parquet")


def _py_features(text: str) -> list[str]:
    toks = [t for t in re.split("[ \t\n\x0b\f\r]+", text) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_score(text: str, lr: list[int]) -> int:
    return sum(
        lr[int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % len(lr)]
        for f in _py_features(text)
    )


def test_trainer_deterministic_and_shaped():
    a = train_dsir_logratios_parquet(DOCS, "text", "lang", "en", n_buckets=64)
    b = train_dsir_logratios_parquet(DOCS, "text", "lang", "en", n_buckets=64)
    assert a == b
    assert len(a) == 64 and all(isinstance(v, int) for v in a)
    # the target slice is a strict subset of raw, so ratios can't all be 0
    assert any(v != 0 for v in a)


def test_topk_scores_match_python_replica(spark):
    lr = train_dsir_logratios_parquet(DOCS, "text", "lang", "en", n_buckets=64)
    docs = spark.read.parquet(DOCS)
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_topk(docs, "doc_id", "text", lr, k=10_000)
        .collect()
    }
    for row in docs.select("doc_id", "text").collect():
        assert got[row["doc_id"]] == _py_score(row["text"] or "", lr)


def test_planted_target_docs_outrank(spark):
    # target model trained where 'alpha beta' dominates; raw adds noise
    df = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta", "tgt"),
            (2, "alpha beta alpha beta", "tgt"),
            (3, "zq xv zq xv zq xv zq xv", "raw"),
            (4, "", "raw"),
        ],
        "doc_id long, text string, lang string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "docs.parquet")
        df.write.parquet(p)
        lr = train_dsir_logratios_parquet(p, "text", "lang", "tgt", n_buckets=16)
        top = dsir_importance_topk(
            spark.read.parquet(p), "doc_id", "text", lr, k=4
        ).collect()
    ids = [r["doc_id"] for r in top]
    scores = {r["doc_id"]: r["dsir_score"] for r in top}
    # target-like docs lead; the empty doc scores exactly 0 (neutral
    # evidence), ranking above the off-target doc's negative score
    assert set(ids[:2]) == {1, 2}
    assert ids[2:] == [4, 3]
    assert scores[4] == 0 and scores[3] < 0 and scores[1] > 0
    vals = [r["dsir_score"] for r in top]
    assert vals == sorted(vals, reverse=True)


def test_cms_inner_product_bounds(spark):
    # two key multisets with known join size Σ f_A(k)·f_B(k)
    a = spark.createDataFrame([(k,) for k in [1, 1, 2, 3, 3, 3]], "k long")
    b = spark.createDataFrame([(k,) for k in [1, 3, 3, 4]], "k long")
    true_join = 2 * 1 + 3 * 2  # k=1: 2·1, k=3: 3·2
    est = cms_inner_product(
        cms_build(a, "k", depth=4, width=1024),
        cms_build(b, "k", depth=4, width=1024),
    ).collect()[0]["est"]
    assert est >= true_join
    assert est <= true_join + math.e / 1024 * 6 * 4 + 1  # ε·N₁·N₂ slack


def test_cms_inner_product_both_empty(spark):
    # ADVICE r6: two empty grids (both underlying tables had zero rows)
    # used to yield NULL — the seed domain is the union of rows actually
    # present, so min() ran over zero rows. The coalesced aggregate
    # estimates exactly 0, the true join size of two empty multisets,
    # keeping `est >= true` NULL-free for downstream boolean checks.
    a = spark.createDataFrame([], "k long").filter("k > 0")
    b = spark.createDataFrame([], "k long")
    est = cms_inner_product(
        cms_build(a, "k", depth=4, width=1024),
        cms_build(b, "k", depth=4, width=1024),
    ).collect()[0]["est"]
    assert est is not None and est == 0
    # one-empty-side case (already correct before the fix): seeds from
    # the non-empty grid, dots coalesce to 0 per seed
    c = spark.createDataFrame([(1,), (2,)], "k long")
    est2 = cms_inner_product(
        cms_build(c, "k", depth=4, width=1024),
        cms_build(b, "k", depth=4, width=1024),
    ).collect()[0]["est"]
    assert est2 is not None and est2 == 0


def test_cms_inner_product_exact_at_wide_grid(spark):
    # width >> distinct keys: collisions are overwhelmingly unlikely at
    # width 1<<16 with 3 keys, so the estimate is exactly the join size
    a = spark.createDataFrame([(k,) for k in [10, 20, 20]], "k long")
    b = spark.createDataFrame([(k,) for k in [20, 20, 30]], "k long")
    est = cms_inner_product(
        cms_build(a, "k", depth=4, width=1 << 16),
        cms_build(b, "k", depth=4, width=1 << 16),
    ).collect()[0]["est"]
    assert est == 4


def test_scorer_faces_agree_and_select_guards(spark):
    """The zero-shuffle fold face and the explode+groupBy face produce
    identical scores for every featured doc (the agg face simply omits
    zero-feature docs), and dsir_select refuses a non-positive threshold
    (where the two faces would disagree)."""
    import pytest as _pytest

    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.selection import (
        dsir_scores,
        dsir_scores_agg,
        dsir_select,
    )

    lr = train_dsir_logratios_parquet(DOCS, "text", "lang", "en", n_buckets=64)
    docs = spark.read.parquet(DOCS)
    fold = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(docs, "doc_id", "text", lr).collect()
    }
    agg = {
        r.doc_id: r.dsir_score
        for r in dsir_scores_agg(docs, "doc_id", "text", lr).collect()
    }
    assert len(fold) == docs.count()
    for k, v in agg.items():
        assert fold[k] == v
    assert all(fold[k] == 0 for k in set(fold) - set(agg))

    with _pytest.raises(ValueError, match="min_score must be positive"):
        dsir_select(docs, "doc_id", "text", lr, 0)


def test_cms_inner_product_disjoint_inputs_read_zero(spark):
    """A seed with no overlapping non-empty cells has a genuine dot
    product of 0: fully disjoint key sets estimate 0 (not NULL), and
    the min runs over the full seed domain, not the colliding subset."""
    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    est = cms_inner_product(
        cms_build(a, "k", depth=4, width=1 << 16),
        cms_build(b, "k", depth=4, width=1 << 16),
    ).collect()[0]["est"]
    assert est == 0


def test_weighted_sample_topk_matches_python_replica(spark):
    """weighted_sample_topk == a brute-force A-ES replica (same md5-u,
    same micro quantization, same DESC-key doc_id-tiebreak rank), and
    excludes NULL/zero/negative weights."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.selection import (
        weighted_sample_topk,
    )

    rows = [
        ("s1", 1, 100),
        ("s1", 2, 2000),
        ("s1", 3, 50),
        ("s1", 4, 800),
        ("s1", 5, None),  # excluded: NULL weight
        ("s2", 6, 10),
        ("s2", 7, 0),  # excluded: zero weight
        ("s2", 8, -5),  # excluded: negative weight
        ("s2", 9, 300),
        ("s2", 10, 300),  # same weight as 9: key differs only via u
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, w long")
    got = {
        (r.source, r.doc_id): (r.key_micro, r.rk)
        for r in weighted_sample_topk(df, ["source"], "doc_id", "w", k=2).collect()
    }

    def key(doc_id, w):
        bits = int(hashlib.md5(f"aes1{doc_id}".encode()).hexdigest()[:13], 16)
        u = (float(bits) + 1.0) / float(1 << 52)
        v = math.log(u) * 1e6 / float(w)
        # Spark round() is HALF_UP (away from zero); the keys here are
        # nowhere near .5 so floor(x+0.5) on |v| suffices
        return -int(abs(v) + 0.5) if v < 0 else int(v + 0.5)

    want = {}
    for src in ("s1", "s2"):
        cand = [
            (key(d, w), d)
            for s, d, w in rows
            if s == src and w is not None and w > 0
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rk, (kv, d) in enumerate(cand[:2], start=1):
            want[(src, d)] = (kv, rk)
    assert got == want


def test_weighted_sample_merge_idempotent_and_lossless(spark):
    """merge(topk(A), topk(B)) == topk(A ∪ B) on a planted split, and
    merging a selection with itself is the selection (duplicate-id
    collapse — the epoch-replay property the streaming face leans on)."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.selection import (
        weighted_sample_merge,
        weighted_sample_topk,
    )

    rows = [("s%d" % (i % 3), i, 50 + 13 * (i % 17)) for i in range(60)]
    df = spark.createDataFrame(rows, "source string, doc_id long, w long")
    direct = {
        (r.source, r.doc_id, r.key_micro, r.rk)
        for r in weighted_sample_topk(df, ["source"], "doc_id", "w", 4).collect()
    }
    halves = [
        weighted_sample_topk(
            df.filter(F.col("doc_id") % 2 == p), ["source"], "doc_id", "w", 4
        )
        for p in (0, 1)
    ]
    merged = {
        (r.source, r.doc_id, r.key_micro, r.rk)
        for r in weighted_sample_merge(halves, ["source"], "doc_id", 4).collect()
    }
    assert merged == direct
    self_merged = {
        (r.source, r.doc_id, r.key_micro, r.rk)
        for r in weighted_sample_merge(
            [halves[0], halves[0]], ["source"], "doc_id", 4
        ).collect()
    }
    assert self_merged == {
        (r.source, r.doc_id, r.key_micro, r.rk) for r in halves[0].collect()
    }
