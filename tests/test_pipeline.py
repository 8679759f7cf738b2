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


def test_prepare_corpus_cc_collapses_clusters(spark):
    """Hub case: 2~5 and 3~5 but 2≁3. The pairwise rule keeps both 2 and
    3 (each pair judged alone); the closure clusters {2,3,5} and keeps
    only the min id — the production convention."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.pipeline import (
        prepare_corpus_cc,
    )

    hub = BASE  # similar to both variants below
    var_a = BASE.replace("afternoon", "morning")
    var_b = BASE.replace("quick", "sneaky").replace("warm", "cold")
    # trigram jaccard: hub↔var_a 0.81, hub↔var_b 0.58 (≥0.5); var_a↔var_b 0.46 (<0.5)
    rows = [(2, var_a), (3, var_b), (5, hub), (9, FAR)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pair_rule = {
        r.doc_id
        for r in prepare_corpus(docs, min_quality=0.4, near_dup_jaccard=0.5).collect()
    }
    closure = {
        r.doc_id
        for r in prepare_corpus_cc(
            docs, min_quality=0.4, near_dup_jaccard=0.5
        ).collect()
    }
    # sanity on the planted geometry: both variants pair with the hub only
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_k=3, mode="word", threshold=0.5
        ).collect()
    }
    assert pairs == {(2, 5), (3, 5)}
    assert pair_rule == {2, 3, 9}  # drops only the larger id of each pair
    assert closure == {2, 9}  # one survivor per cluster {2,3,5}


def test_prepare_corpus_audit_statuses_and_kept_parity(spark):
    """Planted fixture hits all four lineage statuses; the kept rows must
    equal prepare_corpus_cc's survivor set on the same inputs."""
    from pyspark.sql import functions as F

    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.pipeline import (
        prepare_corpus_audit,
        prepare_corpus_cc,
    )

    good = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the afternoon sun and the light wind "
        "moves the tall grass near the quiet river bank all day"
    )
    near = good.replace("afternoon", "morning")
    rows = [
        (1, good),
        (2, good),            # exact dup of 1 (same fingerprint)
        (3, near),            # near dup of 1 (one-word edit)
        (4, "#### 12345 !!"),  # low quality: punct/digit-heavy, tiny
        (5, "completely different content about catalyst optimizer internals and shuffle partitioning strategies in the modern query engine with many plain words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    aud = {
        r.doc_id: r.status
        for r in prepare_corpus_audit(
            docs, min_quality=0.4, near_dup_jaccard=0.5
        ).collect()
    }
    assert aud == {
        1: "kept",
        2: "exact_dup",
        3: "near_dup",
        4: "low_quality",
        5: "kept",
    }
    kept = {k for k, v in aud.items() if v == "kept"}
    surv = {
        r.doc_id
        for r in prepare_corpus_cc(
            docs, min_quality=0.4, near_dup_jaccard=0.5
        ).collect()
    }
    assert kept == surv


def test_prepare_corpus_cc_best_keeps_highest_quality(spark):
    """The quality-survivor policy: within a near-dup cluster the
    HIGHEST-quality member outlives lower ids; within an exact-
    fingerprint group (same normalized text, different raw whitespace →
    different quality) the cleaner raw form wins. Fixture geometry: the
    cluster {2,5} puts its best member at the LARGER id, and the exact
    group {9,11} puts its best raw form at the LARGER id, so the two
    policies produce DISJOINT survivor sets."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        quality_score,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.pipeline import (
        prepare_corpus_cc,
        prepare_corpus_cc_best,
    )

    hub = BASE
    degraded = BASE.replace("afternoon", "morning") + " 111 222 333 444"
    far_dup = FAR + " 42; ok."
    messy = far_dup.replace(" ", "  ")  # same fingerprint, more n_chars →
    # the punct/digit ratios dilute → HIGHER quality at the higher id
    rows = [(2, degraded), (5, hub), (9, far_dup), (11, messy)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    q = {
        r.doc_id: r.quality
        for r in quality_score(docs, "text").select("doc_id", "quality").collect()
    }
    assert q[5] > q[2] and q[11] > q[9]  # the planted quality splits

    best = {
        r.doc_id
        for r in prepare_corpus_cc_best(
            docs, min_quality=0.1, near_dup_jaccard=0.5
        ).collect()
    }
    minid = {
        r.doc_id
        for r in prepare_corpus_cc(
            docs, min_quality=0.1, near_dup_jaccard=0.5
        ).collect()
    }
    assert minid == {2, 9}  # smallest id per group/cluster
    assert best == {5, 11}  # highest quality per group/cluster


def test_prepare_corpus_cc_best_diverges_from_min_id_on_corpus(spark):
    """On the real documents table the two policies must actually
    disagree (otherwise the face is a vacuous re-registration) while
    keeping the same number of survivors (same clusters either way)."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.pipeline import (
        prepare_corpus_cc,
        prepare_corpus_cc_best,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.sources import (
        read_parquet_table,
    )

    from conftest import SF_DIR

    docs = read_parquet_table(spark, SF_DIR, "documents")
    minid = {r.doc_id for r in prepare_corpus_cc(docs, min_quality=0.4).collect()}
    best = {r.doc_id for r in prepare_corpus_cc_best(docs, min_quality=0.4).collect()}
    assert best != minid  # the policy is exercised, not cosmetic
    assert len(best & minid) > 0
