"""Registry-wide physical-plan audit: the 100 TB anti-patterns must not
appear in ANY registered query, not just the hand-picked ones in
test_plan_shapes.py.

Two invariants, swept across every entry in the registry (plans are
built and inspected, never executed, so the sweep stays cheap):

- ``CartesianProduct`` never appears. Broadcast nested-loop joins of
  1-row/bounded frames are fine (they print as BroadcastNestedLoopJoin);
  an actual cartesian product of two scaling relations is always a bug.
- ``Exchange SinglePartition`` only appears where the rows being
  funneled are already bounded: global 1-row (or few-row) aggregates and
  explicit LIMIT collection. A SinglePartition exchange of data-scale
  rows (the round-2 ``customer_rfm`` offender) is the scale-killer this
  guards against. Queries whose FINAL output is a bounded aggregate get
  a pass for their last exchange; everything else must justify itself in
  the allowlist below.
"""

from __future__ import annotations

import pytest

from analysis_of_flight_delay_data_by_mapreduce_spark.plans import synthetic
from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text

from conftest import SF_DIR

# Queries allowed to contain Exchange SinglePartition, with the bounded
# row count that crosses it. Every entry must name WHY it is bounded.
_SINGLE_PARTITION_OK = {
    # 1-row check faces: the final join of 1-row aggregates funnels one
    # partial row per task — bounded by #partitions, not data
    "dedup_minhash_recall_check",
    "dedup_simhash_check",
    "dedup_incremental_minhash_check",
    "tokens_cms_check",  # 1-row total-count aggregate + 6-row probe joins
    "events_quantile_merge_check",  # 1-row grid-equality aggregate; both
                                    # join sides are <=~1k-row bucket grids
    "docs_quantile_sketch_check",   # grid cumsum + 3-row rank frame are
                                    # sketch-bounded; the exact-side global
                                    # row_number is check-face-only (the
                                    # production answer is the bracket —
                                    # see the query docstring)
    "events_exact_quantiles_sketch",  # both SinglePartitions are
                                      # sketch-bounded: the grid cumsum
                                      # window (<=~1k bucket rows) and the
                                      # 1-row n aggregate; pass-2
                                      # resolution partitions by p
                                      # (hashpartitioning, in-bracket
                                      # rows only — never data-wide)
    "events_value_mad_outliers",      # the same sketch-bounded
                                      # SinglePartitions, twice (median
                                      # pass + MAD pass) plus three 1-row
                                      # aggregates (n/median/mad/outlier
                                      # count) joined broadcast
    "ann_ivf_recall_check",
    "orders_join_size_cms_check",  # four 1-row aggregates (exact join
                                   # count, two side counts, min-over-4-
                                   # seeds estimate) joined nested-loop
    "supplier_authority_pagerank",  # the 1-row graph-size params
                                    # aggregate (r0/base), broadcast into
                                    # each iteration — node-bounded
    # 1-row global aggregates (no grouping key → single reducer of
    # per-task partial rows; this is the correct plan for a scalar)
    "text_tfidf",            # corpus-N count feeding the idf broadcast
    "docs_tfidf_cosine_pairs",  # the same corpus-N 1-row aggregate; it
                                # prints once per consumer branch of the
                                # (scoped-persisted) weight frame
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",  # 1-row global revenue MAX (argmax probe)
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_inactive_rich",  # 1-row AVG balance threshold
    "orders_profile",        # fixed 4-row profile rollup
    # range-bucketed two-pass rank plans: the only SinglePartition is the
    # ≤ n_buckets×64-row boundary-sample / bucket-count metadata frame
    "customer_rfm",          # pinned further by
                             # test_customer_rfm_no_data_wide_single_partition
    "user_spend_quartiles",
    "docs_pack_chunks",
    # derived-partsupp queries (r8): the 1-row |supplier| COUNT aggregate
    # that parameterizes the ps_suppkey modulus — dimension-bounded by
    # definition (it counts the supplier dim); q11 adds the 1-row
    # (total, n_parts) threshold aggregate of the per-part value frame
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier",
    "tpch_q20_potential_promotion",
    "multimodal_bmp_decode_check",  # 1-row global check aggregate
    "multimodal_png_decode_check",  # same 1-row global check aggregate
    "multimodal_gif_decode_check",  # same 1-row global check aggregate
    "multimodal_jpeg_decode_check",  # same 1-row global check aggregate
    "multimodal_video_frame_check",  # two 1-row check aggregates joined
                                     # broadcast (counts x distinct)
    "multimodal_resize_check",  # same 1-row global check aggregate —
                                # the correct plan for a scalar check face
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in synthetic.QUERIES.items():
        out[name] = plan_text(fn(spark, SF_DIR), "simple")
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, txt in plans.items() if "CartesianProduct" in txt]
    assert not offenders, offenders


def test_single_partition_only_on_bounded_aggregates(plans):
    offenders = {
        n: txt.count("Exchange SinglePartition")
        for n, txt in plans.items()
        if "Exchange SinglePartition" in txt and n not in _SINGLE_PARTITION_OK
    }
    assert not offenders, (
        f"data-wide SinglePartition exchanges (add to allowlist ONLY with "
        f"a bounded-rows justification): {offenders}"
    )


def test_no_embedded_split_recompute_in_hof_folds(plans):
    """Lint for the word_shingles/winnow trap class (VERDICT r5 item 5):
    HOF lambda bodies don't common-subexpression-eliminate, so an O(n)
    expression like split(text…) referenced inside an aggregate() fold
    re-evaluates once per ELEMENT. In plan text that reads as a fold
    marker (aggregate(lambdafunction) sharing a line with ≥3 split(
    occurrences (the let-bound forms show ≤2 — one per output column
    ref, CSE'd at the top-level Project). Audited r6: every other fold
    in the package iterates literals or materialized column refs, which
    this lint leaves untouched."""
    offenders = {
        n: line.strip()[:160]
        for n, txt in plans.items()
        for line in txt.splitlines()
        if "aggregate(lambdafunction" in line and line.count("split(") >= 3
    }
    assert not offenders, f"per-element split( recompute inside a fold: {offenders}"


def test_allowlist_is_not_stale(plans):
    """Entries whose plans no longer contain SinglePartition should be
    removed — a stale allowlist hides future regressions."""
    stale = [
        n
        for n in _SINGLE_PARTITION_OK
        if n in plans and "Exchange SinglePartition" not in plans[n]
    ]
    assert not stale, f"remove from _SINGLE_PARTITION_OK: {stale}"
