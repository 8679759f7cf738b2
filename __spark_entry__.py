"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``analysis_of_flight_delay_data_by_mapreduce_spark``
(see ``plans/synthetic.py`` for the registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from analysis_of_flight_delay_data_by_mapreduce_spark.plans import synthetic


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 Delay shape — pivoted weighted mean) on sf0.001."""
    return synthetic.QUERIES["q1_delay"](spark, "/root/testdata/sf0.001")


# The driver records CORRECTNESS rows for only the first 50 registered
# entries; registry order is ours to choose. Round-7 rotation (VERDICT r6
# item 3): lead with queries NEW this round (embedding_label_pca_check —
# the oracle-asserted companion the last rows-only query was missing),
# then execute the queued refill: the ENTIRE remaining r4-stamped set
# (the oldest driver rows in the registry — events_funnel, the events
# interval/retention shapes, tpch_q2/q4/q8/q10/q13/q14/q18,
# parties_union, revenue_decimal…, 37 queries), then the oldest slice of
# the r5-stamped set with the remaining slots. After this window lands,
# no green row in the registry is older than r5. Every rotated-out query
# is still re-verified each round by the full local check_oracle sweep
# and the pytest oracle replicas.
_CHECK_FIRST = [
    # --- new in r7 ---
    "embedding_label_pca_check",  # per-label eigenvalues vs twin literals
    "docs_lm_perplexity",  # CCNet-style bigram-LM quality gate
    "embedding_pq_codes",  # PQ encode: 8-byte codes, twin-trained books
    "ann_pq_adc_topk",  # ADC top-10 from codes, literal LUT
    "ann_pq_rerank_topk",  # ADC shortlist-100 -> exact rerank (production)
    "ann_pq_recall_check",  # rerank recall >= 7/10 vs exact top-10
    "ann_ivfpq_topk",  # IVF probe -> ADC shortlist -> exact rerank
    "events_exact_quantiles_sketch",  # two-pass EXACT order stats, no sort
    "orders_hot_custkeys_cms_check",  # sketch-driven salting-list detection
    "events_value_mad_outliers",  # median/MAD robust outliers, no sort
    "events_quantiles_by_type",  # per-group exact quantiles, no sort
    # --- last driver row r4 (oldest rows in the registry; full set) ---
    "revenue_by_nation",
    "multimodal_stats",
    "text_pii_scrub",
    "tpch_q3_shipping_priority",
    "customer_running_spend",
    "events_interval_join",
    "purchases_asof_error",
    "events_session_window",
    "events_salted_stats",
    "orders_grouping_sets",
    "tpch_q4_priority_semijoin",
    "tpch_q5_local_supplier_volume",
    "parties_union",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "events_stream_interval_join",
    "dedup_components",
    "top_terms",
    "multimodal_frame_sample",
    "multimodal_features_ann",
    "text_repetition",
    "text_decontaminate",
    "dedup_ngram_jaccard_ppjoin",
    "events_funnel",
    "events_purchase_gaps",
    "events_retention_cohorts",
    "users_error_no_recovery",
    "revenue_decimal_by_flag",
    "lineitem_price_qty_corr",
    "docs_chunk_overlap",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_orders",
    "events_value_zscore_outliers",
    "text_bigram_lm",
    "events_trailing_7d_spend",
    # --- last driver row r5 (next-oldest; refill with remaining slots) ---
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_incremental",
    "dedup_incremental_minhash_check",
    "docs_top_quality_per_source",
    "customers_without_orders",
    "events_asof_signup",
    "ann_cosine_topk_ivf",
    "ann_ivf_probe_topk",
    "dedup_semantic",
    # --- past the window: the rest of the r5-stamped set rotates back
    # in next round ---
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _CHECK_FIRST if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(synthetic.QUERIES))


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check).

    Data-derived oracles (e.g. IVF centroid literals) render against
    ``sf_dir`` — defaulting to sf0.01, the scale the driver's
    correctness gate runs at.
    """
    return _ordered(
        {name: synthetic.render_oracle(name, sf_dir) for name in synthetic.ORACLES}
    )
