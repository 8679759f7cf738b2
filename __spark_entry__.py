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
# entries; registry order is ours to choose. Round-10 rotation (VERDICT
# r9 items 2 and 6): lead with the rows NEW or newly ORACLE-CHECKED this
# round (the real baseline-JPEG codec check face; the ISO-BMFF container
# metadata face; embedding_label_pca converted from rows-only to a full
# hash check via trained-constant DOUBLE literals), then the SIXTEEN
# r6-stamped rows — the oldest driver stamps in the registry, after this
# round no stamp is older than r7 — then 28 of the 50 r7-stamped rows,
# prioritizing plan-modified (text_decontaminate, r10 broadcast-gate
# fix), check-face, and multi-join TPC-H shapes. The remaining TWENTY-TWO
# r7 rows (stable single-agg/window shapes with full pytest oracle
# replicas) are the designated overflow, listed after slot 50 for the
# r11 window. Every rotated-out query is still re-verified each round by
# the full local check_oracle sweep and the pytest oracle replicas.
_CHECK_FIRST = [
    # --- new or newly hash-checked in r10 ---
    "multimodal_jpeg_decode_check",  # REAL baseline JFIF decode vs meta dims
    "multimodal_mp4_meta_check",  # REAL ISO-BMFF atom walk, per-row oracle
    "embedding_label_pca",  # rows-only -> ORACLE: bit-identical twin literals
    "multimodal_audio_segments_check",  # VAD-gate segments, per-row oracle
    "multimodal_keyframes_check",  # consecutive-dup frame suppression
    "multimodal_mp4_frame_sample_check",  # time-aligned sampling off parsed duration
    # --- last driver row r6 (the oldest stamps; VERDICT r9 item 2) ---
    "customer_name_ids",
    "dedup_winnow_pairs",
    "distinct_users_by_type",
    "docs_dup_span_profile",
    "docs_quantile_sketch",
    "docs_reservoir_sample",
    "events_value_stats",
    "events_windowed",
    "orders_by_month",
    "orders_profile",
    "sales_rollup",
    "token_histogram",
    "tokens_cms_check",
    "tokens_cms_sketch",  # rows-only by design (sketch cells); CMS pair together
    "top_parts_by_brand",
    "vocab_bpe_pair_counts",
    # --- last driver row r7 (28 of 50; rest are the designated overflow) ---
    "ann_ivfpq_topk",
    "ann_pq_adc_topk",
    "ann_pq_recall_check",
    "ann_pq_rerank_topk",
    "dedup_components",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_ppjoin",
    "docs_lm_perplexity",
    "embedding_label_pca_check",
    "embedding_pq_codes",
    "events_exact_quantiles_sketch",
    "events_retention_cohorts",
    "events_stream_interval_join",
    "events_value_mad_outliers",
    "orders_hot_custkeys_cms_check",
    "purchases_asof_error",
    "text_bigram_lm",
    "text_decontaminate",  # r10 plan change: broadcast hint dropped for AQE
    "text_pii_scrub",
    "text_repetition",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_orders",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_semijoin",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    # --- the designated r7 overflow rows (slots 51+; r11 window) ---
    "events_value_zscore_outliers",  # stable; MAD sibling stays in-window
    "multimodal_features_ann",  # stub-featurizer ANN face; stable oracle
    "multimodal_frame_sample",  # byte-chunk stub face; stable oracle
    "customer_running_spend",
    "dedup_exact",
    "docs_chunk_overlap",
    "events_funnel",
    "events_interval_join",
    "events_purchase_gaps",
    "events_quantiles_by_type",
    "events_salted_stats",
    "events_session_window",
    "events_trailing_7d_spend",
    "lineitem_price_qty_corr",
    "multimodal_stats",
    "orders_grouping_sets",
    "parties_union",
    "revenue_by_nation",
    "revenue_decimal_by_flag",
    "top_terms",
    "tpch_q14_promo_revenue",
    "users_error_no_recovery",
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
