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
# entries; registry order is ours to choose. Round-8 rotation (VERDICT r7
# item 6): lead with the queries NEW this round (five derived-table
# TPC-H shapes + the real-BMP codec check face + the grouped
# median/MAD face + the repetition filter + the weighted sample + its
# merge-check face), then the r5-stamped set — now the oldest driver
# rows in the registry (48 queries; 10 + 48 = 58, so the LAST EIGHT
# listed here overflow the 50-row window and keep their r5 stamp until
# round 9 — eight stable dimension-count/pivot/interval shapes were
# chosen as the overflow). Every rotated-out query is still re-verified
# each round by the full local check_oracle sweep and the pytest oracle
# replicas.
_CHECK_FIRST = [
    # --- new in r8 ---
    "tpch_q11_important_stock",  # scalar-agg-subquery HAVING, partsupp
    "tpch_q12_shipmodes",  # late-lineitem pivot, derived commit/receipt
    "tpch_q16_parts_supplier",  # NOT IN -> anti join, COUNT(DISTINCT)
    "tpch_q20_potential_promotion",  # nested IN + correlated scalar agg
    "tpch_q21_waiting_suppliers",  # EXISTS/NOT EXISTS vs aggregate rewrite
    "multimodal_bmp_decode_check",  # REAL stdlib BMP decode vs meta dims
    "events_mad_outliers_by_type",  # grouped two-pass median/MAD outliers
    "docs_repetition_filter",  # Gopher repetition rules, integer micro-units
    "docs_weighted_sample",  # A-ES weighted sampling, md5-u + micro keys
    "docs_weighted_sample_merge_check",  # merge(topk,topk)==topk(union)
    # --- last driver row r5 (the oldest rows; full set minus overflow) ---
    "ann_cosine_topk_ivf",
    "ann_ivf_probe_topk",
    "corpus_prepare",
    "corpus_prepare_audit",
    "corpus_prepare_semantic",
    "customer_rfm",
    "customer_snapshot_diff",
    "customers_without_orders",
    "dedup_incremental",
    "dedup_incremental_minhash_check",
    "dedup_minhash",
    "dedup_semantic",
    "dedup_semantic_incremental",
    "dedup_simhash",
    "docs_difficulty_quartiles",
    "docs_hash_split",
    "docs_mixture_sample",
    "docs_pack_chunks",
    "docs_source_budget_cap",
    "docs_top_quality_per_source",
    "embedding_label_centroids",
    "events_asof_signup",
    "events_json_props",
    "events_latest_state",
    "events_segment_spend",
    "events_sessionize",
    "events_user_overlap_check",
    "events_user_overlap_sketch",
    "events_user_sketch_check",
    "events_user_sketch_rollup",
    "orders_above_customer_avg",
    "text_bm25",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q22_inactive_rich",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q9_profit_by_nation_year",
    # --- the eight designated overflow rows (slots 51-58; stamped r9) ---
    "user_spend_quartiles",
    "user_state_intervals",
    "users_purchase_and_error",
    "users_purchase_no_refund_day",
    "vocab_build",
    "nation_customer_counts",
    "pivot_status_revenue",
    "sales_cube",
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
