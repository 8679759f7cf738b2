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
# entries; registry order is ours to choose. Round-13 rotation (VERDICT
# r12 item 5): lead with the four faces whose code changed in r12 but
# sat OUTSIDE that round's driver window, then EVERY query path touched
# by the r13 optimization round — the postings-guard dedup tier
# (count-over-window caps in _bucket_pairs/_bucket_cross_pairs/
# _dup_gram_hits, the winnow guard, persist default), the exact-selector
# tier (grouped MAD band derivation, radius-window brackets), and the
# codec faces whose payload path moved to the zero-copy Arrow sampler
# or whose mp4 parse helpers changed (bytes() tags/brand/avcC) — then
# fill the remaining slots from the designated r9 overflow block.
# Every rotated-out query is still re-verified each round by the full
# local check_oracle sweep and the pytest oracle replicas.
_CHECK_FIRST = [
    # --- r12-touched, previously unwitnessed (VERDICT r12 item 5) ---
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "vocab_bpe_pair_counts",
    "events_value_mad_outliers",
    # --- r13: exact-selector tier (sketch.py) ---
    "events_mad_outliers_by_type",
    "events_quantiles_by_type",
    "user_spend_quartiles",
    "docs_quantile_sketch_check",
    "events_value_quantile_check",
    # --- r13: dedup postings guards (dedup.py, synthetic winnow) ---
    "dedup_simhash",
    "dedup_embedding",
    "dedup_minhash_recall_check",
    "dedup_simhash_check",
    "dedup_incremental_minhash_check",
    "dedup_incremental",
    "dedup_winnow_pairs",
    "dedup_ngram_jaccard_ppjoin",
    "docs_dup_spans",
    "docs_dup_span_profile",
    "docs_dup_span_strip",
    "corpus_prepare",
    "corpus_prepare_cc",
    "corpus_prepare_cc_best",
    "corpus_prepare_audit",
    "dedup_components",
    # --- r13: Arrow sampler + mp4 parse-helper faces ---
    "multimodal_frame_sample",
    "multimodal_mp4_frame_sample_check",
    "multimodal_video_pixels_check",
    "multimodal_h264_keyframes_check",
    "multimodal_video_frame_check",
    "multimodal_mp4_meta_check",
    "multimodal_mp4_sample_table_check",
    "multimodal_keyframes_check",
    "multimodal_h264_meta_check",
    "multimodal_h264_pts_check",
    "multimodal_audio_segments_check",
    # --- fill from the designated r9 overflow block (alphabetical) ---
    "events_interval_join_binned",
    "events_quantile_merge_check",
    "events_sliding",
    "multimodal_audio_features",
    "multimodal_gif_decode_check",
    "multimodal_png_decode_check",
    "multimodal_resize_check",
    "nation_customer_counts",
    "orders_bloom_semijoin",
    "orders_join_size_cms_check",
    "pivot_status_revenue",
    "purchase_age_salted_join",
    "q1_delay",
    "q2_late",
    # --- overflow (slots 51+; designated for the next window) ---
    "q3_wordcount",
    "q4_repeat_visits",
    "q5_dup_dates",
    "sales_cube",
    "supplier_authority_pagerank",
    "text_language_id",
    "text_language_id_trigram",
    "text_quality",
    "text_tfidf",
    "text_token_counts",
    "text_winnow_fingerprint",
    "user_state_intervals",
    "users_purchase_and_error",
    "users_purchase_no_refund_day",
    "vocab_build",
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
