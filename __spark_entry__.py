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
# entries; registry order is ours to choose. Round-6 rotation (VERDICT r5
# item 2): lead with the only three registered queries that have never
# had a driver row — text_winnow_fingerprint (full hash; the fold is
# let-bound this round, output bit-identical — the driver row stamps the
# fixed form), tokens_cms_check (full hash) and tokens_cms_sketch
# (rows-only by design; the check face is its oracle-asserted
# companion). With these, all registered queries are driver-stamped at
# least once. Then any queries NEW in r6, then the refill: the 15
# r3-stamped queries that were named-but-past-the-window in the r5
# rotation (their rows are the oldest), then the oldest slice of the
# r4-stamped set (q1–q5 headliners and the rows-only queries' check
# faces first). The rest of the r4 set rotates back in next round;
# every rotated-out query is re-verified each round by the full local
# check_oracle sweep and the pytest oracle replicas at sf0.001.
_CHECK_FIRST = [
    # --- never driver-checked (last of the 118) ---
    "text_winnow_fingerprint",  # let-bound fold this round (21x at 2k chars)
    "tokens_cms_check",  # CMS estimate vs exact counts, tolerance oracle
    "tokens_cms_sketch",  # rows-only: the mergeable sketch grid itself
    # --- new in r6 ---
    "docs_quantile_sketch",  # mergeable HDR-bucket quantile sketch grid
    "docs_quantile_sketch_check",  # sketch P50/P90/P99 vs exact, tolerance
    "events_quantile_merge_check",  # sketch(A)+sketch(B) == sketch(A∪B)
    "docs_reservoir_sample",  # deterministic bottom-k-by-hash per source
    "dedup_winnow_pairs",  # winnow-fingerprint bucket join (MOSS-style)
    "vocab_bpe_pair_counts",  # BPE merge scoring pass, trained-merge literals
    "docs_dup_spans",  # exact duplicated-substring spans (Lee et al. 2022)
    "docs_dup_span_profile",  # per-doc memorization-risk profile
    "docs_dup_span_strip",  # the apply face: spans cut from every doc
    "events_interval_join_binned",  # big-big range join as bin equi-join
    "orders_bloom_semijoin",  # runtime Bloom-filter pre-pruned semi-join
    "purchase_age_salted_join",  # skew-salted big-big equi-join
    "embedding_label_pca",  # grouped-map applyInPandas per-label PCA
    "docs_tfidf_cosine_pairs",  # sparse inverted-index cosine similarity
    "docs_dsir_weights",  # DSIR importance weights, integer-exact literals
    "docs_bpe_token_counts",  # trained-tokenizer per-doc subword counts
    "orders_join_size_cms_check",  # CMS inner-product join-size estimate
    "supplier_authority_pagerank",  # integer PageRank, 5 exact iterations
    "docs_dsir_selected_mixture",  # DSIR selection's mixture audit face
    # --- last driver row r3 (oldest green rows; re-stamp) ---
    "text_language_id_trigram",
    "orders_profile",
    "text_quality",
    "text_tfidf",
    "text_token_counts",
    "customer_name_ids",
    "distinct_users_by_type",
    "events_value_stats",
    "orders_by_month",
    "token_histogram",
    "text_language_id",
    "sales_rollup",
    "events_windowed",
    "events_sliding",
    "top_parts_by_brand",
    # --- last driver row r4 (next-oldest; headliners + check faces first) ---
    "q1_delay",
    "q2_late",
    "q3_wordcount",
    "q4_repeat_visits",
    "q5_dup_dates",
    "dedup_minhash_recall_check",
    "dedup_simhash_check",
    "ann_ivf_recall_check",
    "events_value_quantile_check",
    "corpus_prepare_cc",
    "ann_cosine_topk",
    "ann_cosine_topk_lsh",
    "dedup_embedding",
    "dedup_components",
    "dedup_ngram_jaccard_ppjoin",
    "text_decontaminate",
    "text_pii_scrub",
    "text_repetition",
    "text_bigram_lm",
    "top_terms",
    "multimodal_stats",
    "multimodal_frame_sample",
    "multimodal_features_ann",
    "revenue_by_nation",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    # --- past the window: the remaining r4-stamped set (events_funnel,
    # events_* interval/retention shapes, tpch_q2/q4/q8/q10/q13/q14/q18,
    # parties_union, revenue_decimal…) leads the r7 refill ---
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
