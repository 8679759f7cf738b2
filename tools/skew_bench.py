"""Planted hot-key skew benchmark (NEXT.md item): head-to-head wall-clock
for the two skew remedies the engine ships.

1. JOIN skew — a fact table where one key owns ``HOT_FRAC`` of all rows,
   sort-merge-joined to a build side made non-broadcastable. Timed with
   AQE skew-join splitting OFF vs ON. Local-scale notes (verified against
   the executed plan, which carries ``skew=true`` when the split fires):
   - the skew thresholds are lowered so a laptop-sized hot partition
     qualifies (at cluster scale the 256 MB defaults fire on their own);
   - ``forceOptimizeSkewedJoin=true`` — without it AQE vetoes the split
     whenever it *might* add a shuffle, which it conservatively assumes
     for any non-terminal join even under a global aggregate;
   - partition coalescing is disabled so the OFF arm isn't re-merged into
     fewer, more balanced partitions (that would mask the hot key).
   Measured at 20M rows / HOT_FRAC=0.5: ~5.7 s OFF → ~2.6 s ON (2.2×).
2. AGG skew — grouped SUM/COUNT on the same skewed key, plain groupBy vs
   ``operators.skew.salted_sum_count``. For algebraic aggregates Spark's
   map-side partial aggregation already absorbs most of the skew (the
   module docstring says so); the numbers printed here make that claim
   measurable instead of rhetorical — expect parity, which is the point:
   salting is for post-shuffle per-key state, not algebraic sums.

Prints one JSON line: {"join_aqe_off": s, "join_aqe_on": s,
"join_skew_split_fired": bool, "agg_plain": s, "agg_salted": s,
"rows": N, "hot_frac": f}.

Run: python tools/skew_bench.py [n_rows] (default 20_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.session import get_spark

HOT_FRAC = 0.5
N_KEYS = 10_000

SKEW_CONF = {
    # make the dim non-broadcastable so the join is sort-merge and skew is real
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # local-scale skew-split triggers (cluster defaults: factor 5, 256MB)
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def build(spark, n_rows: int):
    """Skewed fact: key 0 owns HOT_FRAC of rows, the rest uniform over
    N_KEYS. Deterministic (id-derived, no rand())."""
    fact = spark.range(n_rows).select(
        F.when(
            (F.col("id") % F.lit(int(1 / HOT_FRAC))) == 0, F.lit(0)
        )
        .otherwise(F.xxhash64("id") % N_KEYS)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS + 1).select(
        (F.col("id") - 1).alias("k"), F.md5(F.col("id").cast("string")).alias("label")
    )
    return fact, dim


def skewed_join(fact, dim):
    """The measured query: join then a global aggregate (collect pulls one
    row — timing is engine work, not result serialization)."""
    return fact.join(dim, "k").select(F.sum(F.length("label")).alias("s"))


def executed_plan_has_skew_split(df) -> bool:
    df.collect()
    return "skew=true" in df._jdf.queryExecution().executedPlan().toString()


def _best_of(fn, n: int = 3) -> float:
    """Best-of-n wall-clock of ``fn()`` (one warm-up first)."""

    def timed() -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    timed()  # warm-up
    return round(min(timed() for _ in range(n)), 3)


def zipf_events_arms(spark, events_path: str) -> dict:
    """Measured skew arms over a REAL zipf-keyed events table (VERDICT r9
    item 7 — the make_scaled_sf.py --zipf-events output, rank-1 user
    ~20% of all rows):

    - ``agg_plain`` vs ``agg_salted``: per-user SUM/COUNT, plain groupBy
      vs operators.skew.salted_sum_count. Algebraic aggregates partial-
      aggregate map-side, so parity here is the honest expected result —
      the measurement makes the module docstring's claim empirical.
    - ``join_plain`` vs ``join_salted``: the purchase_age shape — facts
      joined to a per-user derived dim — where the hot user pins one
      reducer; salted_join spreads it over n_salts tasks. AQE's
      sort-merge skew split is measured as a third arm (``join_aqe``).
    """
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.skew import (
        salted_join,
        salted_sum_count,
    )

    ev = spark.read.parquet(events_path).select("event_id", "user_id", "value")
    ev.persist().count()
    out: dict[str, object] = {}

    plain_agg = ev.groupBy("user_id").agg(
        F.sum("value").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    salted_agg = salted_sum_count(ev, ["user_id"], {"sv": F.col("value")}, n_salts=32)
    out["agg_plain"] = _best_of(lambda: plain_agg.count())
    out["agg_salted"] = _best_of(lambda: salted_agg.count())

    dim = ev.groupBy("user_id").agg(F.min("event_id").alias("first_eid"))
    dim.persist().count()

    def plain_join():
        return (
            ev.join(dim, "user_id")
            .select(F.sum(F.col("event_id") - F.col("first_eid")).alias("s"))
            .collect()
        )

    def salted():
        return (
            salted_join(ev, dim, "user_id", "event_id", n_salts=8)
            .select(F.sum(F.col("event_id") - F.col("first_eid")).alias("s"))
            .collect()
        )

    # arm 1: no AQE skew split, no broadcast — the raw hot partition
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["join_plain"] = _best_of(plain_join)
    out["join_salted"] = _best_of(salted)
    # arm 2: AQE skew split on (still no broadcast)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["join_aqe"] = _best_of(plain_join)
    for k in SKEW_CONF:
        spark.conf.unset(k)
    ev.unpersist()
    dim.unpersist()
    return out


def lsh_hot_bucket_arms(spark, docs_path: str, clique_every: int = 50) -> dict:
    """Measured LSH hot-bucket cap (VERDICT r9 item 7): plant a
    degenerate near-dup clique — every ``clique_every``-th document's
    text replaced by one fixed string — and run the MinHash+LSH banding
    pipeline with the ``max_bucket`` guard on vs off. Uncapped, the
    clique lands whole in every band bucket and the self-join generates
    ~|clique|²·bands candidate pairs of zero signal; the cap drops those
    buckets and bounds the join at O(n · max_bucket)."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.dedup import (
        minhash_lsh_dedup,
    )

    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    clique_text = "the same degenerate boilerplate page repeated verbatim " * 6
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % clique_every == 0, F.lit(clique_text)
        ).otherwise(F.col("text")),
    )
    docs.persist().count()
    out: dict[str, object] = {}
    capped = minhash_lsh_dedup(docs, "doc_id", "text", max_bucket=500)
    uncapped = minhash_lsh_dedup(docs, "doc_id", "text", max_bucket=None)
    out["lsh_capped"] = _best_of(lambda: capped.count(), n=2)
    out["lsh_uncapped"] = _best_of(lambda: uncapped.count(), n=2)
    out["lsh_pairs_capped"] = capped.count()
    out["lsh_pairs_uncapped"] = uncapped.count()
    docs.unpersist()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--zipf":
        # real-data arms: --zipf EVENTS_PARQUET [DOCS_PARQUET]
        out: dict[str, object] = {
            "mode": "zipf",
            "load1_start": round(os.getloadavg()[0], 2),
        }
        spark = get_spark("skew-bench-zipf")
        out.update(zipf_events_arms(spark, sys.argv[2]))
        if len(sys.argv) > 3:
            out.update(lsh_hot_bucket_arms(spark, sys.argv[3]))
        print(json.dumps(out))
        spark.stop()
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("skew-bench")
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)

    fact, dim = build(spark, n_rows)
    fact.persist().count()
    dim.persist().count()

    def timed() -> float:
        df = skewed_join(fact, dim)  # fresh plan: AQE re-plans per run
        t0 = time.perf_counter()
        df.collect()
        return time.perf_counter() - t0

    out: dict[str, object] = {}
    for flag in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        arm = f"join_aqe_{'on' if flag == 'true' else 'off'}"
        if flag == "true":
            out["join_skew_split_fired"] = executed_plan_has_skew_split(
                skewed_join(fact, dim)
            )
        else:
            timed()  # warm-up
        out[arm] = round(min(timed() for _ in range(3)), 3)

    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.skew import (
        salted_sum_count,
    )

    def timed_agg(df) -> float:
        t0 = time.perf_counter()
        df.count()
        return time.perf_counter() - t0

    plain = fact.groupBy("k").agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
    salted = salted_sum_count(fact, ["k"], {"sv": F.col("v")}, n_salts=32)
    timed_agg(plain)
    out["agg_plain"] = round(min(timed_agg(plain) for _ in range(3)), 3)
    timed_agg(salted)
    out["agg_salted"] = round(min(timed_agg(salted) for _ in range(3)), 3)

    out.update({"rows": n_rows, "hot_frac": HOT_FRAC})
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
