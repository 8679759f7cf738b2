"""SparkSession factory.

Local testing runs ``local[N]`` (one JVM); the configs below are chosen so
the same code scales to a real cluster: AQE for runtime re-planning (skew
joins, partition coalescing), Arrow for any pandas-UDF path, UTC session
timezone so timestamp semantics match external oracles (DuckDB timestamps
are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "flight-delay-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster ``master``/memory come from spark-submit; everything
    set here is safe in both modes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter join pruning: a selective filter on the
        # build side of a shuffle join materializes a bloom filter that
        # prunes the probe-side SCAN before the shuffle. Gated by size
        # thresholds (10 GB application side by default), so it is a no-op
        # at test scale and self-activates exactly where it pays — the
        # 100 TB fact-fact joins. Injection is pinned (with lowered
        # thresholds) in tests/test_plan_shapes.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Arrow transfer for pandas UDF / toPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # DuckDB (the correctness oracle) treats timestamps as UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # The synthetic parquet stores TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read as int64 nanos and convert in
        # sources.readers (exact integer div — no precision loss).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Managed-table warehouse (bucketed tables) outside the repo tree.
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/spark_graft_derby")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", "48g")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Query shapes with the heaviest first-execution (Janino whole-stage-
# codegen JIT) cost, measured at sf0.1 (BENCH_FULL.json cold map, r5):
# the dedup tier's wide min-hash aggregates and fold-heavy band joins.
_WARM_START_SHAPES = [
    "q1_delay",
    "dedup_minhash",
    "dedup_incremental_minhash_check",
    "dedup_embedding",
    "dedup_ngram_jaccard_ppjoin",
    "corpus_prepare",
]


def warm_start(
    spark: SparkSession,
    sf_dir: str = "/root/testdata/sf0.001",
    shapes: list[str] | None = None,
) -> float:
    """Pre-compile the hottest generated-code shapes by replaying them at
    a tiny scale factor; returns the wall-clock spent.

    Measured honestly (r5): this RELOCATES the per-session JIT cost, it
    does not reduce it — each generated class compiles exactly once per
    JVM wherever it first runs (replay ~27 s at sf0.001 bought back
    ~21 s of sf0.1 first-run time for the six shapes above). Use it only
    where the warmup window is genuinely free: a session pool pre-warming
    BEFORE user queries arrive, where it converts first-query latency
    into idle-time work. Pointless (net-zero) inside a single
    synchronous job — which is why bench.py does not call it.
    """
    import time

    from .plans import synthetic

    t0 = time.perf_counter()
    for name in shapes or _WARM_START_SHAPES:
        synthetic.QUERIES[name](spark, sf_dir).count()
    return time.perf_counter() - t0
