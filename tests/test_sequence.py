"""Distributed prefix sum: equality with the naive global window, stability
across partition counts, and the range-partitioned plan shape."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sequence import (
    global_running_sum,
    ntile_exact,
    pack_chunks,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import plan_text


def _data(spark):
    return spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens")
    )


def test_running_sum_equals_naive_window(spark):
    df = _data(spark)
    naive = {
        r.doc_id: r.run
        for r in df.withColumn(
            "run",
            F.sum("n_tokens").over(
                W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        ).collect()
    }
    dist = {
        r.doc_id: r.running
        for r in global_running_sum(df, "doc_id", "n_tokens").collect()
    }
    assert dist == naive


def test_running_sum_partition_count_stable(spark):
    df = _data(spark)
    a = {r.doc_id: r.running for r in global_running_sum(df, "doc_id", "n_tokens", num_partitions=3).collect()}
    b = {r.doc_id: r.running for r in global_running_sum(df, "doc_id", "n_tokens", num_partitions=17).collect()}
    assert a == b


def test_plan_buckets_partition_the_data(spark):
    df = global_running_sum(_data(spark), "doc_id", "n_tokens")
    txt = plan_text(df, "simple")
    # the data path shuffles on the literal-boundary bucket id — parallel
    assert "hashpartitioning(__pid" in txt
    # the only SinglePartition exchange is over per-bucket totals
    # (#buckets rows), never the data itself — the data-side input to it
    # is an aggregate of __pid
    assert txt.count("Exchange SinglePartition") <= 1


def test_running_sum_stable_across_actions(spark):
    # regression: bucket ids must be a pure function of the data, so two
    # separate actions over the SAME DataFrame agree (the round-1 driver
    # hash check failed because spark_partition_id()+persist could
    # re-sample range boundaries between actions)
    df = global_running_sum(_data(spark), "doc_id", "n_tokens")
    a = {(r.doc_id, r.running) for r in df.collect()}
    assert df.count() == 5000
    b = {(r.doc_id, r.running) for r in df.collect()}
    assert a == b


def test_pack_chunks_budget_respected(spark):
    df = _data(spark).limit(200)
    packed = pack_chunks(df, "doc_id", "n_tokens", max_tokens=100).collect()
    by_chunk: dict[int, int] = {}
    for r in packed:
        by_chunk[r.chunk_id] = by_chunk.get(r.chunk_id, 0) + r.n_tokens
    # every chunk except possibly where a doc straddles stays <= budget +
    # the straddling doc's excess; with tokens <= 37 << 100 no chunk
    # exceeds budget + 37
    assert all(v <= 100 + 37 for v in by_chunk.values())
    assert len(by_chunk) > 1


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 400)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(64, 1024),
)
def test_pack_chunks_matches_python_model(spark, rows, budget):
    """pack_chunks must equal the sequential streaming model — sort by key,
    accumulate tokens, chunk = floor(prefix_excluding_self / budget) — on
    arbitrary ids/token-counts/budgets. This is the property the round-1
    driver hash check caught being partitioning-dependent; the fix
    (data-derived range buckets) must hold for any input."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sequence import (
        pack_chunks,
    )

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: r.chunk_id
        for r in pack_chunks(df, "doc_id", "n_tokens", budget).collect()
    }
    expected = {}
    acc = 0
    for did, nt in sorted(rows):
        expected[did] = acc // budget
        acc += nt
    assert got == expected


def test_ntile_exact_matches_window_ntile(spark):
    # asc and desc orderings, with ties broken by a unique key — must be
    # bit-identical to the SQL window ntile the oracles use.
    df = spark.range(0, 1003).select(
        F.col("id").alias("k"), (F.col("id") % 29).alias("v")
    )
    for asc in (True, False):
        order = [F.col("v").asc() if asc else F.col("v").desc(), F.col("k").asc()]
        want = {
            r.k: r.t
            for r in df.withColumn(
                "t", F.ntile(4).over(W.orderBy(*order)).cast("long")
            ).collect()
        }
        got = {
            r.k: r.t
            for r in ntile_exact(
                df, 4, "v", ascending=asc, tiebreak="k", out="t"
            ).collect()
        }
        assert got == want, f"ascending={asc}"


def test_ntile_exact_small_and_uneven(spark):
    # n < tiles and n % tiles != 0 exercise the ceil/floor tile-size split
    for n, tiles in [(3, 4), (10, 4), (7, 3)]:
        df = spark.range(0, n).select(F.col("id").alias("k"), F.col("id").alias("v"))
        want = {
            r.k: r.t
            for r in df.withColumn(
                "t", F.ntile(tiles).over(W.orderBy("v", "k")).cast("long")
            ).collect()
        }
        got = {
            r.k: r.t
            for r in ntile_exact(df, tiles, "v", tiebreak="k", out="t").collect()
        }
        assert got == want, (n, tiles)


def test_ntile_exact_partition_count_stable(spark):
    df = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    a = {r.k: r.t for r in ntile_exact(df, 4, "v", tiebreak="k", out="t", num_partitions=3).collect()}
    b = {r.k: r.t for r in ntile_exact(df, 4, "v", tiebreak="k", out="t", num_partitions=17).collect()}
    assert a == b


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=300),
    st.integers(min_value=2, max_value=9),
)
@settings(max_examples=8, deadline=None)
def test_global_rank_matches_window_model(spark, values, n_parts):
    """Property: global_rank == ROW_NUMBER over (v asc, idx asc) for
    arbitrary duplicate-heavy data and any bucket count."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sequence import (
        global_rank,
    )

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k long, v long")
    want = {
        r.k: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy("v", "k")).cast("long")
        ).collect()
    }
    got = {
        r.k: r.rank
        for r in global_rank(
            df, "v", tiebreak="k", num_partitions=n_parts
        ).collect()
    }
    assert got == want


def test_range_bucket_wide_flat_form_plans_and_matches(spark):
    """VERDICT r8 item 4: n_buckets=2048 must PLAN (flat array+filter
    expression, not a 2047-deep CASE nest) and assign exactly the same
    buckets the chained-when form defines: #boundaries strictly below
    the key, NULLs in bucket 0."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sequence import (
        _range_stats,
        range_bucket,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 997 == 0, None)
        .otherwise((F.col("id") * 37) % 65536)
        .alias("v")
    )
    got = df.select("v", range_bucket(df, "v", 2048).alias("b")).collect()
    _, boundaries = _range_stats(df, F.col("v"), "Column<'v'>", 2048, None)
    assert len(boundaries) > 64  # genuinely exercises the flat form
    for r in got:
        want = sum(1 for b in boundaries if r.v is not None and r.v > b)
        assert r.b == want, (r.v, r.b, want)
    assert max(r.b for r in got) > 1000  # really spread over many buckets


def test_range_bucket_two_forms_agree_at_threshold(spark):
    """The chained-when (<=64 boundaries) and flat-array (>64) forms
    implement one function: same input bucketed with n_buckets on both
    sides of the threshold yields nested, order-consistent assignments."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sequence import (
        range_bucket,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select(((F.col("id") * 13) % 9973).alias("v"))
    rows = df.select(
        "v",
        range_bucket(df, "v", 32).alias("small"),
        range_bucket(df, "v", 256).alias("big"),
    ).collect()
    # both must be monotone in v (order-preserving bucketings)
    for col in ("small", "big"):
        by_v = sorted((r.v, getattr(r, col)) for r in rows)
        assert all(b1 <= b2 for (_, b1), (_, b2) in zip(by_v, by_v[1:]))


def test_range_bucket_rejects_absurd_bucket_counts(spark):
    import pytest

    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.sequence import (
        range_bucket,
    )

    df = spark.range(0, 10).withColumnRenamed("id", "v")
    with pytest.raises(ValueError, match="ceiling"):
        range_bucket(df, "v", 100_000)
