"""Z-order layout: the written files must actually enable multi-column
pruning (checked from real parquet footer statistics, not from claims),
and the rewrite must be lossless."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.layout import (
    zorder_key,
    zorder_write,
)
from analysis_of_flight_delay_data_by_mapreduce_spark.sources import read_parquet_table

from conftest import SF_DIR


def _file_ranges(path: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        if all(lo[c] is not None for c in cols):
            out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _files_hit(ranges: list[dict], col: str, lo, hi) -> int:
    return sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))


# The ≤8/16 pruning thresholds are calibrated to the sf0.1 events corpus
# (enough rows that 16 files have tight per-file ranges; smaller SFs are
# too coarse to discriminate). Derived from SF_DIR's parent so the test
# follows a relocated testdata root instead of silently testing old data.
_Z_SF_DIR = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.1")


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    if not os.path.exists(os.path.join(_Z_SF_DIR, "events.parquet")):
        pytest.skip(f"pruning thresholds need the sf0.1 corpus ({_Z_SF_DIR})")
    ev = read_parquet_table(spark, _Z_SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(ev, zpath, ["user_id", "value"], bits=6, n_files=16)
    # the single-column comparison layout: perfect on value, blind on user
    (
        ev.repartitionByRange(16, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # 10%-of-rows slices (quantile-based — `value` is skewed, so a
    # fraction-of-max slice would cover most rows and prove nothing)
    u_hi, v_hi = (
        ev.stat.approxQuantile("user_id", [0.1], 0.001)[0],
        ev.stat.approxQuantile("value", [0.1], 0.001)[0],
    )

    zr = _file_ranges(zpath, ["user_id", "value"])
    lr = _file_ranges(lpath, ["user_id", "value"])
    assert len(zr) == 16 and len(lr) == 16

    z_user = _files_hit(zr, "user_id", 0, u_hi)
    z_value = _files_hit(zr, "value", 0, v_hi)
    l_user = _files_hit(lr, "user_id", 0, u_hi)
    l_value = _files_hit(lr, "value", 0, v_hi)

    # the value-sorted layout is blind on user_id: every file matches
    assert l_user == 16
    assert l_value <= 4
    # z-order prunes meaningfully on BOTH dimensions at once
    assert z_user <= 8, f"user slice hit {z_user}/16 z-ordered files"
    assert z_value <= 8, f"value slice hit {z_value}/16 z-ordered files"


def test_zorder_write_is_lossless(spark, tmp_path):
    ev = read_parquet_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "z")
    zorder_write(ev, path, ["user_id", "value"], bits=5, n_files=4)
    back = spark.read.parquet(path)
    assert back.columns == ["event_id", "user_id", "value"]
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_zorder_key_constant_column(spark):
    """A constant column lands in cell 0 (guarded division — no NULL/NaN
    keys), so the key degenerates to the varying column's bits."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.lit(7.0).alias("c"), (F.col("id") % 10).cast("double").alias("v")
    )
    keyed = zorder_key(df, ["c", "v"], bits=4)
    assert keyed.filter(F.col("__z").isNull()).count() == 0
    assert keyed.select("__z").distinct().count() == 10


def test_zorder_key_linear_nulls_and_all_null(spark):
    """Linear strategy: NULL values land in cell 0 (matching the quantile
    path) and an all-NULL column degenerates to the constant-column case
    instead of raising on float(None)."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("c"),
        F.lit(None).cast("double").alias("dead"),
        (F.col("id") % 10).cast("double").alias("v"),
    )
    keyed = zorder_key(df, ["c", "dead", "v"], bits=4, strategy="linear")
    assert keyed.filter(F.col("__z").isNull()).count() == 0
    assert keyed.count() == 100
    # NULL c ≡ c = lo (both land in cell 0): replacing the NULLs by the
    # column minimum (1.0 — id 0 is one of the NULLs) must reproduce the
    # exact same keys row-for-row.
    ref = zorder_key(
        df.withColumn("c", F.coalesce("c", F.lit(1.0))),
        ["c", "dead", "v"],
        bits=4,
        strategy="linear",
    )
    got = [r["__z"] for r in keyed.orderBy("v", "c").select("__z").collect()]
    want = [r["__z"] for r in ref.orderBy("v", "c").select("__z").collect()]
    assert sorted(got) == sorted(want)
