"""Own-register distinct-count sketches: HyperLogLog + KMV theta.

Pure-Catalyst replacements for the serialized-binary sketch builders
(``F.hll_sketch_agg`` / ``F.theta_sketch_agg``), built so the DRIVER can
hash-check them end-to-end: every stage — ``xxhash64`` bucketing,
leading-zero registers, the harmonic-mean estimate, KMV thresholds —
is a deterministic column expression, and the module ships pyarrow+numpy
twins (:func:`hll_estimates_parquet`, :func:`kmv_overlap_parquet`) that
recompute the estimates OUTSIDE Spark for VALUES-literal oracles (the
``operators/dedup_twin.py`` recipe).

HLL (Flajolet et al. 2007; 64-bit-hash variant per HLL++, Heule et al.
2013 §4 — a 64-bit hash removes the large-range correction entirely):

- register rows ``(keys..., bucket, reg)`` with ``bucket`` = low ``p``
  bits of ``xxhash64(value)`` and ``reg`` = max over the group of
  rho(suffix) = leading zeros of the remaining ``64-p`` bits + 1. Rows,
  not arrays: columnar register storage merges with a plain
  ``groupBy(bucket).max(reg)`` — the mergeable-rollup pattern at scale.
- estimate: ``alpha_m * m^2 / sum(2^-reg_j)``. The harmonic sum is kept
  EXACT in integer space — ``sum(2^(63-reg))`` as ``decimal(38,0)``
  (order-independent, unlike a float sum) — and converted to double for
  ONE division, so the result is bit-deterministic under any
  partitioning. Small-range (V empty registers > 0, raw <= 2.5m) uses
  linear counting ``m*ln(m/V)`` via a broadcast lookup table whose
  doubles are computed ONCE in Python — neither engine evaluates ``ln``,
  so no JVM-vs-libm last-ulp drift can split Spark from the twin.

KMV theta (Bar-Yossef et al. 2002 / DataSketches theta semantics):

- per group keep the ``k`` smallest distinct hash values (unsigned
  order via the sign-bit flip) + the (k+1)-th as the threshold theta;
  a group with <= k distinct hashes is EXACT (theta = 1.0).
- intersection estimate for (A, B): theta* = min(thetaA, thetaB),
  ``|{h in sampleA ∩ sampleB : h < theta*}| / frac(theta*)`` — one
  long/double division, deterministic.
- the top-k is TWO-LEVEL (salted local top-(k+1), then global) so a
  hot group never funnels its full distinct set through one task — the
  window input per group is bounded by ``salts * (k+1)`` rows.

Scale posture: register building and KMV sampling are single grouped
shuffles over ``distinct``-reduced rows; everything after is O(m) or
O(k) per group. At 100 TB you'd bump ``p``/``k``, not the shape.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

P_DEFAULT = 12  # m = 4096 registers -> ~1.04/sqrt(m) = 1.6% RSE
K_DEFAULT = 4096  # KMV sample size (DataSketches theta default)
_MIN_LONG = -(1 << 63)
_MAX_LONG = (1 << 63) - 1
_TWO63 = float(1 << 63)
_TWO64 = float(1 << 64)


def _alpha(m: int) -> float:
    # the standard bias constant; m >= 128 in practice here
    return 0.7213 / (1.0 + 1.079 / m)


def _raw_const(p: int) -> float:
    # alpha_m * m^2 * 2^63 — the whole numerator folded into ONE Python
    # float so Spark and the twin divide the IDENTICAL literal by S
    m = 1 << p
    return _alpha(m) * m * m * float(1 << 63)


def _lc_table(p: int) -> list[float]:
    # linear-counting estimates m*ln(m/V) for V = 1..m, computed once in
    # CPython — the only transcendental in the whole pipeline
    m = 1 << p
    return [m * math.log(m / v) for v in range(1, m + 1)]


# ---------------------------------------------------------------------------
# HLL — Spark side
# ---------------------------------------------------------------------------


def hll_register_rows(
    df: DataFrame, keys: list[str], value_col: str, p: int = P_DEFAULT
) -> DataFrame:
    """Mergeable HLL sketch of ``value_col`` per ``keys`` group as
    register ROWS ``(keys..., bucket, reg)`` — one grouped shuffle,
    at most ``m`` rows per group."""
    m = 1 << p
    w = 64 - p
    h = F.xxhash64(F.col(value_col))
    bucket = h.bitwiseAND(F.lit(m - 1))
    suffix = F.shiftrightunsigned(h, p)
    # rho = leading zeros within the w-bit suffix + 1 = w+1 - bitlen;
    # bin() of a positive long has no leading zeros, so bitlen =
    # length(bin(suffix)); the all-zero suffix (P = 2^-w) gets w+1
    rho = F.when(suffix == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(suffix))
    )
    return (
        df.select(*keys, bucket.alias("bucket"), rho.cast("int").alias("reg"))
        .groupBy(*keys, "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_merge_rows(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Union of sketches = per-bucket max over the merged grouping —
    drop any key columns not in ``keys`` before calling."""
    return regs.groupBy(*keys, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate_rows(
    regs: DataFrame,
    keys: list[str],
    out: str = "approx_distinct",
    p: int = P_DEFAULT,
) -> DataFrame:
    """Deterministic HLL estimate per ``keys`` group from register rows.

    Exact-integer harmonic sum (``decimal(38,0)``; max m*2^63 = 2^75
    fits), one double division, and a broadcast-lookup linear-counting
    branch — see the module docstring for why each choice is what makes
    the driver's value-hash comparison stable."""
    m = 1 << p
    spark = regs.sparkSession
    term = F.expr("shiftleft(1L, 63 - reg)")
    agg = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum(term.cast("decimal(38,0)")).alias("_sp"),
    )
    v = (F.lit(m) - F.col("_nb")).cast("int")
    two63 = F.expr("CAST('9223372036854775808' AS DECIMAL(38,0))")
    s = (F.col("_sp") + v.cast("decimal(38,0)") * two63).cast("double")
    raw = F.lit(_raw_const(p)) / s
    lc = spark.createDataFrame(
        [(i + 1, e) for i, e in enumerate(_lc_table(p))], "_v int, _lc double"
    )
    est = F.floor(
        F.when((v > 0) & (raw <= F.lit(2.5 * m)), F.col("_lc")).otherwise(raw)
    ).cast("long")
    return (
        agg.withColumn("_vz", v)
        .join(lc, F.col("_vz") == F.col("_v"), "left")
        .select(*keys, est.alias(out))
    )


# ---------------------------------------------------------------------------
# KMV theta — Spark side
# ---------------------------------------------------------------------------


def _flip(value_col: str) -> Column:
    # sign-bit flip: signed order of (h XOR MIN_LONG) == unsigned order
    # of h, so window/rank/compare all run on plain BIGINT comparisons
    return F.xxhash64(F.col(value_col)).bitwiseXOR(F.lit(_MIN_LONG))


def kmv_samples(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = K_DEFAULT,
    salts: int = 32,
) -> DataFrame:
    """Per-group KMV sketch rows: the ``k`` smallest distinct hashes
    (``rn`` 1..k) plus the threshold row (``rn`` = k+1) when the group
    has more than ``k`` distinct values. Two-level top-k: a salted
    local pass bounds the per-group window input to ``salts*(k+1)``
    rows regardless of group size."""
    tu = df.select(*keys, _flip(value_col).alias("hf")).distinct()
    local = (
        tu.withColumn("_salt", F.pmod(F.col("hf"), F.lit(salts)))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys, "_salt").orderBy("hf")
            ),
        )
        .filter(F.col("_rn") <= k + 1)
        .drop("_rn", "_salt")
    )
    return local.withColumn(
        "rn", F.row_number().over(Window.partitionBy(*keys).orderBy("hf"))
    ).filter(F.col("rn") <= k + 1)


def kmv_pair_overlap(
    df: DataFrame,
    key: str,
    value_col: str,
    k: int = K_DEFAULT,
    out: str = "approx_both",
) -> DataFrame:
    """Approximate ``|values(A) ∩ values(B)|`` for every key pair
    (a < b) from per-key KMV sketches — every pairwise overlap from ONE
    sketch pass over the facts, the theta-sketch set-algebra pattern.
    Exact when both groups hold <= k distinct hashes."""
    from .cache import scoped_persist

    # the sketch rows feed samples (twice, self-joined), thetas (twice)
    # and the key frame — persist the O(k * |keys|) result so the
    # distinct+top-k pipeline over the facts runs ONCE, not per branch
    sk = scoped_persist(kmv_samples(df, [key], value_col, k=k))
    samples = sk.filter(F.col("rn") <= k).drop("rn")
    thetas = sk.filter(F.col("rn") == k + 1).select(
        F.col(key).alias("_tk"), F.col("hf").alias("theta")
    )

    keys_df = samples.select(key).distinct()
    a, b = keys_df.alias("a"), keys_df.alias("b")
    pairs = a.join(b, F.col(f"a.{key}") < F.col(f"b.{key}")).select(
        F.col(f"a.{key}").alias("type_a"), F.col(f"b.{key}").alias("type_b")
    )
    pairs = (
        pairs.join(
            thetas.withColumnRenamed("theta", "theta_a"),
            pairs.type_a == F.col("_tk"),
            "left",
        )
        .drop("_tk")
        .join(
            thetas.withColumnRenamed("theta", "theta_b"),
            F.col("type_b") == F.col("_tk"),
            "left",
        )
        .drop("_tk")
    )

    sa, sb = samples.alias("sa"), samples.alias("sb")
    common = (
        sa.join(
            sb,
            (F.col("sa.hf") == F.col("sb.hf"))
            & (F.col(f"sa.{key}") < F.col(f"sb.{key}")),
        )
        .select(
            F.col(f"sa.{key}").alias("type_a"),
            F.col(f"sb.{key}").alias("type_b"),
            F.col("sa.hf").alias("hf"),
        )
        .join(pairs, ["type_a", "type_b"])
        .filter(
            F.col("hf")
            < F.least(
                F.coalesce(F.col("theta_a"), F.lit(_MAX_LONG)),
                F.coalesce(F.col("theta_b"), F.lit(_MAX_LONG)),
            )
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )

    theta_star = F.least(
        F.coalesce(F.col("theta_a"), F.lit(_MAX_LONG)),
        F.coalesce(F.col("theta_b"), F.lit(_MAX_LONG)),
    )
    frac = (theta_star.cast("double") + F.lit(_TWO63)) / F.lit(_TWO64)
    cmn = F.coalesce(F.col("_common"), F.lit(0)).cast("long")
    est = F.when(
        F.col("theta_a").isNull() & F.col("theta_b").isNull(), cmn
    ).otherwise(F.floor(cmn / frac))
    return (
        pairs.join(common, ["type_a", "type_b"], "left")
        .select("type_a", "type_b", est.cast("long").alias(out))
    )


# ---------------------------------------------------------------------------
# pyarrow/numpy twins — recompute the estimates outside Spark so
# VALUES-literal oracles witness the full pipeline (bit-exact: same
# xxhash64 twin, same integer harmonic sum, same single division, same
# Python-computed LC table)
# ---------------------------------------------------------------------------


def _hashes_by_key(sf_dir: str, table: str, key: str, value: str) -> dict:
    import numpy as np
    import pyarrow.parquet as pq

    from .xxh64 import xxh64_long_vec

    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                      columns=[key, value])
    keys = np.asarray(t.column(key).to_pylist())
    vals = np.asarray(t.column(value).to_pylist(), dtype=np.int64)
    hashes = xxh64_long_vec(vals, 42)  # uint64
    return {k: hashes[keys == k] for k in sorted(set(keys.tolist()))}


def hll_estimates_parquet(
    sf_dir: str,
    table: str = "events",
    key: str = "event_type",
    value: str = "user_id",
    p: int = P_DEFAULT,
) -> dict[str, int]:
    """Twin of ``hll_register_rows``+``hll_estimate_rows`` over a BIGINT
    value column → {key: floored estimate}."""
    import numpy as np

    m = 1 << p
    w = 64 - p
    lc = _lc_table(p)
    const = _raw_const(p)
    out = {}
    for kval, h in _hashes_by_key(sf_dir, table, key, value).items():
        bucket = (h & np.uint64(m - 1)).astype(np.int64)
        suffix = (h >> np.uint64(p)).astype(np.float64)  # < 2^52, exact
        _mant, exp = np.frexp(suffix)  # bitlen of suffix (0 -> 0)
        rho = np.where(suffix == 0, w + 1, w + 1 - exp).astype(np.int64)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        s = sum(1 << (63 - int(r)) for r in regs)
        vz = int((regs == 0).sum())
        raw = const / float(s)
        est = lc[vz - 1] if vz > 0 and raw <= 2.5 * m else raw
        out[kval] = math.floor(est)
    return out


def kmv_overlap_parquet(
    sf_dir: str,
    table: str = "events",
    key: str = "event_type",
    value: str = "user_id",
    k: int = K_DEFAULT,
) -> list[tuple[str, str, int]]:
    """Twin of ``kmv_pair_overlap`` → sorted (key_a, key_b, estimate).
    Replicates the flip-domain sentinel semantics exactly (the strict
    ``hf < theta*`` compare runs against MAX_LONG in exact mode too)."""
    import numpy as np

    sk = {}
    for kval, h in _hashes_by_key(sf_dir, table, key, value).items():
        u = np.unique(h)  # ascending unsigned == flip-signed order
        theta = int(u[k]) if len(u) > k else None
        sk[kval] = (set(u[: min(k, len(u))].tolist()), theta)

    sent = (1 << 64) - 1  # MAX_LONG in the flip domain
    out = []
    for ta in sorted(sk):
        for tb in sorted(sk):
            if not ta < tb:
                continue
            (s_a, th_a), (s_b, th_b) = sk[ta], sk[tb]
            th_star = min(x for x in (th_a, th_b, sent) if x is not None)
            common = sum(1 for h in s_a & s_b if h < th_star)
            if th_a is None and th_b is None:
                est = common
            else:
                # the sign-bit flip is, in value terms, a shift by -2^63:
                # flip_signed(u) = u - 2^63 for every 64-bit u
                frac = (float(th_star - (1 << 63)) + _TWO63) / _TWO64
                est = math.floor(common / frac)
            out.append((ta, tb, int(est)))
    return sorted(out)
