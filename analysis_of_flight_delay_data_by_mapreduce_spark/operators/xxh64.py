"""Pure-Python/numpy twin of Spark's ``xxhash64`` expression.

The XXH64 algorithm is public (xxhash.com / Cyan4973, BSD-2); Spark's
``F.xxhash64(col1, col2, ...)`` evaluates it with seed 42 and FOLDS
columns left-to-right — the hash of column k becomes the seed for
column k+1 (``org.apache.spark.sql.catalyst.expressions.XxHash64``).
Per-type encodings:

- long  → the 8-byte little-endian lane (one 8-byte tail step),
- int   → the 4-byte lane (one 4-byte tail step),
- string→ standard XXH64 over the UTF-8 bytes.

This twin exists so data-derived DuckDB oracles can recompute
hash-family-dependent results (MinHash-LSH, SimHash) OUTSIDE Spark and
render them as literals — converting rows-only driver checks into full
hash differentials. ``tests/test_dedup.py`` pins every path against the
live ``F.xxhash64`` column expression.

Scalar paths are exact for any byte length; the vectorized paths
(`xxh64_long_vec`) cover the hot twin loops (seeded hash families,
band folds) with numpy uint64 wraparound arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string → SIGNED 64-bit int (Spark BIGINT)."""
    seed &= _M
    n = len(data)
    p = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed
        a4 = (seed - _P1) & _M
        while p + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, p)
            a1, a2, a3, a4 = (
                _round(a1, l1), _round(a2, l2), _round(a3, l3), _round(a4, l4)
            )
            p += 32
        h = (
            _rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)
        ) & _M
        for a in (a1, a2, a3, a4):
            h = ((h ^ _round(0, a)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while p + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, p)
        h = (_rotl(h ^ _round(0, k1), 27) * _P1 + _P4) & _M
        p += 8
    if p + 4 <= n:
        (k,) = struct.unpack_from("<I", data, p)
        h = (_rotl(h ^ ((k * _P1) & _M), 23) * _P2 + _P3) & _M
        p += 4
    while p < n:
        h = (_rotl(h ^ ((data[p] * _P5) & _M), 11) * _P1) & _M
        p += 1
    return _signed(_fmix(h))


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64`` of one BIGINT value."""
    return xxh64_bytes(struct.pack("<q", v), seed)


def xxh64_int(v: int, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64`` of one INT value (4-byte lane — an int literal
    like ``F.lit(3)`` takes this path, NOT the long one)."""
    return xxh64_bytes(struct.pack("<i", v), seed)


def xxh64_string(s: str, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64`` of one STRING value (UTF-8 bytes)."""
    return xxh64_bytes(s.encode("utf-8"), seed)


def xxh64_chain(values, seed: int = SPARK_SEED) -> int:
    """Spark's multi-column fold: each value's hash seeds the next.
    Values are (kind, v) pairs with kind in {'int', 'long', 'str'}."""
    h = seed
    for kind, v in values:
        if kind == "int":
            h = xxh64_int(v, h)
        elif kind == "long":
            h = xxh64_long(v, h)
        else:
            h = xxh64_string(v, h)
    return h


# ---------------------------------------------------------------------------
# Vectorized long path — the twin's hot loops hash ARRAYS of longs with
# (scalar or per-element) seeds: seeded minhash families and band folds.
# ---------------------------------------------------------------------------


def _rotl_vec(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def xxh64_long_vec(vals: np.ndarray, seed) -> np.ndarray:
    """Element-wise Spark ``xxhash64`` over int64/uint64 values with a
    scalar or per-element uint64 seed; returns uint64 (view as int64 for
    the signed Spark value)."""
    v = vals.astype(np.uint64, copy=False)
    s = (
        seed.astype(np.uint64, copy=False)
        if isinstance(seed, np.ndarray)
        else np.uint64(seed & _M)
    )
    with np.errstate(over="ignore"):
        h = s + np.uint64(_P5) + np.uint64(8)
        k1 = _rotl_vec(v * np.uint64(_P2), 31) * np.uint64(_P1)
        h = _rotl_vec(h ^ k1, 27) * np.uint64(_P1) + np.uint64(_P4)
        h ^= h >> np.uint64(33)
        h *= np.uint64(_P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
    return h
