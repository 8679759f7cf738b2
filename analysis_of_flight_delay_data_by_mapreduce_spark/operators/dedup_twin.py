"""Out-of-Spark twins of the hash-family-dependent dedup operators.

These recompute ``minhash_lsh_dedup`` and ``simhash_near_dup`` from the
same parquet with pyarrow + the :mod:`xxh64` Spark-hash twin —
BIT-identical semantics step for step (tokenize → shingle → xxhash64 →
seeded family / bit votes → band buckets → hot-bucket cap → candidate
pairs → exact verify). Their outputs render as VALUES literals inside
the DuckDB oracles, which converts the two rows-only driver checks into
full hash differentials (the ``embedding_label_pca`` trained-constants
move): a drift in ANY stage — tokenization, hash seeding, band fold
order, bucket cap, verify threshold — flips pairs and goes red.

The twins replicate, in order (operators/dedup.py):
- ``word_tokens``: ASCII-whitespace split, empties dropped
  (``functions/__init__.py:63``; the corpus is ASCII so Java's and
  Python's ASCII ``\\s`` classes agree),
- ``word_shingles(k)``: k-word joins, short docs collapse to one
  shingle,
- MinHash: ``sig[i] = min over distinct shingles of
  xxhash64(lit(i) int-lane, xxhash64(shingle))`` (``dedup.py:141``),
- band fold: ``aggregate(slice, 0L, (acc, x) -> xxhash64(acc, x))``
  (``dedup.py:181``),
- SimHash: count-weighted per-bit majority over shingle hashes
  (``dedup.py:609``), 16-bit bands, ``bit_count`` verify ≤ 3,
- the shared ``max_bucket`` hot-bucket cap (``dedup.py:115``).
"""

from __future__ import annotations

import os
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq

from .xxh64 import SPARK_SEED, xxh64_int, xxh64_long_vec, xxh64_string

_WS = re.compile(r"\s+", flags=re.ASCII)


def _word_shingles(text: str, k: int) -> list[str]:
    toks = [t for t in _WS.split(text) if t]
    if len(toks) >= k:
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return [" ".join(toks)]


def _docs(path: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(os.path.join(path, "documents.parquet"),
                      columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def _prune_and_pair(entries: dict, max_bucket: int | None) -> set:
    """(band, bucket) -> [ids] → distinct candidate (id_a < id_b) pairs,
    after dropping buckets holding more than ``max_bucket`` members."""
    pairs = set()
    for ids in entries.values():
        if max_bucket is not None and len(ids) > max_bucket:
            continue
        ids = sorted(set(ids))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def minhash_lsh_pairs_parquet(
    sf_dir: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    verify_jaccard: float = 0.3,
    max_bucket: int | None = 500,
) -> list[tuple[int, int]]:
    """Twin of ``minhash_lsh_dedup(docs, "doc_id", "text", 32, 8, 3,
    "word", verify_jaccard=0.3)`` → sorted (id_a, id_b) pairs."""
    ids, texts = _docs(sf_dir)
    shingle_sets = [set(_word_shingles(t, shingle_k)) for t in texts]

    hash_cache: dict[str, int] = {}
    doc_hashes = []
    for ss in shingle_sets:
        hs = []
        for s in ss:
            h = hash_cache.get(s)
            if h is None:
                h = hash_cache[s] = xxh64_string(s)
            hs.append(h)
        doc_hashes.append(np.array(hs, dtype=np.int64))

    # seeded family, vectorized per seed over the concatenated hash runs
    flat = np.concatenate(doc_hashes).view(np.uint64)
    lens = np.array([len(h) for h in doc_hashes])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sig = np.empty((len(ids), num_hashes), dtype=np.int64)
    for i in range(num_hashes):
        seed_i = xxh64_int(i, SPARK_SEED) & ((1 << 64) - 1)
        hv = xxh64_long_vec(flat, seed_i).view(np.int64)
        sig[:, i] = np.minimum.reduceat(hv, starts)

    # band fold: acc=0L, then acc = xxhash64(acc, x) per signature row
    rows_per_band = num_hashes // bands
    entries: dict[tuple[int, int], list[int]] = defaultdict(list)
    for b in range(bands):
        acc = np.zeros(len(ids), dtype=np.uint64)
        for r in range(rows_per_band):
            t = xxh64_long_vec(acc, SPARK_SEED)
            acc = xxh64_long_vec(
                sig[:, b * rows_per_band + r].view(np.uint64), t
            )
        buckets = acc.view(np.int64)
        for d, bk in enumerate(buckets.tolist()):
            entries[(b, bk)].append(ids[d])

    by_id = dict(zip(ids, shingle_sets))
    out = []
    for a, b2 in _prune_and_pair(entries, max_bucket):
        sa, sb = by_id[a], by_id[b2]
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= verify_jaccard:
            out.append((a, b2))
    return sorted(out)


def simhash_pairs_parquet(
    sf_dir: str,
    shingle_k: int = 3,
    band_bits: int = 16,
    max_bucket: int | None = 500,
    max_hamming: int = 3,
) -> list[tuple[int, int, int]]:
    """Twin of ``simhash_near_dup(docs, "doc_id", "text")`` →
    sorted (id_a, id_b, hamming)."""
    ids, texts = _docs(sf_dir)
    hash_cache: dict[str, int] = {}
    shifts = np.arange(64, dtype=np.uint64)
    fps = np.empty(len(ids), dtype=np.uint64)
    for d, text in enumerate(texts):
        counts = Counter(_word_shingles(text, shingle_k))
        hs, cs = [], []
        for s, c in counts.items():
            h = hash_cache.get(s)
            if h is None:
                h = hash_cache[s] = xxh64_string(s)
            hs.append(h)
            cs.append(c)
        hv = np.array(hs, dtype=np.int64).view(np.uint64)
        bits = (hv[:, None] >> shifts) & np.uint64(1)  # (m, 64)
        ones = np.array(cs, dtype=np.int64) @ bits.astype(np.int64)
        n = int(sum(cs))
        fp = np.uint64(0)
        fps[d] = np.sum(
            ((2 * ones - n) > 0).astype(np.uint64) << shifts, dtype=np.uint64
        ) if n else fp

    n_bands = 64 // band_bits
    mask = np.uint64((1 << band_bits) - 1)
    entries: dict[tuple[int, int], list[int]] = defaultdict(list)
    for b in range(n_bands):
        buckets = (fps >> np.uint64(b * band_bits)) & mask
        for d, bk in enumerate(buckets.tolist()):
            entries[(b, bk)].append(ids[d])

    by_id = dict(zip(ids, fps.tolist()))
    out = []
    for a, b2 in _prune_and_pair(entries, max_bucket):
        ham = int(bin(by_id[a] ^ by_id[b2]).count("1"))
        if ham <= max_hamming:
            out.append((a, b2, ham))
    return sorted(out)
