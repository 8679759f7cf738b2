"""Build a scaled-up benchmark dataset from an existing testdata SF dir
(VERDICT r8 item 3: one measured 10x scale point turns the 100x-design
claim empirical).

    python tools/make_scaled_sf.py [src_dir] [dst_dir] [factor]
    # default: /root/testdata/sf0.1 -> /tmp/sf1, factor 10

The scaled dataset is ``factor`` key-remapped copies of the source —
every key column (primary AND foreign) in copy ``c`` is offset by
``c * 10_000_000``, so referential integrity is exact per copy and key
spaces never collide. Dimension tables (region, nation) stay fixed:
dims don't scale with fact volume, which keeps broadcast-join sides
realistic. Two tables need more than key remapping to keep OPERATOR
SELECTIVITY linear in the factor (the property that makes the scale
point honest):

- ``documents.text`` in copies c > 0 is a per-(copy, doc) seeded token
  PERMUTATION of the original. A permutation preserves length, token
  count, stopword/punctuation/digit counts — so quality scores are
  bit-identical — while breaking word-3-shingle and normalized-text
  fingerprint identity across copies: exact-dup and near-dup pair
  counts scale ~linearly instead of quadratically (verbatim copies
  would plant factor-sized duplicate cliques and measure an artifact,
  not the engine). ``n_chars`` is recomputed from the rewritten text
  (single-space joined), matching the source's n_chars == len(text)
  invariant.
- ``embeddings.embedding`` in copy ``c`` is cyclically shifted by
  ``c`` coordinates — an orthogonal permutation, so all within-copy
  distances (and vector norms) are preserved exactly while cross-copy
  vectors stop being bit-identical duplicates.

Everything else (timestamps, values, categorical columns, JSON props)
rides through unchanged: per-group row counts and value distributions
are preserved, group cardinalities scale by ``factor``. Output parquet
preserves the source's arrow schema (timestamp[us] etc.) so Spark and
DuckDB read the scaled dir exactly like the testdata dirs.
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000

#: key columns to offset per copy, per table (dims absent = copied once)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def _permuted_text(text: str, copy: int, doc_id: int) -> str:
    toks = text.split()
    rng = random.Random((copy << 33) ^ doc_id)
    rng.shuffle(toks)
    return " ".join(toks)


def _scale_table(name: str, src: str, dst: str, factor: int) -> int:
    table = pq.read_table(os.path.join(src, f"{name}.parquet"))
    if name in DIMS:
        pq.write_table(table, os.path.join(dst, f"{name}.parquet"))
        return table.num_rows
    copies = []
    cols = table.column_names
    data = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    for c in range(factor):
        out = {}
        for col in cols:
            if col in KEY_COLS[name]:
                out[col] = [v + c * STRIDE for v in data[col]]
            else:
                out[col] = data[col]
        if name == "documents" and c > 0:
            out["text"] = [
                _permuted_text(t, c, d)
                for t, d in zip(data["text"], data["doc_id"])
            ]
            out["n_chars"] = [len(t) for t in out["text"]]
        if name == "embeddings" and c > 0:
            out["embedding"] = [v[c:] + v[:c] for v in data["embedding"]]
        copies.append(
            pa.table({col: pa.array(out[col], table.schema.field(col).type)
                      for col in cols})
        )
    merged = pa.concat_tables(copies)
    pq.write_table(merged, os.path.join(dst, f"{name}.parquet"))
    return merged.num_rows


def write_zipf_events(
    src_dir: str,
    out_path: str,
    s: float = 1.2,
    n_users: int = 10_000,
    factor: int = 1,
) -> dict:
    """Write a ZIPF-KEYED variant of ``events.parquet`` (VERDICT r9 item
    7): every row keeps its event fields but ``user_id`` is re-drawn
    from a Zipf(s) distribution over ``n_users`` ranks via inverse-CDF
    on a deterministic 64-bit mix of ``event_id`` — rank 1 owns
    ``1/H(n_users, s)`` of all rows (~18% at s=1.2, the planted hot key
    the skew guards exist for), the tail stays long. Same schema as the
    source, so every events query runs on it unchanged. Returns the
    realized hot-key share for the benchmark record."""
    import numpy as np

    table = pq.read_table(os.path.join(src_dir, "events.parquet"))
    if factor > 1:
        # replicate rows with offset event ids BEFORE the zipf draw — each
        # copy re-draws its user ranks, so the hot-key share is preserved
        # while the table grows (the regime knob for the join-skew arm)
        base = np.asarray(table.column("event_id").to_pylist(), dtype=np.int64)
        copies = []
        for c in range(factor):
            cols = {col: table.column(col) for col in table.column_names}
            cols["event_id"] = pa.array(base + c * STRIDE, pa.int64())
            copies.append(pa.table(cols))
        table = pa.concat_tables(copies)
    eids = np.asarray(table.column("event_id").to_pylist(), dtype=np.uint64)
    # splitmix64 finalizer → uniform in [0, 1)
    h = eids * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    weights = 1.0 / np.arange(1, n_users + 1, dtype=np.float64) ** s
    cdf = np.cumsum(weights) / weights.sum()
    # numpy's pairwise-summed weights.sum() can differ in the last ulp
    # from the sequential cumsum's final element, leaving cdf[-1]
    # fractionally below the max possible u — which would emit rank
    # n_users+1. Pin the last edge to exactly 1.
    cdf[-1] = 1.0
    ranks = np.searchsorted(cdf, u, side="right") + 1  # 1..n_users
    uid_type = table.schema.field("user_id").type
    cols = {c: table.column(c) for c in table.column_names}
    cols["user_id"] = pa.array(ranks.astype(np.int64), uid_type)
    pq.write_table(pa.table(cols), out_path)
    hot_share = float((ranks == 1).mean())
    return {"rows": len(ranks), "hot_share": round(hot_share, 4), "s": s}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--zipf-events":
        src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1/events_zipf.parquet"
        s = float(sys.argv[4]) if len(sys.argv) > 4 else 1.2
        factor = int(sys.argv[5]) if len(sys.argv) > 5 else 1
        info = write_zipf_events(src, out, s, factor=factor)
        print(f"wrote {out}: {info}")
        return
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for t in DIMS + list(KEY_COLS):
        n = _scale_table(t, src, dst, factor)
        print(f"{t}: {n} rows")
    print(f"wrote {dst} (factor {factor} of {src})")


if __name__ == "__main__":
    main()
