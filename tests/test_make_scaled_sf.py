"""tools/make_scaled_sf.py invariants (VERDICT r8 item 3 harness): the
scale-point dataset must preserve per-copy structure exactly — or the
10x measurement measures a data artifact, not the engine."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"
TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools", "make_scaled_sf.py")


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfx"))
    subprocess.run([sys.executable, TOOL, SRC, dst, "3"], check=True,
                   capture_output=True)
    return dst


def test_row_counts_and_key_disjointness(scaled):
    con = duckdb.connect()
    for t, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
                   ("documents", "doc_id"), ("events", "event_id")]:
        n_src = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_dst, n_keys = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {key}) "
            f"FROM read_parquet('{scaled}/{t}.parquet')"
        ).fetchone()
        assert n_dst == 3 * n_src
        if t != "lineitem":  # lineitem's orderkey is legitimately repeated
            assert n_keys == n_dst  # stride keeps copies' key spaces disjoint
    # dims are NOT scaled
    assert con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{scaled}/nation.parquet')"
    ).fetchone()[0] == 25


def test_referential_integrity_per_copy(scaled):
    con = duckdb.connect()
    orphans = con.execute(f"""
        SELECT COUNT(*) FROM read_parquet('{scaled}/lineitem.parquet') l
        LEFT JOIN read_parquet('{scaled}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
    """).fetchone()[0]
    assert orphans == 0


def test_document_permutation_preserves_quality_features(scaled):
    """Token permutation must keep length, token multiset (so token,
    stopword, punctuation and digit counts are identical) while breaking
    verbatim cross-copy identity — quality scores stay bit-identical,
    dedup selectivity scales linearly."""
    con = duckdb.connect()
    rows = con.execute(f"""
        WITH s AS (SELECT doc_id, text FROM read_parquet('{SRC}/documents.parquet')),
             d AS (SELECT doc_id % 10000000 AS doc_id, doc_id // 10000000 AS copy, text, n_chars
                   FROM read_parquet('{scaled}/documents.parquet'))
        SELECT d.copy,
               SUM(CASE WHEN d.n_chars <> length(d.text) THEN 1 ELSE 0 END) AS bad_nchars,
               SUM(CASE WHEN list_sort(string_split(d.text, ' '))
                         <> list_sort(string_split_regex(s.text, '[ \t\n\x0b\f\r]+'))
                    THEN 1 ELSE 0 END) AS bad_multiset,
               SUM(CASE WHEN d.copy > 0 AND d.text = s.text THEN 1 ELSE 0 END) AS verbatim
        FROM d JOIN s USING (doc_id) GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert len(rows) == 3
    for copy, bad_nchars, bad_multiset, verbatim in rows:
        assert bad_nchars == 0
        assert bad_multiset == 0
        if copy > 0:  # a permutation can fix a <=1-token doc; near-zero, not mass-verbatim
            n = duckdb.connect().execute(
                f"SELECT COUNT(*) FROM read_parquet('{SRC}/documents.parquet')"
            ).fetchone()[0]
            assert verbatim < n * 0.05


def test_embedding_shift_preserves_norms(scaled):
    con = duckdb.connect()
    bad = con.execute(f"""
        WITH s AS (SELECT vec_id, list_sum(list_transform(embedding, x -> x*x)) AS n2
                   FROM read_parquet('{SRC}/embeddings.parquet')),
             d AS (SELECT vec_id % 10000000 AS vec_id,
                          list_sum(list_transform(embedding, x -> x*x)) AS n2
                   FROM read_parquet('{scaled}/embeddings.parquet'))
        SELECT COUNT(*) FROM d JOIN s USING (vec_id)
        WHERE abs(d.n2 - s.n2) > 1e-3
    """).fetchone()[0]
    assert bad == 0


def test_zipf_events_deterministic_hot_share_and_schema(tmp_path):
    """--zipf-events (VERDICT r9 item 7): the zipf re-key is
    deterministic (same bytes twice), preserves the events schema and
    every non-key column, and plants the advertised hot key — rank 1
    owns ~1/H(n_users, s) of all rows."""
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(TOOL))
    from make_scaled_sf import write_zipf_events

    out1 = str(tmp_path / "z1.parquet")
    out2 = str(tmp_path / "z2.parquet")
    info1 = write_zipf_events(SRC, out1, s=1.2)
    info2 = write_zipf_events(SRC, out2, s=1.2)
    assert info1 == info2
    b1, b2 = open(out1, "rb").read(), open(out2, "rb").read()
    assert b1 == b2, "zipf re-key must be bit-deterministic"

    src_t = pq.read_table(os.path.join(SRC, "events.parquet"))
    z = pq.read_table(out1)
    assert z.schema.equals(src_t.schema)
    assert z.num_rows == src_t.num_rows
    for col in ("event_id", "ts", "event_type", "value", "props"):
        assert z.column(col).equals(src_t.column(col)), col

    uids = z.column("user_id").to_pylist()
    hot = sum(1 for u in uids if u == 1) / len(uids)
    # 1/H(10000, 1.2) ~ 0.179; wide tolerance for a small-SF sample
    assert 0.1 < hot < 0.35, hot
    assert min(uids) >= 1 and max(uids) <= 10_000

    # factor replication: rows scale, hot share preserved
    out3 = str(tmp_path / "z3.parquet")
    info3 = write_zipf_events(SRC, out3, s=1.2, factor=3)
    assert info3["rows"] == 3 * info1["rows"]
    assert abs(info3["hot_share"] - info1["hot_share"]) < 0.05


def test_zipf_rank_never_exceeds_n_users_at_cdf_edge():
    """ADVICE r10: numpy's pairwise weights.sum() can land a hair above
    the sequential cumsum's last element, leaving cdf[-1] < max u and
    emitting rank n_users+1. The edge is pinned to exactly 1.0 — a
    uniform draw of u == (2^53-1)/2^53 (the maximum the splitmix64 path
    can produce) must still map inside 1..n_users."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(TOOL))

    # replicate write_zipf_events' cdf construction for a size where
    # pairwise vs sequential summation demonstrably differ
    for n_users, s in [(10_000, 1.2), (100_000, 1.05)]:
        weights = 1.0 / np.arange(1, n_users + 1, dtype=np.float64) ** s
        cdf = np.cumsum(weights) / weights.sum()
        cdf[-1] = 1.0
        u_max = np.float64((1 << 53) - 1) / float(1 << 53)
        rank = int(np.searchsorted(cdf, u_max, side="right")) + 1
        assert rank <= n_users
