"""Measure the cross-engine stability margins behind the hash-checked
approximate queries (ADVICE r4 item 3; VERDICT r4 item 2).

Spark and DuckDB compute float expressions with different summation
orders, so the raw values can differ by ~1e-14 relative. A hash check
stays deterministic only if every DECISION taken on such a value —
threshold filters, 6-dp rounding, nearest-centroid assignment, probe
membership — sits farther from its boundary than that noise. This tool
measures those distances on the actual corpora so the margins are
verified numbers, not assumptions. Re-run whenever the embeddings table
is regenerated:

    python tools/measure_margins.py [sf_dir ...]

Checked margins (all must dwarf ~1e-13 abs summation noise; the IVF
assignment must also dwarf ~1e-9 formula noise — the pandas UDF expands
||x-c||^2 as ||c||^2 - 2x.c while the oracle folds (x-c)^2 termwise):

- dedup_embedding: min |cos - 0.35| over all LSH candidate pairs
  (threshold membership), and min distance of any surviving pair's
  cos*1e6 from a .5 rounding boundary (6-dp hash stability).
- ann_cosine_topk / _lsh / ann_ivf_probe_topk: min 6-dp rounding-
  boundary distance over the scored candidates.
- IVF (ann_ivf_probe_topk): min best-vs-2nd-best centroid distance gap
  (assignment stability) and the 4th-vs-5th nearest-centroid gap (probe
  set stability).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.similarity import (  # noqa: E402
    random_hyperplanes,
    train_ivf_centroids_parquet,
)

# noise floors the margins are compared against (double accumulation over
# 64 dims at O(1) magnitudes, and the IVF expanded-vs-folded formula gap)
SUM_NOISE = 1e-12
FORMULA_NOISE = 1e-8
ULP_NOISE = 1e-15  # bit-identical-class queries: same-order rational math


def _round_margin(x: np.ndarray, dp: int = 6) -> float:
    """Min distance of x*10^dp from a .5 rounding boundary (in units of
    10^-dp — multiply by 10^-dp for the absolute margin)."""
    if not len(x):
        return float("inf")
    f = np.abs(x * (10.0**dp) - np.floor(x * (10.0**dp)) - 0.5)
    return float(f.min())


def measure(sf_dir: str) -> list[tuple[str, float, float, bool]]:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vid = np.asarray(t.column("vec_id"))
    order = np.argsort(vid, kind="stable")
    X = np.stack(t.column("embedding").to_pylist()).astype("float64")[order]
    vid = vid[order]
    norms = np.linalg.norm(X, axis=1)
    out: list[tuple[str, float, float, bool]] = []

    def check(name: str, margin: float, floor: float) -> None:
        out.append((name, margin, floor, margin > 10 * floor))

    # --- dedup_embedding: candidate pairs from the 4x8-bit LSH tables ---
    H = np.asarray(random_hyperplanes(n_bits=32, dim=64, seed=42))
    bits = (X @ H.T) >= 0.0
    weights = 1 << np.arange(8, dtype="int64")
    pair_set: set[tuple[int, int]] = set()
    for tbl in range(4):
        buckets = bits[:, tbl * 8 : (tbl + 1) * 8] @ weights
        for b in np.unique(buckets):
            members = np.nonzero(buckets == b)[0]
            if len(members) < 2 or len(members) > 500:
                continue
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, c = int(members[i]), int(members[j])
                    pair_set.add((min(a, c), max(a, c)))
    ia = np.array([p[0] for p in pair_set])
    ib = np.array([p[1] for p in pair_set])
    cos = (X[ia] * X[ib]).sum(axis=1) / (norms[ia] * norms[ib])
    check("dedup_embedding |cos-0.35|", float(np.abs(cos - 0.35).min()), SUM_NOISE)
    kept = cos[cos >= 0.35]
    check(
        "dedup_embedding 6dp boundary (abs)",
        _round_margin(kept) * 1e-6,
        SUM_NOISE,
    )

    # --- query vector (vec_id 0) for the ANN faces ---
    q = X[np.nonzero(vid == 0)[0][0]]
    qn = np.linalg.norm(q)
    all_cos = (X @ q) / (norms * qn)
    check("ann_cosine_topk 6dp boundary (abs)", _round_margin(all_cos) * 1e-6, SUM_NOISE)

    # --- IVF: assignment, probe set, rounding (ann_ivf_probe_topk) ---
    C = np.asarray(
        train_ivf_centroids_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    )
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    ds = np.sort(d, axis=1)
    check("ivf assignment gap", float((ds[:, 1] - ds[:, 0]).min()), FORMULA_NOISE)
    cd = np.sort(((C - q[None, :]) ** 2).sum(axis=1))
    check("ivf probe boundary gap (4th vs 5th)", float(cd[4] - cd[3]), FORMULA_NOISE)
    probed = np.isin(d.argmin(axis=1), np.argsort(((C - q[None, :]) ** 2).sum(axis=1))[:4])
    check(
        "ann_ivf_probe_topk 6dp boundary (abs)",
        _round_margin(all_cos[probed]) * 1e-6,
        SUM_NOISE,
    )

    # --- dedup_semantic: within-cluster cosine vs the tau=0.35 threshold ---
    assign = d.argmin(axis=1)
    taus = []
    for j in range(len(C)):
        idx = np.nonzero(assign == j)[0]
        if len(idx) < 2:
            continue
        M = X[idx] / norms[idx][:, None]
        G = M @ M.T
        taus.append(G[np.triu_indices(len(idx), 1)])
    within = np.concatenate(taus) if taus else np.array([])
    if len(within):
        check("dedup_semantic |cos-0.35|", float(np.abs(within - 0.35).min()), SUM_NOISE)

    # --- text_bm25: 6-dp rounding boundary. This query is in the
    # bit-identical class (idf/avgdl are shared literals; the in-plan
    # arithmetic is rational, same op order, no folds over data-length
    # arrays, no transcendentals), so the floor is ulp-scale, not
    # summation-scale.
    import re as _re

    dt = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).column("text").to_pylist()
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.synthetic import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _bm25_shared,
    )

    idf, avgdl = _bm25_shared(sf_dir)
    scores = []
    for x in dt:
        toks = [w for w in _re.split("[ \t\n\x0b\f\r]+", x) if w]
        dl = float(len(toks))
        s = 0.0
        for term in _BM25_TERMS:
            tf = float(toks.count(term))
            s += (idf[term] * (tf * (_BM25_K1 + 1.0))) / (
                tf + _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * (dl / avgdl))
            )
        scores.append(s)
    check(
        "text_bm25 6dp boundary (abs, ulp-class)",
        _round_margin(np.array(scores)) * 1e-6,
        ULP_NOISE,
    )

    # --- PQ faces: per-subspace argmin gap (encode parity: the pandas
    # UDF expands ||x-c||², the oracle folds termwise — same class as
    # the IVF assignment gap), plus ADC / rerank 6-dp boundaries ---
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.similarity import (
        train_pq_codebooks_parquet,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.synthetic import (
        _PQ_KSUB,
        _PQ_M,
    )

    cb = train_pq_codebooks_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), m=_PQ_M, ksub=_PQ_KSUB, seed=42
    )
    dsub = X.shape[1] // _PQ_M
    gaps = []
    codes = np.empty((len(X), _PQ_M), dtype=int)
    for j in range(_PQ_M):
        Cj = np.asarray(cb[j])
        dj = ((X[:, j * dsub : (j + 1) * dsub][:, None, :] - Cj[None, :, :]) ** 2).sum(
            axis=2
        )
        s = np.sort(dj, axis=1)
        gaps.append(float((s[:, 1] - s[:, 0]).min()))
        codes[:, j] = dj.argmin(axis=1)
    check("pq per-subspace argmin gap", min(gaps), FORMULA_NOISE)
    lut = np.stack(
        [
            [((q[j * dsub : (j + 1) * dsub] - np.asarray(c)) ** 2).sum() for c in cb[j]]
            for j in range(_PQ_M)
        ]
    )
    adc = sum(lut[j][codes[:, j]] for j in range(_PQ_M))
    check("ann_pq adc 6dp boundary (abs)", _round_margin(adc) * 1e-6, ULP_NOISE)
    d2q = ((X - q[None, :]) ** 2).sum(axis=1)
    short = np.lexsort((vid, np.round(adc, 6)))[:100]
    check(
        "ann_pq rerank d2 6dp boundary (abs)",
        _round_margin(d2q[short]) * 1e-6,
        SUM_NOISE,
    )

    # --- docs_lm_perplexity: micro-quantized ln P(w2|w1) per distinct
    # bigram (one libm ln per value — ulp-class; the per-doc sums are
    # exact BIGINTs after quantization, so only this boundary matters) ---
    from collections import Counter as _Counter

    pair: _Counter = _Counter()
    uni: _Counter = _Counter()
    for x in dt:
        toks = [w for w in _re.split("[ \t\n\x0b\f\r]+", x) if w]
        for w1, w2 in zip(toks, toks[1:]):
            pair[(w1, w2)] += 1
            uni[w1] += 1
    lps = np.array(
        [np.log(n / uni[w1]) for (w1, _w2), n in pair.items() if n != uni[w1]]
    )
    # n == total gives ln(1) = 0 exactly on both engines — excluded (its
    # margin is the full 0.5)
    check(
        "docs_lm_perplexity micro boundary (abs, ulp-class)",
        _round_margin(lps) * 1e-6,
        ULP_NOISE,
    )

    # --- docs_weighted_sample: the A-ES key ln(u) * 1e6 / w rounds to a
    # BIGINT; one libm ln per row is the only engine-variant op, so the
    # floor is |key| * ulp (relative), checked at the worst |key| ---
    import hashlib as _hashlib

    dw = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    keys = []
    for doc_id, n_chars in zip(
        dw.column("doc_id").to_pylist(), dw.column("n_chars").to_pylist()
    ):
        if not n_chars or n_chars <= 0:
            continue
        bits = int(_hashlib.md5(f"aes1{doc_id}".encode()).hexdigest()[:13], 16)
        u = (float(bits) + 1.0) / float(1 << 52)
        keys.append(np.log(u) * 1e6 / float(n_chars))
    kv = np.array(keys)
    check(
        "docs_weighted_sample key_micro boundary (abs, ulp-class)",
        _round_margin(kv, 0),
        float(np.abs(kv).max()) * ULP_NOISE,
    )
    return out


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    bad = 0
    for sf_dir in dirs:
        print(f"== {sf_dir}")
        for name, margin, floor, ok in measure(sf_dir):
            flag = "OK " if ok else "THIN"
            bad += 0 if ok else 1
            print(f"  {flag} {name}: margin={margin:.3e} (floor {floor:.0e})")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
