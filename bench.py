"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "n_queries": 137, "requeued": [...], "sf": 0.1}

The per-query maps (``queries``, ``cold``, loads, spreads) are persisted
to ``BENCH_FULL.json`` next to this file — at 137 registered queries they
overflow the driver's stdout tail buffer (BENCH_r05/r06 ``parsed: null``),
so the stdout line carries only the scalars.

Protocol (BASELINE.md): per query, 2 warm-ups then median of N timed runs
(default 3; override BENCH_RUNS). Timing includes plan + execution; results
are consumed with a count-style action (no driver collect of full results —
we measure engine throughput, not toPandas serialization).

Cold vs warm (VERDICT r3 item 5): the FIRST execution of each query is
additionally recorded as its cold time — first-run numbers carry the
Janino/whole-stage-codegen JIT and driver-side analysis warmup, and on a
contended host they absorb most of the interference. ``queries`` in the
output stays the warm median (the BASELINE.md ledger protocol);
``cold``/``cold_total`` make contention-vs-regression machine-separable
without a judge re-measure session. The stdout line carries only the
scalars (long lines got clipped in round 1); the full per-query cold map
is in BENCH_FULL.json.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from analysis_of_flight_delay_data_by_mapreduce_spark.plans import synthetic
from analysis_of_flight_delay_data_by_mapreduce_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    # Host-contention evidence: sweeps on this box have measured a flat
    # ~1.5× multiplier from external load (r4 session, two discarded
    # ledger recordings). The PRE-start load1 is the clean signal (it
    # cannot include this process's own executors); load1_end
    # necessarily includes them and is only useful relative to other
    # runs' end values. The gate itself (wait_for_idle) holds the sweep
    # until the host is quiet.
    load1_start, load5_start, load1_wait = wait_for_idle(
        float(os.environ.get("BENCH_LOAD1_GATE", "2.0")),
        float(os.environ.get("BENCH_LOAD1_WAIT_MAX", "600")),
        float(os.environ.get("BENCH_LOAD5_GATE", "2.5")),
    )
    spark = get_spark("bench")

    warmups = int(os.environ.get("BENCH_WARMUPS", "2"))
    # Self-adjudication (VERDICT r4 item 5): when a query's timed samples
    # spread wider than SPREAD_LIMIT (external load arriving mid-measure —
    # a code regression is steady, contention is bursty), take one more
    # batch of timed runs and keep the batch with the lower median. The
    # per-query pre-load1 stamps plus the recorded spread/requeue list
    # make the adjudication reproducible from BENCH_FULL.json alone.
    spread_limit = float(os.environ.get("BENCH_SPREAD_LIMIT", "3.0"))
    # Third adjudication trigger (VERDICT r9 item 3): steady contention
    # passes both the spread check (flat load → spread ~1.7) and the
    # cold check (the cold run is contended too) — r9's
    # text_decontaminate recorded 23.5 s against a 0.62 s ledger row
    # without a single requeue. A warm median more than LEDGER_LIMIT×
    # its own BASELINE.md ledger row (same sf) is either a real
    # regression or contention; either way it gets one requeue batch
    # and, if the retry doesn't clear, a ``contaminated`` stamp for the
    # ledger/judge to adjudicate against the recorded loads.
    ledger_limit = float(os.environ.get("BENCH_LEDGER_LIMIT", "3.0"))
    ledger = load_ledger(sf)
    # VERDICT r8 item 8: the two rows that requeued in the r8 sweep get a
    # wider timed batch (5 samples) — their medians sit near the requeue
    # triggers' noise floor (q3_wordcount is an early-position shuffle-
    # heavy explode whose cold run rides the sweep's residual JVM warmup;
    # dedup_components' iterative closure is GC-phase sensitive), and a
    # 5-sample median absorbs one outlier sample without tripping
    # adjudication. Other rows keep the default (sweep cost is linear in
    # samples).
    extra_runs = {"q3_wordcount": 5, "dedup_components": 5}
    # Scale-point runs (VERDICT r8 item 3): BENCH_ONLY=q1_delay,tpch_q21,...
    # restricts the sweep to a named subset — used for the sf1 (10x)
    # headline measurements recorded in BASELINE.md, where running all
    # 159 queries would measure mostly sweep-context, not scaling.
    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    loads: dict[str, float] = {}
    spreads: dict[str, float] = {}
    requeued: list[str] = []
    requeue_medians: dict[str, dict] = {}

    def _timed_batch(fn, n_runs: int) -> list[float]:
        out = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            out.append(time.perf_counter() - t0)
        return out

    for name, fn in synthetic.QUERIES.items():
        if only and name not in only:
            continue
        loads[name] = round(os.getloadavg()[0], 2)
        n = 0
        samples = []
        n_timed = max(extra_runs.get(name, runs), runs)
        for i in range(n_timed + warmups):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            if i == 0:  # first-ever execution: JIT + analysis warmup
                cold[name] = round(dt, 4)
            if i >= warmups:  # drop warm-ups (codegen JIT needs 2 passes)
                samples.append(dt)
        spread = max(samples) / max(min(samples), 1e-9)
        # Second adjudication trigger (r5): a warm median EXCEEDING the
        # cold first run is physically impossible for honest timings —
        # cold additionally pays JIT/analysis — so it means load arrived
        # mid-measurement with too flat a profile to trip the spread
        # check (observed: flat ~3-4× multiplier, spread 2.5). The 1.2×
        # allowance absorbs normal jitter on sub-second queries.
        ledger_cap = (
            ledger[name] * ledger_limit if name in ledger else None
        )
        med = statistics.median(samples)
        if (
            spread > spread_limit
            or med > cold[name] * 1.2
            or (ledger_cap is not None and med > ledger_cap)
        ):
            requeued.append(name)
            retry = _timed_batch(fn, n_timed)
            samples, requeue_medians[name] = adjudicate_requeue(
                samples, retry, cold[name], spread_limit, ledger_cap
            )
            spread = max(samples) / max(min(samples), 1e-9)
        spreads[name] = round(spread, 2)
        timings[name] = round(statistics.median(samples), 4)
        print(
            f"# {name}: {timings[name]:.3f}s (cold {cold[name]:.3f}s, "
            f"spread {spreads[name]:.2f}, load1 {loads[name]:.2f}, n={n})",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "sum of per-query median wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold": cold,
        "cold_total": round(sum(cold.values()), 4),
        "load1_start": load1_start,
        "load5_start": load5_start,
        "load1_wait_sec": load1_wait,
        "load1_end": round(os.getloadavg()[0], 2),
        "load1_per_query": loads,
        "spread_per_query": spreads,
        "requeued": requeued,
        "requeue_medians": requeue_medians,
        "sf": sf,
    }
    # The round-1 artifact was clipped mid-line (79 queries make a long
    # stdout line), so persist the full JSON to a file as well; keep the
    # stdout line compact (no spaces) to fit tail buffers.
    # a BENCH_ONLY subset run must not clobber the full-sweep artifact
    # the driver (and the ledger tooling) reads
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    out_path = os.path.join(
        repo_dir, "BENCH_SUBSET.json" if only else "BENCH_FULL.json"
    )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    if not only:
        # VERDICT r12 item 1: BENCH_FULL.json is overwritten by every
        # sweep, so no per-query map survives a round boundary and the
        # driver's PERF diff came up empty (per_query: {}, null geomean).
        # Persist a ROUND- and CORE-COUNT-stamped copy as well
        # (BENCH_FULL_r{N}_c{cpus}.json, N = 1 + the newest driver-written
        # BENCH_r{N}.json) — committed each round, it lets the next
        # round's PERF compute real per-query medians, geomeans and
        # c8/c32 scaling ratios from the repo alone.
        with open(
            os.path.join(repo_dir, f"BENCH_FULL_{round_tag(repo_dir)}.json"), "w"
        ) as f:
            json.dump(payload, f, indent=1)
    print(json.dumps(slim_stdout_payload(payload), separators=(",", ":")))
    spark.stop()


def round_tag(repo_dir: str) -> str:
    """``r{N}_c{cpus}`` stamp for the persisted full-sweep artifact.

    ``N`` is one past the newest driver-written ``BENCH_r{N}.json`` (the
    driver commits that file at the END of round N, so a sweep running
    DURING round N+1 — ours or the driver's post-round one — sees max=N
    and stamps N+1). ``BENCH_ROUND`` overrides for tooling. The core
    count comes from the same env var the session master uses, so the
    driver's low-core scaling run lands in its own file instead of
    clobbering the 32-core map.
    """
    env = os.environ.get("BENCH_ROUND")
    if env:
        n = int(env)
    else:
        rounds = [0]
        for fn in os.listdir(repo_dir):
            m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
            if m:
                rounds.append(int(m.group(1)))
        n = max(rounds) + 1
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return f"r{n:02d}_c{cpus}"


def wait_for_idle(
    gate: float,
    wait_max: float,
    load5_gate: float | None = None,
    load_fn=None,
    sleep_fn=None,
) -> tuple[float, float, float]:
    """Block (bounded) until BOTH load1 < ``gate`` and load5 <
    ``load5_gate`` → ``(load1, load5, waited_sec)``. VERDICT r10 item 6
    introduced the load1 gate; r11's lesson (VERDICT r11 item 6 /
    NEXT.md) is that load1 decays minutes before load5 does — a sweep
    started ~2 min after a heavy job saw load1 1.74 but recorded 1.6-2.2×
    phantom rows that all idle-re-measured clean. Gating on load5 too
    holds the start until the recent-history average has actually
    drained. A still-contended start after ``wait_max`` proceeds anyway
    (the driver's sweep must not hang forever); the recorded loads make
    it visibly untrustworthy. ``load_fn`` returns ``(load1, load5)``;
    ``load_fn``/``sleep_fn`` exist for the unit test."""
    load_fn = load_fn or (lambda: os.getloadavg()[:2])
    sleep_fn = sleep_fn or time.sleep
    if load5_gate is None:
        load5_gate = 1.25 * gate
    l1, l5 = (round(x, 2) for x in load_fn())
    waited = 0.0
    while (l1 > gate or l5 > load5_gate) and waited < wait_max:
        sleep_fn(15.0)
        waited += 15.0
        l1, l5 = (round(x, 2) for x in load_fn())
    return l1, l5, waited


def load_ledger(sf: float) -> dict[str, float]:
    """Per-query warm medians from the BASELINE.md ledger block, filtered
    to the requested scale factor. Returns {} when no ledger exists or
    the block doesn't parse — the ledger trigger simply doesn't arm (a
    fresh checkout must still bench)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        return {}
    out: dict[str, float] = {}
    # ADVICE r10: BASELINE.md holds MULTIPLE ledger blocks (LEDGER for
    # sf0.1, SF1_LEDGER for the 10x scale point); a single non-greedy
    # search always matched the first block, so sf1 lookups returned {}
    # and the ledger trigger never armed during sf1 sweeps. Walk every
    # block — rows are filtered by the sf column anyway.
    for m in re.finditer(r"LEDGER:START.*?LEDGER:END", text, flags=re.S):
        for line in m.group(0).splitlines():
            parts = [p.strip() for p in line.strip().strip("|").split("|")]
            if len(parts) != 4 or parts[0] in ("query", "---", "**total**"):
                continue
            try:
                if float(parts[1]) == sf:
                    out[parts[0]] = float(parts[2])
            except ValueError:
                continue
    return out


def adjudicate_requeue(
    samples: list[float],
    retry: list[float],
    cold_s: float,
    spread_limit: float,
    ledger_cap: float | None = None,
) -> tuple[list[float], dict]:
    """Pick which timed batch a requeued query records.

    ADVICE r5 rule: keep the retry only when the TRIGGER CONDITION clears
    in it — blindly keeping the lower of two medians biases warm timings
    downward under ordinary jitter and can mask a genuine regression on a
    bimodal query.

    VERDICT r7 item 2 hardening: when the trigger fires in BOTH batches
    (never-clearing contention), neither sample is clean — the old rule
    kept "first" even when it was the WORSE of two known-contaminated
    measurements (r7 kept 33.9s over 18.8s on events_value_mad_outliers).
    Now keep the MIN of the two medians and self-label the row
    ``contaminated: true`` so the ledger/judge can discount it. This
    cannot mask a steady code regression: a regression inflates both
    medians equally and the min still shows it.

    VERDICT r9 item 3: when the LEDGER trigger fired (warm median >
    ``ledger_cap`` = 3× the query's BASELINE.md row), the retry only
    clears by also landing back under that cap — steady contention that
    keeps both batches above it stays flagged ``contaminated`` even
    with a clean spread, which is exactly the r9 text_decontaminate
    profile the old two-trigger design missed.
    """
    retry_spread = max(retry) / max(min(retry), 1e-9)
    first_med = statistics.median(samples)
    retry_med = statistics.median(retry)
    retry_clears = (
        retry_spread <= spread_limit
        and retry_med <= cold_s * 1.2
        and (ledger_cap is None or retry_med <= ledger_cap)
    )
    if retry_clears:
        kept, chosen, contaminated = "retry", retry, False
    elif retry_med < first_med:
        kept, chosen, contaminated = "retry", retry, True
    else:
        kept, chosen, contaminated = "first", samples, True
    record = {
        "first": round(first_med, 4),
        "retry": round(retry_med, 4),
        "kept": kept,
        "contaminated": contaminated,
    }
    if ledger_cap is not None:
        record["ledger_cap"] = round(ledger_cap, 4)
    return chosen, record


def slim_stdout_payload(payload: dict) -> dict:
    """The stdout JSON line: scalars + a CAPPED requeue preview only.

    Every PER-QUERY map stays in BENCH_FULL.json — at 137+ registered
    queries even the ``queries`` map alone overflows the driver's 2 kB
    stdout tail buffer (BENCH_r05/r06 recorded ``parsed: null``; the
    round-1 clipping regression recurring at registry scale). The
    ``requeued`` list itself is unbounded in a heavy-contention sweep
    (ADVICE r7), so stdout carries ``n_requeued`` plus the first 10 names;
    the full list stays in BENCH_FULL.json. The size contract is pinned by
    ``tests/test_driver_contract.py`` at the worst case (ALL queries
    requeued) so registry growth cannot silently re-break the driver's
    parse.
    """
    slim = {
        k: v
        for k, v in payload.items()
        if k
        not in (
            "queries",
            "cold",
            "load1_per_query",
            "spread_per_query",
            "requeue_medians",
            "requeued",
        )
    }
    slim["n_queries"] = len(payload.get("queries", {}))
    requeued = payload.get("requeued", [])
    slim["n_requeued"] = len(requeued)
    slim["requeued"] = requeued[:10]
    return slim


if __name__ == "__main__":
    main()
