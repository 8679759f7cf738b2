"""Count-min sketch: the mergeable frequency sketch (Cormode &
Muthukrishnan, J. Algorithms 2005) completing the sketch tier next to
the HLL distinct-count and theta set-algebra rollups.

At 100 TB the pattern is the same as the HLL tier's: daily jobs
materialize a tiny ``depth × width`` counter grid per partition key;
any later window's term-frequency question is answered by summing
sketches cell-wise (*mergeability is exact* — the grid is a linear
projection of the data) and taking the per-term column minimum, instead
of rescanning raw tokens. Guarantees: ``estimate ≥ true`` always (a
deterministic invariant — counters only over-count, never under-count),
and ``estimate ≤ true + εN`` with probability ``1 − e^{−depth}`` where
``ε = e / width`` and ``N`` is the total item count.

All hashing is JVM-side ``xxhash64(seed, item)``; the build is one
explode + one partial-aggregated shuffle keyed on (seed, cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_build",
    "cms_token_cells_parquet",
    "cms_estimate",
    "cms_inner_product",
    "cms_merge",
    "qsketch_build",
    "qsketch_merge",
    "qsketch_quantiles",
    "exact_quantiles_two_pass",
    "exact_quantiles_by_group",
    "median_mad_two_pass",
    "median_mad_by_group",
    "with_qsketch_bucket",
    "QSKETCH_PREC",
    "QSKETCH_BRACKET_LIMIT",
]


def _cell(seed: Column, item: Column, width: int) -> Column:
    return F.pmod(F.xxhash64(seed, item), F.lit(width))


def cms_token_cells_parquet(
    sf_dir: str, depth: int = 4, width: int = 1024
) -> list[tuple[int, int, int]]:
    """Out-of-Spark twin of ``tokens_cms_sketch`` (r11, the dedup_twin
    move): recompute the CMS grid over the documents table's whitespace
    tokens with the bit-exact :mod:`xxh64` replica of Spark's
    ``pmod(xxhash64(seed, token), width)`` cell hash — so the rows-only
    sketch build becomes a full VALUES-literal hash differential.
    Returns sorted ``(seed, cell, cnt)`` rows, empty cells omitted."""
    import os
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from .xxh64 import xxh64_chain

    ws = re.compile(r"\s+", flags=re.ASCII)
    toks: Counter = Counter()
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    for text in t.column("text").to_pylist():
        for w in ws.split(text):
            if w:
                toks[w] += 1
    cells: Counter = Counter()
    for tok, c in toks.items():
        for s in range(depth):
            cells[(s, xxh64_chain([("int", s), ("str", tok)]) % width)] += c
    return sorted((s, cell, n) for (s, cell), n in cells.items())


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Sketch the multiset of ``item_col`` values into a ``depth × width``
    counter grid: rows ``(seed, cell, cnt)``, empty cells omitted (they
    read as 0). One explode over the seed family + one shuffle keyed on
    (seed, cell) — ≤ depth·width output rows no matter the input size.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    entries = df.select(F.col(item_col).alias("__item"), seeds).select(
        "seed", _cell(F.col("seed"), F.col("__item"), width).alias("cell")
    )
    return entries.groupBy("seed", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    out: str = "est",
) -> DataFrame:
    """Point frequency estimates for each probe item: the minimum of the
    item's ``depth`` counter cells. The probe frame is tiny (it names the
    terms you are asking about), so the join broadcasts it; a missing
    cell row reads as count 0."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    cells = probes.select(F.col(item_col), seeds).select(
        item_col,
        "seed",
        _cell(F.col("seed"), F.col(item_col), width).alias("cell"),
    )
    return (
        cells.join(sketch, ["seed", "cell"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out))
    )


def cms_inner_product(s1: DataFrame, s2: DataFrame, out: str = "est") -> DataFrame:
    """Join-size estimation from two sketches (Cormode & Muthukrishnan
    §4.2): for key-multisets A and B sketched with the same (depth,
    width), ``|A ⋈ B| = Σ_k f_A(k)·f_B(k)`` is estimated by the minimum
    over seeds of the per-seed cell-wise dot product. Guarantees mirror
    the point-estimate's: ``est ≥ true`` ALWAYS (collisions only add
    non-negative cross terms), and ``est ≤ true + (e/width)·N_A·N_B``
    with probability ``1 − e^{−depth}``.

    The inputs are grids (≤ depth·width rows each) however large the
    underlying tables were — the join below is sketch-sized, so asking
    "how big would this join be?" costs two linear scans and ~KBs of
    shuffle instead of executing the join. That is the 100 TB use: size
    a shuffle (pick partition counts, decide broadcast vs sort-merge)
    before paying for it.

    A seed whose grids share NO non-empty cell has a genuine dot
    product of 0 (disjoint key sets under that hash), so the min runs
    over the full seed domain with missing seeds read as 0 — an inner
    join alone would take the min over a subset (or return NULL for
    fully disjoint inputs). The seed domain is the union of seeds
    actually present, so when BOTH grids are empty (both underlying
    tables had zero rows) there are zero seed rows and ``min`` over
    them would be NULL — the final aggregate coalesces to 0, which is
    the exact answer for two empty multisets, keeping the
    ``est >= true`` contract NULL-free (ADVICE r6). Products and sums
    are DECIMAL(38,0): at the
    advertised scale two ~1e11-row sides at width 1024 give per-seed
    dots ~1e19 > 2^63, where BIGINT would wrap silently.

    Output type: ``out`` is DECIMAL(38,0).
    """
    a = s1.select("seed", "cell", F.col("cnt").cast("decimal(19,0)").alias("__c1"))
    b = s2.select("seed", "cell", F.col("cnt").cast("decimal(19,0)").alias("__c2"))
    dots = (
        a.join(b, ["seed", "cell"])
        .groupBy("seed")
        .agg(
            F.sum((F.col("__c1") * F.col("__c2")).cast("decimal(38,0)")).alias(
                "__dot"
            )
        )
    )
    seeds = (
        s1.select("seed").unionByName(s2.select("seed")).distinct()
    )
    full = seeds.join(dots, "seed", "left").select(
        F.coalesce(F.col("__dot"), F.lit(0).cast("decimal(38,0)")).alias("__dot")
    )
    return full.agg(
        F.coalesce(
            F.min("__dot"), F.lit(0).cast("decimal(38,0)")
        ).alias(out)
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with the same (depth, width) —
    exactly the sketch of the concatenated inputs (the grid is linear in
    the data), which is what makes per-day sketches roll up into any
    window for free."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "cell").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: HDR-histogram-style log-linear buckets
# (Tene's HdrHistogram; the same bucket family DDSketch/HdrHistogram use)
# over NON-NEGATIVE integers, with PURE-INTEGER bucket math — bit-length
# via bin(), shifts via integer ops — so the grid AND the quantile
# estimates are bit-identical on any engine (DuckDB replicates with
# length(bin(x)) and <<), unlike float log-bucketing whose boundaries
# drift in the last ulp.
# ---------------------------------------------------------------------------

#: sub-bucket precision bits: each power-of-two octave splits into
#: 2^QSKETCH_PREC linear sub-buckets, so any value's bucket brackets it
#: within relative error <= 2^-QSKETCH_PREC (6.25%); values below
#: 2^(QSKETCH_PREC+1) = 32 are bucketed EXACTLY (shift 0).
QSKETCH_PREC = 4


def _qbucket(x: Column) -> tuple[Column, Column]:
    """(value, shift) pre-bucket columns of a non-negative bigint value.

    ``shift = max(bitlength(x) - (PREC+1), 0)``; ``sub = x >> shift``.
    The bucket covers ``[sub << shift, ((sub+1) << shift) - 1]``. All
    integer: ``bitlength`` is ``length(bin(x))`` (no leading zeros in
    either engine) and the shift is ANSI ``div`` by ``shiftleft(1, shift)``.

    The non-negative contract is ENFORCED, not assumed: ``bin()`` of a
    negative bigint is 64 chars (two's complement) and ``div`` truncates
    toward zero, so a negative value would silently land in a bucket
    that does not contain it — and DuckDB's floor-division oracle would
    disagree. ``raise_error`` fails the job instead.
    """
    xl = F.when(
        x.cast("bigint") >= 0, x.cast("bigint")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("qsketch requires non-negative values, got "),
                x.cast("string"),
            )
        ).cast("bigint")
    )
    shift = F.greatest(
        F.length(F.bin(xl)) - F.lit(QSKETCH_PREC + 1), F.lit(0)
    ).cast("int")
    return xl, shift


def with_qsketch_bucket(
    df: DataFrame, value_col: str, shift_col: str = "shift", sub_col: str = "sub"
) -> DataFrame:
    """Append the (shift, sub) bucket-key columns for a non-negative
    integer column, dropping NULL values (they have no rank). Narrow —
    shared by the batch build and the streaming grid face (a streaming
    aggregation needs the bucket key NEXT TO the event-time column, not
    projected away)."""
    xl, shift = _qbucket(F.col(value_col))
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__qs_x", xl)
        .withColumn("__qs_shift", shift)
        .withColumn(shift_col, F.col("__qs_shift"))
        .withColumn(
            sub_col,
            F.expr("__qs_x div shiftleft(cast(1 as bigint), __qs_shift)")
            .cast("bigint"),
        )
        .drop("__qs_x", "__qs_shift")
    )


def qsketch_build(df: DataFrame, value_col: str) -> DataFrame:
    """Sketch a non-negative integer column into the (shift, sub, cnt)
    bucket grid. One narrow projection + one partial-aggregated shuffle on
    the bucket key; the grid is <= a few hundred rows no matter the input
    size (64 octaves x 16 sub-buckets caps it). NULLs are dropped (they
    have no rank). Mergeable: the grid is linear in the data, so
    cell-wise summing grids of disjoint inputs IS the grid of the union
    (``qsketch_merge``) — per-day sketches roll up into any window
    without rescanning, the 100 TB pattern shared with the CMS/HLL tiers.
    """
    b = with_qsketch_bucket(df, value_col).select("shift", "sub")
    return b.groupBy("shift", "sub").agg(F.count(F.lit(1)).alias("cnt"))


def qsketch_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of bucket grids — exactly the grid of the
    concatenated inputs (linearity, same contract as ``cms_merge``)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("shift", "sub").agg(F.sum("cnt").alias("cnt"))


def _qsketch_cum(sketch: DataFrame) -> DataFrame:
    """(__lo, __hi, cnt, __cum) per grid bucket — the cumulative walk
    shared by the bracket estimator and the two-pass exact selector. The
    window runs over the GRID (<= ~1k rows however large the data), so
    its SinglePartition sort is bounded by the sketch size."""
    from pyspark.sql import Window as W

    lo = F.expr("sub * shiftleft(cast(1 as bigint), shift)").cast("bigint")
    hi = F.expr(
        "(sub + 1) * shiftleft(cast(1 as bigint), shift) - 1"
    ).cast("bigint")
    w = W.orderBy("__lo").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        sketch.select(
            lo.alias("__lo"), hi.alias("__hi"), F.col("cnt").cast("bigint").alias("cnt")
        )
        .withColumn("__cum", F.sum("cnt").over(w))
    )


def _qsketch_ranks(cum: DataFrame, permille: list[int]) -> DataFrame:
    """(p, __rank, __n) — the integer rank per requested permille:
    ``(n*p + 999) div 1000``, never a float product (decimal-vs-double
    literal typing differs across engines at ceil boundaries)."""
    n = cum.agg(F.sum("cnt").alias("__n"))
    ps = F.explode(
        F.array(*[F.lit(int(p)).cast("bigint") for p in permille])
    ).alias("p")
    return n.select(ps, F.col("__n")).select(
        "p",
        F.expr("(__n * p + 999) div 1000").cast("bigint").alias("__rank"),
        "__n",
    )


QSKETCH_BRACKET_LIMIT = 1 << 22
"""Max distinct in-bracket values a two-pass selector resolves in one
window partition (VERDICT r7 item 7). A bucket is <= 2^-QSKETCH_PREC
relative width, so at any realistic skew the bracket holds a tiny
fraction of the distinct values; an adversarial distribution can still
concentrate arbitrarily many DISTINCT values inside one bucket, and the
resolution window would then sort them all in a single partition. The
documented escape (re-sketch the bracket rows at a finer offset, one
bounded pass per level) is deliberately NOT implemented — no realistic
distribution needs it — so the selectors fail LOUDLY at this limit
instead of silently shipping a degenerate single-partition sort. 2^22
rows of (key, value, count) sort comfortably within one task's memory."""


def _bracket_guard(per_val: DataFrame, keys: list[str], limit: int) -> DataFrame:
    """Fail-loud width check between pass 2's per-value aggregation and
    the resolution window: count distinct in-bracket values per bracket
    (a streamed partial aggregation — never materializes a partition,
    unlike a count-over-window, so the guard itself is safe on the very
    input it rejects), broadcast the per-bracket counts back, and raise
    through ``assert_true`` on the first over-limit row. The filter
    wrapper (``assert_true(...).isNull()`` — null on success) keeps the
    assertion referenced so column pruning cannot drop it."""
    cnt = per_val.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nvals"))
    return (
        per_val.join(F.broadcast(cnt), keys)
        .filter(
            F.assert_true(
                F.col("__nvals") <= F.lit(limit),
                F.concat(
                    F.lit(
                        "qsketch bracket holds more distinct values than "
                        f"the single-partition resolution limit ({limit}); "
                        "re-sketch the bracket at a finer offset "
                        "(recurse-into-bracket) for this distribution: "
                    ),
                    F.concat_ws(
                        ",", *[F.col(k).cast("string") for k in keys]
                    ),
                ),
            ).isNull()
        )
        .drop("__nvals")
    )


def exact_quantiles_two_pass(
    df: DataFrame, value_col: str, permille: list[int],
    bracket_limit: int = QSKETCH_BRACKET_LIMIT,
) -> DataFrame:
    """EXACT permille quantiles of a non-negative BIGINT column in two
    bounded passes — no global sort, the sketch-guided selection
    pattern (Munro-Paterson style: a summary narrows the candidate
    range, a second pass resolves it exactly).

    Pass 1 builds the mergeable HDR grid (one partial-aggregated
    shuffle); the rank's bracket AND the exact count of values below it
    both fall out of the grid's cumulative walk — ``c_below`` needs no
    rescan because the buckets partition the domain. Pass 2 touches
    ONLY rows inside the (p-specific) brackets — a broadcast range join
    against |permille| bracket rows — aggregates per distinct value,
    and picks the smallest value v with ``c_below + cum(v) >= rank``:
    the exact rank-th order statistic (1-based, duplicates counted).

    The per-p resolution window runs over distinct values within ONE
    bucket (relative width <= 2^-QSKETCH_PREC); for adversarial
    distributions where a single bucket still holds too many distinct
    values, the escape is recursion — re-sketch the bracket rows at a
    finer offset, one extra bounded pass per level, log_16 levels worst
    case. Not needed at any realistic skew (a bucket is 6.25% of its
    value's magnitude), so it is not implemented; instead a fail-loud
    guard (``bracket_limit``, VERDICT r7 item 7) raises before the
    resolution window would sort an over-wide bracket in one partition.

    Output: ``(p, n_rows, exact_value)`` — hash-identical to a full-sort
    oracle by construction (pure integer ranks and counts).
    """
    from pyspark.sql import Window as W

    from .cache import scoped_persist

    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("bigint").alias("__x")
    )
    cum = _qsketch_cum(qsketch_build(vals, "__x"))
    ranks = _qsketch_ranks(cum, permille)
    brackets = scoped_persist(
        cum.join(
            F.broadcast(ranks),
            (F.col("__cum") >= F.col("__rank"))
            & (F.col("__cum") - F.col("cnt") < F.col("__rank")),
        ).select(
            "p",
            "__rank",
            "__n",
            F.col("__lo"),
            F.col("__hi"),
            (F.col("__cum") - F.col("cnt")).alias("__c_below"),
        )
    )
    inside = vals.join(
        F.broadcast(brackets),
        (F.col("__x") >= F.col("__lo")) & (F.col("__x") <= F.col("__hi")),
    )
    per_val = inside.groupBy("p", "__rank", "__n", "__c_below", "__x").agg(
        F.count(F.lit(1)).alias("__k")
    )
    per_val = _bracket_guard(per_val, ["p"], bracket_limit)
    w = W.partitionBy("p").orderBy("__x").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    resolved = per_val.withColumn("__vcum", F.sum("__k").over(w)).filter(
        F.col("__c_below") + F.col("__vcum") >= F.col("__rank")
    )
    return (
        resolved.groupBy("p", "__n")
        .agg(F.min("__x").alias("exact_value"))
        .select("p", F.col("__n").alias("n_rows"), "exact_value")
    )


def median_mad_two_pass(
    vals: DataFrame, value_col: str,
    bracket_limit: int = QSKETCH_BRACKET_LIMIT,
) -> DataFrame:
    """Exact ``(n_rows, median, mad)`` of a non-negative BIGINT column in
    THREE bounded passes — the median/MAD core of robust outlier
    detection with the deviation grid ELIMINATED (VERDICT r7 item 3).

    The naive composition runs :func:`exact_quantiles_two_pass` twice:
    grid over x, resolve median, grid over the derived ``|x − median|``
    column (a second full scan + shuffle), resolve MAD — four passes.
    But the deviation distribution is fully described by the EXISTING
    x-grid walked outward from the median: a bucket ``[lo, hi]`` lying
    entirely inside ``[m−t, m+t]`` contributes all its rows to
    ``#{d ≤ t}`` (lower bound L(t)); any bucket merely intersecting it
    bounds from above (U(t)). Evaluating both at every candidate
    deviation ``t ∈ {|edge − m|}`` (grid-sized arithmetic, no data scan)
    yields a bracket: ``d_lo = max{t : U(t) < rank}`` (MAD > d_lo, since
    at most U(d_lo) < rank deviations are ≤ d_lo) and ``d_hi = min{t :
    L(t) ≥ rank}`` (MAD ≤ d_hi, since at least rank deviations are
    ≤ d_hi; d_hi exists — the widest candidate covers every bucket).

    Pass 3 then resolves the MAD in ONE conditional-aggregation scan of
    ``x ∈ [m−d_hi, m+d_hi]``: rows with ``d ≤ d_lo`` collapse into a
    single count group (they only offset the rank — exactly the
    ``c_below`` of the base selector, counted in-scan instead of from a
    second grid), rows in the ``(d_lo, d_hi]`` band group by exact
    deviation, and the cumulative walk picks the smallest band value
    crossing the rank. Rows outside the scan have ``d > d_hi`` and
    cannot affect ranks ≤ rank. Pure integer throughout — hash-identical
    to a full-sort oracle by construction.

    Pass ledger vs the naive form: grid(x) + resolve(median) +
    band-scan(MAD) = 3 scans of ``vals`` and ONE bucket-key shuffle,
    versus 4 scans and two shuffles. The band scan's groupBy state is
    bounded by the bracket's distinct deviations (U−L gaps come from
    ≤ 2 partially-covered buckets per side, each ≤ 2^-QSKETCH_PREC
    relative width) — same adversarial-distribution caveat as the base
    selector's bracket (a single degenerate bucket holding most mass
    widens the band to that bucket's width).

    ``vals`` should be persisted by the caller (it is scanned three
    times here plus typically once more by the consumer).
    """
    from pyspark.sql import Window as W

    x = vals.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("bigint").alias("__x")
    )
    # r12: the grid (and the 1-row med/band frames below) are
    # localCheckpoint'ed, not persisted — the grid subtree used to be
    # re-INLINED at every downstream reference (the final face's
    # formatted plan ran to ~3000 lines / 360 Exchange text nodes), and
    # the driver re-analyzed that tree on every run. Severing lineage at
    # the grid-sized frames (≤ ~1k rows) collapses the downstream plan
    # to small leaf scans; the checkpointed frames rebuild from the
    # caller-persisted ``vals`` in milliseconds.
    #
    # DURABILITY (r13, VERDICT r12 item 6): localCheckpoint blocks are
    # executor-local and NON-replicated — on a real cluster an executor
    # loss after the cut fails the query with no recompute path (the
    # lineage is gone by design), and the blocks bypass the scoped-cache
    # release lifecycle (freed by the ContextCleaner after GC). That is
    # the right trade HERE: the frames are grid-sized (≤ ~1k rows, KBs),
    # rebuild from the caller-persisted vals in milliseconds on a
    # retried QUERY, and the alternative — reliable checkpoint() — costs
    # a distributed-FS round trip per selector stage, or persist() costs
    # the giant-plan re-analysis this cut exists to remove. A cluster
    # deployment that cannot tolerate retry-the-query should swap these
    # for checkpoint() against HDFS/S3 (one-line change; the frames are
    # tiny, so the write is cheap — it is the sync latency per stage
    # that local mode has no reason to pay).
    cum = _qsketch_cum(qsketch_build(x, "__x")).localCheckpoint(eager=True)

    # -- pass 1+2: exact median from the grid (inlined two-pass selector,
    # reusing the persisted cum grid for both the rank and the bracket)
    ranks = _qsketch_ranks(cum, [500])
    m_brackets = cum.join(
        F.broadcast(ranks),
        (F.col("__cum") >= F.col("__rank"))
        & (F.col("__cum") - F.col("cnt") < F.col("__rank")),
    ).select(
        "__rank",
        "__n",
        "__lo",
        "__hi",
        (F.col("__cum") - F.col("cnt")).alias("__c_below"),
    )
    m_inside = x.join(
        F.broadcast(m_brackets),
        (F.col("__x") >= F.col("__lo")) & (F.col("__x") <= F.col("__hi")),
    )
    m_per_val = m_inside.groupBy("__rank", "__n", "__c_below", "__x").agg(
        F.count(F.lit(1)).alias("__k")
    )
    m_per_val = _bracket_guard(m_per_val, ["__rank"], bracket_limit)
    mw = W.orderBy("__x").rowsBetween(W.unboundedPreceding, W.currentRow)
    med = (
        m_per_val.withColumn("__vcum", F.sum("__k").over(mw))
        .filter(F.col("__c_below") + F.col("__vcum") >= F.col("__rank"))
        .groupBy("__rank", "__n")
        .agg(F.min("__x").alias("__m"))
        .localCheckpoint(eager=True)
    )  # 1 row: (__rank, __n, __m) — same rank applies to the MAD (same n)

    # -- grid-only bracket derivation for the MAD (NO data scan): a
    # bucket [lo, hi] is FULLY inside [m−t, m+t] iff t ≥ r :=
    # max(hi−m, m−lo) (full-cover radius) and OVERLAPS it iff t ≥ s :=
    # max(m−hi, lo−m, 0) (overlap radius), so L(t) = Σ cnt[r ≤ t] and
    # U(t) = Σ cnt[s ≤ t] are cumulative sums over the radius-sorted
    # grid. d_hi = the smallest full-cover radius whose L crosses the
    # rank; d_lo = the largest overlap radius with U still below it
    # (U(d_lo) < rank ⇒ #{d ≤ d_lo} < rank — any such d_lo yields the
    # identical MAD; it only sets how many band rows collapse into the
    # −1 sentinel). r13: this replaces the candidate-explode +
    # grid-self-join L/U evaluation — two bounded window walks and one
    # aggregation instead of a distinct, a theta-join and two
    # aggregations (the block measured ~0.5 s of pure stage latency per
    # warm run on the grouped face; same shape here). The single-row
    # band is not checkpointed: its one consumer is the band scan's
    # broadcast join and its lineage bottoms out at the cum/med leaves.
    gm = cum.join(F.broadcast(med))
    radii = gm.select(
        "__rank",
        F.col("cnt"),
        F.greatest(
            F.col("__hi") - F.col("__m"), F.col("__m") - F.col("__lo")
        ).alias("__r"),
        F.greatest(
            F.col("__m") - F.col("__hi"),
            F.col("__lo") - F.col("__m"),
            F.lit(0).cast("bigint"),
        ).alias("__s"),
    )
    wl = W.orderBy("__r").rangeBetween(W.unboundedPreceding, W.currentRow)
    wu = W.orderBy("__s").rangeBetween(W.unboundedPreceding, W.currentRow)
    both = radii.withColumn("__L", F.sum("cnt").over(wl)).withColumn(
        "__U", F.sum("cnt").over(wu)
    )
    band = (
        both.agg(
            F.min(F.when(F.col("__L") >= F.col("__rank"), F.col("__r"))).alias(
                "__dhi"
            ),
            F.coalesce(
                F.max(F.when(F.col("__U") < F.col("__rank"), F.col("__s"))),
                F.lit(-1).cast("bigint"),
            ).alias("__dlo"),
        )
        .join(F.broadcast(med))
    )  # 1 row: (__dhi, __dlo, __rank, __n, __m)

    # -- pass 3: one conditional-aggregation scan resolves the MAD
    scan = x.join(F.broadcast(band)).filter(
        (F.col("__x") >= F.col("__m") - F.col("__dhi"))
        & (F.col("__x") <= F.col("__m") + F.col("__dhi"))
    )
    per_d = scan.select(
        "__rank",
        F.when(
            F.abs(F.col("__x") - F.col("__m")) <= F.col("__dlo"), F.lit(-1)
        )
        .otherwise(F.abs(F.col("__x") - F.col("__m")))
        .cast("bigint")
        .alias("__d"),
    ).groupBy("__rank", "__d").agg(F.count(F.lit(1)).alias("__k"))
    per_d = _bracket_guard(per_d, ["__rank"], bracket_limit)
    dw = W.orderBy("__d").rowsBetween(W.unboundedPreceding, W.currentRow)
    mad = (
        per_d.withColumn("__dc", F.sum("__k").over(dw))
        .filter(F.col("__dc") >= F.col("__rank"))
        .agg(F.min("__d").alias("mad"))
    )  # the -1 (c_below) group cannot cross the rank: #{d ≤ d_lo} < rank
    return (
        med.join(F.broadcast(mad))
        .select(
            F.col("__n").alias("n_rows"),
            F.col("__m").alias("median"),
            F.col("mad"),
        )
    )


def _grouped_cum(vals: DataFrame) -> DataFrame:
    """Per-group cumulative grid ``(__g, __lo, __hi, cnt, __cum)`` of a
    ``(__g, __x)`` frame — the grouped analog of :func:`_qsketch_cum`.
    One partial-aggregated shuffle on (group, bucket); the cumulative
    window partitions by the group, so each partition is ONE group's
    grid (≤ ~1k rows regardless of data)."""
    from pyspark.sql import Window as W

    grid = (
        with_qsketch_bucket(vals, "__x")
        .groupBy("__g", "shift", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lo = F.expr("sub * shiftleft(cast(1 as bigint), shift)").cast("bigint")
    hi = F.expr(
        "(sub + 1) * shiftleft(cast(1 as bigint), shift) - 1"
    ).cast("bigint")
    w = (
        W.partitionBy("__g")
        .orderBy("__lo")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.select(
        "__g", lo.alias("__lo"), hi.alias("__hi"),
        F.col("cnt").cast("bigint").alias("cnt"),
    ).withColumn("__cum", F.sum("cnt").over(w))


def _grouped_brackets(cum: DataFrame, permille: list[int]) -> DataFrame:
    """Per-(group, p) bracket rows ``(__g, p, __rank, __n, __lo, __hi,
    __c_below)`` from a grouped cumulative grid. Group-grid-sized
    (groups × |permille| rows); checkpointed so the pass-2 join and the
    resolution window don't re-inline (and the driver doesn't
    re-analyze) the grid + cumulative-window subtree — see
    :func:`median_mad_two_pass` on the lineage-cut convention and its
    durability caveat."""
    ps = F.explode(
        F.array(*[F.lit(int(p)).cast("bigint") for p in permille])
    ).alias("p")
    ranks = (
        cum.groupBy("__g")
        .agg(F.sum("cnt").alias("__n"))
        .select("__g", ps, "__n")
        .select(
            "__g",
            "p",
            F.expr("(__n * p + 999) div 1000").cast("bigint").alias("__rank"),
            "__n",
        )
    )
    return (
        cum.join(ranks, "__g").filter(
            (F.col("__cum") >= F.col("__rank"))
            & (F.col("__cum") - F.col("cnt") < F.col("__rank"))
        ).select(
            "__g", "p", "__rank", "__n", "__lo", "__hi",
            (F.col("__cum") - F.col("cnt")).alias("__c_below"),
        )
        .localCheckpoint(eager=True)
    )


def _grouped_resolve(
    vals: DataFrame, brackets: DataFrame, bracket_limit: int
) -> DataFrame:
    """Pass-2 exact resolution of a grouped selector: equi-join the
    ``(__g, __x)`` rows to their group's brackets (bracket range as the
    residual), aggregate per distinct in-bracket value, and pick the
    smallest value whose cumulative count crosses the rank. Returns
    ``(__g, p, __n, exact_value)``."""
    from pyspark.sql import Window as W

    inside = vals.join(brackets, "__g").filter(
        (F.col("__x") >= F.col("__lo")) & (F.col("__x") <= F.col("__hi"))
    )
    per_val = inside.groupBy(
        "__g", "p", "__rank", "__n", "__c_below", "__x"
    ).agg(F.count(F.lit(1)).alias("__k"))
    per_val = _bracket_guard(per_val, ["__g", "p"], bracket_limit)
    w2 = (
        W.partitionBy("__g", "p")
        .orderBy("__x")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    resolved = per_val.withColumn("__vcum", F.sum("__k").over(w2)).filter(
        F.col("__c_below") + F.col("__vcum") >= F.col("__rank")
    )
    return resolved.groupBy("__g", "p", "__n").agg(
        F.min("__x").alias("exact_value")
    )


def median_mad_by_group(
    df: DataFrame, group_col: str, value_col: str,
    bracket_limit: int = QSKETCH_BRACKET_LIMIT,
) -> DataFrame:
    """Per-GROUP exact ``(n_rows, median, mad)`` — the grouped port of
    :func:`median_mad_two_pass`, including its grid-only MAD-bracket
    derivation (r13, VERDICT r12 item 3): the deviation distribution of
    each group is bracketed from that group's EXISTING x-grid walked
    outward from its median (L/U cover bounds over bucket edges — pure
    grid arithmetic, no data scan), and the MAD resolves in ONE
    conditional-aggregation band scan keyed by the group. The former
    composition re-sketched ``|x − median|`` per group — a second full
    scan AND a second (group, bucket) partial-agg shuffle of the
    deviation column, both now gone. Every stage is keyed by the group;
    zero global sorts; state bounded by groups × grid (the L/U join is
    per-group grid × candidate-edges, ≤ grid² rows per group).

    Output: ``(group_col, n_rows, median, mad)`` — bit-identical to the
    full-sort oracle (same integer rank convention per group).
    """
    from .cache import scoped_persist

    vals = scoped_persist(
        df.filter(F.col(value_col).isNotNull()).select(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("bigint").alias("__x"),
        )
    )
    # checkpointed once: referenced by the median brackets AND the MAD
    # band derivation (groups × grid rows)
    cum = _grouped_cum(vals).localCheckpoint(eager=True)
    med = (
        _grouped_resolve(vals, _grouped_brackets(cum, [500]), bracket_limit)
        .select(
            "__g",
            "__n",
            F.col("exact_value").alias("__m"),
            F.expr("(__n * 500 + 999) div 1000").cast("bigint").alias("__rank"),
        )
        .localCheckpoint(eager=True)  # group-sized; cuts the selector subtree
    )

    # -- grid-only bracket derivation for the per-group MAD (NO data
    # scan): a bucket [lo, hi] is FULLY inside [m−t, m+t] iff
    # t ≥ r := max(hi−m, m−lo) (its full-cover radius) and OVERLAPS it
    # iff t ≥ s := max(m−hi, lo−m, 0) (its overlap radius), so
    # L(t) = Σ cnt[r ≤ t] and U(t) = Σ cnt[s ≤ t] are per-group
    # cumulative sums over the radius-sorted grid. d_hi = the smallest
    # full-cover radius whose L crosses the rank (every candidate edge
    # deviation where L can first cross IS some bucket's r); d_lo = the
    # largest overlap radius with U still below the rank (U(d_lo) < rank
    # ⇒ #{d ≤ d_lo} < rank — any such d_lo yields the identical MAD,
    # it only sets how many band rows collapse into the −1 sentinel).
    # One exchange + two bounded window walks + one reused-partitioning
    # aggregation — no self-join of the grid, no candidate explode.
    from pyspark.sql import Window as W

    gm = cum.join(med, "__g")
    radii = gm.select(
        "__g",
        "__rank",
        F.col("cnt"),
        F.greatest(
            F.col("__hi") - F.col("__m"), F.col("__m") - F.col("__lo")
        ).alias("__r"),
        F.greatest(
            F.col("__m") - F.col("__hi"),
            F.col("__lo") - F.col("__m"),
            F.lit(0).cast("bigint"),
        ).alias("__s"),
    )
    wl = W.partitionBy("__g").orderBy("__r").rangeBetween(
        W.unboundedPreceding, W.currentRow
    )
    wu = W.partitionBy("__g").orderBy("__s").rangeBetween(
        W.unboundedPreceding, W.currentRow
    )
    both = radii.withColumn("__L", F.sum("cnt").over(wl)).withColumn(
        "__U", F.sum("cnt").over(wu)
    )
    # one row per group: (__g, __dhi, __dlo, __n, __m, __rank). NOT
    # checkpointed: its only consumer is the band scan's broadcast join,
    # and its lineage already bottoms out at the cum/med checkpoint
    # leaves — an eager cut here would cost one more driver-synchronous
    # job per run for no plan-size benefit.
    band = (
        both.groupBy("__g", "__rank")
        .agg(
            F.min(
                F.when(F.col("__L") >= F.col("__rank"), F.col("__r"))
            ).alias("__dhi"),
            F.coalesce(
                F.max(F.when(F.col("__U") < F.col("__rank"), F.col("__s"))),
                F.lit(-1).cast("bigint"),
            ).alias("__dlo"),
        )
        .drop("__rank")
        .join(med, "__g")
    )

    # -- pass 3: one conditional-aggregation band scan resolves every
    # group's MAD (rows with d ≤ d_lo collapse into the group's -1
    # sentinel — the in-scan c_below; the -1 group cannot cross the
    # rank since #{d ≤ d_lo} ≤ U(d_lo) < rank)
    scan = vals.join(F.broadcast(band), "__g").filter(
        (F.col("__x") >= F.col("__m") - F.col("__dhi"))
        & (F.col("__x") <= F.col("__m") + F.col("__dhi"))
    )
    per_d = scan.select(
        "__g",
        "__rank",
        F.when(
            F.abs(F.col("__x") - F.col("__m")) <= F.col("__dlo"), F.lit(-1)
        )
        .otherwise(F.abs(F.col("__x") - F.col("__m")))
        .cast("bigint")
        .alias("__d"),
    ).groupBy("__g", "__rank", "__d").agg(F.count(F.lit(1)).alias("__k"))
    per_d = _bracket_guard(per_d, ["__g"], bracket_limit)
    dw = (
        W.partitionBy("__g")
        .orderBy("__d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    mad = (
        per_d.withColumn("__dc", F.sum("__k").over(dw))
        .filter(F.col("__dc") >= F.col("__rank"))
        .groupBy("__g")
        .agg(F.min("__d").alias("__mad"))
    )
    return med.join(mad, "__g").select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n_rows"),
        F.col("__m").alias("median"),
        F.col("__mad").alias("mad"),
    )


def exact_quantiles_by_group(
    df: DataFrame, group_col: str, value_col: str, permille: list[int],
    bracket_limit: int = QSKETCH_BRACKET_LIMIT,
) -> DataFrame:
    """Per-GROUP exact permille quantiles — :func:`exact_quantiles_two_pass`
    with every stage keyed by the group: per-group HDR grids (one
    partial-aggregated shuffle on (group, bucket)), per-group cumulative
    walks (window partitioned by group — each partition is ONE group's
    grid, <= ~1k rows regardless of data), per-(group, p) brackets and
    c_below from the same walk, and a pass-2 equi-join on the group with
    the bracket range as residual — so the resolution is a hash join,
    never a broadcast of something group-cardinality-sized. This is the
    per-tenant / per-language percentile report at 100 TB: no global
    sort, no per-group sort of raw values, state bounded by
    groups × grid.

    Output: ``(group_col, p, n_rows, exact_value)`` — the exact rank-th
    order statistic within each group (same integer rank convention).
    Groups are whatever values appear; NULL values are dropped (no
    rank), NULL group keys group together as in any groupBy.
    """
    from .cache import scoped_persist

    vals = scoped_persist(
        df.filter(F.col(value_col).isNotNull()).select(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("bigint").alias("__x"),
        )
    )
    brackets = _grouped_brackets(_grouped_cum(vals), permille)
    return _grouped_resolve(vals, brackets, bracket_limit).select(
        F.col("__g").alias(group_col),
        "p",
        F.col("__n").alias("n_rows"),
        "exact_value",
    )


def qsketch_quantiles(sketch: DataFrame, permille: list[int]) -> DataFrame:
    """Quantile brackets from the bucket grid: for each requested
    quantile q = p/1000, the bucket containing the rank-``ceil(q*n)``
    element (ascending, 1-based) — emitted as ``(p, est_lo, est_hi)``
    with ``est_lo <= true_quantile <= est_hi`` a DETERMINISTIC invariant
    (the element at that rank lies inside its own bucket), and
    ``est_hi - est_lo < est_lo / 2^PREC`` by construction.

    Rank is pure integer — ``(n*p + 999) div 1000`` — never a float
    ``q*n`` product, whose decimal-vs-double literal typing differs
    across engines. The cumulative walk is a window over the GRID (<=
    ~1k rows however large the data), so its SinglePartition sort is
    bounded by the sketch size, not the data — the point of sketching.
    """
    cum = _qsketch_cum(sketch)
    ranks = _qsketch_ranks(cum, permille).drop("__n")
    # ranks is |permille| rows — broadcast it against the tiny grid; the
    # containing bucket is the unique one with cum-cnt < rank <= cum
    return (
        cum.join(
            F.broadcast(ranks),
            (F.col("__cum") >= F.col("__rank"))
            & (F.col("__cum") - F.col("cnt") < F.col("__rank")),
        )
        .select(
            F.col("p"),
            F.col("__lo").alias("est_lo"),
            F.col("__hi").alias("est_hi"),
        )
    )
