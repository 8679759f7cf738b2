"""Text-analysis operators for training-data pipelines (extension tier).

All pure Catalyst column expressions over the ``documents`` table — per-row,
embarrassingly parallel, no shuffle at all (narrow transformations), no
Python UDFs. At 100 TB these run at scan speed with full whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import word_tokens

__all__ = [
    "token_count_ws",
    "token_count_bpe",
    "quality_features",
    "quality_score",
    "repetition_features",
    "language_id",
    "language_id_trigram",
    "tf_idf",
    "fingerprint",
    "chunk_documents",
    "scrub_pii",
    "bigram_lm_scores",
    "PII_PATTERNS",
]

#: BPE-ish pre-tokenizer: alphanumeric runs or single non-space symbols.
#: Kept to a regex dialect shared by Java (Spark) and RE2-ish engines so the
#: same pattern is usable in oracle SQL. Whitespace is the explicit Java
#: \s class (ADVICE r6): Java's \s has \x0b, RE2's does not — spelled
#: out, the two engines agree on every byte.
BPE_TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]"

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small and deterministic (this is a heuristic
#: operator, not a model); extend per deployment.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"),
}


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count (the classic wc -w)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(word_tokens(c)).cast("long")


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: alphanumeric runs + individual symbols — a
    cheap, deterministic proxy for LLM tokenizer counts."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), 0)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation /
    digit / stopword ratios. Columns appended, all double/long."""
    c = F.col(text_col)
    toks = word_tokens(c)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(c).cast("long")
    stop_lit = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, F.lower(t))))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?'\"()]", ""))
    n_digit = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return (
        df.withColumn("n_chars_f", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "mean_token_len",
            F.when(
                n_tok > 0,
                (n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "digit_ratio",
            F.when(n_chars > 0, n_digit.cast("double") / n_chars.cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double"))
            .otherwise(F.lit(0.0)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Scalar quality score in [0, 1]: length sweet spot + stopword presence
    − punctuation/digit noise. A heuristic filter knob (C4/Gopher-style
    rules), deterministic per row."""
    feats = quality_features(df, text_col)
    length_term = F.least(F.col("n_tokens").cast("double") / 64.0, F.lit(1.0))
    score = (
        0.4 * length_term
        + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(F.col("punct_ratio") * 10.0 + F.col("digit_ratio") * 5.0, F.lit(1.0)))
    )
    return feats.withColumn(out, F.round(score, 6))


def _sorted_run_stats(arr: Column) -> Column:
    """``struct(top, dup)`` over a SORTED array<string>: ``top`` is the
    longest run length (= the max multiplicity of any element) and
    ``dup`` counts elements that occur in runs of length >= 2, with
    multiplicity (= total occurrences of duplicated elements). One
    left-to-right fold; the lambda touches only the accumulator and the
    current element (cheap comparisons — the no-CSE-in-lambda trap only
    bites O(n) subexpressions). The "" sentinel is safe: tokenizers here
    never emit empty strings."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("top"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def step(acc: Column, t: Column) -> Column:
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            t.alias("prev"),
            run.alias("run"),
            F.greatest(acc["top"], run).alias("top"),
            (
                acc["dup"]
                + F.when(run == 2, F.lit(2).cast("bigint"))
                .when(run > 2, F.lit(1).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
            ).alias("dup"),
        )

    return F.aggregate(
        arr,
        init,
        step,
        lambda acc: F.struct(acc["top"].alias("top"), acc["dup"].alias("dup")),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1),
    adapted to word n-grams: the corpora here have no line/paragraph
    structure, and the fractions are OCCURRENCE-based, not
    character-based (documented deviation — integer-exact cross-engine,
    no float ratios). Appends, all BIGINT micro-units (1e6 = 100%):

    - ``n_tokens`` — whitespace token count;
    - ``top_tok_micro``  — occurrences of the most frequent token
      ``* 1e6 div n_tokens``;
    - ``dup_tok_micro``  — occurrences of tokens appearing >= 2 times
      ``* 1e6 div n_tokens``;
    - ``top_2gram_micro`` / ``dup_2gram_micro`` — the same over word
      2-grams (``n-1`` of them; 0 when fewer than 2 tokens).

    Per-row, zero shuffle: sort the token (and 2-gram) array, then one
    fold computes max-run and duplicated-occurrence counts — no
    explode/groupBy, runs at scan speed under whole-stage codegen.
    Division is Spark ``div`` / DuckDB ``//`` on non-negative operands
    (identical truncation)."""
    c = F.col(text_col)
    sep = F.lit("\x1f")
    df2 = (
        df.withColumn("__rep_toks", word_tokens(c))
        .withColumn("n_tokens", F.size("__rep_toks").cast("bigint"))
        .withColumn(
            "__rep_grams",
            F.when(
                F.col("n_tokens") >= 2,
                F.transform(
                    F.sequence(F.lit(1), (F.col("n_tokens") - 1).cast("int")),
                    lambda i: F.concat(
                        F.element_at("__rep_toks", i),
                        sep,
                        F.element_at("__rep_toks", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        .withColumn("__rep_ts", _sorted_run_stats(F.array_sort("__rep_toks")))
        .withColumn("__rep_gs", _sorted_run_stats(F.array_sort("__rep_grams")))
    )
    zero = "cast(0 as bigint)"
    return (
        df2.withColumn(
            "top_tok_micro",
            F.expr(
                "CASE WHEN n_tokens > 0 THEN (__rep_ts.top * cast(1000000 as"
                f" bigint)) div n_tokens ELSE {zero} END"
            ),
        )
        .withColumn(
            "dup_tok_micro",
            F.expr(
                "CASE WHEN n_tokens > 0 THEN (__rep_ts.dup * cast(1000000 as"
                f" bigint)) div n_tokens ELSE {zero} END"
            ),
        )
        .withColumn(
            "top_2gram_micro",
            F.expr(
                "CASE WHEN n_tokens > 1 THEN (__rep_gs.top * cast(1000000 as"
                f" bigint)) div (n_tokens - 1) ELSE {zero} END"
            ),
        )
        .withColumn(
            "dup_2gram_micro",
            F.expr(
                "CASE WHEN n_tokens > 1 THEN (__rep_gs.dup * cast(1000000 as"
                f" bigint)) div (n_tokens - 1) ELSE {zero} END"
            ),
        )
        .drop("__rep_toks", "__rep_grams", "__rep_ts", "__rep_gs")
    )


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-count language ID: the language whose stopword list matches
    the most tokens wins (ties broken by language code order; no match →
    'und'). One pass of array intersections per row, no shuffle."""
    c = F.col(text_col)
    toks = F.transform(word_tokens(c), lambda t: F.lower(t))
    best_lang, best_score = None, None
    for lang in sorted(LANG_STOPWORDS):
        lit = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(lit, t)))
        if best_lang is None:
            best_lang, best_score = F.lit(lang), score
        else:
            better = score > best_score
            best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(better, score).otherwise(best_score)
    pred = F.when(best_score > 0, best_lang).otherwise(F.lit("und"))
    return df.withColumn(out, pred)


#: Char-trigram profiles for the NB-style language scorer. Weights are
#: small positive ints (3 = near-unique to the language, 1 = common but
#: indicative): integer likelihood-ratio scores keep the argmax exactly
#: reproducible in plain SQL (no float log-probs to drift). For zh the
#: "trigrams" are single characters (char n-grams degenerate usefully for
#: unsegmented scripts). Curated from public function-word frequency lists.
LANG_TRIGRAMS: dict[str, dict[str, int]] = {
    "en": {"the": 3, " th": 2, "ing": 3, " of": 3, "nd ": 2, "ion": 2,
           "he ": 1, " an": 1, "to ": 1, " in": 1},
    "de": {"sch": 3, "ich": 3, "und": 3, "der": 3, "ung": 3, "ein": 2,
           "cht": 2, " ge": 2, "die": 2, "en ": 1},
    "es": {"ión": 3, "cio": 2, "que": 2, " qu": 2, "ado": 2, "los": 2,
           " la": 2, " de": 1, "ent": 1, "ar ": 1},
    "fr": {"une": 3, "eur": 2, "ait": 2, "ant": 2, " le": 2, "les": 2,
           " pa": 1, "ou ": 1, "es ": 1, "aux": 2},
    "zh": {"的": 3, "是": 3, "了": 3, "这": 3, "在": 2, "我": 2,
           "不": 2, "人": 2, "有": 2, "中": 2},
}


def tf_idf(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(document, term) TF-IDF over whitespace tokens.

    ``tfidf = tf · (ln((N+1)/(df+1)) + 1)`` — smoothed idf (the
    scikit-learn formulation). Three aggregations, all shuffle-partitioned
    on their natural keys: tf on (doc, term), document frequency on term,
    and the corpus size N as a 1-row aggregate cross-joined in (never a
    driver-side ``count()`` — the plan stays fully declarative, so the
    same code serves a 100 TB corpus where N must not round-trip through
    the driver). The idf arithmetic is one double op chain per row on
    int64 inputs — deterministic, no accumulation-order sensitivity.

    Output: ``id_col, term, tf, doc_freq, tfidf`` (rounded to 6 places).
    """
    tokens = df.select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term"))
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n_docs"))
    idf = F.log((F.col("__n_docs") + F.lit(1.0)) / (F.col("doc_freq") + F.lit(1.0))) + F.lit(1.0)
    return (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "doc_freq",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def _norm_for_trigrams(c: Column) -> Column:
    # lowercase, collapse whitespace, pad so boundary trigrams (" th")
    # match at the ends too
    return F.concat(F.lit(" "), F.regexp_replace(F.lower(c), r"\s+", " "), F.lit(" "))


def language_id_trigram(
    df: DataFrame, text_col: str = "text", out: str = "lang_pred"
) -> DataFrame:
    """Char-trigram profile language ID (NB-style likelihood-ratio scoring).

    score(lang) = Σ_t weight_t · count(t in text); counts come from the
    length-difference-after-replace identity, so the whole operator is
    closed-form Catalyst string expressions — per-row, no shuffle, no UDF,
    and bit-identical in ANSI SQL (the oracle uses the same identity).
    Non-overlapping counting (REPLACE semantics) is identical on both
    engines. Argmax ties break by language code order; max score ≤ 0 →
    'und'. Better than stopword matching on real text: no tokenizer
    dependency, morphology-sensitive, works for unsegmented scripts.
    """
    # Codegen-surface note: the naive form (50 unrolled count expressions,
    # each inlining the normalized-text regexp twice, chained through a
    # nested when-argmax) exceeds Janino's 64 KB method limit — Spark
    # logged InternalCompilerException and fell back to interpreted
    # execution every run. This form projects the normalized text ONCE,
    # folds each language's (trigram, weight) literal array with
    # ``aggregate`` (loop codegen, not unrolled), and takes the argmax as
    # ``greatest`` over (score, -index, lang) structs — struct comparison
    # is lexicographic, so ties break toward the earlier language code,
    # exactly the strict-> chain's behavior. Same integer math, compiles.
    langs = sorted(LANG_TRIGRAMS)
    pcol = F.col("__lidp")

    def lang_score(lang: str) -> Column:
        tris = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    F.lit(w).cast("long").alias("w"),
                    F.lit(len(t)).cast("long").alias("n"),
                )
                for t, w in LANG_TRIGRAMS[lang].items()
            ]
        )
        return F.aggregate(
            tris,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + x["w"]
            * (
                (F.length(pcol) - F.length(F.replace(pcol, x["t"], F.lit(""))))
                / x["n"]
            ).cast("long"),
        )

    best = F.greatest(
        *[
            F.struct(
                lang_score(lang).alias("s"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    pred = F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))
    return (
        df.withColumn("__lidp", _norm_for_trigrams(F.col(text_col)))
        .withColumn(out, pred)
        .drop("__lidp")
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Canonical document fingerprint: md5 of the lowercased,
    whitespace-collapsed text. Stable across engines (md5 is standard), the
    join key for cross-pipeline exact dedup."""
    c = F.col(text_col)
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping token windows (the RAG/pretraining
    chunker): chunk i covers tokens ``[i·stride, i·stride + window)``;
    every token belongs to ≥1 chunk, consecutive chunks overlap by
    ``window − stride`` tokens. Pure array expressions (sequence →
    transform → slice → explode) — narrow, scan-speed, no shuffle, no UDF;
    the explode is the only fan-out (rows ×~len/stride).

    Output: ``id_col, chunk_idx, chunk_text, n_chunk_tokens``.
    """
    toks = word_tokens(F.col(text_col))
    n = F.size(toks)
    last = F.greatest(
        F.ceil((n - F.lit(window)) / F.lit(stride)), F.lit(0)
    ).cast("int")
    chunk = F.explode(F.sequence(F.lit(0), last)).alias("chunk_idx")
    return (
        df.select(F.col(id_col), toks.alias("__toks"), chunk)
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, window),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, window)
            ).cast("long").alias("n_chunk_tokens"),
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int] | None = None,
    out: str = "split",
) -> DataFrame:
    """Deterministic dataset split by content-independent id hash.

    ``splits`` maps name → percent (must sum to 100). The bucket is
    ``int(md5(id)[:8], 16) % 100`` — stable across runs, engines, partition
    layouts, and insertion order, which is what makes train/val/test splits
    reproducible in a 100 TB pipeline (never ``rand()``: re-runs reshuffle
    rows between splits). Cheap narrow op, no shuffle.
    """
    splits = splits or {"train": 90, "val": 5, "test": 5}
    assert sum(splits.values()) == 100
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(out, expr)


#: PII redaction patterns, applied in order (email first so its digits
#: can't be half-eaten by the number rule; IP before phone for the same
#: reason). Dialect-portable: no lookarounds/backrefs, so the same strings
#: run under Java regex (Spark) and RE2 (DuckDB) — which is what lets the
#: scrub be oracle-checked. Replacement tokens are angle-bracket tags, the
#: common convention in pretraining-corpus scrubbing.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # phone requires at least one space/dash separator so a bare digit run
    # falls through to the number rule below
    ("phone", r"\+?\d{1,4}[\- ][\d\- ]{3,}\d", "<PHONE>"),
    ("number", r"\b\d{9,}\b", "<NUM>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", out: str = "scrubbed"
) -> DataFrame:
    """Redact PII-shaped spans (emails, IPv4s, phone-ish runs, long id
    numbers) and count each kind.

    A pretraining-corpus hygiene pass: pure narrow per-row regex work —
    scan speed, zero shuffle, Catalyst keeps it inside the scan's
    whole-stage-codegen span at any scale. Counts are taken BEFORE
    replacement (per kind, on the progressively-scrubbed text, matching
    the replacement order) so ``n_<kind>`` reports exactly what was
    redacted. Output: ``out`` (scrubbed text) + one ``n_<kind>`` column
    per pattern. NULL text stays NULL in ``out`` and counts 0 for every
    kind — nothing was redacted, which is what the counts report.
    """
    result = df
    prev = F.col(text_col)
    for kind, pat, tag in PII_PATTERNS:
        result = result.withColumn(
            f"n_{kind}",
            F.coalesce(
                F.size(F.regexp_extract_all(prev, F.lit(pat), F.lit(0))),
                F.lit(0),
            ).cast("long"),
        ).withColumn(f"__s_{kind}", F.regexp_replace(prev, pat, tag))
        prev = F.col(f"__s_{kind}")
    result = result.withColumn(out, prev)
    return result.drop(*[f"__s_{k}" for k, _, _ in PII_PATTERNS])


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    out: str = "bm25",
) -> DataFrame:
    """BM25 relevance of every document for a fixed query-term set, with
    the corpus statistics (per-term idf, average document length)
    supplied as precomputed constants.

    Okapi BM25 (Robertson/Spärck Jones):
    ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))``.

    Passing the statistics in (instead of aggregating in-plan) is the
    production posture at 100 TB — idf/avgdl come from the previous
    corpus snapshot or a separate stats pass — and makes scoring a pure
    narrow projection: scan-speed, no shuffle, no join. It also keeps
    the query engine-deterministic: the log lives in the driver-side idf
    computation, so no transcendental libm call (whose last ulp differs
    across engines) executes inside the query. Term counts re-reference
    the token split per term, but whole-stage codegen's subexpression
    elimination evaluates the split once per row (top-level Project —
    NOT the HOF-lambda no-CSE trap).
    """
    if not terms:
        raise ValueError("bm25_scores: terms must be non-empty")
    missing = [t for t in terms if t not in idf]
    if missing:
        raise ValueError(f"bm25_scores: terms missing from idf: {missing}")
    toks = word_tokens(F.col(text_col))
    dl = F.size(toks).cast("double")
    k1p1 = float(k1 + 1.0)
    one_minus_b = float(1.0 - b)
    score = None
    for t in terms:
        tf = F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double")
        num = F.lit(float(idf[t])) * (tf * F.lit(k1p1))
        den = tf + F.lit(float(k1)) * (
            F.lit(one_minus_b) + F.lit(float(b)) * (dl / F.lit(float(avgdl)))
        )
        s = num / den
        score = s if score is None else score + s
    return df.select(F.col(id_col), F.round(score, 6).alias(out))


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 10**6,
) -> DataFrame:
    """Per-document average negative log-likelihood under the corpus's
    own bigram LM — the perplexity-filter shape of CCNet (Wenzek et al.
    2020), where a cheap n-gram LM scores every document and the
    worst-perplexity tail is dropped or down-mixed before training.

    ``P(w2|w1) = n(w1,w2) / n(w1,·)`` from two aggregations on natural
    keys; each bigram's ``ln P`` is quantized to ``scale`` units (micro
    by default) BEFORE the per-doc sum — the round-then-sum move — so
    the document score is an exact BIGINT sum (order-free under any
    partitioning) and the average a floor division. The only float op is
    one ``ln`` per DISTINCT bigram (post-aggregation, not per
    occurrence), the same in-plan ``ln`` convention as :func:`tf_idf`.

    Scale posture: the scoring join is keyed on (w1, w2) — the LM table
    is vocabulary²-bounded and aggregated before the join, so shuffle
    volume is corpus bigrams + LM entries, never pairwise. The LM here
    is trained on the scored corpus itself (every document bigram is in
    the table by construction — no OOV smoothing term is needed); for
    cross-corpus scoring join left and coalesce unseen bigrams to a
    floor log-prob literal.

    Output: ``(id_col, n_bigrams, avg_nll_micro)`` for EVERY input
    document — ``avg_nll_micro = (-Σ lp_micro) div n_bigrams``, 0 for
    docs shorter than 2 tokens.
    """
    from .cache import scoped_persist

    toks = df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__tk"))
    bg = scoped_persist(
        toks.filter(F.size("__tk") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice(F.col("__tk"), 1, F.size("__tk") - 1),
                    F.slice(F.col("__tk"), 2, F.size("__tk") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("__p"),
        )
        .select(F.col(id_col), F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )
    pair_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__n"))
    uni = pair_counts.groupBy("w1").agg(F.sum("__n").alias("__total"))
    lp = pair_counts.join(uni, "w1").select(
        "w1",
        "w2",
        F.round(
            F.log(F.col("__n").cast("double") / F.col("__total").cast("double"))
            * F.lit(int(scale))
        )
        .cast("bigint")
        .alias("__lp"),
    )
    scored = (
        bg.join(lp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__nb"),
            F.sum("__lp").alias("__s"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("__nb", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.expr("(-__s) div __nb"), F.lit(0))
            .cast("long")
            .alias("avg_nll_micro"),
        )
    )


ROLL_B = 131
ROLL_M = 1_000_000_007  # (acc*B + c) stays ~1.3e11 — far inside int64/ANSI


def rolling_fingerprint(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
    out_full: str = "fp_hash",
    out_min: str = "winnow_min",
) -> DataFrame:
    """Polynomial rolling-hash document fingerprints (the Rabin-Karp /
    winnowing family, Schleimer et al. SIGMOD'03).

    - ``out_full``: the full-document polynomial hash
      ``(((0·B + c₁)·B + c₂)…) mod M`` — an order-sensitive content id.
    - ``out_min``: the MINIMUM windowed hash over every ``window``-char
      substring (the 1-fingerprint degenerate of winnowing) — overlap
      between near-identical documents makes their minima collide with
      high probability. NULL for documents shorter than the window.

    True O(n) per document: ONE Catalyst fold over character positions
    carries ``(full, win, minw)`` in a struct accumulator and ROLLS the
    window — subtracting the outgoing character's ``B^window`` term —
    instead of recomputing each window (O(n·k)). All integer modular
    arithmetic: bit-identical on any engine, no float drift, no UDF.
    Narrow projection — scan-speed, zero shuffle.

    The ``codes`` array (an O(n) split+transform of the document) is
    LET-BOUND via the 1-element ``transform`` idiom (``word_shingles``):
    HOF lambda bodies don't common-subexpression-eliminate, so
    referencing ``codes`` directly inside ``step`` re-splits the
    document for every fold step — O(n²)/doc, measured 21× slower at
    2,000-char documents (94.2s → 4.4s for 1,000 docs), bit-identical
    output. Pinned by ``test_rolling_fingerprint_splits_once_per_row``
    and the long-document canary in ``test_text_perf_canary.py``.
    """
    b = F.lit(ROLL_B).cast("bigint")
    m = F.lit(ROLL_M).cast("bigint")
    bk = F.lit(pow(ROLL_B, window, ROLL_M)).cast("bigint")
    zero = F.lit(0).cast("bigint")

    def fold(arr: Column) -> Column:
        def step(acc, i):
            c = F.element_at(arr, i.cast("int"))
            full = (acc["full"] * b + c) % m
            rolled = F.when(
                i > window,
                acc["win"] * b
                + c
                - F.element_at(arr, (i - window).cast("int")) * bk,
            ).otherwise(acc["win"] * b + c)
            win = F.pmod(rolled, m)
            minw = F.when(
                i >= window, F.least(F.coalesce(acc["minw"], win), win)
            ).otherwise(acc["minw"])
            return F.struct(
                full.alias("full"), win.alias("win"), minw.alias("minw")
            )

        init = F.struct(
            zero.alias("full"),
            zero.alias("win"),
            F.lit(None).cast("bigint").alias("minw"),
        )
        return F.aggregate(
            F.sequence(F.lit(1).cast("bigint"), F.size(arr).cast("bigint")),
            init,
            step,
        )

    codes = F.transform(
        F.split(F.col(text_col), ""), lambda c: F.ascii(c).cast("bigint")
    )
    acc = F.element_at(F.transform(F.array(codes), fold), 1)
    return df.select(
        F.col(id_col),
        acc["full"].alias(out_full),
        acc["minw"].alias(out_min),
    )


# ---------------------------------------------------------------------------
# BPE pair-merge statistics (Sennrich et al., ACL 2016 — the tokenizer-
# training primitive). Merge TRAINING is a tiny sequential loop over
# corpus-wide pair counts, so it runs out-of-band in an engine-
# independent twin (train_bpe_merges_parquet, same posture as the IVF
# centroid trainer) and the learned merges enter the distributed plan as
# literals; pair COUNTING given those merges is the heavy part and is
# pure DataFrame work — one narrow merge-application projection + one
# explode + one partially-aggregated shuffle. Everything is integer/
# string — no float anywhere, so the whole face is bit-replicable in SQL
# with no measured-margin caveats.
#
# Merge application is defined as SPACE-DELIMITED LEFT-TO-RIGHT
# NON-OVERLAPPING string replacement: symbols live in " a b c " form and
# merge (a, b) rewrites " a b " → " ab ". Consuming the shared delimiter
# makes replacement order deterministic and identical across Java
# (Spark replace), DuckDB replace, and Python str.replace — the three
# implementations agree by construction rather than by luck. One
# documented deviation from classic greedy BPE: on a RUN of the same
# symbol (" a a a a "), the consumed delimiter blocks the immediately
# following overlap, so one pass yields (aa, a, a) where classic BPE
# gives (aa, aa) — acceptable for a merge-STATISTICS face (the contract
# is bit-identical cross-engine scoring, and the same rule trains the
# twin's merges).
# ---------------------------------------------------------------------------


def _bpe_symbolize(tok: Column) -> Column:
    """A token as a space-wrapped symbol string: 'abc' → ' a b c '."""
    return F.concat(F.lit(" "), F.regexp_replace(tok, "(.)", "$1 "))


def bpe_apply_merges(tok: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply learned merges (in training order) to one token's symbol
    string. A chain of len(merges) literal replaces — a top-level narrow
    projection, whole-stage-codegen'd, zero shuffle."""
    s = _bpe_symbolize(tok)
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return s


def bpe_token_count(tokens: Column, merges: list[tuple[str, str]]) -> Column:
    """Per-document subword count under the TRAINED merges — the count a
    packing/budgeting stage runs with the production tokenizer, vs the
    ws/regex proxies above. ``tokens`` must be a materialized
    array<string> column ref (the HOF no-CSE rule); the lambda does only
    inherent per-element work (the merges are literals). Zero shuffle:
    one whole-row projection, exact BIGINT. Empty docs count 0."""
    per_tok = F.transform(
        tokens,
        lambda t: F.size(
            F.filter(
                F.split(F.trim(bpe_apply_merges(t, merges)), " "),
                lambda x: x != "",
            )
        ).cast("bigint"),
    )
    # NULL text → NULL tokens array → NULL fold; coalesce to 0 so the
    # NULL-document face matches the SQL twin's COALESCE(list_sum…, 0)
    return F.coalesce(
        F.aggregate(per_tok, F.lit(0).cast("bigint"), lambda a, x: a + x),
        F.lit(0).cast("bigint"),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    k: int = 20,
) -> DataFrame:
    """Corpus-wide adjacent-symbol-pair counts AFTER applying ``merges``
    — i.e. the scoring pass that picks merge ``len(merges)+1`` during
    BPE training. Top-``k`` by (cnt DESC, pair ASC): the deterministic
    tie-break makes the output engine-stable. Scale posture: the merge
    application is a narrow projection; the count is one explode + one
    partial-agg shuffle on the pair key; the final top-k orders ≤ the
    distinct-pair set (vocabulary-bounded, not corpus-bounded).

    Output: ``pair`` (space-joined symbol pair), ``cnt``.
    """
    # Aggregate token OCCURRENCE counts first (one vocabulary-bounded
    # partial-agg shuffle), so the merge-application replace chain and
    # the pair expansion run once per DISTINCT token instead of once per
    # occurrence — the corpus-to-vocabulary compute reduction (guide
    # §1.2 step 2; the corpus repeats a bounded vocabulary, so this is
    # ~occurrences/|vocab| less string work for one extra tiny
    # exchange). Pair counts are then occurrence-weighted sums —
    # identical integers by construction.
    tok_counts = (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("__tok"))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    sym = tok_counts.select(
        F.col("__n"),
        F.filter(
            F.split(F.trim(bpe_apply_merges(F.col("__tok"), merges)), " "),
            lambda x: x != "",
        ).alias("__sym"),
    )
    # sequence(1, 0) counts DOWN in Spark, so single-symbol tokens need an
    # explicit empty-array branch rather than a greatest() clamp
    pairs = sym.select(
        F.col("__n"),
        F.explode(
            F.when(
                F.size("__sym") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__sym") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("__sym", i.cast("int")),
                        F.element_at("__sym", (i + 1).cast("int")),
                    ),
                ),
            ).otherwise(F.expr("CAST(array() AS array<string>)"))
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("__n").alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(k)


def train_bpe_merges_parquet(
    parquet_path: str,
    text_col: str = "text",
    n_merges: int = 8,
) -> list[tuple[str, str]]:
    """Engine-independent BPE merge trainer (the pyarrow twin, same
    contract as ``train_ivf_centroids_parquet``): learn ``n_merges``
    merges by repeatedly taking the most frequent adjacent symbol pair
    (ties broken by pair text ascending) and applying it with the SAME
    space-delimited replace rule the Spark/SQL faces use. Token
    frequencies are aggregated first, so each round is O(vocabulary),
    not O(corpus) — and the corpus scan reads only ``text_col``.
    All integer counts + exact string ops: bit-deterministic, no margins.
    """
    from collections import Counter

    import pyarrow.dataset as pads
    import re

    word_freq: Counter = Counter()
    ds = pads.dataset(parquet_path)
    for batch in ds.scanner(columns=[text_col], batch_size=1 << 14).to_batches():
        for txt in batch.column(0).to_pylist():
            if txt:
                # Java's \s (the Spark face's split) is ASCII-only:
                # [ \t\n\x0b\f\r]. Python's \s is Unicode-aware, so a
                # bare re.split(r"\s+") would tokenize 'a\xa0b' as two
                # tokens while the engine keeps one — the twin must use
                # the exact Java class or "agree by construction" fails
                # on Unicode whitespace.
                word_freq.update(
                    t for t in re.split("[ \t\n\x0b\f\r]+", txt) if t
                )

    sym_freq = {
        " " + "".join(ch + " " for ch in w): n for w, n in word_freq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for s, n in sym_freq.items():
            # split on the literal space separator only — a token may
            # itself contain Unicode whitespace chars as symbols
            parts = [p for p in s.split(" ") if p]
            for a, b in zip(parts, parts[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        mx = max(pair_counts.values())
        best = min(
            (p for p, c in pair_counts.items() if c == mx),
            key=lambda p: f"{p[0]} {p[1]}",
        )
        merges.append(best)
        a, b = best
        sym_freq = {
            s.replace(f" {a} {b} ", f" {a}{b} "): n for s, n in sym_freq.items()
        }
        # re-merge colliding keys (two words can map to one symbol string
        # only if they were equal pre-merge, but stay defensive)
        merged: dict = {}
        for s, n in sym_freq.items():
            merged[s] = merged.get(s, 0) + n
        sym_freq = merged
    return merges
