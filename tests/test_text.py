"""Text-analysis operators: language ID, quality, token counts, fingerprint."""

from __future__ import annotations

import math

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count_bpe,
    token_count_ws,
)

from pyspark.sql import functions as F


def test_language_id_known_sentences(spark):
    rows = [
        (1, "the cat is in the house and it was warm"),
        (2, "der Hund ist nicht mit der Katze und das ist gut"),
        (3, "el perro es grande y la casa es de piedra"),
        (4, "xyzzy plugh qwerty"),  # no stopwords → und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! x2  ok")], "id long, text string")
    row = df.select(
        token_count_ws("text").alias("ws"), token_count_bpe("text").alias("bpe")
    ).first()
    assert row.ws == 4
    # Hello , world ! x2 ok → [Hello][,][world][!][x2][ok] = 6
    assert row.bpe == 6


def test_quality_score_bounds_and_monotonicity(spark):
    rows = [
        (1, "the cat sat on the mat and it was a good day for all of us " * 4),
        (2, "!!!! ???? ;;;; 1234 5678"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.quality for r in quality_score(df).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[1] > got[2]  # clean prose beats punctuation soup
    assert math.isclose(got[3], 0.3)  # empty: only the no-noise term fires


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = [r.fp for r in fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]
    assert len(fps[0]) == 32  # md5 hex


def test_hash_split_deterministic_and_partition_stable(spark):
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    # different partitioning must not change assignments (the rand() trap)
    b = {r.doc_id: r.split for r in hash_split(df.repartition(7), "doc_id").collect()}
    assert a == b
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.85 < c["train"] / 2000 < 0.95  # ~90%


def test_chunk_documents_short_and_exact_boundary(spark):
    """Docs shorter than one window yield exactly one chunk with all
    tokens; a doc of exactly window+stride tokens yields two chunks with
    the correct overlap; empty text yields one empty chunk."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        chunk_documents,
    )

    toks112 = " ".join(f"t{i}" for i in range(112))  # 64 + 48
    df = spark.createDataFrame(
        [(1, "a b c"), (2, toks112), (3, "")], ["doc_id", "text"]
    )
    rows = {
        (r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(df, window=64, stride=48).collect()
    }
    assert rows[(1, 0)] == (3, "a b c")
    assert (1, 1) not in rows
    # doc 2: chunk 0 = tokens 0..63, chunk 1 = tokens 48..111
    assert rows[(2, 0)][0] == 64 and rows[(2, 0)][1].startswith("t0 ")
    assert rows[(2, 1)][0] == 64 and rows[(2, 1)][1].startswith("t48 ")
    assert rows[(2, 1)][1].endswith("t111")
    assert (2, 2) not in rows
    assert rows[(3, 0)] == (0, "")


def test_profile_columns_counts_nulls(spark):
    """Null counting and distinct counting verified on a frame that
    actually contains nulls (the synthetic tables have none)."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.profile import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        ["k", "v"],
    )
    prof = {r.column: r for r in profile_columns(df, ["k", "v"]).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_null == 1
    assert prof["k"].n_distinct == 3  # nulls excluded from distinct
    assert prof["v"].n_null == 1 and prof["v"].n_distinct == 2
    assert prof["v"].min_val == "a" and prof["v"].max_val == "b"


def test_scrub_pii_planted(spark):
    """Each PII kind redacted with its tag, counts exact, clean text
    untouched; replacement order prevents the number rule from eating
    email/IP digits."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        scrub_pii,
    )

    rows = [
        (1, "write to alice.smith+spam@example.co.uk today"),
        (2, "server 192.168.001.1 and 10.0.0.7 pinged"),
        (3, "call +44 20-7946-0958 or 555-0100 now"),
        (4, "order 123456789012 shipped"),
        (5, "no pii here at all"),
        (6, "multi bob@x.io and carol@y.org from 1.2.3.4 acct 987654321"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(df, "text").collect()}

    assert got[1].scrubbed == "write to <EMAIL> today"
    assert (got[1].n_email, got[1].n_ip, got[1].n_phone, got[1].n_number) == (1, 0, 0, 0)
    assert got[2].scrubbed == "server <IP> and <IP> pinged"
    assert got[2].n_ip == 2
    assert got[3].scrubbed == "call <PHONE> or <PHONE> now"
    assert got[3].n_phone == 2
    assert got[4].scrubbed == "order <NUM> shipped"
    assert got[4].n_number == 1
    assert got[5].scrubbed == rows[4][1]  # clean text is untouched
    assert got[6].scrubbed == "multi <EMAIL> and <EMAIL> from <IP> acct <NUM>"
    assert (got[6].n_email, got[6].n_ip, got[6].n_number) == (2, 1, 1)


def test_scrub_pii_null_text(spark):
    """NULL text: scrubbed stays NULL, every count is 0 (not NULL) — the
    docstring contract that counts report exactly what was redacted."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        scrub_pii,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "mail bob@x.io")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in scrub_pii(df, "text").collect()}
    assert got[1].scrubbed is None
    assert (got[1].n_email, got[1].n_ip, got[1].n_phone, got[1].n_number) == (0, 0, 0, 0)
    assert got[2].scrubbed == "mail <EMAIL>" and got[2].n_email == 1


def test_bm25_scores_match_python_reference(spark):
    """bm25_scores == a direct python Okapi BM25 on the same tokens and
    shared corpus stats (6-dp rounded), on the real sf0.001 corpus."""
    import re

    import pyarrow.parquet as pq

    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        bm25_scores,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.sources import (
        read_parquet_table,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.synthetic import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _bm25_shared,
    )

    sf_dir = "/root/testdata/sf0.001"
    idf, avgdl = _bm25_shared(sf_dir)
    docs = read_parquet_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: r.bm25
        for r in bm25_scores(
            docs, "doc_id", "text", _BM25_TERMS, idf, avgdl,
            k1=_BM25_K1, b=_BM25_B,
        ).collect()
    }

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        toks = [w for w in re.split("[ \t\n\x0b\f\r]+", text) if w]
        dl = float(len(toks))
        s = 0.0
        for term in _BM25_TERMS:
            tf = float(toks.count(term))
            s += (idf[term] * (tf * (_BM25_K1 + 1.0))) / (
                tf + _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * (dl / avgdl))
            )
        assert abs(got[doc_id] - round(s, 6)) <= 1e-6, doc_id


def test_rolling_fingerprint_matches_python_reference(spark):
    """The O(n) rolling fold (full hash + min windowed hash) equals a
    direct python Rabin-Karp computation, including the shorter-than-
    window NULL case and an append-overlap collision: a document sharing
    a long run with another shares its window minimum."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        ROLL_B,
        ROLL_M,
        rolling_fingerprint,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = ["abc xy", "a", base, base + " at noon", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.fp_hash, r.winnow_min)
        for r in rolling_fingerprint(df, "doc_id", "text", window=8).collect()
    }

    def full(t):
        h = 0
        for ch in t:
            h = (h * ROLL_B + ord(ch)) % ROLL_M
        return h

    def winmin(t, k=8):
        if len(t) < k:
            return None
        return min(full(t[i : i + k]) for i in range(len(t) - k + 1))

    for i, t in enumerate(texts):
        assert got[i] == (full(t), winmin(t)), (i, t)
    # appending text can only lower the window minimum; here the shared
    # prefix contains both documents' minimum window, so they collide
    assert got[3][1] <= got[2][1]


def test_bpe_apply_merges_replace_semantics(spark):
    """The space-delimited replace rule is the operator's DEFINED merge
    semantics: left-to-right non-overlapping, consuming the shared
    delimiter — identical in Java, DuckDB and Python by construction.
    'aaa' with merge (a,a) becomes (aa, a); 'aaaa' becomes (aa, a, a) —
    the delimiter consumed by a replacement blocks the immediately
    following overlap, a DOCUMENTED deviation from classic greedy BPE on
    same-symbol runs (all three engines implement the identical rule);
    and a merge never fires INSIDE a multi-char symbol."""
    from pyspark.sql import functions as F

    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        bpe_apply_merges,
    )

    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("ab",), ("ba",)], "tok string"
    )
    got = {
        r.tok: r.s
        for r in df.select(
            "tok", bpe_apply_merges(F.col("tok"), [("a", "a")]).alias("s")
        ).collect()
    }
    assert got["aaa"] == " aa a "
    assert got["aaaa"] == " aa a a "
    assert got["ab"] == " a b "
    assert got["ba"] == " b a "
    # chained merges apply in training order: (a,a) then (aa,b)
    got2 = df.select(
        "tok", bpe_apply_merges(F.col("tok"), [("a", "a"), ("aa", "b")]).alias("s")
    ).collect()
    m = {r.tok: r.s for r in got2}
    assert m["ab"] == " a b "  # (a,a) never fired, so (aa,b) cannot
    assert m["aaa"] == " aa a "


def test_bpe_twin_consistent_with_engine_scoring(spark):
    """The pyarrow twin's merge k+1 choice must equal the top-1 of the
    ENGINE's pair-count scoring pass given merges[:k] — the same
    twin-vs-engine consistency contract as the IVF centroid trainer."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        bpe_pair_counts,
        train_bpe_merges_parquet,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.sources import (
        read_parquet_table,
    )
    from conftest import SF_DIR

    merges = train_bpe_merges_parquet(
        f"{SF_DIR}/documents.parquet", n_merges=5
    )
    docs = read_parquet_table(spark, SF_DIR, "documents")
    for k in (0, 2, 4):
        top = bpe_pair_counts(docs, "text", merges[:k], k=1).first()
        assert tuple(top.pair.split(" ")) == merges[k], (k, top.pair, merges[k])


def test_bpe_token_count_matches_python_replica(spark):
    """Per-doc trained-subword counts equal a pure-Python application of
    the same space-delimited replace rule; empty/whitespace docs count 0
    (the aggregate's zero seed, not a NULL)."""
    from pyspark.sql import functions as F

    from analysis_of_flight_delay_data_by_mapreduce_spark.functions import (
        word_tokens,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        bpe_token_count,
    )

    merges = [("a", "a"), ("aa", "b")]

    def py_count(text: str) -> int:
        import re

        n = 0
        for tok in (t for t in re.split("[ \t\n\x0b\f\r]+", text) if t):
            s = " " + "".join(c + " " for c in tok)
            for a, b in merges:
                s = s.replace(f" {a} {b} ", f" {a}{b} ")
            n += len([p for p in s.split(" ") if p])
        return n

    rows = [("aaab aa", ), ("", ), ("   ", ), ("xyz aaaa", ), (None, )]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        "text",
        bpe_token_count(word_tokens(F.col("text")), merges).alias("n"),
    ).collect()
    for r in got:
        assert r.n == py_count(r.text or ""), r.text
    assert {r.text: r.n for r in got}[""] == 0
    assert {r.text: r.n for r in got}[None] == 0  # matches the SQL twin


def test_bigram_lm_scores_match_python_replica(spark):
    """Planted corpus: the per-doc average NLL equals an independent
    python recomputation of round-then-sum micro log-probs, short docs
    score (0, 0), and the less-predictable doc scores strictly worse
    (higher avg NLL) than the repetitive one."""
    import math
    from collections import Counter

    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        bigram_lm_scores,
    )

    rows = [
        (1, "a b a b a b a b"),         # highly predictable
        (2, "a b c d e f g h"),         # every bigram near-unique
        (3, "a b a c a b a d"),
        (4, "solo"),                    # < 2 tokens -> (0, 0)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    bgs = {i: list(zip(t.split(), t.split()[1:])) for i, t in rows}
    pair: Counter = Counter(b for bs in bgs.values() for b in bs)
    uni: Counter = Counter()
    for (w1, _), n in pair.items():
        uni[w1] += n
    want = {}
    for i, bs in bgs.items():
        if not bs:
            want[i] = (0, 0)
            continue
        s = sum(
            int(round(math.log(pair[b] / uni[b[0]]) * 1e6)) for b in bs
        )
        want[i] = (len(bs), (-s) // len(bs))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll_micro)
        for r in bigram_lm_scores(docs, "doc_id", "text").collect()
    }
    assert got == want
    assert got[4] == (0, 0)
    # the repetitive doc's bigrams are the corpus's most frequent, so it
    # scores strictly best (lowest avg NLL) among the scored docs; every
    # scored doc has positive NLL (no bigram is fully certain here
    # except inside the single-occurrence chains)
    assert got[1][1] == min(got[i][1] for i in (1, 2, 3))
    assert all(got[i][1] > 0 for i in (1, 2, 3))


def test_repetition_features_match_python_replica(spark):
    """repetition_features == a brute-force Counter replica (top/dup
    occurrence fractions in integer micro-units) on planted docs
    covering: empty text, single token, all-distinct, all-identical,
    alternating 2-gram repetition, and a mixed doc."""
    from collections import Counter

    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        repetition_features,
    )

    texts = {
        1: "a a a b c",
        2: "",
        3: "x",
        4: "p q p q p q",
        5: "u v w x y z",
        6: "m m m m m",
        7: "one two two three three three  four\tfour",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )

    def replica(t):
        toks = [w for w in t.split() if w]
        n = len(toks)
        grams = [
            toks[i] + "\x1f" + toks[i + 1] for i in range(n - 1)
        ]

        def stats(items):
            c = Counter(items)
            top = max(c.values(), default=0)
            dup = sum(v for v in c.values() if v >= 2)
            return top, dup

        tt, td = stats(toks)
        gt, gd = stats(grams)
        ng = max(n - 1, 0)
        return (
            n,
            (tt * 10**6) // n if n else 0,
            (td * 10**6) // n if n else 0,
            (gt * 10**6) // ng if ng else 0,
            (gd * 10**6) // ng if ng else 0,
        )

    got = {
        r.doc_id: (
            r.n_tokens,
            r.top_tok_micro,
            r.dup_tok_micro,
            r.top_2gram_micro,
            r.dup_2gram_micro,
        )
        for r in repetition_features(df).collect()
    }
    assert got == {i: replica(t) for i, t in texts.items()}
    assert got[6] == (5, 10**6, 10**6, 10**6, 10**6)  # fully repeated
    assert got[5][1:] == (166666, 0, 200000, 0)  # all distinct


def test_repetition_features_zero_shuffle_plan(spark):
    """The repetition pass is per-row: no Exchange anywhere in the plan
    (sorted-array folds, not explode+groupBy)."""
    from analysis_of_flight_delay_data_by_mapreduce_spark.operators.text import (
        repetition_features,
    )
    from analysis_of_flight_delay_data_by_mapreduce_spark.plans.inspect import (
        plan_text,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    txt = plan_text(repetition_features(docs), "simple")
    assert "Exchange" not in txt, txt
