"""Input readers (SURVEY §2.1 S1-S4, S6).

The reference reads directories of text lines and hand-parses each line
(quote-aware splitter ``Program/Delay.java:144-162``; whitespace
``StringTokenizer`` ``WebLog1.java:28-32``). Here each input becomes a typed
DataFrame at scan time; Catalyst pushes filters/pruning into the source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schema as S


#: Timestamp columns stored as TIMESTAMP(NANOS) in the synthetic parquet.
#: Spark reads them as int64 nanos (``spark.sql.legacy.parquet.nanosAsLong``,
#: set by session.get_spark); the reader restores TimestampType losslessly.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Primary scan path: one Parquet table from a scale-factor dir.

    Nano-precision timestamp columns arrive as int64; converted with exact
    integer division (``div`` keeps all bits — a double ``/`` would round
    above 2^53) then ``timestamp_micros``. Pure column ops, pushdown-safe.

    Defensive session conf: the engine's own sessions (session.get_spark)
    already set these, but the driver harness may hand us a bare session —
    ``nanosAsLong`` is required to read TIMESTAMP(NANOS) parquet at all,
    and UTC makes timestamp↔string behavior match the UTC-naive oracle.
    Both are runtime-settable SQL confs; setting them is idempotent.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, ()):
        if c not in df.columns:
            continue
        dtype = dict(df.dtypes)[c]
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":
            # Generator versions vary: TIMESTAMP(NANOS)→int64 (above) or
            # TIMESTAMP_NTZ(MICROS). Normalize to TZ-aware TIMESTAMP —
            # value-preserving under the UTC session TZ — so downstream
            # instant functions (unix_micros, watermarks) work uniformly.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_synthetic(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All driver-provided synthetic tables (TESTDATA.md) as a dict."""
    return {t: read_parquet_table(spark, sf_dir, t) for t in S.SYNTHETIC_TABLES}


def read_flight_csv(spark: SparkSession, path: str) -> DataFrame:
    """UK CAA punctuality CSV → typed DataFrame.

    Reproduces the observable behavior of the reference's dialect
    (SURVEY §1.3) without its quote-retention bug:

    - header row handled by the source (the reference drops it only as a
      side effect of the ``scheduled_charter=='S'`` filter,
      ``Program/Delay.java:48-50``);
    - blank lines dropped (``s.length != 0``, ``Program/Delay.java:51``);
    - space-padded fields trimmed then cast (the reference ``.trim()``s at
      every use site, ``Program/Delay.java:53-56``) — so the CSV is read
      all-string first, then trimmed+cast per the typed schema;
    - quoted fields parsed with standard CSV quoting.
    """
    raw_fields = [T.StructField(f.name, T.StringType()) for f in S.FLIGHT_PUNCTUALITY]
    raw = spark.read.csv(
        path,
        schema=T.StructType(raw_fields),
        header=True,
        quote='"',
        mode="PERMISSIVE",
    )
    cols = [
        F.trim(F.col(f.name)).cast(f.dataType).alias(f.name)
        for f in S.FLIGHT_PUNCTUALITY
    ]
    typed = raw.select(*cols)
    # Blank line → all-NULL row; the reference's non-empty-row guard.
    return typed.filter(F.col("reporting_airport").isNotNull())


def read_weblog(spark: SparkSession, path: str) -> DataFrame:
    """Whitespace-delimited ``username date url`` triples → typed DataFrame
    (``WebLog1.java:28-32``). Tokenizes with a single JVM-side split."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.filter(F.trim(F.col("value")) != "")
        .select(
            toks.getItem(0).alias("username"),
            toks.getItem(1).alias("date"),
            toks.getItem(2).alias("url"),
        )
    )


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Plain text, one line per row (WordCount input)."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — symmetric with :func:`write_orc`; Catalyst pushes
    filters and prunes columns exactly as for parquet (asserted in
    test_sources)."""
    return spark.read.orc(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines source with an explicit schema (extension tier).

    A 100 TB pipeline NEVER lets the JSON source infer its schema — sampling
    reads the data twice and a drifting field type silently re-types the
    whole column. Pass a ``StructType``; malformed lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job, so bad
    rows are quantifiable and quarantinable downstream.
    """
    reader = spark.read
    if schema is not None:
        schema = T.StructType(
            schema.fields + [T.StructField("_corrupt_record", T.StringType())]
        )
        reader = reader.schema(schema)
    return reader.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)
