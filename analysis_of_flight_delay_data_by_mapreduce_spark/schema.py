"""Typed schemas for every dataset the engine reads.

The reference is schema-on-read: positional, untyped ``String[]`` addressed
by ordinal (``s[2]``, ``s[8]``, ``s[16]`` — reference ``Program/Delay.java:53-56``).
Here every input gets a named, typed ``StructType``; Catalyst then prunes and
pushes down against real column metadata (free with Parquet).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# UK CAA flight punctuality table (reference native input).
# Column order/names from the fixture header embedded in the reference jar
# (Jar/UKFlightAnalysis.jar!org/leicester/smallinput.csv:1); ordinals are the
# positions the reference addresses (Program/Delay.java:51-56,
# Program/Late.java:57-61). Full column notes in FIXTURES.md §1.
# ---------------------------------------------------------------------------
FLIGHT_PUNCTUALITY = T.StructType(
    [
        T.StructField("run_date", T.StringType()),                 # 0
        T.StructField("reporting_period", T.StringType()),         # 1  YYYYMM
        T.StructField("reporting_airport", T.StringType()),        # 2
        T.StructField("origin_destination_country", T.StringType()),  # 3
        T.StructField("origin_destination", T.StringType()),       # 4
        T.StructField("airline_name", T.StringType()),             # 5
        T.StructField("arrival_departure", T.StringType()),        # 6  'A'/'D'
        T.StructField("scheduled_charter", T.StringType()),        # 7  'S'/'C'
        T.StructField("number_flights_matched", T.IntegerType()),  # 8
        T.StructField("actual_flights_unmatched", T.IntegerType()),  # 9
        T.StructField("early_to_15_mins_late_percent", T.DoubleType()),    # 10
        T.StructField("flts_16_to_30_mins_late_percent", T.DoubleType()),  # 11
        T.StructField("flts_31_to_60_mins_late_percent", T.DoubleType()),  # 12
        T.StructField("flts_61_to_180_mins_late_percent", T.DoubleType()),  # 13
        T.StructField("flts_181_to_360_mins_late_percent", T.DoubleType()),  # 14
        T.StructField("more_than_360_mins_late_percent", T.DoubleType()),  # 15
        T.StructField("average_delay_mins", T.DoubleType()),       # 16
        T.StructField("planned_flights_unmatched", T.IntegerType()),  # 17
        T.StructField("previous_year_month_flights_matched", T.IntegerType()),  # 18
        T.StructField(
            "previous_year_month_early_to_15_mins_late_percent", T.DoubleType()
        ),  # 19
        T.StructField("previous_year_month_average_delay", T.DoubleType()),  # 20
    ]
)

#: Columns of FLIGHT_PUNCTUALITY that arrive space-padded in the raw CSV and
#: are numeric — read as string then trimmed+cast by sources.csv (the
#: reference trims at every use site, Program/Delay.java:53-56).
_FLIGHT_NUMERIC_COLS = {
    f.name: f.dataType
    for f in FLIGHT_PUNCTUALITY.fields
    if not isinstance(f.dataType, T.StringType)
}

# Whitespace-delimited access-log triples (WebLog1/2 input;
# Jar/…!org/leicester/WebLog1.java:28-32).
WEBLOG = T.StructType(
    [
        T.StructField("username", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

# Free-text corpus, one line per row (WordCount input).
TEXT_CORPUS = T.StructType([T.StructField("line", T.StringType())])

# ---------------------------------------------------------------------------
# Driver-provided synthetic tables (TESTDATA.md). Parquet carries its own
# schema; these are for documentation/validation and for streaming readers,
# which require an explicit schema.
# ---------------------------------------------------------------------------
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal asset table (extension tier): opaque binary payload + typed
# metadata. No driver-side fixture exists; operators.multimodal builds these.
MULTIMODAL_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # 'image' | 'audio' | 'video'
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

SYNTHETIC_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
