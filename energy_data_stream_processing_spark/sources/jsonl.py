"""JSONL event-envelope source (reference: producer/producer.py:41-53).

Reads the reference's event format — one JSON object per line with envelope
``{event_type, event_time, payload{...}}`` — with an EXPLICIT schema (never
inference inside the engine) in PERMISSIVE mode; unparseable lines land in a
``_corrupt`` column instead of failing the job, which is the engine-native
form of the reference's dead-letter file (data/bad_events.log).

String-first numerics: the reference accepts JSON numbers *and* numeric
strings for session_id / energy_consumed / payment_amount
(consumer/consumer.py:249, tests/test_consumer.py:14-17), so the envelope
types them as strings and casting happens in the validation/flatten layer.

Scale note: a JSONL scan parallelizes per file-split; schema-on-read keeps
the parse single-pass and column-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt"

PAYLOAD_SCHEMA = StructType(
    [
        StructField("customer_id", StringType(), True),
        StructField("session_id", StringType(), True),
        StructField("channel", StringType(), True),
        StructField("tariff_type", StringType(), True),
        StructField("energy_consumed", StringType(), True),
        StructField("payment_amount", StringType(), True),
    ]
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), True),
        StructField("event_time", StringType(), True),
        StructField("payload", PAYLOAD_SCHEMA, True),
        StructField(CORRUPT_COL, StringType(), True),
    ]
)


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(ENVELOPE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
