"""Streaming source adapters (SURVEY.md §2.9 — the NRT ingest edge).

The reference's NRT loop polls the LANCE feed per period
(DataDownloader_SNPP_VIIRS_V1.py:138-141); this engine's streaming jobs
(``streaming.jobs``) are pure DataFrame→DataFrame transforms, so WHICH
transport delivers the events is a one-line swap. This module pins that
contract with a Kafka-shaped wire format every adapter normalizes to:

    key BINARY, value BINARY (serialized JSON payload), source_ts
    TIMESTAMP

— exactly the column shape ``format("kafka")`` exposes, so the decode
path (``decode_events``: cast → from_json → typed columns) is the SAME
code for a file replay, an in-container rate/socket source, and a real
broker. Adapters:

- :class:`FileEventSource` — parquet micro-batch replay (the test /
  backfill harness), ENCODED through the wire format so the decode path
  is exercised, not bypassed.
- :class:`RateEventSource` — Spark's built-in ``rate`` source with every
  event field derived deterministically from the monotonically
  increasing ``value`` id, so a batch mirror over ``spark.range(n)``
  reproduces the stream bit-for-bit (the oracle trick, applied to a
  live source).
- :class:`SocketJsonSource` — ``format("socket")``, one JSON payload
  per line (nc-style ad-hoc feeds).
- :class:`KafkaJsonSource` — ``format("kafka")``. No broker ships in
  this container, so it is exercised only through its (identical) wire
  contract; the class exists to show the swap is configuration, not
  code.

All payloads carry the ``EVENTS_STREAM_SCHEMA`` fields of
``streaming.jobs``; downstream jobs are byte-identical across adapters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jobs import EVENTS_STREAM_SCHEMA

# Fixed epoch for deterministic rate-derived event times (any constant
# works; this one keeps test windows human-readable).
RATE_BASE_TS = "2025-08-01 00:00:00"


def _wire(value_json: F.Column, key: F.Column, ts: F.Column) -> list:
    return [
        key.cast("binary").alias("key"),
        value_json.cast("binary").alias("value"),
        ts.alias("source_ts"),
    ]


class FileEventSource:
    """Parquet directory replay through the Kafka wire shape."""

    def __init__(self, path: str, max_files_per_trigger: int = 1):
        self.path = path
        self.max_files = max_files_per_trigger

    def load(self, spark: SparkSession) -> DataFrame:
        typed = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files)
            .parquet(self.path)
        )
        payload = F.to_json(
            F.struct(*[f.name for f in EVENTS_STREAM_SCHEMA.fields])
        )
        key = F.concat_ws(":", "cell_x", "cell_y")
        return typed.select(*_wire(payload, key, F.col("ts")))


class RateEventSource:
    """``rate`` source with payloads that are a pure function of the
    row id: ``ts = RATE_BASE_TS + (id % period_s) seconds``,
    ``cell_x = id % nx``, ``cell_y = (id / nx) % ny``, ``value`` a
    Knuth-hash bucket — so :meth:`batch_mirror` over ``spark.range(n)``
    rebuilds exactly the first n events for oracle comparison."""

    def __init__(self, rows_per_second: int = 500, nx: int = 8,
                 ny: int = 4, period_s: int = 7200):
        self.rps = rows_per_second
        self.nx, self.ny, self.period_s = nx, ny, period_s

    def _payload_cols(self, id_col: F.Column) -> list:
        ts = F.to_timestamp(F.lit(RATE_BASE_TS)) + F.make_interval(
            secs=(id_col % F.lit(self.period_s)).cast("double")
        )
        return [
            ts.alias("ts"),
            (id_col % self.nx).cast("int").alias("cell_x"),
            ((id_col / self.nx).cast("long") % self.ny)
            .cast("int")
            .alias("cell_y"),
            (
                ((id_col * F.lit(2654435761)) % F.lit(1000)).cast("double")
                / F.lit(10.0)
            ).alias("value"),
        ]

    def load(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rps)
            .load()
        )
        ev = raw.select(*self._payload_cols(F.col("value")))
        payload = F.to_json(
            F.struct(*[f.name for f in EVENTS_STREAM_SCHEMA.fields])
        )
        key = F.concat_ws(":", "cell_x", "cell_y")
        return ev.select(*_wire(payload, key, F.col("ts")))

    def batch_mirror(self, spark: SparkSession, n: int) -> DataFrame:
        """The first ``n`` stream events as a batch DataFrame —
        bit-identical to what the live source emitted (rate ids are
        contiguous from 0), for replay-vs-batch oracle tests."""
        return spark.range(n).select(
            *self._payload_cols(F.col("id"))
        )


class SocketJsonSource:
    """``socket`` text source; each line is one JSON payload."""

    def __init__(self, host: str = "localhost", port: int = 9999):
        self.host, self.port = host, port

    def load(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("socket")
            .option("host", self.host)
            .option("port", self.port)
            .load()
        )
        return raw.select(
            *_wire(
                F.col("value"),
                F.lit(None).cast("string"),
                F.current_timestamp(),
            )
        )


class KafkaJsonSource:
    """``kafka`` source — identical wire columns by construction (the
    adapter only renames ``timestamp`` → ``source_ts``). Requires a
    broker; not runnable in this container."""

    def __init__(self, bootstrap_servers: str, topic: str,
                 starting_offsets: str = "earliest"):
        self.bootstrap = bootstrap_servers
        self.topic = topic
        self.starting = starting_offsets

    def load(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting)
            .load()
        )
        return raw.select(
            "key", "value", F.col("timestamp").alias("source_ts")
        )


def decode_events(
    wire: DataFrame, schema: T.StructType = EVENTS_STREAM_SCHEMA
) -> DataFrame:
    """Wire frame → typed event frame (the single decode path every
    adapter feeds; corrupt payloads null out rather than kill the
    query, the standard poison-pill posture for an unbounded feed)."""
    parsed = wire.select(
        F.from_json(F.col("value").cast("string"), schema).alias("p")
    )
    return parsed.select("p.*").filter(F.col("ts").isNotNull())
