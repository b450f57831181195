"""Contract test for the Kafka leg of read_cdc_stream (VERDICT r9 #6).

No broker is available in-sandbox (the reference likewise delegates
transport to Kafka Connect config, debezium-connector-config.json), so the
branch is exercised by injecting a recording readStream builder: the test
pins the exact reader format + option set and the key/value projection the
downstream parse_stream contract depends on. The real network I/O is
Spark's own kafka connector — what is OURS (and therefore tested) is the
wiring: which options, which values, and the cast-to-string projection
that makes Kafka's binary key/value look identical to the file-source leg.
"""

from __future__ import annotations

from unittest import mock

import pytest

from postgres_cdc_reconciliation_spark.sources.cdc import read_cdc_stream


class _RecordingReader:
    """Stands in for spark.readStream: records format/options, returns a
    mock frame from load() whose .select(...) records the projection."""

    def __init__(self):
        self.fmt = None
        self.options: dict[str, object] = {}
        self.loaded = mock.MagicMock(name="kafka_frame")
        self.loaded.select.return_value = mock.MagicMock(name="projected")

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        return self.loaded


def test_kafka_branch_option_wiring(spark):
    # the real session fixture is only needed so F.col/F.cast can build
    # Column expressions (pyspark 4 dispatches on the active session);
    # the mocked session below is what the source actually reads from
    spark = mock.MagicMock(name="spark")
    reader = _RecordingReader()
    spark.readStream = reader

    out = read_cdc_stream(
        spark, kafka_bootstrap="broker:9092", topic="postgres-source.public.orders"
    )

    assert reader.fmt == "kafka"
    # the exact option set — no extras, nothing renamed. subscribe targets
    # the Debezium topic (server.name.schema.table); startingOffsets
    # earliest because the apply path replays idempotently from the
    # checkpoint (snapshot-then-stream, T4); maxOffsetsPerTrigger mirrors
    # Debezium's max.batch.size=2048 default for bounded micro-batches.
    assert reader.options == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "postgres-source.public.orders",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": 2048,
    }

    # the projection normalizes Kafka's binary key/value to the (key string,
    # value string) shape parse_stream expects — same contract as the file
    # leg, so tombstones (null value, tombstones.on.delete=true) survive the
    # cast as NULL strings.
    args, _ = reader.loaded.select.call_args
    rendered = [str(c) for c in args]
    assert len(rendered) == 2
    assert "CAST(key AS STRING) AS key" in rendered[0]
    assert "CAST(value AS STRING) AS value" in rendered[1]
    assert out is reader.loaded.select.return_value


def test_kafka_branch_max_events_override(spark):
    spark = mock.MagicMock(name="spark")
    reader = _RecordingReader()
    spark.readStream = reader
    read_cdc_stream(spark, kafka_bootstrap="b:9092", topic="t", max_events_per_trigger=512)
    assert reader.options["maxOffsetsPerTrigger"] == 512


def test_transport_args_are_mutually_required():
    spark = mock.MagicMock(name="spark")
    spark.readStream = _RecordingReader()
    with pytest.raises(ValueError, match="kafka_bootstrap"):
        read_cdc_stream(spark, kafka_bootstrap="b:9092")  # topic missing
    with pytest.raises(ValueError, match="kafka_bootstrap"):
        read_cdc_stream(spark, topic="t")  # bootstrap missing
    with pytest.raises(ValueError, match="kafka_bootstrap"):
        read_cdc_stream(spark)
