"""Opt-in LIVE Kafka integration (VERDICT r11 ask #6): the full
produce → ``kafka_events_source`` → event-contract cycle against a REAL
broker, completing the seam whose broker-free half
(``project_kafka_events`` wire→contract tests) runs in every CI pass.

Skipped by default (`pytest.ini` deselects `-m kafka`); run with:

    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
    pytest tests/test_kafka_live.py -m kafka

Requirements beyond the env var, each probed at runtime with a specific
skip message (the `tests/test_s3_live.py` posture — CI without a broker
skips cleanly, never fails):

- a reachable broker at ``SPARK_GRAFT_KAFKA_BOOTSTRAP``
- a producer client: ``kafka-python`` (or ``confluent-kafka``) importable
- the spark-sql-kafka connector on the session classpath (supply
  ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`` via
  ``PYSPARK_SUBMIT_ARGS`` or spark.jars.packages)
"""

from __future__ import annotations

import json
import os
import socket
import uuid

import pytest

pytestmark = pytest.mark.kafka

_BOOTSTRAP_ENV = "SPARK_GRAFT_KAFKA_BOOTSTRAP"


def _producer(bootstrap: str):
    """A (send(topic, bytes), flush()) pair over whichever client is
    installed; None if neither library imports."""
    try:
        from kafka import KafkaProducer  # type: ignore

        p = KafkaProducer(bootstrap_servers=bootstrap)
        return (lambda t, b: p.send(t, b)), p.flush
    except ImportError:
        pass
    try:
        from confluent_kafka import Producer  # type: ignore

        p = Producer({"bootstrap.servers": bootstrap})
        return (lambda t, b: p.produce(t, b)), p.flush
    except ImportError:
        return None


@pytest.fixture(scope="module")
def live(spark):
    bootstrap = os.environ.get(_BOOTSTRAP_ENV)
    if not bootstrap:
        pytest.skip(f"live Kafka env not configured: missing {_BOOTSTRAP_ENV}")
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=5):
            pass
    except OSError as e:  # pragma: no cover - env-specific
        pytest.skip(f"broker {bootstrap} not reachable: {e}")
    prod = _producer(bootstrap)
    if prod is None:
        pytest.skip("no Kafka producer client (kafka-python / confluent-kafka)")
    # connector probe: a batch read against a throwaway topic fails fast
    # with ClassNotFound when spark-sql-kafka is absent from the classpath
    try:
        (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", f"probe-{uuid.uuid4().hex[:8]}")
            .option("endingOffsets", "latest")
            .load()
            .limit(0)
            .collect()
        )
    except Exception as e:  # pragma: no cover - env-specific
        pytest.skip(f"spark-sql-kafka connector unavailable: {e}")
    return bootstrap, prod


def _event(eid: str, etype: str = "click") -> bytes:
    return json.dumps(
        {
            "event": etype,
            "on": "vehicle",
            "at": "2019-06-01T07:00:00.000Z",
            "data": {
                "id": eid,
                "location": {
                    "lat": 52.5,
                    "lng": 13.4,
                    "at": "2019-06-01T07:00:00.000Z",
                },
            },
        }
    ).encode()


def test_produce_consume_event_contract(live, spark, tmp_path):
    """Produce well-formed events + one corrupt payload, drive
    kafka_events_source through one availableNow micro-batch cycle, and
    assert the event-contract columns, corrupt-record quarantine, and
    kafka:// provenance coordinates all survive the REAL wire."""
    from door2door_etl_spark.streaming.sources import kafka_events_source

    bootstrap, (send, flush) = live
    topic = f"spark-graft-live-{uuid.uuid4().hex[:12]}"
    ids = [f"v-{i}" for i in range(5)]
    for eid in ids:
        send(topic, _event(eid))
    send(topic, b"{not json")
    flush()

    src = kafka_events_source(bootstrap, topic, starting_offsets="earliest")
    stream = src(spark)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_live_sink")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("kafka_live_sink").collect()
    assert len(out) == 6
    good = [r for r in out if r["_corrupt_record"] is None]
    bad = [r for r in out if r["_corrupt_record"] is not None]
    assert sorted(r["data"]["id"] for r in good) == sorted(ids)
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]
    for r in out:
        assert r["original_s3_file_path"].startswith(f"kafka://{topic}/")
        # replayable coordinate: topic/partition/offset, all integers
        _, part, off = r["original_s3_file_path"].rsplit("/", 2)
        int(part), int(off)
