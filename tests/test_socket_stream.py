"""Live network streaming ingest over Spark's built-in socket source.

The reference's S1 is Kafka JSON consumption (create.sql:72-121); the
container ships no Kafka jar/broker (documented by
tools/kafka_integration_smoke.py), so this test closes the
LIVE-NETWORK half with the connector Spark bundles: a real in-process
TCP server feeds JSON lines to ``build_socket_reader`` and the SAME
from_json parse + malformed-split shape the Kafka/file paths use runs
downstream — proving the unified-source design against an actual
socket, not just files.
"""

import json
import socketserver
import threading
import time

from pyspark.sql import functions as F


class _Feeder(socketserver.BaseRequestHandler):
    ROWS = [
        {"event_id": 1, "user_id": 10, "event_type": "view", "value": 1.5},
        {"event_id": 2, "user_id": 20, "event_type": "purchase", "value": 9.99},
        "this is not json",  # malformed line -> DLQ split must catch it
        {"event_id": 3, "user_id": 10, "event_type": "view", "value": 0.5},
    ]

    def handle(self):
        payload = "".join(
            (r if isinstance(r, str) else json.dumps(r)) + "\n" for r in self.ROWS
        )
        self.request.sendall(payload.encode())
        # keep the connection up while the micro-batches drain; Spark's
        # socket source treats EOF as end-of-stream
        time.sleep(30)


def test_socket_source_json_ingest_with_malformed_split(spark):
    from datalakehouse_spark.streaming.jobs import build_socket_reader

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Feeder)
    server.daemon_threads = True
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        schema = "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
        parsed = (
            build_socket_reader(spark, "127.0.0.1", port)
            .load()
            .select(F.col("value").alias("raw"), F.from_json("value", schema).alias("j"))
            .select("raw", "j.*")
        )
        q = (
            parsed.writeStream.format("memory")
            .queryName("socket_smoke")
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT * FROM socket_smoke").count() >= 4:
                break
            time.sleep(1)
        q.stop()
        rows = spark.sql("SELECT * FROM socket_smoke").collect()
    finally:
        server.shutdown()
        server.server_close()

    good = {r.event_id: r for r in rows if r.event_id is not None}
    bad = [r for r in rows if r.event_id is None]
    assert set(good) == {1, 2, 3}, rows
    assert good[2].value == 9.99 and good[2].event_type == "purchase"
    # the malformed line survives as raw payload with NULL parse — the
    # exact split dlq_split keys on (ST4)
    assert len(bad) == 1 and bad[0].raw == "this is not json"
