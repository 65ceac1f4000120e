#!/usr/bin/env python
"""Live Kafka-source smoke for the streaming ingest path (SURVEY.md §2.1 S1).

The reference consumes Confluent Kafka JSON topics
(reference: config/flink/create.sql:72-121 — 7 topics, group-offset
resume, fetch caps); the rebuild's ``build_kafka_reader``
(datalakehouse_spark/streaming/jobs.py) is the same surface on Spark's
kafka connector, and the scored streaming entries run the identical
downstream plan off the file source (the unified-source design).
This probe closes the S1 loop the way the Iceberg probe
(tools/catalog_integration_smoke.py) closed §2.10: try every offline
channel for the connector jar AND a reachable broker, log exactly what
was attempted, and when both exist run a LIVE round-trip:

    batch kafka sink (3 JSON records) -> build_kafka_reader
    (availableNow drain into a memory sink) -> parse + assert.

Standalone: python tools/kafka_integration_smoke.py
Env: SPARK_GRAFT_KAFKA_JAR (connector jar or dir of jars),
     SPARK_GRAFT_KAFKA_BOOTSTRAP (default localhost:9092).
Exits 0 always in skip cases (the container ships neither jar nor
broker); prints KAFKA_SMOKE_OK only after the live assertions pass.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def resolve_kafka_connector() -> tuple[list[str] | None, list[str]]:
    """Try every offline channel for the spark-sql-kafka connector and
    its runtime deps (kafka-clients, commons-pool2, token-provider).
    Returns (jar list or None, attempt log)."""
    import glob

    log: list[str] = []
    env = os.environ.get("SPARK_GRAFT_KAFKA_JAR")
    if env:
        if os.path.isdir(env):
            jars = sorted(glob.glob(os.path.join(env, "*.jar")))
            if jars:
                log.append(f"env SPARK_GRAFT_KAFKA_JAR dir -> {len(jars)} jars (found)")
                return jars, log
            log.append(f"env SPARK_GRAFT_KAFKA_JAR dir has no jars: {env}")
        elif os.path.exists(env):
            log.append(f"env SPARK_GRAFT_KAFKA_JAR -> {env} (found)")
            return [env], log
        else:
            log.append(f"env SPARK_GRAFT_KAFKA_JAR set but missing: {env}")
    else:
        log.append("env SPARK_GRAFT_KAFKA_JAR: unset")

    roots = []
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        roots.append(os.path.join(spark_home, "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    roots += [
        os.path.expanduser("~/.ivy2/cache/org.apache.spark"),
        os.path.expanduser("~/.ivy2/jars"),
        os.path.expanduser("~/.m2/repository/org/apache/spark"),
    ]
    for root in roots:
        hits = sorted(
            glob.glob(os.path.join(root, "**", "*spark-sql-kafka*.jar"), recursive=True)
        )
        if hits:
            # the connector needs its companions from the same channel
            deps: list[str] = []
            for pat in ("*kafka-clients*.jar", "*commons-pool2*.jar",
                        "*spark-token-provider-kafka*.jar"):
                deps += glob.glob(os.path.join(root, "**", pat), recursive=True)
            log.append(f"{root}: {hits[-1]} (+{len(deps)} companion jars) (found)")
            return [hits[-1], *sorted(set(deps))], log
        log.append(
            f"{root}: no spark-sql-kafka jar"
            + ("" if os.path.isdir(root) else " (dir absent)")
        )

    import socket

    try:
        socket.create_connection(("repo1.maven.org", 443), timeout=3).close()
        log.append(
            "repo1.maven.org reachable: pass spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version> "
            "to the builder (not attempted automatically; jar cache preferred)"
        )
    except OSError as exc:
        log.append(
            "spark.jars.packages channel unavailable: repo1.maven.org "
            f"unreachable ({exc.__class__.__name__}: {exc}) and no local ivy/maven cache"
        )
    return None, log


def probe_broker(bootstrap: str) -> tuple[bool, str]:
    """TCP-connect probe of the bootstrap server — cheap and precise
    (a missing broker otherwise surfaces as a multi-minute consumer
    metadata timeout inside the JVM)."""
    import socket

    host, _, port = bootstrap.partition(":")
    try:
        socket.create_connection((host, int(port or 9092)), timeout=3).close()
        return True, f"broker {bootstrap}: reachable"
    except OSError as exc:
        return False, f"broker {bootstrap}: unreachable ({exc.__class__.__name__}: {exc})"


def main() -> int:
    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "localhost:9092")
    jars, attempts = resolve_kafka_connector()
    for line in attempts:
        print(f"RESOLVE: {line}")
    ok, broker_line = probe_broker(bootstrap)
    print(f"RESOLVE: {broker_line}")
    if jars is None:
        print("KAFKA_SMOKE_SKIP: no spark-sql-kafka connector jar resolvable")
        return 0
    if not ok:
        print("KAFKA_SMOKE_SKIP: connector jar present but no reachable broker")
        return 0

    import json
    import tempfile
    import uuid

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from datalakehouse_spark.streaming.jobs import build_kafka_reader

    topic = f"smoke_{uuid.uuid4().hex[:8]}"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka_integration_smoke")
        .config("spark.jars", ",".join(jars))
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rows = [
            {"event_id": i, "user_id": i * 10, "event_type": "view", "value": 1.5 * i}
            for i in range(3)
        ]
        produce = spark.createDataFrame(
            [(str(r["event_id"]), json.dumps(r)) for r in rows], "key string, value string"
        )
        (
            produce.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .save()
        )

        ckpt = tempfile.mkdtemp(prefix="kafka_smoke_ckpt_")
        parsed = (
            build_kafka_reader(spark, bootstrap, topic)
            .load()
            .select(
                F.col("key").cast("string").alias("key"),
                F.from_json(
                    F.col("value").cast("string"),
                    "event_id LONG, user_id LONG, event_type STRING, value DOUBLE",
                ).alias("j"),
            )
            .select("key", "j.*")
        )
        q = (
            parsed.writeStream.format("memory")
            .queryName("kafka_smoke")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError(
                "availableNow drain did not finish within 120s — broker "
                "slow/contended; partial-sink assertions would mislead"
            )
        got = {r.event_id: r for r in spark.sql("SELECT * FROM kafka_smoke").collect()}
        assert len(got) == 3, f"expected 3 records, got {len(got)}"
        assert got[2].value == 3.0 and got[2].event_type == "view", got[2]
        print("KAFKA_SMOKE_OK")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
