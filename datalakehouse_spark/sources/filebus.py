"""filebus — a pure-Python STREAMING DataSource with Kafka's API shape.

Closes the live half of SURVEY §2 S1 (reference create.sql:72-121):
the container ships no spark-sql-kafka jar or broker, so until now the
real ``spark.readStream.format(...)`` code path — option parsing,
offset tracking, checkpoint resume, per-partition parallel reads —
could only be *described*, never executed.  PySpark 4's Python
DataSource V2 API (``pyspark.sql.datasource``) lets the engine ship a
broker-shaped source in pure stdlib:

- a **topic** is a directory of append-only JSONL partition logs
  (``<root>/<topic>/p00000/log.jsonl``), the moral equivalent of a
  Kafka partition segment;
- the **offset** of a record is its line number in its partition log —
  monotonic, dense, replayable, exactly Kafka's offset contract;
- the source registers under ``format("filebus")`` and accepts the
  SAME option surface ``build_kafka_reader`` emits for Kafka:
  ``kafka.bootstrap.servers`` (reinterpreted as the bus root
  directory), ``subscribe``, ``startingOffsets`` (earliest/latest),
  ``maxOffsetsPerTrigger`` (proportional per-partition admission cap,
  Kafka's split rule) — so the production builder runs UNCHANGED but
  for the format name;
- the output schema is Kafka's wire schema (key/value BINARY, topic,
  partition, offset, timestamp, timestampType), so the downstream
  ``value.cast(string)`` → ``from_json`` → DLQ-split plan is
  byte-for-byte the plan a real Kafka deployment runs;
- offsets move through Spark's checkpoint like any V2 source:
  group-offsets resume (create.sql:110 ``scan.startup.mode`` =
  group-offsets) is the checkpoint restart, earliest fallback is
  ``startingOffsets=earliest`` on a fresh checkpoint.

Scale posture: ``partitions()`` hands one InputPartition per
topic-partition slice, and ``read()`` runs on EXECUTORS — parallelism
is the topic's partition count, as with Kafka.  Reading a slice scans
its log file from the top (line offsets, not byte offsets); a
production log store would add segment files + a sparse byte-offset
index exactly as Kafka does.  The emulator exists to exercise the
engine's streaming contract; the 100 TB path swaps the format string
back to ``kafka``.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Kafka source wire schema — what readStream.format("kafka") yields.
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

_LOG_NAME = "log.jsonl"


def _partition_dirs(root: str, topic: str) -> list[str]:
    tdir = os.path.join(root, topic)
    if not os.path.isdir(tdir):
        raise ValueError(f"filebus topic {topic!r} does not exist under {root!r}")
    return sorted(
        os.path.join(tdir, d) for d in os.listdir(tdir) if d.startswith("p")
    )


def _end_offsets(root: str, topic: str) -> dict[str, int]:
    """Current end offset (line count) per partition id string."""
    out: dict[str, int] = {}
    for pdir in _partition_dirs(root, topic):
        pid = str(int(os.path.basename(pdir)[1:]))
        log = os.path.join(pdir, _LOG_NAME)
        n = 0
        if os.path.exists(log):
            with open(log, "rb") as fh:
                n = sum(1 for _ in fh)
        out[pid] = n
    return out


class FileBusProducer:
    """Append-only producer onto a directory-backed topic log.

    ``send`` routes by md5(key) % partitions when a key is given
    (Kafka's sticky key→partition contract, deterministic across
    processes/engines), else round-robins.  ``ts`` is the record's
    event timestamp (epoch micros); callers pass it explicitly so
    logs are replay-deterministic — there is no hidden wall clock.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        self._rr = 0

    def create_topic(self, topic: str, partitions: int = 3) -> None:
        for p in range(partitions):
            os.makedirs(os.path.join(self.root, topic, f"p{p:05d}"), exist_ok=True)

    def send(
        self,
        topic: str,
        value: str | bytes,
        key: str | bytes | None = None,
        ts_us: int = 0,
        partition: int | None = None,
    ) -> None:
        pdirs = _partition_dirs(self.root, topic)
        if partition is None:
            if key is not None:
                kb = key.encode() if isinstance(key, str) else key
                partition = int.from_bytes(
                    hashlib.md5(kb).digest()[:4], "big"
                ) % len(pdirs)
            else:
                partition = self._rr % len(pdirs)
                self._rr += 1
        vb = value if isinstance(value, bytes) else value.encode()
        kb = None if key is None else (key if isinstance(key, bytes) else key.encode())
        rec = {
            "key": None if kb is None else kb.decode("latin-1"),
            "value": vb.decode("latin-1"),
            "ts_us": ts_us,
        }
        log = os.path.join(pdirs[partition], _LOG_NAME)
        with open(log, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(rec) + "\n")


class _Slice(InputPartition):
    def __init__(self, log_path: str, topic: str, pid: int, start: int, end: int):
        self.log_path = log_path
        self.topic = topic
        self.pid = pid
        self.start = start
        self.end = end


def _read_slice(s: _Slice) -> Iterator[tuple]:
    """Executor-side: yield Kafka-wire tuples for log lines
    [start, end).  Runs wherever Spark schedules the partition."""
    if s.end <= s.start or not os.path.exists(s.log_path):
        return
    with open(s.log_path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            if i < s.start:
                continue
            if i >= s.end:
                break
            rec = json.loads(line)
            key = rec.get("key")
            yield (
                None if key is None else key.encode("latin-1"),
                rec["value"].encode("latin-1"),
                s.topic,
                s.pid,
                i,
                dt.datetime.fromtimestamp(
                    rec.get("ts_us", 0) / 1_000_000, dt.timezone.utc
                ).replace(tzinfo=None),
                0,
            )


class FileBusStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batch reader (the Kafka consumer analog).

    Offsets are dicts {partition_id_str: next_line}; Spark serializes
    them into the checkpoint, giving group-offsets resume for free.
    ``maxOffsetsPerTrigger`` caps each micro-batch's admission,
    distributed across partitions proportionally to backlog — Kafka's
    own split rule.

    **Restart safety** (ADVICE r10): the admission base must never sit
    below the checkpointed start, or a capped first-post-restart batch
    would plan an end BELOW the checkpoint — partitions() would skip
    it, the offset log would regress, and the next batch would re-read
    committed records.  Three defenses, layered:

    * ``commit(end)`` persists committed offsets broker-side
      (``<topic>/_consumer_offsets/<group>.json``, atomic rename) —
      the literal Kafka group-offsets store; a fresh reader instance
      seeds its base from it (group id from ``kafka.group.id``,
      Kafka's own option key);
    * every offset dict Spark hands us (``partitions`` start/end,
      ``commit`` end) raises an in-memory floor, covering the
      restart-with-uncommitted-batch replay where ``partitions`` runs
      before any ``latestOffset``;
    * admitted offsets are clamped element-wise to ``>= base`` and the
      base itself to ``<= cur`` (a truncated/recreated log must not
      plan ends past EOF, which would skip later appends).

    **Trigger.AvailableNow analog**: Spark's PythonMicroBatchStream
    does not implement SupportsTriggerAvailableNow (passing
    ``trigger(availableNow=True)`` falls back to one uncapped batch,
    with a warning).  ``filebus.snapshot=true`` gives the same
    contract under a processing-time trigger: the first
    ``latestOffset`` call snapshots the topic's end offsets, every
    later call is clamped to the snapshot, so a
    ``query.processAllAvailable()`` drain terminates deterministically
    after ceil(backlog/cap) capped micro-batches and never admits
    records produced after the stream started."""

    def __init__(self, options) -> None:
        self.root = options.get("kafka.bootstrap.servers") or options.get("path")
        if not self.root:
            raise ValueError(
                "filebus requires kafka.bootstrap.servers (bus root dir) or path"
            )
        topic = options.get("subscribe")
        if not topic:
            raise ValueError("filebus requires subscribe=<topic>")
        self.topic = topic
        self.starting = (options.get("startingOffsets") or "earliest").lower()
        cap = options.get("maxOffsetsPerTrigger")
        self.cap = int(cap) if cap else None
        self.group = options.get("kafka.group.id") or "filebus-default"
        self.snapshot_mode = (options.get("filebus.snapshot") or "").lower() in (
            "true",
            "1",
        )
        self._snapshot: dict[str, int] | None = None
        self._last_end: dict[str, int] | None = None
        #: floor learned from Spark's own calls (checkpointed starts /
        #: planned+committed ends) — admission may never end below it
        self._floor: dict[str, int] = {}

    # -- broker-side committed-offset store (Kafka __consumer_offsets) --

    def _offsets_path(self) -> str:
        return os.path.join(
            self.root, self.topic, "_consumer_offsets", f"{self.group}.json"
        )

    def _load_committed(self) -> dict[str, int]:
        try:
            with open(self._offsets_path(), encoding="utf-8") as fh:
                return {str(k): int(v) for k, v in json.load(fh).items()}
        except (OSError, ValueError):
            return {}

    def _store_committed(self, end: dict) -> None:
        path = self._offsets_path()
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump({str(k): int(v) for k, v in end.items()}, fh)
            os.replace(tmp, path)  # atomic on POSIX
        except OSError:
            pass  # the store is an optimization; the checkpoint is truth

    def _raise_floor(self, offs: dict) -> None:
        for p, v in offs.items():
            p = str(p)
            if int(v) > self._floor.get(p, 0):
                self._floor[p] = int(v)

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return _end_offsets(self.root, self.topic)
        return {pid: 0 for pid in _end_offsets(self.root, self.topic)}

    def latestOffset(self) -> dict:
        cur = _end_offsets(self.root, self.topic)
        if self.snapshot_mode:
            if self._snapshot is None:
                self._snapshot = dict(cur)
            cur = {p: min(cur.get(p, 0), self._snapshot.get(p, 0)) for p in cur}
        if self._last_end is None:
            # fresh reader instance: seed the base from the broker-side
            # group offsets so a clean restart with backlog > cap can't
            # plan below the checkpointed start
            self._raise_floor(self._load_committed())
        base = dict(self._last_end or self.initialOffset())
        for p in cur:
            base[p] = max(base.get(p, 0), self._floor.get(p, 0))
            base[p] = min(base[p], cur[p])  # never plan past EOF
        if self.cap is None:
            admitted = {p: max(cur[p], base.get(p, 0)) for p in cur}
            self._last_end = admitted
            return admitted
        backlog = {p: max(cur[p] - base.get(p, 0), 0) for p in cur}
        total = sum(backlog.values())
        if total <= self.cap:
            admitted = {p: max(cur[p], base.get(p, 0)) for p in cur}
        else:
            # proportional admission, remainder to the largest backlogs
            share = {
                p: base.get(p, 0) + (backlog[p] * self.cap) // total for p in cur
            }
            left = self.cap - sum(share[p] - base.get(p, 0) for p in cur)
            for p in sorted(cur, key=lambda x: backlog[x], reverse=True):
                if left <= 0:
                    break
                if share[p] < cur[p]:
                    share[p] += 1
                    left -= 1
            admitted = share
        self._last_end = admitted
        return admitted

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Spark's starts/ends are authoritative (offset-log replay on
        # restart lands here before any latestOffset call) — absorb
        # them into the admission floor
        self._raise_floor(start)
        self._raise_floor(end)
        out = []
        for pdir in _partition_dirs(self.root, self.topic):
            pid = str(int(os.path.basename(pdir)[1:]))
            s, e = int(start.get(pid, 0)), int(end.get(pid, 0))
            if e > s:
                out.append(
                    _Slice(
                        os.path.join(pdir, _LOG_NAME), self.topic, int(pid), s, e
                    )
                )
        # Spark requires at least one partition per micro-batch
        return out or [
            _Slice(os.path.join(self.root, self.topic, "_empty"), self.topic, 0, 0, 0)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        # checkpoint holds the offsets Spark trusts; mirror them into
        # the broker-side group-offset store so the NEXT reader
        # instance (query restart) seeds its admission base correctly
        self._raise_floor(end)
        self._store_committed(self._floor)


class FileBusBatchReader(DataSourceReader):
    """Batch read of a whole topic (Kafka's batch `read.format("kafka")`
    twin) — one InputPartition per topic-partition."""

    def __init__(self, options) -> None:
        self.stream = FileBusStreamReader(options)

    def partitions(self) -> Sequence[InputPartition]:
        end = _end_offsets(self.stream.root, self.stream.topic)
        return self.stream.partitions({p: 0 for p in end}, end)

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return _read_slice(partition)


class FileBusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "filebus"

    def schema(self) -> StructType:
        return KAFKA_WIRE_SCHEMA

    def streamReader(self, schema: StructType) -> FileBusStreamReader:
        return FileBusStreamReader(self.options)

    def reader(self, schema: StructType) -> FileBusBatchReader:
        return FileBusBatchReader(self.options)


def register_filebus(spark) -> None:
    """Idempotent registration of the filebus format on a session.

    The DataSource class is registered for BY-VALUE cloudpickle
    serialization first: Spark's ``python_streaming_source_runner``
    (the driver-side offset-management process for Python streaming
    sources) is launched WITHOUT the session's addPyFile/userFiles
    sys.path entries, so a by-reference pickle of this class dies there
    with ModuleNotFoundError whenever the repo is only on the driver's
    sys.path — exactly how the correctness driver invokes us (caught by
    a /tmp-cwd vanilla-session verify, round 11).  By-value pickling
    makes the class and this module's helper functions self-contained;
    executor-side ``read()`` work needs no import either."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(FileBusDataSource)
