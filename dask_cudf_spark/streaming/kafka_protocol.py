"""Pure-Python Kafka wire protocol: codec, client, and an in-process
broker (the reference's custreamz Kafka source, upstream:
custreamz/kafka.py, re-expressed without the spark-sql-kafka jar).

Why this exists: this sandbox's pyspark ships no spark-sql-kafka
connector jar and has no network to fetch one (probed host-wide, round
7), so the classic ``format("kafka")`` source cannot be instantiated.
Spark 4's Python DataSource API removes the jar dependency entirely —
all it needs is a Python Kafka *client*, which this module provides by
speaking the public Kafka wire protocol (kafka.apache.org/protocol)
over plain TCP.  ``kafka_source.py`` wraps it in a
``DataSourceStreamReader``; ``InProcBroker`` below is a
protocol-faithful single-node broker used by the tests, so the client
is exercised against real request/response bytes, not a mock.

Versions are pinned to the oldest stable wire forms — RequestHeader
v1, ApiVersions v0, Metadata v0, Produce v0, Fetch v0, ListOffsets v0,
message format v1 (magic=1, CRC-32 over the message tail).  Verified
IN-PROCESS against ``InProcBroker`` only: these byte layouts follow
the published protocol spec that brokers since 0.10 serve, but no real
cluster has been exercised from this sandbox (no network).  Known
real-broker caveats for anyone pointing this at one: a modern broker
DOWN-CONVERTS record batches to magic-1 for a Fetch v0 consumer (extra
broker CPU, and fields newer than magic-1 — headers, control records —
are dropped), segments originally written as magic-0 carry no
timestamp and come back as ts = -1 (mapped to a NULL timestamp by
``kafka_source._read_range``), and compression codecs are out of scope
(attributes byte must be 0); a production client would negotiate
modern versions via ApiVersions instead of pinning.
"""

from __future__ import annotations

import socket
import struct
import threading
import time
import zlib
from dataclasses import dataclass, field

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

EARLIEST_TS = -2
LATEST_TS = -1

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3


class KafkaProtocolError(RuntimeError):
    """Broker returned a non-zero error_code."""

    def __init__(self, code: int, where: str):
        super().__init__(f"kafka error_code={code} in {where}")
        self.code = code


# ---------------------------------------------------------------- codec

class _Writer:
    __slots__ = ("parts",)

    def __init__(self) -> None:
        self.parts: list[bytes] = []

    def i8(self, v: int) -> None:
        self.parts.append(struct.pack(">b", v))

    def i16(self, v: int) -> None:
        self.parts.append(struct.pack(">h", v))

    def i32(self, v: int) -> None:
        self.parts.append(struct.pack(">i", v))

    def i64(self, v: int) -> None:
        self.parts.append(struct.pack(">q", v))

    def string(self, v: str | None) -> None:
        if v is None:
            self.i16(-1)
        else:
            raw = v.encode("utf-8")
            self.i16(len(raw))
            self.parts.append(raw)

    def bytes_(self, v: bytes | None) -> None:
        if v is None:
            self.i32(-1)
        else:
            self.i32(len(v))
            self.parts.append(v)

    def raw(self, v: bytes) -> None:
        self.parts.append(v)

    def done(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise EOFError("truncated kafka frame")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def bytes_(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self._take(n)

    def remaining(self) -> int:
        return len(self.buf) - self.pos


# ------------------------------------------------- message set (magic=1)

@dataclass(frozen=True)
class Record:
    offset: int
    timestamp_ms: int
    key: bytes | None
    value: bytes | None


def encode_message(offset: int, timestamp_ms: int, key: bytes | None,
                   value: bytes | None) -> bytes:
    """One v1 message set entry: [offset][size][crc][magic=1][attrs=0]
    [timestamp][key][value]; crc covers magic..end (spec: CRC-32 of the
    message bytes after the crc field)."""
    body = _Writer()
    body.i8(1)          # magic
    body.i8(0)          # attributes: no compression
    body.i64(timestamp_ms)
    body.bytes_(key)
    body.bytes_(value)
    tail = body.done()
    crc = zlib.crc32(tail) & 0xFFFFFFFF
    msg = struct.pack(">I", crc) + tail
    return struct.pack(">q", offset) + struct.pack(">i", len(msg)) + msg


def decode_message_set(buf: bytes) -> list[Record]:
    """Parse a (possibly tail-truncated) message set; brokers may cut
    the final entry at max_bytes, so a trailing partial entry is
    silently dropped per spec."""
    out: list[Record] = []
    pos = 0
    while pos + 12 <= len(buf):
        offset, size = struct.unpack_from(">qi", buf, pos)
        if pos + 12 + size > len(buf):
            break  # truncated trailing message
        msg = buf[pos + 12 : pos + 12 + size]
        pos += 12 + size
        (crc,) = struct.unpack_from(">I", msg, 0)
        tail = msg[4:]
        if zlib.crc32(tail) & 0xFFFFFFFF != crc:
            raise KafkaProtocolError(-1, f"crc mismatch at offset {offset}")
        r = _Reader(tail)
        magic = r.i8()
        attrs = r.i8()
        if attrs & 0x07:
            raise KafkaProtocolError(-1, "compressed message sets unsupported")
        ts = r.i64() if magic >= 1 else -1
        key = r.bytes_()
        value = r.bytes_()
        out.append(Record(offset, ts, key, value))
    return out


# ----------------------------------------------------------- framing

def _send_frame(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack(">i", len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        chunk = sock.recv(n)
        if not chunk:
            raise ConnectionError("kafka peer closed connection")
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


def _recv_frame(sock: socket.socket) -> bytes:
    (size,) = struct.unpack(">i", _recv_exact(sock, 4))
    return _recv_exact(sock, size)


# ------------------------------------------------------------- client

class KafkaClient:
    """Minimal blocking client over one TCP connection.  Each public
    method is one request/response round trip; correlation ids are
    checked.  Instances are cheap — Spark-side code opens one per task
    rather than pickling sockets."""

    def __init__(self, bootstrap: str, client_id: str = "dask-cudf-spark",
                 timeout_s: float = 30.0):
        host, _, port = bootstrap.rpartition(":")
        self._sock = socket.create_connection((host, int(port)), timeout=timeout_s)
        self._client_id = client_id
        self._corr = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "KafkaClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _call(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        self._corr += 1
        w = _Writer()
        w.i16(api_key)
        w.i16(api_version)
        w.i32(self._corr)
        w.string(self._client_id)
        w.raw(body)
        _send_frame(self._sock, w.done())
        r = _Reader(_recv_frame(self._sock))
        corr = r.i32()
        if corr != self._corr:
            raise KafkaProtocolError(-1, f"correlation id {corr} != {self._corr}")
        return r

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._call(API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise KafkaProtocolError(err, "api_versions")
        out = {}
        for _ in range(r.i32()):
            key, lo, hi = r.i16(), r.i16(), r.i16()
            out[key] = (lo, hi)
        return out

    def metadata(self, topics: list[str] | None = None) -> dict:
        w = _Writer()
        names = topics or []
        w.i32(len(names))
        for t in names:
            w.string(t)
        r = self._call(API_METADATA, 0, w.done())
        brokers = []
        for _ in range(r.i32()):
            node = r.i32()
            host = r.string()
            port = r.i32()
            brokers.append({"node_id": node, "host": host, "port": port})
        topics_out = {}
        for _ in range(r.i32()):
            terr = r.i16()
            name = r.string()
            parts = {}
            for _ in range(r.i32()):
                perr = r.i16()
                pid = r.i32()
                leader = r.i32()
                replicas = [r.i32() for _ in range(r.i32())]
                isr = [r.i32() for _ in range(r.i32())]
                parts[pid] = {"error": perr, "leader": leader,
                              "replicas": replicas, "isr": isr}
            topics_out[name] = {"error": terr, "partitions": parts}
        return {"brokers": brokers, "topics": topics_out}

    def list_offsets(self, topic: str, partition: int, timestamp: int) -> int:
        """EARLIEST_TS -> log start offset; LATEST_TS -> high watermark."""
        w = _Writer()
        w.i32(-1)  # replica_id
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        w.i64(timestamp)
        w.i32(1)  # max_num_offsets
        r = self._call(API_LIST_OFFSETS, 0, w.done())
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                offsets = [r.i64() for _ in range(r.i32())]
                if err:
                    raise KafkaProtocolError(err, "list_offsets")
                return offsets[0]
        raise KafkaProtocolError(-1, "list_offsets: empty response")

    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes | None]],
                timestamp_ms: int | None = None) -> int:
        """Append records to one partition; returns the base offset.
        Producer-side offsets in the message set are relative
        placeholders (the broker assigns real ones, spec behavior)."""
        ts = int(time.time() * 1000) if timestamp_ms is None else timestamp_ms
        mset = b"".join(
            encode_message(i, ts, k, v) for i, (k, v) in enumerate(records)
        )
        w = _Writer()
        w.i16(-1)   # acks: all
        w.i32(30000)
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        w.bytes_(mset)
        r = self._call(API_PRODUCE, 0, w.done())
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                base = r.i64()
                if err:
                    raise KafkaProtocolError(err, "produce")
                return base
        raise KafkaProtocolError(-1, "produce: empty response")

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20, max_wait_ms: int = 0) -> tuple[list[Record], int]:
        """One fetch round trip from ``offset``; returns (records,
        high_watermark).  Records below ``offset`` can appear when the
        broker returns a whole batch (spec) — caller filters."""
        w = _Writer()
        w.i32(-1)
        w.i32(max_wait_ms)
        w.i32(0)  # min_bytes: return immediately
        w.i32(1)
        w.string(topic)
        w.i32(1)
        w.i32(partition)
        w.i64(offset)
        w.i32(max_bytes)
        r = self._call(API_FETCH, 0, w.done())
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                hwm = r.i64()
                mset = r.bytes_() or b""
                if err:
                    raise KafkaProtocolError(err, "fetch")
                return [rec for rec in decode_message_set(mset)
                        if rec.offset >= offset], hwm
        raise KafkaProtocolError(-1, "fetch: empty response")

    def fetch_range(self, topic: str, partition: int, start: int, end: int,
                    max_bytes: int = 1 << 20) -> list[Record]:
        """All records with start <= offset < end, looping fetches —
        the exactly-once read path a micro-batch task runs."""
        out: list[Record] = []
        offset = start
        while offset < end:
            recs, _hwm = self.fetch(topic, partition, offset, max_bytes)
            recs = [rec for rec in recs if rec.offset < end]
            if not recs:
                raise KafkaProtocolError(
                    ERR_OFFSET_OUT_OF_RANGE,
                    f"fetch_range stuck at {topic}/{partition}@{offset}<{end}",
                )
            out.extend(recs)
            offset = recs[-1].offset + 1
        return out


# ------------------------------------------------------------- broker

@dataclass
class _PartitionLog:
    records: list[Record] = field(default_factory=list)

    @property
    def high_watermark(self) -> int:
        return len(self.records)


class InProcBroker:
    """Single-node, in-memory Kafka broker speaking the same pinned
    wire versions — enough protocol for produce/fetch/offsets/metadata
    so the client and the Spark source are tested against real bytes.
    Topics auto-create on first produce or metadata request with
    ``num_partitions``.  Thread-per-connection; daemon threads so a
    forgotten broker never blocks interpreter exit."""

    def __init__(self, num_partitions: int = 2, host: str = "127.0.0.1"):
        self.num_partitions = num_partitions
        self._logs: dict[tuple[str, int], _PartitionLog] = {}
        self._topics: dict[str, int] = {}
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, 0))
        self._srv.listen(64)
        self.host = host
        self.port = self._srv.getsockname()[1]
        self._closed = False
        self._accept_thread = threading.Thread(
            target=self._accept_loop, name="kafka-inproc-accept", daemon=True
        )
        self._accept_thread.start()

    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def close(self) -> None:
        self._closed = True
        try:
            self._srv.close()
        except OSError:
            pass

    def __enter__(self) -> "InProcBroker":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- test/production helpers (server-side API, not wire) --

    def ensure_topic(self, topic: str, num_partitions: int | None = None) -> None:
        with self._lock:
            if topic not in self._topics:
                n = num_partitions or self.num_partitions
                self._topics[topic] = n
                for p in range(n):
                    self._logs[(topic, p)] = _PartitionLog()

    # -- wire handling --

    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve, args=(conn,),
                name="kafka-inproc-conn", daemon=True,
            ).start()

    def _serve(self, conn: socket.socket) -> None:
        try:
            while True:
                req = _Reader(_recv_frame(conn))
                api_key = req.i16()
                api_version = req.i16()
                corr = req.i32()
                req.string()  # client_id
                body = self._dispatch(api_key, api_version, req)
                _send_frame(conn, struct.pack(">i", corr) + body)
        except (ConnectionError, EOFError, OSError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _dispatch(self, api_key: int, api_version: int, req: _Reader) -> bytes:
        if api_version != 0:
            raise KafkaProtocolError(-1, f"api {api_key} v{api_version} unsupported")
        if api_key == API_VERSIONS:
            return self._handle_api_versions()
        if api_key == API_METADATA:
            return self._handle_metadata(req)
        if api_key == API_PRODUCE:
            return self._handle_produce(req)
        if api_key == API_FETCH:
            return self._handle_fetch(req)
        if api_key == API_LIST_OFFSETS:
            return self._handle_list_offsets(req)
        raise KafkaProtocolError(-1, f"api key {api_key} unsupported")

    def _handle_api_versions(self) -> bytes:
        w = _Writer()
        w.i16(ERR_NONE)
        apis = [API_PRODUCE, API_FETCH, API_LIST_OFFSETS, API_METADATA, API_VERSIONS]
        w.i32(len(apis))
        for key in apis:
            w.i16(key)
            w.i16(0)
            w.i16(0)
        return w.done()

    def _handle_metadata(self, req: _Reader) -> bytes:
        names = [req.string() for _ in range(req.i32())]
        for name in names:
            if name:
                self.ensure_topic(name)  # v0 auto-create semantics
        with self._lock:
            snapshot = dict(self._topics)
        if names:
            snapshot = {n: p for n, p in snapshot.items() if n in names}
        w = _Writer()
        w.i32(1)        # brokers
        w.i32(0)        # node_id
        w.string(self.host)
        w.i32(self.port)
        w.i32(len(snapshot))
        for name, nparts in sorted(snapshot.items()):
            w.i16(ERR_NONE)
            w.string(name)
            w.i32(nparts)
            for p in range(nparts):
                w.i16(ERR_NONE)
                w.i32(p)
                w.i32(0)    # leader = node 0
                w.i32(1)    # replicas
                w.i32(0)
                w.i32(1)    # isr
                w.i32(0)
        return w.done()

    def _handle_produce(self, req: _Reader) -> bytes:
        req.i16()  # acks
        req.i32()  # timeout
        results: list[tuple[str, int, int, int]] = []
        for _ in range(req.i32()):
            topic = req.string() or ""
            for _ in range(req.i32()):
                pid = req.i32()
                mset = req.bytes_() or b""
                self.ensure_topic(topic)
                log = self._logs.get((topic, pid))
                if log is None:
                    results.append((topic, pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1))
                    continue
                records = decode_message_set(mset)
                with self._lock:
                    base = log.high_watermark
                    for i, rec in enumerate(records):
                        log.records.append(
                            Record(base + i, rec.timestamp_ms, rec.key, rec.value)
                        )
                results.append((topic, pid, ERR_NONE, base))
        w = _Writer()
        by_topic: dict[str, list[tuple[int, int, int]]] = {}
        for topic, pid, err, base in results:
            by_topic.setdefault(topic, []).append((pid, err, base))
        w.i32(len(by_topic))
        for topic, parts in by_topic.items():
            w.string(topic)
            w.i32(len(parts))
            for pid, err, base in parts:
                w.i32(pid)
                w.i16(err)
                w.i64(base)
        return w.done()

    def _handle_fetch(self, req: _Reader) -> bytes:
        req.i32()  # replica_id
        req.i32()  # max_wait
        req.i32()  # min_bytes
        w = _Writer()
        ntopics = req.i32()
        w.i32(ntopics)
        for _ in range(ntopics):
            topic = req.string() or ""
            w.string(topic)
            nparts = req.i32()
            w.i32(nparts)
            for _ in range(nparts):
                pid = req.i32()
                fetch_offset = req.i64()
                max_bytes = req.i32()
                log = self._logs.get((topic, pid))
                w.i32(pid)
                if log is None:
                    w.i16(ERR_UNKNOWN_TOPIC_OR_PARTITION)
                    w.i64(-1)
                    w.bytes_(b"")
                    continue
                with self._lock:
                    hwm = log.high_watermark
                    records = log.records[fetch_offset:]
                if fetch_offset > hwm:
                    w.i16(ERR_OFFSET_OUT_OF_RANGE)
                    w.i64(hwm)
                    w.bytes_(b"")
                    continue
                chunks: list[bytes] = []
                size = 0
                for rec in records:
                    enc = encode_message(rec.offset, rec.timestamp_ms,
                                         rec.key, rec.value)
                    if size + len(enc) > max_bytes and chunks:
                        break
                    chunks.append(enc)
                    size += len(enc)
                w.i16(ERR_NONE)
                w.i64(hwm)
                w.bytes_(b"".join(chunks))
        return w.done()

    def _handle_list_offsets(self, req: _Reader) -> bytes:
        req.i32()  # replica_id
        w = _Writer()
        ntopics = req.i32()
        w.i32(ntopics)
        for _ in range(ntopics):
            topic = req.string() or ""
            w.string(topic)
            nparts = req.i32()
            w.i32(nparts)
            for _ in range(nparts):
                pid = req.i32()
                ts = req.i64()
                req.i32()  # max_num_offsets
                log = self._logs.get((topic, pid))
                w.i32(pid)
                if log is None:
                    w.i16(ERR_UNKNOWN_TOPIC_OR_PARTITION)
                    w.i32(0)
                    continue
                with self._lock:
                    hwm = log.high_watermark
                offset = 0 if ts == EARLIEST_TS else hwm
                w.i16(ERR_NONE)
                w.i32(1)
                w.i64(offset)
        return w.done()
