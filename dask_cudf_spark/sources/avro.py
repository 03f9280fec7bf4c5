"""Pure-stdlib Avro object-container reader — the jar-free fallback
behind :func:`dask_cudf_spark.sources.readers.read_avro` (upstream:
python/cudf/cudf/io/avro.py wraps libcudf's native reader; Spark's own
path needs the spark-avro datasource jar, absent from this sandbox's
classpath — probed round 2).

Everything here is implemented from the PUBLIC Avro 1.x specification
(container file format: magic ``Obj\\x01``, metadata map with
``avro.schema``/``avro.codec``, 16-byte sync marker, then blocks of
``(record count, byte size, records, sync)``; binary encoding: zigzag
varints for int/long, little-endian IEEE for float/double,
length-prefixed bytes/string, index-prefixed unions, block-encoded
arrays/maps).  Codecs: ``null`` and ``deflate`` (raw DEFLATE, i.e.
zlib wbits=-15).

Scale shape: schema is parsed ONCE from one file's header
(driver-side), then decoding is distributed — ``binaryFile`` scan ->
Arrow-batched ``mapInPandas``, one task per file split, workers touch
only stdlib (json/zlib/struct).  The decoder is built by a FACTORY so
the closure pickles BY VALUE (see functions/porter.build_porter_stem:
workers may not be able to import this package).

A minimal writer (:func:`write_avro_file`) ships alongside for tests
and small exports; it is driver-side only.
"""

from __future__ import annotations

import json
from typing import Any

MAGIC = b"Obj\x01"


def build_avro_decoder():
    """Factory returning ``decode(buf: bytes) -> (schema_json, rows)``
    for an Avro object-container file.  Self-contained closure: safe to
    ship inside Spark Python UDFs."""
    import json as _json
    import struct as _struct
    import zlib as _zlib

    def _varlong(buf, pos):
        shift = 0
        acc = 0
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1), pos  # zigzag

    def _bytes(buf, pos):
        n, pos = _varlong(buf, pos)
        return buf[pos : pos + n], pos + n

    def _decode_value(buf, pos, schema):
        if isinstance(schema, list):  # union: long index then branch
            idx, pos = _varlong(buf, pos)
            return _decode_value(buf, pos, schema[idx])
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                out = {}
                for f in schema["fields"]:
                    out[f["name"]], pos = _decode_value(buf, pos, f["type"])
                return out, pos
            if t == "array":
                items = []
                while True:
                    n, pos = _varlong(buf, pos)
                    if n == 0:
                        break
                    if n < 0:  # block with byte size
                        _, pos = _varlong(buf, pos)
                        n = -n
                    for _ in range(n):
                        v, pos = _decode_value(buf, pos, schema["items"])
                        items.append(v)
                return items, pos
            if t == "map":
                out = {}
                while True:
                    n, pos = _varlong(buf, pos)
                    if n == 0:
                        break
                    if n < 0:
                        _, pos = _varlong(buf, pos)
                        n = -n
                    for _ in range(n):
                        k, pos = _bytes(buf, pos)
                        v, pos = _decode_value(buf, pos, schema["values"])
                        out[k.decode("utf-8")] = v
                return out, pos
            if t == "enum":
                idx, pos = _varlong(buf, pos)
                return schema["symbols"][idx], pos
            if t == "fixed":
                n = schema["size"]
                return bytes(buf[pos : pos + n]), pos + n
            return _decode_value(buf, pos, t)  # {"type": "long", ...}
        if schema == "null":
            return None, pos
        if schema == "boolean":
            return buf[pos] != 0, pos + 1
        if schema in ("int", "long"):
            return _varlong(buf, pos)
        if schema == "float":
            return _struct.unpack_from("<f", buf, pos)[0], pos + 4
        if schema == "double":
            return _struct.unpack_from("<d", buf, pos)[0], pos + 8
        if schema == "bytes":
            b, pos = _bytes(buf, pos)
            return bytes(b), pos
        if schema == "string":
            b, pos = _bytes(buf, pos)
            return b.decode("utf-8"), pos
        raise ValueError(f"unsupported avro type: {schema!r}")

    def decode(buf: bytes):
        if buf[:4] != b"Obj\x01":
            raise ValueError("not an Avro object-container file (bad magic)")
        pos = 4
        meta = {}
        while True:  # metadata map
            n, pos = _varlong(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _varlong(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _bytes(buf, pos)
                v, pos = _bytes(buf, pos)
                meta[k.decode("utf-8")] = bytes(v)
        sync = bytes(buf[pos : pos + 16])
        pos += 16
        schema = _json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        rows = []
        while pos < len(buf):
            count, pos = _varlong(buf, pos)
            size, pos = _varlong(buf, pos)
            block = buf[pos : pos + size]
            pos += size
            if codec == "deflate":
                block = _zlib.decompress(block, -15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec: {codec}")
            bpos = 0
            for _ in range(count):
                v, bpos = _decode_value(block, bpos, schema)
                rows.append(v)
            if bytes(buf[pos : pos + 16]) != sync:
                raise ValueError("avro sync marker mismatch (corrupt file)")
            pos += 16
        return schema, rows

    return decode


# --------------------------------------------------------- spark schema


def _logical(schema: Any) -> str | None:
    if isinstance(schema, dict):
        return schema.get("logicalType")
    return None


def avro_schema_to_spark(schema: Any):
    """Map an Avro schema (parsed JSON) to a Spark StructType.  Unions
    with ``null`` mark the field nullable; logical types
    timestamp-micros/millis -> TimestampType, date -> DateType."""
    from pyspark.sql import types as T

    def field_type(s):
        if isinstance(s, list):
            branches = [b for b in s if b != "null"]
            if len(branches) != 1:
                raise ValueError(f"unsupported avro union: {s!r}")
            dt, _ = field_type(branches[0])
            return dt, True
        if isinstance(s, dict):
            t = s["type"]
            lt = s.get("logicalType")
            if t == "record":
                return (
                    T.StructType(
                        [
                            T.StructField(f["name"], *field_type(f["type"]))
                            for f in s["fields"]
                        ]
                    ),
                    False,
                )
            if t == "array":
                dt, nullable = field_type(s["items"])
                return T.ArrayType(dt, containsNull=nullable), False
            if t == "map":
                dt, nullable = field_type(s["values"])
                return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
            if t == "enum":
                return T.StringType(), False
            if t == "fixed":
                return T.BinaryType(), False
            if t == "long" and lt in ("timestamp-micros", "timestamp-millis"):
                return T.TimestampType(), False
            if t == "int" and lt == "date":
                return T.DateType(), False
            return field_type(t)
        simple = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        if s in simple:
            return simple[s], False
        raise ValueError(f"unsupported avro type: {s!r}")

    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("top-level avro schema must be a record")
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField(f["name"], *field_type(f["type"])) for f in schema["fields"]]
    )


def _ts_columns(schema: Any) -> dict[str, str]:
    """name -> 'us'|'ms'|'date' for top-level logical time fields (the
    decoder yields raw ints; pandas conversion happens per batch).

    NESTED logical time types (inside records/arrays/maps) are
    REJECTED: avro_schema_to_spark would map them to Timestamp/Date,
    but the decoder's raw ints would then be misinterpreted by Arrow
    (millis read as micros -> silently 1000x off, round-4 review
    finding).  Failing loudly beats a silently wrong timestamp."""
    def check_nested(s, path):
        if isinstance(s, list):
            for b in s:
                check_nested(b, path)
        elif isinstance(s, dict):
            if s.get("logicalType") in (
                "timestamp-micros", "timestamp-millis", "date"
            ):
                raise ValueError(
                    f"nested Avro logical time type at {path} is not "
                    "supported by the jar-free fallback reader (top-level "
                    "fields only)"
                )
            t = s.get("type")
            if t == "record":
                for f in s["fields"]:
                    check_nested(f["type"], f"{path}.{f['name']}")
            elif t == "array":
                check_nested(s["items"], f"{path}[]")
            elif t == "map":
                check_nested(s["values"], f"{path}{{}}")

    out = {}
    for f in schema["fields"]:
        s = f["type"]
        if isinstance(s, list):
            s = next((b for b in s if b != "null"), "null")
        lt = _logical(s)
        if lt == "timestamp-micros":
            out[f["name"]] = "us"
        elif lt == "timestamp-millis":
            out[f["name"]] = "ms"
        elif lt == "date":
            out[f["name"]] = "date"
        elif isinstance(s, dict):
            # non-logical complex field: make sure nothing time-logical
            # hides inside it
            check_nested(s, f["name"])
    return out


def read_avro_fallback(spark, path):
    """Distributed jar-free Avro read: ``binaryFile`` scan (one row per
    file) -> pure-stdlib decode in Arrow-batched ``mapInPandas``.

    The schema comes from ONE file's header (a single driver-side
    fetch); every file is then decoded on executors.  Files are the
    parallelism unit — the natural fit for Avro's per-file container
    framing (a 100 TB dataset is many files, not one)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    head = files.select("content").head()
    if head is None:
        raise FileNotFoundError(f"no avro files at {path}")
    decode0 = build_avro_decoder()
    schema_json, _ = decode0(bytes(head["content"]))
    spark_schema = avro_schema_to_spark(schema_json)
    names = [f["name"] for f in schema_json["fields"]]
    ts_cols = _ts_columns(schema_json)
    decode = build_avro_decoder()

    def gen(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = decode(bytes(content))
                out = pd.DataFrame(rows, columns=names)
                for c, unit in ts_cols.items():
                    if unit == "date":
                        out[c] = pd.to_datetime(out[c], unit="D").dt.date
                    else:
                        out[c] = pd.to_datetime(out[c], unit=unit)
                yield out

    return files.select("content").mapInPandas(gen, schema=spark_schema)


# ------------------------------------------------------------- writer


def write_avro_file(
    path: str, schema: dict, rows: list[dict], codec: str = "null"
) -> None:
    """Minimal driver-side Avro container writer (null or deflate
    codec) — the test fixture generator and small-export path.  Encodes
    with the same public-spec rules the decoder reads."""
    import struct
    import zlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")

    def zz(n: int) -> bytes:
        n = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def enc_bytes(b: bytes) -> bytes:
        return zz(len(b)) + b

    def enc(value, s) -> bytes:
        if isinstance(s, list):
            for i, branch in enumerate(s):
                if (value is None) == (branch == "null"):
                    return zz(i) + enc(value, branch)
            raise ValueError("no union branch for value")
        if isinstance(s, dict):
            t = s["type"]
            if t == "record":
                return b"".join(enc(value[f["name"]], f["type"]) for f in s["fields"])
            if t == "array":
                if not value:
                    return zz(0)
                return (
                    zz(len(value))
                    + b"".join(enc(v, s["items"]) for v in value)
                    + zz(0)
                )
            if t == "map":
                if not value:
                    return zz(0)
                body = b"".join(
                    enc_bytes(k.encode()) + enc(v, s["values"])
                    for k, v in value.items()
                )
                return zz(len(value)) + body + zz(0)
            if t == "enum":
                return zz(s["symbols"].index(value))
            if t == "fixed":
                return bytes(value)
            return enc(value, t)
        if s == "null":
            return b""
        if s == "boolean":
            return b"\x01" if value else b"\x00"
        if s in ("int", "long"):
            return zz(int(value))
        if s == "float":
            return struct.pack("<f", value)
        if s == "double":
            return struct.pack("<d", value)
        if s == "bytes":
            return enc_bytes(bytes(value))
        if s == "string":
            return enc_bytes(value.encode("utf-8"))
        raise ValueError(f"unsupported avro type: {s!r}")

    sync = bytes(range(16))
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    buf = bytearray(MAGIC)
    buf += zz(len(meta))
    for k, v in meta.items():
        buf += enc_bytes(k.encode()) + enc_bytes(v)
    buf += zz(0)
    buf += sync
    body = b"".join(enc(r, schema) for r in rows)
    if codec == "deflate":
        body = zlib.compress(body)[2:-4]  # strip zlib header/adler -> raw DEFLATE
    buf += zz(len(rows)) + zz(len(body)) + body + sync
    with open(path, "wb") as f:
        f.write(bytes(buf))


__all__ = [
    "avro_schema_to_spark",
    "build_avro_decoder",
    "read_avro_fallback",
    "write_avro_file",
]
