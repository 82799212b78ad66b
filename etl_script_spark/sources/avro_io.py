"""Pure-Python Avro 1.x object-container codec + distributed reader.

The container lacks the spark-avro connector jar (Avro is an external
data-source module since Spark 2.4), so — like the from-scratch
CFB/BIFF8 Excel engine (sources/xls_biff.py) — the Avro path is
implemented from the PUBLIC specification (Apache Avro 1.11 spec,
"Object Container Files" + binary encoding): magic ``Obj\\x01``, a
metadata map carrying ``avro.schema``/``avro.codec``, a 16-byte sync
marker, then blocks of (record count, byte size, records, sync).
Binary encoding: zigzag varint longs, length-prefixed UTF-8 strings,
little-endian IEEE doubles, union values prefixed by the branch index.

Scope (the interchange subset a pipeline actually moves): record
schemas whose fields are null / boolean / int / long / double /
string or a union of null with one of those, plus the two logical
types the repo's money policy needs (Avro 1.11 spec §Logical Types):
``decimal`` over bytes (two's-complement big-endian unscaled int —
DecimalType(15,2) money round-trips exactly, never through double)
and ``date`` over int (days since Unix epoch). Codec: ``null``
(uncompressed) and ``deflate``.

Write side is a fixture/driver utility (one file per call — shard by
calling per partition); the READ side scales: ``read_avro_distributed``
scans files via ``binaryFile`` and decodes each on its executor
through Arrow-batched mapInPandas, so a directory of avro shards
parallelizes by file exactly like the Excel source.
"""

from __future__ import annotations

import datetime
import io
import json
import struct
import zlib
from decimal import Decimal
from hashlib import md5

_MAGIC = b"Obj\x01"
_EPOCH = datetime.date(1970, 1, 1)


# --------------------------------------------------------------- #
# binary primitives
# --------------------------------------------------------------- #

def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise ValueError("avro: truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _twos_complement(unscaled: int) -> bytes:
    """Minimal-length big-endian two's complement, per the decimal
    logical type's bytes representation."""
    length = 1
    while True:
        try:
            return unscaled.to_bytes(length, "big", signed=True)
        except OverflowError:
            length += 1


def _enc_value(typ, v) -> bytes:
    if isinstance(typ, list):  # union — branch index prefix
        if v is None:
            idx = typ.index("null")
            return _zigzag_encode(idx)
        idx = next(i for i, t in enumerate(typ) if t != "null")
        return _zigzag_encode(idx) + _enc_value(typ[idx], v)
    if isinstance(typ, dict):  # logical types / schema objects
        lt = typ.get("logicalType")
        if lt == "decimal":
            if typ.get("type") != "bytes":
                raise ValueError("avro: decimal must be bytes-backed")
            scale = int(typ.get("scale", 0))
            unscaled = int(
                Decimal(str(v)).scaleb(scale).to_integral_value()
            )
            raw = _twos_complement(unscaled)
            return _zigzag_encode(len(raw)) + raw
        if lt == "date":
            if typ.get("type") != "int":
                raise ValueError("avro: date must be int-backed")
            if isinstance(v, datetime.datetime):  # datetime IS a date
                v = v.date()
            days = (v - _EPOCH).days if isinstance(v, datetime.date) else int(v)
            return _zigzag_encode(days)
        if lt is not None:
            raise ValueError(f"avro: unsupported logical type {lt!r}")
        return _enc_value(typ["type"], v)  # plain {"type": ...} wrapper
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"avro: unsupported type {typ!r}")


def _dec_value(typ, buf: io.BytesIO):
    if isinstance(typ, list):
        idx = _zigzag_decode(buf)
        return _dec_value(typ[idx], buf)
    if isinstance(typ, dict):
        lt = typ.get("logicalType")
        if lt == "decimal":
            scale = int(typ.get("scale", 0))
            ln = _zigzag_decode(buf)
            unscaled = int.from_bytes(buf.read(ln), "big", signed=True)
            return Decimal(unscaled).scaleb(-scale)
        if lt == "date":
            return _EPOCH + datetime.timedelta(days=_zigzag_decode(buf))
        if lt is not None:
            raise ValueError(f"avro: unsupported logical type {lt!r}")
        return _dec_value(typ["type"], buf)
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _zigzag_decode(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        ln = _zigzag_decode(buf)
        return buf.read(ln).decode("utf-8")
    raise ValueError(f"avro: unsupported type {typ!r}")


# --------------------------------------------------------------- #
# container file
# --------------------------------------------------------------- #

def write_avro(
    path: str,
    schema: dict,
    records: list[dict],
    codec: str = "null",
    block_records: int = 1000,
) -> None:
    """Write one Avro object-container file. The sync marker derives
    deterministically from the schema text so identical fixtures are
    byte-identical run to run."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True)
    sync = md5(schema_json.encode()).digest()
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    out = bytearray()
    out += _MAGIC
    meta = {"avro.schema": schema_json, "avro.codec": codec}
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb, vb = k.encode(), v.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(vb)) + vb
    out += _zigzag_encode(0)  # end of metadata map
    out += sync
    for i in range(0, max(len(records), 1), block_records):
        chunk = records[i : i + block_records]
        if not chunk:
            break
        body = b"".join(
            b"".join(_enc_value(t, r.get(n)) for n, t in fields)
            for r in chunk
        )
        if codec == "deflate":
            body = zlib.compress(body)[2:-4]  # raw deflate per spec
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_avro_bytes(data: bytes) -> tuple[dict, list[dict]]:
    """Decode one container file from bytes → (schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("avro: bad magic (not an object container file)")
    meta: dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:
            # Per the spec a negative count is followed by a byte-size
            # long BEFORE the entries; raise before consuming anything
            # so the caller sees the intended 'unsupported' error, not
            # garbage decode failures from a misaligned stream.
            raise ValueError("avro: negative-count metadata blocks unsupported")
        for _ in range(n):
            kl = _zigzag_decode(buf)
            k = buf.read(kl).decode()
            vl = _zigzag_decode(buf)
            meta[k] = buf.read(vl)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = buf.read(16)
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        cnt = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        body = buf.read(size)
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        bbuf = io.BytesIO(body)
        for _ in range(cnt):
            records.append({n: _dec_value(t, bbuf) for n, t in fields})
        if buf.read(16) != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
    return schema, records


def read_avro_distributed(spark, path_glob: str, result_schema):
    """Distributed Avro read: ``binaryFile`` scan (one partition per
    file split) + Arrow-batched mapInPandas decode on the executors —
    the Excel-source shape (sources/excel.py). Column values decode
    to Python objects; ``result_schema`` (a StructType or DDL string)
    declares the output and drives the usual try-cast discipline
    downstream."""
    import pandas as pd

    def _extract(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                schema, records = read_avro_bytes(row["content"])
                # Explicit columns from the decoded schema: a file (or
                # a whole partition) with zero records must still yield
                # a correctly-shaped empty frame, or Arrow conversion
                # against result_schema fails at runtime.
                cols = [f["name"] for f in schema["fields"]]
                frames.append(pd.DataFrame.from_records(records, columns=cols))
            if frames:  # an input batch with zero files yields nothing
                yield pd.concat(frames)

    bf = spark.read.format("binaryFile").load(path_glob)
    return bf.select("path", "content").mapInPandas(_extract, result_schema)
