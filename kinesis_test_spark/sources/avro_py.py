"""Minimal pure-Python Avro Object Container File codec (no jar, no
third-party library) — enough of the public Avro 1.x spec to ingest the
flat record shapes the reference's wire formats use (the spark-avro jar is
absent in this environment; `q_source_avro` stays conditional on it, and
`q_source_avro_py` runs on this codec instead).

Supported field types: "long", "double", "string", "boolean", "bytes",
"null", and the nullable union ["null", T]. Codec "null" (uncompressed)
only. This is deliberately the 20% of Avro that carries 99% of event
streams: flat schemas, primitive fields.

Wire format implemented (Avro spec, public):
  - magic ``Obj\\x01``
  - file metadata map: avro.schema (JSON) + avro.codec, zigzag-varint
    counts, ``0`` terminator
  - 16-byte sync marker
  - data blocks: record count, byte size, records, sync marker
  - primitives: zigzag varint longs, IEEE-754 LE doubles, length-prefixed
    UTF-8 strings / bytes, 1-byte booleans, empty nulls, varint-tagged
    unions

The READ path is the distributed operator (binaryFile scan → per-file
parse inside mapInPandas); the writer exists to stage test fixtures and
prove the round trip. A golden-bytes test (tests/test_avro_py.py) pins the
encoding against hand-computed byte sequences so writer and reader can't
agree on a shared bug.
"""

from __future__ import annotations

import json
import struct

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # fixed marker: deterministic files, byte-stable tests

# The event wire schema the staging rigs encode. EVERY field is a
# nullable union — including the id: the parquet source admits a NULL
# event_id (edge_dupkeys identity-NULL rows), and a staging writer that
# calls int()/encode on None is the class of rig crash probe_nulls
# class 5 / the dupkeys probe exist to prevent. The wire must carry what
# the table can hold; identity SEMANTICS (what a dedup gate does with a
# NULL id) are the consumer's contract, not the codec's.
EVENT_SCHEMA = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "event_id", "type": ["null", "long"]},
        {"name": "user_id", "type": ["null", "long"]},
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "value", "type": ["null", "double"]},
    ],
}


def exact_records(df) -> list[dict]:
    """Spark DataFrame → avro-encodable dicts, via Arrow (df.toArrow).
    NOT toPandas: pandas floats a long column that carries a NULL, silently
    rounding values past 2^53 before the encoder ever sees them — Arrow
    keeps int64 exact and spells NULL as a real None, which is what the
    union encoder needs. Staging-rig-sized collects only (the callers are
    fixture writers; the distributed operator is the READ path)."""
    return df.toArrow().to_pylist()


# ---------------------------------------------------------------------------
# primitive encoders / decoders
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError("long out of 64-bit range")
    # Python's arbitrary-precision >> makes (n >> 63) the sign mask
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _length(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode a length/count that must be non-negative and within the
    remaining buffer — a negative decoded length would move the cursor
    BACKWARD (found by fuzzing: one flipped byte turned the metadata scan
    into an infinite loop)."""
    n, pos = zigzag_decode(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError(f"length {n} out of bounds at {pos}/{len(buf)}")
    return n, pos


def _enc_value(v, typ) -> bytes:
    if isinstance(typ, list):  # union, e.g. ["null", "double"]
        if v is None:
            return zigzag_encode(typ.index("null"))
        branch = next(i for i, t in enumerate(typ) if t != "null")
        return zigzag_encode(branch) + _enc_value(v, typ[branch])
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ == "long" or typ == "int":
        return zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = v.encode("utf-8")
        return zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        return zigzag_encode(len(v)) + bytes(v)
    raise ValueError(f"unsupported avro type: {typ}")


def _dec_value(buf: bytes, pos: int, typ):
    if isinstance(typ, list):
        branch, pos = zigzag_decode(buf, pos)
        return _dec_value(buf, pos, typ[branch])
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ == "long" or typ == "int":
        return zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = _length(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = _length(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type: {typ}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def write_container(records: list[dict], schema: dict, block_records: int = 1000) -> bytes:
    """Serialize records to Object Container File bytes (codec null)."""
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    out = bytearray(MAGIC)
    out += zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += zigzag_encode(len(kb)) + kb + zigzag_encode(len(v)) + v
    out += zigzag_encode(0)
    out += SYNC
    for i in range(0, len(records), block_records):
        chunk = records[i : i + block_records]
        body = bytearray()
        for rec in chunk:
            for name, typ in fields:
                body += _enc_value(rec[name], typ)
        out += zigzag_encode(len(chunk)) + zigzag_encode(len(body)) + body + SYNC
    return bytes(out)


def read_container(buf: bytes) -> tuple[dict, list[dict]]:
    """Parse Object Container File bytes → (schema, records).

    Total over arbitrary input: any malformed/truncated buffer raises
    ValueError (never IndexError/KeyError/UnicodeDecodeError) — the
    contract a resilient ingest path needs to quarantine bad objects
    instead of killing the task (see q_source_avro_resilient)."""
    try:
        return _read_container_inner(buf)
    except ValueError:
        raise
    except Exception as exc:  # truncated varint/length overruns, bad UTF-8, ...
        raise ValueError(f"malformed avro container: {type(exc).__name__}") from exc


def _read_container_inner(buf: bytes) -> tuple[dict, list[dict]]:
    if buf[:4] != MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    n_meta, pos = zigzag_decode(buf, pos)
    meta = {}
    while n_meta:
        for _ in range(abs(n_meta)):
            klen, pos = _length(buf, pos)
            k = buf[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _length(buf, pos)
            meta[k] = buf[pos : pos + vlen]
            pos += vlen
        n_meta, pos = zigzag_decode(buf, pos)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported codec: {codec!r}")
    schema = json.loads(meta["avro.schema"])
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        n_rec, pos = zigzag_decode(buf, pos)
        if n_rec < 0:
            raise ValueError(f"negative record count {n_rec}")
        # Even a zero-field record costs >=0 payload bytes but the loop
        # itself allocates per record — bound the declared count by the
        # bytes that could possibly back it, so a flipped count byte can't
        # turn into an unbounded alloc loop. (Deliberately NOT tightened by
        # the 16-byte block sync: a valid zero-field-schema block may
        # declare more records than non-sync bytes, and totality only
        # needs a buffer-length bound.)
        if n_rec > len(buf) - pos:
            raise ValueError(
                f"record count {n_rec} exceeds remaining buffer {len(buf) - pos}"
            )
        _size, pos = _length(buf, pos)
        for _ in range(n_rec):
            rec = {}
            for name, typ in fields:
                rec[name], pos = _dec_value(buf, pos, typ)
            records.append(rec)
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
        pos += 16
    return schema, records
