"""Golden-byte pins for the pure-Python Avro codec (sources/avro_py.py).

The writer and reader live in the same module, so a round-trip test alone
could hide a shared encoding bug. These pins fix the bytes against the
PUBLIC Avro spec's own examples (zigzag table) and hand-assembled record
bodies, so either side drifting off-spec fails independently.
"""

from __future__ import annotations

import json
import struct

import pytest

from kinesis_test_spark.sources.avro_py import (
    MAGIC,
    SYNC,
    _dec_value,
    _enc_value,
    read_container,
    write_container,
    zigzag_decode,
    zigzag_encode,
)

# The Avro specification's zigzag example table.
SPEC_ZIGZAG = [
    (0, b"\x00"),
    (-1, b"\x01"),
    (1, b"\x02"),
    (-2, b"\x03"),
    (2, b"\x04"),
    (-64, b"\x7f"),
    (64, b"\x80\x01"),
    (8192, b"\x80\x80\x01"),
    (-8193, b"\x81\x80\x01"),
]


@pytest.mark.parametrize("n,expected", SPEC_ZIGZAG)
def test_zigzag_matches_spec_table(n, expected):
    assert zigzag_encode(n) == expected
    val, pos = zigzag_decode(expected, 0)
    assert val == n and pos == len(expected)


def test_primitive_encodings_golden():
    assert _enc_value(3, "long") == b"\x06"
    assert _enc_value("ab", "string") == b"\x04ab"
    assert _enc_value(2.5, "double") == struct.pack("<d", 2.5)
    assert _enc_value(True, "boolean") == b"\x01"
    assert _enc_value(None, ["null", "double"]) == b"\x00"
    assert _enc_value(2.5, ["null", "double"]) == b"\x02" + struct.pack("<d", 2.5)


def test_decode_hand_assembled_record():
    """Bytes assembled by hand from the spec, never by the writer."""
    body = b"\x06" + b"\x04ab" + b"\x02" + struct.pack("<d", 2.5)
    pos = 0
    v, pos = _dec_value(body, pos, "long")
    assert v == 3
    v, pos = _dec_value(body, pos, "string")
    assert v == "ab"
    v, pos = _dec_value(body, pos, ["null", "double"])
    assert v == 2.5 and pos == len(body)


SCHEMA = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "v", "type": ["null", "double"]},
    ],
}


def test_container_header_golden():
    buf = write_container([], SCHEMA)
    assert buf[:4] == MAGIC
    # metadata map: 2 entries, sorted (avro.codec, avro.schema)
    pos = 4
    n, pos = zigzag_decode(buf, pos)
    assert n == 2
    klen, pos = zigzag_decode(buf, pos)
    assert buf[pos : pos + klen] == b"avro.codec"
    pos += klen
    vlen, pos = zigzag_decode(buf, pos)
    assert buf[pos : pos + vlen] == b"null"
    pos += vlen
    klen, pos = zigzag_decode(buf, pos)
    assert buf[pos : pos + klen] == b"avro.schema"
    pos += klen
    vlen, pos = zigzag_decode(buf, pos)
    assert json.loads(buf[pos : pos + vlen]) == SCHEMA
    pos += vlen
    term, pos = zigzag_decode(buf, pos)
    assert term == 0
    assert buf[pos : pos + 16] == SYNC
    assert len(buf) == pos + 16  # zero blocks after the header


def test_container_roundtrip_multi_block():
    recs = [{"k": i, "s": f"s{i}", "v": None if i % 3 == 0 else i / 2} for i in range(25)]
    buf = write_container(recs, SCHEMA, block_records=10)
    schema, out = read_container(buf)
    assert schema == SCHEMA
    assert out == recs


def test_container_detects_corrupt_sync():
    buf = bytearray(write_container([{"k": 1, "s": "x", "v": 1.0}], SCHEMA))
    buf[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_container(bytes(buf))
