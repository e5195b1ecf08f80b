"""Golden-byte pins for the pure-Python PNG codec (operators/png_py.py).

Same independence principle as tests/test_avro_py.py: bytes are fixed
against the PUBLIC PNG spec (signature, IHDR layout, chunk CRCs), and a
hand-assembled minimal PNG is decoded without ever touching the encoder,
so encoder and decoder cannot agree on a shared off-spec bug. (The
corpus-level proof is q_mm_png_roundtrip's analytic oracle.)
"""

from __future__ import annotations

import struct
import zlib

import pytest

from kinesis_test_spark.operators.png_py import (
    SIGNATURE,
    _paeth,
    decode_png,
    encode_png,
)


def test_signature_is_spec_bytes():
    assert SIGNATURE == bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])


def test_ihdr_golden_layout():
    buf = encode_png(bytes(3), 1, 1, 0)
    assert buf[:8] == SIGNATURE
    (length,) = struct.unpack_from(">I", buf, 8)
    assert length == 13 and buf[12:16] == b"IHDR"
    w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", buf[16:29])
    assert (w, h, depth, color, comp, filt, inter) == (1, 1, 8, 2, 0, 0, 0)
    (crc,) = struct.unpack_from(">I", buf, 29)
    assert crc == zlib.crc32(buf[12:29]) & 0xFFFFFFFF


def test_decode_hand_assembled_png():
    """A 2×1 RGB image assembled chunk-by-chunk by hand (filter 0)."""

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    scanline = b"\x00" + bytes([10, 20, 30, 40, 50, 60])
    buf = (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanline))
        + chunk(b"IEND", b"")
    )
    w, h, pix = decode_png(buf)
    assert (w, h) == (2, 1)
    assert pix == bytes([10, 20, 30, 40, 50, 60])


def test_paeth_predictor_spec_cases():
    # PNG spec: choose a/b/c by minimum distance, ties a over b over c
    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 10) == 20  # p=20 → pa=10, pb=0 → b
    assert _paeth(20, 10, 10) == 20  # p=20 → pa=0 → a
    assert _paeth(10, 10, 5) == 10  # p=15 → pa=5, pb=5 tie → a


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(ftype):
    W, H = 9, 7  # odd sizes: exercise stride edges
    pix = bytes(((x * 31 + y * 17 + c * 7) % 256) for y in range(H) for x in range(W) for c in range(3))
    w, h, out = decode_png(encode_png(pix, W, H, ftype))
    assert (w, h) == (W, H) and out == pix


def test_decode_rejects_corrupt_crc():
    buf = bytearray(encode_png(bytes(3), 1, 1, 0))
    buf[20] ^= 0xFF  # corrupt IHDR payload without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))


def test_decode_rejects_unsupported_variant():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)  # RGBA

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    buf = SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(buf)
