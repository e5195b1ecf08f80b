"""Golden-byte pins for the pure-Python WAV codec (operators/wav_py.py) —
same independence principle as the Avro/PNG pins: bytes fixed against the
public RIFF/WAVE layout, and a hand-assembled file decoded without the
encoder."""

from __future__ import annotations

import struct

import pytest

from kinesis_test_spark.operators.wav_py import decode_wav, encode_wav


def test_header_golden_layout():
    buf = encode_wav([0, 1, -1], sample_rate=8000)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    assert riff_size == len(buf) - 8
    assert buf[12:16] == b"fmt "
    (fmt_size,) = struct.unpack_from("<I", buf, 16)
    assert fmt_size == 16
    fmt_code, channels, rate, byte_rate, align, bits = struct.unpack_from("<HHIIHH", buf, 20)
    assert (fmt_code, channels, rate, byte_rate, align, bits) == (1, 1, 8000, 16000, 2, 16)
    assert buf[36:40] == b"data"
    (data_size,) = struct.unpack_from("<I", buf, 40)
    assert data_size == 6
    assert buf[44:] == struct.pack("<3h", 0, 1, -1)


def test_decode_hand_assembled_wav():
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 8000, 2, 16)
    data = struct.pack("<4h", 100, -100, 32767, -32768)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 8) + data
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, samples = decode_wav(buf)
    assert rate == 4000
    assert samples == [100, -100, 32767, -32768]


def test_roundtrip_and_range_check():
    clip = [((i * i * 7) % 2048) - 1024 for i in range(100)]
    rate, out = decode_wav(encode_wav(clip, 16000))
    assert rate == 16000 and out == clip
    with pytest.raises(ValueError, match="int16"):
        encode_wav([40000])


def test_decode_rejects_bad_framing():
    buf = bytearray(encode_wav([1, 2, 3]))
    buf[0:4] = b"RIFX"
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(bytes(buf))
    buf2 = bytearray(encode_wav([1, 2, 3]))
    struct.pack_into("<I", buf2, 4, 5)  # lie about the RIFF size
    with pytest.raises(ValueError, match="size"):
        decode_wav(bytes(buf2))


def test_decode_rejects_stereo():
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)  # 2 channels
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 0)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(buf)
