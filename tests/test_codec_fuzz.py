"""Decoder totality fuzz: arbitrary bytes must produce either a valid
result or ValueError — never IndexError/struct.error/zlib.error/
UnicodeDecodeError. This is the contract the resilient ingest paths
(q_source_resilient, q_source_avro_resilient) rely on to quarantine bad
objects instead of killing the task."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_test_spark.operators.png_py import SIGNATURE, decode_png, encode_png
from kinesis_test_spark.operators.wav_py import decode_wav, encode_wav
from kinesis_test_spark.sources.avro_py import MAGIC, read_container, write_container

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [{"name": "k", "type": "long"}, {"name": "s", "type": "string"}],
}


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_avro_decoder_total(data):
    try:
        read_container(data)
    except ValueError:
        pass


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_avro_decoder_total_with_magic_prefix(data):
    try:
        read_container(MAGIC + data)
    except ValueError:
        pass


@given(st.binary(max_size=400), st.integers(0, 399))
@settings(max_examples=200, deadline=None)
def test_avro_valid_container_with_flipped_byte(data, idx):
    """Start from a VALID container, flip one byte — decoder must still
    terminate with a result or ValueError."""
    buf = bytearray(
        write_container([{"k": 7, "s": "abc"}, {"k": -1, "s": ""}], SCHEMA)
    )
    buf[idx % len(buf)] ^= (data[0] if data else 1) or 1
    try:
        read_container(bytes(buf))
    except ValueError:
        pass


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_png_decoder_total(data):
    try:
        decode_png(data)
    except ValueError:
        pass


@given(st.integers(0, 500), st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_png_valid_image_with_flipped_byte(idx, mask):
    buf = bytearray(encode_png(bytes(range(48)), 4, 4, 2))
    buf[idx % len(buf)] ^= mask or 1
    try:
        decode_png(bytes(buf))
    except ValueError:
        pass


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_png_decoder_total_with_signature(data):
    try:
        decode_png(SIGNATURE + data)
    except ValueError:
        pass


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_wav_decoder_total(data):
    try:
        decode_wav(data)
    except ValueError:
        pass


@given(st.integers(0, 200), st.integers(0, 255))
@settings(max_examples=200, deadline=None)
def test_wav_valid_clip_with_flipped_byte(idx, mask):
    buf = bytearray(encode_wav(list(range(32))))
    buf[idx % len(buf)] ^= mask or 1
    try:
        decode_wav(bytes(buf))
    except ValueError:
        pass
