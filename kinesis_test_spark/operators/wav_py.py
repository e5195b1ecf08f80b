"""Minimal pure-Python WAV (RIFF/PCM) codec — the audio sibling of
png_py.py. No audio library exists in this container, so the multimodal
family's audio story was schema-only; this implements the real container:
RIFF framing, fmt chunk validation, 16-bit little-endian PCM samples.

`q_mm_wav_features` (multimodal.py) drives it distributed with the same
analytic-oracle trick as the PNG round trip: samples come from a
closed-form integer formula, so the DuckDB oracle computes the expected
waveform statistics without ever parsing a WAV — encoder and decoder
cannot hide a shared framing bug behind a round trip.
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM samples → WAV bytes."""
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError("sample out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[int, list[int]]:
    """WAV bytes → (sample_rate, mono int16 samples). Validates RIFF
    framing and requires PCM / 1 channel / 16-bit. Total over arbitrary
    input: malformed bytes raise ValueError, never struct/index errors."""
    try:
        return _decode_wav_inner(buf)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"malformed WAV: {type(exc).__name__}") from exc


def _decode_wav_inner(buf: bytes) -> tuple[int, list[int]]:
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    if riff_size != len(buf) - 8:
        raise ValueError("RIFF size mismatch")
    pos = 12
    sample_rate = None
    samples: list[int] | None = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + size > len(buf):
            raise ValueError("chunk size overruns buffer")
        payload = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, sample_rate, _rate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if (fmt_code, channels, bits) != (1, 1, 16):
                raise ValueError("unsupported WAV variant (need mono PCM16)")
        elif tag == b"data":
            samples = list(struct.unpack(f"<{len(payload) // 2}h", payload))
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, samples
