"""Minimal pure-stdlib WAV (RIFF/PCM) codec — 16-bit mono.

Real audio decoding with zero external dependencies: the RIFF container
format and little-endian PCM sample encoding are parsed with ``struct``
alone (WAVE format, per the public RIFF/WAVE specification). Together with
functions/png.py this makes both the image and audio decode stages of the
multimodal pipeline REAL format round-trips; only codecs that genuinely
need external libraries (JPEG, MP3/AAC, video) remain stubbed.
"""

from __future__ import annotations

import struct


def encode_wav_pcm16(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Encode mono int16 samples as a PCM WAV file."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
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


def decode_wav_pcm16(data: bytes) -> tuple[int, list[int]]:
    """Decode a PCM WAV file: (sample_rate, mono int16 samples). Walks the
    RIFF chunk list (tolerating extra chunks), validates the fmt chunk is
    16-bit mono PCM."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (fmt_code, channels, bits) != (1, 1, 16):
                raise ValueError("only 16-bit mono PCM supported")
        elif tag == b"data":
            samples = list(struct.unpack(f"<{len(body) // 2}h", body))
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, samples
