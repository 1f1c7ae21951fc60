"""WAV codec: round-trip, cross-check against the independent stdlib
`wave` decoder, and tolerance of extra RIFF chunks."""

from __future__ import annotations

import io
import random
import struct
import wave

from incr_iter_hadoop_spark.functions.wav import (
    decode_wav_pcm16,
    encode_wav_pcm16,
)


def test_roundtrip_and_stdlib_cross_check():
    rng = random.Random(11)
    samples = [rng.randrange(-32768, 32768) for _ in range(500)]
    data = encode_wav_pcm16(samples, 22050)
    sr, back = decode_wav_pcm16(data)
    assert (sr, back) == (22050, samples)
    wf = wave.open(io.BytesIO(data))
    assert (
        wf.getframerate(),
        wf.getnchannels(),
        wf.getsampwidth(),
    ) == (22050, 1, 2)
    ref = list(
        struct.unpack(f"<{wf.getnframes()}h", wf.readframes(wf.getnframes()))
    )
    assert ref == samples


def test_decoder_skips_unknown_chunks():
    samples = [0, 100, -100, 32767, -32768]
    data = encode_wav_pcm16(samples, 8000)
    # splice a LIST chunk (odd length — exercises word alignment) between
    # fmt and data
    fmt_end = data.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = (
        data[:fmt_end]
        + extra
        + data[fmt_end:]
    )
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    sr, back = decode_wav_pcm16(spliced)
    assert (sr, back) == (8000, samples)
