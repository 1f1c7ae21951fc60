"""GIF/LZW codec: exact round-trips (lossless contract), LZW specifics
(dictionary growth, code-width bumps, clear-code reset on a full table,
the KwKwK case), sub-block framing, palette mapping, and honest rejection
of unsupported variants."""

from __future__ import annotations

import random

import pytest

from incr_iter_hadoop_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    _SubBlockReader,
    decode_gif,
    encode_gif,
)

PAL = [((i * 3) % 256, (i * 7) % 256, (i * 11) % 256) for i in range(256)]


def _rgb(indices):
    return b"".join(bytes(PAL[v]) for row in indices for v in row)


def test_random_images_roundtrip_exact():
    rng = random.Random(42)
    for _ in range(8):
        w, h = rng.randint(1, 33), rng.randint(1, 33)
        idx = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        gw, gh, rgb = decode_gif(encode_gif(idx, PAL))
        assert (gw, gh) == (w, h) and rgb == _rgb(idx)


def test_small_palette_uses_small_codes():
    idx = [[(x + y) % 4 for x in range(16)] for y in range(16)]
    small = encode_gif(idx, PAL[:4])
    _w, _h, rgb = decode_gif(small)
    assert rgb == b"".join(bytes(PAL[v]) for row in idx for v in row)
    # 4-entry palette -> 2-bit codes -> materially smaller file
    assert len(small) * 2 < len(encode_gif(idx, PAL))


def test_lzw_actually_compresses_repetitive_content():
    idx = [[(x // 8 + y // 8) % 8 for x in range(64)] for y in range(64)]
    gif = encode_gif(idx, PAL)
    assert len(gif) < 64 * 64 / 2  # raw indices would be 4096 bytes
    assert decode_gif(gif)[2] == _rgb(idx)


def test_kwkwk_pattern_roundtrips():
    # alternating pairs generate the code==next_code case during decode
    idx = [[1, 2] * 64]
    assert decode_gif(encode_gif(idx, PAL))[2] == _rgb(idx)


def test_dictionary_overflow_forces_clear_and_still_roundtrips():
    # high-entropy content on a full 8-bit alphabet grows the table to the
    # 12-bit cap -> encoder emits a clear reset mid-stream
    rng = random.Random(7)
    idx = [[rng.randrange(256) for _ in range(128)] for _ in range(64)]
    flat = bytes(v for row in idx for v in row)
    encoded = _lzw_encode(flat, 8)
    br = _SubBlockReader(b"\xff" * 0 + encoded, 0)
    assert _lzw_decode(br, 8, len(flat)) == flat


def test_subblock_framing_spans_255_byte_boundaries():
    # a big image guarantees multiple 255-byte sub-blocks
    idx = [[(x * 31 + y * 17) % 256 for x in range(64)] for y in range(64)]
    gif = encode_gif(idx, PAL)
    assert decode_gif(gif)[2] == _rgb(idx)


def test_89a_extension_blocks_are_skipped():
    idx = [[5, 6], [7, 8]]
    gif = bytearray(encode_gif(idx, PAL))
    # splice a graphic-control extension after the color table
    gct_end = 13 + 3 * 256
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(gif[:gct_end]) + ext + bytes(gif[gct_end:])
    spliced = b"GIF89a" + spliced[6:]
    assert decode_gif(spliced)[2] == _rgb(idx)


def test_rejects_unsupported_variants():
    idx = [[1]]
    gif = bytearray(encode_gif(idx, PAL))
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + bytes(gif[6:]))
    # flip the interlace flag in the image descriptor (structural offset:
    # header+LSD is 13 bytes, then the 256-entry global color table —
    # find() would land on a 0x2C byte inside the palette)
    desc = 13 + 3 * 256
    assert gif[desc] == 0x2C
    hacked = gif[: desc + 9] + bytes([gif[desc + 9] | 0x40]) + gif[desc + 10 :]
    with pytest.raises(ValueError):
        decode_gif(bytes(hacked))
