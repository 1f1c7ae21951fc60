"""PNG codec: round-trip plus reconstruction of ALL five scanline filters.

The encoder only emits None/Sub/Up, so Average and Paeth reconstruction
would otherwise be dead code — these tests forward-filter known pixels with
each filter type by hand, assemble the PNG container manually, and require
the decoder to recover the original bytes."""

from __future__ import annotations

import random
import struct
import zlib

from incr_iter_hadoop_spark.functions.png import (
    _chunk,
    _SIG,
    decode_png_rgb,
    encode_png_rgb,
)


def test_encode_decode_roundtrip_varied_sizes():
    rng = random.Random(42)
    for _ in range(6):
        h, w = rng.randint(1, 16), rng.randint(1, 16)
        px = [
            [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        w2, h2, raw = decode_png_rgb(encode_png_rgb(px))
        assert (w2, h2) == (w, h)
        assert raw == bytes(v for row in px for p in row for v in p)


def _forward_filter(f, line, prev):
    out = bytearray()
    for i in range(len(line)):
        a = line[i - 3] if i >= 3 else 0
        b = prev[i]
        c = prev[i - 3] if i >= 3 else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((line[i] - pred) & 0xFF)
    return bytes(out)


def test_all_five_filters_reconstruct():
    rng = random.Random(7)
    w, h = 6, 5
    rows = [bytes(rng.randrange(256) for _ in range(3 * w)) for _ in range(h)]
    raw = bytearray()
    prev = bytes(3 * w)
    for y, line in enumerate(rows):
        f = y % 5  # exercise None, Sub, Up, Average, Paeth
        raw.append(f)
        raw += _forward_filter(f, line, prev)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    w2, h2, out = decode_png_rgb(data)
    assert (w2, h2) == (w, h)
    assert out == b"".join(rows)


def test_parse_png_header_matches_full_decode():
    from incr_iter_hadoop_spark.functions.png import parse_png_header

    rng = random.Random(99)
    for _ in range(5):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        px = [
            [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        data = encode_png_rgb(px)
        pw, ph, depth, ctype = parse_png_header(data)
        assert (pw, ph, depth, ctype) == (w, h, 8, 2)
        # header-only parse must agree with the full decode
        fw, fh, _ = decode_png_rgb(data)
        assert (pw, ph) == (fw, fh)


def test_parse_png_header_rejects_non_png():
    import pytest

    from incr_iter_hadoop_spark.functions.png import parse_png_header

    with pytest.raises(ValueError):
        parse_png_header(b"GIF87a" + b"\x00" * 30)


def test_parse_png_header_rejects_truncated_png():
    """A valid 8-byte signature with fewer than the 29 bytes a complete
    IHDR needs must raise the documented ValueError (not struct.error) —
    callers of the metadata fast path catch ValueError to skip malformed
    files."""
    import pytest

    from incr_iter_hadoop_spark.functions.png import (
        encode_png_rgb,
        parse_png_header,
    )

    real = encode_png_rgb([[(1, 2, 3)]])
    for cut in (8, 12, 20, 28):
        with pytest.raises(ValueError, match="truncated"):
            parse_png_header(real[:cut])
