"""Minimal pure-stdlib PNG codec (8-bit RGB, non-interlaced).

Real decoding with zero external dependencies: zlib (stdlib) provides the
DEFLATE layer, and the scanline filter reconstruction below implements the
five PNG filter types from the PNG specification (RFC 2083 / ISO 15948
§9 "Filtering"). This upgrades the multimodal decode stage from a stub to
an actual format round-trip for PNG payloads; baseline JPEG, GIF, WAV,
IMA-ADPCM and MJPEG/AVI have their own real codecs in this package.

The encoder deliberately VARIES the filter type per scanline (None/Sub/Up
cycling) so the decoder's reconstruction logic is genuinely exercised — an
all-zero-filter encoding would let a broken Sub/Up/Average/Paeth path pass
unnoticed.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_rgb(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode rows of (r, g, b) byte tuples as an 8-bit RGB PNG. Scanline
    filters cycle None(0)/Sub(1)/Up(2) by row index."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = bytes(3 * w)
    for y, row in enumerate(pixels):
        line = bytes(v for px in row for v in px)
        f = y % 3
        raw.append(f)
        if f == 0:  # None
            raw += line
        elif f == 1:  # Sub: subtract the pixel 3 bytes to the left
            raw += bytes(
                (line[i] - (line[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(len(line))
            )
        else:  # Up: subtract the byte directly above
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(len(line)))
        prev = line
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png_rgb(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit RGB non-interlaced PNG: (width, height, raw RGB
    bytes row-major). Implements all five scanline filter reconstructions
    (None/Sub/Up/Average/Paeth, spec §9.2-9.4)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = 3 * w
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        out += line
        prev = line
    return w, h, bytes(out)


def parse_png_header(data: bytes) -> tuple[int, int, int, int]:
    """Parse ONLY the IHDR chunk: (width, height, bit_depth, color_type).

    The metadata fast path: IHDR is required to be the first chunk
    (spec §11.2.2), so this reads a fixed 33-byte prefix and never
    touches IDAT — the shape a 100 TB metadata-extraction pass wants
    (per-file work independent of image size; no inflate, no filter
    reconstruction)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    if len(data) < 29:
        raise ValueError("truncated PNG: no complete IHDR")
    (length,) = struct.unpack(">I", data[8:12])
    if data[12:16] != b"IHDR" or length != 13:
        raise ValueError("IHDR must be the first chunk")
    w, h, depth, ctype, _comp, _filt, _inter = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    return w, h, depth, ctype
