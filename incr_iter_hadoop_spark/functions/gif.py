"""Minimal GIF87a codec (single frame, global palette) — pure stdlib.

Real palette-image decoding with zero external dependencies: the GIF file
layout (logical screen descriptor, global color table, image descriptor,
sub-block-framed LZW data, trailer) and the variable-code-width LZW
algorithm are implemented from the public GIF87a/89a specification. LZW is
LOSSLESS, so like PNG the decode is exactly the inverse of the encode and
decoded statistics are SQL-recomputable from the generating formula — and
unlike the truecolor codecs this path exercises INDEXED color: the decoder
must map code-stream indices through the file's own palette.

The encoder is a real greedy-dictionary LZW compressor (not the
clear-code-per-pixel "uncompressed GIF" shortcut), so the decoder's
dictionary growth, code-width bumps, clear-code resets, and the KwKwK
special case all run on every fixture.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12


class _SubBlockWriter:
    """LSB-first bit packer framed into <=255-byte GIF sub-blocks."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def finish(self) -> bytes:
        if self._n:
            self.bytes.append(self._acc & 0xFF)
        out = bytearray()
        for i in range(0, len(self.bytes), 255):
            chunk = self.bytes[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
        return bytes(out)


class _SubBlockReader:
    def __init__(self, data: bytes, pos: int) -> None:
        buf = bytearray()
        while True:
            n = data[pos]
            pos += 1
            if n == 0:
                break
            buf += data[pos : pos + n]
            pos += n
        self.data = bytes(buf)
        self.end = pos
        self._bit = 0

    def read(self, width: int) -> int:
        v = 0
        for i in range(width):
            byte = self._bit >> 3
            if byte >= len(self.data):
                raise ValueError("LZW stream truncated")
            v |= ((self.data[byte] >> (self._bit & 7)) & 1) << i
            self._bit += 1
        return v


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _SubBlockWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        bw.write(table[run], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            # dictionary full: reset (keeps the stream strictly standard)
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        bw.write(table[run], width)
    bw.write(eoi, width)
    return bw.finish()


def _lzw_decode(br: _SubBlockReader, min_code_size: int, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_expected:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and next_code < (1 << _MAX_CODE_WIDTH):
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    return bytes(out)


def encode_gif(
    indices: list[list[int]], palette: list[tuple[int, int, int]]
) -> bytes:
    """Encode a 2-D grid of palette indices + a <=256-entry RGB palette as
    a single-frame GIF87a with a global color table."""
    h = len(indices)
    w = len(indices[0]) if h else 0
    n = len(palette)
    depth = max(2, (n - 1).bit_length())  # GIF table size >= 4 entries
    table = list(palette) + [(0, 0, 0)] * ((1 << depth) - n)
    lsd = struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    gct = b"".join(bytes(c) for c in table)
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    flat = bytes(v for row in indices for v in row)
    min_code = max(2, depth)
    data = bytes([min_code]) + _lzw_encode(flat, min_code)
    return b"GIF87a" + lsd + gct + img_desc + data + b"\x3b"


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode a single-frame GIF → (width, height, row-major RGB bytes).
    Walks the block structure (skipping 89a extensions), reads the global
    color table, LZW-decompresses the index stream, and maps indices
    through the palette. Raises on interlaced or local-palette frames."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        size = 1 << ((flags & 0x07) + 1)
        palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(size)]
        pos += 3 * size
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            raise ValueError("no image descriptor before trailer")
        if block == 0x21:  # 89a extension: label + sub-blocks, skip
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x}")
        _x, _y, fw, fh, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        if iflags & 0x40:
            raise ValueError("interlaced GIFs not supported")
        if iflags & 0x80:
            raise ValueError("local color tables not supported")
        if palette is None:
            raise ValueError("no global color table")
        min_code = data[pos]
        br = _SubBlockReader(data, pos + 1)
        idx = _lzw_decode(br, min_code, fw * fh)
        if len(idx) != fw * fh:
            raise ValueError("decoded pixel count mismatch")
        out = bytearray()
        for i in idx:
            out += bytes(palette[i])
        return fw, fh, bytes(out)
    raise ValueError("truncated GIF")
