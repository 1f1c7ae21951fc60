"""Minimal AVI (RIFF) container codec for MJPEG video — pure stdlib.

Real VIDEO decoding with zero external dependencies: Motion-JPEG stores
each frame as an independent baseline JPEG inside an AVI RIFF container
(public formats: the RIFF/AVI file layout from Microsoft's multimedia
programming reference; JPEG per ITU-T T.81, functions/jpeg.py). The
container layer here is a faithful writer/walker — LIST hdrl (avih + strl
with a 'vids'/'MJPG' strh and a BITMAPINFOHEADER strf), LIST movi with
word-aligned '00dc' frame chunks, and an idx1 index — so the decode side
exercises genuine container parsing (nested LISTs, alignment padding,
stream headers), then hands each frame's bytes to the real JPEG decoder.

With constant-per-tile frames (the JPEG exactness contract), the whole
video pipeline — container walk + per-frame entropy decode + IDCT — is
integer-exact and therefore SQL-oracle-checkable, including frame
SAMPLING (decode every Nth frame), the shape a 100 TB video pipeline
actually runs.
"""

from __future__ import annotations

import struct


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap per-frame JPEG bytes into an AVI/MJPEG container."""
    n = len(frames)
    max_frame = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_frame * fps,   # max bytes per second (advisory)
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        n, 0, 1,           # total frames, initial frames, streams
        max_frame, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_frame,
                      0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame — offset is relative to the movi list's
    # 'movi' fourcc, per the AVI 1.0 convention
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx)))


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Walk an AVI/MJPEG container: (width, height, total_frames,
    frame_jpeg_bytes). Validates the stream is video/MJPG."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = None
    total = None
    handler_ok = False
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, total, handler_ok
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)  # word alignment
            if tag == b"LIST":
                walk(body[4:])  # skip the list-kind fourcc, recurse
            elif tag == b"avih":
                fields = struct.unpack("<IIIIIIIIII", body[:40])
                total = fields[4]
                width, height = fields[8], fields[9]
            elif tag == b"strh":
                if body[:4] == b"vids":
                    if body[4:8] != b"MJPG":
                        raise ValueError("not an MJPEG video stream")
                    handler_ok = True
            elif tag[2:4] in (b"dc", b"db"):  # compressed/uncompressed frame
                frames.append(body)

    walk(data[12:])
    if width is None or not handler_ok:
        raise ValueError("missing avih or vids/MJPG stream header")
    return width, height, total if total is not None else len(frames), frames
