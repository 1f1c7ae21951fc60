"""IMA ADPCM codec in the WAV container (format tag 0x0011) — pure stdlib.

Real COMPRESSED-audio decoding with zero external dependencies: 4-bit IMA
ADPCM (the DVI/IMA algorithm from the public IMA Digital Audio Focus and
Technical Working Groups recommendation, also specified for RIFF/WAVE in
Microsoft's multimedia registration) is an integer state machine — step
table of 89 quantizer steps, per-nibble index adaptation — so both sides
are exactly deterministic. Block layout per the WAVE spec: each block
opens with a 4-byte header (int16 predictor seed = the block's first
sample, uint8 step index, reserved byte), followed by packed nibbles
(low nibble first), ``(block_align − 4) × 2 + 1`` samples per block.

Exactness contract used by the multimodal oracle: a per-block CONSTANT
signal encodes to all-zero nibbles from step index 0, where the decoder's
diff is ``step(7) >> 3 = 0`` — decode(encode(x)) == x exactly despite 4×
compression, so decoded statistics stay SQL-recomputable (the JPEG
DC-only trick, applied to audio). The general magnitude/adaptation path
is pinned by pytest: the encoder tracks the decoder's reconstruction
state, and decode output must equal that tracked reconstruction bit-for-
bit on random signals (plus a quantization error bound vs the input).
"""

from __future__ import annotations

import struct

INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One state-machine step: (new_pred, new_index)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = _clamp16(pred + diff)
    index = min(88, max(0, index + INDEX_TABLE[nibble]))
    return pred, index


def _encode_sample(sample: int, pred: int, index: int) -> int:
    """Choose the nibble for ``sample`` given decoder state (pred, index) —
    the canonical bit-serial quantizer, which the decoder inverts."""
    step = STEP_TABLE[index]
    delta = sample - pred
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    return nibble


def encode_wav_adpcm(
    samples: list[int], sample_rate: int = 16000, block_samples: int = 65
) -> tuple[bytes, list[int]]:
    """Encode mono int16 samples as an IMA-ADPCM WAV. Returns (bytes,
    reconstruction) where ``reconstruction`` is the decoder-state signal
    the encoder tracked — what any correct decoder MUST output exactly.
    ``len(samples)`` must be a multiple of ``block_samples`` (no final
    partial block; honest scope)."""
    if block_samples < 2 or (block_samples - 1) % 2:
        raise ValueError("block_samples must be odd and >= 3")
    if len(samples) % block_samples:
        raise ValueError("sample count must be a multiple of block_samples")
    block_align = 4 + (block_samples - 1) // 2
    index = 0
    recon: list[int] = []
    blocks = bytearray()
    for b0 in range(0, len(samples), block_samples):
        block = samples[b0 : b0 + block_samples]
        pred = block[0]
        blocks += struct.pack("<hBB", pred, index, 0)
        recon.append(pred)
        nibbles: list[int] = []
        for s in block[1:]:
            n = _encode_sample(s, pred, index)
            pred, index = _decode_nibble(n, pred, index)
            nibbles.append(n)
            recon.append(pred)
        for i in range(0, len(nibbles), 2):
            blocks.append(nibbles[i] | (nibbles[i + 1] << 4))
    byte_rate = (sample_rate * block_align + block_samples - 1) // block_samples
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2,
        block_samples,
    )
    fact = struct.pack("<I", len(samples))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body, recon


def decode_wav_adpcm(data: bytes) -> tuple[int, list[int]]:
    """Decode an IMA-ADPCM WAV: (sample_rate, mono int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = block_align = spb = None
    total = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            (code, ch, sample_rate, _br, block_align, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if code != 0x11:
                raise ValueError(f"not IMA ADPCM (fmt 0x{code:04x})")
            if ch != 1 or bits != 4:
                raise ValueError("only 4-bit mono IMA ADPCM")
            (spb,) = struct.unpack("<H", body[18:20])
        elif tag == b"fact":
            (total,) = struct.unpack("<I", body[:4])
        elif tag == b"data":
            payload = body
    if payload is None or block_align is None or spb is None:
        raise ValueError("missing fmt or data chunk")
    out: list[int] = []
    for b0 in range(0, len(payload), block_align):
        block = payload[b0 : b0 + block_align]
        pred, index, _rsv = struct.unpack("<hBB", block[:4])
        index = min(88, max(0, index))
        out.append(pred)
        produced = 1
        for byte in block[4:]:
            for nibble in (byte & 0xF, byte >> 4):
                if produced >= spb:
                    break
                pred, index = _decode_nibble(nibble, pred, index)
                out.append(pred)
                produced += 1
    if total is not None:
        out = out[:total]
    return sample_rate, out
