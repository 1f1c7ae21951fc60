"""IMA ADPCM and AVI/MJPEG codecs: exactness on the oracle fixtures,
state-machine consistency on arbitrary signals, container robustness.

The multimodal oracles rest on two claims pinned here: (1) per-block
CONSTANT audio round-trips EXACTLY through the 4-bit quantizer (all-zero
nibbles at step 7), over the full int16 range; (2) constant-tile MJPEG
frames survive the AVI container walk byte-identical and decode exactly.
The general (lossy) paths are pinned by the stronger invariant available:
any correct decoder must reproduce the ENCODER-TRACKED reconstruction
bit-for-bit — quantization error is codec-inherent, divergence from the
tracked state is a bug."""

from __future__ import annotations

import math
import random
import struct

import numpy as np
import pytest

from incr_iter_hadoop_spark.functions.adpcm import (
    STEP_TABLE,
    decode_wav_adpcm,
    encode_wav_adpcm,
)
from incr_iter_hadoop_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from incr_iter_hadoop_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_step_table_is_wellformed():
    assert len(STEP_TABLE) == 89
    assert list(STEP_TABLE) == sorted(STEP_TABLE)
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767


def test_adpcm_constant_blocks_roundtrip_exact_full_range():
    rng = random.Random(5)
    for _ in range(5):
        vals = [rng.randint(-32768, 32767) for _ in range(8)]
        samples = [v for v in vals for _ in range(65)]
        data, recon = encode_wav_adpcm(samples)
        sr, back = decode_wav_adpcm(data)
        assert sr == 16000
        assert back == samples == recon
    # extremes
    samples = [v for v in (-32768, 0, 32767, -1) for _ in range(65)]
    _data, recon = encode_wav_adpcm(samples)
    assert decode_wav_adpcm(_data)[1] == samples == recon


def test_adpcm_is_actually_compressed():
    samples = [0] * 65 * 8
    data, _ = encode_wav_adpcm(samples)
    # 4 bits/sample + block/container headers vs 16-bit PCM: well under half
    assert len(data) < len(samples) * 2 / 2


def test_adpcm_decoder_matches_encoder_tracked_state_on_any_signal():
    rng = random.Random(11)
    signals = [
        [rng.randint(-32768, 32767) for _ in range(65 * 4)],
        [int(20000 * math.sin(i / 9)) for i in range(65 * 4)],
        [int(100 * (i % 13)) for i in range(65 * 2)],
    ]
    for s in signals:
        data, recon = encode_wav_adpcm(s)
        _sr, back = decode_wav_adpcm(data)
        assert back == recon  # bit-for-bit, incl. clamping + index walk
        # quantization error is bounded by the largest step on slow signals;
        # just pin that reconstruction stays in int16 and tracks direction
        assert all(-32768 <= v <= 32767 for v in back)


def test_adpcm_rejects_non_adpcm_and_partial_blocks():
    from incr_iter_hadoop_spark.functions.wav import encode_wav_pcm16

    with pytest.raises(ValueError):
        decode_wav_adpcm(encode_wav_pcm16([0] * 16))  # PCM fmt tag
    with pytest.raises(ValueError):
        encode_wav_adpcm([0] * 64)  # not a multiple of block_samples
    with pytest.raises(ValueError):
        decode_wav_adpcm(b"RIFX" + b"\x00" * 40)


def _tile_frames(n):
    frames, imgs = [], []
    for t in range(n):
        tiles = (np.arange(16).reshape(4, 4) * 7 + t * 13) % 256
        img = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        imgs.append(img)
        frames.append(encode_jpeg_gray(img))
    return frames, imgs


def test_avi_mjpeg_roundtrip_exact():
    frames, imgs = _tile_frames(6)
    avi = encode_avi_mjpeg(frames, 32, 32, fps=5)
    w, h, total, out = decode_avi_mjpeg(avi)
    assert (w, h, total, len(out)) == (32, 32, 6, 6)
    for f, img in zip(out, imgs):
        fw, fh, raw = decode_jpeg_gray(f)
        assert (np.frombuffer(raw, dtype=np.uint8).reshape(fh, fw) == img).all()


def test_avi_word_alignment_with_odd_frame_sizes():
    # force odd-length chunks: pad one frame's bytes with an APP comment
    frames, imgs = _tile_frames(3)
    seg = b"\xff\xfe" + struct.pack(">H", 3) + b"x"  # 5-byte COM segment
    odd = frames[1][:2] + seg + frames[1][2:]
    assert len(odd) % 2 == 1 or len(frames[1]) % 2 == 1  # at least one odd
    avi = encode_avi_mjpeg([frames[0], odd, frames[2]], 32, 32)
    _w, _h, _t, out = decode_avi_mjpeg(avi)
    assert out[0] == frames[0] and out[1] == odd and out[2] == frames[2]
    # the COM-padded frame still decodes (marker skipping)
    fw, fh, raw = decode_jpeg_gray(out[1])
    assert (np.frombuffer(raw, dtype=np.uint8).reshape(fh, fw) == imgs[1]).all()


def test_avi_rejects_wrong_container_and_codec():
    frames, _ = _tile_frames(1)
    avi = bytearray(encode_avi_mjpeg(frames, 32, 32))
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF" + bytes(avi[4:8]) + b"WAVE" + bytes(avi[12:]))
    i = bytes(avi).find(b"vids") + 4
    hacked = avi[:i] + b"H264" + avi[i + 4 :]
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(hacked))


def test_avi_empty_and_many_frames():
    frames, _ = _tile_frames(12)
    avi = encode_avi_mjpeg(frames, 32, 32)
    _w, _h, total, out = decode_avi_mjpeg(avi)
    assert total == 12 and [len(f) for f in out] == [len(f) for f in frames]
