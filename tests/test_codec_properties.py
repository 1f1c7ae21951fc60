"""Hypothesis property tests for the pure-Python media codecs.

The example-based codec suites pin specific behaviors; these search the
input space for violations of each codec's CORE invariant:

- PNG, GIF: lossless — decode(encode(x)) == x for ALL x.
- JPEG: the entropy layer (Huffman + category/extend + run-length) is
  exact for any coefficient stream; decode∘encode is a fixed point on its
  own output (re-encoding decoded pixels changes nothing).
- ADPCM: decode equals the encoder-tracked reconstruction bit-for-bit,
  and constant-per-block signals round-trip exactly.
- AVI: the container is transparent — frames out == frames in, bytewise.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from incr_iter_hadoop_spark.functions.adpcm import (
    decode_wav_adpcm,
    encode_wav_adpcm,
)
from incr_iter_hadoop_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from incr_iter_hadoop_spark.functions.gif import decode_gif, encode_gif
from incr_iter_hadoop_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from incr_iter_hadoop_spark.functions.png import (
    decode_png_rgb,
    encode_png_rgb,
)

_SET = settings(max_examples=25, deadline=None)


@_SET
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31),
)
def test_png_lossless(w, h, seed):
    rng = np.random.default_rng(seed)
    px = [
        [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
        for _ in range(h)
    ]
    w2, h2, raw = decode_png_rgb(encode_png_rgb(px))
    assert (w2, h2) == (w, h)
    assert raw == bytes(v for row in px for p in row for v in p)


@_SET
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    npal=st.integers(2, 256),
    seed=st.integers(0, 2**31),
)
def test_gif_lossless(w, h, npal, seed):
    rng = np.random.default_rng(seed)
    pal = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(npal)]
    idx = [[int(v) for v in rng.integers(0, npal, w)] for _ in range(h)]
    w2, h2, rgb = decode_gif(encode_gif(idx, pal))
    assert (w2, h2) == (w, h)
    assert rgb == b"".join(bytes(pal[v]) for row in idx for v in row)


@_SET
@given(bw=st.integers(1, 4), bh=st.integers(1, 4), seed=st.integers(0, 2**31))
def test_jpeg_fixed_point_and_constant_tile_exactness(bw, bh, seed):
    rng = np.random.default_rng(seed)
    # constant tiles: exact round-trip
    tiles = rng.integers(0, 256, size=(bh, bw))
    img = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    w, h, raw = decode_jpeg_gray(encode_jpeg_gray(img))
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
    assert (got == img).all()
    # arbitrary content: decoded output is a fixed point of re-encoding
    noisy = rng.integers(0, 256, size=(bh * 8, bw * 8)).astype(np.uint8)
    _w, _h, raw1 = decode_jpeg_gray(encode_jpeg_gray(noisy))
    _w, _h, raw2 = decode_jpeg_gray(
        encode_jpeg_gray(np.frombuffer(raw1, dtype=np.uint8).reshape(bh * 8, bw * 8))
    )
    assert raw1 == raw2


@_SET
@given(
    nblocks=st.integers(1, 6),
    seed=st.integers(0, 2**31),
    constant=st.booleans(),
)
def test_adpcm_tracked_reconstruction(nblocks, seed, constant):
    rng = np.random.default_rng(seed)
    if constant:
        vals = rng.integers(-32768, 32768, nblocks)
        samples = [int(v) for v in vals for _ in range(65)]
    else:
        samples = [int(v) for v in rng.integers(-32768, 32768, 65 * nblocks)]
    data, recon = encode_wav_adpcm(samples)
    _sr, back = decode_wav_adpcm(data)
    assert back == recon
    if constant:
        assert back == samples  # the oracle-exactness contract


@_SET
@given(
    n=st.integers(1, 8),
    seed=st.integers(0, 2**31),
)
def test_avi_container_is_transparent(n, seed):
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n):
        tiles = rng.integers(0, 256, size=(4, 4))
        img = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        frames.append(encode_jpeg_gray(img))
    _w, _h, total, out = decode_avi_mjpeg(encode_avi_mjpeg(frames, 32, 32))
    assert total == n and out == frames
