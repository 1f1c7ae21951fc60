"""Baseline-JPEG codec: exactness on DC-only fixtures, entropy-layer
round-trips that exercise the general AC path (runs, ZRL, EOB, categories
up to the table limits), bounded error + fixed-point behavior on arbitrary
images, and honest rejection of unsupported variants.

The multimodal oracle's exactness rests on one claim — constant-per-tile
images round-trip EXACTLY through the lossy format — so that claim is
pinned here over the full 0..255 value range, not just the fixture's
formula."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from incr_iter_hadoop_spark.functions.jpeg import (
    AC_COUNTS,
    AC_SYMBOLS,
    DC_COUNTS,
    DC_SYMBOLS,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_codes,
    _build_decode_map,
    _category,
    _extend,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _tiles_image(tiles: np.ndarray) -> np.ndarray:
    return np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_zigzag_is_the_jpeg_order():
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    # tail = raster indices 55, 62, 63 of the standard zigzag table
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(ZIGZAG)) == 64


def test_annex_k_tables_are_wellformed_prefix_codes():
    for counts, symbols in ((DC_COUNTS, DC_SYMBOLS), (AC_COUNTS, AC_SYMBOLS)):
        assert sum(counts) == len(symbols)
        codes = _build_codes(counts, symbols)
        # Kraft inequality with strict prefix-freeness: no code is a
        # prefix of another
        entries = sorted(codes.values(), key=lambda cl: cl[1])
        for i, (c1, l1) in enumerate(entries):
            for c2, l2 in entries[i + 1 :]:
                assert c2 >> (l2 - l1) != c1, "prefix collision"
        assert sum(2.0 ** -length for _, length in entries) <= 1.0


def test_constant_tile_roundtrip_is_exact_full_value_range():
    # sweep all 256 tile values across several deterministic layouts
    for seed in range(4):
        rng = np.random.default_rng(seed)
        tiles = rng.permutation(256).reshape(16, 16)[:4, :8]
        img = _tiles_image(tiles)
        w, h, raw = decode_jpeg_gray(encode_jpeg_gray(img))
        assert (w, h) == (img.shape[1], img.shape[0])
        got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        assert (got == img).all()
    # explicit extremes: 0, 127, 128, 255 in one image
    img = _tiles_image(np.array([[0, 127], [128, 255]]))
    _, _, raw = decode_jpeg_gray(encode_jpeg_gray(img))
    assert (np.frombuffer(raw, dtype=np.uint8).reshape(16, 16) == img).all()


def test_entropy_layer_roundtrips_random_coefficient_blocks():
    """Huffman + category/extend + run-length coding is EXACT for any
    coefficient stream the tables can express — tested directly, without
    the DCT in the loop, including runs > 15 (ZRL) and EOB."""
    rng = np.random.default_rng(11)
    dc_codes = _build_codes(DC_COUNTS, DC_SYMBOLS)
    ac_codes = _build_codes(AC_COUNTS, AC_SYMBOLS)
    blocks = []
    for _ in range(50):
        zz = [0] * 64
        zz[0] = int(rng.integers(-1023, 1024))
        for _k in range(int(rng.integers(0, 8))):
            zz[int(rng.integers(1, 64))] = int(rng.integers(-255, 256))
        blocks.append(zz)
    blocks.append([5] + [0] * 63)            # pure EOB
    blocks.append([0] * 63 + [3])            # 62-zero run: ZRL + offset
    bw = _BitWriter()
    prev = 0
    for zz in blocks:
        diff = zz[0] - prev
        prev = zz[0]
        s = _category(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for coeff in zz[1:]:
            if coeff == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _category(coeff)
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(coeff if coeff > 0 else coeff + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]
            bw.write(code, ln)
    bw.flush()
    dc_map = _build_decode_map(DC_COUNTS, DC_SYMBOLS)
    ac_map = _build_decode_map(AC_COUNTS, AC_SYMBOLS)
    br = _BitReader(bytes(bw.buf), 0)
    prev = 0
    for zz in blocks:
        out = [0] * 64
        s = br.read_symbol(dc_map)
        prev += _extend(br.read_bits(s), s)
        out[0] = prev
        k = 1
        while k < 64:
            sym = br.read_symbol(ac_map)
            run, s = sym >> 4, sym & 0xF
            if s == 0:
                if run == 15:
                    k += 16
                    continue
                break
            k += run
            out[k] = _extend(br.read_bits(s), s)
            k += 1
        assert out == zz


def test_general_image_bounded_error_and_fixed_point():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    w, h, raw = decode_jpeg_gray(encode_jpeg_gray(img))
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(int)
    # quantization error bound: AC step 16 over 63 coeffs keeps baseline
    # error well under this
    assert np.abs(got - img.astype(int)).max() < 64
    # decode∘encode is a fixed point on its own output
    w2, h2, raw2 = decode_jpeg_gray(encode_jpeg_gray(got))
    assert raw2 == raw


def test_byte_stuffing_survives_ff_bytes_in_entropy_data():
    # many distinct tiles make some 0xFF entropy bytes overwhelmingly
    # likely; correctness of unstuffing shows as an exact round-trip
    tiles = (np.arange(64).reshape(8, 8) * 4 + 1) % 256
    img = _tiles_image(tiles)
    data = encode_jpeg_gray(img)
    _, _, raw = decode_jpeg_gray(data)
    assert (np.frombuffer(raw, dtype=np.uint8).reshape(64, 64) == img).all()


def test_rejects_unsupported_variants():
    img = _tiles_image(np.array([[10, 20], [30, 40]]))
    data = bytearray(encode_jpeg_gray(img))
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01" + bytes(data))  # no SOI
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(data).find(b"\xff\xc0")
    prog = data[:i] + b"\xff\xc2" + data[i + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(prog))
    # 3-component SOF header must be rejected
    j = i + 4  # len(2) + precision(1) -> dims
    sof = bytearray(data)
    sof[j + 5] = 3  # ncomp byte
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(sof))


def test_encoder_requires_multiple_of_eight():
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((12, 16), dtype=np.uint8))


def test_marker_layout_is_conventional():
    """The stream must be a well-formed marker sequence a standard decoder
    would accept: SOI, then length-delimited segments, scan, EOI."""
    img = _tiles_image(np.array([[1, 2], [3, 4]]))
    data = encode_jpeg_gray(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    pos = 2
    seen = []
    while data[pos + 1] != 0xDA:
        assert data[pos] == 0xFF
        seen.append(data[pos + 1])
        pos += 2 + struct.unpack(">H", data[pos + 2 : pos + 4])[0]
    assert 0xDB in seen and 0xC0 in seen and seen.count(0xC4) == 2


def test_encode_bitstream_is_stable_golden():
    """The EXACT encoded bytes are pinned, not just the roundtrip: media
    fixture caches are keyed by name only (operators/multimodal.py
    _cached_fixture_dir), and exact-dedup digests payload bytes — a future
    encoder 'optimization' that emits a different-but-valid bitstream
    would silently desync cached fixtures from freshly computed values.
    Hashes recorded from the r7 encoder (bit-identical to the original
    bit-at-a-time implementation on a 68-case corpus)."""
    import hashlib

    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, size=(32, 40)).astype(np.uint8)
    assert (
        hashlib.md5(encode_jpeg_gray(img)).hexdigest()
        == "da1a45a94760ed9310c23f0fceee32f4"
    )
    tiles = (np.arange(64).reshape(8, 8) * 37 % 256).astype(np.int64)
    img2 = np.kron(tiles, np.ones((8, 8), dtype=np.int64))
    assert (
        hashlib.md5(encode_jpeg_gray(img2)).hexdigest()
        == "09ab7a5dfde14a36a07a4f6faac6b60b"
    )
