"""Baseline JPEG codec tests (sparkfusion.llm.jpeg) — the parts the suite's
flat-block oracle can't see: the AC/entropy path (nonzero coefficients, ZRL
runs), byte stuffing, lossy quantization bounds, color, error handling, and
an independent direct-cosine-sum IDCT cross-check.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparkfusion.errors import DecodeError
from sparkfusion.llm.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _BitReader,
    _BitWriter,
    _DC_BITS,
    _DC_VALS,
    _dht,
    _dqt,
    _encode_block,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    FLAT_QUANT,
    UNZIGZAG,
    ZIGZAG,
)


def _naive_idct(zz: np.ndarray) -> np.ndarray:
    """Independent reference IDCT: direct T.81 A.3.3 double sum, no matrix
    algebra shared with the codec."""
    coef = np.zeros(64)
    coef[ZIGZAG] = zz
    coef = coef.reshape(8, 8)
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4
    return np.clip(np.floor(out + 128.5), 0, 255).astype(np.uint8)


def _jpeg_from_coefficients(blocks_zz: list[np.ndarray], w: int, h: int) -> bytes:
    """Hand-assemble a grayscale JPEG directly from quantized zigzag
    coefficients — bypasses the FDCT so arbitrary AC patterns (ZRL runs,
    max-size categories) hit the entropy coder and decoder."""
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, FLAT_QUANT)
    out += struct.pack(">HHBHHB", 0xFFC0, 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_BITS, _AC_VALS)
    out += struct.pack(">HHB", 0xFFDA, 8, 1) + bytes([1, 0x00, 0, 63, 0])
    wtr = _BitWriter()
    pred = 0
    for zz in blocks_zz:
        pred = _encode_block(wtr, zz, pred)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_zigzag_is_the_standard_scan():
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[-3:]) == [55, 62, 63]
    assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))


def test_flat_blocks_roundtrip_exactly():
    vals = np.array([[0, 255, 128], [1, 254, 37]], dtype=np.uint8)
    px = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    assert np.array_equal(decode_baseline_jpeg(encode_baseline_jpeg(px)), px)


def test_gradient_roundtrip_with_unit_quant_is_exact():
    y, x = np.mgrid[0:24, 0:32]
    px = ((x * 3 + y * 5) % 256).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(px))
    assert np.array_equal(dec, px)


def test_unaligned_dimensions_pad_and_crop():
    y, x = np.mgrid[0:10, 0:13]
    px = ((x * 7 + y * 11) % 256).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(px))
    assert dec.shape == (10, 13)
    assert np.array_equal(dec, px)


def test_color_roundtrip_within_ycbcr_rounding():
    y, x = np.mgrid[0:16, 0:16]
    base = ((x * 9 + y * 4) % 256).astype(np.uint8)
    rgb = np.stack([base, (base + 85) % 256, (base + 170) % 256], -1).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(rgb))
    assert dec.shape == (16, 16, 3)
    # double rounding through the forward+inverse color transform: |err| ≤ 3
    assert int(np.max(np.abs(dec.astype(int) - rgb.astype(int)))) <= 3


def test_lossy_quant_table_stays_bounded():
    quant = np.full(64, 16, dtype=np.uint16)
    y, x = np.mgrid[0:24, 0:24]
    px = ((x * 5 + y * 9) % 256).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(px, quant=quant))
    # worst-case per-coefficient quantization error is q/2 = 8; the IDCT
    # spreads it — a smooth gradient must stay within a couple of q steps
    assert int(np.max(np.abs(dec.astype(int) - px.astype(int)))) <= 40
    assert float(np.mean(np.abs(dec.astype(float) - px.astype(float)))) <= 8.0


def test_entropy_path_with_zrl_and_large_categories():
    """Coefficient-domain fuzz of the entropy layer: ZRL (16-zero runs),
    category-10 ACs, category-11 DC swings — decoded pixels must equal an
    INDEPENDENT direct-cosine-sum IDCT of the same coefficients."""
    b1 = np.zeros(64, dtype=np.int64)
    b1[0] = -1000      # DC category 10 swing from pred=0
    b1[1] = 500
    b1[20] = -3        # 18 zeros after index 1 → ZRL + run
    b1[63] = 1         # coefficient at the very end, no EOB
    b2 = np.zeros(64, dtype=np.int64)
    b2[0] = 1016       # DC diff 2016 → category 11
    b2[5] = -1023      # AC size 10 (max baseline)
    b2[40] = 7
    b3 = np.zeros(64, dtype=np.int64)  # all-zero block: lone EOB after DC
    b3[0] = 42

    data = _jpeg_from_coefficients([b1, b2, b3], w=24, h=8)
    dec = decode_baseline_jpeg(data)
    expected = np.concatenate([_naive_idct(b) for b in (b1, b2, b3)], axis=1)
    assert dec.shape == (8, 24)
    # same rounding rule on both sides; allow ±1 for float-path divergence
    assert int(np.max(np.abs(dec.astype(int) - expected.astype(int)))) <= 1


def test_bit_writer_stuffs_and_reader_unstuffs_ff_bytes():
    w = _BitWriter()
    w.write(0xFF, 8)
    w.write(0xFF, 8)
    w.write(0b1010, 4)
    data = w.flush()
    assert data == bytes([0xFF, 0x00, 0xFF, 0x00, 0b10101111])  # 1-padded tail
    r = _BitReader(data, 0)
    assert r.bits(8) == 0xFF and r.bits(8) == 0xFF and r.bits(4) == 0b1010


def test_decoder_rejects_progressive_and_dri():
    y, x = np.mgrid[0:8, 0:8]
    px = ((x + y) % 256).astype(np.uint8)
    data = bytearray(encode_baseline_jpeg(px))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(DecodeError, match="progressive"):
        decode_baseline_jpeg(bytes(data))
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    data2 = encode_baseline_jpeg(px)
    patched = data2[:2] + dri + data2[2:]
    with pytest.raises(DecodeError, match="restart"):
        decode_baseline_jpeg(patched)


def test_decoder_rejects_garbage_and_truncation():
    with pytest.raises(DecodeError, match="SOI"):
        decode_baseline_jpeg(b"not a jpeg")
    y, x = np.mgrid[0:8, 0:8]
    px = ((x * 3 + y) % 256).astype(np.uint8)
    data = encode_baseline_jpeg(px)
    with pytest.raises(DecodeError):
        decode_baseline_jpeg(data[: len(data) // 2])


def test_spark_mm_jpeg_matches_analytic_sums(spark):
    """End-to-end through mapInPandas for a handful of ids — the suite
    query's exactness claim, verified without DuckDB."""
    from sparkfusion.llm.multimodal import _ppm_pixel, decode_jpeg, jpeg_media_table

    ids = spark.range(5, 10).selectExpr("id AS doc_id")
    got = {
        r.media_id: (r.width, r.height, r.sum_lum)
        for r in decode_jpeg(jpeg_media_table(ids, "doc_id")).collect()
    }
    for mid in range(5, 10):
        expect = 64 * sum(
            _ppm_pixel(mid, bx, by, 0) for bx in range(3) for by in range(2)
        )
        assert got[mid] == (24, 16, expect)
