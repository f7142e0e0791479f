"""Baseline JPEG codec: decoder pinned against a hand-built stream +
an INDEPENDENT per-coefficient IDCT, encoder/decoder roundtrips, the
constant-block exactness contract the q41 oracle relies on, and the
honest gates for unsupported JPEG modes."""

import math
import struct

import numpy as np
import pytest

from lsdm_motogp_data_integration_spark.operators.jpegcodec import (
    _DC_LUMA_SPEC,
    _AC_LUMA_SPEC,
    _ZIG_TO_NAT,
    decode_jpeg,
    encode_jpeg,
)
from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
    sniff_format,
)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _hand_built_gray_jpeg() -> bytes:
    """One 8×8 grayscale block, flat quant table of 1s, Annex K luma
    Huffman tables, entropy stream written BY HAND (no encoder code):

    DC = 5  → category 3 ('100') + magnitude '101'
    AC zigzag[1] = -3 → run/size 0x02 ('01') + magnitude '00'
    EOB → '1010'
    bits: 100 101 01 00 1010 = 10010101 0010 1011₁-padded
    """
    out = bytearray(b"\xff\xd8")
    qzz = bytes([0]) + bytes([1] * 64)
    out += _seg(0xDB, qzz)
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dcb, dcv = _DC_LUMA_SPEC
    acb, acv = _AC_LUMA_SPEC
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(dcb) + bytes(dcv)
        + bytes([0x10]) + bytes(acb) + bytes(acv),
    )
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([0b10010101, 0b00101011])
    out += b"\xff\xd9"
    return bytes(out)


def _reference_idct(coef: np.ndarray) -> np.ndarray:
    """Straightforward T.81 A.3.3 double loop — independent of the
    codec's matrix formulation."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_hand_built_stream_matches_independent_idct():
    data = _hand_built_gray_jpeg()
    assert sniff_format(data) == "jpeg"
    dec = decode_jpeg(data)
    assert dec.shape == (8, 8) and dec.dtype == np.uint8
    coef = np.zeros((8, 8))
    coef[0, 0] = 5.0
    r, c = divmod(int(_ZIG_TO_NAT[1]), 8)
    assert (r, c) == (0, 1)  # zigzag position 1 is (row 0, col 1)
    coef[r, c] = -3.0
    expected = np.clip(
        np.rint(_reference_idct(coef) + 128.0), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(dec, expected)


def test_constant_block_flat8_roundtrip_is_exact():
    # the q41 real_jpeg oracle contract: constant 8×8 blocks with a
    # quant table whose DC entry is 8 reproduce every pixel exactly
    rng = np.random.RandomState(3)
    blocks = rng.randint(0, 256, size=(2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    flat8 = np.full((8, 8), 8, dtype=np.int64)
    dec = decode_jpeg(encode_jpeg(img, quant=flat8))
    assert np.array_equal(dec, img)


def test_gray_roundtrip_bounded_error_odd_dims():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(33, 41), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 16


def test_smooth_gradient_near_lossless():
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.clip(yy * 4 + xx * 2, 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 3


def test_rgb_444_and_420_roundtrip():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack(
        [
            np.clip(yy * 6, 0, 255),
            np.clip(xx * 6, 0, 255),
            np.clip(yy * 3 + xx * 3, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    d444 = decode_jpeg(encode_jpeg(img, quality=95))
    assert d444.shape == img.shape
    assert np.mean(np.abs(d444.astype(int) - img.astype(int))) < 2.0
    d420 = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert d420.shape == img.shape
    assert np.mean(np.abs(d420.astype(int) - img.astype(int))) < 4.0


def test_constant_color_420_exact():
    c = np.full((16, 16, 3), [200, 30, 90], dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(c, quality=95, subsample=True))
    assert np.array_equal(dec, c)


def test_restart_interval_changes_bytes_not_pixels():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    plain = encode_jpeg(img, quality=92)
    rst = encode_jpeg(img, quality=92, restart_interval=2)
    assert plain != rst
    assert b"\xff\xdd" in rst  # DRI segment present
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_encode_is_deterministic():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(19, 23, 3), dtype=np.uint8)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_unsupported_sof_and_corrupt_gates():
    # flip the hand-built fixture's SOF0 marker to SOF3 (lossless)
    data = bytearray(_hand_built_gray_jpeg())
    idx = data.index(b"\xff\xc0")
    data[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(data))
    # SOF2 with a baseline scan header (Ss=0, Se=63) is a CORRUPT
    # progressive stream, not a gate — loud, typed error
    data = bytearray(_hand_built_gray_jpeg())
    data[idx + 1] = 0xC2
    with pytest.raises(MediaFormatError, match="Se"):
        decode_jpeg(bytes(data))
    data = bytearray(_hand_built_gray_jpeg())
    data[idx + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(data))
    with pytest.raises(MediaFormatError):
        decode_jpeg(b"\xff\xd8\xff" + b"\x00" * 32)
    with pytest.raises(MediaFormatError):
        decode_jpeg(b"not a jpeg at all")


def test_undefined_table_ids_raise_media_format_error():
    """A corrupt-but-parseable stream whose SOF/SOS reference a DQT or
    DHT id that was never defined must fail the module's documented
    error contract (MediaFormatError), not a bare KeyError."""
    base = _hand_built_gray_jpeg()
    # SOF0 component Tq byte → undefined quant table id 3
    data = bytearray(base)
    idx = data.index(b"\xff\xc0")
    data[idx + 12] = 3
    with pytest.raises(MediaFormatError, match="undefined DQT"):
        decode_jpeg(bytes(data))
    # SOS component Td/Ta byte → undefined huffman table id 1
    data = bytearray(base)
    idx = data.index(b"\xff\xda")
    data[idx + 6] = 0x11
    with pytest.raises(MediaFormatError, match="undefined DHT"):
        decode_jpeg(bytes(data))


def test_non_integral_subsampling_raises():
    """Legal-but-exotic sampling ratios (e.g. 4:3) don't divide — the
    np.repeat upsampler would silently produce an undersized plane, so
    the decoder must refuse loudly instead."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    data = bytearray(encode_jpeg(img, quality=90, subsample=True))
    idx = data.index(b"\xff\xc0")
    data[idx + 11] = 0x44  # Y  4x4
    data[idx + 14] = 0x33  # Cb 3x3 → 4 % 3 != 0
    with pytest.raises(NotImplementedError, match="non-integral"):
        decode_jpeg(bytes(data))


def test_decode_through_media_stats_contract():
    # the multimodal dispatch path accepts jpeg end-to-end
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        _decode_canonical,
    )

    blocks = np.array([[10, 250], [130, 60]], dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    flat8 = np.full((8, 8), 8, dtype=np.int64)
    fmt, canon, info = _decode_canonical(encode_jpeg(img, quant=flat8))
    assert fmt == "jpeg" and info["kind"] == "image"
    assert info["width"] == 16 and info["height"] == 16
    assert np.array_equal(info["array"], img)


# --- progressive (SOF2) -----------------------------------------------------


def _hand_built_progressive_jpeg() -> bytes:
    """One 8×8 grayscale block, flat quant of 1s, coefficients
    DC=6, zigzag[1]=-3, zigzag[2]=5, four HAND-ASSEMBLED scans with
    hand-chosen Huffman tables (no encoder code) — pins the decoder's
    DC-first(Al=1)/AC-first(Al=1)/AC-refine/DC-refine procedures
    against bits computed on paper:

    scan1 DC first Al=1: dc>>1=3, diff size 2 ('0') + '11' → 0x7F
    scan2 AC first Ss=1 Se=63 Al=1: (-3)→t=1 sym 0x01('0')+raw '0';
      5→t=2 sym 0x02('10')+raw '10'; EOB run 1 sym 0x00('11')
      → '00101011' = 0x2B
    scan3 AC refine Ah=1 Al=0: EOB sym 0x00('0') then correction bits
      '1','1' (|-3| and |5| both odd) → 0x7F
    scan4 DC refine Ah=1 Al=0: bit 6&1=0 → 0x7F
    """
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))

    def dht(tc, bits16, vals):
        b = [0] * 16
        for i, n in enumerate(bits16):
            b[i] = n
        return _seg(0xC4, bytes([tc << 4]) + bytes(b) + bytes(vals))

    # scan 1: DC first (table: symbol 2 → '0')
    out += dht(0, [1], [2])
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    out += bytes([0b01111111])
    # scan 2: AC first (0x01→'0', 0x02→'10', 0x00→'11')
    out += dht(1, [1, 2], [0x01, 0x02, 0x00])
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    out += bytes([0b00101011])
    # scan 3: AC refine (0x00→'0')
    out += dht(1, [1], [0x00])
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    out += bytes([0b01111111])
    # scan 4: DC refine (no Huffman table)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    out += bytes([0b01111111])
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_progressive_stream_matches_independent_idct():
    dec = decode_jpeg(_hand_built_progressive_jpeg())
    assert dec.shape == (8, 8) and dec.dtype == np.uint8
    coef = np.zeros((8, 8))
    coef[0, 0] = 6.0
    coef[divmod(int(_ZIG_TO_NAT[1]), 8)] = -3.0
    coef[divmod(int(_ZIG_TO_NAT[2]), 8)] = 5.0
    expected = np.clip(
        np.rint(_reference_idct(coef) + 128.0), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(dec, expected)


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((24, 16), dict(quality=90)),
        ((19, 23), dict(quality=85)),
        ((16, 16, 3), dict(quality=92)),
        ((21, 18, 3), dict(quality=88, subsample=True)),
        ((32, 32, 3), dict(quality=80, subsample=True, restart_interval=2)),
        ((40, 24), dict(quality=95, restart_interval=3)),
    ],
)
def test_progressive_decodes_identical_to_baseline(shape, kw):
    """The same quantized coefficients emitted as SOF0 and SOF2 must
    decode to IDENTICAL pixels — progressive is a transmission
    reordering, not a different approximation.  Covers gray/RGB,
    4:2:0 (where the luma MCU padding grid exceeds the
    non-interleaved AC block grid), odd dims, and restart markers in
    every scan kind."""
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, shape, np.uint8)
    b = encode_jpeg(img, **kw)
    p = encode_jpeg(img, progressive=True, **kw)
    assert b"\xff\xc2" in p and b"\xff\xc2" not in b
    assert p.count(b"\xff\xda") > b.count(b"\xff\xda")
    db, dp = decode_jpeg(b), decode_jpeg(p)
    assert np.array_equal(db, dp)


def test_progressive_constant_blocks_exact():
    # the q41 real_jpeg_p oracle contract: same closed form as
    # baseline — constant blocks + flat-8 quant decode bit-exactly
    # through the multi-scan successive-approximation path
    rng = np.random.RandomState(9)
    blocks = rng.randint(0, 256, size=(2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    flat8 = np.full((8, 8), 8, dtype=np.int64)
    blob = encode_jpeg(img, quant=flat8, progressive=True)
    assert np.array_equal(decode_jpeg(blob), img)


def test_progressive_missing_dht_and_bad_scan_headers():
    blob = bytearray(_hand_built_progressive_jpeg())
    # drop the first DHT: the DC-first scan references an undefined table
    i = blob.index(b"\xff\xc4")
    seglen = struct.unpack(">H", blob[i + 2 : i + 4])[0]
    del blob[i : i + 2 + seglen]
    with pytest.raises(MediaFormatError, match="undefined DHT"):
        decode_jpeg(bytes(blob))
