"""PNG Adam7 interlace + 16-bit depth (r6): hand-built containers
(real zlib streams, per-pass filtering serialized independently per
the spec) decoded back to the exact source pixels; full-fidelity
uint16 output for 16-bit sources; sub-byte depths at every
interlace mode (the r7 combined case closed the last PNG gate)."""

import struct
import zlib

import numpy as np
import pytest

from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    _ADAM7,
    _decode_png,
    decode_image,
    encode_png,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _build_png(
    arr: np.ndarray,
    *,
    depth: int = 8,
    interlace: int = 0,
    sub_rows: frozenset[int] = frozenset(),
) -> bytes:
    """Serialize ``(H, W[, C])`` uint8/uint16 with real zlib
    compression. ``sub_rows``: raster/pass row indices written with
    the Sub filter (forward-filtered here, exercising the multi-byte
    bpp path); all other rows use filter 0."""
    if arr.ndim == 2:
        ctype_i = 0
        flat = arr[:, :, None]
    else:
        ctype_i = {3: 2, 4: 6}[arr.shape[2]]
        flat = arr
    h, w, nch = flat.shape
    sb = depth // 8
    be = flat.astype(">u2" if depth == 16 else np.uint8)

    def serialize_rows(grid: np.ndarray) -> bytes:
        gh, gw = grid.shape[:2]
        bpp = nch * sb
        out = bytearray()
        for y in range(gh):
            row = grid[y].tobytes()
            if y in sub_rows:
                rb = bytearray(row)
                for x in range(len(rb) - 1, bpp - 1, -1):
                    rb[x] = (rb[x] - rb[x - bpp]) & 0xFF
                out += b"\x01" + bytes(rb)
            else:
                out += b"\x00" + row
        return bytes(out)

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = be[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += serialize_rows(sub)
        raw = bytes(raw)
    else:
        raw = serialize_rows(be)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype_i, 0, 0, interlace)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_adam7_gray_roundtrip():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, size=(11, 5), dtype=np.uint8)
    assert np.array_equal(decode_image(_build_png(a, interlace=1)), a)


def test_adam7_rgb_with_sub_filter_rows():
    rng = np.random.RandomState(8)
    a = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    b = _build_png(a, interlace=1, sub_rows=frozenset({0, 1, 2}))
    assert np.array_equal(decode_image(b), a)


def test_adam7_tiny_images_skip_empty_passes():
    # 1×1 has only pass 1; 2×2 exercises passes 1/4/6/7 empty-handling
    for shape in ((1, 1), (2, 2), (3, 1), (1, 9)):
        rng = np.random.RandomState(sum(shape))
        a = rng.randint(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_image(_build_png(a, interlace=1)), a)


def test_16bit_gray_full_fidelity():
    rng = np.random.RandomState(9)
    a = rng.randint(0, 65536, size=(6, 7), dtype=np.uint16)
    dec = decode_image(_build_png(a, depth=16))
    assert dec.dtype == np.uint16
    assert np.array_equal(dec, a)


def test_16bit_rgb_with_sub_filter():
    rng = np.random.RandomState(10)
    a = rng.randint(0, 65536, size=(5, 4, 3), dtype=np.uint16)
    b = _build_png(a, depth=16, sub_rows=frozenset({1, 3}))
    dec = decode_image(b)
    assert dec.dtype == np.uint16
    assert np.array_equal(dec, a)


def test_16bit_adam7_combined():
    rng = np.random.RandomState(11)
    a = rng.randint(0, 65536, size=(10, 9), dtype=np.uint16)
    dec = decode_image(_build_png(a, depth=16, interlace=1))
    assert np.array_equal(dec, a)


def test_16bit_features_normalized_to_unit_range():
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        _real_features,
    )

    a = np.full((8, 8), 65535, dtype=np.uint16)
    _digest, vec = _real_features(_build_png(a, depth=16), 16)
    # layout: [w, h, ch, mean, std, min, max, ...hist]
    assert vec[3] == pytest.approx(1.0)  # mean of all-max = 1.0
    assert vec[6] == pytest.approx(1.0)  # max
    assert all(v <= 1.00001 for v in vec[3:])


def test_corrupted_depth_fails_loudly():
    # sub-byte depths are now SUPPORTED (tests below) — a depth byte
    # flipped on an 8-bit raster must still fail LOUDLY, as the
    # packed-stride arithmetic disagrees with the raster byte count
    a = np.zeros((4, 4), dtype=np.uint8)
    b = bytearray(_build_png(a))
    ihdr = bytearray(b[16:29])
    ihdr[8] = 4
    rebuilt = (
        _SIG
        + _chunk(b"IHDR", bytes(ihdr))
        + bytes(b[8 + 25 :])
    )
    from lsdm_motogp_data_integration_spark.operators.mediacodec import (
        MediaFormatError,
    )

    with pytest.raises(MediaFormatError):
        _decode_png(rebuilt)


def test_encoder_output_still_decodes_after_refactor():
    rng = np.random.RandomState(12)
    a = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_image(encode_png(a, filters=[0, 1, 2, 3, 4])), a
    )


def _build_subbyte_png(
    samples: np.ndarray,
    depth: int,
    ctype_i: int,
    plte: bytes | None = None,
    sub_rows: frozenset[int] = frozenset(),
    interlace: int = 0,
) -> bytes:
    """(H, W) integer samples < 2^depth, packed MSB-first per row
    (rows padded to byte boundaries per spec), optional Sub filter
    rows (bpp=1 on the packed bytes).  ``interlace=1`` serializes the
    seven Adam7 passes, each packed at ITS OWN stride."""
    h, w = samples.shape

    def pack_grid(grid: np.ndarray) -> bytes:
        gh, gw = grid.shape
        out = bytearray()
        for y in range(gh):
            bits = np.zeros(((gw * depth + 7) // 8) * 8, dtype=np.uint8)
            for x in range(gw):
                v = int(grid[y, x])
                for b in range(depth):
                    bits[x * depth + b] = (v >> (depth - 1 - b)) & 1
            row = np.packbits(bits).tobytes()
            if y in sub_rows:
                rb = bytearray(row)
                for i in range(len(rb) - 1, 0, -1):
                    rb[i] = (rb[i] - rb[i - 1]) & 0xFF
                out += b"\x01" + bytes(rb)
            else:
                out += b"\x00" + row
        return bytes(out)

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += pack_grid(sub)
        raw = bytes(raw)
    else:
        raw = pack_grid(samples)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype_i, 0, 0, interlace)
    chunks = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _chunk(b"PLTE", plte)
    return chunks + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(
        b"IEND", b""
    )


def test_1bit_gray_scales_to_full_range():
    s = (np.add.outer(np.arange(5), np.arange(9)) % 2).astype(np.uint8)
    dec = decode_image(_build_subbyte_png(s, 1, 0))
    assert np.array_equal(dec, s * 255)


def test_4bit_gray_non_byte_aligned_width():
    rng = np.random.RandomState(13)
    s = rng.randint(0, 16, (6, 5), dtype=np.uint8)  # stride 3, 4 pad bits
    dec = decode_image(_build_subbyte_png(s, 4, 0))
    assert np.array_equal(dec, s * 17)


def test_2bit_palette_with_sub_filter():
    rng = np.random.RandomState(14)
    s = rng.randint(0, 4, (7, 9), dtype=np.uint8)
    pal = bytes([10, 20, 30, 200, 100, 50, 0, 255, 128, 90, 91, 92])
    dec = decode_image(
        _build_subbyte_png(s, 2, 3, plte=pal, sub_rows=frozenset({2, 3}))
    )
    pal_arr = np.frombuffer(pal, np.uint8).reshape(4, 3)
    assert np.array_equal(dec, pal_arr[s])


def test_subbyte_gates():
    s = np.zeros((4, 4), np.uint8)
    # sub-byte RGB is illegal per spec → loud
    with pytest.raises(Exception):
        decode_image(_build_subbyte_png(s, 4, 2))


def test_1bit_gray_adam7_combined():
    """Sub-byte + Adam7 together (r7 — the last PNG gate): each pass
    packs at its OWN stride, so byte boundaries fall differently in
    every pass."""
    s = (np.add.outer(np.arange(9), np.arange(11)) % 2).astype(np.uint8)
    dec = decode_image(_build_subbyte_png(s, 1, 0, interlace=1))
    assert np.array_equal(dec, s * 255)


def test_4bit_gray_adam7_odd_width_with_sub_rows():
    rng = np.random.RandomState(15)
    s = rng.randint(0, 16, (10, 13), dtype=np.uint8)
    dec = decode_image(
        _build_subbyte_png(
            s, 4, 0, sub_rows=frozenset({0, 1}), interlace=1
        )
    )
    assert np.array_equal(dec, s * 17)


def test_2bit_palette_adam7():
    rng = np.random.RandomState(16)
    s = rng.randint(0, 4, (6, 7), dtype=np.uint8)
    pal = bytes([10, 20, 30, 200, 100, 50, 0, 255, 128, 90, 91, 92])
    dec = decode_image(
        _build_subbyte_png(s, 2, 3, plte=pal, interlace=1)
    )
    assert np.array_equal(
        dec, np.frombuffer(pal, np.uint8).reshape(4, 3)[s]
    )


def test_subbyte_adam7_tiny_images_skip_empty_passes():
    for shape in ((1, 1), (2, 3), (1, 8), (5, 1)):
        s = (np.indices(shape).sum(axis=0) % 2).astype(np.uint8)
        dec = decode_image(_build_subbyte_png(s, 1, 0, interlace=1))
        assert np.array_equal(dec, s * 255), shape
