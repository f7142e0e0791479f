"""CCITT Group 4 (T.6): a HAND-COMPUTED bit vector (mode selection +
T.4 run codes worked out on paper — not via the encoder), roundtrips
over every mode-exercising raster shape, makeup-code runs, the TIFF
compression-4 container path, and the honest gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lsdm_motogp_data_integration_spark.operators import mediacodec as mc
from lsdm_motogp_data_integration_spark.operators.faxcodec import (
    decode_g4,
    encode_g4,
)


def test_hand_computed_vector():
    """8×2: row 0 all white, row 1 black in cols 2..5 — coded by hand:

    row 0: no transitions, a1=8, ref empty → b1=8 → V0          '1'
    row 1: a1=2 vs b1=8 → H '001' + white-2 '0111' + black-4 '011',
           then a1=8, b1=8 → V0 '1'
    EOFB = (000000000001)×2; 1-padding to 5 bytes.
    bits: 1 0010111011 1 EOFB 1111 → 97 70 01 00 1F
    """
    blob = bytes([0x97, 0x70, 0x01, 0x00, 0x1F])
    img = decode_g4(blob, 8, 2)
    exp = np.zeros((2, 8), bool)
    exp[1, 2:6] = True
    assert np.array_equal(img, exp)
    # the encoder must produce these exact bytes for this raster
    assert encode_g4(exp) == blob


def test_roundtrip_mode_coverage():
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:40, 0:120]
    cases = [
        np.zeros((4, 8), bool),                     # V0 only
        np.ones((3, 5), bool),                      # H with run 0
        rng.rand(20, 37) > 0.5,                     # dense noise
        rng.rand(8, 3000) > 0.97,                   # makeup-code runs
        np.tile((np.arange(64) % 2).astype(bool), (10, 1)),
        (yy - 20) ** 2 + (xx - 60) ** 2 < 250,      # smooth edges: V±
        np.eye(17, 23, dtype=bool),                 # diagonal: VR1
        rng.rand(30, 61) > 0.1,                     # mostly black
    ]
    # pass-mode-heavy: a wide bar that disappears next row
    bar = np.zeros((4, 50), bool)
    bar[0, 5:45] = True
    bar[1, 10:12] = True
    bar[2, 5:45] = True
    cases.append(bar)
    for img in cases:
        got = decode_g4(encode_g4(img), img.shape[1], img.shape[0])
        assert np.array_equal(got, img), img.shape


def test_run_longer_than_2623_uses_chained_makeups():
    img = np.zeros((2, 6000), bool)
    img[1, 5990:] = True
    got = decode_g4(encode_g4(img), 6000, 2)
    assert np.array_equal(got, img)


def test_gates_and_corruption():
    img = np.zeros((3, 10), bool)
    blob = encode_g4(img)
    # EOFB before the declared height
    with pytest.raises(mc.MediaFormatError, match="EOFB"):
        decode_g4(blob, 10, 5)
    # extension / uncompressed mode code
    ext = bytes([0b00000010]) + b"\x00" * 4  # 0000001...
    with pytest.raises(NotImplementedError, match="extension"):
        decode_g4(ext, 10, 1)
    with pytest.raises(mc.MediaFormatError):
        decode_g4(b"", 10, 1)
    with pytest.raises(mc.MediaFormatError):
        decode_g4(blob, 0, 3)


def _g4_tiff(
    strips: list[bytes],
    w: int,
    h: int,
    rps: int,
    photometric: int = 0,
    t6_options: int | None = None,
) -> bytes:
    """Hand-built little-endian TIFF wrapping G4 strips."""
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    offs = []
    for s in strips:
        offs.append(len(out))
        out += s
    tags = [
        (256, 3, [w]),
        (257, 3, [h]),
        (258, 3, [1]),
        (259, 3, [4]),
        (262, 3, [photometric]),
        (273, 4, offs),
        (277, 3, [1]),
        (278, 3, [rps]),
        (279, 4, [len(s) for s in strips]),
    ]
    if t6_options is not None:
        tags.append((293, 4, [t6_options]))
    tags.sort()
    n = len(tags)
    ifd = len(out)
    ex_base = ifd + 2 + 12 * n + 4
    ents = b""
    extra = bytearray()
    for tag, ftype, vals in tags:
        fmt = {3: "H", 4: "I"}[ftype]
        dat = b"".join(struct.pack("<" + fmt, v) for v in vals)
        if len(dat) <= 4:
            ents += struct.pack("<HHI", tag, ftype, len(vals)) + dat.ljust(
                4, b"\x00"
            )
        else:
            ents += struct.pack(
                "<HHII", tag, ftype, len(vals), ex_base + len(extra)
            )
            extra += dat
    out += struct.pack("<H", n) + ents + struct.pack("<I", 0) + extra
    struct.pack_into("<I", out, 4, ifd)
    return bytes(out)


def test_g4_tiff_decode_and_strips():
    rng = np.random.RandomState(7)
    img = rng.rand(12, 30) > 0.6
    # single strip
    blob = _g4_tiff([encode_g4(img)], 30, 12, 12)
    assert mc.sniff_format(blob) == "tiff"
    dec = mc.decode_image(blob)
    assert np.array_equal(dec, np.where(img, 0, 255).astype(np.uint8))
    # two strips of 6 rows, independent T.6 streams
    blob2 = _g4_tiff(
        [encode_g4(img[:6]), encode_g4(img[6:])], 30, 12, 6
    )
    assert np.array_equal(mc.decode_image(blob2), dec)
    # gates: uncompressed-mode option, non-fax photometric
    with pytest.raises(NotImplementedError, match="uncompressed"):
        mc.decode_image(
            _g4_tiff([encode_g4(img)], 30, 12, 12, t6_options=2)
        )
    with pytest.raises(NotImplementedError, match="photometric"):
        mc.decode_image(
            _g4_tiff([encode_g4(img)], 30, 12, 12, photometric=1)
        )


def test_mh_and_g3_roundtrips():
    from lsdm_motogp_data_integration_spark.operators.faxcodec import (
        decode_g3,
        decode_mh,
        encode_g3,
        encode_mh,
    )

    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:30, 0:90]
    cases = [
        np.zeros((4, 8), bool),
        np.ones((3, 5), bool),
        rng.rand(20, 37) > 0.5,
        rng.rand(6, 3000) > 0.97,
        (yy - 15) ** 2 + (xx - 45) ** 2 < 150,
    ]
    for img in cases:
        h, w = img.shape
        assert np.array_equal(decode_mh(encode_mh(img), w, h), img)
        for twod in (False, True):
            got = decode_g3(
                encode_g3(img, two_d=twod), w, h, two_d=twod
            )
            assert np.array_equal(got, img), (img.shape, twod)
    # G3 missing EOL is loud
    with pytest.raises(mc.MediaFormatError, match="EOL"):
        decode_g3(b"\xff\xff\xff\xff", 8, 1)


def test_mh_hand_computed_row():
    """1D MH by hand: an 8-wide row, white 2 then black 6:
    white-2 '0111' + black-6 '0010' → '01110010' = 0x72."""
    from lsdm_motogp_data_integration_spark.operators.faxcodec import (
        decode_mh,
        encode_mh,
    )

    exp = np.zeros((1, 8), bool)
    exp[0, 2:] = True
    assert np.array_equal(decode_mh(bytes([0x72]), 8, 1), exp)
    assert encode_mh(exp) == bytes([0x72])


def test_mh_and_g3_tiff_paths():
    from lsdm_motogp_data_integration_spark.operators.faxcodec import (
        encode_g3,
        encode_mh,
    )

    rng = np.random.RandomState(13)
    img = rng.rand(10, 24) > 0.6
    exp = np.where(img, 0, 255).astype(np.uint8)

    def tiff(strips, comp, rps, t4=None):
        b = _g4_tiff(strips, 24, 10, rps)
        # patch compression tag (259) and optionally add T4Options
        i = b.index(struct.pack("<HH", 259, 3))
        bb = bytearray(b)
        struct.pack_into("<I", bb, i + 8, comp)
        if t4 is not None:
            # rebuild with the tag via the helper's own path instead
            return _g4_tiff_with_t4(strips, 24, 10, rps, comp, t4)
        return bytes(bb)

    def _g4_tiff_with_t4(strips, w, h, rps, comp, t4):
        base = _g4_tiff(strips, w, h, rps, t6_options=t4)
        bb = bytearray(base)
        i = base.index(struct.pack("<HH", 259, 3))
        struct.pack_into("<I", bb, i + 8, comp)
        j = base.index(struct.pack("<HH", 293, 4))
        struct.pack_into("<H", bb, j, 292)  # retag 293 -> 292
        return bytes(bb)

    assert np.array_equal(
        mc.decode_image(tiff([encode_mh(img)], 2, 10)), exp
    )
    assert np.array_equal(
        mc.decode_image(tiff([encode_g3(img)], 3, 10)), exp
    )
    blob2d = tiff([encode_g3(img, two_d=True)], 3, 10, t4=1)
    assert np.array_equal(mc.decode_image(blob2d), exp)
    # two strips, 2D G3 (each strip restarts its reference line)
    two = _g4_tiff_with_t4(
        [encode_g3(img[:5], two_d=True), encode_g3(img[5:], two_d=True)],
        24, 10, 5, 3, 1,
    )
    assert np.array_equal(mc.decode_image(two), exp)


def _tiled_tiff(
    tiles: list[bytes],
    w: int,
    h: int,
    tw: int,
    th: int,
    comp: int,
    spp: int = 1,
    photometric: int = 0,
    predictor: int | None = None,
    jpeg_tables: bytes | None = None,
) -> bytes:
    """Hand-built little-endian TILED TIFF (tags 322-325)."""
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    offs = []
    for s in tiles:
        offs.append(len(out))
        out += s
    bps = 1 if comp in (2, 3, 4) else 8
    tags = [
        (256, 3, [w]),
        (257, 3, [h]),
        (258, 3, [bps] * spp),
        (259, 3, [comp]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (322, 3, [tw]),
        (323, 3, [th]),
        (324, 4, offs),
        (325, 4, [len(s) for s in tiles]),
    ]
    if predictor is not None:
        tags.append((317, 3, [predictor]))
    if jpeg_tables is not None:
        tags.append((347, 7, jpeg_tables))
    tags.sort()
    n = len(tags)
    ifd = len(out)
    ex_base = ifd + 2 + 12 * n + 4
    ents = b""
    extra = bytearray()
    for tag, ftype, vals in tags:
        if ftype == 7:
            dat = bytes(vals)
        else:
            fmt = {3: "H", 4: "I"}[ftype]
            dat = b"".join(struct.pack("<" + fmt, v) for v in vals)
        if len(dat) <= 4:
            ents += struct.pack(
                "<HHI", tag, ftype, len(vals)
            ) + dat.ljust(4, b"\x00")
        else:
            ents += struct.pack(
                "<HHII", tag, ftype, len(vals), ex_base + len(extra)
            )
            extra += dat
    out += struct.pack("<H", n) + ents + struct.pack("<I", 0) + extra
    struct.pack_into("<I", out, 4, ifd)
    return bytes(out)


def _tiles_of(img, tw, th, pad_val):
    h, w = img.shape[:2]
    tiles = []
    for y0 in range(0, h, th):
        for x0 in range(0, w, tw):
            pad_shape = (th, tw) + img.shape[2:]
            tile = np.full(pad_shape, pad_val, dtype=img.dtype)
            sub = img[y0 : y0 + th, x0 : x0 + tw]
            tile[: sub.shape[0], : sub.shape[1]] = sub
            tiles.append(tile)
    return tiles


def test_tiled_tiff_g4_and_uncompressed():
    rng = np.random.RandomState(17)
    # bilevel 20x40 in 16x16 tiles (edge tiles padded)
    img = rng.rand(20, 40) > 0.5
    tiles = [encode_g4(t) for t in _tiles_of(img, 16, 16, False)]
    blob = _tiled_tiff(tiles, 40, 20, 16, 16, 4)
    assert np.array_equal(
        mc.decode_image(blob), np.where(img, 0, 255).astype(np.uint8)
    )
    # 8-bit gray uncompressed tiles
    g = rng.randint(0, 256, (20, 40), np.uint8)
    raw_tiles = [t.tobytes() for t in _tiles_of(g[:, :, None], 16, 16, 0)]
    blob = _tiled_tiff(raw_tiles, 40, 20, 16, 16, 1, spp=1, photometric=1)
    assert np.array_equal(mc.decode_image(blob), g)


def test_tiled_tiff_lzw_rgb_and_jpeg():
    import sys

    sys.path.insert(0, "tests")
    from test_container_info import _split_jpeg_tables, _tiff_lzw_encode

    from lsdm_motogp_data_integration_spark.operators.jpegcodec import (
        encode_jpeg,
    )

    rng = np.random.RandomState(19)
    rgb = rng.randint(0, 256, (20, 40, 3), np.uint8)
    tiles = [
        _tiff_lzw_encode(t.tobytes())
        for t in _tiles_of(rgb, 16, 16, 0)
    ]
    blob = _tiled_tiff(tiles, 40, 20, 16, 16, 5, spp=3, photometric=2)
    assert np.array_equal(mc.decode_image(blob), rgb)
    # JPEG tiles with shared JPEGTables: constant-block exact fixture
    blocks = rng.randint(0, 256, (4, 6), np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)  # 32x48
    flat8 = np.full((8, 8), 8, np.int64)
    full = [
        encode_jpeg(t, quant=flat8)
        for t in _tiles_of(img, 16, 16, 0)
    ]
    split = [_split_jpeg_tables(f) for f in full]
    jt = split[0][0]
    assert all(t == jt for t, _s in split)
    jblob = _tiled_tiff(
        [s for _t, s in split], 48, 32, 16, 16, 7, spp=1,
        photometric=1, jpeg_tables=jt,
    )
    assert np.array_equal(mc.decode_image(jblob), img)
