"""Lossy WebP (VP8 keyframe) codec tests — r9 (VERDICT r8 ask #1).

Two layers of evidence:

1. **Self-contained** (always run): boolean-coder fuzz round-trip,
   DC-exact encoder↔decoder round-trips, hand-built transform
   vectors, typed-error gates.
2. **Differential** (skipped when the system libwebp is absent): the
   from-scratch decoder must reproduce libwebp's YUV output
   BIT-EXACTLY on libwebp-encoded streams across qualities, sizes,
   and content classes (segmentation, B_PRED sub-modes, the normal
   loop filter at q0's strongest levels), and libwebp must decode
   THIS encoder's streams bit-identically — two independent
   implementations of RFC 6386 agreeing on every pixel.
"""

from __future__ import annotations

import numpy as np
import pytest

from lsdm_motogp_data_integration_spark.operators import vp8codec as v8
from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
)

try:
    import _webpref as wr
except ImportError:  # tests run from repo root
    from tests import _webpref as wr

HAVE_LIBWEBP = wr.load() is not None
needs_libwebp = pytest.mark.skipif(
    not HAVE_LIBWEBP, reason="system libwebp not available"
)


def _towebp(payload: bytes) -> bytes:
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP"
            + chunk)


def test_bool_coder_roundtrip_fuzz():
    """The big-int boolean encoder and the §7 decoder agree on
    random (prob, bit) sequences — the foundation everything else
    stands on."""
    rng = np.random.RandomState(0)
    for _ in range(60):
        n = rng.randint(1, 500)
        probs = rng.randint(1, 255, n)
        bits = rng.randint(0, 2, n)
        be = v8._BoolEnc()
        for p, b in zip(probs, bits):
            be.put(int(p), int(b))
        bd = v8._BoolDec(be.finish())
        assert [bd.get(int(p)) for p in probs] == list(bits)


def test_idct_dc_exactness():
    """DC-only inverse DCT emits (c+4)>>3 — with quantizer step 4
    and coefficient token 2·r, the residual r is reproduced EXACTLY
    (the property the fixture encoder builds on)."""
    for r in range(-120, 121, 7):
        out = v8._idct4x4([2 * r * 4] + [0] * 15)
        assert out == [r] * 16, r
    # a non-DC vector stays integer and bounded
    out = v8._idct4x4([100, -80, 60, 0, 30] + [0] * 11)
    assert all(isinstance(x, int) for x in out)


def test_iwht_dc():
    """Walsh-Hadamard inverse of a DC-only Y2 block spreads the DC
    evenly: in[0]=x → all 16 outputs (x+3)>>3 per §14.3."""
    for x in (0, 8, 80, -80, 161):
        out = v8._iwht4x4([x] + [0] * 15)
        assert out == [(x + 3) >> 3] * 16


def test_encoder_decoder_roundtrip_flat():
    """Piecewise-flat content round-trips LOSSLESSLY through the
    lossy codec (DC-exact subset) — gray and RGB, odd dims."""
    rng = np.random.RandomState(2)
    tiles = rng.randint(0, 256, (3, 4), dtype=np.uint8)
    img = np.kron(tiles, np.ones((16, 16), np.uint8))
    for arr in (img, img[:37, :51]):
        blob = v8.encode_vp8(arr)
        y, u, v = v8.decode_vp8(blob)
        ty, tu, tv = v8._rgb_to_yuv(np.repeat(arr[:, :, None], 3, 2))
        assert np.array_equal(y, ty)
        assert np.array_equal(u, tu)
        assert np.array_equal(v, tv)
        # canonical RGB of a gray input is gray
        rgb = v8.decode_webp_lossy(blob)
        assert rgb.shape == (arr.shape[0], arr.shape[1], 3)
        assert (rgb[:, :, 0] == rgb[:, :, 1]).all()


def test_encoder_rejects_non_flat():
    rng = np.random.RandomState(3)
    noisy = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    with pytest.raises(MediaFormatError, match="flat"):
        v8.encode_vp8(noisy)


def test_decode_gates():
    """Typed errors on malformed input: truncation, bad start code,
    interframe, zero dims."""
    img = np.full((16, 16), 90, np.uint8)
    blob = bytearray(v8.encode_vp8(img))
    with pytest.raises(MediaFormatError, match="truncated"):
        v8.decode_vp8(bytes(blob[:6]))
    bad = bytearray(blob)
    bad[3] = 0x00
    with pytest.raises(MediaFormatError, match="start code"):
        v8.decode_vp8(bytes(bad))
    bad = bytearray(blob)
    bad[0] |= 1  # interframe flag
    with pytest.raises(MediaFormatError, match="interframe"):
        v8.decode_vp8(bytes(bad))
    # every-prefix truncation never hangs and raises typed errors
    for cut in range(len(blob)):
        try:
            v8.decode_vp8(bytes(blob[:cut]))
        except (MediaFormatError, NotImplementedError):
            pass


@needs_libwebp
def test_differential_decode_vs_libwebp():
    """THE pin: this decoder reproduces libwebp's YUV output
    bit-exactly on libwebp-encoded lossy streams — random noise,
    photo-like waves, gradients, hard edges, heterogeneous content
    (triggers segmentation), odd/tiny dims, quality 0..100 (q0 has
    the strongest loop filtering)."""
    rng = np.random.RandomState(42)
    het = np.zeros((96, 128, 3), np.uint8)
    het[:48, :64] = 200
    het[:48, 64:] = rng.randint(0, 256, (48, 64, 3))
    het[48:, :64] = (np.arange(64)[None, :, None] * 4).astype(np.uint8)
    het[48:, 64:] = 30
    cases = {
        "noise": rng.randint(0, 256, (48, 64, 3), dtype=np.uint8),
        "photo": (128 + 90 * np.sin(np.arange(80)[:, None, None] / 11)
                  * np.cos(np.arange(96)[None, :, None] / 13)
                  * np.ones((1, 1, 3))).astype(np.uint8),
        "het": het,
        "edges": np.kron(
            rng.randint(0, 2, (6, 8), dtype=np.uint8) * 255,
            np.ones((8, 8), np.uint8))[:, :, None].repeat(3, 2),
        "tiny": rng.randint(0, 256, (3, 5, 3), dtype=np.uint8),
        "odd": rng.randint(0, 256, (37, 51, 3), dtype=np.uint8),
    }
    for q in (0, 25, 75, 100):
        for name, img in cases.items():
            blob = wr.encode_rgb(img, q)
            ref = wr.decode_yuv(blob)
            mine = v8.decode_vp8(blob[20:])
            for a, b in zip(ref, mine):
                assert np.array_equal(a, b), (q, name)


@needs_libwebp
def test_differential_encode_to_libwebp():
    """libwebp decodes THIS encoder's streams identically to this
    decoder — including nonzero loop-filter levels (both filter
    types, every sharpness), and multiple token partitions."""
    rng = np.random.RandomState(3)
    tiles = rng.randint(0, 256, (12, 16), dtype=np.uint8)
    img = np.kron(tiles, np.ones((4, 4), np.uint8))
    for ft in (0, 1):
        for lvl in (0, 15, 40, 63):
            for sh in (0, 3, 7):
                payload = v8.encode_vp8(
                    img, filter_level=lvl, filter_type=ft, sharpness=sh)
                ref = wr.decode_yuv(_towebp(payload))
                mine = v8.decode_vp8(payload)
                for a, b in zip(ref, mine):
                    assert np.array_equal(a, b), (ft, lvl, sh)
    for nparts in (2, 4, 8):
        payload = v8.encode_vp8(img, nparts=nparts)
        ref = wr.decode_yuv(_towebp(payload))
        mine = v8.decode_vp8(payload)
        for a, b in zip(ref, mine):
            assert np.array_equal(a, b), nparts


@needs_libwebp
def test_differential_bmode_rows():
    """Sub-mode probability-table agreement: flat content encoded
    with every sub-mode in the interior (any predictor is exact on
    flat pixels) — libwebp must read back the same modes, pinning
    the KF_BMODE_PROBS enum-order remap documented in vp8tables."""
    flat = np.full((48, 48), 90, np.uint8)
    for m in range(10):
        sm = np.zeros((12, 12), np.int64)
        sm[1:, 1:] = m
        try:
            payload = v8.encode_vp8(flat, submodes=sm)
        except MediaFormatError:
            continue  # above-right-dependent modes at the frame edge
        ref = wr.decode_yuv(_towebp(payload))
        mine = v8.decode_vp8(payload)
        assert np.array_equal(ref[0], mine[0]), m


@needs_libwebp
def test_differential_alpha_plane():
    """ALPH decode (r9): alpha planes from libwebp's RGBA encoder —
    both compression methods (raw and headerless-VP8L) — must
    reproduce libwebp's decoded alpha BYTE-EXACTLY (the color
    channels use this engine's canonical conversion, so only alpha
    compares against libwebp's fancy-upsampled RGBA)."""
    from lsdm_motogp_data_integration_spark.operators import (
        webpcodec as wc,
    )

    rng = np.random.RandomState(9)
    alphas = (
        (np.arange(40)[:, None] * 6).astype(np.uint8)
        + np.zeros((40, 56), np.uint8),
        rng.randint(0, 256, (40, 56), dtype=np.uint8),
        rng.randint(0, 2, (40, 56), dtype=np.uint8) * 255,
    )
    comps = set()
    for alpha in alphas:
        img = rng.randint(0, 256, (40, 56, 4), dtype=np.uint8)
        img[:, :, 3] = alpha
        for q in (30, 75, 95):
            blob = wr.encode_rgba(img, q)
            i = blob.find(b"ALPH")
            assert i > 0
            comps.add(blob[i + 8] & 3)
            ref = wr.decode_rgba(blob)
            mine = wc.decode_webp(blob)
            mya = (mine[:, :, 3] if mine.shape[2] == 4
                   else np.full(mine.shape[:2], 255, np.uint8))
            assert np.array_equal(mya, ref[:, :, 3]), q
    assert comps == {0, 1}  # raw AND compressed planes exercised


def test_alpha_plane_filters_roundtrip():
    """The three ALPH filters (horizontal/vertical/gradient) —
    libwebp's simple encoder never emits them, so hand-built raw
    planes are FORWARD-filtered here with the container spec's
    predictor definitions and must unfilter back exactly."""
    from lsdm_motogp_data_integration_spark.operators import (
        webpcodec as wc,
    )

    rng = np.random.RandomState(4)
    a = rng.randint(0, 256, (9, 13), dtype=np.uint8).astype(np.int32)
    h, w = a.shape

    def clip(v):
        return 0 if v < 0 else (255 if v > 255 else v)

    for filt in (0, 1, 2, 3):
        res = np.zeros((h, w), np.int32)
        for y in range(h):
            for x in range(w):
                if filt == 0:
                    pred = 0
                elif y == 0:
                    pred = 0 if x == 0 else a[0, x - 1]
                elif filt == 1:
                    pred = a[y - 1, 0] if x == 0 else a[y, x - 1]
                elif filt == 2:
                    pred = a[y - 1, x]
                else:
                    left = a[y - 1, 0] if x == 0 else a[y, x - 1]
                    tl = a[y - 1, 0] if x == 0 else a[y - 1, x - 1]
                    pred = clip(left + a[y - 1, x] - tl)
                res[y, x] = (a[y, x] - pred) & 255
        body = bytes([filt << 2]) + res.astype(np.uint8).tobytes()
        out = wc.decode_alpha_plane(body, w, h)
        assert np.array_equal(out, a.astype(np.uint8)), filt
    # reserved compression method raises typed
    with pytest.raises(MediaFormatError, match="reserved"):
        wc.decode_alpha_plane(b"\x03" + bytes(9 * 13), 13, 9)
    with pytest.raises(MediaFormatError, match="truncated|empty"):
        wc.decode_alpha_plane(b"", 13, 9)
