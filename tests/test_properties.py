"""Property-based tests (hypothesis) for the pure-Python similarity
kernel — the one piece of custom algorithmic code whose domain is all
of string-space."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from lsdm_motogp_data_integration_spark.functions.similarity import (
    jaro_similarity,
    jaro_winkler_similarity,
)

text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24
)


@given(text, text)
@settings(max_examples=300, deadline=None)
def test_jw_range_and_symmetry(a, b):
    s = jaro_winkler_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaro_winkler_similarity(b, a)
    j = jaro_similarity(a, b)
    assert 0.0 <= j <= 1.0
    assert s >= j or s == j  # winkler only boosts


@given(text)
@settings(max_examples=200, deadline=None)
def test_jw_identity(a):
    expected = 0.0 if len(a) == 0 else 1.0
    assert jaro_winkler_similarity(a, a) == expected


_con = duckdb.connect()


@given(
    st.text(alphabet="abcdefgh ", max_size=16),
    st.text(alphabet="abcdefgh ", max_size=16),
)
@settings(max_examples=200, deadline=None)
def test_jw_matches_duckdb(a, b):
    ours = jaro_winkler_similarity(a, b)
    theirs = _con.execute(
        "select jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert abs(ours - theirs) < 1e-12


# ---------------------------------------------------------------------------
# Media codecs (operators/mediacodec): encode→decode roundtrips over the
# whole shape/value domain, no Spark session needed
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import strategies as _st
from hypothesis.extra.numpy import arrays as _np_arrays

from lsdm_motogp_data_integration_spark.operators import mediacodec as _mc

_dims = _st.integers(min_value=1, max_value=23)


@given(
    _np_arrays(
        np.uint8,
        _st.tuples(_dims, _dims, _st.just(3)),
        elements=_st.integers(0, 255),
    )
)
@settings(max_examples=120, deadline=None)
def test_bmp_roundtrip_any_shape(a):
    """Every (H, W, 3) image survives BMP encode→decode bit-exactly —
    widths 1..23 sweep all four row-padding residues and the
    bottom-up/BGR reorder."""
    out = _mc.decode_image(_mc.encode_bmp(a))
    assert out.shape == a.shape and np.array_equal(out, a)


@given(
    _np_arrays(
        np.uint8,
        _st.tuples(_dims, _dims),
        elements=_st.integers(0, 255),
    )
)
@settings(max_examples=80, deadline=None)
def test_pnm_roundtrips(g):
    assert np.array_equal(_mc.decode_image(_mc.encode_pgm(g)), g)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    assert np.array_equal(_mc.decode_image(_mc.encode_ppm(rgb)), rgb)


@given(
    _np_arrays(
        np.int16,
        _st.tuples(
            _st.integers(1, 200), _st.integers(1, 3)
        ),
        elements=_st.integers(-32768, 32767),
    ),
    _st.integers(1, 192000),
    _st.binary(min_size=0, max_size=31),
)
@settings(max_examples=80, deadline=None)
def test_wav_roundtrip_with_chunk_walk(s, rate, junk):
    """PCM samples of any length/channels survive encode→decode, with
    an arbitrary extra chunk injected before 'data' (odd sizes pad) —
    decoders that assume data at offset 44 fail this."""
    import struct as _struct

    extra = b"LIST" + _struct.pack("<I", len(junk)) + junk
    enc = _mc.encode_wav(s, rate, extra_chunk=extra)
    dec, r = _mc.decode_wav(enc)
    assert r == rate
    assert dec.shape == s.shape and np.array_equal(dec, s)


@given(
    _st.lists(
        _np_arrays(
            np.uint8, _st.just((4, 5)), elements=_st.integers(0, 255)
        ),
        min_size=1,
        max_size=6,
    ),
    _st.integers(1, 60),
)
@settings(max_examples=60, deadline=None)
def test_y4m_frame_extraction(frames, fps):
    clip = _mc.encode_y4m(frames, fps, 1)
    info = _mc.y4m_info(clip)
    assert info["n_frames"] == len(frames)
    assert info["frame_bytes"] == 20
    for i, f in enumerate(frames):
        assert _mc.y4m_frame(clip, info, i) == f.tobytes()


@given(_st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_random_bytes_never_decode_silently(data):
    """Arbitrary junk either raises (NotImplementedError for unknown
    magic, MediaFormatError for corrupt known magic) or — if it
    happens to be a valid tiny file — decodes without crashing; it
    must never return garbage silently for unknown formats."""
    try:
        _mc.decode_image(data)
    except (NotImplementedError, _mc.MediaFormatError):
        pass
    try:
        _mc.decode_wav(data)
    except (NotImplementedError, _mc.MediaFormatError):
        pass


@settings(max_examples=40, deadline=None)
@given(
    s=_np_arrays(
        dtype=np.int16,
        shape=_st.tuples(
            _st.integers(1, 200), _st.integers(1, 3)
        ),
    ),
    n_out=_st.integers(1, 300),
)
def test_nn_resample_shape_values_and_roundtrip(s, n_out):
    """_nn_resample (r5): output frames are a selection of source
    frames (never interpolated values), shape is exact, mapping is
    monotone, and the resampled signal survives a WAV encode/decode
    round-trip bit-exactly."""
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        _nn_resample,
    )

    out = _nn_resample(s, n_out)
    assert out.shape == (n_out, s.shape[1])
    n_src = s.shape[0]
    idx = ((np.arange(n_out) + 0.5) * n_src / n_out).astype(np.int64)
    idx = np.minimum(idx, n_src - 1)
    assert (out == s[idx]).all()
    assert (np.diff(idx) >= 0).all()  # monotone: order preserved
    dec, rate = _mc.decode_wav(_mc.encode_wav(out, 4000))
    assert rate == 4000 and (dec == out).all()


@settings(max_examples=30, deadline=None)
@given(
    frames=_st.lists(
        _np_arrays(dtype=np.uint8, shape=(5, 7)), min_size=1, max_size=4
    ),
    w=_st.integers(1, 10),
    h=_st.integers(1, 10),
)
def test_video_resize_framewise_equals_image_resize(frames, w, h):
    """resize_video's per-frame mapping (r5) is EXACTLY _nn_resize
    frame-by-frame through a full Y4M encode/resize/decode cycle —
    one index convention across modalities, property-checked."""
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        _nn_resize,
    )

    data = _mc.encode_y4m(frames, 10, 1)
    info = _mc.y4m_info(data)
    resized = [
        _nn_resize(
            np.frombuffer(_mc.y4m_frame(data, info, i), np.uint8).reshape(
                info["height"], info["width"]
            ),
            w,
            h,
        )
        for i in range(info["n_frames"])
    ]
    out = _mc.encode_y4m(resized, info["fps_num"], info["fps_den"])
    oinfo = _mc.y4m_info(out)
    assert (oinfo["width"], oinfo["height"]) == (w, h)
    assert oinfo["n_frames"] == len(frames)
    for i, f in enumerate(frames):
        got = np.frombuffer(
            _mc.y4m_frame(out, oinfo, i), np.uint8
        ).reshape(h, w)
        assert (got == _nn_resize(np.asarray(f), w, h)).all()


# --- r8 codecs: WebP-lossless and FLAC ---------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    a=_np_arrays(
        dtype=np.uint8,
        shape=_st.tuples(
            _st.integers(1, 12), _st.integers(1, 14), _st.just(3)
        ),
    ),
    sg=_st.booleans(),
)
def test_webp_lossless_roundtrip_any_rgb(a, sg):
    """Any RGB array round-trips bit-exactly through the VP8L
    encoder/decoder pair — the encoder auto-chooses palette vs
    literal+LZ77+cache paths, all of which must be lossless."""
    from lsdm_motogp_data_integration_spark.operators import webpcodec

    pal = None if not sg else False
    blob = webpcodec.encode_webp_lossless(
        a, subtract_green=sg, palette=pal
    )
    out = webpcodec.decode_webp(blob)
    assert np.array_equal(out, a)


@settings(max_examples=30, deadline=None)
@given(
    s=_np_arrays(
        dtype=np.int16,
        shape=_st.tuples(_st.integers(1, 400), _st.integers(1, 2)),
    ),
    rate=_st.sampled_from([8000, 16000, 44100]),
)
def test_flac_roundtrip_any_pcm(s, rate):
    """Any int16 PCM round-trips bit-exactly through the FLAC
    encoder/decoder pair (constant/fixed/verbatim subframes, stereo
    decorrelation, CRCs, MD5 — all under the property)."""
    from lsdm_motogp_data_integration_spark.operators import flaccodec

    blob = flaccodec.encode_flac(s, rate)
    out, r = flaccodec.decode_flac(blob)
    assert r == rate
    assert np.array_equal(out, s.astype(np.int32))


@settings(max_examples=120, deadline=None)
@given(
    seed=_st.integers(0, 2**32 - 1),
    pos_frac=_st.floats(0.0, 1.0),
    mutation=_st.integers(1, 255),
)
def test_webp_flac_mutations_raise_typed_errors(
    seed, pos_frac, mutation
):
    """Bit-flipped VP8L/FLAC streams either decode (the flip landed
    in don't-care padding) or raise the codec's TYPED errors — never
    hang, never crash with IndexError/struct.error/KeyError, never
    return out-of-contract shapes.  (The r8 advisor theme: untrusted
    web bytes must fail loudly and typed.)"""
    from lsdm_motogp_data_integration_spark.operators import (
        flaccodec,
        webpcodec,
    )

    rng = np.random.RandomState(seed % (2**31))
    img = rng.randint(0, 256, (5, 6, 3)).astype(np.uint8)
    wav = rng.randint(-3000, 3000, 64).astype(np.int16)
    wblob = bytearray(webpcodec.encode_webp_lossless(img))
    fblob = bytearray(flaccodec.encode_flac(wav, 8000))
    for blob, decode in (
        (wblob, webpcodec.decode_webp),
        (fblob, flaccodec.decode_flac),
    ):
        pos = min(len(blob) - 1, int(pos_frac * len(blob)))
        blob[pos] ^= mutation
        try:
            decode(bytes(blob))
        except (_mc.MediaFormatError, NotImplementedError):
            pass


def test_webp_flac_every_truncation_raises_typed():
    """Every PREFIX of a valid VP8L / FLAC / animated-WebP stream
    either decodes (nothing essential was cut) or raises the typed
    codec error — exhaustively, every cut point (the fuzz that found
    the r8 FLAC header-CRC IndexError)."""
    from lsdm_motogp_data_integration_spark.operators import (
        flaccodec,
        webpcodec,
    )

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (6, 7, 3)).astype(np.uint8)
    wav = rng.randint(-3000, 3000, 150).astype(np.int16)
    cases = (
        (webpcodec.encode_webp_lossless(img), webpcodec.decode_webp),
        (flaccodec.encode_flac(wav, 8000), flaccodec.decode_flac),
        (
            webpcodec.encode_webp_anim([img, img], [10, 10]),
            webpcodec.decode_webp_anim,
        ),
    )
    for blob, decode in cases:
        for cut in range(len(blob)):
            try:
                decode(bytes(blob[:cut]))
            except (_mc.MediaFormatError, NotImplementedError):
                pass


def test_every_decoder_family_truncation_typed():
    """r8 hardening sweep: EVERY prefix of a valid stream from every
    decoder family raises the typed codec errors or decodes — the
    class of fixes this round landed (GIF descriptor bounds, JPEG
    DHT/SOF/SOS/DQT segment validation incl. zero sampling factors
    and DC categories, TIFF scalar tags, Y4M numeric headers, FLAC
    header CRC byte)."""
    from lsdm_motogp_data_integration_spark.operators import jpegcodec

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (8, 10)).astype(np.uint8)
    bilevel = rng.randint(0, 2, (6, 8)).astype(bool)
    wav = rng.randint(-3000, 3000, 120).astype(np.int16)
    frames = [rng.randint(0, 256, (3, 4), dtype=np.uint8)
              for _ in range(2)]
    cases = [
        (_mc.encode_bmp(img), _mc.decode_image),
        (_mc.encode_png(img), _mc.decode_image),
        (_mc.encode_pgm(gray), _mc.decode_image),
        (_mc.encode_gif(gray), _mc.decode_image),
        (jpegcodec.encode_jpeg(gray), _mc.decode_image),
        (jpegcodec.encode_jpeg(gray, progressive=True),
         _mc.decode_image),
        (_mc.encode_tiff_g4(bilevel), _mc.decode_image),
        (_mc.encode_wav(wav, 8000), _mc.decode_wav),
        (_mc.encode_y4m(frames, 10, 1),
         lambda b: _mc.y4m_frame(b, _mc.y4m_info(b), 0)),
        (_mc.encode_mp4_skeleton(5000, width=64, height=48),
         _mc.mp4_info),
        (_mc.encode_mp3_skeleton(10), _mc.mp3_info),
    ]
    for blob, decode in cases:
        for cut in range(len(blob)):
            try:
                decode(bytes(blob[:cut]))
            except (_mc.MediaFormatError, NotImplementedError):
                pass


def test_every_decoder_family_mutations_typed():
    """Seeded byte-flip fuzz across every decoder family — typed
    errors only, never IndexError/struct.error/OverflowError/
    ZeroDivisionError/UnicodeDecodeError (each of which a mutation
    produced before the r8 hardening)."""
    import random

    from lsdm_motogp_data_integration_spark.operators import jpegcodec

    rng = np.random.RandomState(13)
    rnd = random.Random(424242)
    img = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (8, 10)).astype(np.uint8)
    bilevel = rng.randint(0, 2, (6, 8)).astype(bool)
    wav = rng.randint(-3000, 3000, 120).astype(np.int16)
    frames = [rng.randint(0, 256, (3, 4), dtype=np.uint8)
              for _ in range(2)]
    cases = [
        (_mc.encode_gif(gray), _mc.decode_image),
        (jpegcodec.encode_jpeg(gray), _mc.decode_image),
        (jpegcodec.encode_jpeg(gray, progressive=True),
         _mc.decode_image),
        (_mc.encode_tiff_g4(bilevel), _mc.decode_image),
        (_mc.encode_wav(wav, 8000), _mc.decode_wav),
        (_mc.encode_y4m(frames, 10, 1),
         lambda b: _mc.y4m_frame(b, _mc.y4m_info(b), 0)),
        (_mc.encode_png(img), _mc.decode_image),
    ]
    for blob, decode in cases:
        base = bytearray(blob)
        for _ in range(400):
            mut = bytearray(base)
            for _ in range(rnd.randint(1, 3)):
                mut[rnd.randrange(len(mut))] ^= rnd.randint(1, 255)
            try:
                decode(bytes(mut))
            except (_mc.MediaFormatError, NotImplementedError):
                pass

def _r9_fuzz_cases():
    """r9 decoder families: lossy WebP (VP8), VP8+ALPH RGBA, MJPEG
    MP4, PDF embedded images, encrypted PDF — each (blob, decode)."""
    import struct as st

    from lsdm_motogp_data_integration_spark.operators import (
        pdfcodec as pc,
    )
    from lsdm_motogp_data_integration_spark.operators import (
        vp8codec as v8,
    )

    rng = np.random.RandomState(1)
    tiles = rng.randint(0, 256, (2, 2), dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), np.uint8))
    payload = v8.encode_vp8(img)
    aplane = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    body = b"\x00" + aplane.tobytes()
    ch = (b"VP8X" + st.pack("<I", 10) + bytes([0x10]) + bytes(3)
          + (15).to_bytes(3, "little") * 2)
    ch += (b"ALPH" + st.pack("<I", len(body)) + body
           + (b"\x00" if len(body) & 1 else b""))
    ch += (b"VP8 " + st.pack("<I", len(payload)) + payload
           + (b"\x00" if len(payload) & 1 else b""))
    b2 = b"WEBP" + ch
    alph_webp = b"RIFF" + st.pack("<I", len(b2)) + b2
    frames = [
        np.repeat(np.repeat(
            rng.randint(0, 256, (2, 3), dtype=np.uint8), 8, 0), 8, 1)
        for _ in range(3)
    ]
    gray = rng.randint(0, 256, (12, 10), dtype=np.uint8)
    bil = rng.randint(0, 2, (10, 14), dtype=np.uint8).astype(bool)
    try:
        from test_pdfcodec import _build_encrypted_pdf
    except ImportError:
        from tests.test_pdfcodec import _build_encrypted_pdf
    return [
        (v8.encode_webp_vp8(img), _mc.decode_image),
        (alph_webp, _mc.decode_image),
        (_mc.encode_mp4_mjpeg(frames, fps=10),
         _mc.decode_mp4_mjpeg_frames),
        (pc.encode_pdf_with_images(
            [("flate_gray", gray), ("g4", bil), ("dct", img)],
            text="x"), pc.pdf_images),
        (_build_encrypted_pdf("fuzz target", r=3, length=128),
         pc.decode_pdf_text),
    ]


def test_r9_decoder_families_truncation_typed():
    """r9 families under the r8 hardening contract: EVERY prefix of a
    valid stream raises typed codec errors or decodes (discovery run:
    zero untyped exceptions, zero hangs under a 10 s watchdog)."""
    for blob, decode in _r9_fuzz_cases():
        for cut in range(len(blob)):
            try:
                decode(bytes(blob[:cut]))
            except (_mc.MediaFormatError, NotImplementedError):
                pass


def test_r9_decoder_families_mutations_typed():
    """Seeded byte-flip fuzz over the r9 families — typed errors
    only (the same contract the r8 battery pinned engine-wide)."""
    import random

    rnd = random.Random(777)
    for blob, decode in _r9_fuzz_cases():
        base = bytearray(blob)
        for _ in range(300):
            mut = bytearray(base)
            for _ in range(rnd.randint(1, 3)):
                mut[rnd.randrange(len(mut))] ^= rnd.randint(1, 255)
            try:
                decode(bytes(mut))
            except (_mc.MediaFormatError, NotImplementedError):
                pass
