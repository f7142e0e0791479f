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
