"""GIF codec: the LZW decoder pinned against an independent real LZW
compressor (decoder-synchronized width schedule, KwKwK case, width
growth across bumps), lossless encode→decode roundtrips, interlace,
closed-form container size, and corrupt-stream gates."""

import numpy as np
import pytest

from lsdm_motogp_data_integration_spark.operators import mediacodec as mc
from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
    _decode_gif,
    _gif_lzw_decode,
    decode_image,
    encode_gif,
    sniff_format,
)


def _lzw_encode(min_size: int, pixels: list[int]) -> bytes:
    """Reference LZW compressor (independent of the module's decoder):
    width grows on the DECODER's entry schedule — the decoder lags the
    encoder by one entry and adds none for the first code after a
    clear."""
    clear = 1 << min_size
    end = clear + 1
    out = bytearray()
    buf = 0
    nb = 0
    width = min_size + 1
    dec_next = end + 1
    first = True

    def emit(c: int) -> None:
        nonlocal buf, nb, width, dec_next, first
        buf |= c << nb
        nb += width
        while nb >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nb -= 8
        if c == clear:
            width = min_size + 1
            dec_next = end + 1
            first = True
        elif c != end:
            if first:
                first = False
            elif dec_next < 4096:
                dec_next += 1
                if dec_next == (1 << width) and width < 12:
                    width += 1

    d = {bytes([i]): i for i in range(clear)}
    nxt = end + 1
    emit(clear)
    cur = b""
    for p in pixels:
        t = cur + bytes([p])
        if t in d:
            cur = t
            continue
        emit(d[cur])
        if nxt < 4096:
            d[t] = nxt
            nxt += 1
        cur = bytes([p])
    if cur:
        emit(d[cur])
    emit(end)
    if nb:
        out.append(buf & 0xFF)
    return bytes(out)


def test_lzw_decode_matches_reference_compressor():
    px = [i % 8 for i in range(300)] + [3] * 80 + list(range(8)) * 30
    enc = _lzw_encode(3, px)
    assert len(enc) < len(px) // 2  # genuinely compressed
    assert list(_gif_lzw_decode(3, enc, len(px))) == px


def test_lzw_kwkwk_special_case():
    px = [1] * 10
    assert list(_gif_lzw_decode(3, _lzw_encode(3, px), 10)) == px


def test_lzw_8bit_across_width_bumps():
    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, size=3000).tolist()
    assert list(_gif_lzw_decode(8, _lzw_encode(8, px), len(px))) == px


def test_gray_roundtrip_and_closed_form_size():
    rng = np.random.RandomState(4)
    g = rng.randint(0, 256, size=(5, 6), dtype=np.uint8)
    b = encode_gif(g)
    assert sniff_format(b) == "gif"
    # 13 hdr+LSD, 768 GCT, 10 img desc, 1 min-code, 37 sub-block
    # (1 len + 36 data: 32 nine-bit codes), 1 terminator, 1 trailer
    assert len(b) == 831
    assert np.array_equal(
        decode_image(b), np.repeat(g[:, :, None], 3, axis=2)
    )


def test_color_roundtrip_lossless():
    c = np.zeros((9, 7, 3), np.uint8)
    c[::2] = [200, 10, 50]
    c[1::2] = [3, 250, 128]
    c[4, 3] = [7, 7, 7]
    assert np.array_equal(decode_image(encode_gif(c)), c)


def test_too_many_colors_raises():
    rng = np.random.RandomState(1)
    c = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(MediaFormatError, match="distinct colors"):
        encode_gif(c)


def test_big_image_crosses_clear_and_subblock_boundaries():
    rng = np.random.RandomState(9)
    big = rng.randint(0, 256, size=(40, 37), dtype=np.uint8)  # 1480 px
    assert np.array_equal(
        decode_image(encode_gif(big)),
        np.repeat(big[:, :, None], 3, axis=2),
    )


def test_interlaced_gif_decodes_in_display_order():
    rng = np.random.RandomState(6)
    g = rng.randint(0, 256, size=(11, 4), dtype=np.uint8)
    plain = bytearray(encode_gif(g))
    # rewrite as interlaced: set the flag and reorder the pixel rows
    # into the 4-pass transmission order
    h = 11
    order = np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )
    reordered = g[order]
    inter = bytearray(encode_gif(reordered))
    desc = 13 + 768  # image descriptor offset
    assert inter[desc] == 0x2C
    inter[desc + 9] |= 0x40  # interlace flag
    assert np.array_equal(
        _decode_gif(bytes(inter)), np.repeat(g[:, :, None], 3, axis=2)
    )


def test_extension_blocks_are_skipped():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = bytearray(encode_gif(g))
    # splice a Graphic Control Extension before the image descriptor
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    at = 13 + 768
    assert b[at] == 0x2C
    spliced = bytes(b[:at]) + gce + bytes(b[at:])
    assert np.array_equal(
        decode_image(spliced), np.repeat(g[:, :, None], 3, axis=2)
    )


def test_corrupt_gates():
    with pytest.raises(MediaFormatError):
        _decode_gif(b"GIF89a" + b"\x00" * 20)  # no image descriptor
    g = encode_gif(np.zeros((4, 4), np.uint8))
    with pytest.raises(MediaFormatError):
        _decode_gif(g[:200])  # truncated inside the color table


def test_decode_through_media_stats_dispatch():
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        _decode_canonical,
    )

    g = np.arange(30, dtype=np.uint8).reshape(5, 6)
    fmt, canon, info = _decode_canonical(encode_gif(g))
    assert fmt == "gif" and info["kind"] == "image"
    assert info["width"] == 6 and info["height"] == 5
    assert info["channels"] == 3
    assert np.array_equal(info["array"], np.repeat(g[:, :, None], 3, axis=2))


# --- animated GIFs (r7): all-frames decode with the disposal model ---------


def _animate(frames, delays_cs, disposal=1, transparent=None):
    """Test-side animation assembler: per-frame sections from the
    REAL encoder (shared identity-gray palette), GCEs spliced in."""
    parts = [mc.encode_gif(f) for f in frames]
    head = parts[0][: 13 + 768]
    body = b""
    for p, d in zip(parts, delays_cs):
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        body += bytes(
            [0x21, 0xF9, 4, flags, d & 255, d >> 8,
             transparent or 0, 0]
        )
        body += p[13 + 768 : -1]  # image descriptor..data, no trailer
    return head + body + b"\x3b"


def test_animated_gif_all_frames_and_delays():
    rng = np.random.RandomState(33)
    frames = [rng.randint(0, 256, (5, 7), np.uint8) for _ in range(3)]
    blob = _animate(frames, [10, 25, 0])
    out, delays = mc.decode_gif_frames(blob)
    assert len(out) == 3 and delays == [100, 250, 0]
    for got, f in zip(out, frames):
        assert np.array_equal(got, np.repeat(f[:, :, None], 3, 2))
    # the single-frame API still reads frame 1 only
    assert np.array_equal(
        mc.decode_image(blob), np.repeat(frames[0][:, :, None], 3, 2)
    )


def test_animated_gif_subrect_transparency_and_disposal():
    """Frame 2 is a 2×2 sub-rect at (1,1) with a transparent index
    and disposal 2 (restore background); frame 3 shows the restored
    rectangle."""
    base = np.arange(16, dtype=np.uint8).reshape(4, 4) + 100
    patch = np.array([[7, 9], [9, 8]], np.uint8)  # 9 = transparent
    f3 = np.full((4, 4), 55, np.uint8)
    p1 = mc.encode_gif(base)
    p2 = mc.encode_gif(patch)
    p3 = mc.encode_gif(f3)
    head = p1[: 13 + 768]

    def gce(disposal, trans=None):
        flags = (disposal << 2) | (1 if trans is not None else 0)
        return bytes([0x21, 0xF9, 4, flags, 0, 0, trans or 0, 0])

    sec2 = bytearray(p2[13 + 768 : -1])
    assert sec2[0] == 0x2C
    sec2[1:3] = (1).to_bytes(2, "little")  # x = 1
    sec2[3:5] = (1).to_bytes(2, "little")  # y = 1
    blob = (
        head
        + gce(1) + p1[13 + 768 : -1]
        + gce(2, trans=9) + bytes(sec2)
        + gce(0) + p3[13 + 768 : -1]
        + b"\x3b"
    )
    out, _ = mc.decode_gif_frames(blob)
    assert len(out) == 3
    gray = lambda a: np.repeat(a[:, :, None], 3, 2)  # noqa: E731
    assert np.array_equal(out[0], gray(base))
    # frame 2: patch blitted at (1,1), transparent 9s keep the base
    exp = base.copy()
    exp[1, 1] = 7
    exp[2, 2] = 8
    assert np.array_equal(out[1], gray(exp))
    # frame 3: full overwrite hides the disposal-2 restore, so build
    # the expectation from the model: after disposal 2 the (1:3,1:3)
    # rect went to background color 0, then f3 overwrites everything
    assert np.array_equal(out[2], gray(f3))


def test_animated_gif_disposal_2_visible_restore():
    """A third frame that does NOT cover the disposed rectangle makes
    the background restore visible."""
    base = np.full((4, 4), 200, np.uint8)
    patch = np.full((2, 2), 30, np.uint8)
    corner = np.full((1, 1), 77, np.uint8)
    p1, p2, p3 = (mc.encode_gif(a) for a in (base, patch, corner))
    head = p1[: 13 + 768]

    def gce(disposal):
        return bytes([0x21, 0xF9, 4, disposal << 2, 0, 0, 0, 0])

    sec2 = bytearray(p2[13 + 768 : -1])
    sec2[1:3] = (1).to_bytes(2, "little")
    sec2[3:5] = (1).to_bytes(2, "little")
    blob = (
        head
        + gce(1) + p1[13 + 768 : -1]
        + gce(2) + bytes(sec2)
        + gce(0) + p3[13 + 768 : -1]
        + b"\x3b"
    )
    out, _ = mc.decode_gif_frames(blob)
    exp2 = base.copy()
    exp2[1:3, 1:3] = 30
    exp3 = base.copy()
    exp3[1:3, 1:3] = 0  # background index 0 → gray 0
    exp3[0, 0] = 77
    gray = lambda a: np.repeat(a[:, :, None], 3, 2)  # noqa: E731
    assert np.array_equal(out[1], gray(exp2))
    assert np.array_equal(out[2], gray(exp3))


def test_animated_gif_disposal_2_restores_transparent_not_bg_color():
    """Reference renderers (browsers, Pillow) restore disposal-2
    rectangles to TRANSPARENT (black on an alpha-less canvas), never
    the screen descriptor's background COLOR — pin that a nonzero
    background index does not leak into the restored rect (r8)."""
    base = np.full((4, 4), 200, np.uint8)
    patch = np.full((2, 2), 30, np.uint8)
    corner = np.full((1, 1), 77, np.uint8)
    p1, p2, p3 = (mc.encode_gif(a) for a in (base, patch, corner))
    head = bytearray(p1[: 13 + 768])
    head[11] = 250  # background index → gray 250 in the identity pal

    def gce(disposal):
        return bytes([0x21, 0xF9, 4, disposal << 2, 0, 0, 0, 0])

    sec2 = bytearray(p2[13 + 768 : -1])
    sec2[1:3] = (1).to_bytes(2, "little")
    sec2[3:5] = (1).to_bytes(2, "little")
    blob = (
        bytes(head)
        + gce(1) + p1[13 + 768 : -1]
        + gce(2) + bytes(sec2)
        + gce(0) + p3[13 + 768 : -1]
        + b"\x3b"
    )
    out, _ = mc.decode_gif_frames(blob)
    exp3 = base.copy()
    exp3[1:3, 1:3] = 0  # restored to transparent/black, NOT 250
    exp3[0, 0] = 77
    gray = lambda a: np.repeat(a[:, :, None], 3, 2)  # noqa: E731
    assert np.array_equal(out[2], gray(exp3))
