"""Header-only container metadata (r6): MP4 box walk, MP3 frame-header
walk, image_dims (no pixel decode), wav_info (no sample array), and
the Spark container_info operator's strict / triage modes."""

import numpy as np
import pytest

from lsdm_motogp_data_integration_spark.operators import mediacodec as mc
from lsdm_motogp_data_integration_spark.operators.jpegcodec import (
    encode_jpeg,
)
from lsdm_motogp_data_integration_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    container_info,
)


def test_mp4_walk_roundtrips_skeleton():
    b = mc.encode_mp4_skeleton(
        123456, width=1920, height=1080, has_audio=True
    )
    info = mc.mp4_info(b)
    assert info["duration_ms"] == 123456
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["n_tracks"] == 2
    assert info["has_video"] and info["has_audio"]
    assert info["brand"] == "isom"
    # audio-only skeleton
    a = mc.mp4_info(mc.encode_mp4_skeleton(999, has_audio=True))
    assert a["n_tracks"] == 1 and a["has_audio"] and not a["has_video"]
    assert a["width"] is None


def test_mp4_corrupt_gates():
    with pytest.raises(mc.MediaFormatError):
        mc.mp4_info(b"\x00\x00\x00\x08free" + b"\x00" * 8)  # no ftyp
    good = mc.encode_mp4_skeleton(1000, width=64, height=48)
    with pytest.raises(mc.MediaFormatError):  # box size past EOF
        mc.mp4_info(good[:40])


def test_mp3_walk_exact_duration_and_bitrate():
    b = mc.encode_mp3_skeleton(38, bitrate_kbps=160, sample_rate=44100)
    info = mc.mp3_info(b)
    assert info["n_frames"] == 38
    assert info["bit_rate"] == 160000
    assert info["sample_rate"] == 44100
    assert info["duration_ms"] == 38 * 1152 * 1000 // 44100
    # frame length arithmetic: 144·160000/44100 = 522 bytes/frame
    assert len(b) == 38 * (144 * 160000 // 44100)


def test_mp3_id3v2_tag_skipped():
    frames = mc.encode_mp3_skeleton(5, bitrate_kbps=128)
    # ID3v2 header with syncsafe size 300
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 2, 44]) + b"\x00" * 300
    info = mc.mp3_info(tag + frames)
    assert info["n_frames"] == 5 and info["bit_rate"] == 128000


def test_mp3_desync_is_loud():
    frames = mc.encode_mp3_skeleton(3)
    with pytest.raises(mc.MediaFormatError, match="lost sync"):
        mc.mp3_info(frames + b"\x12\x34\x56\x78")


def test_mp3_id3v1_trailer_stops_walk():
    """128-byte 'TAG' trailers are near-universal in real MP3s — the
    frame walk must end cleanly there, not lose sync."""
    frames = mc.encode_mp3_skeleton(4)
    trailer = b"TAG" + b"\x00" * 125
    info = mc.mp3_info(frames + trailer)
    assert info["n_frames"] == 4
    assert info["duration_ms"] == 4 * 1152 * 1000 // 44100


def test_mp3_truncated_final_frame_not_counted():
    """A final frame whose declared length runs past end-of-data is
    incomplete — it must not inflate the frame/duration counts."""
    frames = mc.encode_mp3_skeleton(4)
    info = mc.mp3_info(frames[:-10])
    assert info["n_frames"] == 3
    assert info["duration_ms"] == 3 * 1152 * 1000 // 44100


def test_image_dims_header_only_all_formats():
    a = np.arange(45, dtype=np.uint8).reshape(5, 9)
    rgb = np.repeat(a[:, :, None], 3, axis=2)
    for blob in (
        mc.encode_bmp(rgb),
        mc.encode_pgm(a),
        mc.encode_ppm(rgb),
        mc.encode_png(a),
        mc.encode_gif(a),
        encode_jpeg(a),
    ):
        assert mc.image_dims(blob) == (9, 5)
    # a TRUNCATED png (headers intact, no pixel data) still reports
    # dims — proof no decode happens
    png = mc.encode_png(a)
    assert mc.image_dims(png[:33]) == (9, 5)


def test_wav_info_no_sample_array():
    s = np.arange(-40, 40, dtype=np.int16)
    b = mc.encode_wav(s, 16000)
    info = mc.wav_info(b)
    assert info["n_frames"] == 80 and info["sample_rate"] == 16000
    assert info["duration_ms"] == 80 * 1000 // 16000
    assert info["channels"] == 1 and info["bits"] == 16


def test_container_info_operator_all_kinds(spark):
    rows = [
        (1, "video", mc.encode_mp4_skeleton(
            7500, width=320, height=240, has_audio=True), None),
        (2, "audio", mc.encode_mp3_skeleton(10, bitrate_kbps=96), None),
        (3, "image", mc.encode_gif(np.zeros((3, 4), np.uint8)), None),
        (4, "audio", mc.encode_wav(
            np.zeros(800, np.int16), 8000), None),
        (5, "video", mc.encode_y4m(
            [np.zeros((3, 4), np.uint8)] * 5, 10, 1), None),
        (6, "image", None, None),  # NULL content
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in container_info(media).collect()}
    assert out[1]["fmt"] == "mp4" and out[1]["duration_ms"] == 7500
    assert (out[1]["width"], out[1]["height"]) == (320, 240)
    assert out[1]["has_video"] and out[1]["has_audio"]
    assert out[2]["fmt"] == "mp3" and out[2]["bit_rate"] == 96000
    assert out[2]["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert out[3]["fmt"] == "gif" and (
        out[3]["width"], out[3]["height"]) == (4, 3)
    assert out[4]["fmt"] == "wav" and out[4]["duration_ms"] == 100
    assert out[5]["fmt"] == "y4m" and out[5]["n_frames"] == 5
    assert out[5]["duration_ms"] == 500  # 5 frames @ 10 fps
    assert out[6]["fmt"] is None and out[6]["n_bytes"] is None


def test_container_info_strict_vs_triage(spark):
    rows = [
        (1, "image", b"certainly not a container at all....", None),
        (2, "image", mc.encode_gif(np.zeros((2, 2), np.uint8)), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception):
        container_info(media, strict=True).collect()
    out = {
        r["media_id"]: r
        for r in container_info(media, strict=False).collect()
    }
    assert out[1]["fmt"] is None and out[1]["n_bytes"] == 36
    assert out[2]["fmt"] == "gif"


def _g711_wav(codes: bytes, audio_fmt: int, rate: int = 8000) -> bytes:
    import struct as _st

    fmt = _st.pack("<HHIIHH", audio_fmt, 1, rate, rate, 1, 8)
    return (
        b"RIFF"
        + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(codes))
        + b"WAVE"
        + b"fmt "
        + _st.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _st.pack("<I", len(codes))
        + codes
    )


def test_g711_tables_match_stdlib_audioop():
    """Pin both 256-entry expansions against the INDEPENDENT stdlib
    implementation (audioop wraps the classic Sun G.711 tables)."""
    audioop = pytest.importorskip("audioop")
    codes = bytes(range(256))
    from lsdm_motogp_data_integration_spark.operators.mediacodec import (
        _alaw_table,
        _ulaw_table,
    )

    ref_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert np.array_equal(_ulaw_table(), ref_u)
    assert np.array_equal(_alaw_table(), ref_a)


def test_g711_wav_decode_and_info():
    codes = bytes([0xFF, 0x7F, 0x80, 0x00, 0x55, 0xD5])
    s, rate = mc.decode_wav(_g711_wav(codes, 7))  # mu-law
    assert rate == 8000 and s.shape == (6, 1)
    assert s[0, 0] == 0  # mu-law 0xFF is exactly zero
    assert s[2, 0] == 32124 and s[3, 0] == -32124  # full scale
    a, _ = mc.decode_wav(_g711_wav(codes, 6))  # A-law
    assert a[4, 0] == -8 and a[5, 0] == 8  # sign bit SET = positive
    info = mc.wav_info(_g711_wav(codes, 6))
    assert info["n_frames"] == 6 and info["bits"] == 8
    with pytest.raises(NotImplementedError):
        mc.decode_wav(_g711_wav(codes, 80))  # MPEG-in-WAV stays a gate


def test_float_wav_decode_round_half_even_and_clip():
    import struct as _st

    f = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 1.5, -2.0], dtype="<f4")
    raw = f.tobytes()
    fmt = _st.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wav = (
        b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
        + b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
        + b"data" + _st.pack("<I", len(raw)) + raw
    )
    s, rate = mc.decode_wav(wav)
    assert rate == 8000
    # 0.5·32767 = 16383.5 → 16384 (half-even); out-of-range clamps
    assert s[:, 0].tolist() == [
        0, 16384, -16384, 32767, -32767, 32767, -32768
    ]
    info = mc.wav_info(wav)
    assert info["n_frames"] == 7 and info["bits"] == 32


def test_tiff_roundtrip_both_endians_and_strips():
    rng = np.random.RandomState(17)
    g = rng.randint(0, 256, (7, 11), np.uint8)
    c = rng.randint(0, 256, (6, 5, 3), np.uint8)
    for be in (False, True):
        for rps in (0, 2):
            bg = mc.encode_tiff(g, big_endian=be, rows_per_strip=rps)
            assert mc.sniff_format(bg) == "tiff"
            assert np.array_equal(mc.decode_image(bg), g)
            bc = mc.encode_tiff(c, big_endian=be, rows_per_strip=rps)
            assert np.array_equal(mc.decode_image(bc), c)
    # header-only dims + container_info dispatch
    b = mc.encode_tiff(g)
    assert mc.image_dims(b) == (11, 7)
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        _container_info_one,
        _decode_canonical,
    )

    info = _container_info_one(b)
    assert info["fmt"] == "tiff" and (info["width"], info["height"]) == (11, 7)
    fmt, canon, dinfo = _decode_canonical(b)
    assert fmt == "tiff" and dinfo["kind"] == "image"


def test_tiff_white_is_zero_inverts():
    import struct as _st

    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = bytearray(mc.encode_tiff(g))
    # flip the photometric tag (262) value from 1 to 0 in the IFD
    idx = b.find(_st.pack("<HHI", 262, 3, 1))
    assert idx > 0
    assert b[idx + 8] == 1
    b[idx + 8] = 0
    dec = mc.decode_image(bytes(b))
    assert np.array_equal(dec, 255 - g)


def test_tiff_compression_gate_and_corruption():
    import struct as _st

    g = np.zeros((4, 4), np.uint8)
    b = bytearray(mc.encode_tiff(g))
    idx = b.find(_st.pack("<HHI", 259, 3, 1))
    # old-style JPEG (6) stays a gate (MH/G3/G4/LZW/new-JPEG decode)
    _st.pack_into("<H", b, idx + 8, 6)
    with pytest.raises(NotImplementedError, match="compression 6"):
        mc.decode_image(bytes(b))
    # an 8-bit file mislabeled CCITT G3 is a typed structure error
    _st.pack_into("<H", b, idx + 8, 3)
    with pytest.raises(mc.MediaFormatError, match="1-bit"):
        mc.decode_image(bytes(b))
    with pytest.raises(mc.MediaFormatError):
        mc.decode_image(mc.encode_tiff(g)[:20])  # strip out of range


def _tiff_lzw_encode(pixels: bytes) -> bytes:
    """Reference TIFF LZW compressor: the encoder bumps width when
    ITS next free code reaches 2^w; the decoder's counter lags one
    entry and compensates with the spec's early-change rule (bump at
    2^w − 1), so the two schedules meet at the same stream
    position."""
    out = bytearray()
    buf = 0
    nb = 0
    width = 9
    next_code = 258

    def emit(c):
        nonlocal buf, nb, width, next_code
        buf = (buf << width) | c
        nb += width
        while nb >= 8:
            nb -= 8
            out.append((buf >> nb) & 0xFF)
        buf &= (1 << nb) - 1
        if c == 256:
            width = 9
            next_code = 258

    d = {bytes([i]): i for i in range(256)}
    emit(256)
    cur = b""
    for p in pixels:
        tk = cur + bytes([p])
        if tk in d:
            cur = tk
            continue
        emit(d[cur])
        if next_code < 4096:
            d[tk] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        cur = bytes([p])
    if cur:
        emit(d[cur])
    emit(257)
    if nb:
        out.append((buf << (8 - nb)) & 0xFF)
    return bytes(out)


def _retiff_lzw(arr: np.ndarray, predictor: bool = False) -> bytes:
    """Rewrite an uncompressed single-strip encode_tiff file as
    LZW-compressed (+ optional horizontal predictor) by patching the
    compression tag and the strip — the fixture path for the decoder
    without shipping an engine-side LZW encoder."""
    import struct as _st

    a = arr
    if predictor:
        d = a.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        a = (d & 0xFF).astype(np.uint8)
    plain = mc.encode_tiff(arr)
    comp = _tiff_lzw_encode(a.tobytes())
    n_px = arr.size
    head = plain[:8]
    tail = plain[8 + n_px:]
    b = bytearray(head + comp + tail)
    # patch ifd offset, compression=5, strip byte count, predictor
    _st.pack_into("<I", b, 4, 8 + len(comp))
    ifd = 8 + len(comp)

    def patch(tag, value, ftype=3):
        idx = bytes(b).find(_st.pack("<HH", tag, ftype), ifd)
        assert idx > 0, tag
        _st.pack_into("<I", b, idx + 8, value)

    patch(259, 5)
    patch(279, len(comp), ftype=4)
    if predictor:
        # append a predictor entry is complex; instead overwrite the
        # planar_config... keep it simple: splice tag 317 by rewriting
        # entry count and appending the entry before next-IFD pointer
        (n_entries,) = _st.unpack_from("<H", b, ifd)
        entry = _st.pack("<HHI", 317, 3, 1) + _st.pack("<H", 2) + b"\x00\x00"
        insert_at = ifd + 2 + 12 * n_entries
        b[insert_at:insert_at] = entry
        _st.pack_into("<H", b, ifd, n_entries + 1)
    return bytes(b)


def test_tiff_lzw_decode_roundtrip():
    rng = np.random.RandomState(21)
    # compressible content: repeated tiles
    tile = rng.randint(0, 40, (4, 6), np.uint8)
    g = np.tile(tile, (5, 4))  # 20x24
    blob = _retiff_lzw(g)
    assert len(blob) < len(mc.encode_tiff(g))  # genuinely compressed
    assert np.array_equal(mc.decode_image(blob), g)


def test_tiff_lzw_with_horizontal_predictor():
    yy, xx = np.mgrid[0:10, 0:14]
    g = (yy * 3 + xx * 7).astype(np.uint8)  # smooth: predictor shines
    blob = _retiff_lzw(g, predictor=True)
    assert np.array_equal(mc.decode_image(blob), g)


def test_tiff_lzw_missing_byte_counts_slices_to_eof():
    """Single-strip LZW file WITHOUT StripByteCounts: the w*h*spp
    inference is only valid uncompressed — the decoder must slice to
    EOF and let the decompressor's expected-length stop bound the
    read, not raise 'strip out of range' on a valid file."""
    import struct as _st

    tile = np.arange(24, dtype=np.uint8).reshape(4, 6)
    g = np.tile(tile, (5, 4))
    b = bytearray(_retiff_lzw(g))
    (ifd,) = _st.unpack_from("<I", b, 4)
    # retag StripByteCounts (279, LONG) as an unknown private tag so
    # the walker skips it — layout and offsets are untouched
    idx = bytes(b).find(_st.pack("<HH", 279, 4), ifd)
    assert idx > 0
    _st.pack_into("<H", b, idx, 60000)
    assert np.array_equal(mc.decode_image(bytes(b)), g)


def test_tiff_lzw_early_change_width_bump():
    # >253 dict entries forces the 9->10 bump at next_code 511
    rng = np.random.RandomState(22)
    g = rng.randint(0, 256, (30, 40), np.uint8)
    blob = _retiff_lzw(g)
    assert np.array_equal(mc.decode_image(blob), g)


def _ima_wav(
    blocks: bytes, n_ch: int, block_align: int, rate: int = 8000
) -> bytes:
    import struct as _st

    frames_per_block = 1 + (block_align - 4 * n_ch) * 2 // n_ch
    fmt = _st.pack(
        "<HHIIHH", 17, n_ch, rate,
        rate * block_align // frames_per_block, block_align, 4,
    ) + _st.pack("<H", 2)  # cbSize + wSamplesPerBlock omitted body
    return (
        b"RIFF"
        + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(blocks))
        + b"WAVE"
        + b"fmt "
        + _st.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _st.pack("<I", len(blocks))
        + blocks
    )


def test_ima_nibble_machine_matches_stdlib_audioop():
    """The per-nibble state machine pinned against the INDEPENDENT
    stdlib Intel/DVI ADPCM decoder (same IMA tables; audioop packs
    the first code in the HIGH nibble, WAV packs low-first — the
    comparison repacks accordingly)."""
    audioop = pytest.importorskip("audioop")
    from lsdm_motogp_data_integration_spark.operators.mediacodec import (
        _ima_decode_nibbles,
    )

    rng = np.random.RandomState(31)
    nibs = rng.randint(0, 16, 64).tolist()
    pred0, idx0 = 123, 17
    mine: list = []
    _ima_decode_nibbles(nibs, pred0, idx0, mine)
    packed = bytes(
        (nibs[i] << 4) | nibs[i + 1] for i in range(0, 64, 2)
    )
    ref = np.frombuffer(
        audioop.adpcm2lin(packed, 2, (pred0, idx0))[0], dtype="<i2"
    )
    assert mine == ref.tolist()


def test_ima_adpcm_wav_decode_mono_and_stereo():
    from lsdm_motogp_data_integration_spark.operators.mediacodec import (
        _ima_decode_nibbles,
    )

    rng = np.random.RandomState(32)
    # mono: one block, align 12 -> header + 8 data bytes = 16 nibbles
    nibs = rng.randint(0, 16, 16).tolist()
    data = bytes(
        (nibs[i + 1] << 4) | nibs[i] for i in range(0, 16, 2)
    )  # WAV low-nibble-first
    import struct as _st

    block = _st.pack("<hBB", -200, 30, 0) + data
    s, rate = mc.decode_wav(_ima_wav(block, 1, 12))
    assert rate == 8000 and s.shape == (17, 1)
    assert s[0, 0] == -200  # header predictor is the first frame
    expect: list = []
    _ima_decode_nibbles(nibs, -200, 30, expect)
    assert s[1:, 0].tolist() == expect
    # stereo: channel headers then 4-byte words interleaved L,R
    nl = rng.randint(0, 16, 8).tolist()
    nr = rng.randint(0, 16, 8).tolist()
    wl = bytes((nl[i + 1] << 4) | nl[i] for i in range(0, 8, 2))
    wr = bytes((nr[i + 1] << 4) | nr[i] for i in range(0, 8, 2))
    sblock = (
        _st.pack("<hBB", 100, 5, 0)
        + _st.pack("<hBB", -100, 50, 0)
        + wl
        + wr
    )
    st, _ = mc.decode_wav(_ima_wav(sblock, 2, 16))
    assert st.shape == (9, 2)
    el: list = []
    er: list = []
    _ima_decode_nibbles(nl, 100, 5, el)
    _ima_decode_nibbles(nr, -100, 50, er)
    assert st[0].tolist() == [100, -100]
    assert st[1:, 0].tolist() == el and st[1:, 1].tolist() == er
    # wav_info frame math agrees without touching sample data
    info = mc.wav_info(_ima_wav(block, 1, 12))
    assert info["n_frames"] == 17 and info["bits"] == 4


def test_tiff_packbits_roundtrip():
    """PackBits strips via an independent reference packer (greedy
    literal/repeat runs), spliced into the uncompressed container the
    same way as the LZW fixtures."""
    import struct as _st

    def packbits(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        n = len(data)
        while i < n:
            run = 1
            while (
                i + run < n and run < 128 and data[i + run] == data[i]
            ):
                run += 1
            if run >= 2:
                out += bytes([257 - run, data[i]])
                i += run
                continue
            lit = i
            while (
                i < n and i - lit < 128
                and not (i + 1 < n and data[i + 1] == data[i])
            ):
                i += 1
            out += bytes([i - lit - 1]) + data[lit:i]
        return bytes(out)

    rng = np.random.RandomState(41)
    # runs + noise: both PackBits branches
    g = np.where(
        rng.rand(9, 13) < 0.5,
        np.uint8(7),
        rng.randint(0, 256, (9, 13)),
    ).astype(np.uint8)
    plain = mc.encode_tiff(g)
    comp = packbits(g.tobytes())
    n_px = g.size
    b = bytearray(plain[:8] + comp + plain[8 + n_px:])
    _st.pack_into("<I", b, 4, 8 + len(comp))
    ifd = 8 + len(comp)
    for tag, val, ftype in ((259, 32773, 3), (279, len(comp), 4)):
        idx = bytes(b).find(_st.pack("<HH", tag, ftype), ifd)
        _st.pack_into("<I", b, idx + 8, val)
    assert np.array_equal(mc.decode_image(bytes(b)), g)


def test_ms_adpcm_wav_decode_matches_spec_reimplementation():
    """MS ADPCM (format 2) pinned against an INDEPENDENT per-spec
    reimplementation written here from the published predictor /
    adaptation rules, plus the structural pins: seed samples emitted
    oldest-first, high nibble first, stereo alternation."""
    import struct as _st

    COEFS = ((256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232))
    ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)

    def ref_decode_mono(pidx, delta, s1, s2, nibbles):
        out = [s2, s1]
        c1, c2 = COEFS[pidx]
        for nib in nibbles:
            signed = nib - 16 if nib >= 8 else nib
            # C '/256' truncates toward zero (spec pseudo-code), not floor
            pred = int((s1 * c1 + s2 * c2) / 256)
            new = max(-32768, min(32767, pred + signed * delta))
            s2, s1 = s1, new
            delta = max(16, int((ADAPT[nib] * delta) / 256))
            out.append(new)
        return out

    rng = np.random.RandomState(51)
    nibs = rng.randint(0, 16, 10).tolist()
    data = bytes((nibs[i] << 4) | nibs[i + 1] for i in range(0, 10, 2))
    # header layout: predictor(1) delta(2) sample1(2) sample2(2)
    block = bytes([1]) + _st.pack("<hhh", 300, 1000, 500) + data
    ba = len(block)
    fmt = _st.pack("<HHIIHH", 2, 1, 8000, 4000, ba, 4)
    wav = (
        b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
        + b"data" + _st.pack("<I", len(block)) + block
    )
    s, rate = mc.decode_wav(wav)
    assert rate == 8000
    expect = ref_decode_mono(1, 300, 1000, 500, nibs)
    assert s[:, 0].tolist() == expect
    assert s[0, 0] == 500 and s[1, 0] == 1000  # oldest seed first
    info = mc.wav_info(wav)
    assert info["n_frames"] == len(expect) and info["bits"] == 4


def test_ms_adpcm_negative_predictor_truncates_toward_zero():
    """Hand-computed vector where the predictor sum is negative and NOT
    divisible by 256 — C '/256' (truncation, per the MS spec pseudo-code
    and ffmpeg/Windows ACM) gives -1 where '>> 8' (floor) gives -2, so
    this pin is NOT circular with the decoder's arithmetic choice.

    coefs[5]=(460,-208), s1=-1, s2=0, delta=16, nibbles (0,0):
      step 1: sum = -460        → trunc -1 (floor would be -2); new = -1
      step 2: sum = -460+208 = -252 → trunc 0 (floor -1);       new =  0
    """
    import struct as _st

    block = bytes([5]) + _st.pack("<hhh", 16, -1, 0) + bytes([0x00])
    fmt = _st.pack("<HHIIHH", 2, 1, 8000, 4000, len(block), 4)
    wav = (
        b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
        + b"data" + _st.pack("<I", len(block)) + block
    )
    s, _ = mc.decode_wav(wav)
    assert s[:, 0].tolist() == [0, -1, -1, 0]


def test_ms_adpcm_stereo_alternation():
    import struct as _st

    rng = np.random.RandomState(52)
    nibs = rng.randint(0, 16, 8).tolist()
    data = bytes((nibs[i] << 4) | nibs[i + 1] for i in range(0, 8, 2))
    hdr = (
        bytes([0, 0])
        + _st.pack("<hh", 256, 128)   # deltas L, R
        + _st.pack("<hh", 100, -100)  # sample1 L, R
        + _st.pack("<hh", 50, -50)    # sample2 L, R
    )
    block = hdr + data
    fmt = _st.pack("<HHIIHH", 2, 2, 8000, 4000, len(block), 4)
    wav = (
        b"RIFF" + _st.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
        + b"data" + _st.pack("<I", len(block)) + block
    )
    s, _ = mc.decode_wav(wav)
    assert s.shape == (6, 2)  # 2 seeds + 8 nibbles / 2 channels
    assert s[0].tolist() == [50, -50] and s[1].tolist() == [100, -100]
    # left channel consumes the even (high-nibble-first) codes:
    # replay L independently with the mono reference rule
    COEFS0 = (256, 0)
    sl1, sl2, dl = 100, 50, 256
    expect_l = []
    for nib in nibs[0::2]:
        signed = nib - 16 if nib >= 8 else nib
        pred = int((sl1 * COEFS0[0] + sl2 * COEFS0[1]) / 256)
        new = max(-32768, min(32767, pred + signed * dl))
        sl2, sl1 = sl1, new
        dl = max(16, int(((230, 230, 230, 230, 307, 409, 512, 614,
                           768, 614, 512, 409, 307, 230, 230, 230)[nib]
                          * dl) / 256))
        expect_l.append(new)
    assert s[2:, 0].tolist() == expect_l


def _jpeg_tiff(
    strips: list[bytes],
    w: int,
    h: int,
    rps: int,
    spp: int,
    jpeg_tables: bytes | None = None,
    photometric: int = 1,
) -> bytes:
    """Hand-built little-endian TIFF wrapping JPEG strips
    (compression 7), offsets computed by assembly — independent of
    encode_tiff."""
    import struct as _st

    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    offs = []
    for s in strips:
        offs.append(len(out))
        out += s
    entries = []

    def entry(tag, ftype, count, payload: bytes):
        entries.append((tag, ftype, count, payload))

    def offarr(vals, ftype):
        fmt = {3: "H", 4: "I"}[ftype]
        return b"".join(_st.pack("<" + fmt, v) for v in vals)

    entry(256, 3, 1, _st.pack("<H", w) + b"\x00\x00")
    entry(257, 3, 1, _st.pack("<H", h) + b"\x00\x00")
    extra = bytearray()
    ifd_guess = None  # two-pass: sizes below are layout-independent

    def build(ifd_off):
        ents = []
        ex = bytearray()
        ex_base = ifd_off + 2 + 12 * n_entries + 4

        def put(tag, ftype, vals_or_bytes):
            nonlocal ex
            if isinstance(vals_or_bytes, bytes):
                data, count = vals_or_bytes, len(vals_or_bytes)
            else:
                count = len(vals_or_bytes)
                data = offarr(vals_or_bytes, ftype)
            if len(data) <= 4:
                ents.append(
                    _st.pack("<HHI", tag, ftype, count)
                    + data.ljust(4, b"\x00")
                )
            else:
                ents.append(
                    _st.pack(
                        "<HHII", tag, ftype, count, ex_base + len(ex)
                    )
                )
                ex += data

        put(256, 3, [w])
        put(257, 3, [h])
        put(258, 3, [8] * spp)
        put(259, 3, [7])
        put(262, 3, [photometric])
        put(273, 4, offs)
        put(277, 3, [spp])
        put(278, 3, [rps])
        put(279, 4, [len(s) for s in strips])
        if jpeg_tables is not None:
            put(347, 7, jpeg_tables)
        return ents, bytes(ex)

    n_entries = 9 + (1 if jpeg_tables is not None else 0)
    ifd_off = len(out)
    ents, ex = build(ifd_off)
    out += _st.pack("<H", n_entries) + b"".join(ents)
    out += _st.pack("<I", 0) + ex
    _st.pack_into("<I", out, 4, ifd_off)
    return bytes(out)


def _split_jpeg_tables(blob: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG into (JPEGTables stream, abbreviated strip):
    tables = SOI + every DQT/DHT + EOI; strip = everything else."""
    import struct as _st

    tables = bytearray(b"\xff\xd8")
    strip = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(blob):
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        if marker == 0xDA:  # SOS: header + the rest of the stream
            strip += blob[pos:]
            break
        (ln,) = _st.unpack_from(">H", blob, pos + 2)
        seg = blob[pos : pos + 2 + ln]
        (tables if marker in (0xDB, 0xC4) else strip).extend(seg)
        pos += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(strip)


def test_jpeg_in_tiff_single_strip_exact():
    """Compression-7 TIFF with one full-JPEG strip: the constant-
    block flat-8 contract makes the lossy codec exact, so the TIFF
    path must reproduce the pixels bit-for-bit."""
    from lsdm_motogp_data_integration_spark.operators.jpegcodec import (
        encode_jpeg,
    )

    rng = np.random.RandomState(41)
    blocks = rng.randint(0, 256, (2, 3), np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)  # 16x24
    flat8 = np.full((8, 8), 8, np.int64)
    strip = encode_jpeg(img, quant=flat8)
    blob = _jpeg_tiff([strip], 24, 16, 16, 1)
    assert mc.sniff_format(blob) == "tiff"
    assert np.array_equal(mc.decode_image(blob), img)


def test_jpeg_in_tiff_multi_strip_with_jpeg_tables():
    """Abbreviated strips + a shared JPEGTables tag (TTN2): tables
    splice in after each strip's SOI; strips stack vertically."""
    from lsdm_motogp_data_integration_spark.operators.jpegcodec import (
        encode_jpeg,
    )

    rng = np.random.RandomState(42)
    blocks = rng.randint(0, 256, (4, 2), np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)  # 32x16
    flat8 = np.full((8, 8), 8, np.int64)
    full0 = encode_jpeg(img[:16], quant=flat8)
    full1 = encode_jpeg(img[16:], quant=flat8)
    t0, s0 = _split_jpeg_tables(full0)
    t1, s1 = _split_jpeg_tables(full1)
    assert t0 == t1  # same quant/huffman specs → shared tables
    blob = _jpeg_tiff([s0, s1], 16, 32, 16, 1, jpeg_tables=t0)
    assert np.array_equal(mc.decode_image(blob), img)
    # the abbreviated strips alone must NOT decode (tables absent)
    with pytest.raises(mc.MediaFormatError):
        mc.decode_image(_jpeg_tiff([s0], 16, 16, 16, 1))


def test_jpeg_in_tiff_rgb_and_corruption():
    from lsdm_motogp_data_integration_spark.operators.jpegcodec import (
        encode_jpeg,
    )

    c = np.full((16, 16, 3), [200, 30, 90], np.uint8)
    strip = encode_jpeg(c, quality=95)  # constant color: exact
    blob = _jpeg_tiff([strip], 16, 16, 16, 3, photometric=6)
    assert np.array_equal(mc.decode_image(blob), c)
    # channel count disagreeing with IFD spp is loud
    with pytest.raises(mc.MediaFormatError, match="channels"):
        mc.decode_image(_jpeg_tiff([strip], 16, 16, 16, 1))
    # strip that isn't JPEG at all
    with pytest.raises(mc.MediaFormatError, match="SOI"):
        mc.decode_image(_jpeg_tiff([b"\x00" * 40], 16, 16, 16, 1))


def test_webp_header_dims_all_chunk_kinds(spark):
    """WebP (r7): dims from the VP8 (lossy) / VP8L (lossless) / VP8X
    (extended) chunk headers — the O(header) stat pass covers the
    web's #3 image format; SAMPLE decode stays an honest gate."""
    import struct as _st

    def riff(chunks):
        body = b"WEBP" + chunks
        return b"RIFF" + _st.pack("<I", len(body)) + body

    vp8 = (
        b"VP8 " + _st.pack("<I", 10) + bytes(3) + b"\x9d\x01\x2a"
        + _st.pack("<HH", 320, 240)
    )
    bits = (320 - 1) | ((240 - 1) << 14)
    vp8l = (
        b"VP8L" + _st.pack("<I", 5) + b"\x2f" + _st.pack("<I", bits)
        + b"\x00"
    )
    vp8x = (
        b"VP8X" + _st.pack("<I", 10) + bytes(4)
        + (319).to_bytes(3, "little") + (239).to_bytes(3, "little")
    )
    blobs = [riff(vp8), riff(vp8l), riff(vp8x)]
    for blob in blobs:
        assert mc.sniff_format(blob) == "webp"
        assert mc.image_dims(blob) == (320, 240)
    # lossy VP8 decodes since r9; this header-only stub has an EMPTY
    # first partition, which the decoder rejects typed
    with pytest.raises(mc.MediaFormatError, match="partition empty"):
        mc.decode_image(blobs[0])
    with pytest.raises(mc.MediaFormatError, match="start code"):
        bad = bytearray(blobs[0])
        bad[23] ^= 0xFF
        mc.image_dims(bytes(bad))
    # a chunk whose DECLARED size is below the per-kind minimum must
    # raise the codec's typed error, not struct.error/IndexError (r8)
    for cid, tiny in ((b"VP8 ", 4), (b"VP8L", 2), (b"VP8X", 6)):
        short = riff(cid + _st.pack("<I", tiny) + bytes(tiny))
        with pytest.raises(mc.MediaFormatError, match="truncated"):
            mc.image_dims(short)
    # through the Spark stat operator (triage keeps the row)
    media = spark.createDataFrame(
        [(i, "image", b, None) for i, b in enumerate(blobs)],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in container_info(media).collect()}
    assert all(
        out[i]["fmt"] == "webp"
        and (out[i]["width"], out[i]["height"]) == (320, 240)
        for i in range(3)
    )


def test_avif_heic_header_dims(spark):
    """AVIF/HEIC (r7): canvas dims from the meta→iprp→ipco→ispe box
    walk on a hand-built skeleton; the largest ispe wins (thumbnails
    carry their own); decode stays a gate."""
    import struct as _st

    def box(btype, body):
        return _st.pack(">I", len(body) + 8) + btype + body

    def fullbox(btype, body):
        return box(btype, b"\x00\x00\x00\x00" + body)

    def heif(brand, ispes):
        ipco = b"".join(
            fullbox(b"ispe", _st.pack(">II", w, h)) for w, h in ispes
        )
        meta = fullbox(
            b"meta",
            box(b"hdlr", b"\x00" * 24)
            + box(b"iprp", box(b"ipco", ipco)),
        )
        return box(b"ftyp", brand + b"\x00\x00\x00\x00" + brand) + meta

    avif = heif(b"avif", [(160, 90), (1920, 1080)])
    heic = heif(b"heic", [(640, 480)])
    assert mc.sniff_format(avif) == "avif"
    assert mc.sniff_format(heic) == "heic"
    assert mc.image_dims(avif) == (1920, 1080)  # largest ispe
    assert mc.image_dims(heic) == (640, 480)
    # plain mp4 brands still sniff as mp4
    assert mc.sniff_format(mc.encode_mp4_skeleton(1000)) == "mp4"
    with pytest.raises(Exception):
        mc.decode_image(avif)  # pixel decode needs AV1 — gated
    with pytest.raises(mc.MediaFormatError, match="ispe"):
        mc.image_dims(heif(b"avif", []))
    media = spark.createDataFrame(
        [(1, "image", avif, None), (2, "image", heic, None)],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in container_info(media).collect()}
    assert out[1]["fmt"] == "avif" and out[1]["width"] == 1920
    assert out[2]["fmt"] == "heic" and out[2]["height"] == 480
