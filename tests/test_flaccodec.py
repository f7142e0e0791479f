"""FLAC (RFC 9639): encoder/decoder round-trips, HAND-BUILT streams
(assembled by an independent test-local bit packer + CRC loops)
pinning FIXED/LPC prediction, Rice + escape partitions, mid/side
reconstruction, wasted bits, and the CRC/MD5 integrity gates — plus
the audio-family integration (decode_audio dispatch, container_info
stat row, and the FLAC↔WAV twin pairing via audio_dhash)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lsdm_motogp_data_integration_spark.operators import flaccodec as fc
from lsdm_motogp_data_integration_spark.operators import mediacodec as mc
from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
)
from lsdm_motogp_data_integration_spark.operators.multimodal import (
    MEDIA_SCHEMA,
)


class _W:
    """Independent MSB-first bit packer for hand-built vectors."""

    def __init__(self):
        self.bits: list[int] = []

    def b(self, v: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def sb(self, v: int, k: int) -> None:
        self.b(v & ((1 << k) - 1), k)

    def unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def rice(self, e: int, param: int) -> None:
        v = (e << 1) if e >= 0 else ((-e) << 1) - 1
        self.unary(v >> param)
        if param:
            self.b(v & ((1 << param) - 1), param)

    def bytes(self) -> bytes:
        out = bytearray()
        cur, n = 0, 0
        for bit in self.bits:
            cur = (cur << 1) | bit
            n += 1
            if n == 8:
                out.append(cur)
                cur, n = 0, 0
        if n:
            out.append(cur << (8 - n))
        return bytes(out)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else crc << 1
    return crc & 0xFF


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _streaminfo(n: int, nch: int, bps: int, rate: int,
                md5: bytes = b"\x00" * 16) -> bytes:
    w = _W()
    w.b(n, 16)
    w.b(n, 16)
    w.b(0, 24)
    w.b(0, 24)
    w.b(rate, 20)
    w.b(nch - 1, 3)
    w.b(bps - 1, 5)
    w.b(n, 36)
    body = w.bytes() + md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(n: int, ch_code: int, ss_code: int = 4) -> bytes:
    w = _W()
    w.b(0x3FFE, 14)
    w.b(0, 1)
    w.b(0, 1)
    w.b(6, 4)  # block size: 8-bit at header end
    w.b(0, 4)  # sample rate: streaminfo
    w.b(ch_code, 4)
    w.b(ss_code, 3)
    w.b(0, 1)
    w.b(0, 8)  # frame number 0 (coded number, 1 byte)
    w.b(n - 1, 8)
    hdr = w.bytes()
    return hdr + bytes([_crc8(hdr)])


def _finish_frame(hdr: bytes, body: _W) -> bytes:
    frame = hdr + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def test_roundtrip_encoder_decoder():
    rng = np.random.RandomState(11)
    t = np.arange(9000)
    cases = [
        (3000 * np.sin(t / 40) + 200 * np.sin(t / 3)).astype(np.int16),
        rng.randint(-32768, 32768, 5000).astype(np.int16),
        np.full(77, 1234, np.int16),
        np.stack(
            [
                (1000 * np.sin(t[:5000] / 25)).astype(np.int16),
                rng.randint(-500, 500, 5000).astype(np.int16),
            ],
            axis=1,
        ),
        np.array([32767, -32768, 0], np.int16),
    ]
    for s in cases:
        blob = fc.encode_flac(s, 44100)
        out, rate = fc.decode_flac(blob)
        exp = s[:, None] if s.ndim == 1 else s
        assert rate == 44100
        assert np.array_equal(out, exp.astype(np.int32))
    info = fc.flac_info(fc.encode_flac(cases[0], 44100))
    assert info["sample_rate"] == 44100
    assert info["n_frames"] == 9000
    assert info["duration_ms"] == 9000 * 1000 // 44100
    assert info["bits_per_sample"] == 16 and info["channels"] == 1


def test_hand_built_fixed_order1_rice():
    """Mono, one frame, FIXED order-1 subframe: warmup 100, Rice
    param 0 residuals [3, -2, 0] → samples 100, 103, 101, 101."""
    body = _W()
    body.b(0, 1)
    body.b(8 + 1, 6)  # FIXED order 1
    body.b(0, 1)  # no wasted bits
    body.sb(100, 16)  # warmup
    body.b(0, 2)  # rice method 0
    body.b(0, 4)  # partition order 0
    body.b(0, 4)  # rice param 0
    for e in (3, -2, 0):
        body.rice(e, 0)
    blob = _streaminfo(4, 1, 16, 8000) + _finish_frame(
        _frame_header(4, 0), body
    )
    out, rate = fc.decode_flac(blob)
    assert rate == 8000
    assert out[:, 0].tolist() == [100, 103, 101, 101]


def test_hand_built_lpc_and_escape_partition():
    """LPC order 2 (precision 4, shift 2, coefs [3, 1]) over warmup
    [10, 20]: preds (3·20+10)>>2=17, (3·18+20)>>2=18 → samples
    [10, 20, 18, 17]; plus a second frame whose residual partition
    ESCAPES to 5-bit raw."""
    body = _W()
    body.b(0, 1)
    body.b(32 + 1, 6)  # LPC, order = (type&31)+1 = 2
    body.b(0, 1)
    body.sb(10, 16)
    body.sb(20, 16)
    body.b(3, 4)  # precision - 1
    body.sb(2, 5)  # shift
    body.sb(3, 4)  # coef[0]
    body.sb(1, 4)  # coef[1]
    body.b(0, 2)
    body.b(0, 4)
    body.b(0, 4)  # rice param 0
    body.rice(1, 0)
    body.rice(-1, 0)
    blob = _streaminfo(4, 1, 16, 8000) + _finish_frame(
        _frame_header(4, 0), body
    )
    out, _ = fc.decode_flac(blob)
    assert out[:, 0].tolist() == [10, 20, 18, 17]

    # escape partition: VERBATIM-free raw 5-bit residuals
    body = _W()
    body.b(0, 1)
    body.b(8 + 0, 6)  # FIXED order 0 (pred = 0 → samples = resid)
    body.b(0, 1)
    body.b(0, 2)
    body.b(0, 4)
    body.b(0xF, 4)  # escape
    body.b(5, 5)  # 5 raw bits per residual
    for v in (-7, 11, 0):
        body.sb(v, 5)
    blob = _streaminfo(3, 1, 16, 8000) + _finish_frame(
        _frame_header(3, 0), body
    )
    out, _ = fc.decode_flac(blob)
    assert out[:, 0].tolist() == [-7, 11, 0]


def test_hand_built_mid_side_and_wasted_bits():
    """Mid/side reconstruction with the odd bit: L=[5,-4], R=[2,-9]
    → mid=[3,-7] (16-bit), side=[3,5] (17-bit); then a wasted-bits
    CONSTANT subframe (2 wasted → value 25 decodes as 100)."""
    body = _W()
    # mid subframe: VERBATIM 16-bit
    body.b(0, 1)
    body.b(1, 6)
    body.b(0, 1)
    body.sb(3, 16)
    body.sb(-7, 16)
    # side subframe: VERBATIM 17-bit
    body.b(0, 1)
    body.b(1, 6)
    body.b(0, 1)
    body.sb(3, 17)
    body.sb(5, 17)
    blob = _streaminfo(2, 2, 16, 8000) + _finish_frame(
        _frame_header(2, 10), body  # channel code 10 = mid/side
    )
    out, _ = fc.decode_flac(blob)
    assert out[:, 0].tolist() == [5, -4]
    assert out[:, 1].tolist() == [2, -9]

    body = _W()
    body.b(0, 1)
    body.b(0, 6)  # CONSTANT
    body.b(1, 1)  # wasted flag
    body.unary(1)  # unary 1 → wasted = 2
    body.sb(25, 14)  # effective 14-bit value
    blob = _streaminfo(3, 1, 16, 8000) + _finish_frame(
        _frame_header(3, 0), body
    )
    out, _ = fc.decode_flac(blob)
    assert out[:, 0].tolist() == [100, 100, 100]


def test_integrity_gates():
    sig = (500 * np.sin(np.arange(200) / 5)).astype(np.int16)
    blob = bytearray(fc.encode_flac(sig, 8000))
    # frame CRC-16: flip a residual bit mid-frame
    blob2 = bytearray(blob)
    blob2[-10] ^= 0x01
    with pytest.raises(MediaFormatError, match="CRC"):
        fc.decode_flac(bytes(blob2))
    # STREAMINFO MD5: flip one digest byte (CRCs stay valid)
    blob3 = bytearray(blob)
    blob3[8 + 18] ^= 0xFF  # md5 lives at streaminfo body offset 18
    with pytest.raises(MediaFormatError, match="MD5"):
        fc.decode_flac(bytes(blob3))
    # not flac
    with pytest.raises(MediaFormatError, match="fLaC"):
        fc.decode_flac(b"nope" * 10)
    # reserved subframe type (2..7)
    body = _W()
    body.b(0, 1)
    body.b(2, 6)
    body.b(0, 1)
    blob4 = _streaminfo(1, 1, 16, 8000) + _finish_frame(
        _frame_header(1, 0), body
    )
    with pytest.raises(MediaFormatError, match="reserved subframe"):
        fc.decode_flac(blob4)
    # bad sync
    broken = bytes(blob[: len(blob) - (len(blob) - 4 - 38)]) + b"\x00\x00"
    with pytest.raises(MediaFormatError):
        fc.decode_flac(_streaminfo(4, 1, 16, 8000) + b"\x12\x34\x56\x78")


def test_decode_audio_dispatch_and_container_info(spark):
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        container_info,
        media_stats,
    )

    sig = (4000 * np.sin(np.arange(800) / 11)).astype(np.int16)
    flac = fc.encode_flac(sig, 8000)
    wav = mc.encode_wav(sig, 8000)
    assert mc.sniff_format(flac) == "flac"
    s, r = mc.decode_audio(flac)
    s2, r2 = mc.decode_audio(wav)
    assert (r, r2) == (8000, 8000)
    assert np.array_equal(s, s2)
    media = spark.createDataFrame(
        [(1, "audio", flac, None), (2, "audio", wav, None)],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in container_info(media).collect()}
    assert rows[1]["fmt"] == "flac" and rows[2]["fmt"] == "wav"
    assert rows[1]["n_frames"] == 800
    assert rows[1]["sample_rate"] == 8000
    assert rows[1]["duration_ms"] == rows[2]["duration_ms"] == 100
    assert rows[1]["has_audio"]
    # media_stats decodes both to the SAME canonical int16 stream
    st = {r["media_id"]: r for r in media_stats(media).collect()}
    assert st[1]["sum_values"] == st[2]["sum_values"]
    assert st[1]["n_values"] == st[2]["n_values"] == 800


def test_flac_wav_twin_pairs_by_audio_dhash(spark):
    """The ask's 'Done' pin: a FLAC re-encode of a WAV clip pairs at
    Hamming ~0 via audio_dhash while a distinct clip stays far."""
    from lsdm_motogp_data_integration_spark.operators.multimodal import (
        audio_dhash,
        audio_dhash_pairs,
    )

    t = np.arange(2000)
    clip = (6000 * np.sin(t / 13) + 900 * np.sin(t / 3)).astype(np.int16)
    other = (6000 * np.sin(t / 51) * np.cos(t / 7)).astype(np.int16)
    media = spark.createDataFrame(
        [
            (1, "audio", mc.encode_wav(clip, 8000), None),
            (2, "audio", fc.encode_flac(clip, 8000), None),
            (3, "audio", fc.encode_flac(other, 8000), None),
        ],
        MEDIA_SCHEMA,
    )
    hashes = {
        r["media_id"]: r["adhash"]
        for r in audio_dhash(media).collect()
    }
    assert hashes[1] == hashes[2]  # lossless → identical envelope hash
    assert bin(hashes[1] ^ hashes[3]).count("1") > 10
    pairs = {
        (r["id_a"], r["id_b"])
        for r in audio_dhash_pairs(media, max_hamming=2).collect()
    }
    assert pairs == {(1, 2)}


def test_encoder_stereo_decorrelation():
    """r8: the encoder picks a stereo decorrelation mode by measured
    coded cost — a correlated pair encodes via a side channel (frame
    header channel code 8/9/10) and stays bit-exact, including the
    int16 extremes through the 17-bit side channel."""
    rng = np.random.RandomState(9)
    t = np.arange(6000)
    left = (5000 * np.sin(t / 30)).astype(np.int16)
    right = (
        (left.astype(np.int32) + rng.randint(-40, 40, 6000))
        .clip(-32768, 32767)
        .astype(np.int16)
    )
    st = np.stack([left, right], axis=1)
    blob = fc.encode_flac(st, 44100)
    out, _ = fc.decode_flac(blob)
    assert np.array_equal(out, st.astype(np.int32))
    # first frame header: 'fLaC' + 4-byte block header + 34 streaminfo
    frame_off = 4 + 4 + 34
    assert blob[frame_off : frame_off + 2] == b"\xff\xf8"
    assert (blob[frame_off + 3] >> 4) in (8, 9, 10)
    # decorrelation must beat independent coding on correlated input
    indep = fc.encode_flac(
        np.stack(
            [left, rng.randint(-32768, 32768, 6000).astype(np.int16)],
            axis=1,
        ),
        44100,
    )
    assert len(blob) < len(indep)
    assert len(blob) < 6000 * 2 * 2 // 2  # beats half of raw PCM
    # extremes: odd sums shift through the mid/side odd-bit path
    edge = np.array(
        [[-32768, 32767], [32767, -32768], [1, -2], [-5, 4]], np.int16
    )
    got, _ = fc.decode_flac(fc.encode_flac(edge, 8000))
    assert np.array_equal(got, edge.astype(np.int32))


def test_streaminfo_spec_bounds():
    """r9 advisor fix: ultra-short inputs clamp the declared
    STREAMINFO min/max block size to the spec floor of 16 (the frame
    header still carries the true count), and sample rates above the
    20-bit STREAMINFO field (spec ceiling 655350) are rejected
    instead of silently truncated into a wrong-rate CRC-valid
    stream."""
    s = np.array([5, -3, 100, 7], np.int16)
    blob = fc.encode_flac(s, 8000)
    mn = int.from_bytes(blob[8:10], "big")
    mx = int.from_bytes(blob[10:12], "big")
    assert mn == 16 and mx == 16
    out, rate = fc.decode_flac(blob)
    assert rate == 8000
    assert np.array_equal(out[:, 0], s.astype(np.int32))
    for bad_rate in (0, 1 << 20, 655351, 1 << 24):
        with pytest.raises(MediaFormatError, match="rate"):
            fc.encode_flac(s, bad_rate)
    # the ceiling itself is codable
    blob2 = fc.encode_flac(s, 655350)
    _, rate2 = fc.decode_flac(blob2)
    assert rate2 == 655350


def test_24bit_decode_and_canonical_downshift():
    """r9: 24-bit FLAC decodes exactly (int32, hand-built VERBATIM
    frame from the independent packer) and the engine canonical
    (decode_audio) down-converts with the ARITHMETIC >>8 — floor
    toward -inf, the documented deterministic map."""
    import hashlib

    samples = [0x123456, -0x123456, 0x7FFFFF, -0x800000, 0, 257, -257]
    n = len(samples)
    # MD5 over the little-endian 3-byte stream (RFC 9639 §9.1.2)
    md = hashlib.md5()
    for v in samples:
        md.update((v & 0xFFFFFF).to_bytes(3, "little"))
    body = _W()
    body.b(0, 1)
    body.b(1, 6)  # VERBATIM
    body.b(0, 1)  # no wasted bits
    for v in samples:
        body.b(v & 0xFFFFFF, 24)
    blob = _streaminfo(n, 1, 24, 8000, md.digest()) + _finish_frame(
        _frame_header(n, 0, ss_code=6), body
    )
    out, rate = fc.decode_flac(blob)
    assert rate == 8000
    assert out[:, 0].tolist() == samples
    s16, rate2 = mc.decode_audio(blob)
    assert s16.dtype == np.int16
    # arithmetic shift: floor, so -0x123456 >> 8 == -0x1235
    assert s16[:, 0].tolist() == [v >> 8 for v in samples]
