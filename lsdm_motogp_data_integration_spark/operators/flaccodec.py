"""FLAC codec — lossless audio decode for the dominant lossless
distribution format, plus a real Rice-coding encoder for fixtures and
WAV→FLAC re-encoding.

Implemented from the public FLAC format specification (RFC 9639; the
xiph.org format document), the same exact-integer discipline as the
other codecs — every stage here is integer arithmetic, so a SQL
oracle can replay decoded samples closed-form:

- **Decoder** (:func:`decode_flac`): STREAMINFO + metadata-block
  walk, frame headers (sync, blocking strategy, coded block
  size/rate tables, UTF-8-style coded numbers, CRC-8), subframe
  types CONSTANT / VERBATIM / FIXED (orders 0–4) / LPC (quantized
  coefficients, signed shift), wasted bits, Rice-coded residual
  partitions (4- and 5-bit parameters, escape-to-raw), the stereo
  decorrelation modes (left/side, right/side, mid/side with the
  odd-bit reconstruction), frame CRC-16 verification, and the
  STREAMINFO MD5 check over the decoded stream.
- **Encoder** (:func:`encode_flac`): REAL compression — per-subframe
  choice of CONSTANT / FIXED order 0–2 with per-block Rice parameter
  search / VERBATIM fallback, correct CRCs and MD5, fixed 4096-sample
  blocking.  Output is a conformant stream any decoder accepts.

Unsupported honest gates: bits-per-sample not in {8, 16, 24} and
streams whose STREAMINFO is missing.

100 TB shape: per-blob Arrow-batch work in the same ``mapInPandas``
passes as the WAV path (``multimodal.media_stats`` /
``audio_dhash``); O(header) metadata via :func:`flac_info`.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
)

# --- MSB-first bit I/O --------------------------------------------------------


class _BitReader:
    __slots__ = ("d", "pos", "bit", "n")

    def __init__(self, d: bytes, pos: int = 0):
        self.d = d
        self.n = len(d)
        self.pos = pos
        self.bit = 0

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            if self.pos >= self.n:
                raise MediaFormatError("FLAC bitstream truncated")
            v = (v << 1) | ((self.d[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def sbits(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self.pos >= self.n:
                raise MediaFormatError("FLAC unary code truncated")
            if (self.d[self.pos] >> (7 - self.bit)) & 1:
                self.bit += 1
                if self.bit == 8:
                    self.bit = 0
                    self.pos += 1
                return q
            q += 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbit = 0

    def bits(self, v: int, k: int) -> None:
        for i in range(k - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.nbit += 1
            if self.nbit == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbit = 0

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self) -> None:
        while self.nbit:
            self.bits(0, 1)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


# --- CRCs (FLAC frame polynomials) --------------------------------------------


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 (frame headers)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 (whole frame)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# --- coded numbers (UTF-8-style, up to 36 bits) --------------------------------


def _read_coded_number(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 1 or n > 7:
        raise MediaFormatError("FLAC bad coded-number lead byte")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.bits(8)
        if (c & 0xC0) != 0x80:
            raise MediaFormatError("FLAC bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.bits(v, 8)
        return
    for nbytes in range(2, 8):
        if v < (1 << ((7 - nbytes) + 6 * (nbytes - 1))):
            break
    else:
        raise MediaFormatError("FLAC coded number exceeds 36 bits")
    lead_bits = 7 - nbytes
    lead = (0xFF << (8 - nbytes)) & 0xFF
    bw.bits(
        lead | ((v >> (6 * (nbytes - 1))) & ((1 << lead_bits) - 1)), 8
    )
    for i in range(nbytes - 2, -1, -1):
        bw.bits(0x80 | ((v >> (6 * i)) & 0x3F), 8)


# --- STREAMINFO / metadata ----------------------------------------------------


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) < 34:
        raise MediaFormatError("FLAC STREAMINFO truncated")
    br = _BitReader(body)
    return {
        "min_block": br.bits(16),
        "max_block": br.bits(16),
        "min_frame": br.bits(24),
        "max_frame": br.bits(24),
        "sample_rate": br.bits(20),
        "channels": br.bits(3) + 1,
        "bits_per_sample": br.bits(5) + 1,
        "total_samples": br.bits(36),
        "md5": body[18:34],
    }


def _walk_metadata(data: bytes) -> tuple[dict, int]:
    """→ (streaminfo, offset of the first audio frame)."""
    if data[:4] != b"fLaC":
        raise MediaFormatError("not a FLAC stream (fLaC magic missing)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise MediaFormatError("FLAC metadata truncated")
        hdr = data[pos]
        is_last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise MediaFormatError("FLAC metadata block truncated")
        if btype == 0:
            info = _parse_streaminfo(body)
        pos += 4 + size
        if is_last:
            break
    if info is None:
        raise MediaFormatError("FLAC has no STREAMINFO block")
    return info, pos


def flac_info(data: bytes) -> dict:
    """O(header) stat pass: STREAMINFO fields + derived duration."""
    info, _ = _walk_metadata(bytes(data))
    rate = info["sample_rate"]
    return {
        "sample_rate": rate,
        "channels": info["channels"],
        "bits_per_sample": info["bits_per_sample"],
        "n_frames": info["total_samples"],
        "duration_ms": (
            info["total_samples"] * 1000 // rate if rate else None
        ),
    }


# --- frame decode -------------------------------------------------------------

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
          6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
          11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_residual(
    br: _BitReader, block_size: int, order: int
) -> list[int]:
    method = br.bits(2)
    if method > 1:
        raise MediaFormatError(f"FLAC reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.bits(4)
    if block_size % (1 << po):
        raise MediaFormatError("FLAC partition order does not divide block")
    out: list[int] = []
    for p in range(1 << po):
        count = block_size >> po
        if p == 0:
            count -= order
            if count < 0:
                raise MediaFormatError("FLAC predictor order > partition")
        param = br.bits(pbits)
        if param == escape:
            raw = br.bits(5)
            for _ in range(count):
                out.append(br.sbits(raw) if raw else 0)
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | br.bits(param)
                out.append(-(v >> 1) - 1 if v & 1 else v >> 1)
    return out


def _decode_subframe(
    br: _BitReader, block_size: int, bps: int
) -> list[int]:
    if br.bits(1):
        raise MediaFormatError("FLAC subframe padding bit set")
    stype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise MediaFormatError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = br.sbits(eff)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.sbits(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.sbits(eff) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for i, e in enumerate(resid):
            pos = order + i
            pred = sum(
                c * samples[pos - 1 - j] for j, c in enumerate(coefs)
            )
            samples.append(e + pred)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [br.sbits(eff) for _ in range(order)]
        prec = br.bits(4)
        if prec == 15:
            raise MediaFormatError("FLAC invalid LPC precision 15")
        prec += 1
        shift = br.sbits(5)
        if shift < 0:
            raise MediaFormatError("FLAC negative LPC shift")
        coefs = [br.sbits(prec) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = list(warm)
        for e in resid:
            pos = len(samples)
            pred = sum(
                c * samples[pos - 1 - j] for j, c in enumerate(coefs)
            ) >> shift
            samples.append(e + pred)
    else:
        raise MediaFormatError(f"FLAC reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream → ((n, channels) int32 samples, rate).
    Frame CRC-16s are verified; the STREAMINFO MD5 (when set and the
    bit depth is byte-aligned) is verified over the decoded stream."""
    data = bytes(data)
    info, pos = _walk_metadata(data)
    bps_si = info["bits_per_sample"]
    if bps_si not in (8, 16, 24):
        raise NotImplementedError(
            f"FLAC bits-per-sample {bps_si} not supported (8/16/24)"
        )
    nch_si = info["channels"]
    chans: list[list[int]] = [[] for _ in range(nch_si)]
    total = info["total_samples"]
    while pos < len(data):
        if total and len(chans[0]) >= total:
            break
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.bits(14)
        if sync != 0x3FFE:
            raise MediaFormatError("FLAC frame sync code missing")
        if br.bits(1):
            raise MediaFormatError("FLAC frame reserved bit set")
        br.bits(1)  # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        ss_code = br.bits(3)
        if br.bits(1):
            raise MediaFormatError("FLAC frame reserved bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise MediaFormatError("FLAC reserved block size code 0")
        elif bs_code == 6:
            block_size = br.bits(8) + 1
        elif bs_code == 7:
            block_size = br.bits(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        elif sr_code == 15:
            raise MediaFormatError("FLAC invalid sample rate code 15")
        if ss_code == 0:
            bps = bps_si
        elif ss_code == 3:
            raise MediaFormatError("FLAC reserved sample size code")
        else:
            bps = _SAMPLE_SIZES[ss_code]
        br.align()
        if br.pos >= len(data):
            raise MediaFormatError("FLAC frame header truncated")
        hdr_crc = data[br.pos]
        if _crc8(data[frame_start : br.pos]) != hdr_crc:
            raise MediaFormatError("FLAC frame header CRC-8 mismatch")
        br.pos += 1
        if ch_code < 8:
            nch = ch_code + 1
            if nch != nch_si:
                raise MediaFormatError(
                    "FLAC frame channel count differs from STREAMINFO"
                )
            sub = [
                _decode_subframe(br, block_size, bps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if nch_si != 2:
                raise MediaFormatError(
                    "FLAC stereo decorrelation in a non-stereo stream"
                )
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                sub = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, block_size, bps + 1)
                right = _decode_subframe(br, block_size, bps)
                sub = [[s + r for s, r in zip(side, right)], right]
            else:  # mid/side
                mid = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                sub = [left, right]
        else:
            raise MediaFormatError(
                f"FLAC reserved channel assignment {ch_code}"
            )
        br.align()
        if br.pos + 2 > len(data):
            raise MediaFormatError("FLAC frame footer truncated")
        want = struct.unpack_from(">H", data, br.pos)[0]
        if _crc16(data[frame_start : br.pos]) != want:
            raise MediaFormatError("FLAC frame CRC-16 mismatch")
        br.pos += 2
        pos = br.pos
        for c in range(nch_si):
            chans[c].extend(sub[c])
    n = len(chans[0])
    if total and n > total:  # last block may be padded by upstream
        chans = [c[:total] for c in chans]
        n = total
    out = np.zeros((n, nch_si), np.int32)
    for c in range(nch_si):
        out[:, c] = chans[c]
    md5 = info["md5"]
    if md5 != b"\x00" * 16 and bps_si % 8 == 0:
        nbytes = bps_si // 8
        h = hashlib.md5()
        buf = bytearray()
        for v in out.reshape(-1).tolist():
            buf += int(v).to_bytes(nbytes, "little", signed=True)
        h.update(bytes(buf))
        if h.digest() != md5:
            raise MediaFormatError("FLAC STREAMINFO MD5 mismatch")
    rate = info["sample_rate"]
    if not rate:
        raise MediaFormatError("FLAC sample rate 0 in STREAMINFO")
    return out, rate


# --- encoder ------------------------------------------------------------------


def _rice_cost(resid: list[int], param: int) -> int:
    cost = 0
    for e in resid:
        v = (e << 1) if e >= 0 else ((-e) << 1) - 1
        cost += (v >> param) + 1 + param
    return cost


def _write_rice_residual(
    bw: _BitWriter, resid: list[int], param: int
) -> None:
    bw.bits(0, 2)  # 4-bit Rice parameters
    bw.bits(0, 4)  # partition order 0
    bw.bits(param, 4)
    for e in resid:
        v = (e << 1) if e >= 0 else ((-e) << 1) - 1
        bw.unary(v >> param)
        bw.bits(v & ((1 << param) - 1), param)


def _plan_subframe(samples: list[int], bps: int) -> tuple[int, tuple]:
    """Cost (bits) + writing plan for the cheapest subframe coding of
    one channel: CONSTANT / FIXED order 0-2 with per-block Rice
    parameter search / VERBATIM fallback."""
    n = len(samples)
    if all(s == samples[0] for s in samples):
        return 8 + bps, ("const", samples[0])
    best = None
    for order in range(0, 3):
        if n <= order:
            continue
        coefs = _FIXED_COEFS[order]
        resid = [
            samples[i]
            - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        for param in range(0, 15):
            cost = 8 + order * bps + 10 + _rice_cost(resid, param)
            if best is None or cost < best[0]:
                best = (cost, order, param, resid)
    verbatim_cost = 8 + n * bps
    if best is None or best[0] >= verbatim_cost:
        return verbatim_cost, ("verbatim", list(samples))
    cost, order, param, resid = best
    return cost, ("fixed", order, param, resid, samples[:order])


def _write_subframe(bw: _BitWriter, plan: tuple, bps: int) -> None:
    kind = plan[0]
    if kind == "const":
        bw.bits(0, 1)
        bw.bits(0, 6)  # CONSTANT
        bw.bits(0, 1)  # no wasted bits
        bw.bits(plan[1] & ((1 << bps) - 1), bps)
        return
    if kind == "verbatim":
        bw.bits(0, 1)
        bw.bits(1, 6)  # VERBATIM
        bw.bits(0, 1)
        for s in plan[1]:
            bw.bits(s & ((1 << bps) - 1), bps)
        return
    _, order, param, resid, warm = plan
    bw.bits(0, 1)
    bw.bits(8 + order, 6)  # FIXED
    bw.bits(0, 1)  # no wasted bits
    for s in warm:
        bw.bits(s & ((1 << bps) - 1), bps)
    _write_rice_residual(bw, resid, param)


def encode_flac(
    samples: np.ndarray, rate: int, *, block_size: int = 4096
) -> bytes:
    """Encode int16 PCM ((n,) mono or (n, ch)) as a real FLAC stream:
    CONSTANT/FIXED(0–2)+Rice/VERBATIM subframes per block, and — for
    stereo — per-block choice among independent / left-side /
    right-side / mid-side channel decorrelation by measured coded
    cost (r8).  Correct CRC-8/CRC-16, STREAMINFO MD5.  Lossless by
    construction — :func:`decode_flac` (or any conformant decoder)
    reproduces the input exactly."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise MediaFormatError("encode_flac wants int16 samples")
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    if not (1 <= nch <= 8):
        raise MediaFormatError(f"FLAC channels {nch} out of range")
    if n == 0:
        raise MediaFormatError("encode_flac of empty sample array")
    # r9 advisor fix: the 20-bit STREAMINFO field silently truncates
    # rates >= 2^20 into a wrong-rate-but-CRC-valid stream; the spec
    # ceiling is 655350 Hz — reject instead
    if not (1 <= rate <= 655350):
        raise MediaFormatError(f"FLAC sample rate {rate} out of range")
    bps = 16
    md5 = hashlib.md5(
        s.astype("<i2").tobytes()
    ).digest()
    # STREAMINFO (min/max block size exclude the last, shorter block).
    # r9 advisor fix: the spec-minimum block size is 16, so clamp the
    # declared min/max for ultra-short inputs (the actual frame still
    # carries its true bn in the frame header — decoders trust that)
    si = _BitWriter()
    si.bits(max(16, min(n, block_size)), 16)
    si.bits(max(16, min(n, block_size)), 16)
    si.bits(0, 24)
    si.bits(0, 24)
    si.bits(rate, 20)
    si.bits(nch - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(n, 36)
    streaminfo = si.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
    out += streaminfo
    frame_no = 0
    for start in range(0, n, block_size):
        blk = s[start : start + block_size]
        bn = blk.shape[0]
        # channel coding: independent planes, or (stereo only) the
        # decorrelation mode with the smallest measured coded cost
        plans = [
            _plan_subframe(blk[:, c].tolist(), bps) for c in range(nch)
        ]
        ch_code = nch - 1
        subframes = [(pl, bps) for _, pl in plans]
        if nch == 2:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = (left - right).tolist()
            mid = ((left + right) >> 1).tolist()
            p_l, p_r = plans
            p_s = _plan_subframe(side, bps + 1)
            p_m = _plan_subframe(mid, bps)
            indep = p_l[0] + p_r[0]
            cands = [
                (indep, 1, [(p_l[1], bps), (p_r[1], bps)]),
                (p_l[0] + p_s[0], 8,
                 [(p_l[1], bps), (p_s[1], bps + 1)]),
                (p_s[0] + p_r[0], 9,
                 [(p_s[1], bps + 1), (p_r[1], bps)]),
                (p_m[0] + p_s[0], 10,
                 [(p_m[1], bps), (p_s[1], bps + 1)]),
            ]
            _, ch_code, subframes = min(cands, key=lambda c: c[0])
        bw = _BitWriter()
        bw.bits(0x3FFE, 14)
        bw.bits(0, 1)
        bw.bits(0, 1)  # fixed blocking strategy
        bw.bits(7, 4)  # block size: 16-bit at end of header
        bw.bits(0, 4)  # sample rate: from STREAMINFO
        bw.bits(ch_code, 4)
        bw.bits(4, 3)  # 16-bit samples
        bw.bits(0, 1)
        _write_coded_number(bw, frame_no)
        bw.bits(bn - 1, 16)
        hdr = bw.bytes()
        hdr += bytes([_crc8(hdr)])
        body = _BitWriter()
        for pl, pbps in subframes:
            _write_subframe(body, pl, pbps)
        frame = hdr + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
