"""Pure-numpy JPEG codec (ITU-T T.81): baseline sequential + full
progressive DCT.

JPEG is by far the most common container in any web-crawled
multimodal corpus — and the majority of real web JPEGs are
PROGRESSIVE (SOF2) — so both processes are implemented here from the
public specification (ITU-T T.81 Annex F/G/K; the JFIF colorspace is
ITU-T T.871) with numpy doing the block math; no codec library.

Decoder (:func:`decode_jpeg`):

- **Baseline sequential DCT (SOF0/SOF1)**, 8-bit precision, 1 or 3
  components, arbitrary sampling factors with max factor ≤ 4 (covers
  4:4:4, 4:2:2, 4:2:0); chroma upsampling is nearest (pixel
  replication), the cheapest spec-allowed reconstruction.
- **Progressive DCT (SOF2, Annex G.1.2)**: multi-scan spectral
  selection + successive approximation — interleaved/non-interleaved
  DC first+refinement scans, per-component AC band scans with EOBn
  run codes, and the AC refinement correction-bit procedure;
  coefficients accumulate across scans and reconstruct through the
  same IDCT tail as baseline.
- Huffman tables, quantization tables, and restart intervals are read
  FROM THE FILE (DHT/DQT/DRI, redefinable between scans), so any
  baseline or progressive JPEG decodes — the Annex K tables below are
  only the encoder's defaults.
- Byte-stuffing (``FF 00``) and restart markers (``RST0-7`` with DC
  predictor + EOB-run reset and byte realignment) handled per scan.
- Arithmetic coding (SOF9+), lossless/hierarchical, and 12-bit
  precision raise ``NotImplementedError`` — honest gates, same
  contract as the other codecs.

Encoder (:func:`encode_jpeg`):

- Grayscale or RGB input; JFIF YCbCr conversion; optional 2×2 box
  chroma subsampling (4:2:0); Annex K quantization tables scaled by
  ``quality`` (libjpeg's published 50-point pivot formula) or a
  caller-supplied flat table; Annex K Huffman tables; optional
  restart interval.
- ``progressive=True`` emits SOF2 with libjpeg's default scan script
  and PER-SCAN OPTIMAL Huffman tables (T.81 Annex K.2 generation —
  required because EOBn symbols aren't in the fixed Annex K tables);
  both encodings carry the same quantized coefficients, so baseline
  and progressive forms of an image decode to identical pixels (the
  cross-pin used by tests and the q41 ``real_jpeg_p`` oracle).
- Deterministic: same array + params → same bytes on any platform
  (float64 DCT, ``np.rint`` quantization).

Exactness contract used by the q41 ``real_jpeg`` oracle: an image
whose every 8×8 block is a CONSTANT value v has all-zero AC
coefficients and DC = 8·(v−128) exactly; with a quant table whose
DC entry is 8 the quantized DC is v−128 with no rounding, so
decode(encode(img)) reproduces v bit-for-bit — a closed form a SQL
oracle can replay from the fixture's md5 chain without a DCT.  (The
float IDCT's |error| for these values is ≤ ~1e-10, far inside the
round-to-integer.)  General images round-trip within quantization
error, pinned by tests, not by the oracle.

Runs INSIDE Arrow-batched pandas UDFs on executor-local ``bytes``
(same placement as :mod:`mediacodec`).  Decode performance design:
entropy segments are pre-split at restart markers and byte-unstuffed
WHOLESALE (one C-level ``replace`` instead of per-byte checks);
Huffman decode is a flat 16-bit-prefix table hit on an inlined int
bit-buffer (no reader object — profiled 4× over per-call methods);
the IDCT runs ONCE per component as a batched einsum over all
blocks.  The per-coefficient Python loop is the honest floor
(~1 µs/coefficient, ≈3.5 MP/s on photographic content per core) —
JPEG entropy decode is sequential by construction; throughput at
corpus scale comes from Arrow-batch parallelism across executor
cores, and from :func:`mediacodec.image_dims`'s header-only stat
pass avoiding decode entirely where only metadata is needed.

Reference parity note: the reference ETL
(salvatoreChiacchio0/LSDM-MotoGP-Data-Integration) has no media
handling; this serves the brief's multimodal-columns requirement.
"""

from __future__ import annotations

import struct

import numpy as np

from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
)

__all__ = ["decode_jpeg", "encode_jpeg"]


# --- constants (public: ITU-T T.81 Annex K) --------------------------------

# zigzag scan: generated, not transcribed — position k of the scan is
# (row, col) ZIGZAG[k]; NATURAL[r*8+c] = k inverts it.
def _zigzag_pairs() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        rc = [(r, s - r) for r in range(s + 1) if r < 8 and s - r < 8]
        if s % 2 == 0:
            rc.reverse()
        out.extend(rc)
    return out


_ZIGZAG = _zigzag_pairs()
# flat natural index (r*8+c) for each zigzag position
_ZIG_TO_NAT = np.array([r * 8 + c for r, c in _ZIGZAG], dtype=np.int64)

# Annex K.1/K.2 quantization tables (luminance, chrominance), natural order
_K1_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_K2_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 Huffman table specs: (BITS[1..16] code counts, HUFFVAL)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8×8 DCT-II orthonormal basis: A[u, x] = c_u/2 · cos((2x+1)uπ/16);
# forward F = A·f·Aᵀ, inverse f = Aᵀ·F·A (T.81 A.3.3 with the ¼·c·c
# normalization folded into the matrix)
def _dct_matrix() -> np.ndarray:
    x = np.arange(8, dtype=np.float64)
    u = x.reshape(8, 1)
    a = 0.5 * np.cos((2.0 * x + 1.0) * u * np.pi / 16.0)
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


_A = _dct_matrix()


# --- Huffman code construction (T.81 Annex C) ------------------------------


def _build_fast_table(
    bits: list[int], vals: list[int]
) -> tuple[list[int], list[int]]:
    """Flat 16-bit-prefix lookup (the standard fast Huffman decode):
    entry ``p`` of the 65536-slot tables gives the symbol and code
    length of the canonical code that prefixes ``p`` (0 length =
    invalid prefix).  One peek + one table hit replaces a bit-by-bit
    walk — the difference between O(bits) and O(codes) Python
    iterations per coefficient."""
    if len(bits) < 16:
        raise MediaFormatError("JPEG DHT BITS list truncated")
    if len(vals) < sum(bits):
        raise MediaFormatError(
            "JPEG DHT value list shorter than its BITS counts"
        )
    sym = [0] * 65536
    lng = [0] * 65536
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if code >= (1 << ln):
                raise MediaFormatError(
                    "JPEG DHT code space oversubscribed"
                )
            base = code << (16 - ln)
            span = 1 << (16 - ln)
            sym[base : base + span] = [vals[k]] * span
            lng[base : base + span] = [ln] * span
            k += 1
            code += 1
        code <<= 1
    return sym, lng


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, code_length)."""
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return enc


# --- entropy-coded segment reader ------------------------------------------


def _split_entropy(
    data: bytes, pos: int
) -> tuple[list[bytes], list[int], int]:
    """Split the scan's entropy-coded data at restart markers and
    byte-unstuff each segment WHOLESALE (``FF 00 → FF`` via
    ``bytes.replace`` — one C pass instead of a per-byte Python
    check).  Returns (segments, the RSTn byte after each segment but
    the last, offset of the terminating marker's FF — or ``len(data)``
    if the stream just ends).  Fill ``FF`` bytes before a marker are
    left on the segment tail: they sit after the final byte-aligned
    EOB, so no valid stream ever reads them."""
    segs: list[bytes] = []
    marks: list[int] = []
    start = pos
    i = pos
    n = len(data)
    end = n
    while True:
        i = data.find(b"\xff", i)  # C-speed skip over non-FF bytes
        if i < 0 or i + 1 >= n:
            segs.append(data[start:n])
            break
        m = data[i + 1]
        if m == 0x00:
            i += 2
            continue
        if m == 0xFF:  # fill byte
            i += 1
            continue
        segs.append(data[start:i])
        if 0xD0 <= m <= 0xD7:
            marks.append(m)
            i += 2
            start = i
            continue
        end = i  # EOI / DNL / next header marker ends the scan
        break
    return [s.replace(b"\xff\x00", b"\xff") for s in segs], marks, end


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw `size`-bit magnitude to the
    signed coefficient value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _decode_scan_segment(
    seg: bytes,
    order: list[tuple[int, tuple[list[int], list[int]], tuple[list[int], list[int]], int]],
    n_mcus: int,
    preds: list[int],
    coef_lists: list[list[int]],
    zn: list[int],
) -> None:
    """Entropy-decode ``n_mcus`` MCUs from one unstuffed segment into
    the flat per-component coefficient lists.  ``order`` is the
    per-MCU block sequence: (component idx, DC fast table, AC fast
    table, flat base offset RELATIVE to the MCU's first block of that
    component) — precomputed so the hot loop is pure int arithmetic.

    The bit buffer is INLINED (no reader object): Huffman decode is a
    16-bit peek into the flat prefix tables + one length drop, which
    profiling showed is ~4× faster than per-call reader methods —
    this loop touches every coefficient of every block and dominates
    decode time on dense images.  Bits past the segment end peek as
    1-bit padding (T.81 F.1.2.3) but consuming them raises."""
    d = seg
    dl = len(d)
    p = 0
    buf = 0
    nb = 0
    for _ in range(n_mcus):
        for ci, (dsym, dlen), (asym, alen), base_off in order:
            base = base_off[0]
            base_off[0] += 64
            row = coef_lists[ci]
            # --- DC: peek16 / table / drop / receive / extend ---
            if nb < 16:
                while nb < 16 and p < dl:
                    buf = (buf << 8) | d[p]
                    p += 1
                    nb += 8
                if nb < 16:
                    pad = 16 - nb
                    pk = ((buf << pad) | ((1 << pad) - 1)) & 0xFFFF
                else:
                    pk = (buf >> (nb - 16)) & 0xFFFF
            else:
                pk = (buf >> (nb - 16)) & 0xFFFF
            ln = dlen[pk]
            if ln == 0:
                raise MediaFormatError("invalid DC Huffman code")
            if nb < ln:
                raise MediaFormatError("JPEG entropy data truncated")
            nb -= ln
            t = dsym[pk]
            if t:
                while nb < t:
                    if p >= dl:
                        raise MediaFormatError(
                            "JPEG entropy data truncated"
                        )
                    buf = (buf << 8) | d[p]
                    p += 1
                    nb += 8
                nb -= t
                v = (buf >> nb) & ((1 << t) - 1)
                if v < (1 << (t - 1)):
                    v -= (1 << t) - 1
                preds[ci] += v
            row[base] = preds[ci]
            # --- AC run-length loop ---
            k = 1
            while k < 64:
                if nb < 16:
                    while nb < 16 and p < dl:
                        buf = (buf << 8) | d[p]
                        p += 1
                        nb += 8
                    if nb < 16:
                        pad = 16 - nb
                        pk = ((buf << pad) | ((1 << pad) - 1)) & 0xFFFF
                    else:
                        pk = (buf >> (nb - 16)) & 0xFFFF
                else:
                    pk = (buf >> (nb - 16)) & 0xFFFF
                ln = alen[pk]
                if ln == 0:
                    raise MediaFormatError("invalid AC Huffman code")
                if nb < ln:
                    raise MediaFormatError("JPEG entropy data truncated")
                nb -= ln
                rs = asym[pk]
                ss = rs & 15
                if ss == 0:
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += rs >> 4
                if k > 63:
                    raise MediaFormatError("AC run past block end")
                while nb < ss:
                    if p >= dl:
                        raise MediaFormatError(
                            "JPEG entropy data truncated"
                        )
                    buf = (buf << 8) | d[p]
                    p += 1
                    nb += 8
                nb -= ss
                v = (buf >> nb) & ((1 << ss) - 1)
                if v < (1 << (ss - 1)):
                    v -= (1 << ss) - 1
                row[base + zn[k]] = v
                k += 1
            buf &= (1 << nb) - 1  # trim consumed high bits per block


# --- progressive scan kernels (T.81 Annex G.1.2) ----------------------------
#
# Progressive coefficients are stored ZIGZAG-ordered per block (the
# spectral band Ss..Se is a contiguous zigzag span), in per-component
# flat lists indexed (block_row * grid_width + block_col) * 64 over the
# INTERLEAVED padded grid; non-interleaved scans iterate only the
# component's own ceil(comp_dim/8) block rectangle inside it.  Each
# kernel consumes one unstuffed entropy segment with the same inlined
# int bit-buffer as the baseline hot loop.


def _prog_dc_first(
    seg: bytes, seq: list, preds: list, al: int, dctabs: list
) -> None:
    """DC first scan (Ss=0, Ah=0): baseline DC diff coding, the value
    point-transformed left by Al.  ``seq``: (slot, lst, base) per
    block in MCU order; ``dctabs``: per-slot fast tables."""
    d = seg
    dl = len(d)
    p = 0
    buf = 0
    nb = 0
    for slot, lst, base in seq:
        dsym, dlen = dctabs[slot]
        if nb < 16:
            while nb < 16 and p < dl:
                buf = (buf << 8) | d[p]
                p += 1
                nb += 8
            if nb < 16:
                pad = 16 - nb
                pk = ((buf << pad) | ((1 << pad) - 1)) & 0xFFFF
            else:
                pk = (buf >> (nb - 16)) & 0xFFFF
        else:
            pk = (buf >> (nb - 16)) & 0xFFFF
        ln = dlen[pk]
        if ln == 0:
            raise MediaFormatError("invalid DC Huffman code")
        if nb < ln:
            raise MediaFormatError("JPEG entropy data truncated")
        nb -= ln
        t = dsym[pk]
        if t:
            while nb < t:
                if p >= dl:
                    raise MediaFormatError("JPEG entropy data truncated")
                buf = (buf << 8) | d[p]
                p += 1
                nb += 8
            nb -= t
            v = (buf >> nb) & ((1 << t) - 1)
            if v < (1 << (t - 1)):
                v -= (1 << t) - 1
            preds[slot] += v
        lst[base] = preds[slot] << al
        buf &= (1 << nb) - 1


def _prog_dc_refine(seg: bytes, seq: list, al: int) -> None:
    """DC refinement (Ss=0, Ah>0): one raw bit per block ORed into
    position Al (two's-complement OR is the spec's correction for
    negative values too)."""
    d = seg
    dl = len(d)
    p = 0
    buf = 0
    nb = 0
    bit = 1 << al
    for _slot, lst, base in seq:
        if nb == 0:
            if p >= dl:
                raise MediaFormatError("JPEG entropy data truncated")
            buf = d[p]
            p += 1
            nb = 8
        nb -= 1
        if (buf >> nb) & 1:
            lst[base] |= bit
        buf &= (1 << nb) - 1


def _prog_ac_first(
    seg: bytes,
    seq: list,
    actab: tuple,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """AC first scan (Ss>0, Ah=0): run/size coding inside the band
    plus EOBn run codes (symbol r<<4, r<15: run of 2^r + r extra bits
    of whole end-of-band blocks).  Returns the EOB run carried into
    the next block/segment-less call."""
    asym, alen = actab
    d = seg
    dl = len(d)
    p = 0
    buf = 0
    nb = 0
    for lst, base in seq:
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            if nb < 16:
                while nb < 16 and p < dl:
                    buf = (buf << 8) | d[p]
                    p += 1
                    nb += 8
                if nb < 16:
                    pad = 16 - nb
                    pk = ((buf << pad) | ((1 << pad) - 1)) & 0xFFFF
                else:
                    pk = (buf >> (nb - 16)) & 0xFFFF
            else:
                pk = (buf >> (nb - 16)) & 0xFFFF
            ln = alen[pk]
            if ln == 0:
                raise MediaFormatError("invalid AC Huffman code")
            if nb < ln:
                raise MediaFormatError("JPEG entropy data truncated")
            nb -= ln
            rs = asym[pk]
            s = rs & 15
            r = rs >> 4
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    while nb < r:
                        if p >= dl:
                            raise MediaFormatError(
                                "JPEG entropy data truncated"
                            )
                        buf = (buf << 8) | d[p]
                        p += 1
                        nb += 8
                    nb -= r
                    eobrun += (buf >> nb) & ((1 << r) - 1)
                break
            k += r
            if k > se:
                raise MediaFormatError("AC run past band end")
            while nb < s:
                if p >= dl:
                    raise MediaFormatError("JPEG entropy data truncated")
                buf = (buf << 8) | d[p]
                p += 1
                nb += 8
            nb -= s
            v = (buf >> nb) & ((1 << s) - 1)
            if v < (1 << (s - 1)):
                v -= (1 << s) - 1
            lst[base + k] = v << al
            k += 1
        buf &= (1 << nb) - 1
    return eobrun


def _prog_ac_refine(
    seg: bytes,
    seq: list,
    actab: tuple,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """AC refinement (Ss>0, Ah>0): the correction-bit procedure
    (G.1.2.3) — newly-nonzero coefficients arrive as ±2^Al (size must
    be 1), and every already-nonzero coefficient passed over (in runs,
    ZRL spans, and EOB-run blocks) consumes one correction bit that
    may set its Al magnitude bit."""
    asym, alen = actab
    p1 = 1 << al
    m1 = -1 << al
    d = seg
    dl = len(d)
    p = 0
    buf = 0
    nb = 0
    for lst, base in seq:
        k = ss
        if eobrun == 0:
            while k <= se:
                if nb < 16:
                    while nb < 16 and p < dl:
                        buf = (buf << 8) | d[p]
                        p += 1
                        nb += 8
                    if nb < 16:
                        pad = 16 - nb
                        pk = ((buf << pad) | ((1 << pad) - 1)) & 0xFFFF
                    else:
                        pk = (buf >> (nb - 16)) & 0xFFFF
                else:
                    pk = (buf >> (nb - 16)) & 0xFFFF
                ln = alen[pk]
                if ln == 0:
                    raise MediaFormatError("invalid AC Huffman code")
                if nb < ln:
                    raise MediaFormatError("JPEG entropy data truncated")
                nb -= ln
                rs = asym[pk]
                s = rs & 15
                r = rs >> 4
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            while nb < r:
                                if p >= dl:
                                    raise MediaFormatError(
                                        "JPEG entropy data truncated"
                                    )
                                buf = (buf << 8) | d[p]
                                p += 1
                                nb += 8
                            nb -= r
                            eobrun += (buf >> nb) & ((1 << r) - 1)
                        break  # remaining corrections in the EOB tail
                    val = 0  # ZRL: span of 16 zero-history positions
                else:
                    if s != 1:
                        raise MediaFormatError(
                            "AC refinement coefficient size != 1"
                        )
                    if nb == 0:
                        if p >= dl:
                            raise MediaFormatError(
                                "JPEG entropy data truncated"
                            )
                        buf = d[p]
                        p += 1
                        nb = 8
                    nb -= 1
                    val = p1 if (buf >> nb) & 1 else m1
                # advance over r zero-history positions, correcting
                # nonzero-history coefficients along the way
                while k <= se:
                    c = lst[base + k]
                    if c != 0:
                        if nb == 0:
                            if p >= dl:
                                raise MediaFormatError(
                                    "JPEG entropy data truncated"
                                )
                            buf = d[p]
                            p += 1
                            nb = 8
                        nb -= 1
                        if (buf >> nb) & 1 and (c & p1) == 0:
                            lst[base + k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val != 0:
                    if k > se:
                        raise MediaFormatError(
                            "AC refinement lands past band end"
                        )
                    lst[base + k] = val
                k += 1
        if eobrun > 0:
            # end-of-band: correction bits for the rest of this block
            while k <= se:
                c = lst[base + k]
                if c != 0:
                    if nb == 0:
                        if p >= dl:
                            raise MediaFormatError(
                                "JPEG entropy data truncated"
                            )
                        buf = d[p]
                        p += 1
                        nb = 8
                    nb -= 1
                    if (buf >> nb) & 1 and (c & p1) == 0:
                        lst[base + k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
        buf &= (1 << nb) - 1
    return eobrun


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    geom: tuple,
    prog: list,
    hufftabs: dict,
    dri: int,
    scomps: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode one progressive scan's entropy data into the persistent
    per-component coefficient lists; returns the offset of the marker
    that terminated the scan."""
    h, w, comps, maxh, maxv, mcus_x, mcus_y = geom
    cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
    idxs = []
    for cs, td, ta in scomps:
        if cs not in cid_to_idx:
            raise MediaFormatError(f"scan component {cs} not in frame")
        idxs.append((cid_to_idx[cs], td, ta))
    if ss == 0:
        if se != 0:
            raise MediaFormatError("progressive DC scan with Se != 0")
    else:
        if len(idxs) != 1:
            raise MediaFormatError(
                "progressive AC scan must be non-interleaved"
            )
        if not ss <= se <= 63:
            raise MediaFormatError(f"bad spectral band {ss}..{se}")
    if ah and al != ah - 1:
        raise MediaFormatError(
            f"successive approximation Al={al} != Ah-1={ah - 1}"
        )

    dctabs = []
    actab = None
    if ss == 0 and ah == 0:
        for _ci, td, _ta in idxs:
            if (0, td) not in hufftabs:
                raise MediaFormatError(
                    f"JPEG references undefined DHT class=0 id={td}"
                )
            dctabs.append(hufftabs[(0, td)])
    if ss > 0:
        ta = idxs[0][2]
        if (1, ta) not in hufftabs:
            raise MediaFormatError(
                f"JPEG references undefined DHT class=1 id={ta}"
            )
        actab = hufftabs[(1, ta)]

    # block sequence in MCU order; a scan is interleaved iff ns > 1
    if len(idxs) > 1:
        per_mcu = []
        for slot, (ci, _td, _ta) in enumerate(idxs):
            hi, vi, _tq, bw, _bh, lst = prog[ci]
            for by in range(vi):
                for bx in range(hi):
                    per_mcu.append((slot, lst, by, bx, hi, vi, bw))
        seq = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for slot, lst, by, bx, hi, vi, bw in per_mcu:
                    seq.append(
                        (
                            slot,
                            lst,
                            ((my * vi + by) * bw + mx * hi + bx) * 64,
                        )
                    )
        total_mcus = mcus_x * mcus_y
        bpm = len(per_mcu)
    else:
        ci = idxs[0][0]
        hi, vi, _tq, bw, _bh, lst = prog[ci]
        # non-interleaved geometry: the component's OWN block grid
        # (ceil(ceil(dim*fac/maxfac)/8)), not the padded MCU grid
        comp_w = -(-(w * hi) // maxh)
        comp_h = -(-(h * vi) // maxv)
        nbw = -(-comp_w // 8)
        nbh = -(-comp_h // 8)
        if ss == 0:
            seq = [
                (0, lst, (by * bw + bx) * 64)
                for by in range(nbh)
                for bx in range(nbw)
            ]
        else:
            seq = [
                (lst, (by * bw + bx) * 64)
                for by in range(nbh)
                for bx in range(nbw)
            ]
        total_mcus = nbh * nbw
        bpm = 1

    def dispatch(segm: bytes, sl: list, preds: list, eob: int) -> int:
        if ss == 0:
            if ah == 0:
                _prog_dc_first(segm, sl, preds, al, dctabs)
            else:
                _prog_dc_refine(segm, sl, al)
            return 0
        if ah == 0:
            return _prog_ac_first(segm, sl, actab, ss, se, al, eob)
        return _prog_ac_refine(segm, sl, actab, ss, se, al, eob)

    segs, rst_marks, end = _split_entropy(data, pos)
    preds = [0] * len(idxs)
    eobrun = 0
    if dri:
        n_segs = -(-total_mcus // dri)
        if len(segs) < n_segs:
            raise MediaFormatError(
                f"missing restart segments: have {len(segs)}, "
                f"need {n_segs}"
            )
        done = 0
        for si in range(n_segs):
            if si:
                if rst_marks[si - 1] != 0xD0 + ((si - 1) % 8):
                    raise MediaFormatError(
                        f"RST marker out of sequence before segment {si}"
                    )
                preds = [0] * len(idxs)
                eobrun = 0
            cnt = min(dri, total_mcus - done)
            eobrun = dispatch(
                segs[si], seq[done * bpm : (done + cnt) * bpm],
                preds, eobrun,
            )
            done += cnt
    else:
        eobrun = dispatch(segs[0], seq, preds, eobrun)
    return end


# --- decoder ----------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential OR progressive JPEG to ``(H, W)
    uint8`` grayscale or ``(H, W, 3) uint8`` RGB (JFIF YCbCr→RGB).
    Reads quant/Huffman tables, sampling factors, and restart
    interval from the stream; progressive streams decode every scan
    (spectral selection + successive approximation) into persistent
    coefficient arrays before one reconstruction pass.  Raises
    ``NotImplementedError`` for arithmetic/lossless/12-bit and
    ``MediaFormatError`` for corrupt streams."""
    if data[:3] != b"\xff\xd8\xff":
        raise MediaFormatError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    scan = None
    progressive = False
    prog: list | None = None
    geom: tuple | None = None
    n_scans = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise MediaFormatError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # no-payload markers
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise MediaFormatError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 15
                off += 1
                nbytes = 64 if pq == 0 else 128
                if off + nbytes > len(seg):
                    raise MediaFormatError("JPEG DQT table truncated")
                if pq == 0:
                    tab = np.frombuffer(
                        seg[off : off + 64], np.uint8
                    ).astype(np.int64)
                    off += 64
                else:
                    tab = np.frombuffer(
                        seg[off : off + 128], ">u2"
                    ).astype(np.int64)
                    off += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIG_TO_NAT] = tab
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 15
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                if tc == 0 and any(v > 15 for v in vals):
                    # DC symbols are magnitude CATEGORIES (0..15,
                    # T.81 table F.1); a corrupt table would feed
                    # receive() a 200-bit read and blow the int32
                    # coefficient contract instead of failing typed
                    raise MediaFormatError(
                        "JPEG DC Huffman table with category > 15"
                    )
                hufftabs[(tc, th)] = _build_fast_table(bits, vals)
                off += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xC0 or marker == 0xC1:
            # baseline / extended-sequential Huffman (same decode path)
            if len(seg) < 6:
                raise MediaFormatError("JPEG SOF header truncated")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            if len(seg) < 6 + 3 * nc:
                raise MediaFormatError("JPEG SOF component list truncated")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if (hv >> 4) == 0 or (hv & 15) == 0:
                    raise MediaFormatError(
                        "JPEG zero sampling factor"
                    )
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # progressive DCT, Huffman (SOF2)
            if len(seg) < 6:
                raise MediaFormatError("JPEG SOF header truncated")
            prec, ph, pw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            if ph == 0 or pw == 0:
                raise MediaFormatError(
                    "JPEG zero dimension (DNL unsupported)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG {nc}-component")
            if len(seg) < 6 + 3 * nc:
                raise MediaFormatError("JPEG SOF component list truncated")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if (hv >> 4) == 0 or (hv & 15) == 0:
                    raise MediaFormatError("JPEG zero sampling factor")
                comps.append((cid, hv >> 4, hv & 15, tq))
            maxh = max(c[1] for c in comps)
            maxv = max(c[2] for c in comps)
            if not (1 <= maxh <= 4 and 1 <= maxv <= 4):
                raise MediaFormatError(
                    "JPEG sampling factors out of range"
                )
            for _cid, hi, vi, _tq in comps:
                if maxv % vi or maxh % hi:
                    raise NotImplementedError(
                        f"non-integral JPEG subsampling ratio "
                        f"{maxh}x{maxv} / {hi}x{vi}"
                    )
            mcus_x = -(-pw // (8 * maxh))
            mcus_y = -(-ph // (8 * maxv))
            prog = []
            for _cid, hi, vi, tq in comps:
                bw, bh = mcus_x * hi, mcus_y * vi
                prog.append((hi, vi, tq, bw, bh, [0] * (bw * bh * 64)))
            geom = (ph, pw, comps, maxh, maxv, mcus_x, mcus_y)
            frame = (ph, pw, comps)
            progressive = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError(
                "JPEG lossless/differential (SOF"
                f"{marker - 0xC0}) not supported"
            )
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("JPEG arithmetic coding")
        elif marker == 0xDA:  # SOS
            if not seg:
                raise MediaFormatError("JPEG SOS header truncated")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise MediaFormatError("JPEG SOS header truncated")
            scomps = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                scomps.append((cs, tdta >> 4, tdta & 15))
            pos += seglen
            if not progressive:
                scan = scomps
                break
            if len(seg) < 4 + 2 * ns:
                raise MediaFormatError("SOS header truncated")
            ss_, se_, ahal = (
                seg[1 + 2 * ns],
                seg[2 + 2 * ns],
                seg[3 + 2 * ns],
            )
            pos = _decode_progressive_scan(
                data, pos, geom, prog, hufftabs, restart_interval,
                scomps, ss_, se_, ahal >> 4, ahal & 15,
            )
            n_scans += 1
            continue
        pos += seglen
    if progressive:
        if n_scans == 0:
            raise MediaFormatError("JPEG missing SOS")
        h, w, comps = frame
        metas = []
        carrs = []
        for hi, vi, tq, bw, bh, lst in prog:
            if tq not in qtables:
                raise MediaFormatError(
                    f"JPEG references undefined DQT id {tq}"
                )
            zz = np.array(lst, dtype=np.int32).reshape(bh * bw, 64)
            nat = np.zeros_like(zz)
            nat[:, _ZIG_TO_NAT] = zz
            carrs.append(nat.reshape(bh, bw, 8, 8))
            metas.append((hi, vi, qtables[tq]))
        return _reconstruct_planes(
            metas, carrs, geom[3], geom[4], h, w
        )
    if frame is None or scan is None:
        raise MediaFormatError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise MediaFormatError("JPEG zero dimension (DNL unsupported)")
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"JPEG {len(comps)}-component")
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    if not (1 <= maxh <= 4 and 1 <= maxv <= 4):
        raise MediaFormatError("JPEG sampling factors out of range")

    # per-component block grids (interleaved-MCU geometry, A.2.3);
    # entropy decode fills INTEGER coefficient arrays and the IDCT
    # runs ONCE per component as a batched einsum over every block —
    # the per-block matmul would dominate at real image sizes
    mcus_x = -(-w // (8 * maxh))
    mcus_y = -(-h // (8 * maxv))
    scan_by_cid = {s[0]: s for s in scan}
    comp_meta = []
    for cid, hi, vi, tq in comps:
        if cid not in scan_by_cid:
            raise MediaFormatError(f"component {cid} missing from SOS")
        _, td, ta = scan_by_cid[cid]
        if tq not in qtables:
            raise MediaFormatError(
                f"JPEG references undefined DQT id {tq}"
            )
        comp_meta.append((hi, vi, qtables[tq], td, ta))
        for cls, tid in ((0, td), (1, ta)):
            if (cls, tid) not in hufftabs:
                raise MediaFormatError(
                    f"JPEG references undefined DHT "
                    f"class={cls} id={tid}"
                )
        if maxv % vi or maxh % hi:
            raise NotImplementedError(
                f"non-integral JPEG subsampling ratio "
                f"{maxh}x{maxv} / {hi}x{vi}"
            )

    segs, rst_marks, _end = _split_entropy(data, pos)
    zn = _ZIG_TO_NAT.tolist()
    # flat per-component coefficient lists in DECODE order (MCU
    # raster, then the component's vi×hi blocks) — each block is a
    # sequential 64-slot span, so the hot loop only increments a
    # counter; one numpy transpose converts to grid order afterwards
    coef_lists = [
        [0] * (mcus_y * vi * mcus_x * hi * 64)
        for hi, vi, _q, _td, _ta in comp_meta
    ]
    counters = [[0] for _ in comp_meta]
    order = []
    for ci, (hi, vi, _q, td, ta) in enumerate(comp_meta):
        for _ in range(vi * hi):
            order.append(
                (ci, hufftabs[(0, td)], hufftabs[(1, ta)], counters[ci])
            )
    total_mcus = mcus_x * mcus_y
    preds = [0] * len(comps)
    if restart_interval:
        n_segs = -(-total_mcus // restart_interval)
        if len(segs) < n_segs:
            raise MediaFormatError(
                f"missing restart segments: have {len(segs)}, "
                f"need {n_segs}"
            )
        done = 0
        for si in range(n_segs):
            if si:
                if rst_marks[si - 1] != 0xD0 + ((si - 1) % 8):
                    raise MediaFormatError(
                        f"RST marker out of sequence before "
                        f"segment {si}"
                    )
                preds = [0] * len(comps)
            cnt = min(restart_interval, total_mcus - done)
            _decode_scan_segment(
                segs[si], order, cnt, preds, coef_lists, zn
            )
            done += cnt
    else:
        _decode_scan_segment(
            segs[0], order, total_mcus, preds, coef_lists, zn
        )

    carrs = []
    for (hi, vi, _q, _td, _ta), lst in zip(comp_meta, coef_lists):
        bh, bw = mcus_y * vi, mcus_x * hi
        carrs.append(
            np.array(lst, dtype=np.int32)
            .reshape(mcus_y, mcus_x, vi, hi, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bh, bw, 8, 8)
        )
    metas = [(hi, vi, q) for hi, vi, q, _td, _ta in comp_meta]
    return _reconstruct_planes(metas, carrs, maxh, maxv, h, w)


def _reconstruct_planes(
    metas: list,
    carrs: list,
    maxh: int,
    maxv: int,
    h: int,
    w: int,
) -> np.ndarray:
    """Shared dequantize → batched-einsum IDCT → upsample → color
    tail: ``metas`` is per-component ``(hi, vi, qtable)``, ``carrs``
    the matching ``(bh, bw, 8, 8)`` natural-order coefficient
    grids."""
    out_planes = []
    for (hi, vi, q), carr in zip(metas, carrs):
        freq = carr.astype(np.float64) * q
        px = np.einsum("um,bcuv,vn->bcmn", _A, freq, _A)
        bh, bw = carr.shape[:2]
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        up = np.repeat(
            np.repeat(plane, maxv // vi, axis=0), maxh // hi, axis=1
        )
        out_planes.append(up[:h, :w] + 128.0)
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "buf", "n")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _gen_huffman_table(
    freq_in: dict[int, int]
) -> tuple[list[int], list[int]]:
    """Optimal Huffman code lengths from symbol frequencies — T.81
    Annex K.2's merging procedure with the 16-bit length-limit
    adjustment.  Symbol 256 is the reserved pseudo-symbol (freq 1)
    that guarantees no real code is all 1-bits.  Needed because
    progressive AC scans emit EOBn symbols (r<<4, r<15) that the
    fixed Annex K tables don't contain — progressive encoders build
    per-scan tables (libjpeg does the same)."""
    freq = [0] * 257
    for s, c in freq_in.items():
        freq[s] = c
    freq[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        # v1 = least-frequency symbol (ties → larger value), v2 = next
        c1 = c2 = None
        v1 = v2 = -1
        for i in range(257):
            f = freq[i]
            if f > 0 and (c1 is None or f <= c1):
                c1 = f
                v1 = i
        for i in range(257):
            f = freq[i]
            if f > 0 and i != v1 and (c2 is None or f <= c2):
                c2 = f
                v2 = i
        if c2 is None:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # length-limit: move pairs of leaves up until nothing exceeds 16
    for ln in range(32, 16, -1):
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    for ln in range(16, 0, -1):  # drop the pseudo-symbol's (longest) code
        if bits[ln] > 0:
            bits[ln] -= 1
            break
    pairs = sorted((codesize[i], i) for i in range(256) if codesize[i])
    return bits[1:17], [i for _cs, i in pairs]


class _SymCounter:
    """Pass-1 emitter: per-slot Huffman symbol frequencies only."""

    __slots__ = ("freqs",)

    def __init__(self, nslots: int):
        self.freqs: list[dict] = [{} for _ in range(nslots)]

    def sym(self, slot: int, s: int) -> None:
        f = self.freqs[slot]
        f[s] = f.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass

    def restart(self, i: int) -> None:
        pass


class _SymWriter:
    """Pass-2 emitter: real bitstream through per-slot encode tables."""

    __slots__ = ("wtr", "enc")

    def __init__(self, wtr: "_BitWriter", enc_tables: list):
        self.wtr = wtr
        self.enc = enc_tables

    def sym(self, slot: int, s: int) -> None:
        code, ln = self.enc[slot][s]
        self.wtr.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        self.wtr.write(v, n)

    def restart(self, i: int) -> None:
        self.wtr.flush()
        self.wtr.out += bytes([0xFF, 0xD0 + i])


def _run_prog_scan(
    seq: list,
    kind: str,
    ss: int,
    se: int,
    al: int,
    ri: int,
    bpm: int,
    emit,
) -> None:
    """Drive one progressive scan over ``seq`` (``(slot, zigzag64)``
    per block, MCU order) through an emitter, implementing the four
    G.1.2 encoding procedures with EOB-run accumulation, buffered
    correction bits, and restart-interval flushes.  Runs twice per
    scan: once against :class:`_SymCounter`, once against
    :class:`_SymWriter` — identical control flow, so the optimal
    tables always match the emitted symbol stream."""
    nslots = 1 + max((s for s, _z in seq), default=0)
    preds = [0] * nslots
    eobrun = 0
    br: list[int] = []  # correction bits since the last emitted symbol
    be: list[int] = []  # correction bits attached to the pending EOB run

    def flush_eobrun() -> None:
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            emit.sym(0, nbits << 4)
            if nbits:
                emit.bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            for b in be:
                emit.bits(b, 1)
            be.clear()

    n_mcus = len(seq) // bpm
    rst = 0
    for mi in range(n_mcus):
        if ri and mi and mi % ri == 0:
            if kind in ("ac_first", "ac_refine"):
                flush_eobrun()
            emit.restart(rst % 8)
            rst += 1
            preds = [0] * nslots
        for slot, zz in seq[mi * bpm : (mi + 1) * bpm]:
            if kind == "dc_first":
                dc = int(zz[0]) >> al  # arithmetic point transform
                diff = dc - preds[slot]
                preds[slot] = dc
                size = abs(diff).bit_length()
                emit.sym(slot, size)
                if size:
                    v = diff if diff >= 0 else diff + (1 << size) - 1
                    emit.bits(v & ((1 << size) - 1), size)
            elif kind == "dc_refine":
                emit.bits((int(zz[0]) >> al) & 1, 1)
            elif kind == "ac_first":
                r = 0
                for k in range(ss, se + 1):
                    raw = int(zz[k])
                    t = (-raw if raw < 0 else raw) >> al
                    if t == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        emit.sym(0, 0xF0)
                        r -= 16
                    nbits = t.bit_length()
                    emit.sym(0, (r << 4) | nbits)
                    v = t if raw >= 0 else -t + (1 << nbits) - 1
                    emit.bits(v & ((1 << nbits) - 1), nbits)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
            else:  # ac_refine (G.1.2.3 with libjpeg's bit buffering)
                absv = [
                    (abs(int(zz[k])) >> al) for k in range(ss, se + 1)
                ]
                eob_idx = -1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob_idx = i  # last NEWLY-nonzero coefficient
                r = 0
                for i, a in enumerate(absv):
                    if a == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob_idx:
                        flush_eobrun()
                        emit.sym(0, 0xF0)
                        r -= 16
                        for b in br:
                            emit.bits(b, 1)
                        br.clear()
                    if a > 1:
                        br.append(a & 1)  # history coef: correction bit
                        continue
                    flush_eobrun()
                    emit.sym(0, (r << 4) | 1)
                    emit.bits(0 if int(zz[ss + i]) < 0 else 1, 1)
                    for b in br:
                        emit.bits(b, 1)
                    br.clear()
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    be.extend(br)
                    br.clear()
                    if eobrun == 0x7FFF or len(be) > 937:
                        flush_eobrun()
    if kind in ("ac_first", "ac_refine"):
        flush_eobrun()


# libjpeg's published default progression (jcparam.c): DC Al=1 for all
# components, chroma AC in one pass, luma AC split 1-5 / 6-63 with two
# successive-approximation refinements, DC refinement last.
_PROG_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((0,), 0, 0, 1, 0),
]
_PROG_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's published quality scaling: 50 → the Annex K table,
    100 → all-1s, 1 → 50× coarser; clamped to [1, 255] for 8-bit
    table precision."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _encode_component_block(
    wtr: _BitWriter,
    coef_zz: np.ndarray,
    pred: int,
    dc_enc: dict,
    ac_enc: dict,
) -> int:
    """Huffman-encode one quantized block (zigzag order); returns the
    new DC predictor."""
    dc = int(coef_zz[0])
    diff = dc - pred
    size = int(diff).bit_length() if diff != 0 else 0
    code, ln = dc_enc[size]
    wtr.write(code, ln)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        wtr.write(v & ((1 << size) - 1), size)
    # AC: run-length of zeros + size, ZRL for 16 zeros, EOB at end
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k] != 0:
            last_nz = k
            break
    run = 0
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | size]
        wtr.write(code, ln)
        vv = v if v > 0 else v + (1 << size) - 1
        wtr.write(vv & ((1 << size) - 1), size)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        wtr.write(code, ln)
    return dc


def _plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64, H and W multiples of 8 → (H//8, W//8, 8, 8)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(bh, 8, bw, 8).swapaxes(1, 2)


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 85,
    quant: np.ndarray | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode ``(H, W) uint8`` grayscale or ``(H, W, 3) uint8`` RGB as
    a baseline JFIF JPEG.  ``quant`` (an 8×8 int table used for every
    component) overrides the quality-scaled Annex K tables — pass a
    table with ``quant[0, 0] == 8`` to make constant 8×8 blocks
    round-trip exactly (the q41 oracle contract).  ``subsample=True``
    emits 4:2:0 (2×2 box-mean chroma); ``restart_interval`` emits DRI
    + RSTn markers every that many MCUs.  ``progressive=True`` emits
    SOF2 with libjpeg's default scan script (spectral selection +
    successive approximation) and per-scan optimal Huffman tables —
    the SAME quantized coefficients as the baseline form, so both
    encodings decode to identical pixels."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_jpeg wants (H,W) or (H,W,3) uint8")
    if arr.ndim == 3 and arr.shape[2] != 3:
        raise ValueError("encode_jpeg wants 3 channels for color")
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("encode_jpeg dimensions out of range")
    gray = arr.ndim == 2

    if quant is not None:
        qt = np.asarray(quant, dtype=np.int64).reshape(8, 8)
        if np.any(qt < 1) or np.any(qt > 255):
            raise ValueError("quant entries must be in [1, 255]")
        qluma = qchroma = qt
        two_tables = False
    else:
        qluma = _scaled_quant(_K1_LUMA, quality)
        qchroma = _scaled_quant(_K2_CHROMA, quality)
        two_tables = not gray

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        rf = arr[..., 0].astype(np.float64)
        gf = arr[..., 1].astype(np.float64)
        bf = arr[..., 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
        cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
        if subsample:
            # 2×2 box mean on an edge-padded even grid
            he, we = (h + 1) & ~1, (w + 1) & ~1
            cbp = _pad_to(cb, he, we)
            crp = _pad_to(cr, he, we)
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    maxh = max(s[0] for s in samp)
    maxv = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * maxh))
    mcus_y = -(-h // (8 * maxv))

    # FDCT + quantize each component's padded block grid up front
    comp_coefs = []
    for (hi, vi), plane in zip(samp, planes):
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        blocks = _plane_to_blocks(_pad_to(plane, ph, pw))
        freq = np.einsum("ux,byxw,wv->byuv", _A, blocks, _A.T)
        q = qluma if len(comp_coefs) == 0 else qchroma
        comp_coefs.append(np.rint(freq / q).astype(np.int64))

    if progressive:
        return _assemble_progressive(
            comp_coefs, samp, h, w, gray, qluma, qchroma, two_tables,
            restart_interval, maxh, maxv, mcus_x, mcus_y,
        )

    dc_specs = [_DC_LUMA_SPEC] + (
        [] if gray else [_DC_CHROMA_SPEC, _DC_CHROMA_SPEC]
    )
    ac_specs = [_AC_LUMA_SPEC] + (
        [] if gray else [_AC_CHROMA_SPEC, _AC_CHROMA_SPEC]
    )
    dc_enc = [_build_encode_table(*_DC_LUMA_SPEC)]
    ac_enc = [_build_encode_table(*_AC_LUMA_SPEC)]
    if not gray:
        dc_enc.append(_build_encode_table(*_DC_CHROMA_SPEC))
        ac_enc.append(_build_encode_table(*_AC_CHROMA_SPEC))
        dc_enc.append(dc_enc[1])
        ac_enc.append(ac_enc[1])

    wtr = _BitWriter()
    preds = [0] * len(planes)
    mcu_idx = 0
    rst_idx = 0
    zz_rows = _ZIG_TO_NAT // 8
    zz_cols = _ZIG_TO_NAT % 8
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and (
                mcu_idx % restart_interval == 0
            ):
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (rst_idx % 8)])
                rst_idx += 1
                preds = [0] * len(planes)
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        blk = comp_coefs[ci][
                            my * vi + by, mx * hi + bx
                        ]
                        preds[ci] = _encode_component_block(
                            wtr,
                            blk[zz_rows, zz_cols],
                            preds[ci],
                            dc_enc[ci],
                            ac_enc[ci],
                        )
            mcu_idx += 1
    wtr.flush()

    # --- assemble the stream -------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def dqt_body(tid: int, table: np.ndarray) -> bytes:
        zz = table.reshape(64)[_ZIG_TO_NAT]
        return bytes([tid]) + bytes(int(v) for v in zz)

    if two_tables:
        out += seg(0xDB, dqt_body(0, qluma) + dqt_body(1, qchroma))
    else:
        out += seg(0xDB, dqt_body(0, qluma))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        tq = 0 if (ci == 0 or not two_tables) else 1
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    out += seg(0xC0, sof)

    def dht_body(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    dht = dht_body(0, 0, dc_specs[0]) + dht_body(1, 0, ac_specs[0])
    if not gray:
        dht += dht_body(0, 1, _DC_CHROMA_SPEC)
        dht += dht_body(1, 1, _AC_CHROMA_SPEC)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td = ta = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _assemble_progressive(
    comp_coefs: list,
    samp: list,
    h: int,
    w: int,
    gray: bool,
    qluma: np.ndarray,
    qchroma: np.ndarray,
    two_tables: bool,
    restart_interval: int,
    maxh: int,
    maxv: int,
    mcus_x: int,
    mcus_y: int,
) -> bytes:
    """Assemble a progressive (SOF2) stream from already-quantized
    coefficient grids: headers, then per scan a counting pass →
    optimal DHT → real pass (two identical _run_prog_scan drives).
    DC scans use table ids 0 (luma) / 1 (chroma, shared); AC scans
    are single-component and always redefine table id 0."""

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(body) + 2)
            + body
        )

    ncomp = 1 if gray else 3
    zz_rows = _ZIG_TO_NAT // 8
    zz_cols = _ZIG_TO_NAT % 8
    zz_all = [comp_coefs[ci][:, :, zz_rows, zz_cols] for ci in range(ncomp)]

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def dqt_body(tid: int, table: np.ndarray) -> bytes:
        zzq = table.reshape(64)[_ZIG_TO_NAT]
        return bytes([tid]) + bytes(int(v) for v in zzq)

    if two_tables:
        out += seg(0xDB, dqt_body(0, qluma) + dqt_body(1, qchroma))
    else:
        out += seg(0xDB, dqt_body(0, qluma))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        tq = 0 if (ci == 0 or not two_tables) else 1
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    script = _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR
    for comp_ids, ss, se, ah, al in script:
        # block sequence in MCU order: interleaved iff ns > 1
        if len(comp_ids) > 1:
            seq = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for slot, ci in enumerate(comp_ids):
                        hi, vi = samp[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                seq.append(
                                    (
                                        slot,
                                        zz_all[ci][
                                            my * vi + by, mx * hi + bx
                                        ],
                                    )
                                )
            bpm = sum(samp[ci][0] * samp[ci][1] for ci in comp_ids)
        else:
            ci = comp_ids[0]
            hi, vi = samp[ci]
            comp_w = -(-(w * hi) // maxh)
            comp_h = -(-(h * vi) // maxv)
            nbw = -(-comp_w // 8)
            nbh = -(-comp_h // 8)
            seq = [
                (0, zz_all[ci][by, bx])
                for by in range(nbh)
                for bx in range(nbw)
            ]
            bpm = 1
        if ss == 0:
            kind = "dc_first" if ah == 0 else "dc_refine"
        else:
            kind = "ac_first" if ah == 0 else "ac_refine"
        nslots = len(comp_ids)
        if kind == "dc_refine":
            enc_tables: list = [None] * nslots
        else:
            cnt = _SymCounter(nslots)
            _run_prog_scan(
                seq, kind, ss, se, al, restart_interval, bpm, cnt
            )
            if ss == 0:
                tbl_of_slot = [
                    0 if comp_ids[s] == 0 else 1 for s in range(nslots)
                ]
                tclass = 0
            else:
                tbl_of_slot = [0]
                tclass = 1
            merged: dict[int, dict] = {}
            for s, f in enumerate(cnt.freqs):
                m = merged.setdefault(tbl_of_slot[s], {})
                for sym, c in f.items():
                    m[sym] = m.get(sym, 0) + c
            dht_all = b""
            enc_by_tid = {}
            for tid, f in sorted(merged.items()):
                bits_, vals_ = _gen_huffman_table(f)
                enc_by_tid[tid] = _build_encode_table(bits_, vals_)
                dht_all += (
                    bytes([(tclass << 4) | tid])
                    + bytes(bits_)
                    + bytes(vals_)
                )
            out += seg(0xC4, dht_all)
            enc_tables = [enc_by_tid[tbl_of_slot[s]] for s in range(nslots)]
        sos = bytes([nslots])
        for slot, ci in enumerate(comp_ids):
            td = (0 if ci == 0 else 1) if ss == 0 else 0
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        wtr = _BitWriter()
        _run_prog_scan(
            seq, kind, ss, se, al, restart_interval, bpm,
            _SymWriter(wtr, enc_tables),
        )
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
