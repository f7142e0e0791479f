"""CCITT bilevel fax codecs (ITU-T T.4 / T.6) — TIFF compressions
2 (Modified Huffman 1D), 3 (Group 3), and 4 (Group 4).

G4 (MMR, two-dimensional READ without EOLs) is the compression of the
scanned-document corpus: legal archives, patents, and book scans ship
as G4 TIFFs almost exclusively; MH and G3 cover the older fax-born
files.  Everything here is implemented from the public ITU-T T.4/T.6
recommendations:

- **Vertical modes** V0/VR1-3/VL1-3 code a run boundary relative to
  the reference (previous) line's changing elements, **pass mode**
  skips a reference run pair, **horizontal mode** falls back to two
  one-dimensional T.4 run-length codes (terminating 0-63 + makeup
  64-2560, separate white/black tables).
- Rows decode against the previous row's transition list; the stream
  ends at EOFB (two EOL+1 codewords) or when ``height`` rows are
  done.
- The encoder emits the standard mode-selection rule (pass when
  ``b2 < a1``, vertical when ``|a1-b1| <= 3``, else horizontal) —
  fixtures are REAL G4 streams, and the decoder is additionally
  pinned on hand-assembled mode sequences computed on paper.
- G3 (:func:`decode_g3`) reuses the same 1D/2D row machinery behind
  per-row EOLs with tag bits (T4Options bit 0) and the K-factor
  1D-resync convention in the encoder; MH (:func:`decode_mh`) is the
  TIFF-compression-2 form: independent byte-aligned 1D rows.

Table provenance: the T.4 code tables are transcribed from the
published recommendation; construction is machine-checked at import
(prefix-freeness across each table family + the mode codes, exact
code counts, length bounds) and the decoder/encoder pair is pinned by
roundtrips over structured and random bilevel rasters plus hand-built
vectors for every mode (tests/test_faxcodec.py).

Extension codes (0000001xxx, uncompressed mode) raise
``NotImplementedError`` honestly; malformed streams raise
:class:`~.mediacodec.MediaFormatError`.
"""

from __future__ import annotations

import bisect

import numpy as np

from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
)

__all__ = ["decode_g4", "encode_g4"]

# --- T.4 one-dimensional run-length code tables -----------------------------
# (code-string, run-length); terminating codes 0..63 then makeups.

_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000",
    4: "1011", 5: "1100", 6: "1110", 7: "1111",
    8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101",
    16: "101010", 17: "101011", 18: "0100111", 19: "0001100",
    20: "0001000", 21: "0010111", 22: "0000011", 23: "0000100",
    24: "0101000", 25: "0101011", 26: "0010011", 27: "0100100",
    28: "0011000", 29: "00000010", 30: "00000011", 31: "00011010",
    32: "00011011", 33: "00010010", 34: "00010011", 35: "00010100",
    36: "00010101", 37: "00010110", 38: "00010111", 39: "00101000",
    40: "00101001", 41: "00101010", 42: "00101011", 43: "00101100",
    44: "00101101", 45: "00000100", 46: "00000101", 47: "00001010",
    48: "00001011", 49: "01010010", 50: "01010011", 51: "01010100",
    52: "01010101", 53: "00100100", 54: "00100101", 55: "01011000",
    56: "01011001", 57: "01011010", 58: "01011011", 59: "01001010",
    60: "01001011", 61: "00110010", 62: "00110011", 63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10",
    4: "011", 5: "0011", 6: "0010", 7: "00011",
    8: "000101", 9: "000100", 10: "0000100", 11: "0000101",
    12: "0000111", 13: "00000100", 14: "00000111", 15: "000011000",
    16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}
# extended makeups 1792..2560 are SHARED between colors (T.4 table 3)
_EXT_CODES = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_MODE_CODES = {
    "1": ("V", 0),
    "011": ("V", 1),
    "010": ("V", -1),
    "001": ("H", None),
    "0001": ("P", None),
    "000011": ("V", 2),
    "000010": ("V", -2),
    "0000011": ("V", 3),
    "0000010": ("V", -3),
}
_EOFB = "000000000001" * 2


def _build_decode(tables: list[dict]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in tables:
        for run, code in t.items():
            if code in out:
                raise AssertionError(f"duplicate T.4 code {code}")
            out[code] = run
    return out


def _check_prefix_free(codes: list[str]) -> None:
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        if b.startswith(a):
            raise AssertionError(f"T.4 code {a} prefixes {b}")


_WHITE_DEC = _build_decode([_WHITE_CODES, _EXT_CODES])
_BLACK_DEC = _build_decode([_BLACK_CODES, _EXT_CODES])
# import-time structural checks: counts, prefix-freeness (incl. the
# mode codes against the EOL prefix), length bounds
assert len(_WHITE_CODES) == 91 and len(_BLACK_CODES) == 91
assert len(_EXT_CODES) == 13
_check_prefix_free(list(_WHITE_DEC))
_check_prefix_free(list(_BLACK_DEC))
_check_prefix_free(list(_MODE_CODES) + ["0000001", "000000000001"])
assert all(1 <= len(c) <= 13 for c in list(_WHITE_DEC) + list(_BLACK_DEC))


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("d", "n", "p")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data) * 8
        self.p = 0

    def peek_is(self, code: str) -> bool:
        if self.p + len(code) > self.n:
            return False
        for i, c in enumerate(code):
            bit = (self.d[(self.p + i) >> 3] >> (7 - ((self.p + i) & 7))) & 1
            if bit != (c == "1"):
                return False
        return True

    def take(self, code: str) -> None:
        self.p += len(code)

    def read_bit(self) -> int:
        if self.p >= self.n:
            raise MediaFormatError("G4 stream truncated")
        b = (self.d[self.p >> 3] >> (7 - (self.p & 7))) & 1
        self.p += 1
        return b


def _read_runlen(bits: _Bits, dec: dict[str, int]) -> int:
    """One T.4 run length: makeup codes (≥64) accumulate until a
    terminating code (<64) ends the run."""
    total = 0
    while True:
        code = ""
        for _ in range(14):
            code += "1" if bits.read_bit() else "0"
            if code in dec:
                break
        else:
            raise MediaFormatError(f"G4 bad run code {code}")
        run = dec[code]
        total += run
        if run < 64:
            return total


def _decode_2d_row(bits: "_Bits", ref: list[int], width: int) -> list[int]:
    """One 2D-coded row (shared by T.6 G4 and T.4 G3 2D rows):
    returns the row's transition list."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 = white, 1 = black
    while a0 < width:
        code = ""
        mode = None
        for _ in range(7):
            code += "1" if bits.read_bit() else "0"
            if code in _MODE_CODES:
                mode = _MODE_CODES[code]
                break
        if mode is None:
            if code == "0000001":
                raise NotImplementedError(
                    "G4 extension/uncompressed mode"
                )
            raise MediaFormatError(f"G4 bad mode code {code}")
        # b1: first reference transition > a0 changing to !color;
        # transitions alternate starting white->black, so the parity
        # of the index IS the changes-to color
        want = 1 - color
        i = bisect.bisect_right(ref, a0 if a0 >= 0 else -1)
        while i < len(ref) and (ref[i] % 2 == 0) != (want == 1):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        kind, arg = mode
        if kind == "P":
            a0 = b2  # run of `color` extends through b2
            continue
        if kind == "V":
            a1 = b1 + arg
            if a1 < 0 or a1 > width or (a0 >= 0 and a1 <= a0):
                raise MediaFormatError(
                    f"G4 vertical mode lands at {a1} (a0={a0})"
                )
            cur.append(a1)
            a0 = a1
            color ^= 1
            continue
        # horizontal: two 1D runs, color then opposite
        start = a0 if a0 > 0 else 0
        r1 = _read_runlen(bits, _BLACK_DEC if color else _WHITE_DEC)
        r2 = _read_runlen(bits, _WHITE_DEC if color else _BLACK_DEC)
        t1 = start + r1
        t2 = t1 + r2
        if t2 > width or t1 > width:
            raise MediaFormatError("G4 horizontal run past width")
        cur.append(t1)
        cur.append(t2)
        a0 = t2
    if cur and cur[-1] > width:
        raise MediaFormatError("G4 row overruns width")
    return cur


def _decode_1d_row(bits: "_Bits", width: int) -> list[int]:
    """One T.4 one-dimensional (Modified Huffman) row: alternating
    white/black run codes summing to exactly ``width``."""
    cur: list[int] = []
    pos = 0
    color = 0
    while pos < width:
        run = _read_runlen(bits, _BLACK_DEC if color else _WHITE_DEC)
        pos += run
        if pos > width:
            raise MediaFormatError("T.4 1D run past width")
        cur.append(pos)
        color ^= 1
    # a trailing zero-length final run is legal; drop width-markers
    return [t for t in cur if t < width] + (
        [t for t in cur if t == width][:1]
    )


def _paint_row(out: np.ndarray, y: int, cur: list[int], width: int) -> None:
    row = out[y]
    prev = 0
    c = False
    for t in cur:
        if c:
            row[prev:t] = True
        prev = t
        c = not c
    if c and prev < width:
        row[prev:width] = True


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode a T.6 (Group 4) stream to ``(height, width) bool``
    (True = black).  Rows code against the previous row's transition
    list; an EOFB before ``height`` rows is a short stream (loud)."""
    if width <= 0 or height <= 0:
        raise MediaFormatError(f"bad G4 dimensions {width}x{height}")
    bits = _Bits(data)
    out = np.zeros((height, width), dtype=bool)
    # reference transitions for the imaginary all-white line above row 0
    ref: list[int] = []
    for y in range(height):
        if bits.peek_is(_EOFB):
            raise MediaFormatError(
                f"G4 EOFB after {y} of {height} rows"
            )
        cur = _decode_2d_row(bits, ref, width)
        _paint_row(out, y, cur, width)
        # reference line for the next row: changing elements strictly
        # inside the line (a valid stream's transitions are monotone;
        # a trailing width-width pair from a zero-length closing run
        # drops out here, preserving index-parity = changes-to color)
        ref = [t for t in cur if t < width]
    return out


_EOL = "000000000001"


def decode_mh(data: bytes, width: int, height: int) -> np.ndarray:
    """TIFF compression 2 — CCITT one-dimensional Modified Huffman:
    independent 1D rows, each starting on a BYTE boundary (the TIFF 6
    convention), no EOL codes."""
    if width <= 0 or height <= 0:
        raise MediaFormatError(f"bad MH dimensions {width}x{height}")
    bits = _Bits(data)
    out = np.zeros((height, width), dtype=bool)
    for y in range(height):
        if bits.p % 8:
            bits.p += 8 - (bits.p % 8)
        cur = _decode_1d_row(bits, width)
        _paint_row(out, y, cur, width)
    return out


def decode_g3(
    data: bytes,
    width: int,
    height: int,
    *,
    two_d: bool = False,
) -> np.ndarray:
    """TIFF compression 3 — CCITT T.4 Group 3: each row is preceded
    by an EOL (fill zeros tolerated before it); in 2D mode
    (T4Options bit 0) a tag bit after the EOL selects a 1D or 2D
    row, the latter coded against the previous row with the same
    machinery as G4."""
    if width <= 0 or height <= 0:
        raise MediaFormatError(f"bad G3 dimensions {width}x{height}")
    bits = _Bits(data)
    out = np.zeros((height, width), dtype=bool)
    ref: list[int] = []
    for y in range(height):
        # fill bits (zeros) then EOL
        zeros = 0
        while True:
            if bits.p >= bits.n:
                raise MediaFormatError(
                    f"G3 stream ends after {y} of {height} rows"
                )
            b = bits.read_bit()
            if b:
                break
            zeros += 1
        if zeros < 11:
            raise MediaFormatError(
                f"G3 row {y}: expected EOL, saw {zeros} zeros"
            )
        if two_d:
            tag = bits.read_bit()
            cur = (
                _decode_1d_row(bits, width)
                if tag
                else _decode_2d_row(bits, ref, width)
            )
        else:
            cur = _decode_1d_row(bits, width)
        _paint_row(out, y, cur, width)
        ref = [t for t in cur if t < width]
    return out


def _changes(row: np.ndarray) -> list[int]:
    """Transition columns of a bool row (color changes, starting from
    white)."""
    d = np.nonzero(np.diff(row.astype(np.int8)))[0] + 1
    out = list(int(x) for x in d)
    if row[0]:
        out.insert(0, 0)
    return out


def _encode_runlen(run: int, color: int, parts: list[str]) -> None:
    codes = _BLACK_CODES if color else _WHITE_CODES
    while run >= 2624:  # largest expressible single makeup is 2560
        parts.append(_EXT_CODES[2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        if makeup > 1728:
            parts.append(_EXT_CODES[makeup])
        else:
            parts.append(codes[makeup])
        run -= makeup
    parts.append(codes[run])


def _encode_2d_row(
    cur: list[int], ref: list[int], w: int, parts: list[str]
) -> None:
    """Emit one 2D-coded row (shared by G4 and G3-2D rows)."""
    a0 = -1
    color = 0
    while a0 < w:
        # a1: next transition after a0 in the current row
        j = bisect.bisect_right(cur, a0 if a0 >= 0 else -1)
        a1 = cur[j] if j < len(cur) else w
        want = 1 - color
        i = bisect.bisect_right(ref, a0 if a0 >= 0 else -1)
        while i < len(ref) and (ref[i] % 2 == 0) != (want == 1):
            i += 1
        b1 = ref[i] if i < len(ref) else w
        b2 = ref[i + 1] if i + 1 < len(ref) else w
        if b2 < a1:
            parts.append("0001")  # pass
            a0 = b2
            continue
        if abs(a1 - b1) <= 3:
            parts.append(
                {
                    0: "1",
                    1: "011",
                    2: "000011",
                    3: "0000011",
                    -1: "010",
                    -2: "000010",
                    -3: "0000010",
                }[a1 - b1]
            )
            a0 = a1
            color ^= 1
            continue
        # horizontal: two runs from max(a0, 0)
        a2 = cur[j + 1] if j + 1 < len(cur) else w
        start = a0 if a0 > 0 else 0
        parts.append("001")
        _encode_runlen(a1 - start, color, parts)
        _encode_runlen(a2 - a1, 1 - color, parts)
        a0 = a2


def _encode_1d_row(cur: list[int], w: int, parts: list[str]) -> None:
    """Emit one T.4 1D row: alternating white/black runs to width."""
    pos = 0
    color = 0
    bounds = [t for t in cur if t < w] + [w]
    for t in bounds:
        _encode_runlen(t - pos, color, parts)
        pos = t
        color ^= 1


def _pack_bits(s: str, pad_bit: str = "1") -> bytes:
    pad = (-len(s)) % 8
    s += pad_bit * pad
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _as_bilevel(img: np.ndarray, who: str) -> np.ndarray:
    a = np.asarray(img, dtype=bool)
    if a.ndim != 2 or a.size == 0:
        raise MediaFormatError(f"{who} wants a non-empty (H, W) bool")
    return a


def encode_g4(img: np.ndarray) -> bytes:
    """Encode ``(H, W) bool`` (True = black) as a T.6 stream with the
    standard mode-selection rule, ending in EOFB, 1-padded to a byte
    boundary."""
    a = _as_bilevel(img, "encode_g4")
    h, w = a.shape
    parts: list[str] = []
    ref: list[int] = []
    for y in range(h):
        cur = _changes(a[y])
        _encode_2d_row(cur, ref, w, parts)
        ref = cur
    parts.append(_EOFB)
    return _pack_bits("".join(parts))


def encode_mh(img: np.ndarray) -> bytes:
    """TIFF compression 2 form: independent 1D rows, each starting on
    a byte boundary (zero-filled)."""
    a = _as_bilevel(img, "encode_mh")
    h, w = a.shape
    s = ""
    for y in range(h):
        parts: list[str] = []
        _encode_1d_row(_changes(a[y]), w, parts)
        s += "".join(parts)
        s += "0" * ((-len(s)) % 8)
    return _pack_bits(s, pad_bit="0")


def encode_g3(img: np.ndarray, *, two_d: bool = False, k: int = 2) -> bytes:
    """TIFF compression 3 form: EOL before every row; in 2D mode each
    EOL carries a tag bit and every ``k``-th row is coded 1D (the
    T.4 K-factor error-confinement convention), the others 2D against
    the previous row."""
    a = _as_bilevel(img, "encode_g3")
    h, w = a.shape
    parts: list[str] = []
    ref: list[int] = []
    for y in range(h):
        parts.append(_EOL)
        cur = _changes(a[y])
        if two_d:
            one_d = y % max(k, 1) == 0
            parts.append("1" if one_d else "0")
            if one_d:
                _encode_1d_row(cur, w, parts)
            else:
                _encode_2d_row(cur, ref, w, parts)
        else:
            _encode_1d_row(cur, w, parts)
        ref = cur
    return _pack_bits("".join(parts), pad_bit="0")
