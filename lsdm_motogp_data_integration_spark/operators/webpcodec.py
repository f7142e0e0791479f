"""WebP-lossless (VP8L) codec — pixel decode for the web's #3 image
format's lossless form, plus a restricted-subset encoder for fixture
construction and PNG→WebP re-encoding.

Implemented from the public WebP Lossless Bitstream Specification
(RFC 9649 §3, also published as the libwebp
``webp-lossless-bitstream-spec``), the same from-scratch discipline as
``jpegcodec``/``faxcodec``/``pdfcodec``:

- **Bit order**: LSB-first within bytes (DEFLATE-style); prefix codes
  are canonical (RFC 1951 assignment — codes ascend in (length,
  symbol) order) and are read one bit at a time MSB-of-code-first.
- **Decoder** (:func:`decode_vp8l` / :func:`decode_webp`): the full
  entropy layer — simple (1/2-symbol) and normal prefix-code
  descriptions (code-length codes over the 19-symbol DEFLATE-like
  alphabet with 16/17/18 repeats and the max_symbol cutoff), color
  cache, meta prefix-code grouping via an entropy sub-image, LZ77
  backward references with the 120-entry 2D distance map — and all
  four transforms (predictor ×14 modes, cross-channel color
  transform, subtract-green, color-indexing incl. sub-byte pixel
  bundling), applied in reverse order.
- **Encoder** (:func:`encode_webp_lossless`): a valid literals-only
  subset — optimal canonical prefix codes per channel (simple path
  for ≤2-symbol channels, the normal code-length path with the
  max_symbol cutoff otherwise, Kraft-exact depth limiting), optional
  subtract-green transform, no LZ77/cache/meta (an any-decoder-valid
  stream; this engine's own decoder replays it bit-exactly, and the
  hand-built test vectors pin the decoder paths the encoder does not
  emit).

Lossy VP8 keyframes decode since r9 via ``vp8codec`` (RFC 6386 is
bit-exact INTEGER, not float-DCT as r7/r8 assumed — VERDICT r8
corrected the boundary); ``decode_webp`` dispatches the ``VP8 ``
chunk there.  The remaining honest gate on the lossy side is the
ALPH separate-alpha-plane combination.

100 TB shape: per-blob work inside the same Arrow ``mapInPandas``
passes as the other codecs (``multimodal.media_stats`` /
``image_dhash``); nothing here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

from lsdm_motogp_data_integration_spark.operators.mediacodec import (
    MediaFormatError,
)

# --- bit I/O (LSB-first, DEFLATE convention) ---------------------------------


class _BitReader:
    __slots__ = ("d", "pos", "bit", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.n = len(d)
        self.pos = 0
        self.bit = 0

    def bits(self, k: int) -> int:
        """Read ``k`` bits little-endian (first bit read = LSB)."""
        v = 0
        for i in range(k):
            if self.pos >= self.n:
                raise MediaFormatError("VP8L bitstream truncated")
            v |= ((self.d[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def bit1(self) -> int:
        if self.pos >= self.n:
            raise MediaFormatError("VP8L bitstream truncated")
        v = (self.d[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbit = 0

    def bits(self, v: int, k: int) -> None:
        """Write ``k`` bits of ``v`` little-endian (LSB first)."""
        for i in range(k):
            self.cur |= ((v >> i) & 1) << self.nbit
            self.nbit += 1
            if self.nbit == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbit = 0

    def code(self, c: int, length: int) -> None:
        """Write a prefix code MSB-of-code-first (the read order)."""
        for i in range(length - 1, -1, -1):
            self.bits((c >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbit:
            self.out.append(self.cur)
            self.cur = 0
            self.nbit = 0
        return bytes(self.out)


# --- canonical prefix codes ---------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """RFC 1951 canonical assignment: symbol → (code, length)."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder for one canonical prefix code: read bit by bit,
    MSB-of-code-first.  A single-symbol code is trivial (0 bits)."""

    __slots__ = ("table", "trivial", "max_len")

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise MediaFormatError("VP8L prefix code with no symbols")
        if len(nz) == 1:
            self.trivial = nz[0][0]
            self.table = None
            self.max_len = 0
            return
        # Kraft must be exactly 1 (complete code) for >1 symbol
        max_len = max(ln for _, ln in nz)
        if max_len > 15:
            raise MediaFormatError("VP8L code length > 15")
        kraft = sum(1 << (max_len - ln) for _, ln in nz)
        if kraft != 1 << max_len:
            raise MediaFormatError(
                "VP8L prefix code not complete (bad Kraft sum)"
            )
        self.trivial = None
        self.max_len = max_len
        codes = _canonical_codes(lengths)
        self.table = {
            (ln, code): sym for sym, (code, ln) in codes.items()
        }

    @classmethod
    def explicit(cls, mapping: dict[tuple[int, int], int]):
        """Build from explicit (length, code) → symbol pairs (the
        2-symbol simple form, whose codes follow READ order, not
        canonical symbol order)."""
        o = cls.__new__(cls)
        o.trivial = None
        o.table = dict(mapping)
        o.max_len = max(ln for ln, _ in mapping)
        return o

    def read(self, br: _BitReader) -> int:
        if self.trivial is not None:
            return self.trivial
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bit1()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise MediaFormatError("VP8L invalid prefix code in stream")


#: code-length-code symbol order (RFC 9649 §3.7.2.2 — DEFLATE-like)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

#: 2D LZ77 distance map: plane codes 1..120 → (dx, dy) neighborhood
#: offsets, transcribed from RFC 9649 §3.6.2.3 (ordered by pixel
#: distance); codes > 120 are linear distances minus 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
assert len(_DIST_MAP) == 120


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """One prefix-code description (RFC 9649 §3.7.2): the simple
    1/2-symbol form or the normal code-length-coded form."""
    if br.bit1():  # simple
        num_symbols = br.bit1() + 1
        if br.bit1():
            sym0 = br.bits(8)
        else:
            sym0 = br.bit1()
        if sym0 >= alphabet_size:
            raise MediaFormatError("VP8L simple-code symbol out of range")
        if num_symbols == 1:
            lengths = [0] * alphabet_size
            lengths[sym0] = 1  # trivial single-symbol code
            return _PrefixCode(lengths)
        sym1 = br.bits(8)
        if sym1 >= alphabet_size or sym1 == sym0:
            raise MediaFormatError("VP8L simple-code symbol out of range")
        # 2-symbol codes follow READ order: first symbol = code 0
        return _PrefixCode.explicit({(1, 0): sym0, (1, 1): sym1})
    # normal: code lengths are themselves prefix-coded
    num_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _PrefixCode(clc_lengths)
    if br.bit1():  # max_symbol cutoff present
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.bits(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise MediaFormatError("VP8L code-length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _PrefixCode(lengths)


def _prefix_value(br: _BitReader, prefix_code: int) -> int:
    """LZ77 length/distance prefix coding (RFC 9649 §3.6.2.2)."""
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.bits(extra) + 1


# --- image-stream decoding ----------------------------------------------------


_GREEN_LIT = 256
_LEN_CODES = 24


def _decode_entropy_image(
    br: _BitReader, w: int, h: int
) -> np.ndarray:
    """A non-level-0 stream (transform data / entropy image /
    palette): same entropy layer, no transforms, no meta grouping."""
    return _decode_pixels(br, w, h, is_level0=False)


def _decode_pixels(
    br: _BitReader, w: int, h: int, *, is_level0: bool
) -> np.ndarray:
    """Core spatially-coded image decode → (h, w) uint32 ARGB.  For
    level-0 this is called AFTER the transforms are read (the caller
    tracks the reduced width from a color-indexing transform)."""
    cache_bits = 0
    cache = None
    if br.bit1():
        cache_bits = br.bits(4)
        if not (1 <= cache_bits <= 11):
            raise MediaFormatError(
                f"VP8L color-cache bits {cache_bits} out of range"
            )
        cache = np.zeros(1 << cache_bits, np.uint32)
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.bit1():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        ent = _decode_entropy_image(br, mw, mh)
        # meta index = (red << 8) | green
        meta = (((ent >> 16) & 0xFF) << 8) | ((ent >> 8) & 0xFF)
        n_groups = int(meta.max()) + 1
    green_alpha = _GREEN_LIT + _LEN_CODES + (
        (1 << cache_bits) if cache_bits else 0
    )
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )
    total = w * h
    out = np.zeros(total, np.uint32)
    pos = 0
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g_codes = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g_codes = groups[0]
        green_c, red_c, blue_c, alpha_c, dist_c = g_codes
        g = green_c.read(br)
        if g < _GREEN_LIT:
            r = red_c.read(br)
            b = blue_c.read(br)
            a = alpha_c.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[
                    ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                ] = px
        elif g < _GREEN_LIT + _LEN_CODES:
            length = _prefix_value(br, g - _GREEN_LIT)
            dist_prefix = dist_c.read(br)
            plane_code = _prefix_value(br, dist_prefix)
            if plane_code > 120:
                dist = plane_code - 120
            else:
                dx, dy = _DIST_MAP[plane_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise MediaFormatError(
                    "VP8L LZ77 distance before image start"
                )
            if pos + length > total:
                raise MediaFormatError("VP8L LZ77 run past image end")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF)
                        >> (32 - cache_bits)
                    ] = px
        else:
            if cache is None:
                raise MediaFormatError(
                    "VP8L cache symbol without a color cache"
                )
            out[pos] = cache[g - _GREEN_LIT - _LEN_CODES]
            pos += 1
    return out.reshape(h, w)


# --- transforms (inverse) -----------------------------------------------------


def _avg2(a: int, b: int) -> int:
    """Per-channel (a + b) // 2 on packed uint32 ARGB scalars (the
    carry-free SIMD-in-register form: (a & b) + ((a ^ b) >> 1))."""
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _select(L: int, T: int, TL: int) -> int:
    pl = pt = 0
    for cl, ct, ctl in zip(_channels(L), _channels(T), _channels(TL)):
        est = cl + ct - ctl
        pl += abs(est - cl)  # = |T - TL| per channel
        pt += abs(est - ct)  # = |L - TL| per channel
    return L if pl < pt else T


def _clamp_add_sub_full(L: int, T: int, TL: int) -> int:
    ch = []
    for cl, ct, ctl in zip(_channels(L), _channels(T), _channels(TL)):
        ch.append(min(255, max(0, cl + ct - ctl)))
    return _pack(*ch)


def _clamp_add_sub_half(ave: int, TL: int) -> int:
    ch = []
    for ca, ctl in zip(_channels(ave), _channels(TL)):
        d = ca - ctl
        half = d // 2 if d >= 0 else -((-d) // 2)  # trunc toward 0
        ch.append(min(255, max(0, ca + half)))
    return _pack(*ch)


def _inverse_predictor(
    img: np.ndarray, modes: np.ndarray, size_bits: int
) -> np.ndarray:
    """Inverse of the predictor transform (RFC 9649 §3.5.1): each
    stored residual gets the block's prediction added mod 256 per
    channel, scanning top-down/left-right over ALREADY-reconstructed
    neighbors.  Border rules: (0,0) predicts opaque black, row 0
    predicts L, column 0 predicts T; TR at the last column is the
    CURRENT row's leftmost pixel (the spec codifies the contiguous-
    buffer addressing)."""
    h, w = img.shape
    out = img.astype(np.uint32).copy()

    def addmod(p: int, q: int) -> int:
        return (
            ((((p & 0xFF00FF00) + (q & 0xFF00FF00)) & 0xFF00FF00)
             | (((p & 0x00FF00FF) + (q & 0x00FF00FF)) & 0x00FF00FF))
        )

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                mode = (
                    int(modes[y >> size_bits, x >> size_bits]) >> 8
                ) & 0xFF
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                TR = (
                    int(out[y - 1, x + 1])
                    if x + 1 < w
                    else int(out[y, 0])
                )
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = _select(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(L, T), TL)
                else:
                    raise MediaFormatError(
                        f"VP8L predictor mode {mode} out of range"
                    )
            out[y, x] = addmod(int(out[y, x]), pred)
    return out


def _inverse_color_transform(
    img: np.ndarray, elems: np.ndarray, size_bits: int
) -> np.ndarray:
    """Inverse cross-channel color transform (RFC 9649 §3.5.2):
    red += delta(g2r, green); blue += delta(g2b, green) +
    delta(r2b, restored red); deltas are signed (int8·int8) >> 5."""
    h, w = img.shape
    out = img.astype(np.uint32).copy()

    def s8(v: int) -> int:
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            e = int(elems[y >> size_bits, x >> size_bits])
            g2r = s8(e & 0xFF)         # stored in blue channel
            g2b = s8((e >> 8) & 0xFF)  # stored in green channel
            r2b = s8((e >> 16) & 0xFF)  # stored in red channel
            p = int(out[y, x])
            a, r, g, b = _channels(p)
            gs = s8(g)
            r = (r + ((g2r * gs) >> 5)) & 0xFF
            b = (b + ((g2b * gs) >> 5)) & 0xFF
            b = (b + ((r2b * s8(r)) >> 5)) & 0xFF
            out[y, x] = _pack(a, r, g, b)
    return out


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (
        (img & 0xFF00FF00) | (r << 16) | b
    ).astype(np.uint32)


def _color_index_width_bits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _inverse_color_indexing(
    packed: np.ndarray, palette: np.ndarray, w: int
) -> np.ndarray:
    """Inverse color-indexing (RFC 9649 §3.5.4): unbundle sub-byte
    indices from the GREEN channel (LSB-first within the byte) and
    look them up; out-of-range indices decode to 0x00000000."""
    h, packed_w = packed.shape
    size = palette.shape[0]
    wb = _color_index_width_bits(size)
    bpp = 8 >> wb
    per = 1 << wb
    mask = (1 << bpp) - 1
    out = np.zeros((h, w), np.uint32)
    greens = (packed >> 8) & 0xFF
    for y in range(h):
        for x in range(w):
            gx = x >> wb
            if gx >= packed_w:
                raise MediaFormatError("VP8L packed row underrun")
            idx = (int(greens[y, gx]) >> ((x % per) * bpp)) & mask
            out[y, x] = palette[idx] if idx < size else 0
    return out


# --- top-level decode ---------------------------------------------------------

_TR_PREDICTOR = 0
_TR_COLOR = 1
_TR_SUBTRACT_GREEN = 2
_TR_COLOR_INDEXING = 3


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload → (H, W, 4) uint8 RGBA array."""
    if len(payload) < 5:
        raise MediaFormatError("VP8L payload truncated")
    if payload[0] != 0x2F:
        raise MediaFormatError("VP8L signature byte missing")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit1()  # alpha-is-used hint (informative)
    if br.bits(3) != 0:
        raise MediaFormatError("VP8L version must be 0")
    return _decode_vp8l_body(br, w, h)


def _decode_vp8l_body(br: "_BitReader", w: int, h: int) -> np.ndarray:
    """The VP8L image stream AFTER the 5-byte container header:
    transforms + entropy-coded pixels → (H, W, 4) RGBA.  Shared by
    the normal chunk path and the HEADERLESS alpha-plane stream
    (r9 — an ALPH chunk with compression method 1 is exactly this
    stream at the frame's dimensions, §'Alpha' of the container
    spec; the alpha values travel in the green channel)."""
    # transforms (level 0 only); each type may appear at most once
    transforms: list[tuple] = []
    seen = set()
    cur_w = w
    while br.bit1():
        ttype = br.bits(2)
        if ttype in seen:
            raise MediaFormatError("VP8L duplicate transform")
        seen.add(ttype)
        if ttype == _TR_PREDICTOR or ttype == _TR_COLOR:
            size_bits = br.bits(3) + 2
            tw = (cur_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(br, tw, th)
            transforms.append((ttype, size_bits, sub))
        elif ttype == _TR_SUBTRACT_GREEN:
            transforms.append((ttype,))
        else:  # color indexing
            size = br.bits(8) + 1
            pal = _decode_entropy_image(br, size, 1)[0]
            # palette entries are delta-coded per channel mod 256
            out = np.zeros(size, np.uint32)
            prev = 0
            for i in range(size):
                cur = int(pal[i])
                s = (
                    (((prev & 0xFF00FF00) + (cur & 0xFF00FF00))
                     & 0xFF00FF00)
                    | (((prev & 0x00FF00FF) + (cur & 0x00FF00FF))
                       & 0x00FF00FF)
                )
                out[i] = s
                prev = s
            full_w = cur_w
            cur_w = (
                cur_w + (1 << _color_index_width_bits(size)) - 1
            ) >> _color_index_width_bits(size)
            transforms.append((ttype, out, full_w))
    img = _decode_pixels(br, cur_w, h, is_level0=True)
    for t in reversed(transforms):
        if t[0] == _TR_COLOR_INDEXING:
            img = _inverse_color_indexing(img, t[1], t[2])
        elif t[0] == _TR_SUBTRACT_GREEN:
            img = _inverse_subtract_green(img)
        elif t[0] == _TR_COLOR:
            img = _inverse_color_transform(img, t[2], t[1])
        else:
            img = _inverse_predictor(img, t[2], t[1])
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    r = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    b = (img & 0xFF).astype(np.uint8)
    return np.stack([r, g, b, a], axis=2)


def decode_alpha_plane(body: bytes, w: int, h: int) -> np.ndarray:
    """Decode a WebP ALPH chunk → (h, w) uint8 alpha plane (r9).
    Header byte (MSB-first): 2 reserved, 2 pre-processing (encode-
    side level reduction, no inverse), 2 filtering, 2 compression.
    Compression 0 is the raw plane; 1 is the HEADERLESS VP8L stream
    at the frame's dimensions with alpha in the green channel.  The
    filter inverse runs rowwise exactly as the container spec's
    predictors: horizontal (left, first pixel seeded from above),
    vertical (above), gradient (clamped left+above−aboveleft)."""
    if not body:
        raise MediaFormatError("WebP ALPH chunk empty")
    head = body[0]
    comp = head & 3
    filt = (head >> 2) & 3
    if comp == 0:
        if len(body) < 1 + w * h:
            raise MediaFormatError("WebP ALPH raw plane truncated")
        a = np.frombuffer(body[1 : 1 + w * h], np.uint8).reshape(h, w)
        a = a.astype(np.int32)
    elif comp == 1:
        rgba = _decode_vp8l_body(_BitReader(body[1:]), w, h)
        a = rgba[:, :, 1].astype(np.int32)  # green carries alpha
    else:
        raise MediaFormatError(f"WebP ALPH compression {comp} reserved")
    if filt == 0:
        return a.astype(np.uint8)
    out = np.zeros((h, w), np.int32)
    for y in range(h):
        if filt == 1:  # horizontal
            pred = 0 if y == 0 else int(out[y - 1, 0])
            row = np.cumsum(a[y]) + pred
            out[y] = row & 255
        elif filt == 2:  # vertical
            if y == 0:
                pred = 0
                out[y] = (np.cumsum(a[y]) + pred) & 255
            else:
                out[y] = (a[y] + out[y - 1]) & 255
        else:  # gradient
            if y == 0:
                out[y] = np.cumsum(a[y]) & 255
                continue
            left = int(out[y - 1, 0])
            tl = left
            for x in range(w):
                top = int(out[y - 1, x])
                g = left + top - tl
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (a[y, x] + g) & 255
                out[y, x] = left
                tl = top
    return out.astype(np.uint8)


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP container: VP8L (lossless) → pixels, VP8
    (lossy keyframe, r9 — ``vp8codec``, RFC 6386 bit-exact integer
    decode) → engine-canonical RGB; a VP8X wrapper is walked to its
    bitstream chunk, and a lossy stream's separate ALPH alpha plane
    decodes through :func:`decode_alpha_plane` (r9 — raw or
    headerless-VP8L, all three filters).  Returns (H, W, 3) RGB, or
    (H, W, 4) RGBA when any alpha < 255 (the PNG convention of
    ``mediacodec.decode_image``)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise MediaFormatError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    n = len(data)
    alph: bytes | None = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"ALPH":
            if len(body) < size:
                raise MediaFormatError("WebP ALPH chunk truncated")
            alph = body
        if cid == b"VP8L":
            if len(body) < size:
                raise MediaFormatError("WebP VP8L chunk truncated")
            rgba = decode_vp8l(body)
            if (rgba[:, :, 3] == 255).all():
                return rgba[:, :, :3].copy()
            return rgba
        if cid == b"VP8 ":
            if len(body) < size:
                raise MediaFormatError("WebP VP8 chunk truncated")
            from lsdm_motogp_data_integration_spark.operators.vp8codec import (  # noqa: E501
                decode_webp_lossy,
            )

            rgb = decode_webp_lossy(body)
            if alph is None:
                return rgb
            hh, ww = rgb.shape[:2]
            a = decode_alpha_plane(alph, ww, hh)
            rgba = np.concatenate([rgb, a[:, :, None]], axis=2)
            if (a == 255).all():
                return rgb
            return rgba
        if cid == b"VP8X" and body and body[0] & 0x02:
            # animated: the still-image convention is the first
            # composed frame (what _decode_gif does for GIF)
            frame = decode_webp_anim(data)[0][0]
            if (frame[:, :, 3] == 255).all():
                return frame[:, :, :3].copy()
            return frame
        pos += 8 + size + (size & 1)
    raise MediaFormatError("WebP has no VP8L/VP8 bitstream chunk")


# --- encoder (valid literals-only subset) -------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Optimal prefix-code lengths (package-free heap Huffman) with a
    Kraft-exact depth-limit repair.  Deterministic: ties broken by
    symbol value."""
    import heapq

    items = sorted(freqs.items())
    if len(items) == 1:
        return {items[0][0]: 1}
    depth = {s: 0 for s, _ in items}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(items)]
    heapq.heapify(heap)
    nxt = len(items)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    lengths = {s: min(d, max_len) for s, d in depth.items()}
    # Kraft repair to EXACT completeness at ≤ max_len
    cap = 1 << max_len

    def kraft() -> int:
        return sum(1 << (max_len - l) for l in lengths.values())

    while kraft() > cap:
        # lengthen the deepest symbol still below max_len
        s = max(
            (s for s, l in lengths.items() if l < max_len),
            key=lambda s: (lengths[s], s),
        )
        lengths[s] += 1
    slack = cap - kraft()
    while slack > 0:
        # shorten the deepest symbol whose promotion fits the slack
        cands = [
            (l, s)
            for s, l in lengths.items()
            if l > 1 and (1 << (max_len - l)) <= slack
        ]
        if not cands:
            break
        l, s = max(cands)
        lengths[s] = l - 1
        slack = cap - kraft()
    if kraft() != cap:
        raise MediaFormatError("VP8L encoder: Kraft repair failed")
    return lengths


def _write_prefix_code(
    bw: _BitWriter, lengths_map: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix-code description; returns symbol → (code, len)
    for the payload writer."""
    nz = sorted(lengths_map)
    if len(nz) == 1 and nz[0] <= 255:
        bw.bits(1, 1)  # simple
        bw.bits(0, 1)  # one symbol
        if nz[0] <= 1:
            bw.bits(0, 1)
            bw.bits(nz[0], 1)
        else:
            bw.bits(1, 1)
            bw.bits(nz[0], 8)
        return {nz[0]: (0, 0)}
    if len(nz) == 2 and nz[1] <= 255:
        bw.bits(1, 1)
        bw.bits(1, 1)  # two symbols
        if nz[0] <= 1:
            bw.bits(0, 1)
            bw.bits(nz[0], 1)
        else:
            bw.bits(1, 1)
            bw.bits(nz[0], 8)
        bw.bits(nz[1], 8)
        return {nz[0]: (0, 1), nz[1]: (1, 1)}
    # normal path: literal per-symbol lengths (no 16/17/18 repeats),
    # cut at the last used symbol via the max_symbol feature
    bw.bits(0, 1)
    full = [0] * alphabet_size
    for s, l in lengths_map.items():
        full[s] = l
    last = max(lengths_map) + 1
    seq = full[:last]
    clc_freq: dict[int, int] = {}
    for v in seq:
        clc_freq[v] = clc_freq.get(v, 0) + 1
    if len(clc_freq) == 1:
        clc_lengths = {next(iter(clc_freq)): 1}
    else:
        clc_lengths = _huffman_lengths(clc_freq, 7)
    bw.bits(15, 4)  # num_code_lengths = 19 (covers every plain value)
    lens19 = [0] * 19
    for v, l in clc_lengths.items():
        lens19[v] = l
    for i in range(19):
        bw.bits(lens19[_CLC_ORDER[i]], 3)
    if len(clc_lengths) == 1:
        clc_codes = {next(iter(clc_lengths)): (0, 0)}
    else:
        lt = [0] * 19
        for v, l in clc_lengths.items():
            lt[v] = l
        clc_codes = _canonical_codes(lt)
    # max_symbol cutoff
    bw.bits(1, 1)
    nbits = 2
    while (last - 2) >> nbits:
        nbits += 2
    if nbits > 16:
        raise MediaFormatError("VP8L encoder: alphabet cutoff too wide")
    bw.bits((nbits - 2) // 2, 3)
    bw.bits(last - 2, nbits)
    for v in seq:
        c, l = clc_codes[v]
        bw.code(c, l)
    lt_full = [0] * alphabet_size
    for s, l in lengths_map.items():
        lt_full[s] = l
    return _canonical_codes(lt_full)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """Inverse of :func:`_prefix_value`: value ≥ 1 → (prefix_code,
    extra_bit_count, extra_bit_value)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, extra, v - offset - 1
    raise MediaFormatError(f"VP8L LZ77 value {v} out of range")


def _lz77_tokens(argb: list[int], w: int) -> list[tuple]:
    """Greedy hash-chain LZ77 over the ARGB pixel sequence:
    ``(0, pixel)`` literals and ``(1, length, plane_code)`` copies
    (min match 3, max 4096; short distances map through the 2D
    neighborhood table, the rest code linearly as dist+120)."""
    n = len(argb)
    dist2code: dict[int, int] = {}
    for i, (dx, dy) in enumerate(_DIST_MAP):
        d = dy * w + dx
        if d >= 1:
            dist2code.setdefault(d, i + 1)
    tokens: list[tuple] = []
    table: dict[tuple, list[int]] = {}

    def note(pos: int) -> None:
        if pos + 2 < n:
            k = (argb[pos], argb[pos + 1], argb[pos + 2])
            lst = table.setdefault(k, [])
            lst.append(pos)
            if len(lst) > 8:
                lst.pop(0)

    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 2 < n:
            key = (argb[i], argb[i + 1], argb[i + 2])
            for j in reversed(table.get(key, [])):
                # r9 advisor fix: the linear distance code is
                # dist+120 and _prefix_encode caps at 2^20, so any
                # match farther back than 2^20-120 pixels is not
                # codable — skip it (realistic on >1MP images whose
                # only repeats are a border seen megapixels ago)
                if i - j > (1 << 20) - 120:
                    continue
                length = 3
                maxl = min(4096, n - i)
                while (
                    length < maxl and argb[j + length] == argb[i + length]
                ):
                    length += 1
                if length > best_len:
                    best_len, best_dist = length, i - j
        if best_len >= 3:
            tokens.append(
                (
                    1,
                    best_len,
                    dist2code.get(best_dist, best_dist + 120),
                )
            )
            for k in range(i, i + best_len):
                note(k)
            i += best_len
        else:
            tokens.append((0, argb[i]))
            note(i)
            i += 1
    return tokens


def _write_literal_stream(
    bw: _BitWriter,
    g: np.ndarray,
    r: np.ndarray,
    b: np.ndarray,
    alpha: np.ndarray,
    *,
    is_level0: bool,
    w: int = 0,
    lz77: bool = True,
) -> None:
    """One entropy-coded image stream: no color cache, no meta
    groups, optimal per-symbol canonical prefix codes, greedy LZ77
    backward references (r8 — disable with ``lz77=False`` for the
    pure-literal form).  Sub-images (``is_level0=False``) have no
    meta bit (RFC 9649 §3.7.1)."""
    gf = g.ravel().tolist()
    rf = r.ravel().tolist()
    bf = b.ravel().tolist()
    af = alpha.ravel().tolist()
    argb = [
        (int(a_) << 24) | (int(r_) << 16) | (int(g_) << 8) | int(b_)
        for g_, r_, b_, a_ in zip(gf, rf, bf, af)
    ]
    if lz77 and len(argb) >= 8:
        tokens = _lz77_tokens(argb, w or 1)
    else:
        tokens = [(0, px) for px in argb]
    # color cache (r8): simulate the decoder's cache over the token
    # stream and convert literal repeats into 1-symbol cache hits —
    # (2, idx) tokens; worth the 4 header bits only on streams with
    # enough pixels to amortize the bigger green alphabet
    cache_bits = 8 if len(argb) >= 64 else 0
    if cache_bits:
        csize = 1 << cache_bits
        cache = [None] * csize
        out_tokens: list[tuple] = []
        pos = 0
        for t in tokens:
            if t[0] == 0:
                px = t[1]
                idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (
                    32 - cache_bits
                )
                if cache[idx] == px:
                    out_tokens.append((2, idx))
                else:
                    out_tokens.append(t)
                    cache[idx] = px
                pos += 1
            else:
                out_tokens.append(t)
                for k in range(t[1]):
                    px = argb[pos + k]
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF)
                        >> (32 - cache_bits)
                    ] = px
                pos += t[1]
        tokens = out_tokens
    bw.bits(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.bits(cache_bits, 4)
    if is_level0:
        bw.bits(0, 1)  # no meta prefix codes
    cache_base = _GREEN_LIT + _LEN_CODES
    freqs: list[dict[int, int]] = [{}, {}, {}, {}, {}]
    for t in tokens:
        if t[0] == 0:
            px = t[1]
            for fi, v in zip(
                range(4),
                ((px >> 8) & 0xFF, (px >> 16) & 0xFF, px & 0xFF,
                 (px >> 24) & 0xFF),
            ):
                freqs[fi][v] = freqs[fi].get(v, 0) + 1
        elif t[0] == 1:
            lc = _GREEN_LIT + _prefix_encode(t[1])[0]
            freqs[0][lc] = freqs[0].get(lc, 0) + 1
            dc = _prefix_encode(t[2])[0]
            freqs[4][dc] = freqs[4].get(dc, 0) + 1
        else:
            cs = cache_base + t[1]
            freqs[0][cs] = freqs[0].get(cs, 0) + 1
    # red/blue/alpha/distance codes may be unused: a 1-symbol code is
    # the minimal valid description
    books = []
    green_alpha = cache_base + ((1 << cache_bits) if cache_bits else 0)
    for fi, alphabet in enumerate(
        (green_alpha, 256, 256, 256, 40)
    ):
        fq = freqs[fi] or {0: 1}
        if len(fq) == 1:
            lengths = {next(iter(fq)): 1}
        else:
            lengths = _huffman_lengths(fq, 15)
        books.append(_write_prefix_code(bw, lengths, alphabet))
    gb, rb, bb, ab, db = books
    for t in tokens:
        if t[0] == 0:
            px = t[1]
            for book, v in (
                (gb, (px >> 8) & 0xFF),
                (rb, (px >> 16) & 0xFF),
                (bb, px & 0xFF),
                (ab, (px >> 24) & 0xFF),
            ):
                c, ln = book[v]
                bw.code(c, ln)
        elif t[0] == 1:
            lc, lext, lval = _prefix_encode(t[1])
            c, ln = gb[_GREEN_LIT + lc]
            bw.code(c, ln)
            if lext:
                bw.bits(lval, lext)
            dc, dext, dval = _prefix_encode(t[2])
            c, ln = db[dc]
            bw.code(c, ln)
            if dext:
                bw.bits(dval, dext)
        else:
            c, ln = gb[cache_base + t[1]]
            bw.code(c, ln)


def encode_webp_lossless(
    arr: np.ndarray,
    *,
    subtract_green: bool = False,
    palette: bool | None = None,
) -> bytes:
    """Encode ``(H, W)`` gray / ``(H, W, 3)`` RGB / ``(H, W, 4)``
    RGBA uint8 pixels as a lossless WebP (VP8L): optimal per-channel
    canonical prefix codes, optional subtract-green transform, and —
    r8 — the COLOR-INDEXING transform for paletted content
    (delta-coded palette + sub-byte index bundling at ≤ 16 colors).
    ``palette=None`` auto-selects indexing when the image has ≤ 256
    distinct colors and more pixels than palette entries;
    ``palette=True`` requires it (raises above 256 colors); it does
    not compose with ``subtract_green``.  No LZ77/cache/meta.  Any
    conformant decoder reproduces the input exactly."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise MediaFormatError("encode_webp_lossless wants gray/RGB/RGBA")
    h, w = a.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise MediaFormatError("VP8L dimensions out of range (1..16384)")
    if a.shape[2] == 3:
        a = np.concatenate(
            [a, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    flat = a.reshape(-1, 4)
    pal_u = None
    if palette is not False and not (palette is None and subtract_green):
        pal_u = np.unique(flat, axis=0)
        if pal_u.shape[0] > 256 or pal_u.shape[0] >= flat.shape[0]:
            if palette:
                raise MediaFormatError(
                    f"palette=True but {pal_u.shape[0]} distinct "
                    f"colors (max 256)"
                )
            pal_u = None
    if pal_u is not None and subtract_green:
        raise MediaFormatError(
            "subtract_green does not compose with color indexing"
        )
    bw = _BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if (a[:, :, 3] != 255).any() else 0, 1)
    bw.bits(0, 3)  # version
    if pal_u is not None:
        size = pal_u.shape[0]
        # pixel → palette index via a packed-key sort lookup
        keys = (
            (flat[:, 0].astype(np.int64) << 24)
            | (flat[:, 1].astype(np.int64) << 16)
            | (flat[:, 2].astype(np.int64) << 8)
            | flat[:, 3].astype(np.int64)
        )
        pal_keys = (
            (pal_u[:, 0].astype(np.int64) << 24)
            | (pal_u[:, 1].astype(np.int64) << 16)
            | (pal_u[:, 2].astype(np.int64) << 8)
            | pal_u[:, 3].astype(np.int64)
        )
        order = np.argsort(pal_keys)
        inv = np.empty(size, np.int64)
        inv[order] = np.arange(size)
        idx = inv[np.searchsorted(pal_keys[order], keys)]
        bw.bits(1, 1)
        bw.bits(_TR_COLOR_INDEXING, 2)
        bw.bits(size - 1, 8)
        # palette sub-image: entries DELTA-coded per channel mod 256
        deltas = np.zeros((size, 4), np.int64)
        prev = np.zeros(4, np.int64)
        for i in range(size):
            cur = pal_u[i].astype(np.int64)
            deltas[i] = (cur - prev) % 256
            prev = cur
        _write_literal_stream(
            bw,
            deltas[:, 1],  # green
            deltas[:, 0],  # red
            deltas[:, 2],  # blue
            deltas[:, 3],  # alpha
            is_level0=False,
            w=size,
        )
        bw.bits(0, 1)  # no more transforms
        # main image at the packed width: indices bundled LSB-first
        wb_ = _color_index_width_bits(size)
        bpp = 8 >> wb_
        per = 1 << wb_
        wp = (w + per - 1) // per
        packed = np.zeros((h, wp), np.int64)
        im = idx.reshape(h, w)
        for x in range(w):
            packed[:, x >> wb_] |= im[:, x] << ((x % per) * bpp)
        zeros = np.zeros(h * wp, np.int64)
        _write_literal_stream(
            bw, packed.ravel(), zeros, zeros, zeros, is_level0=True,
            w=wp,
        )
    else:
        r = a[:, :, 0].astype(np.int64)
        g = a[:, :, 1].astype(np.int64)
        b = a[:, :, 2].astype(np.int64)
        alpha = a[:, :, 3].astype(np.int64)
        if subtract_green:
            r = (r - g) % 256
            b = (b - g) % 256
            bw.bits(1, 1)
            bw.bits(_TR_SUBTRACT_GREEN, 2)
        bw.bits(0, 1)  # no (more) transforms
        _write_literal_stream(bw, g, r, b, alpha, is_level0=True, w=w)
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# --- animated WebP (VP8X + ANIM/ANMF container framing) -----------------------


def _walk_webp_chunks(data: bytes):
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise MediaFormatError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise MediaFormatError(f"WebP chunk {cid!r} truncated")
        yield cid, body
        pos += 8 + size + (size & 1)


def webp_is_animated(data: bytes) -> bool:
    """O(header): VP8X animation flag (bit 0x02 of the flags byte)."""
    for cid, body in _walk_webp_chunks(data):
        if cid == b"VP8X":
            if len(body) < 10:
                raise MediaFormatError("WebP VP8X chunk truncated")
            return bool(body[0] & 0x02)
        return False
    return False


def webp_anim_info(data: bytes) -> dict:
    """O(header) animation metadata WITHOUT frame decode (the
    ``gif_anim_info`` twin): canvas dims, frame count, per-frame and
    total durations, loop count — from the VP8X/ANIM/ANMF chunk
    headers only (frame payloads are skipped, never entropy-decoded)."""
    canvas = None
    loop = None
    durations: list[int] = []
    for cid, body in _walk_webp_chunks(data):
        if cid == b"VP8X":
            if len(body) < 10:
                raise MediaFormatError("WebP VP8X chunk truncated")
            if not body[0] & 0x02:
                raise MediaFormatError("WebP is not animated (no flag)")
            canvas = (
                int.from_bytes(body[4:7], "little") + 1,
                int.from_bytes(body[7:10], "little") + 1,
            )
        elif cid == b"ANIM":
            if len(body) < 6:
                raise MediaFormatError("WebP ANIM chunk truncated")
            loop = struct.unpack_from("<H", body, 4)[0]
        elif cid == b"ANMF":
            if len(body) < 16:
                raise MediaFormatError("WebP ANMF chunk truncated")
            durations.append(int.from_bytes(body[12:15], "little"))
    if canvas is None or loop is None:
        raise MediaFormatError("WebP has no VP8X/ANIM animation chunks")
    return {
        "width": canvas[0],
        "height": canvas[1],
        "n_frames": len(durations),
        "durations_ms": durations,
        "duration_ms": sum(durations),
        "loop_count": loop,
    }


def decode_webp_anim(
    data: bytes,
) -> tuple[list[np.ndarray], list[int]]:
    """Decode an animated WebP (lossless frames) → (composed frames,
    per-frame durations in ms).  Each frame is the full
    ``(canvas_h, canvas_w, 4)`` RGBA canvas after applying the ANMF
    placement/blend/dispose model:

    - frames blit at their (2·x, 2·y) offsets;
    - blend bit 0 → straight-alpha compositing onto the canvas (the
      container spec's formula, integer-truncated; opaque sources
      reduce to overwrite exactly), blend bit 1 → overwrite;
    - dispose bit 1 → the frame rect reverts to TRANSPARENT (what
      reference renderers do — the same call as the r8 GIF
      disposal-2 fix; the ANIM background color is metadata).

    Lossy (VP8) frames stay an honest gate."""
    info = webp_anim_info(data)  # validates the container shape
    w, h = info["width"], info["height"]
    canvas = np.zeros((h, w, 4), np.uint16)
    out: list[np.ndarray] = []
    durations: list[int] = []
    for cid, body in _walk_webp_chunks(data):
        if cid != b"ANMF":
            continue
        fx = 2 * int.from_bytes(body[0:3], "little")
        fy = 2 * int.from_bytes(body[3:6], "little")
        fw = int.from_bytes(body[6:9], "little") + 1
        fh = int.from_bytes(body[9:12], "little") + 1
        dur = int.from_bytes(body[12:15], "little")
        flags = body[15]
        no_blend = bool(flags & 0x02)
        dispose_bg = bool(flags & 0x01)
        if fx + fw > w or fy + fh > h:
            raise MediaFormatError(
                "WebP ANMF frame rectangle outside canvas"
            )
        # frame payload: sub-chunks; VP8L carries the pixels, and a
        # lossy frame may carry an ALPH alpha plane before its VP8
        # chunk (r9 — same composition as the still-image path)
        sub = body[16:]
        frame_rgba = None
        frame_alph: bytes | None = None
        pos = 0
        while pos + 8 <= len(sub):
            scid = sub[pos : pos + 4]
            ssize = struct.unpack_from("<I", sub, pos + 4)[0]
            sbody = sub[pos + 8 : pos + 8 + ssize]
            if scid == b"ALPH":
                if len(sbody) < ssize:
                    raise MediaFormatError(
                        "WebP ANMF ALPH sub-chunk truncated"
                    )
                frame_alph = sbody
            if scid == b"VP8L":
                frame_rgba = decode_vp8l(sbody)
                break
            if scid == b"VP8 ":
                from lsdm_motogp_data_integration_spark.operators.vp8codec import (  # noqa: E501
                    decode_webp_lossy,
                )

                rgb = decode_webp_lossy(sbody)
                if frame_alph is not None:
                    a = decode_alpha_plane(
                        frame_alph, rgb.shape[1], rgb.shape[0]
                    )
                else:
                    a = np.full(rgb.shape[:2], 255, np.uint8)
                frame_rgba = np.concatenate(
                    [rgb, a[:, :, None]], axis=2
                )
                break
            pos += 8 + ssize + (ssize & 1)
        if frame_rgba is None:
            raise MediaFormatError("WebP ANMF frame has no bitstream")
        if frame_rgba.shape[:2] != (fh, fw):
            raise MediaFormatError(
                "WebP ANMF frame dims disagree with its bitstream"
            )
        src = frame_rgba.astype(np.uint16)
        region = canvas[fy : fy + fh, fx : fx + fw]
        if no_blend:
            region[:] = src
        else:
            # container-spec straight-alpha blend, integer-truncated;
            # src alpha 255 → exact overwrite, 0 → canvas unchanged
            sa = src[:, :, 3:4]
            da = region[:, :, 3:4]
            ba = sa + da * (255 - sa) // 255
            num = (
                src[:, :, :3].astype(np.uint32) * sa
                + region[:, :, :3].astype(np.uint32)
                * da
                * (255 - sa)
                // 255
            )
            rgb = np.where(ba > 0, num // np.maximum(ba, 1), 0)
            region[:, :, :3] = rgb.astype(np.uint16)
            region[:, :, 3:4] = ba
        out.append(canvas.astype(np.uint8).copy())
        durations.append(dur)
        if dispose_bg:
            canvas[fy : fy + fh, fx : fx + fw] = 0
    if not out:
        raise MediaFormatError("WebP animation has no ANMF frames")
    return out, durations


def encode_webp_anim(
    frames: list[np.ndarray],
    durations_ms: list[int],
    *,
    loop_count: int = 0,
) -> bytes:
    """Encode full-canvas RGB(A) frames as an animated lossless WebP
    (VP8X + ANIM + one no-blend ANMF per frame, each carrying a VP8L
    bitstream from :func:`encode_webp_lossless`'s machinery)."""
    if not frames or len(frames) != len(durations_ms):
        raise MediaFormatError(
            "encode_webp_anim wants equal-length frames/durations"
        )
    first = np.asarray(frames[0], dtype=np.uint8)
    h, w = first.shape[:2]
    chunks = bytearray()
    flags = 0x02  # animation
    has_alpha = any(
        np.asarray(f).ndim == 3
        and np.asarray(f).shape[2] == 4
        and (np.asarray(f)[:, :, 3] != 255).any()
        for f in frames
    )
    if has_alpha:
        flags |= 0x10
    vp8x = (
        bytes([flags, 0, 0, 0])
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = struct.pack("<I", 0) + struct.pack("<H", loop_count)
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for f, dur in zip(frames, durations_ms):
        a = np.asarray(f, dtype=np.uint8)
        if a.shape[:2] != (h, w):
            raise MediaFormatError(
                "encode_webp_anim frames must share the canvas size"
            )
        riff = encode_webp_lossless(a)
        # lift the VP8L chunk out of the single-image container
        vp8l_off = riff.index(b"VP8L")
        size = struct.unpack_from("<I", riff, vp8l_off + 4)[0]
        payload = riff[vp8l_off : vp8l_off + 8 + size + (size & 1)]
        body = (
            (0).to_bytes(3, "little")  # x/2
            + (0).to_bytes(3, "little")  # y/2
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + int(dur).to_bytes(3, "little")
            + bytes([0x02])  # no-blend, keep (dispose 0)
            + payload
        )
        chunks += b"ANMF" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    riff_body = b"WEBP" + bytes(chunks)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
