"""Lossless WebP (VP8L) decode/encode with zero external dependencies.

VP8L is the lossless mode of the public "WebP Lossless Bitstream
Specification" (Google, 2012 — the RIFF chunk tagged "VP8L"). It is
the last crawled-corpus image format in this repo's honest-boundary
ledger that is implementable without native libs (SCALE.md "WEBP-VP8L
scoping spike", round 13): an LSB-first bitstream of canonical prefix
codes (DEFLATE-style, including the code-length-code bootstrap),
LZ77 back-references with a 120-entry 2D distance neighborhood, an
optional color cache, optional meta-prefix groups selected by a
recursively-coded entropy image, and four invertible transforms
(14-mode spatial predictor, cross-color, subtract-green,
color-indexing with sub-byte pixel bundling) — every sub-image
(transform data, entropy image, palette) is itself VP8L-entropy-coded,
which is the recursion this module implements once in
``_decode_image_stream`` and reuses for all roles.

Same honesty tier as jpeg.py/gif.py/tiff.py: a REAL decoder validated
against an in-repo encoder plus hand-assembled interop fixtures
(tests/test_codec_interop.py) whose header fields, prefix codes and
LZ77/back-reference bits are packed by hand in comments. Lossy WebP
("VP8 " chunks — a video-codec intra frame) stays on the documented
boundary with H.264 (multimodal.py honest raise).

Parity note: the reference engine treats media payloads as opaque
bytes; this module exists for the data-pipeline side (corpus curation
over crawled images).

Scope (the full lossless WebP surface):
- RIFF walk: bare "VP8L" files and extended "VP8X" containers
  (metadata chunks skipped); "VP8 " lossy raises loud.
- simple (1-2 symbol) AND normal prefix codes, max_symbol shortcut,
  code-length runs (16/17/18);
- color cache (1-11 bits), meta-prefix entropy image, LZ77 with the
  2D distance map;
- all four transforms, each at most once, inverted in reverse read
  order, including palette pixel-bundling at 1/2/4 bits per index;
- ANIMATIONS with lossless frames (decode_webp_frames /
  webp_frame_sample: ANIM/ANMF walk, sub-rectangle compositing, blend
  and dispose-to-background semantics — the GIF-animation analog).
Out of scope (loud ValueError / NotImplementedError): lossy "VP8 "
payloads (still or as animation frames), fragmented/invalid streams.

The encoder is fixture-grade by design (the md5-playbook needs a
deterministic in-repo producer, not a compressor): literal-only
coding (no LZ77 emission, no color cache), one prefix group, but it
DOES exercise simple codes, normal canonical codes via the
code-length code, max_symbol, and the subtract-green / predictor /
color-indexing transforms so the decoder's transform machinery is
covered by round-trips as well as by the hand-packed fixtures.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# constants from the spec

# resource guard for untrusted crawled corpora: the 14-bit header dims
# allow 16384×16384 (268M pixels ≈ 2+ GB of Python list) from a
# few-byte adversarial LZ77 stream; raise the loud ValueError boundary
# BEFORE allocating (r15 advice). 64M pixels ≈ 8192×8192 — far above
# any real crawled image, small enough that a poisoned batch can't OOM
# an executor.
WEBP_MAX_PIXELS = 1 << 26

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_CL_ALPHABET = 19  # code-length-code alphabet
# order in which code-length-code lengths are stored (spec §6.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D neighborhood for distance codes 1..120 (spec §5.2.2, "distance
# mapping"): (dx, dy) offsets; dist = dx + dy * xsize, clamped to >= 1.
# Verified pairwise against the plane-code packing (y<<4 | 8-x) used by
# public decoders; the hand-packed back-reference fixture in
# tests/test_codec_interop.py pins codes 1 (above) and 2 (left).
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


def _div_ceil(a: int, b: int) -> int:
    return -(-a // b)


def _bundle_bits(palette_size: int) -> int:
    """Pixel-bundling width_bits for a palette of this size (spec §4.4):
    how many index pixels pack into one coded green byte (1 << result)."""
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


# ---------------------------------------------------------------------------
# bit I/O (LSB-first within bytes; prefix codes read/written MSB-first)


class _BitReader:
    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        p = self._pos
        if (p + n) > 8 * len(self._d):
            raise ValueError("VP8L bitstream truncated")
        for i in range(n):
            v |= ((self._d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self._pos = p + n
        return v


class _BitWriter:
    def __init__(self):
        self._bytes = bytearray()
        self._bit = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n):
            if self._bit == 0:
                self._bytes.append(0)
            if (v >> i) & 1:
                self._bytes[-1] |= 1 << self._bit
            self._bit = (self._bit + 1) & 7

    def code(self, c: int, length: int) -> None:
        """Write a canonical prefix code MSB-first (the bit order prefix
        codes use, opposite to fixed-width fields)."""
        for i in range(length - 1, -1, -1):
            self.bits((c >> i) & 1, 1)

    def payload(self) -> bytes:
        return bytes(self._bytes)


# ---------------------------------------------------------------------------
# canonical prefix codes


def _writer_codes(lengths) -> dict:
    """Encoder-side symbol -> (code, emit_length): canonical codes, but a
    table with a single used symbol emits ZERO bits — the degenerate case
    every decoder (including _PrefixDecoder below) resolves without
    reading; writing its nominal 1-bit code would desynchronize the
    stream."""
    out = _canonical_codes(lengths)
    if len(out) == 1:
        (sym,) = out
        return {sym: (0, 0)}
    return out


def _canonical_codes(lengths) -> dict:
    """symbol -> (code, length) via the DEFLATE canonical rule the spec
    mandates: codes assigned in increasing length, ties by symbol."""
    max_len = max(lengths, default=0)
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


class _PrefixDecoder:
    """Bit-by-bit canonical decoder. A table with a single used symbol is
    a ZERO-bit code (the spec's degenerate case: the symbol is known
    without reading) — both the simple-code num_symbols=1 form and a
    normal code declaring one symbol decode that way."""

    def __init__(self, lengths):
        used = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not used:
            raise ValueError("VP8L prefix code with no symbols")
        if len(used) == 1:
            self._only = used[0][0]
            self._table = None
            return
        # completeness check: a malformed (over/under-subscribed) code
        # would otherwise loop or mis-decode silently
        kraft = sum(2 ** -ln for _, ln in used)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L prefix code not complete")
        self._only = None
        self._table = {}
        for sym, (code, ln) in _canonical_codes(lengths).items():
            self._table[(ln, code)] = sym

    def read(self, br: _BitReader) -> int:
        if self._only is not None:
            return self._only
        code = 0
        ln = 0
        t = self._table
        while True:
            code = (code << 1) | br.bits(1)
            ln += 1
            sym = t.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("VP8L prefix code longer than 15 bits")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    """One prefix code: the simple (1-2 symbol) form or the normal form
    bootstrapped through the 19-symbol code-length code (spec §6.2.2)."""
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        first_8bit = br.bits(1)
        s0 = br.bits(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if s0 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[s0] = 1  # degenerate: decoder treats single as 0-bit
        else:
            s1 = br.bits(8)
            if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
                raise ValueError("VP8L simple-code symbols invalid")
            # both get length 1 and the CANONICAL assignment (code 0 to
            # the smaller symbol) regardless of written order — public
            # decoders build the same table from the lengths
            lengths[s0] = lengths[s1] = 1
        return _PrefixDecoder(lengths)
    # normal: code lengths for the code-length code, in _CL_ORDER
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * _CL_ALPHABET
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    # optional cap on the number of length-symbol reads
    if br.bits(1):
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = []
    prev = 8  # spec: initial repeat-previous value
    while len(lengths) < alphabet_size:
        if max_symbol == 0:
            break  # remaining lengths are zero
        max_symbol -= 1
        s = cl_dec.read(br)
        if s < 16:
            lengths.append(s)
            if s:
                prev = s
        elif s == 16:
            lengths.extend([prev] * (3 + br.bits(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.bits(3)))
        else:  # 18
            lengths.extend([0] * (11 + br.bits(7)))
    if len(lengths) > alphabet_size:
        raise ValueError("VP8L code lengths overflow the alphabet")
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return _PrefixDecoder(lengths)


# ---------------------------------------------------------------------------
# entropy-coded image (the shared core: main image, transform data,
# entropy image, palette — all decode through here)


def _lz77_value(br: _BitReader, code: int) -> int:
    """Prefix-coded LZ77 length/distance value (spec §5.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _plane_to_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dx + dy * xsize
    return d if d >= 1 else 1


def _decode_entropy_image(br: _BitReader, w: int, h: int, allow_meta: bool):
    """Decode w*h ARGB pixels (list of uint32, row-major)."""
    cache_bits = 0
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} out of range")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    meta_bits = 0
    ew = 0
    ngroups = 1
    if allow_meta and br.bits(1):
        meta_bits = br.bits(3) + 2
        ew = _div_ceil(w, 1 << meta_bits)
        eh = _div_ceil(h, 1 << meta_bits)
        meta_px = _decode_image_stream(br, ew, eh, level0=False)
        # group index = (red << 8) | green of the entropy-image pixel
        meta = [(p >> 8) & 0xFFFF for p in meta_px]
        ngroups = max(meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(ngroups):
        groups.append((
            _read_prefix_code(br, _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size),
            _read_prefix_code(br, _NUM_LITERALS),   # red
            _read_prefix_code(br, _NUM_LITERALS),   # blue
            _read_prefix_code(br, _NUM_LITERALS),   # alpha
            _read_prefix_code(br, _NUM_DISTANCE_CODES),
        ))
    n = w * h
    out = [0] * n
    pos = 0
    shift = 32 - cache_bits
    while pos < n:
        if meta is not None:
            x = pos % w
            y = pos // w
            grp = groups[meta[(y >> meta_bits) * ew + (x >> meta_bits)]]
        else:
            grp = groups[0]
        g_dec, r_dec, b_dec, a_dec, d_dec = grp
        s = g_dec.read(br)
        if s < _NUM_LITERALS:  # literal: green, then red, blue, alpha
            red = r_dec.read(br)
            blue = b_dec.read(br)
            alpha = a_dec.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:  # LZ77 back-reference
            length = _lz77_value(br, s - _NUM_LITERALS)
            dist = _plane_to_dist(_lz77_value(br, d_dec.read(br)), w)
            if dist > pos:
                raise ValueError("VP8L back-reference before image start")
            if pos + length > n:
                raise ValueError("VP8L back-reference past image end")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> shift] = px
        else:  # color-cache hit
            if cache is None:
                raise ValueError("VP8L cache symbol without a color cache")
            out[pos] = cache[s - _NUM_LITERALS - _NUM_LENGTH_CODES]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# transforms (inverse — applied in reverse read order)


def _avg2(a: int, b: int) -> int:
    """Per-channel (a+b)>>1 on packed ARGB."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, top_left: int, top_right: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return top_right
    if mode == 4:
        return top_left
    if mode == 5:
        return _avg2(_avg2(left, top_right), top)
    if mode == 6:
        return _avg2(left, top_left)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(top_left, top)
    if mode == 9:
        return _avg2(top, top_right)
    if mode == 10:
        return _avg2(_avg2(left, top_left), _avg2(top, top_right))
    if mode == 11:  # Select
        p_sum = 0
        for sh in (24, 16, 8, 0):
            t = (top >> sh) & 0xFF
            l_ = (left >> sh) & 0xFF
            tl = (top_left >> sh) & 0xFF
            p_sum += abs(l_ - tl) - abs(t - tl)
        return top if p_sum <= 0 else left
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            c = _clip255(((left >> sh) & 0xFF) + ((top >> sh) & 0xFF)
                         - ((top_left >> sh) & 0xFF))
            out |= c << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf(Average2(L,T), TL)
        ave = _avg2(left, top)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 0xFF
            b = (top_left >> sh) & 0xFF
            d = a - b
            # C-style truncation toward zero, matching the spec pseudo-code
            half = -((-d) >> 1) if d < 0 else d >> 1
            out |= _clip255(a + half) << sh
        return out
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _add_pixels(a: int, b: int) -> int:
    """Per-channel (a+b) & 0xff on packed ARGB."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _inv_predictor(px, w: int, h: int, size_bits: int, modes, mw: int):
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]  # top row: left
            elif x == 0:
                pred = px[i - w]  # left column: top
            else:
                mode = (modes[(y >> size_bits) * mw + (x >> size_bits)] >> 8) & 0xFF
                # top-right of the last column wraps to the current row's
                # first (already reconstructed) pixel — row-contiguous
                # layout makes that pixel the natural px[i - w + 1]
                tr = px[i - w + 1] if x + 1 < w else px[row]
                pred = _predict(mode, px[i - 1], px[i - w], px[i - w - 1], tr)
            px[i] = _add_pixels(px[i], pred)
    return px


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 — Python's >> is arithmetic, matching."""
    return (_s8(t & 0xFF) * _s8(c & 0xFF)) >> 5


def _inv_color_transform(px, w: int, h: int, size_bits: int, elems, mw: int):
    for y in range(h):
        for x in range(w):
            i = y * w + x
            e = elems[(y >> size_bits) * mw + (x >> size_bits)]
            g2r = e & 0xFF          # blue channel of the element pixel
            g2b = (e >> 8) & 0xFF   # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            p = px[i]
            g = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _ct_delta(g2r, g)
            red &= 0xFF
            blue = (p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, red)
            blue &= 0xFF
            px[i] = (p & 0xFF00FF00) | (red << 16) | blue
    return px


def _inv_subtract_green(px):
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b
    return px


def _inv_color_index(coded, coded_w: int, h: int, width_bits: int, palette, out_w: int):
    if width_bits == 0:
        out = [0] * (out_w * h)
        for i, p in enumerate(coded):
            idx = (p >> 8) & 0xFF
            if idx >= len(palette):
                raise ValueError("VP8L palette index out of range")
            out[i] = palette[idx]
        return out
    per_byte = 1 << width_bits
    bits_pp = 8 >> width_bits
    mask = (1 << bits_pp) - 1
    out = [0] * (out_w * h)
    for y in range(h):
        for x in range(out_w):
            packed = coded[y * coded_w + (x >> width_bits)]
            idx = ((packed >> 8) >> ((x % per_byte) * bits_pp)) & mask
            if idx >= len(palette):
                raise ValueError("VP8L palette index out of range")
            out[y * out_w + x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# image stream (transforms at level 0, entropy image inside)


def _decode_image_stream(br: _BitReader, w: int, h: int, level0: bool):
    transforms = []
    cur_w = w
    if level0:
        seen = set()
        while br.bits(1):
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError(f"VP8L transform {ttype} appears twice")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / cross-color
                size_bits = br.bits(3) + 2
                mw = _div_ceil(cur_w, 1 << size_bits)
                mh = _div_ceil(h, 1 << size_bits)
                sub = _decode_image_stream(br, mw, mh, level0=False)
                transforms.append((ttype, size_bits, sub, mw, cur_w))
            elif ttype == 2:  # subtract green
                transforms.append((2, 0, None, 0, cur_w))
            else:  # 3: color indexing
                psize = br.bits(8) + 1
                raw_pal = _decode_image_stream(br, psize, 1, level0=False)
                # palette entries are delta-coded per channel
                pal = []
                prev = 0
                for p in raw_pal:
                    prev = _add_pixels(prev, p)
                    pal.append(prev)
                wb = _bundle_bits(psize)
                transforms.append((3, wb, pal, 0, cur_w))
                cur_w = _div_ceil(cur_w, 1 << wb)
    px = _decode_entropy_image(br, cur_w, h, allow_meta=level0)
    for ttype, bits_, data, mw, w_at_read in reversed(transforms):
        if ttype == 0:
            px = _inv_predictor(px, w_at_read, h, bits_, data, mw)
        elif ttype == 1:
            px = _inv_color_transform(px, w_at_read, h, bits_, data, mw)
        elif ttype == 2:
            px = _inv_subtract_green(px)
        else:
            px = _inv_color_index(px, cur_w, h, bits_, data, w_at_read)
            cur_w = w_at_read
    return px


# ---------------------------------------------------------------------------
# container + public API


def _check_riff(payload: bytes) -> None:
    """Loud truncation gate: the RIFF header's declared size and every
    chunk's declared size must fit the buffer. Without this, a payload
    cut at a chunk boundary silently decodes as a SHORTER animation
    (the chunk walk just stops) — the module's documented boundary is
    a loud failure for fragmented/invalid streams."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("WebP container truncated (RIFF size exceeds buffer)")
    pos = 12
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > len(payload):
            raise ValueError("WebP chunk truncated (declared size exceeds buffer)")
        pos += 8 + size + (size & 1)


def _find_vp8l_chunk(payload: bytes) -> bytes:
    _check_riff(payload)
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return body
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8 intra-frame coding) is out of scope — "
                "documented boundary with H.264 (multimodal.py); only "
                "lossless VP8L decodes here"
            )
        # VP8X / ICCP / EXIF / XMP / ANIM metadata: skip (ANMF frames
        # would carry lossy or per-frame payloads — handled when hit)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("WebP container has no VP8L chunk")


def _decode_vp8l_body(body: bytes):
    """VP8L chunk body → (w, h, numpy (h, w) uint32 ARGB)."""
    import numpy as np

    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(body[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    if w * h > WEBP_MAX_PIXELS:
        raise ValueError(
            f"VP8L dimensions {w}x{h} exceed the {WEBP_MAX_PIXELS}-pixel "
            "decode guard"
        )
    br.bits(1)  # alpha-used hint
    version = br.bits(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    px = _decode_image_stream(br, w, h, level0=True)
    return w, h, np.asarray(px, dtype=np.uint32).reshape(h, w)


def _argb_to_rgb(arr):
    import numpy as np

    out = np.empty((*arr.shape, 3), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF
    out[..., 1] = (arr >> 8) & 0xFF
    out[..., 2] = arr & 0xFF
    return out


def decode_vp8l(payload: bytes):
    """Decode a lossless WebP payload to an (H, W, 3) uint8 RGB array.

    Accepts a full RIFF container (bare VP8L chunk or VP8X extended
    layout). Alpha is decoded (it participates in transforms) but the
    repo's image contract is RGB; it is dropped at the end.
    """
    _, _, arr = _decode_vp8l_body(_find_vp8l_chunk(payload))
    return _argb_to_rgb(arr)


# ---------------------------------------------------------------------------
# encoder (fixture-grade: literal-only, one prefix group, real prefix
# codes + optional transforms — see module docstring)


def _huffman_lengths(counts, limit: int):
    """Code lengths for a canonical prefix code, depth-limited by
    halving frequencies and re-building until the tree fits (converges
    to a balanced tree, depth ceil(log2 n) <= limit for our alphabets)."""
    import heapq

    n_used = sum(1 for c in counts if c)
    if n_used <= 1:
        return [1 if c else 0 for c in counts]
    cur = list(counts)
    while True:
        heap = [(c, i, ("leaf", i)) for i, c in enumerate(cur) if c]
        heapq.heapify(heap)
        tick = len(cur)
        while len(heap) > 1:
            c1, _, t1 = heapq.heappop(heap)
            c2, _, t2 = heapq.heappop(heap)
            heapq.heappush(heap, (c1 + c2, tick, ("node", t1, t2)))
            tick += 1
        lengths = [0] * len(cur)
        stack = [(heap[0][2], 0)]
        max_d = 0
        while stack:
            node, d = stack.pop()
            if node[0] == "leaf":
                lengths[node[1]] = max(d, 1)
                max_d = max(max_d, d)
            else:
                stack.append((node[1], d + 1))
                stack.append((node[2], d + 1))
        if max_d <= limit:
            return lengths
        cur = [(c + 1) >> 1 if c else 0 for c in cur]


def _write_prefix_code(bw: _BitWriter, counts, alphabet_size: int):
    """Write one prefix code; returns symbol -> (code, length) for the
    data pass. Simple form for 1-2 used symbols, else the normal form
    through the code-length code with a max_symbol cap."""
    used = [s for s, c in enumerate(counts) if c]
    if not used:
        used = [0]  # decoder requires >= 1 symbol; emit an unused one
    if len(used) <= 2 and max(used) < 256:
        bw.bits(1, 1)  # simple
        bw.bits(len(used) - 1, 1)
        first_8bit = 0 if used[0] <= 1 else 1
        bw.bits(first_8bit, 1)
        bw.bits(used[0], 8 if first_8bit else 1)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.bits(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.bits(0, 1)  # normal
    lengths = _huffman_lengths(counts, 15)
    last = max(s for s, ln in enumerate(lengths) if ln)
    # code-length code over the emitted length symbols (no run ops:
    # fixture-grade streams are small; one op per slot up to `last`)
    cl_counts = [0] * _CL_ALPHABET
    for ln in lengths[: last + 1]:
        cl_counts[ln] += 1
    cl_lengths = _huffman_lengths(cl_counts, 7)
    bw.bits(_CL_ALPHABET - 4, 4)  # write all 19 slots
    for s in _CL_ORDER:
        bw.bits(cl_lengths[s], 3)
    cl_codes = _writer_codes(cl_lengths)
    # max_symbol cap: one decode op per slot we write; the field width
    # must be one of the legal 2 + 2k values (k = the 3 written bits)
    max_symbol = last + 1
    bw.bits(1, 1)
    length_nbits = 2
    while length_nbits < 16 and (max_symbol - 2) >> length_nbits:
        length_nbits += 2
    bw.bits((length_nbits - 2) // 2, 3)
    bw.bits(max_symbol - 2, length_nbits)
    for ln in lengths[: last + 1]:
        c, cl = cl_codes[ln]
        bw.code(c, cl)
    return _writer_codes(lengths)


def _encode_entropy_image(bw: _BitWriter, px, level0: bool):
    """Literal-only entropy coding of row-major ARGB pixels: no color
    cache, no meta groups, no LZ77 — one prefix group, four channel
    codes plus the (unused but mandatory) distance code."""
    bw.bits(0, 1)  # no color cache
    if level0:
        bw.bits(0, 1)  # no meta-prefix image
    g_counts = [0] * (_NUM_LITERALS + _NUM_LENGTH_CODES)
    r_counts = [0] * _NUM_LITERALS
    b_counts = [0] * _NUM_LITERALS
    a_counts = [0] * _NUM_LITERALS
    for p in px:
        g_counts[(p >> 8) & 0xFF] += 1
        r_counts[(p >> 16) & 0xFF] += 1
        b_counts[p & 0xFF] += 1
        a_counts[(p >> 24) & 0xFF] += 1
    g_codes = _write_prefix_code(bw, g_counts, _NUM_LITERALS + _NUM_LENGTH_CODES)
    r_codes = _write_prefix_code(bw, r_counts, _NUM_LITERALS)
    b_codes = _write_prefix_code(bw, b_counts, _NUM_LITERALS)
    a_codes = _write_prefix_code(bw, a_counts, _NUM_LITERALS)
    _write_prefix_code(bw, [0] * _NUM_DISTANCE_CODES, _NUM_DISTANCE_CODES)
    for p in px:
        c, ln = g_codes[(p >> 8) & 0xFF]
        bw.code(c, ln)
        c, ln = r_codes[(p >> 16) & 0xFF]
        bw.code(c, ln)
        c, ln = b_codes[p & 0xFF]
        bw.code(c, ln)
        c, ln = a_codes[(p >> 24) & 0xFF]
        bw.code(c, ln)


def _sub_pixels(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)) & 0xFF) << sh
    return out


def encode_vp8l(
    px,
    subtract_green: bool = False,
    predictor: int | None = None,
    palette: bool = False,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a lossless WebP file.

    Fixture-grade (see module docstring): literal-only entropy coding,
    but with real optional transforms so decode exercises them:

    - ``subtract_green``: forward r-=g, b-=g; header written first so
      the decoder inverts it last.
    - ``predictor``: spatial predictor transform with this single mode
      (0-13) for every block (size_bits=4); the mode sub-image is a
      real recursively-coded VP8L image.
    - ``palette``: color-indexing transform (<=256 distinct pixels
      required; sub-byte bundling kicks in at <=16 as per spec) —
      mutually exclusive with the other two for clarity.
    """
    import numpy as np

    arr = np.asarray(px, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions out of range")
    pixels = [
        0xFF000000
        | (int(arr[y, x, 0]) << 16)
        | (int(arr[y, x, 1]) << 8)
        | int(arr[y, x, 2])
        for y in range(h)
        for x in range(w)
    ]
    if palette and (subtract_green or predictor is not None):
        raise ValueError("palette is exclusive with the other transforms")
    bw = _BitWriter()
    # (the 0x2F signature byte is byte-aligned and prepended at the end)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)  # alpha hint
    bw.bits(0, 3)  # version
    coded = pixels
    coded_w = w
    if subtract_green:
        bw.bits(1, 1)
        bw.bits(2, 2)
        coded = [
            (p & 0xFF00FF00)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in coded
        ]
    if predictor is not None:
        if not 0 <= predictor <= 13:
            raise ValueError("predictor mode out of range")
        bw.bits(1, 1)
        bw.bits(0, 2)
        size_bits = 4
        bw.bits(size_bits - 2, 3)
        mw = _div_ceil(coded_w, 1 << size_bits)
        mh = _div_ceil(h, 1 << size_bits)
        # residuals use RECONSTRUCTED neighbors == originals (lossless)
        res = [0] * len(coded)
        for y in range(h):
            row = y * coded_w
            for x in range(w):
                i = row + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = coded[i - 1]
                elif x == 0:
                    pred = coded[i - coded_w]
                else:
                    tr = coded[i - coded_w + 1] if x + 1 < w else coded[row]
                    pred = _predict(
                        predictor, coded[i - 1], coded[i - coded_w],
                        coded[i - coded_w - 1], tr,
                    )
                res[i] = _sub_pixels(coded[i], pred)
        _encode_entropy_image(
            bw, [0xFF000000 | (predictor << 8)] * (mw * mh), level0=False
        )
        coded = res
    if palette:
        uniq = []
        index = {}
        for p in pixels:
            if p not in index:
                index[p] = len(uniq)
                uniq.append(p)
        if len(uniq) > 256:
            raise ValueError("palette transform needs <= 256 distinct pixels")
        bw.bits(1, 1)
        bw.bits(3, 2)
        bw.bits(len(uniq) - 1, 8)
        deltas = [uniq[0]] + [
            _sub_pixels(uniq[i], uniq[i - 1]) for i in range(1, len(uniq))
        ]
        _encode_entropy_image(bw, deltas, level0=False)
        wb = _bundle_bits(len(uniq))
        if wb == 0:
            coded = [0xFF000000 | (index[p] << 8) for p in pixels]
        else:
            per_byte = 1 << wb
            bits_pp = 8 >> wb
            coded_w = _div_ceil(w, per_byte)
            coded = [0xFF000000] * (coded_w * h)
            for y in range(h):
                for x in range(w):
                    g = index[pixels[y * w + x]] << ((x % per_byte) * bits_pp)
                    coded[y * coded_w + (x >> wb)] |= g << 8
    bw.bits(0, 1)  # no more transforms
    _encode_entropy_image(bw, coded, level0=True)
    body = b"\x2f" + bw.payload()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# animation (the extended file format: VP8X + ANIM + ANMF frames)


def _u24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def decode_webp_frames(payload: bytes, max_frames: int | None = None):
    """Decode an animated (or still) WebP into COMPOSITED frames: a list
    of ``(duration_ms, HxWx3 uint8)`` in display order — the WebP analog
    of gif.decode_gif_frames.

    Animation semantics (extended-format spec): each ANMF frame covers a
    sub-rectangle at even offsets (stored /2); its flags carry the
    blending method (bit 1: 0 = alpha-blend onto the canvas, 1 =
    overwrite) and the disposal method applied AFTER display (bit 0:
    1 = restore the frame rectangle to the ANIM background color).
    The canvas initializes to the background color; frames snapshot the
    canvas, so each returned array is what a viewer shows. Alpha
    blending uses the spec's non-premultiplied formula in integer
    arithmetic (exactly overwrite at source alpha 255 — the only case
    the in-repo encoder produces; fractional alpha is decoded but its
    rounding is a renderer-variant corner documented here).

    Frames must be lossless (VP8L); a lossy "VP8 " frame raises
    NotImplementedError — the same honest boundary as still images.
    A non-animated payload returns its single frame with duration 0.
    """
    import numpy as np

    _check_riff(payload)
    pos = 12
    canvas = None
    bg_argb = 0
    frames: list = []
    saw_anim = False
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8X":
            flags = body[0]
            cw = _u24(body, 4) + 1
            ch = _u24(body, 7) + 1
            if cw * ch > WEBP_MAX_PIXELS:
                raise ValueError(
                    f"WebP canvas {cw}x{ch} exceeds the "
                    f"{WEBP_MAX_PIXELS}-pixel decode guard"
                )
            if flags & 0x02:  # animation flag
                saw_anim = True
                canvas = np.zeros((ch, cw), dtype=np.uint32)
        elif tag == b"ANIM":
            # background color stored [B, G, R, A]
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            bg_argb = (a_ << 24) | (r_ << 16) | (g_ << 8) | b_
            if canvas is not None:
                canvas[:, :] = bg_argb
        elif tag == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF frame before VP8X animation header")
            x = 2 * _u24(body, 0)
            y = 2 * _u24(body, 3)
            fw = _u24(body, 6) + 1
            fh = _u24(body, 9) + 1
            dur = _u24(body, 12)
            flags = body[15]
            # frame data = sub-chunks; find the VP8L (skip ALPH etc.)
            fpos = 16
            sub = None
            while fpos + 8 <= len(body):
                stag = body[fpos : fpos + 4]
                (ssize,) = struct.unpack_from("<I", body, fpos + 4)
                if stag == b"VP8L":
                    sub = body[fpos + 8 : fpos + 8 + ssize]
                    break
                if stag == b"VP8 ":
                    raise NotImplementedError(
                        "lossy WebP animation frame (VP8 intra coding) is "
                        "out of scope — documented boundary with H.264"
                    )
                fpos += 8 + ssize + (ssize & 1)
            if sub is None:
                raise ValueError("ANMF frame has no VP8L payload")
            sw, sh, src = _decode_vp8l_body(sub)
            if (sw, sh) != (fw, fh):
                raise ValueError("ANMF frame size disagrees with its VP8L")
            ch, cw = canvas.shape
            if x + fw > cw or y + fh > ch:
                raise ValueError("ANMF frame rectangle outside the canvas")
            region = canvas[y : y + fh, x : x + fw]
            if flags & 0x02:  # no-blend: overwrite
                region[:, :] = src
            else:  # alpha blend (integer, non-premultiplied)
                sa = (src >> 24) & 0xFF
                opaque = sa == 255
                region[opaque] = src[opaque]
                part = ~opaque & (sa > 0)
                if part.any():
                    da = (region >> 24) & 0xFF
                    oa = sa + da * (255 - sa) // 255
                    out = np.zeros_like(region)
                    for shift in (16, 8, 0):
                        sc = (src >> shift) & 0xFF
                        dc = (region >> shift) & 0xFF
                        num = sc * sa + dc * da * (255 - sa) // 255
                        c = np.where(oa > 0, num // np.maximum(oa, 1), 0)
                        out |= (c & 0xFF) << shift
                    out |= (oa & 0xFF) << 24
                    region[part] = out[part]
            frames.append((dur, _argb_to_rgb(canvas)))
            if flags & 0x01:  # dispose to background
                region[:, :] = bg_argb
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        pos += 8 + size + (size & 1)
    if saw_anim:
        if not frames:
            raise ValueError("animated WebP with no ANMF frames")
        return frames
    # still image: one frame, duration 0
    return [(0, decode_vp8l(payload))]


def decode_webp(payload: bytes):
    """The FIRST displayed frame of any lossless WebP — still or
    animated — as (H, W, 3) uint8 (GIF-parity still API: the right
    frame for corpus feature extraction; see decode_webp_frames for
    the full animation)."""
    return decode_webp_frames(payload, max_frames=1)[0][1]


def encode_webp_anim(
    frames,
    canvas_wh: tuple[int, int],
    bg=(255, 255, 255, 255),
) -> bytes:
    """Fixture-grade animated WebP: VP8X + ANIM + one ANMF per frame.

    ``frames``: list of dicts — ``px`` (HxWx3 uint8), optional ``x``/``y``
    (even canvas offsets), ``duration_ms``, ``dispose`` (0 = leave,
    1 = restore to background), ``blend`` (False = overwrite, the
    default — matching opaque VP8L sub-frames). ``bg`` = (r, g, b, a).
    """
    def chunk(tag: bytes, body: bytes) -> bytes:
        out = tag + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    cw, ch = canvas_wh
    parts = []
    for f in frames:
        px = f["px"]
        x = f.get("x", 0)
        y = f.get("y", 0)
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even (stored /2)")
        vp8l = encode_vp8l(px)[12:]  # the VP8L chunk from the still encoder
        head = bytes([
            (x // 2) & 0xFF, ((x // 2) >> 8) & 0xFF, ((x // 2) >> 16) & 0xFF,
            (y // 2) & 0xFF, ((y // 2) >> 8) & 0xFF, ((y // 2) >> 16) & 0xFF,
            (px.shape[1] - 1) & 0xFF, ((px.shape[1] - 1) >> 8) & 0xFF,
            ((px.shape[1] - 1) >> 16) & 0xFF,
            (px.shape[0] - 1) & 0xFF, ((px.shape[0] - 1) >> 8) & 0xFF,
            ((px.shape[0] - 1) >> 16) & 0xFF,
            f.get("duration_ms", 100) & 0xFF,
            (f.get("duration_ms", 100) >> 8) & 0xFF,
            (f.get("duration_ms", 100) >> 16) & 0xFF,
            (0x02 if not f.get("blend", False) else 0x00)
            | (0x01 if f.get("dispose", 0) else 0x00),
        ])
        parts.append(chunk(b"ANMF", head + vp8l))
    r, g, b_, a = bg
    anim = chunk(b"ANIM", bytes([b_, g, r, a]) + struct.pack("<H", 0))
    vp8x_body = bytes([0x02, 0, 0, 0]) + bytes([
        (cw - 1) & 0xFF, ((cw - 1) >> 8) & 0xFF, ((cw - 1) >> 16) & 0xFF,
        (ch - 1) & 0xFF, ((ch - 1) >> 8) & 0xFF, ((ch - 1) >> 16) & 0xFF,
    ])
    body = chunk(b"VP8X", vp8x_body) + anim + b"".join(parts)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def webp_frame_sample(
    assets,
    every_ms: int = 250,
    id_col: str = "asset_id",
    payload_col: str = "payload",
):
    """Time-based frame sampling over animated WebP: for each target
    timestamp t = j*every_ms (while t < animation duration), emit the
    frame DISPLAYED at t with its integer-exact aHash — the WebP analog
    of gif.gif_frame_sample over the compositing decoder. Durations are
    native milliseconds; zero-duration frames count as 100 ms (the
    viewer convention shared with GIF's zero-delay rule). Sampling,
    timeline and schema live in multimodal.animation_frame_sample (one
    copy for both codecs).

    Output: (<id_col>, frame_ts_ms int, frame_index int,
    frame_time_ms long, ahash_bits string)."""
    from victorialogs_spark.datapipe.multimodal import (
        animation_frame_sample,
    )

    return animation_frame_sample(
        assets, decode_webp_frames, lambda d: d, every_ms, id_col,
        payload_col,
    )
