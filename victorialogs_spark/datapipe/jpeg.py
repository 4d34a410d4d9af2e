"""Baseline + progressive JPEG (ITU-T T.81 / ISO 10918-1) codec with no
external libs.

The round-7 review left JPEG as a documented ``NotImplementedError``
("needs PIL"); it doesn't — sequential AND progressive DCT JPEG are
marker walking, Huffman coding, and an 8x8 DCT, all expressible with
stdlib + numpy:

- :func:`decode_jpeg` — 8-bit Huffman DCT, SOF0/SOF1 (baseline /
  extended sequential) and SOF2 (progressive: spectral selection AND
  successive approximation per T.81 Annex G — DC first/refine scans, AC
  first scans with EOB runs, AC refinement scans with correction bits).
  Decoding is scan-by-scan into per-block coefficient arrays, then one
  shared dequantize + IDCT reconstruction. DQT/DHT tables read from the
  stream (tables may be redefined between scans; each scan uses the
  tables in effect at its SOS), 1- or 3-component, sampling factors 1-2
  per axis (4:4:4, 4:2:0, 4:2:2), interleaved and non-interleaved
  scans, restart markers (DRI/RSTn, resetting DC predictors and EOB
  runs), byte unstuffing. Output HxWx3 uint8 (grey replicated).
  Hierarchical / arithmetic-coded / 12-bit JPEG raise — the honest
  boundary, mirroring the reference's ingestion scope.
- :func:`encode_jpeg` — 4:4:4 / greyscale baseline encoder used by
  tests and deterministic synthetic payloads. Tables are WRITTEN INTO
  the file (flat-length canonical Huffman tables, Annex-K-style quant
  tables), so the decoder exercises its generic table machinery, not a
  shared constant.
- :func:`encode_jpeg_progressive` — SOF2 encoder over the SAME
  quantized coefficients as :func:`encode_jpeg` (identical DCT +
  quantizer), emitting a full successive-approximation scan script
  (DC Al=1 then refine; two AC spectral bands at Al=2 refined twice).
  Because the coefficients are identical, progressive and baseline
  encodings of the same pixels MUST decode identically — the
  property-test anchor for the refinement logic.

Determinism note (the oracle contract): the decoder takes the DC-ONLY
fast path every real decoder takes (a block whose AC coefficients are
all zero is flat), computed in EXACT integer arithmetic —
``floor((dc*q + 4) / 8) + 128`` — so a synthetic image of flat 8x8
blocks decodes to integer-predictable pixels that an independent SQL
engine can reproduce bit-for-bit (driver_entry.py dp_image_ahash_jpeg,
dp_image_ahash_jpeg_progressive, dp_mp4_frame_ahash). The general IDCT
path is float64 matrix math (deterministic for a given BLAS, not
cross-engine exact — which is why the oracle entries use flat blocks,
like every dp_image_* entry uses integer-exact features).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# adversarial-header decode cap shared across the in-repo codecs (same
# value as webp.WEBP_MAX_PIXELS): crawled corpora contain crafted files
# whose few-byte headers declare multi-gigapixel dimensions
JPEG_MAX_PIXELS = 1 << 26


def _zigzag() -> list[int]:
    out = []
    for s in range(15):
        ys = range(0, s + 1) if s % 2 == 1 else range(s, -1, -1)
        for y in ys:
            x = s - y
            if y < 8 and x < 8:
                out.append(y * 8 + x)
    return out


ZIGZAG = _zigzag()

# Annex K-style quant tables; q[0][0] is 17 (not K.1's 16) so that the
# DC quantization of a flat block never lands on a rounding tie
# (8*(v-128)/17 + 0.5 is never an integer — 16*k + 17 is odd), keeping
# the synthetic-payload round trip integer-exact end to end. The table
# ships in DQT, so any decoder agrees.
QUANT_LUM = np.array([
    [17, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
QUANT_CHR = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

_M = np.array([
    [(math.sqrt(0.5) if u == 0 else 1.0) / 2.0
     * math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)]
    for u in range(8)
])  # orthonormal DCT-II basis: F = M f M^T, f = M^T F M

# Flat-length canonical Huffman tables (written into DHT): 12 DC
# categories at 4 bits (codes 0..11, all-ones never assigned), all 162
# baseline AC symbols PLUS the 14 progressive EOBn symbols (EOB2..EOB15,
# rrrr=1..14 with ssss=0) at 9 bits (176 codes < 2^9, all-ones free).
# Terrible compression, trivially valid — and the decoder reads them
# from the stream like any other. The EOBn symbols append at the END so
# baseline bitstreams are byte-identical to the pre-progressive encoder.
_DC_SYMS = list(range(12))
_AC_SYMS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
    + [r << 4 for r in range(1, 15)]  # EOBn for progressive EOB runs
)
_DC_LEN, _AC_LEN = 4, 9


def _canonical_codes(symbols: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {s: (i, length) for i, s in enumerate(symbols)}


_DC_CODES = _canonical_codes(_DC_SYMS, _DC_LEN)
_AC_CODES = _canonical_codes(_AC_SYMS, _AC_LEN)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (spec F.1.2.3)
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align and emit RSTm (markers are never stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m % 8)])


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # trailing pad
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    # T.81 F.12: map the magnitude bits back to a signed value
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def _quantize_components(px):
    """Shared front half of both encoders: pad to 8x8 blocks, DCT,
    quantize. Returns (grey, h, w, bh, bwid, coefs) where coefs[ci] is
    an (bh*bwid, 64) int64 array of zigzag-ordered quantized
    coefficients, blocks in row-major (by, bx) order."""
    px = np.asarray(px, dtype=np.uint8)
    grey = px.ndim == 2
    h, w = px.shape[0], px.shape[1]
    if grey:
        comps = [px.astype(np.float64)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [np.clip(np.floor(c + 0.5), 0, 255) for c in (y, cb, cr)]
    quants = [QUANT_LUM] + ([QUANT_CHR, QUANT_CHR] if not grey else [])
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    coefs = []
    for ci, c in enumerate(comps):
        p = np.empty((bh * 8, bwid * 8))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]  # edge replicate
        p[:, w:] = p[:, w - 1 : w]
        p -= 128.0
        arr = np.empty((bh * bwid, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bwid):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                F = _M @ blk @ _M.T
                q = np.floor(F / quants[ci] + 0.5).astype(np.int64)
                arr[by * bwid + bx] = q.ravel()[ZIGZAG]
        coefs.append(arr)
    return grey, h, w, bh, bwid, coefs


def _chunk(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _headers(grey: bool, h: int, w: int, sof_marker: int,
             restart_interval: int) -> bytearray:
    """SOI + DQT + SOFn + DHT (+ DRI) — shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    for tid, q in enumerate([QUANT_LUM] + ([QUANT_CHR] if not grey else [])):
        zz = bytes(int(q.ravel()[ZIGZAG[i]]) for i in range(64))
        out += _chunk(0xFFDB, bytes([tid]) + zz)
    ncomp = 1 if grey else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _chunk(sof_marker, sof)
    for cls, syms, length in ((0, _DC_SYMS, _DC_LEN), (1, _AC_SYMS, _AC_LEN)):
        counts = [0] * 16
        counts[length - 1] = len(syms)
        out += _chunk(0xFFC4, bytes([cls << 4]) + bytes(counts) + bytes(syms))
    if restart_interval:
        out += _chunk(0xFFDD, struct.pack(">H", restart_interval))
    return out


def _write_signed(bw: _BitWriter, v: int, size: int) -> None:
    """Magnitude bits for a signed value of known category (T.81 F.12
    inverse): negatives code as v + 2^size - 1."""
    bw.write(v if v >= 0 else v + (1 << size) - 1, size)


def encode_jpeg(px, restart_interval: int = 0) -> bytes:
    """Encode HxW (grey) or HxWx3 (RGB, encoded 4:4:4 YCbCr) uint8 as
    BASELINE sequential (SOF0).

    ``restart_interval`` > 0 emits DRI and RSTn markers every that many
    MCUs (predictors reset) — used by tests to exercise the decoder's
    restart-segment path."""
    grey, h, w, bh, bwid, coefs = _quantize_components(px)
    ncomp = len(coefs)
    out = _headers(grey, h, w, 0xFFC0, restart_interval)
    # SOS: every component uses DC table 0 / AC table 0
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _chunk(0xFFDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    n_mcu = 0
    n_rst = 0
    for bi in range(bh * bwid):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            bw.restart(n_rst)
            n_rst += 1
            pred = [0] * ncomp
        n_mcu += 1
        for ci in range(ncomp):
            flat = coefs[ci][bi]
            diff = int(flat[0]) - pred[ci]
            pred[ci] = int(flat[0])
            s = _category(diff)
            code, ln = _DC_CODES[s]
            bw.write(code, ln)
            if s:
                _write_signed(bw, diff, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if flat[i]), default=0)
            for i in range(1, last_nz + 1):
                v = int(flat[i])
                if v == 0:
                    run += 1
                    if run == 16:
                        c16, l16 = _AC_CODES[0xF0]
                        bw.write(c16, l16)
                        run = 0
                    continue
                s = _category(v)
                code, ln = _AC_CODES[(run << 4) | s]
                bw.write(code, ln)
                _write_signed(bw, v, s)
                run = 0
            if last_nz < 63:
                code, ln = _AC_CODES[0x00]  # EOB
                bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _ProgState:
    """Per-scan AC entropy state: pending EOB run + buffered correction
    bits (T.81 G.1.2.2-3 / the libjpeg-style deferral: the EOBn symbol
    can only be sized once the run ends, so correction bits for blocks
    inside the run buffer until the flush)."""

    __slots__ = ("eobrun", "bits")

    def __init__(self):
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self, bw: _BitWriter) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, ln = _AC_CODES[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            bw.write(b, 1)
        self.bits = []


def _enc_ac_first(bw: _BitWriter, flat, ss: int, se: int, al: int,
                  st: _ProgState) -> None:
    """One block of an AC 'first' scan (Ah=0): point-transformed band
    values, EOB runs deferred via st (T.81 G.1.2.2)."""
    tv = []
    for k in range(ss, se + 1):
        v = int(flat[k])
        t = (abs(v) >> al)
        tv.append(t if v >= 0 else -t)
    last = -1
    for i, t in enumerate(tv):
        if t:
            last = i
    if last < 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush(bw)
        return
    st.flush(bw)
    run = 0
    for i in range(last + 1):
        t = tv[i]
        if t == 0:
            run += 1
            if run == 16:
                c16, l16 = _AC_CODES[0xF0]
                bw.write(c16, l16)
                run = 0
            continue
        s = _category(t)
        code, ln = _AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        _write_signed(bw, t, s)
        run = 0
    if last < len(tv) - 1:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush(bw)


def _enc_ac_refine(bw: _BitWriter, flat, ss: int, se: int, al: int,
                   st: _ProgState) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly-nonzero
    coefficients code as (run<<4)|1 + sign bit; history-nonzero
    coefficients contribute one correction bit each, buffered across the
    pending EOB run (T.81 G.1.2.3)."""
    absv = []
    for k in range(ss, se + 1):
        absv.append(abs(int(flat[k])) >> al)
    eob_idx = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_idx = i
    # st.bits holds bits attached to the PENDING EOB RUN (emitted right
    # after the EOBn symbol); cur holds THIS block's correction bits so
    # far (emitted after the next coded symbol + sign bit). Mixing them
    # in one buffer would put this block's bits before its own symbol —
    # the decoder reads [symbol][sign][this block's history bits].
    cur: list[int] = []
    r = 0
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_idx:
            st.flush(bw)  # EOBn + run-attached bits
            c16, l16 = _AC_CODES[0xF0]
            bw.write(c16, l16)
            r -= 16
            for b in cur:
                bw.write(b, 1)
            cur = []
        if t > 1:  # history-nonzero: one correction bit
            cur.append(t & 1)
            continue
        # t == 1: newly nonzero at this precision
        st.flush(bw)
        code, ln = _AC_CODES[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(flat[ss + i]) >= 0 else 0, 1)
        for b in cur:
            bw.write(b, 1)
        cur = []
        r = 0
    if r > 0 or cur:
        st.eobrun += 1
        st.bits.extend(cur)  # leftover bits join the EOB-run buffer
        if st.eobrun == 0x7FFF or len(st.bits) > 937:
            st.flush(bw)


def encode_jpeg_progressive(px, restart_interval: int = 0,
                            scan_script=None) -> bytes:
    """Encode as PROGRESSIVE (SOF2) from the SAME quantized coefficients
    as :func:`encode_jpeg` — so baseline and progressive encodings of
    the same pixels decode identically (the round-trip test anchor).

    Default scan script exercises both progressive dimensions:
    spectral selection (bands 1-5 and 6-63 coded separately) AND
    successive approximation (DC coded at Al=1 then bit-refined; each
    AC band coded at Al=2 then refined twice down to full precision).
    ``scan_script`` overrides: a list of (comp_indices, Ss, Se, Ah, Al).
    """
    grey, h, w, bh, bwid, coefs = _quantize_components(px)
    ncomp = len(coefs)
    out = _headers(grey, h, w, 0xFFC2, restart_interval)
    if scan_script is None:
        all_c = list(range(ncomp))
        scan_script = [(all_c, 0, 0, 0, 1), (all_c, 0, 0, 1, 0)]
        for lo, hi in ((1, 5), (6, 63)):
            scan_script += [([ci], lo, hi, 0, 2) for ci in range(ncomp)]
        for ah, al in ((2, 1), (1, 0)):
            for lo, hi in ((1, 5), (6, 63)):
                scan_script += [([ci], lo, hi, ah, al) for ci in range(ncomp)]

    for comp_idx, ss, se, ah, al in scan_script:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _chunk(0xFFDA, sos)
        bw = _BitWriter()
        st = _ProgState()
        pred = {ci: 0 for ci in comp_idx}
        n_unit = 0
        n_rst = 0
        # 4:4:4 only: every component's block grid is the full grid, so
        # interleaved MCU order and non-interleaved block order coincide
        for bi in range(bh * bwid):
            if restart_interval and n_unit and n_unit % restart_interval == 0:
                st.flush(bw)
                bw.restart(n_rst)
                n_rst += 1
                pred = {ci: 0 for ci in comp_idx}
            n_unit += 1
            for ci in comp_idx:
                flat = coefs[ci][bi]
                if ss == 0:  # DC scan
                    if ah == 0:
                        dc = int(flat[0]) >> al  # arithmetic shift (A.4)
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = _category(diff)
                        code, ln = _DC_CODES[s]
                        bw.write(code, ln)
                        if s:
                            _write_signed(bw, diff, s)
                    else:
                        bw.write((int(flat[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(bw, flat, ss, se, al, st)
                else:
                    _enc_ac_refine(bw, flat, ss, se, al, st)
        st.flush(bw)
        out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------


def _entropy_segments(payload: bytes, dpos: int):
    """Split one scan's entropy-coded data into restart segments,
    unstuffing FF00. Returns (segments, pos_of_terminating_marker)."""
    segments: list[bytearray] = [bytearray()]
    i = dpos
    while i < len(payload):
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                segments[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytearray())
                i += 2
                continue
            break  # any other marker ends the scan
        segments[-1].append(b)
        i += 1
    return [bytes(s) for s in segments], i


def _read_sym(br: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        s = table.get((ln, code))
        if s is not None:
            return s
    raise ValueError("invalid Huffman code")


def _dec_block_seq(br, zz, dct, act, preds, ci) -> None:
    """Sequential full-band block (baseline path, unchanged semantics)."""
    s = _read_sym(br, dct)
    diff = _extend(br.read_bits(s), s)
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _read_sym(br, act)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        if k > 63:
            raise ValueError("AC index overflow")
        size = rs & 15
        zz[k] = _extend(br.read_bits(size), size)
        k += 1


def _dec_ac_first(br, zz, act, ss, se, al, eob) -> None:
    """AC 'first' scan block (T.81 G.2): EOB runs span blocks."""
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_sym(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn: run of 2^r (+ extra) all-done blocks
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += br.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _dec_ac_refine(br, zz, act, ss, se, al, eob) -> None:
    """AC refinement scan block (T.81 G.2 / the standard correction-bit
    walk): newly-nonzero coefficients arrive as ±1<<Al; every coefficient
    with nonzero history contributes one correction bit, including those
    inside an EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = _read_sym(br, act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:  # EOBn
                    eob[0] = 1 << r
                    if r:
                        eob[0] += br.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                val = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if br.read_bit():
                        if (int(zz[k]) & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = val
            k += 1
    if eob[0] > 0:
        while k <= se:
            if zz[k] != 0:
                if br.read_bit():
                    if (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eob[0] -= 1


def decode_jpeg(payload: bytes):
    """Sequential or progressive JPEG → HxWx3 uint8 (see module
    docstring for scope)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    dri = 0
    scans: list[dict] = []
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly multiple tables)
            o = 0
            while o < len(data):
                pq, tq = data[o] >> 4, data[o] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                for i in range(64):
                    t[ZIGZAG[i]] = data[o + 1 + i]
                quant[tq] = t.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            o = 0
            while o < len(data):
                tc, th = data[o] >> 4, data[o] & 15
                counts = data[o + 1 : o + 17]
                syms = data[o + 17 : o + 17 + sum(counts)]
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for ln in range(1, 17):
                    for _ in range(counts[ln - 1]):
                        table[(ln, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                o += 17 + sum(counts)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 seq, SOF2 prog
            progressive = marker == 0xC2
            prec = data[0]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            fh, fw = struct.unpack_from(">HH", data, 1)
            if fh * fw > JPEG_MAX_PIXELS:
                # adversarial-header guard: a few-byte SOF can declare
                # 65535x65535 and drive multi-GB MCU allocations (same
                # cap as webp.WEBP_MAX_PIXELS, r15 review)
                raise ValueError(
                    f"JPEG dimensions {fw}x{fh} exceed the "
                    f"{JPEG_MAX_PIXELS}-pixel decode cap"
                )
            nc = data[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "hierarchical/arithmetic-coded JPEG unsupported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            sel = []
            for i in range(ns):
                cid, tt = data[1 + 2 * i : 3 + 2 * i]
                sel.append({"id": cid, "dc": tt >> 4, "ac": tt & 15})
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            segments, pos = _entropy_segments(payload, pos)
            scans.append({
                "sel": sel, "ss": ss, "se": se,
                "ah": ahal >> 4, "al": ahal & 15,
                "dri": dri,
                "segments": segments,
                # shallow snapshot: DHT builds NEW table dicts, so later
                # redefinitions can't mutate an earlier scan's tables
                "huff": dict(huff),
            })
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * maxh - 1) // (8 * maxh)
    mcuy = (frame["h"] + 8 * maxv - 1) // (8 * maxv)
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    for c in comps:
        # interleaved (MCU-padded) grid — the allocation size — and the
        # non-interleaved grid a single-component scan walks (A.2.2)
        c["mbx"], c["mby"] = mcux * c["h"], mcuy * c["v"]
        cw = -(-(frame["w"] * c["h"]) // maxh)
        chh = -(-(frame["h"] * c["v"]) // maxv)
        c["nbx"], c["nby"] = (cw + 7) // 8, (chh + 7) // 8
    coefs = [
        np.zeros((c["mby"], c["mbx"], 64), dtype=np.int64) for c in comps
    ]

    for scan in scans:
        sel = scan["sel"]
        sh = scan["huff"]
        segments = scan["segments"]
        sdri = scan["dri"]
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        interleaved = len(sel) > 1
        br = _BitReader(segments[0] if segments else b"")
        seg_idx = 0
        preds = {by_id[s_["id"]]: 0 for s_ in sel}
        eob = [0]
        if interleaved:
            n_units = mcux * mcuy
        else:
            c0 = comps[by_id[sel[0]["id"]]]
            n_units = c0["nby"] * c0["nbx"]
        n = 0
        for u in range(n_units):
            if sdri and n and n % sdri == 0:
                seg_idx += 1
                br = _BitReader(segments[seg_idx])
                for key in preds:
                    preds[key] = 0
                eob[0] = 0
            n += 1
            if interleaved:
                my, mx = divmod(u, mcux)
                blocks = []
                for s_ in sel:
                    ci = by_id[s_["id"]]
                    c = comps[ci]
                    for byy in range(c["v"]):
                        for bxx in range(c["h"]):
                            blocks.append(
                                (s_, ci,
                                 coefs[ci][my * c["v"] + byy,
                                           mx * c["h"] + bxx])
                            )
            else:
                s_ = sel[0]
                ci = by_id[s_["id"]]
                c = comps[ci]
                byy, bxx = divmod(u, c["nbx"])
                blocks = [(s_, ci, coefs[ci][byy, bxx])]
            for s_, ci, zz in blocks:
                if not progressive:
                    _dec_block_seq(
                        br, zz, sh[(0, s_["dc"])], sh[(1, s_["ac"])],
                        preds, ci,
                    )
                elif ss == 0:  # DC scan
                    if ah == 0:
                        sym = _read_sym(br, sh[(0, s_["dc"])])
                        diff = _extend(br.read_bits(sym), sym)
                        preds[ci] += diff
                        zz[0] = preds[ci] << al
                    else:
                        if br.read_bit():
                            zz[0] |= 1 << al
                elif ah == 0:
                    _dec_ac_first(br, zz, sh[(1, s_["ac"])], ss, se, al, eob)
                else:
                    _dec_ac_refine(br, zz, sh[(1, s_["ac"])], ss, se, al, eob)

    # shared reconstruction: dequantize + IDCT each block
    planes = []
    for ci, c in enumerate(comps):
        q = quant[c["tq"]]
        plane = np.zeros((c["mby"] * 8, c["mbx"] * 8), dtype=np.float64)
        arr = coefs[ci]
        for byy in range(c["mby"]):
            for bxx in range(c["mbx"]):
                coef = np.zeros(64, dtype=np.int64)
                coef[ZIGZAG] = arr[byy, bxx]
                F = coef.reshape(8, 8) * q
                if not np.any(F.ravel()[1:]):
                    # DC-only fast path: flat block, EXACT integer
                    # arithmetic (floor((dc*q+4)/8)) — the determinism
                    # anchor for oracle twins
                    val = (int(F[0, 0]) + 4) >> 3
                    blk = np.full((8, 8), float(val))
                else:
                    blk = _M.T @ (F.astype(np.float64)) @ _M
                    blk = np.floor(blk + 0.5)
                plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = (
                    blk + 128.0
                )
        planes.append(plane)
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(p, maxv // c["v"], axis=0)
        p = np.repeat(p, maxh // c["h"], axis=1)
        full.append(p[: frame["h"], : frame["w"]])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
