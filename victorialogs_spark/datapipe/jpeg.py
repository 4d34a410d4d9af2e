"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec with no external libs.

The round-7 review left JPEG as a documented ``NotImplementedError``
("needs PIL"); it doesn't — baseline sequential JPEG is marker walking,
Huffman coding, and an 8x8 DCT, all expressible with stdlib + numpy:

- :func:`decode_jpeg` — baseline DCT, 8-bit, non-progressive: DQT/DHT
  tables read from the stream (any valid tables), 1- or 3-component,
  sampling factors 1-2 per axis (4:4:4, 4:2:0, 4:2:2), restart markers
  (DRI/RSTn), byte unstuffing. Output HxWx3 uint8 (grey replicated).
  Progressive (SOF2), arithmetic coding, 12-bit precision raise — the
  honest boundary, mirroring the reference's ingestion scope.
- :func:`encode_jpeg` — 4:4:4 / greyscale encoder used by tests and
  deterministic synthetic payloads. Tables are WRITTEN INTO the file
  (flat-length canonical Huffman tables, Annex-K-style quant tables),
  so the decoder exercises its generic table machinery, not a shared
  constant.

Determinism note (the oracle contract): the decoder takes the DC-ONLY
fast path every real decoder takes (a block whose AC coefficients are
all zero is flat), computed in EXACT integer arithmetic —
``floor((dc*q + 4) / 8) + 128`` — so a synthetic image of flat 8x8
blocks decodes to integer-predictable pixels that an independent SQL
engine can reproduce bit-for-bit (driver_entry.py dp_image_ahash_jpeg).
The general IDCT path is float64 matrix math (deterministic for a
given BLAS, not cross-engine exact — which is why the oracle entry
uses flat blocks, like every dp_image_* entry uses integer-exact
features).
"""

from __future__ import annotations

import math
import struct

import numpy as np


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
# AC symbols at 9 bits (codes 0..161). Terrible compression, trivially
# valid — and the decoder reads them from the stream like any other.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
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


def encode_jpeg(px, restart_interval: int = 0) -> bytes:
    """Encode HxW (grey) or HxWx3 (RGB, encoded 4:4:4 YCbCr) uint8.

    ``restart_interval`` > 0 emits DRI and RSTn markers every that many
    MCUs (predictors reset) — used by tests to exercise the decoder's
    restart-segment path."""
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

    def chunk(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0 (and 1 for color), zigzag order
    for tid, q in enumerate([QUANT_LUM] + ([QUANT_CHR] if not grey else [])):
        zz = bytes(int(q.ravel()[ZIGZAG[i]]) for i in range(64))
        out += chunk(0xFFDB, bytes([tid]) + zz)
    # SOF0: 8-bit, all components sampling 1x1 (4:4:4)
    ncomp = 1 if grey else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += chunk(0xFFC0, sof)
    # DHT: flat canonical tables (class 0 = DC id 0, class 1 = AC id 0)
    for cls, syms, length in ((0, _DC_SYMS, _DC_LEN), (1, _AC_SYMS, _AC_LEN)):
        counts = [0] * 16
        counts[length - 1] = len(syms)
        out += chunk(0xFFC4, bytes([cls << 4]) + bytes(counts) + bytes(syms))
    if restart_interval:
        out += chunk(0xFFDD, struct.pack(">H", restart_interval))
    # SOS: every component uses DC table 0 / AC table 0
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += chunk(0xFFDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for c in comps:
        p = np.empty((bh * 8, bwid * 8))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]  # edge replicate
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p - 128.0)
    n_mcu = 0
    n_rst = 0
    for by in range(bh):
        for bx in range(bwid):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.restart(n_rst)
                n_rst += 1
                pred = [0] * ncomp
            n_mcu += 1
            for ci in range(ncomp):
                blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                F = _M @ blk @ _M.T
                q = np.floor(F / quants[ci] + 0.5).astype(np.int64)
                flat = q.ravel()[ZIGZAG]
                diff = int(flat[0]) - pred[ci]
                pred[ci] = int(flat[0])
                s = _category(diff)
                code, ln = _DC_CODES[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
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
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = _AC_CODES[0x00]  # EOB
                    bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes):
    """Baseline JPEG → HxWx3 uint8 (see module docstring for scope)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    dri = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 baseline
            prec = data[0]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            fh, fw = struct.unpack_from(">HH", data, 1)
            nc = data[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("progressive/extended JPEG unsupported (baseline only)")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = data[0]
            sel = []
            for i in range(ns):
                cid, tt = data[1 + 2 * i : 3 + 2 * i]
                sel.append({"id": cid, "dc": tt >> 4, "ac": tt & 15})
            scan = (sel, pos)
            break
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    sel, dpos = scan
    # split entropy-coded data into restart segments, unstuffing FF00
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

    comps = frame["comps"]
    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * maxh - 1) // (8 * maxh)
    mcuy = (frame["h"] + 8 * maxv - 1) // (8 * maxv)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    tabs = {s["id"]: s for s in sel}

    def read_sym(br: _BitReader, table) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.read_bit()
            ln += 1
            s = table.get((ln, code))
            if s is not None:
                return s
        raise ValueError("invalid Huffman code")

    seg_idx = 0
    br = _BitReader(bytes(segments[0]))
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                seg_idx += 1
                br = _BitReader(bytes(segments[seg_idx]))
                preds = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                st = tabs[c["id"]]
                dct = huff[(0, st["dc"])]
                act = huff[(1, st["ac"])]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = read_sym(br, dct)
                        diff = _extend(br.read_bits(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = read_sym(br, act)
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
                        coef = np.zeros(64, dtype=np.int64)
                        coef[ZIGZAG] = zz
                        F = coef.reshape(8, 8) * q
                        if not np.any(F.ravel()[1:]):
                            # DC-only fast path: flat block, EXACT
                            # integer arithmetic (floor((dc*q+4)/8)) —
                            # the determinism anchor for oracle twins
                            val = (int(F[0, 0]) + 4) >> 3  # floor((dc*q+4)/8)
                            blk = np.full((8, 8), float(val))
                        else:
                            blk = _M.T @ (F.astype(np.float64)) @ _M
                            blk = np.floor(blk + 0.5)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk + 128.0
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
