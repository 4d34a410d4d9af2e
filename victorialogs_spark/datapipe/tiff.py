"""Baseline TIFF decode/encode with zero external dependencies.

TIFF (Adobe/Aldus TIFF 6.0 spec, public since 1992) is the most common
remaining web/archive-corpus image container that needs no external
libraries: the baseline profile is IFD (tag directory) walking plus
strip-based pixel data compressed with nothing, PackBits (RLE), or LZW.
The LZW here is the TIFF variant of the algorithm whose GIF flavor
lives in gif.py (`gif._lzw_decode`): same dictionary algorithm, but
codes are packed MSB-first, the root table is fixed at 256 entries
(Clear=256, EOI=257), every strip must BEGIN with a Clear code, and
code width grows one code EARLY (the spec's "early change": at table
size 2^width - 1, i.e. 511/1023/2047 — one sooner than GIF's
2^width, matching libtiff/tifffile;
tests/test_codec_interop.py::test_tiff_lzw_early_change_boundary
pins the 9→10 and 10→11 crossings against an independent packer).

Parity note: the reference engine treats media payloads as opaque
bytes; this module exists for the data-pipeline side (corpus curation
over crawled/scanned images), same honesty tier as jpeg.py/gif.py — a
REAL decoder, not a stub, validated against an in-repo encoder plus
hand-assembled interop fixtures (tests/test_codec_interop.py) whose
PackBits runs and LZW codes are packed by hand in comments.

Scope (baseline TIFF 6.0, the overwhelmingly common archival shape):
- both byte orders ("II" little-endian, "MM" big-endian),
- SamplesPerPixel 1 (grayscale, PhotometricInterpretation 0 WhiteIsZero
  — inverted — or 1 BlackIsZero) at BitsPerSample 1/4/8/16 (the bilevel
  and deep scanned-archive shapes), SamplesPerPixel 3 (RGB,
  photometric 2) at BitsPerSample 8/16,
- Compression 1 (none), 5 (LZW), 32773 (PackBits),
- Predictor 1 (none) and 2 (horizontal differencing, the usual LZW
  pairing; 8-bit samples only — see the loud guard in _decode_ifd),
- multi-strip files (RowsPerStrip < ImageLength).
Out of scope (documented, loud ValueError): tiles, JPEG-in-TIFF,
CCITT fax codings, planar configuration 2, palette TIFF (photometric
3), sub-byte RGB. Those are rare in crawled corpora and each is a
self-contained extension of this module's strip loop.
"""

from __future__ import annotations

import struct

# adversarial-header decode cap shared across the in-repo codecs (same
# value as webp.WEBP_MAX_PIXELS); TIFF dims are u32, so an 11-byte IFD
# can declare a 4-gigapixel-squared image
TIFF_MAX_PIXELS = 1 << 26

# tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317

# field type -> (struct char, byte size); types we read (spec §2)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}

_CLEAR = 256
_EOI = 257


def _lzw_decode_tiff(data: bytes, n_bytes: int) -> bytes:
    """Decompress a TIFF-variant LZW stream into exactly ``n_bytes``.

    The dictionary algorithm (roots, KwKwK, freeze-at-cap) mirrors
    gif._lzw_decode; the differences are the TIFF 6.0 §13 framing:
    MSB-first bit packing, fixed 8-bit roots (Clear=256, EOI=257,
    first string code 258), a REQUIRED leading Clear code, and early
    change — width grows when the next code to assign is 2^width - 1.
    """
    base = [bytes((i,)) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = 0  # bit accumulator, MSB-first
    nbits = 0
    pos = 0
    first = True
    while len(out) < n_bytes:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if first:
            # §13: "each strip begins with a ClearCode"
            if code != _CLEAR:
                raise ValueError("TIFF LZW strip does not start with Clear")
            first = False
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _EOI:
            if len(out) < n_bytes:
                raise ValueError("TIFF LZW stream ended early")
            break
        if prev is None:
            if code >= _CLEAR:
                raise ValueError("TIFF LZW: non-root code after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("TIFF LZW: code beyond table")
        out += entry
        prev = entry
        # EARLY change: widen when the table size reaches
        # 2^width - 1 (511/1023/2047), one earlier than the GIF rule
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:n_bytes])


def _lzw_encode_tiff(raw: bytes) -> bytes:
    """Compress bytes into a TIFF-variant LZW stream (MSB-first,
    leading Clear, early change, Clear re-emitted when the table hits
    4094 entries — the TIFF 6.0 §13 encoder loop, mirroring
    gif._lzw_encode's structure)."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    prev = b""
    for b in raw:
        cur = prev + bytes((b,))
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # early change, encoder side: the decoder's table lags the
        # encoder's by exactly one entry (it derives entry k while
        # processing code k+1), so when the decoder widens at ITS table
        # size 2^width - 1 the encoder's next_code is 2^width — widen
        # here so the next emitted code matches the decoder's width
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            # §13: emit Clear when the 4094th entry is made
            emit(_CLEAR)
            table = {bytes((i,)): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes((b,))
    if prev:
        emit(table[prev])
    emit(_EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)  # pad with zero bits
    return bytes(out)


def _packbits_decode(data: bytes, n_bytes: int) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): header byte n — 0..127 means copy
    n+1 literals, -1..-127 (two's complement) means repeat the next
    byte 1-n times, -128 is a no-op."""
    out = bytearray()
    pos = 0
    while len(out) < n_bytes:
        if pos >= len(data):
            raise ValueError("TIFF PackBits stream truncated")
        n = data[pos]
        pos += 1
        if n < 128:
            lit = data[pos : pos + n + 1]
            if len(lit) != n + 1:
                raise ValueError("TIFF PackBits literal run truncated")
            out += lit
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("TIFF PackBits repeat run truncated")
            out += bytes((data[pos],)) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) != n_bytes:
        raise ValueError("TIFF PackBits run overshoots the strip")
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    """PackBits encoder (repeat runs >= 3 bytes, literals otherwise —
    the canonical greedy scheme from the spec's pseudocode)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        # measure the repeat run at i
        j = i + 1
        while j < n and j - i < 128 and raw[j] == raw[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(raw[i])
            i = j
            continue
        # literal run: until the next >=3 repeat or 128 bytes
        start = i
        i = j
        while i < n and i - start < 128:
            j = i + 1
            while j < n and j - i < 128 and raw[j] == raw[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
        i = min(i, start + 128)
        out.append(i - start - 1)
        out += raw[start:i]
    return bytes(out)


def _read_ifd_value(fmt_end: str, ftype: int, count: int, raw: bytes,
                    payload: bytes) -> tuple:
    """An IFD entry's value: inline when it fits in the 4-byte slot,
    else ``raw`` is an offset into the file (spec §2)."""
    if ftype not in _TYPES:
        return ()
    ch, sz = _TYPES[ftype]
    total = sz * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(fmt_end + "I", raw)
        buf = payload[off : off + total]
        if len(buf) < total:
            raise ValueError("TIFF IFD value beyond file end")
    return struct.unpack(f"{fmt_end}{count}{ch}", buf)


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF into an HxWx3 uint8 array (grayscale is
    broadcast to 3 channels so every caller sees one shape — the same
    contract as decode_gif/decode_jpeg)."""
    import numpy as np

    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset beyond file end")
    (n_entries,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, tuple] = {}
    for k in range(n_entries):
        ent = payload[ifd_off + 2 + 12 * k : ifd_off + 2 + 12 * (k + 1)]
        if len(ent) < 12:
            raise ValueError("TIFF IFD truncated")
        tag, ftype, count = struct.unpack(e + "HHI", ent[:8])
        tags[tag] = _read_ifd_value(e, ftype, count, ent[8:12], payload)

    def one(tag: int, default=None) -> int:
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return int(v[0])

    w = one(_T_WIDTH)
    h = one(_T_LENGTH)
    if w * h > TIFF_MAX_PIXELS:
        raise ValueError(
            f"TIFF dimensions {w}x{h} exceed the "
            f"{TIFF_MAX_PIXELS}-pixel decode cap"
        )
    spp = one(_T_SPP, 1)
    comp = one(_T_COMPRESSION, 1)
    photo = one(_T_PHOTOMETRIC)
    predictor = one(_T_PREDICTOR, 1)
    planar = one(_T_PLANAR, 1)
    bits = tags.get(_T_BITS, (8,) * spp)
    if spp not in (1, 3):
        raise ValueError(f"unsupported TIFF SamplesPerPixel {spp}")
    if len(bits) != spp or len(set(bits)) != 1:
        raise ValueError(f"unsupported TIFF BitsPerSample {bits}")
    depth = int(bits[0])
    if depth not in (1, 4, 8, 16) or (depth in (1, 4) and spp != 1):
        # 1/4-bit are the bilevel/grayscale scanned-archive shapes
        # (sub-byte RGB does not exist in baseline TIFF)
        raise ValueError(f"unsupported TIFF BitsPerSample {bits}")
    if planar != 1:
        raise ValueError("unsupported TIFF planar configuration 2")
    if comp not in (1, 5, 32773):
        raise ValueError(
            f"unsupported TIFF compression {comp} (baseline: none/LZW/"
            "PackBits; tiles, JPEG-in-TIFF and CCITT are out of scope)"
        )
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if predictor == 2 and depth != 8:
        # spec allows it, but differencing sub-byte/16-bit samples is
        # vanishingly rare in the wild; fail loud rather than decode
        # wrong (plug-in point: difference in sample space post-unpack)
        raise ValueError("TIFF predictor 2 supported for 8-bit samples only")
    rps = one(_T_ROWS_PER_STRIP, h)
    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing/mismatched strip tags")
    n_strips = (h + rps - 1) // rps
    if len(offsets) != n_strips:
        raise ValueError("TIFF strip count disagrees with RowsPerStrip")
    # rows pack to a byte boundary per ROW (spec §3 "the data within a
    # row is packed; rows begin on byte boundaries")
    stride = (w * spp * depth + 7) // 8
    rows = bytearray()
    for s in range(n_strips):
        strip_rows = min(rps, h - s * rps)
        want = strip_rows * stride
        data = payload[offsets[s] : offsets[s] + counts[s]]
        if len(data) < counts[s]:
            raise ValueError("TIFF strip beyond file end")
        if comp == 1:
            if len(data) < want:
                raise ValueError("TIFF uncompressed strip short")
            raw = data[:want]
        elif comp == 5:
            raw = _lzw_decode_tiff(data, want)
        else:
            raw = _packbits_decode(data, want)
        rows += raw
    buf = np.frombuffer(bytes(rows), np.uint8)
    if depth == 8:
        px = buf.reshape(h, w, spp)
    elif depth == 16:
        # high byte, honoring the file's byte order (the PNG16 rule:
        # a uint8 pipeline keeps the most significant 8 bits)
        pairs = buf.reshape(h, w * spp, 2)
        px = pairs[:, :, 0 if e == ">" else 1].reshape(h, w, spp)
    else:
        # sub-byte: unpack bits per row, MSB-first within each byte
        # (FillOrder=1 default), drop the row-padding bits, scale to the
        # 8-bit range (x17 for 4-bit, x255 for 1-bit — exact: the max
        # sample maps to 255)
        rowbits = np.unpackbits(buf.reshape(h, stride), axis=1)
        if depth == 1:
            samples = rowbits[:, :w]
            px = (samples * np.uint8(255)).astype(np.uint8)
        else:
            nib = rowbits.reshape(h, stride * 2, 4)
            samples = (
                nib[:, :, 0] * 8 + nib[:, :, 1] * 4
                + nib[:, :, 2] * 2 + nib[:, :, 3]
            )[:, :w]
            px = (samples * np.uint8(17)).astype(np.uint8)
        px = px.reshape(h, w, 1)
    if predictor == 2:
        # horizontal differencing is applied per row per sample plane;
        # undo with a cumulative sum along the row (mod 256)
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    if photo == 0:
        px = 255 - px  # WhiteIsZero
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return px


def encode_tiff(px, compression: int = 1, byte_order: str = "II",
                rows_per_strip: int | None = None,
                predictor: int = 1, photometric: int | None = None,
                bit_depth: int = 8) -> bytes:
    """Minimal baseline-TIFF encoder for tests and deterministic
    synthetic fixtures (the in-repo validation half; the independent
    half is the hand-packed fixtures in tests/test_codec_interop.py).
    ``px`` is HxW (grayscale) or HxWx3 uint8. ``bit_depth``: 8 (default),
    16 (each 8-bit sample widens to (v<<8)|v so the decoder's high-byte
    rule recovers v exactly), or 1/4 (grayscale only; samples must
    already be in range — 0/1 or 0..15)."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError("encode_tiff: 1 or 3 samples per pixel")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5 or 32773")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    if bit_depth not in (1, 4, 8, 16) or (bit_depth in (1, 4) and spp != 1):
        raise ValueError(f"unsupported bit_depth {bit_depth}")
    if predictor == 2 and bit_depth != 8:
        raise ValueError("predictor 2 only with 8-bit samples")
    if predictor == 2:
        # horizontal differencing per row per sample plane (mod 256)
        d = px.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        px = (d % 256).astype(np.uint8)
    if photometric is None:
        photometric = 2 if spp == 3 else 1
    e = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or h

    def pack_rows(block) -> bytes:
        if bit_depth == 8:
            return block.tobytes()
        if bit_depth == 16:
            wide = block.astype(np.uint16)
            wide = (wide << 8) | wide
            return wide.astype(e + "u2").tobytes()
        # sub-byte: per-row MSB-first bit packing with byte padding
        bh = block.shape[0]
        flat = block.reshape(bh, w)
        if bit_depth == 1:
            bits = flat.astype(np.uint8).reshape(bh, w, 1)
        else:
            bits = np.stack(
                [(flat >> 3) & 1, (flat >> 2) & 1,
                 (flat >> 1) & 1, flat & 1], axis=2,
            ).astype(np.uint8)
        rowbits = bits.reshape(bh, w * bit_depth)
        pad = (-rowbits.shape[1]) % 8
        if pad:
            rowbits = np.pad(rowbits, ((0, 0), (0, pad)))
        return np.packbits(rowbits, axis=1).tobytes()

    strips = []
    for top in range(0, h, rps):
        raw = pack_rows(px[top : top + rps])
        if compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)

    # layout: header(8) | strip data | IFD | out-of-line values
    out = bytearray()
    out += (b"II*\x00" if byte_order == "II" else b"MM\x00*")
    strip_offsets = []
    data_start = 8
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    ifd_off = pos
    out += struct.pack(e + "I", ifd_off)
    for s in strips:
        out += s

    entries = []  # (tag, ftype, count, packed-4-byte-or-offset-marker)
    extra = bytearray()  # out-of-line values, appended after the IFD

    def add(tag: int, ftype: int, values: tuple) -> None:
        ch, sz = _TYPES[ftype]
        total = sz * len(values)
        if total <= 4:
            raw = struct.pack(f"{e}{len(values)}{ch}", *values)
            raw += b"\x00" * (4 - total)
            entries.append((tag, ftype, len(values), raw))
        else:
            entries.append((tag, ftype, len(values), len(extra)))
            extra.extend(struct.pack(f"{e}{len(values)}{ch}", *values))

    add(_T_WIDTH, 4, (w,))
    add(_T_LENGTH, 4, (h,))
    add(_T_BITS, 3, (bit_depth,) * spp)
    add(_T_COMPRESSION, 3, (compression,))
    add(_T_PHOTOMETRIC, 3, (photometric,))
    add(_T_STRIP_OFFSETS, 4, tuple(strip_offsets))
    add(_T_SPP, 3, (spp,))
    add(_T_ROWS_PER_STRIP, 4, (rps,))
    add(_T_STRIP_COUNTS, 4, tuple(len(s) for s in strips))
    if predictor == 2:
        add(_T_PREDICTOR, 3, (2,))
    entries.sort()  # spec: IFD entries in ascending tag order

    ifd = bytearray(struct.pack(e + "H", len(entries)))
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    for tag, ftype, count, val in entries:
        ifd += struct.pack(e + "HHI", tag, ftype, count)
        if isinstance(val, bytes):
            ifd += val
        else:
            ifd += struct.pack(e + "I", extra_base + val)
    ifd += struct.pack(e + "I", 0)  # next-IFD pointer: none
    out += ifd
    out += extra
    return bytes(out)
