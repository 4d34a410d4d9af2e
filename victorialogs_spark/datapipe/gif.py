"""GIF decode/encode with zero external dependencies.

GIF is the last common web-corpus image container that needs no
external libraries: its only compression is LZW (variable-width,
LSB-first bit packing, 12-bit cap — CompuServe GIF89a spec, public
since 1990; the Unisys LZW patents expired in 2004). Everything else
is fixed-layout byte parsing: header, logical screen descriptor,
global/local color tables, 89a extension blocks, the 4-pass row
interlace.

Parity note: the reference engine treats media payloads as opaque
bytes; this module exists for the data-pipeline side (corpus curation
over crawled images), same honesty tier as jpeg.py/mp4.py — a REAL
decoder, not a stub, validated against an in-repo encoder plus
hand-assembled interop fixtures (tests/test_codec_interop.py) whose
LZW codes are packed by hand in comments.

Scope: still images (the first image descriptor). Animation frames
after the first would need Graphic Control disposal compositing;
callers sampling animated GIFs get frame 0, which is what corpus
feature extraction wants. Decoder handles 87a and 89a, global and
local color tables, interlaced and sequential, all code sizes 2-8,
deferred clear codes, and early stream termination via EOI.
"""

from __future__ import annotations

import struct

_GIF_SIGS = (b"GIF87a", b"GIF89a")

# Interlace pass layout (GIF89a spec, appendix E): starting row / step
# per pass — every 8th row from 0, every 8th from 4, every 4th from 2,
# every 2nd from 1.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Decompress a GIF LZW code stream into exactly ``n_pixels`` index
    bytes. Codes are packed LSB-first; width starts at min_code_size+1
    and grows when the dictionary fills the current width, capping at
    12 bits (after which the encoder must emit a clear code or keep
    using the frozen dictionary — both legal, both handled)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary as a list of byte strings; entries 0..clear-1 are the
    # single-index roots (clear/eoi slots are placeholders)
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0  # bit accumulator, LSB-first
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                # the outer loop guarantees pixels are still owed here
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            # first code after (implicit) clear must be a root
            if code >= clear:
                raise ValueError("GIF LZW: non-root code after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                # freeze at 4096 like every encoder does ("deferred
                # clear": past the cap, codes reference the frozen
                # dictionary until a clear code arrives)
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            # the KwKwK case: code not yet in the table
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code beyond table")
        out += entry
        prev = entry
        # widen when the NEXT code to be assigned no longer fits
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Compress index bytes into a GIF LZW code stream (LSB-first
    variable width, clear emitted first, dictionary reset at 4096 —
    the canonical encoder loop every GIF writer implements)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev = b""
    for b in indices:
        cur = prev + bytes((b,))
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # widen AFTER assigning: the decoder mirrors this exactly
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes((b,))
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows, h: int):
    """Reorder interlaced scanline storage order into display order."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    display = [None] * h
    for stored, row_idx in enumerate(order):
        display[row_idx] = rows[stored]
    return display


def decode_gif(payload: bytes):
    """Decode the first image of a GIF87a/89a file → HxWx3 uint8.

    Walks: header, logical screen descriptor (+ global color table),
    89a extension blocks (skipped by their sub-block structure), the
    first image descriptor (+ local color table, which overrides the
    global one per spec), then LZW-decompresses the index stream and
    resolves indexes through the active color table, de-interlacing
    if the descriptor says so."""
    import numpy as np

    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    _, _, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
        if len(gct) < 3 * n:
            raise ValueError("GIF global color table truncated")
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = payload[pos : pos + 3 * n]
            pos += 3 * n
            if len(table) < 3 * n:
                raise ValueError("GIF local color table truncated")
        if table is None:
            raise ValueError("GIF image has no color table")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad GIF LZW code size {min_code_size}")
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        data = b"".join(chunks)
        idx = np.frombuffer(
            _lzw_decode(data, min_code_size, w * h), np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = np.array(_deinterlace(list(idx), h), dtype=np.uint8)
        pal = np.frombuffer(table, np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF index beyond color table")
        return pal[idx]
    raise ValueError("GIF truncated before image data")


def encode_gif(
    indices,
    palette,
    interlace: bool = False,
    local_palette: bool = False,
    version: bytes = b"GIF89a",
    extensions: bool = True,
) -> bytes:
    """Encode an HxW uint8 index array + (n,3) palette as a GIF file.

    Fixture-grade encoder for testing the decoder against real
    bitstreams: optional interlace (stores rows in 4-pass order),
    global vs local color table placement, and (for 89a) a Graphic
    Control + Comment extension pair so the decoder's extension
    skipping is exercised. Palette is padded to the next power of two
    (minimum 4 — a 2-entry table would need min_code_size 1, which
    the spec floors at 2)."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    h, w = idx.shape
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("index beyond palette")
    bits = max(2, int(len(pal) - 1).bit_length())
    n = 1 << bits
    padded = np.zeros((n, 3), np.uint8)
    padded[: len(pal)] = pal
    table = padded.tobytes()
    size_field = bits - 1

    out = bytearray(version)
    if local_palette:
        out += struct.pack("<HHBBB", w, h, 0x00, 0, 0)
    else:
        out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
        out += table
    if extensions and version == b"GIF89a":
        # Graphic Control Extension (fixed 4-byte block) + a comment —
        # both must be transparently skipped by any decoder
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xfe\x07fixture\x00"
    ipacked = 0x40 if interlace else 0x00
    if local_palette:
        ipacked |= 0x80 | size_field
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_palette:
        out += table
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(idx[r] for r in range(start, h, step))
        stream = b"".join(r.tobytes() for r in rows)
    else:
        stream = idx.tobytes()
    min_code_size = max(2, bits)
    out.append(min_code_size)
    data = _lzw_encode(stream, min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
