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

Scope: stills AND animations. decode_gif() returns the first frame
(what corpus feature extraction wants); decode_gif_frames() composites
the full animation (sub-rectangle frames, Graphic Control delays,
disposal methods 0-3, transparency), and gif_frame_sample() is the
Spark operator sampling displayed frames at a time step — the GIF
analog of mp4.video_frame_sample. Decoder handles 87a and 89a, global
and local color tables, interlaced and sequential, all code sizes 2-8,
deferred clear codes, and early stream termination via EOI.
"""

from __future__ import annotations

import struct

# adversarial-header decode cap shared across the in-repo codecs (same
# value as webp.WEBP_MAX_PIXELS)
GIF_MAX_PIXELS = 1 << 26

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
            if len(out) < n_pixels:
                # the docstring promises exactly n_pixels; a short
                # buffer would otherwise surface as an opaque numpy
                # reshape error in decode_gif_frames
                raise ValueError("GIF LZW stream ended early")
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


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """Decode a GIF87a/89a file into its COMPOSITED animation frames:
    a list of ``(delay_cs, HxWx3 uint8)`` in display order.

    Full GIF89a animation semantics: each image descriptor may cover a
    sub-rectangle of the logical screen; its preceding Graphic Control
    Extension carries the frame delay (centiseconds), the transparent
    color index (those pixels leave the canvas unchanged), and the
    disposal method applied AFTER the frame displays — 0/1 leave the
    canvas, 2 restores the frame's region to the background color,
    3 restores the canvas to its pre-frame state. Frames snapshot the
    canvas, so each returned array is what a viewer shows at that
    point. Local color tables override the global one per image."""
    import numpy as np

    if payload[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("GIF truncated before screen descriptor")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
        if len(gct) < 3 * n:
            raise ValueError("GIF global color table truncated")
    if sw == 0 or sh == 0:
        raise ValueError("GIF has an empty logical screen")
    if sw * sh > GIF_MAX_PIXELS:
        # adversarial-header guard: frames are bounded by the logical
        # screen, so capping it caps every canvas/LZW allocation (same
        # cap as webp.WEBP_MAX_PIXELS, r15 review)
        raise ValueError(
            f"GIF dimensions {sw}x{sh} exceed the "
            f"{GIF_MAX_PIXELS}-pixel decode cap"
        )
    bg_rgb = (0, 0, 0)
    if gct is not None and 3 * bg + 3 <= len(gct):
        bg_rgb = tuple(gct[3 * bg : 3 * bg + 3])
    canvas = np.zeros((sh, sw, 3), np.uint8)
    canvas[:] = bg_rgb
    frames: list[tuple[int, "np.ndarray"]] = []
    # pending GCE state (applies to the NEXT image only, per spec)
    delay_cs, disposal, t_idx = 0, 0, None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            label = payload[pos]
            pos += 1
            subs = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                subs.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # block terminator
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                gce = subs[0]
                disposal = (gce[0] >> 2) & 0x07
                delay_cs = gce[1] | (gce[2] << 8)
                t_idx = gce[3] if gce[0] & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
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
        if not 2 <= min_code_size <= 8:
            # spec caps the field at 8 (256-entry color table); 9-11
            # would make _lzw_decode's bytes((i,)) root table blow up
            # with an unrelated range error instead of this message
            raise ValueError(f"bad GIF LZW code size {min_code_size}")
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # block terminator
        data = b"".join(chunks)
        idx = np.frombuffer(
            _lzw_decode(data, min_code_size, w * h), np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = np.array(_deinterlace(list(idx), h), dtype=np.uint8)
        pal = np.frombuffer(table, np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF index beyond color table")
        if top + h > sh or left + w > sw:
            raise ValueError("GIF frame exceeds the logical screen")
        before = canvas[top : top + h, left : left + w].copy()
        region = pal[idx]
        if t_idx is not None:
            keep = idx == t_idx  # transparent pixels show what's below
            region = np.where(keep[:, :, None], before, region)
        canvas[top : top + h, left : left + w] = region
        frames.append((delay_cs, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = before
        delay_cs, disposal, t_idx = 0, 0, None
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


def decode_gif(payload: bytes):
    """Decode the FIRST frame of a GIF87a/89a file → HxWx3 uint8 (the
    right frame for corpus feature extraction; see decode_gif_frames
    for the full animation)."""
    return decode_gif_frames(payload, max_frames=1)[0][1]


def encode_gif_animation(
    frames,
    palette,
    screen: tuple[int, int] | None = None,
    background: int = 0,
) -> bytes:
    """Encode an animated GIF89a for testing the compositing decoder.

    ``frames`` is a list of dicts: ``{"indices": HxW uint8, "left": int,
    "top": int, "delay_cs": int, "disposal": 0|1|2|3,
    "transparent": int | None}`` — sub-rectangle frames, per-frame
    Graphic Control Extensions, one global color table. ``screen`` is
    the logical screen (defaults to frame 0's extent); ``background``
    the background color index (what disposal 2 restores)."""
    import numpy as np

    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    bits = max(2, int(len(pal) - 1).bit_length())
    n = 1 << bits
    padded = np.zeros((n, 3), np.uint8)
    padded[: len(pal)] = pal
    size_field = bits - 1
    f0 = np.asarray(frames[0]["indices"], dtype=np.uint8)
    sw, sh = screen or (
        frames[0].get("left", 0) + f0.shape[1],
        frames[0].get("top", 0) + f0.shape[0],
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_field, background, 0)
    out += padded.tobytes()
    min_code_size = max(2, bits)
    for fr in frames:
        idx = np.asarray(fr["indices"], dtype=np.uint8)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("index beyond palette")
        h, w = idx.shape
        left, top = fr.get("left", 0), fr.get("top", 0)
        t = fr.get("transparent")
        gce_packed = ((fr.get("disposal", 0) & 0x07) << 2) | (
            0x01 if t is not None else 0x00
        )
        delay = fr.get("delay_cs", 0)
        out += bytes([0x21, 0xF9, 0x04, gce_packed, delay & 0xFF,
                      (delay >> 8) & 0xFF, t or 0, 0x00])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0x00)
        out.append(min_code_size)
        data = _lzw_encode(idx.tobytes(), min_code_size)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


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


def gif_frame_sample(
    assets,
    every_ms: int = 250,
    id_col: str = "asset_id",
    payload_col: str = "payload",
):
    """Time-based frame sampling over REAL animated GIFs: for each
    target timestamp t = j*every_ms (j = 0 .. while t < animation
    duration), emit the frame DISPLAYED at t (the latest frame whose
    start time is <= t) with its integer-exact aHash — the GIF analog
    of mp4.video_frame_sample(decode=True), over the compositing
    decoder (sub-rectangle frames, disposal, transparency). Zero-delay
    frames are treated as 10 cs, the de-facto viewer convention.
    Sampling, timeline and schema live in
    multimodal.animation_frame_sample (one copy for both codecs).

    Output: (<id_col>, frame_ts_ms int, frame_index int,
    frame_time_ms long, ahash_bits string)."""
    from victorialogs_spark.datapipe.multimodal import (
        animation_frame_sample,
    )

    return animation_frame_sample(
        assets, decode_gif_frames, lambda cs: cs * 10, every_ms, id_col,
        payload_col,
    )
