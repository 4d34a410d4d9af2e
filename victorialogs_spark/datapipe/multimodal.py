"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. Decoders, by honesty tier:

- ``decoder="stdlib"`` — REAL decode for formats the container can
  handle without external libs: WAV (stdlib ``wave``: sample rate,
  duration, per-segment RMS features), uncompressed 24/32-bit BMP,
  binary PPM/P6, PNG at 8- and 16-bit depth, non-interlaced and Adam7
  (``zlib`` inflate + scanline unfilter + pass reassembly —
  greyscale/RGB/RGBA), and sequential AND progressive JPEG (jpeg.py:
  marker walk, stream-defined Huffman tables, multi-scan coefficient
  accumulation, dequantize, float IDCT with the exact-integer DC-only
  fast path, 4:4:4/4:2:0/4:2:2, restart markers), GIF87a/89a
  (gif.py: pure-Python LZW, global/local color tables, 4-pass
  interlace, extension skipping), baseline TIFF (tiff.py: IFD
  walking, both byte orders, strips, none/LZW/PackBits compression,
  horizontal predictor, grayscale + RGB), and lossless WebP (webp.py:
  the full VP8L surface — canonical prefix codes, LZ77 + color cache,
  meta-prefix groups, all four transforms incl. palette bundling).
  MJPEG-in-MP4 frames decode end-to-end via
  mp4.video_frame_sample(decode=True).
  ``resize_image`` really resizes (numpy nearest-neighbor, re-encoded
  as PPM).
- ``decoder="fake"`` — deterministic pseudo-features from the content
  hash, for end-to-end pipeline tests over arbitrary bytes.
- ``decoder="pil"``/"ffmpeg" — the remaining integration point
  (arithmetic-coded JPEG, LOSSY WebP — the "VP8 " intra-frame mode —
  and real video codecs: H.264 etc.); those libs are not in this
  container, so this raises NotImplementedError with the plug-in
  point documented. The plug-in CONTRACT is executable, not just
  documented: ``register_external_decoder(name, fn)`` installs a
  ``payload-bytes → HxWx3 uint8`` callable that (a) serves
  ``decode_features(decoder=name)`` directly and (b) backstops every
  pixel surface (``image_ahash``/``image_phash``/near-dup) when the
  in-repo containers can't decode a payload — the exact two flows a
  future PIL/ffmpeg build plugs into (r15 seam test,
  tests/test_datapipe.py::test_external_decoder_seam).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic asset table from the documents table: the text
    bytes stand in for an opaque media payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _fake_decode(payload: bytes, modality: str, feat_dim: int) -> dict:
    """Deterministic pseudo-decode: stable dimensions/duration/features
    derived from the content hash. Stands in for PIL/ffmpeg decode."""
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0] % 192 if modality == "image" else 0
    height = 64 + h[1] % 192 if modality == "image" else 0
    duration = 1000 + int.from_bytes(h[2:4], "big") if modality in ("audio", "video") else 0
    feat = [
        (int.from_bytes(h[(4 + 2 * i) % 16 : (4 + 2 * i) % 16 + 2] or b"\0\0", "big") % 1000)
        / 1000.0
        for i in range(feat_dim)
    ]
    return {
        "payload_bytes": len(payload or b""),
        "content_hash": hashlib.md5(payload or b"").hexdigest(),
        "width": width,
        "height": height,
        "duration_ms": duration,
        "feature": feat,
    }


def _decode_wav(payload: bytes, feat_dim: int) -> dict:
    """Real WAV decode (stdlib wave): duration + per-segment RMS energy."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        rate, nframes, width = w.getframerate(), w.getnframes(), w.getsampwidth()
        raw = w.readframes(nframes)
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    duration_ms = int(nframes * 1000 / rate) if rate else 0
    feat = []
    if len(pcm):
        for seg in np.array_split(pcm, feat_dim):
            feat.append(float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0)
    else:
        feat = [0.0] * feat_dim
    return {"width": 0, "height": 0, "duration_ms": duration_ms, "feature": feat}


def _decode_bmp(payload: bytes, feat_dim: int):
    """Real uncompressed 24/32-bit BMP decode (struct + numpy) → HxWx3."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip, h = h > 0, abs(h)
    bypp = bpp // 8
    stride = (w * bypp + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, stride * h, data_off).reshape(h, stride)
    px = rows[:, : w * bypp].reshape(h, w, bypp)[:, :, :3][:, :, ::-1]  # BGR→RGB
    return px[::-1] if flip else px


def _decode_ppm(payload: bytes, feat_dim: int):
    """Real binary PPM (P6) decode → HxWx3."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a binary PPM")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return np.frombuffer(payload, np.uint8, w * h * 3, m.end()).reshape(h, w, 3)


def _image_features(px, feat_dim: int) -> dict:
    """Per-vertical-strip mean intensity in [0,1] over the decoded pixels."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    gray = px.mean(axis=2)
    feat = [float(s.mean()) / 255.0 if s.size else 0.0
            for s in np.array_split(gray, feat_dim, axis=1)]
    return {"width": int(w), "height": int(h), "duration_ms": 0, "feature": feat}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# adversarial-header decode cap shared across the in-repo codecs (same
# value as webp.WEBP_MAX_PIXELS)
PNG_MAX_PIXELS = 1 << 26
# colortype -> whole-byte samples per pixel (palette/sub-byte shapes are
# decoded by _decode_png_indexed instead)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# Adam7 pass geometry: (x0, y0, dx, dy) per pass (RFC 2083 §2.6)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, off: int, n_rows: int, stride: int,
                  bpp: int):
    """Unfilter ``n_rows`` scanlines of ``stride`` bytes starting at
    ``off`` in the inflated stream (filter types 0-4, RFC 2083 §6; the
    left predecessor is ``bpp`` BYTES back — filters are byte-wise at
    every bit depth). Returns ((n_rows, stride) uint8, new offset).
    Each interlace pass calls this independently: filtering restarts
    per pass (the prior row of a pass's first scanline is zero)."""
    import numpy as np

    if len(raw) < off + n_rows * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    out = np.zeros((n_rows, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.intp)
    for r in range(n_rows):
        base = off + r * (stride + 1)
        row = np.frombuffer(raw, np.uint8, stride, base + 1).astype(np.intp)
        ft = raw[base]
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up — fully vectorizable
            cur = (row + prior) & 0xFF
        elif ft == 1:
            # Sub is a per-byte-lane prefix sum mod 256: uint8
            # accumulate wraps exactly, so a megapixel row costs one
            # numpy pass instead of a Python loop over every byte
            lanes = row.astype(np.uint8).reshape(-1, bpp)
            cur = np.add.accumulate(lanes, axis=0, dtype=np.uint8)
            cur = cur.reshape(-1).astype(np.intp)
        elif ft in (3, 4):  # Average / Paeth: inherently sequential in x
            # (each byte's predictor needs the DECODED left neighbor —
            # no closed-form scan; rows are the parallel unit at scale)
            cur = np.zeros(stride, dtype=np.intp)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = prior[x]  # up
                if ft == 3:
                    pred = (a + b) >> 1
                else:
                    c = prior[x - bpp] if x >= bpp else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = cur
        prior = cur.astype(np.intp)
    return out, off + n_rows * (stride + 1)


def _decode_png_indexed(raw: bytes, w: int, h: int, depth: int,
                        color: int, interlace: int, plte: bytes | None):
    """Decode the single-sample PNG shapes the main path can't express
    as whole bytes per channel: palette (colortype 3, depths 1/2/4/8 —
    index lookup into the PLTE chunk) and sub-byte greyscale (colortype
    0, depths 1/2/4). One sample per pixel in both cases; samples pack
    leftmost-pixel-in-high-bits within each byte (RFC 2083 §2.3), and
    scanline filters stay BYTE-wise at every depth (§6: bpp rounds up
    to one byte), so the existing unfilter runs unchanged with bpp=1.
    Returns HxWx3 uint8."""
    import numpy as np

    if color not in (0, 3):
        raise ValueError(
            f"unsupported PNG (colortype={color}, depth={depth})"
        )
    if color == 3 and depth == 16:
        raise ValueError("illegal PNG: 16-bit palette")
    spb = 8 // depth  # samples per byte
    shifts = (np.arange(spb - 1, -1, -1, dtype=np.uint8) * depth)
    mask = (1 << depth) - 1

    def unpack(rows, pw):
        # (n, stride) bytes -> (n, pw) samples, dropping pad bits
        vals = (rows[:, :, None] >> shifts) & mask
        return vals.reshape(rows.shape[0], -1)[:, :pw]

    idx = np.zeros((h, w), dtype=np.uint8)
    if interlace == 0:
        stride = (w * depth + 7) // 8
        rows, _ = _png_unfilter(raw, 0, h, stride, 1)
        idx[:] = unpack(rows, w)
    else:
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines
            rows, off = _png_unfilter(raw, off, ph, (pw * depth + 7) // 8, 1)
            idx[y0::dy, x0::dx] = unpack(rows, pw)
    if color == 3:
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError("palette PNG missing/malformed PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(idx.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    # sub-byte greyscale: max-value expansion to 8-bit (255/(2^d - 1) is
    # an integer for d in 1/2/4: 255, 85, 17), replicated to 3 channels
    g = (idx * (255 // mask)).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def _decode_png(payload: bytes, feat_dim: int = 0):
    """Real PNG decode → HxWx3 uint8, no external libs: PNG's
    compression IS stdlib ``zlib``; the only format-specific work is
    chunk walking, scanline unfiltering (filter types 0-4, RFC 2083
    §6), and Adam7 pass reassembly. Supported: every legal bit depth —
    1/2/4-bit greyscale and palette, 8-bit all color types, 16-bit
    greyscale/RGB/grey+alpha/RGBA — non-interlaced and
    Adam7-interlaced. Palette (colortype 3) indexes resolve through
    the PLTE chunk to RGB; sub-byte greyscale scales to 8-bit by the
    standard max-value expansion (0..(2^d - 1) -> 0..255); 16-bit
    scales to 8 by taking the high byte (>>8); alpha is dropped, grey
    replicated to 3 channels (tRNS transparency is likewise dropped —
    this decoder feeds pixel-statistics features, not compositing)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (
        depth not in (1, 2, 4, 8, 16)
        or comp != 0
        or filt != 0
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    if w * h > PNG_MAX_PIXELS:
        # adversarial-header guard: PNG dims are u32, and zlib expands
        # ~1000x — cap before any decompression/allocation (same cap as
        # webp.WEBP_MAX_PIXELS, r15 review)
        raise ValueError(
            f"PNG dimensions {w}x{h} exceed the "
            f"{PNG_MAX_PIXELS}-pixel decode cap"
        )

    # bound the inflate output too: a crafted IDAT can expand ~1000x
    # past what the declared dims justify. 2x covers Adam7's per-pass
    # filter bytes and rounding with room to spare.
    n_ch = _PNG_CHANNELS.get(color, 1)
    stride = (w * n_ch * depth + 7) // 8
    inflate_cap = 2 * h * (stride + 1) + 1024

    def _inflate(data: bytes) -> bytes:
        d = zlib.decompressobj()
        out = d.decompress(data, inflate_cap + 1)
        if len(out) > inflate_cap:
            raise ValueError("PNG IDAT inflates beyond the declared size")
        return out
    if color == 3 or depth < 8:
        return _decode_png_indexed(
            _inflate(b"".join(idat)),
            w, h, depth, color, interlace, plte,
        )
    ch = _PNG_CHANNELS.get(color)
    if ch is None:
        raise ValueError(f"unsupported PNG colortype {color}")
    nb = depth // 8
    bpp = ch * nb
    raw = _inflate(b"".join(idat))
    # assemble into (h, w, ch, nb) bytes; big-endian => byte 0 is high
    img = np.zeros((h, w, ch, nb), dtype=np.uint8)
    if interlace == 0:
        rows, _ = _png_unfilter(raw, 0, h, w * bpp, bpp)
        img[:] = rows.reshape(h, w, ch, nb)
    else:
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines
            rows, off = _png_unfilter(raw, off, ph, pw * bpp, bpp)
            img[y0::dy, x0::dx] = rows.reshape(ph, pw, ch, nb)
    px = img[:, :, :, 0]  # 8-bit as-is; 16-bit high byte (>>8)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB as-is; RGBA drops alpha


def _png_filter_rows(byterows, bpp: int, filter_types, row0: int) -> list[bytes]:
    """Filter a block of byte scanlines (one image, or one Adam7 pass —
    filtering restarts per pass). ``byterows`` is (n, stride) int;
    ``row0`` offsets the "cycle" selector so interlaced passes keep
    cycling globally."""
    import numpy as np

    n, stride = byterows.shape
    lines = []
    prior = np.zeros(stride, dtype=np.intp)
    for r in range(n):
        ft = (
            (row0 + r) % 5 if filter_types == "cycle"
            else (filter_types or 0)
            if isinstance(filter_types, int) or filter_types is None
            else 0
        )
        cur = byterows[r]
        left = (
            np.concatenate([np.zeros(bpp, dtype=np.intp), cur[:-bpp]])
            if stride > bpp else np.zeros_like(cur)
        )
        upleft = (
            np.concatenate([np.zeros(bpp, dtype=np.intp), prior[:-bpp]])
            if stride > bpp else np.zeros_like(prior)
        )
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prior
        elif ft == 3:
            enc = cur - ((left + prior) >> 1)
        else:  # Paeth
            p = left + prior - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft)
            )
            enc = cur - pred
        lines.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    return lines


def encode_png(px, filter_types=None, bit_depth: int = 8,
               interlace: int = 0) -> bytes:
    """Minimal PNG encoder for tests and deterministic synthetic
    payloads. ``px`` is HxW (grey), HxWx3 (RGB) or HxWx4 (RGBA) —
    uint8 for ``bit_depth=8``, uint16 for ``bit_depth=16`` (stored
    big-endian per spec). ``interlace=1`` writes Adam7 passes.
    ``filter_types``: None = all rows filter 0; an int = that filter
    everywhere; "cycle" = scanline i uses filter i % 5, exercising
    every unfilter path in one image (cycling continues across
    interlace passes)."""
    import struct
    import zlib

    import numpy as np

    dt = np.uint8 if bit_depth == 8 else np.uint16
    px = np.asarray(px, dtype=dt)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    nb = bit_depth // 8
    bpp = ch * nb
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color, 0, 0, interlace)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    # byte view (h, w, ch, nb), big-endian sample order
    b = px.astype(">u2" if nb == 2 else np.uint8).view(np.uint8)
    b = b.reshape(h, w, ch, nb)
    lines: list[bytes] = []
    if interlace == 0:
        rows = b.reshape(h, w * bpp).astype(np.intp)
        lines = _png_filter_rows(rows, bpp, filter_types, 0)
    else:
        row0 = 0
        for x0, y0, dx, dy in _ADAM7:
            sub = b[y0::dy, x0::dx]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph <= 0 or pw <= 0:
                continue
            rows = sub.reshape(ph, pw * bpp).astype(np.intp)
            lines += _png_filter_rows(rows, bpp, filter_types, row0)
            row0 += ph
    idat = zlib.compress(b"".join(lines), 9)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def encode_png_palette(indices, palette, bit_depth: int = 8,
                       filter_types=None, interlace: int = 0) -> bytes:
    """Minimal palette-PNG (colortype 3) encoder for tests and
    deterministic synthetic payloads. ``indices`` is HxW palette
    indexes, ``palette`` an (n, 3) RGB array / list of triples;
    ``bit_depth`` in 1/2/4/8 packs indexes leftmost-pixel-in-high-bits
    (RFC 2083 §2.3). Also encodes sub-byte GREYSCALE (colortype 0)
    when ``palette is None``. ``filter_types``/``interlace`` as in
    :func:`encode_png` (filters are byte-wise at every depth)."""
    import struct
    import zlib

    import numpy as np

    assert bit_depth in (1, 2, 4, 8)
    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    if int(idx.max(initial=0)) >= (1 << bit_depth):
        # an oversized sample would bleed bits into the neighboring
        # pixel lanes in pack()'s shift-and-sum, yielding a valid but
        # WRONG bitstream — fail at entry instead
        raise ValueError(
            f"palette/grey index {int(idx.max())} needs more than "
            f"{bit_depth} bits"
        )
    if palette is not None and int(idx.max(initial=0)) >= len(
        np.asarray(palette).reshape(-1, 3)
    ):
        raise ValueError("index beyond palette length")
    color = 0 if palette is None else 3
    spb = 8 // bit_depth
    shifts = np.arange(spb - 1, -1, -1, dtype=np.uint8) * bit_depth

    def pack(sub):
        # (ph, pw) samples -> (ph, ceil(pw*depth/8)) bytes, zero-padded
        ph, pw = sub.shape
        padded = np.zeros((ph, (pw + spb - 1) // spb * spb), dtype=np.uint8)
        padded[:, :pw] = sub
        lanes = padded.reshape(ph, -1, spb)
        return (lanes << shifts).sum(axis=2, dtype=np.uint16).astype(np.uint8)

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color, 0, 0, interlace)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    lines: list[bytes] = []
    if interlace == 0:
        lines = _png_filter_rows(pack(idx).astype(np.intp), 1, filter_types, 0)
    else:
        row0 = 0
        for x0, y0, dx, dy in _ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.shape[0] <= 0 or sub.shape[1] <= 0:
                continue
            lines += _png_filter_rows(
                pack(sub).astype(np.intp), 1, filter_types, row0
            )
            row0 += sub.shape[0]
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
        out += chunk(b"PLTE", pal.tobytes())
    out += chunk(b"IDAT", zlib.compress(b"".join(lines), 9))
    return out + chunk(b"IEND", b"")


def _stdlib_decode(payload: bytes, feat_dim: int) -> dict:
    """Dispatch on magic bytes to the real no-external-libs decoders."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload, feat_dim)
    if payload[:2] == b"BM":
        return _image_features(_decode_bmp(payload, feat_dim), feat_dim)
    if payload[:2] == b"P6":
        return _image_features(_decode_ppm(payload, feat_dim), feat_dim)
    if payload[:8] == _PNG_SIG:
        return _image_features(_decode_png(payload), feat_dim)
    if payload[:2] == b"\xff\xd8":
        from victorialogs_spark.datapipe.jpeg import decode_jpeg

        return _image_features(decode_jpeg(payload), feat_dim)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from victorialogs_spark.datapipe.gif import decode_gif

        return _image_features(decode_gif(payload), feat_dim)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from victorialogs_spark.datapipe.tiff import decode_tiff

        return _image_features(decode_tiff(payload), feat_dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        # decode_webp: first displayed frame of stills AND animations
        # (GIF parity — decode_gif also composites frame 0)
        from victorialogs_spark.datapipe.webp import decode_webp

        return _image_features(decode_webp(payload), feat_dim)
    raise ValueError(f"unrecognized container (magic {payload[:4]!r})")


def decode_features(
    assets: DataFrame, decoder: str = "fake", feat_dim: int = 8
) -> DataFrame:
    """Decode/feature-extract each asset via mapInPandas (Arrow batches).

    decoder="stdlib": REAL decode for WAV/BMP/PPM/PNG (all legal
    depths, palette, Adam7)/JPEG (baseline + progressive)/GIF (87a,
    89a, interlace) payloads (no external libs needed); unrecognized
    payloads yield a NULL feature row (width/height/duration NULL,
    feature NULL) rather than failing the batch.
    decoder="fake": deterministic stub (see _fake_decode).
    decoder="pil"/"ffmpeg": the remaining compressed formats — NOT
    available in this container; raise with the integration point
    documented.
    """
    external = _EXTERNAL_DECODERS.get(decoder)
    if decoder not in ("fake", "stdlib") and external is None:
        raise NotImplementedError(
            f"decoder={decoder!r}: non-MJPEG video codecs / arithmetic "
            "JPEG need PIL/ffmpeg, not present in this container. "
            "register_external_decoder({0!r}, fn) plugs the real decode "
            "into this seam — schema/batching stay identical.".format(
                decoder
            )
        )

    def _decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                if decoder != "fake":
                    base = {
                        "payload_bytes": len(b),
                        "content_hash": hashlib.md5(b).hexdigest(),
                    }
                    try:
                        if external is not None:
                            # external backend: its pixels, the shared
                            # feature pipeline — in-repo containers still
                            # decode what they can first so a PIL build
                            # agrees with stdlib on the overlap
                            try:
                                d2 = _stdlib_decode(b, feat_dim)
                            except Exception:
                                d2 = _image_features(external(b), feat_dim)
                        else:
                            d2 = _stdlib_decode(b, feat_dim)
                        base.update(d2)
                    except Exception:
                        base.update(
                            {"width": None, "height": None,
                             "duration_ms": None, "feature": None}
                        )
                    d = base
                else:
                    d = _fake_decode(b, modality, feat_dim)
                d["asset_id"] = asset_id
                d["modality"] = modality
                rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return assets.mapInPandas(_decode_batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),  # PPM/P6 re-encode
    ]
)


def resize_image(assets: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for BMP/PPM payloads: numpy nearest-neighbor,
    re-encoded as binary PPM. Unrecognized payloads are dropped (NULL
    filtered) — the honest subset of a PIL-backed resize. One narrow
    mapInPandas, no shuffle."""

    def _resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    if b[:2] == b"BM":
                        px = _decode_bmp(b, 1)
                    elif b[:2] == b"P6":
                        px = _decode_ppm(b, 1)
                    else:
                        continue
                    h0, w0 = px.shape[0], px.shape[1]
                    if h0 == 0 or w0 == 0:
                        continue  # degenerate-but-decodable (0-dim) image
                    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                    out = px[yi][:, xi]
                except Exception:
                    continue  # a bad asset must not fail the batch
                ppm = b"P6\n%d %d\n255\n" % (width, height) + out.astype(
                    np.uint8
                ).tobytes()
                rows.append((asset_id, width, height, ppm))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["asset_id", "width", "height", "payload"]
                )

    return assets.mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp.
    The decode of each frame is the stubbed step; the explode/plan shape
    (what a 100 TB video pipeline shuffles on) is real."""
    feats = decode_features(assets.where(F.col("modality") == "video"))
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return feats.select(
        "asset_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )


def image_phash(assets: DataFrame, id_col: str = "asset_id",
                payload_col: str = "payload") -> DataFrame:
    """Perceptual hash (pHash) of BMP/PPM image payloads — the image
    analog of text SimHash, robust to resizing and small pixel noise:
    grayscale → center-aligned bilinear resample to 32×32 → 2-D DCT-II
    (one numpy matrix sandwich per image) → 8×8 low-frequency block →
    bit per coefficient above the median, DC excluded (63 significant
    bits in the returned long).

    One narrow Arrow map; undecodable payloads yield NULL. Output:
    (<id_col>, phash long) — feed to :func:`phash_near_dups` for
    blocked Hamming candidate pairs.
    """
    import numpy as np

    def _dct_mat(n: int):
        k = np.arange(n)
        return np.cos(np.pi / n * (k[None, :] + 0.5) * k[:, None])

    D32 = None  # built lazily inside workers

    ext = dict(_EXTERNAL_DECODERS)  # plan-time snapshot (see seam note)

    def _phash_one(payload) -> int | None:
        nonlocal D32
        import numpy as np

        b = bytes(payload) if payload is not None else b""
        try:
            px = _stdlib_decode_pixels(b, ext)
        except Exception:
            return None
        if D32 is None:
            D32 = _dct_mat(32)
        gray = px.mean(axis=2)
        # center-aligned bilinear resample to 32x32 (not nearest-neighbor
        # sampling, whose grid-phase aliasing makes hashes differ between
        # resolutions of the same scene; handles sources smaller than 32)
        small = _bilinear_32(gray)
        dct = D32 @ small @ D32.T
        block = dct[:8, :8].flatten()
        coeffs = block[1:]  # drop the DC term (overall brightness)
        bits = coeffs > np.median(coeffs)
        v = np.uint64(0)
        for bit in bits:
            v = (v << np.uint64(1)) | np.uint64(bool(bit))
        return int(v.astype(np.int64))

    def _batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col],
                    "phash": pd.Series(
                        [_phash_one(p) for p in pdf[payload_col]],
                        dtype="object",
                    ),
                }
            )

    id_type = dict(assets.dtypes)[id_col]
    out = assets.select(id_col, payload_col).mapInPandas(
        _batches, f"__id {id_type}, phash long"
    )
    return out.withColumnRenamed("__id", id_col)


def _bilinear_32(gray, n: int = 32):
    """Center-aligned bilinear resample of a 2-D array to n×n."""
    import numpy as np

    h, w = gray.shape
    ys = (np.arange(n) + 0.5) * h / n - 0.5
    xs = (np.arange(n) + 0.5) * w / n - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = gray[np.ix_(y0, x0)]
    b = gray[np.ix_(y0, x1)]
    c = gray[np.ix_(y1, x0)]
    d = gray[np.ix_(y1, x1)]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx


# lossy-codec plug-in seam: external decoders (PIL, ffmpeg, a test
# double) register payload→pixels callables here. The dict is a plain
# module global CAPTURED BY the mapInPandas closures at plan time, so a
# registered fn must be picklable (top-level function / functools.partial
# — the same rule every pandas-UDF closure already obeys).
_EXTERNAL_DECODERS: dict[str, object] = {}


def register_external_decoder(name: str, fn) -> None:
    """Install ``fn(payload: bytes) -> HxWx3 uint8 ndarray`` under
    ``name``. It becomes (a) a selectable ``decode_features(decoder=
    name)`` backend and (b) a fallback for the pixel surfaces
    (ahash/phash/frame features) when no in-repo container decodes a
    payload. Raise inside ``fn`` to decline a payload."""
    _EXTERNAL_DECODERS[name] = fn


def unregister_external_decoder(name: str) -> None:
    _EXTERNAL_DECODERS.pop(name, None)


def _external_decode_pixels(b: bytes, ext: dict):
    """Try every given external decoder; first success wins.
    Raises ValueError when none accepts."""
    for fn in ext.values():
        try:
            return fn(b)
        except Exception:  # noqa: BLE001 — declined; try the next
            continue
    raise ValueError("no external decoder accepted the payload")


def _stdlib_decode_pixels(b: bytes, ext: dict | None = None):
    """BMP/PPM/PNG/JPEG (baseline + progressive)/GIF payload →
    HxWx3 uint8. Falls back to external decoders (the PIL/ffmpeg seam)
    for containers the in-repo codecs decline — e.g. lossy "VP8 "
    WebP — and raises when nothing decodes. ``ext`` is the registry
    SNAPSHOT captured on the driver at plan time: Python workers
    re-import this module with an empty ``_EXTERNAL_DECODERS``, so a
    worker-side module-global lookup would silently see nothing (the
    module global still serves worker-side plugin registration, e.g. a
    real PIL build registering at import)."""
    try:
        return _stdlib_decode_pixels_builtin(b)
    except Exception:
        ext = _EXTERNAL_DECODERS if ext is None else ext
        if ext:
            return _external_decode_pixels(b, ext)
        raise


def _stdlib_decode_pixels_builtin(b: bytes):
    if b[:2] == b"BM":
        return _decode_bmp(b, 0)
    if b[:2] == b"P6":
        return _decode_ppm(b, 0)
    if b[:8] == _PNG_SIG:
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        from victorialogs_spark.datapipe.jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from victorialogs_spark.datapipe.gif import decode_gif

        return decode_gif(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from victorialogs_spark.datapipe.tiff import decode_tiff

        return decode_tiff(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from victorialogs_spark.datapipe.webp import decode_webp

        return decode_webp(b)
    raise ValueError("not a decodable image")


def phash_near_dups(hashes: DataFrame, id_col: str = "asset_id",
                    max_distance: int = 3) -> DataFrame:
    """Near-duplicate image candidates: the same pigeonhole 16-bit-chunk
    blocking + JVM bit_count Hamming verify the text SimHash path uses
    (dedup.hamming_near_dups) — identical scale story, no all-pairs."""
    from victorialogs_spark.datapipe.dedup import hamming_near_dups

    renamed = hashes.where(F.col("phash").isNotNull()).withColumnRenamed(
        "phash", "simhash"
    )
    out = hamming_near_dups(renamed, id_col, max_distance=max_distance)
    return out


def _wav_pcm(payload: bytes):
    """WAV payload → (mono float64 pcm in [-1,1], sample_rate)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        rate, nframes, width = w.getframerate(), w.getnframes(), w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(nframes)
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        pcm = pcm[: len(pcm) // nch * nch].reshape(-1, nch).mean(axis=1)
    return pcm, rate


def audio_fingerprint(assets: DataFrame, id_col: str = "asset_id",
                      payload_col: str = "payload",
                      n_frames: int = 16, n_bands: int = 5) -> DataFrame:
    """64-bit spectral fingerprint of WAV payloads — the audio analog of
    :func:`image_phash`, after Haitsma–Kalker (2002): the signal is cut
    into ``n_frames`` fixed TIME-FRACTION windows (so duration/sample-
    rate changes align), each window's FFT magnitude folds into
    ``n_bands`` log-spaced frequency bands measured in ABSOLUTE Hz
    (scale-invariant), and bit (frame, band) = band energy increased
    vs the previous frame. (n_frames-1) * (n_bands-1) = 60 bits, packed
    MSB-first into a signed long; amplitude-robust by construction
    (per-frame normalized energies compare, never absolute levels —
    int16 quantization noise can still flip bits whose band difference
    sits near zero).

    One narrow Arrow map; undecodable payloads yield NULL. Feed to
    :func:`phash_near_dups` (rename the column) or dedup.
    hamming_near_dups for blocked near-dup candidates.
    """
    import numpy as np

    def _fp_one(payload) -> int | None:
        b = bytes(payload) if payload is not None else b""
        try:
            pcm, rate = _wav_pcm(b)
        except Exception:
            return None
        if len(pcm) < n_frames * 2 or rate <= 0:
            return None
        # log-spaced band edges in Hz, clipped to Nyquist; a Nyquist at
        # or below the lowest band edge would make every band empty and
        # hash ALL such files to 0 — degenerate input, not a fingerprint
        hi = min(4000.0, rate / 2.0)
        if hi <= 110.0:
            return None
        edges = np.geomspace(100.0, hi, n_bands + 1)
        frames = np.array_split(pcm, n_frames)
        energies = np.empty((n_frames, n_bands))
        for i, fr in enumerate(frames):
            mag = np.abs(np.fft.rfft(fr))
            freqs = np.fft.rfftfreq(len(fr), d=1.0 / rate)
            for j in range(n_bands):
                sel = (freqs >= edges[j]) & (freqs < edges[j + 1])
                energies[i, j] = float((mag[sel] ** 2).sum())
        # normalize per frame: amplitude scaling cancels entirely
        tot = energies.sum(axis=1, keepdims=True)
        tot[tot == 0] = 1.0
        energies /= tot
        diff = np.diff(energies, axis=0)        # frame-to-frame change
        bits = (np.diff(diff, axis=1) > 0)      # band-to-band difference
        v = 0
        for bit in bits.flatten():
            v = (v << 1) | int(bool(bit))
        return v

    def _batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col],
                    "afp": pd.Series(
                        [_fp_one(p) for p in pdf[payload_col]], dtype="object"
                    ),
                }
            )

    id_type = dict(assets.dtypes)[id_col]
    out = assets.select(id_col, payload_col).mapInPandas(
        _batches, f"__id {id_type}, afp long"
    )
    return out.withColumnRenamed("__id", id_col)


def ahash_bits_from_pixels(px) -> str | None:
    """The integer-exact aHash core over decoded HxWx3 uint8 pixels —
    shared by :func:`image_ahash` and the MJPEG frame path
    (mp4.video_frame_sample(decode=True)). See :func:`image_ahash` for
    the exact arithmetic contract."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if h < 8 or w < 8:
        return None
    p64 = px.astype(np.int64)
    gray = (299 * p64[:, :, 0] + 587 * p64[:, :, 1] + 114 * p64[:, :, 2]) // 1000
    rows = np.arange(h) * 8 // h
    cols = np.arange(w) * 8 // w
    cell = rows[:, None] * 8 + cols[None, :]
    sums = np.bincount(
        cell.ravel(), weights=gray.ravel(), minlength=64
    ).astype(np.int64)
    ns = np.bincount(cell.ravel(), minlength=64).astype(np.int64)
    total_sum, total_n = int(sums.sum()), int(ns.sum())
    bits = sums * total_n > total_sum * ns
    return "".join("1" if bit else "0" for bit in bits)


def image_ahash(assets: DataFrame, id_col: str = "asset_id",
                payload_col: str = "payload") -> DataFrame:
    """Average-hash (aHash) of BMP/PPM payloads — the integer-exact
    sibling of :func:`image_phash`, built so an independent engine can
    reproduce it bit-for-bit from the same pixel bytes (no float DCT /
    resample whose IEEE summation order could flip near-threshold bits):

    - integer grayscale ``(299*R + 587*G + 114*B) // 1000`` per pixel,
    - 8×8 block pooling by integer index ``(row*8)//H``/``(col*8)//W``
      (equal blocks whenever H, W are multiples of 8),
    - bit(cell) = 1 iff the cell's mean gray strictly exceeds the image
      mean, compared in exact integer cross-multiplication
      ``cell_sum * total_n > total_sum * cell_n``.

    Runs the REAL container decode path (:func:`_stdlib_decode_pixels`)
    inside one narrow Arrow map. Output: (<id_col>, ahash_bits string of
    64 chars, row-major cell order); undecodable payloads yield NULL.
    """
    ext = dict(_EXTERNAL_DECODERS)  # plan-time snapshot (see seam note)

    def _ahash_one(payload) -> str | None:
        b = bytes(payload) if payload is not None else b""
        try:
            px = _stdlib_decode_pixels(b, ext)
        except Exception:
            return None
        return ahash_bits_from_pixels(px)

    def _batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col],
                    "ahash_bits": pd.Series(
                        [_ahash_one(p) for p in pdf[payload_col]], dtype="object"
                    ),
                }
            )

    id_type = dict(assets.dtypes)[id_col]
    out = assets.select(id_col, payload_col).mapInPandas(
        _batches, f"__id {id_type}, ahash_bits string"
    )
    return out.withColumnRenamed("__id", id_col)


def audio_zcr_energy(assets: DataFrame, id_col: str = "asset_id",
                     payload_col: str = "payload") -> DataFrame:
    """Integer time-domain audio features — the exact-arithmetic sibling
    of :func:`audio_fingerprint` (whose FFT is not reproducible across
    engines bit-for-bit). Runs the REAL stdlib ``wave`` decode path and
    emits only integers, so an independent engine reading the same PCM
    bytes must agree exactly:

    - ``n_samples`` — frame count of channel 0,
    - ``zero_crossings`` — #{i ≥ 1 : (s[i-1] >= 0) != (s[i] >= 0)},
    - ``total_abs`` — Σ|s[i]| in int64 (|-32768| included safely).

    Multi-channel files use channel 0 (an integer channel mean is not
    exact when nch ∤ sum). Output: (<id_col>, n_samples long,
    zero_crossings long, total_abs long); undecodable payloads → NULLs.
    """
    import numpy as np

    def _feats_one(payload):
        import io
        import wave

        b = bytes(payload) if payload is not None else b""
        try:
            with wave.open(io.BytesIO(b)) as w:
                nframes, width, nch = w.getnframes(), w.getsampwidth(), w.getnchannels()
                raw = w.readframes(nframes)
            # inside the try: a truncated data chunk can end mid-sample,
            # and frombuffer on a non-multiple byte count raises — that
            # is an undecodable payload, not a job-killing error
            if width == 2:
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            elif width == 1:
                s = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
            else:
                return None
        except Exception:
            return None
        if nch > 1:
            s = s[: len(s) // nch * nch].reshape(-1, nch)[:, 0]
        if len(s) == 0:
            return (0, 0, 0)
        nonneg = s >= 0
        zc = int((nonneg[:-1] != nonneg[1:]).sum())
        return (int(len(s)), zc, int(np.abs(s).sum()))

    def _batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [_feats_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col],
                    "n_samples": pd.Series(
                        [f[0] if f else None for f in feats], dtype="object"
                    ),
                    "zero_crossings": pd.Series(
                        [f[1] if f else None for f in feats], dtype="object"
                    ),
                    "total_abs": pd.Series(
                        [f[2] if f else None for f in feats], dtype="object"
                    ),
                }
            )

    id_type = dict(assets.dtypes)[id_col]
    out = assets.select(id_col, payload_col).mapInPandas(
        _batches,
        f"__id {id_type}, n_samples long, zero_crossings long, total_abs long",
    )
    return out.withColumnRenamed("__id", id_col)


def animation_frame_sample(
    assets: DataFrame,
    decode_frames,
    duration_to_ms,
    every_ms: int = 250,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Shared engine for time-based animation frame sampling
    (gif.gif_frame_sample / webp.webp_frame_sample — one copy of the
    timeline/sampling/schema logic instead of per-codec drift): for
    each target timestamp t = j*every_ms (while t < animation
    duration), emit the frame DISPLAYED at t (the latest frame whose
    start time is <= t) with its integer-exact aHash.

    ``decode_frames(payload) -> [(duration, HxWx3), ...]`` is the
    codec's compositing decoder; ``duration_to_ms`` converts its native
    duration unit (GIF centiseconds x10, WebP already ms). A converted
    duration <= 0 counts as 100 ms — the de-facto viewer convention
    both formats share. Each distinct frame is hashed ONCE regardless
    of how many sample timestamps land on it. One narrow Arrow map
    (projected to the two consumed columns), no shuffle; undecodable
    payloads yield no rows (honest skip, consistent with the other
    media decoders).

    Output: (<id_col>, frame_ts_ms int, frame_index int,
    frame_time_ms long, ahash_bits string)."""

    def _batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, f_ts, f_idx, f_time, hashes = [], [], [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames = decode_frames(bytes(payload))
                except Exception:  # noqa: BLE001 — honest skip
                    continue
                starts, t0 = [], 0
                for dur, _px in frames:
                    starts.append(t0)
                    ms = duration_to_ms(dur)
                    t0 += ms if ms > 0 else 100
                total_ms = t0
                frame_hash: list[str | None] = [None] * len(frames)
                t = 0
                while t < max(total_ms, 1):
                    k = 0
                    for i, s in enumerate(starts):
                        if s <= t:
                            k = i
                    if frame_hash[k] is None:
                        frame_hash[k] = ahash_bits_from_pixels(frames[k][1])
                    ids.append(aid)
                    f_ts.append(t)
                    f_idx.append(k)
                    f_time.append(starts[k])
                    hashes.append(frame_hash[k])
                    t += every_ms
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_ts_ms": pd.Series(f_ts, dtype="int32"),
                    "frame_index": pd.Series(f_idx, dtype="int32"),
                    "frame_time_ms": pd.Series(f_time, dtype="int64"),
                    "ahash_bits": pd.Series(hashes, dtype="object"),
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_ts_ms", T.IntegerType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_time_ms", T.LongType()),
            T.StructField("ahash_bits", T.StringType()),
        ]
    )
    return assets.select(id_col, payload_col).mapInPandas(_batches, schema)
