"""Property tests for the stdlib media codecs (no Spark): arbitrary
pixel content must round-trip PNG exactly (lossless, every filter
type, 8- and 16-bit, non-interlaced and Adam7), decode JPEG within
quantization error (lossy but bounded), decode PROGRESSIVE JPEG to the
bit-identical pixels of the baseline path (same quantized
coefficients, different scan order), and arbitrary sample tables must
round-trip the MP4 container exactly — including MJPEG frame decode
through the container."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from victorialogs_spark.datapipe.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from victorialogs_spark.datapipe.mp4 import build_mp4, extract_sample, parse_mp4
from victorialogs_spark.datapipe.multimodal import (
    _decode_png,
    ahash_bits_from_pixels,
    encode_png,
    encode_png_palette,
)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ch=st.sampled_from([1, 2, 3, 4]),
    ft=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(h, w, ch, ft, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = _decode_png(encode_png(px, filter_types=ft))
    if ch == 1:
        want = np.repeat(px[:, :, None], 3, axis=2)
    elif ch == 2:
        want = np.repeat(px[:, :, :1], 3, axis=2)
    else:
        want = px[:, :, :3]
    assert dec.dtype == np.uint8 and (dec == want).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ch=st.sampled_from([1, 2, 3, 4]),
    ft=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
    depth=st.sampled_from([8, 16]),
    interlace=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**31),
)
def test_png_16bit_adam7_roundtrip_property(h, w, ch, ft, depth, interlace, seed):
    """16-bit samples recover their high byte (>>8 conversion); Adam7
    pass reassembly is pixel-exact for every geometry, filter type, and
    channel count — including degenerate sizes where passes are empty."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    if depth == 8:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        hi = px
    else:
        px = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        hi = (px >> 8).astype(np.uint8)
    dec = _decode_png(
        encode_png(px, filter_types=ft, bit_depth=depth, interlace=interlace)
    )
    if ch == 1:
        want = np.repeat(hi[:, :, None], 3, axis=2)
    elif ch == 2:
        want = np.repeat(hi[:, :, :1], 3, axis=2)
    else:
        want = hi[:, :, :3]
    assert dec.dtype == np.uint8 and (dec == want).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    depth=st.sampled_from([1, 2, 4, 8]),
    ft=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
    interlace=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**31),
)
def test_png_palette_equals_direct_rgb_property(h, w, depth, ft, interlace, seed):
    """A palette PNG must decode to EXACTLY the pixels of a direct-RGB
    PNG of the same expanded image (palette[idx]) — the two encodings
    are alternative containers for identical content, so the decoders
    must agree byte-for-byte at every bit depth, filter type, and
    interlace geometry (sub-byte rows exercise pad-bit dropping at
    every Adam7 pass width)."""
    rng = np.random.default_rng(seed)
    ncol = 1 << depth
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
    via_palette = _decode_png(
        encode_png_palette(idx, pal, bit_depth=depth, filter_types=ft,
                           interlace=interlace)
    )
    via_rgb = _decode_png(encode_png(pal[idx], filter_types=ft))
    assert via_palette.dtype == np.uint8
    assert (via_palette == via_rgb).all()
    assert (via_palette == pal[idx]).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    depth=st.sampled_from([1, 2, 4]),
    ft=st.sampled_from([0, 1, 2, 3, 4, "cycle"]),
    interlace=st.sampled_from([0, 1]),
    seed=st.integers(0, 2**31),
)
def test_png_subbyte_grey_max_value_expansion_property(
    h, w, depth, ft, interlace, seed
):
    """Sub-byte greyscale decodes via the standard max-value expansion
    (0..2^d-1 -> 0..255: x * 255/(2^d - 1), an integer for d in 1/2/4),
    replicated to 3 channels."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
    dec = _decode_png(
        encode_png_palette(g, None, bit_depth=depth, filter_types=ft,
                           interlace=interlace)
    )
    want = (g * (255 // ((1 << depth) - 1))).astype(np.uint8)
    assert (dec == np.repeat(want[:, :, None], 3, axis=2)).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    grey=st.booleans(),
    rst=st.sampled_from([0, 1, 3]),
    seed=st.integers(0, 2**31),
)
def test_progressive_jpeg_equals_baseline_property(h, w, grey, rst, seed):
    """Progressive (SOF2) coding is a REORDERING of the same quantized
    coefficients — once every scan is applied (spectral bands + all
    successive-approximation refinements) the decode must be
    bit-identical to the baseline path, for ARBITRARY pixel content
    (not just smooth), any geometry, and with restart markers."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if grey else (h, w, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, restart_interval=rst))
    prog = decode_jpeg(encode_jpeg_progressive(px, restart_interval=rst))
    assert prog.dtype == np.uint8 and (prog == base).all()


@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    grey=st.booleans(),
    rst=st.sampled_from([0, 1, 2]),
    seed=st.integers(0, 2**31),
)
def test_jpeg_roundtrip_bounded_error_property(h, w, grey, rst, seed):
    """Lossy, but the loss is bounded: SMOOTH content (low-frequency)
    reconstructs within a few grey levels; restart markers never change
    the pixels; output is always HxWx3 uint8."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(40, 215)
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = base + 20 * np.sin(xx / 7.0 + rng.uniform(0, 3)) \
        + 15 * np.cos(yy / 6.0 + rng.uniform(0, 3))
    if grey:
        px = np.clip(smooth, 0, 255).astype(np.uint8)
    else:
        px = np.clip(
            np.stack([smooth, smooth + rng.uniform(-9, 9), smooth], axis=2),
            0, 255,
        ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px))
    assert dec.shape == (h, w, 3) and dec.dtype == np.uint8
    ref = px.astype(float) if not grey else px[:, :, None].astype(float)
    assert np.abs(dec.astype(float) - ref).mean() < 10.0
    if rst:
        dec2 = decode_jpeg(encode_jpeg(px, restart_interval=rst))
        assert (dec2 == dec).all()


@settings(max_examples=25, deadline=None)
@given(
    ns=st.integers(1, 12),
    sync_every=st.integers(1, 5),
    timescale=st.sampled_from([600, 1000, 90000]),
    seed=st.integers(0, 2**31),
)
def test_mp4_sample_table_roundtrip_property(ns, sync_every, timescale, seed):
    rng = np.random.default_rng(seed)
    durs = [int(d) for d in rng.integers(1, 5000, size=ns)]
    sizes = [int(s) for s in rng.integers(1, 200, size=ns)]
    payloads = [bytes([i % 256]) * sizes[i] for i in range(ns)]
    b = build_mp4(payloads, durs, sync_every=sync_every, timescale=timescale)
    tr = parse_mp4(b)["tracks"][0]
    assert tr["handler"] == "vide" and tr["timescale"] == timescale
    assert len(tr["samples"]) == ns
    t = 0
    for i, s in enumerate(tr["samples"]):
        assert s["time"] == t and s["dur"] == durs[i]
        assert s["size"] == sizes[i]
        assert s["sync"] == (i % sync_every == 0)
        assert extract_sample(b, s) == payloads[i]
        t += durs[i]
    assert tr["duration"] == t
    assert tr["codec"] == "raw "  # default stsd fourcc


@settings(max_examples=10, deadline=None)
@given(
    ns=st.integers(1, 8),
    sync_every=st.integers(1, 4),
    progressive_odd=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_mjpeg_in_mp4_frames_decode_property(ns, sync_every, progressive_odd, seed):
    """MJPEG tracks (stsd fourcc mjpa) carry standalone JPEGs as
    samples: extracting any sample and decoding it must reproduce the
    source frame's flat-block pixels exactly (DC-only integer fast
    path), whether each frame was baseline- or progressive-encoded."""
    rng = np.random.default_rng(seed)
    frames, pixels = [], []
    for k in range(ns):
        v = rng.integers(0, 256, size=(3, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)
        enc = encode_jpeg_progressive if (progressive_odd and k % 2) else encode_jpeg
        frames.append(enc(img))
        pixels.append(img)
    durs = [int(d) for d in rng.integers(50, 500, size=ns)]
    b = build_mp4(frames, durs, sync_every=sync_every, codec=b"mjpa")
    tr = parse_mp4(b)["tracks"][0]
    assert tr["codec"] == "mjpa"
    for k, s in enumerate(tr["samples"]):
        dec = decode_jpeg(extract_sample(b, s))
        # flat blocks: decode = clamp(floor((floor(8(v-128)/17+.5)*17+4)/8)+128)
        v = pixels[k].astype(np.int64)
        dc = np.floor(8.0 * (v - 128) / 17.0 + 0.5).astype(np.int64)
        want = np.clip((dc * 17 + 4) // 8 + 128, 0, 255).astype(np.uint8)
        assert (dec == np.repeat(want[:, :, None], 3, axis=2)).all()
        assert ahash_bits_from_pixels(dec) is not None


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncol=st.sampled_from([2, 3, 4, 5, 16, 37, 256]),
    interlace=st.booleans(),
    local=st.booleans(),
    v89=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_property(h, w, ncol, interlace, local, v89, seed):
    """GIF is lossless: decode(encode(idx, pal)) == pal[idx] across
    palette sizes (code sizes 2-8), interlaced storage, global/local
    color table placement, and 87a/89a (89a adds extension blocks the
    decoder must skip)."""
    from victorialogs_spark.datapipe.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
    g = encode_gif(
        idx, pal, interlace=interlace, local_palette=local,
        version=b"GIF89a" if v89 else b"GIF87a",
    )
    assert g[:6] == (b"GIF89a" if v89 else b"GIF87a")
    assert np.array_equal(decode_gif(g), pal[idx])


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31), runs=st.booleans())
def test_gif_lzw_12bit_cap_property(seed, runs):
    """Streams long/diverse enough to fill the 4096-entry dictionary
    force the 12-bit width cap and the encoder's clear-code reset; the
    decoder must resynchronize exactly."""
    from victorialogs_spark.datapipe.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(seed)
    if runs:
        # long runs grow entries fast (hits the cap with fewer codes)
        parts = [bytes([rng.integers(0, 256)]) * int(rng.integers(1, 60))
                 for _ in range(600)]
        data = b"".join(parts)
    else:
        data = bytes(rng.integers(0, 256, size=20000, dtype=np.uint8))
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_gif_animation_disposal_semantics():
    """Deterministic GIF89a compositing pin: sub-rectangle frames with
    disposal 1 (leave: patches accumulate), 3 (restore-to-previous),
    2 (restore-to-background), and transparency (index pixels leave
    the canvas unchanged). Expected canvases written out by hand."""
    from victorialogs_spark.datapipe.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
        np.uint8,
    )
    base = np.full((6, 6), 1, np.uint8)
    patch2 = np.full((2, 2), 2, np.uint8)
    patch3 = np.full((2, 2), 3, np.uint8)
    g = encode_gif_animation(
        [
            {"indices": base, "delay_cs": 10, "disposal": 1},
            {"indices": patch2, "left": 2, "top": 2, "delay_cs": 20,
             "disposal": 1},
            {"indices": patch3, "left": 2, "top": 2, "delay_cs": 30,
             "disposal": 3},
            {"indices": patch3, "left": 0, "top": 0, "delay_cs": 5,
             "disposal": 2},
        ],
        pal,
        background=4,
    )
    frames = decode_gif_frames(g)
    assert [f[0] for f in frames] == [10, 20, 30, 5]
    f0, f1, f2, f3 = [f[1] for f in frames]
    assert (f0 == pal[1]).all()
    # frame 1: base everywhere, center 2x2 shows color 2
    want1 = np.tile(pal[1], (6, 6, 1)).astype(np.uint8)
    want1[2:4, 2:4] = pal[2]
    assert np.array_equal(f1, want1)
    # frame 1's disposal was "leave", so patch 3 overwrites patch 2
    want2 = want1.copy()
    want2[2:4, 2:4] = pal[3]
    assert np.array_equal(f2, want2)
    # frame 2's disposal 3 restored its region to patch-2 state, then
    # frame 3 lands at the origin
    want3 = want1.copy()
    want3[0:2, 0:2] = pal[3]
    assert np.array_equal(f3, want3)


def test_gif_animation_transparency():
    from victorialogs_spark.datapipe.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)
    base = np.full((4, 4), 1, np.uint8)
    tp = np.array([[2, 0], [0, 2]], np.uint8)  # 0 = transparent
    g = encode_gif_animation(
        [
            {"indices": base, "delay_cs": 10, "disposal": 1},
            {"indices": tp, "left": 1, "top": 1, "delay_cs": 10,
             "disposal": 1, "transparent": 0},
        ],
        pal,
    )
    _, fb = [f[1] for f in decode_gif_frames(g)]
    want = np.tile(pal[1], (4, 4, 1)).astype(np.uint8)
    want[1, 1] = pal[2]
    want[2, 2] = pal[2]
    assert np.array_equal(fb, want)


@settings(max_examples=20, deadline=None)
@given(
    n_frames=st.integers(2, 5),
    disposal=st.sampled_from([0, 1, 2, 3]),
    transparent=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_gif_animation_roundtrip_property(n_frames, disposal, transparent,
                                          seed):
    """decode_gif_frames must equal an independent straight-line
    compositor (written here from the GIF89a disposal rules) for random
    sub-rectangle animations across disposal methods and transparency."""
    from victorialogs_spark.datapipe.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    sw = sh = 10
    bg = 5
    frames = [{
        "indices": rng.integers(0, 8, size=(sh, sw), dtype=np.uint8),
        "delay_cs": int(rng.integers(1, 30)), "disposal": 1,
    }]
    for _ in range(n_frames - 1):
        h, w = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        frames.append({
            "indices": rng.integers(0, 8, size=(h, w), dtype=np.uint8),
            "left": int(rng.integers(0, sw - w + 1)),
            "top": int(rng.integers(0, sh - h + 1)),
            "delay_cs": int(rng.integers(1, 30)),
            "disposal": disposal,
            "transparent": 0 if transparent else None,
        })
    g = encode_gif_animation(frames, pal, screen=(sw, sh), background=bg)
    got = decode_gif_frames(g)

    # independent compositor
    canvas = np.tile(pal[bg], (sh, sw, 1)).astype(np.uint8)
    want = []
    for fr in frames:
        idx = fr["indices"]
        h, w = idx.shape
        le, to = fr.get("left", 0), fr.get("top", 0)
        before = canvas[to : to + h, le : le + w].copy()
        region = pal[idx]
        if fr.get("transparent") is not None:
            region = np.where(
                (idx == fr["transparent"])[:, :, None], before, region
            )
        canvas[to : to + h, le : le + w] = region
        want.append((fr["delay_cs"], canvas.copy()))
        d = fr.get("disposal", 0)
        if d == 2:
            canvas[to : to + h, le : le + w] = pal[bg]
        elif d == 3:
            canvas[to : to + h, le : le + w] = before
    assert len(got) == len(want)
    for (gd, gpx), (wd, wpx) in zip(got, want):
        assert gd == wd
        assert np.array_equal(gpx, wpx)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    rgb=st.booleans(),
    bo=st.sampled_from(["II", "MM"]),
    comp=st.sampled_from([1, 5, 32773]),
    pred=st.sampled_from([1, 2]),
    rps=st.sampled_from([0, 1, 3, 8]),  # 0 -> single strip
    seed=st.integers(0, 2**31),
)
def test_tiff_roundtrip_property(h, w, rgb, bo, comp, pred, rps, seed):
    """Baseline TIFF is lossless: decode(encode(px)) == px across both
    byte orders, grayscale/RGB, none/LZW/PackBits compression, the
    horizontal predictor, and single-/multi-strip layouts (including a
    final short strip when RowsPerStrip does not divide the height)."""
    from victorialogs_spark.datapipe.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    t = encode_tiff(px, compression=comp, byte_order=bo, predictor=pred,
                    rows_per_strip=rps or None)
    got = decode_tiff(t)
    want = px if rgb else np.repeat(px[:, :, None], 3, axis=2)
    assert np.array_equal(got, want)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31), runs=st.booleans())
def test_tiff_lzw_early_change_and_reset_property(seed, runs):
    """Streams long/diverse enough to cross every width transition
    (510/1022/2046 — the EARLY-change points) and the 4094-entry clear
    reset; the decoder must resynchronize exactly. Mirrors the GIF
    12-bit-cap property for the TIFF LZW variant."""
    from victorialogs_spark.datapipe.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    rng = np.random.default_rng(seed)
    if runs:
        parts = [bytes([rng.integers(0, 256)]) * int(rng.integers(1, 60))
                 for _ in range(600)]
        data = b"".join(parts)
    else:
        data = bytes(rng.integers(0, 256, size=20000, dtype=np.uint8))
    enc = _lzw_encode_tiff(data)
    assert _lzw_decode_tiff(enc, len(data)) == data


def test_tiff_whitelszero_and_errors():
    """Photometric 0 inverts; unsupported shapes fail with codec-level
    messages, not downstream reshape/IndexError noise."""
    import pytest

    from victorialogs_spark.datapipe.tiff import decode_tiff, encode_tiff

    g = np.arange(63, dtype=np.uint8).reshape(9, 7)
    t = encode_tiff(g, photometric=0)
    assert np.array_equal(decode_tiff(t), np.repeat((255 - g)[:, :, None], 3, axis=2))

    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"ZZZZ" + bytes(16))
    # corrupt the strip-data region so LZW hits garbage codes
    bad = bytearray(encode_tiff(g, compression=5))
    bad[10:14] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="TIFF LZW"):
        decode_tiff(bytes(bad))
    # truncated PackBits strip
    pb = encode_tiff(g, compression=32773)
    with pytest.raises(ValueError, match="TIFF"):
        decode_tiff(pb[: len(pb) // 2])


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    depth=st.sampled_from([1, 4, 16]),
    rgb=st.booleans(),
    bo=st.sampled_from(["II", "MM"]),
    comp=st.sampled_from([1, 5, 32773]),
    seed=st.integers(0, 2**31),
)
def test_tiff_depth_roundtrip_property(h, w, depth, rgb, bo, comp, seed):
    """Non-8-bit TIFF depths: 16-bit samples recover via the high-byte
    rule in either byte order; 1/4-bit grayscale (MSB-first sub-byte
    packing, per-row byte padding — including widths that make the pad
    nonzero) scales exactly to the 8-bit range (x255 / x17)."""
    from victorialogs_spark.datapipe.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    if depth in (1, 4):
        if rgb:
            rgb = False  # sub-byte RGB does not exist in baseline TIFF
        hi = 2 if depth == 1 else 16
        px = rng.integers(0, hi, size=(h, w), dtype=np.uint8)
        want = np.repeat(
            (px * (255 if depth == 1 else 17))[:, :, None], 3, axis=2
        )
    else:
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = px if rgb else np.repeat(px[:, :, None], 3, axis=2)
    t = encode_tiff(px, compression=comp, byte_order=bo, bit_depth=depth,
                    rows_per_strip=max(1, h // 2))
    assert np.array_equal(decode_tiff(t), want)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    transform=st.sampled_from(
        ["none", "sg", "pred", "sg+pred", "palette"]
    ),
    mode=st.integers(0, 13),
    ncol=st.sampled_from([2, 3, 4, 11, 16, 40, 256]),
    seed=st.integers(0, 2**31),
)
def test_vp8l_roundtrip_property(h, w, transform, mode, ncol, seed):
    """VP8L is lossless: decode(encode(px)) == px across all 14
    predictor modes, subtract-green, their combination, and the
    color-indexing transform at every pixel-bundling width (8/4/2
    indices per byte and the unbundled >16-color case)."""
    from victorialogs_spark.datapipe.webp import decode_vp8l, encode_vp8l

    rng = np.random.default_rng(seed)
    if transform == "palette":
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        px = pal[rng.integers(0, ncol, size=(h, w))]
        data = encode_vp8l(px, palette=True)
    else:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = encode_vp8l(
            px,
            subtract_green=transform in ("sg", "sg+pred"),
            predictor=mode if transform in ("pred", "sg+pred") else None,
        )
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert np.array_equal(decode_vp8l(data), px)


def test_vp8l_container_and_boundaries():
    """Container walking and the honest boundary: a VP8X extended
    container still finds the VP8L chunk behind metadata chunks; a
    lossy 'VP8 ' payload raises NotImplementedError naming the
    boundary; non-WebP RIFF raises ValueError."""
    import struct as _s

    import pytest as _pytest

    from victorialogs_spark.datapipe.webp import decode_vp8l, encode_vp8l

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    plain = encode_vp8l(px)
    vp8l_chunk = plain[12:]  # the VP8L chunk (tag + size + body [+pad])
    # rebuild as VP8X: a 10-byte VP8X header chunk, an EXIF chunk the
    # walker must skip (odd size -> exercises 2-byte chunk alignment),
    # then the original VP8L chunk
    vp8x = b"VP8X" + _s.pack("<I", 10) + bytes(10)
    exif = b"EXIF" + _s.pack("<I", 3) + b"abc" + b"\x00"
    payload = vp8x + exif + vp8l_chunk
    ext = b"RIFF" + _s.pack("<I", 4 + len(payload)) + b"WEBP" + payload
    assert np.array_equal(decode_vp8l(ext), px)

    lossy = b"RIFF" + _s.pack("<I", 16) + b"WEBP" + b"VP8 " + _s.pack("<I", 4) + bytes(4)
    with _pytest.raises(NotImplementedError, match="lossy"):
        decode_vp8l(lossy)
    with _pytest.raises(ValueError):
        decode_vp8l(b"RIFF\x04\x00\x00\x00WAVEdata")


def test_vp8l_multimodal_dispatch():
    """The stdlib magic-byte dispatch routes RIFF/WEBP payloads to the
    VP8L decoder (and keeps RIFF/WAVE on the WAV path)."""
    from victorialogs_spark.datapipe.multimodal import _stdlib_decode_pixels
    from victorialogs_spark.datapipe.webp import encode_vp8l

    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert np.array_equal(_stdlib_decode_pixels(encode_vp8l(px)), px)


def test_webp_animation_compositing():
    """ANMF compositing semantics: sub-rectangle frames overwrite their
    region (blend bit set by the encoder default), later patches stack,
    and dispose-to-background restores the frame rect to the ANIM
    background color AFTER the frame displays."""
    from victorialogs_spark.datapipe.webp import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    patch = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    tail = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    data = encode_webp_anim(
        [
            {"px": base, "duration_ms": 100},
            {"px": patch, "x": 4, "y": 2, "duration_ms": 50, "dispose": 1},
            {"px": tail, "x": 0, "y": 0, "duration_ms": 70},
        ],
        (12, 10),
        bg=(9, 8, 7, 255),
    )
    frames = decode_webp_frames(data)
    assert [d for d, _ in frames] == [100, 50, 70]
    f0, f1, f2 = [px for _, px in frames]
    assert np.array_equal(f0, base)
    exp1 = base.copy()
    exp1[2:6, 4:8] = patch
    assert np.array_equal(f1, exp1)
    # frame 1 disposed to background: its rect is bg under frame 2
    exp2 = base.copy()
    exp2[2:6, 4:8] = [9, 8, 7]
    exp2[0:2, 0:2] = tail
    assert np.array_equal(f2, exp2)
    # max_frames cap
    assert len(decode_webp_frames(data, max_frames=2)) == 2
    # a still image decodes as one zero-duration frame
    from victorialogs_spark.datapipe.webp import encode_vp8l

    sf = decode_webp_frames(encode_vp8l(base))
    assert len(sf) == 1 and sf[0][0] == 0 and np.array_equal(sf[0][1], base)


def test_webp_frame_sample_spark(spark):
    """webp_frame_sample end to end on Spark: sampled indices follow the
    duration timeline, hashes are 64-bit strings, undecodable payloads
    yield no rows."""
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.webp import (
        encode_webp_anim,
        webp_frame_sample,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    patch = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    anim = encode_webp_anim(
        [
            {"px": base, "duration_ms": 300},
            {"px": patch, "x": 4, "y": 4, "duration_ms": 200},
        ],
        (16, 16),
    )
    assets = spark.createDataFrame(
        [(1, bytearray(anim)), (2, bytearray(b"not webp"))],
        "asset_id long, payload binary",
    )
    rows = webp_frame_sample(assets, every_ms=250).orderBy(
        "asset_id", "frame_ts_ms"
    ).collect()
    assert [r.asset_id for r in rows] == [1, 1]  # bad payload skipped
    assert [r.frame_ts_ms for r in rows] == [0, 250]
    assert [r.frame_index for r in rows] == [0, 0]  # frame 1 starts at 300
    assert all(len(r.ahash_bits) == 64 for r in rows)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31), cut=st.floats(0.01, 0.99))
def test_vp8l_truncation_raises_never_hangs(seed, cut):
    """Every prefix-truncated VP8L payload (still or animated) must
    raise promptly (ValueError/NotImplementedError family) — never
    hang, never return garbage silently. The bit reader raises on
    read-past-end and every decode loop strictly advances, so this
    pins the no-infinite-loop property under corruption."""
    from victorialogs_spark.datapipe.webp import (
        decode_vp8l,
        decode_webp_frames,
        encode_vp8l,
        encode_webp_anim,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    still = encode_vp8l(px, subtract_green=True)
    anim = encode_webp_anim(
        [{"px": px, "duration_ms": 80},
         {"px": px[:4, :4], "x": 2, "y": 2, "duration_ms": 90}],
        (7, 9),
    )
    import struct as _struct

    import pytest as _pytest

    for payload, dec in ((still, decode_vp8l), (anim, decode_webp_frames)):
        n = max(1, int(len(payload) * cut))
        # every STRICT prefix must raise: the RIFF gate validates the
        # declared container/chunk sizes against the buffer, so a cut
        # at a chunk boundary can no longer decode as a silently
        # shorter animation (r14 review finding)
        with _pytest.raises(
            (ValueError, NotImplementedError, IndexError, _struct.error)
        ):
            dec(payload[:n])


def test_vp8l_bitflip_corruption_is_loud_or_decodes(seed=7):
    """Single-byte corruptions inside the VP8L body either raise loudly
    or decode to SOME image (prefix codes can absorb flips) — but must
    never hang. Smoke over 40 positions."""
    from victorialogs_spark.datapipe.webp import decode_vp8l, encode_vp8l

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    import struct as _struct

    data = bytearray(encode_vp8l(px))
    for pos in range(20, min(len(data), 60)):
        mut = bytearray(data)
        mut[pos] ^= 0xFF
        try:
            decode_vp8l(bytes(mut))
        except (ValueError, NotImplementedError, IndexError, _struct.error):
            pass
