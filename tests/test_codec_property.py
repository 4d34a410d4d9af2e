"""Property tests for the stdlib media codecs (no Spark): arbitrary
pixel content must round-trip PNG exactly (lossless, every filter
type), decode JPEG within quantization error (lossy but bounded), and
arbitrary sample tables must round-trip the MP4 container exactly."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from victorialogs_spark.datapipe.jpeg import decode_jpeg, encode_jpeg
from victorialogs_spark.datapipe.mp4 import build_mp4, extract_sample, parse_mp4
from victorialogs_spark.datapipe.multimodal import _decode_png, encode_png


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
