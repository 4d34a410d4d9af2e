"""MP4 (ISO BMFF, ISO 14496-12) container parsing — no external libs.

Everything a frame-sampling pipeline shuffles on lives in the
CONTAINER, which is pure struct walking: the box tree and the sample
tables (stts decoding times, stss sync samples, stsz sizes, stsc/stco
chunk layout). This module makes the video story real through the
container AND — for MJPEG tracks, whose samples are standalone JPEGs —
through the frame decode itself (datapipe/jpeg.py); other codecs
(H.264 etc.) remain the documented ffmpeg integration point:

- :func:`parse_mp4` — box walk → per-track codec fourcc,
  timescale/duration + sample table: start time, size, byte offset,
  and sync flag per sample.
- :func:`extract_sample` — the byte range of one coded frame (a
  standalone JPEG for MJPEG tracks; an opaque codec payload otherwise).
- :func:`build_mp4` — minimal single-video-track writer (ftyp + mdat +
  moov) used by tests and deterministic synthetic registry payloads.
- :func:`video_frame_sample` (Spark) — the REAL version of the former
  frame_sample_plan: parse each asset's MP4 inside one narrow Arrow
  map, and for each target timestamp select the latest KEYFRAME at or
  before it (what a seek-accurate sampler does), emitting integer
  sample metadata. All selection is integer arithmetic on the sample
  table, so an independent SQL engine reproduces it exactly
  (driver_entry.py dp_mp4_frame_extract).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

# resource guard for untrusted crawled corpora: sample-table entry
# counts are 32-bit fields a few-byte crafted box can set to billions,
# and the stts run expansion ([delta] * count) would allocate that many
# list entries BEFORE any struct read fails (the webp/VP8L guard class,
# r15 ninth-pass finding). 4M samples ≈ 18h of 60 fps video — far above
# any real clip, small enough that a poisoned batch can't OOM a worker.
MP4_MAX_SAMPLES = 1 << 22


def _check_entries(n: int, entry_bytes: int, p: int, box_end: int, box: str) -> None:
    """A table's declared entry count must physically fit its box AND
    stay under the sample cap."""
    if n > MP4_MAX_SAMPLES or p + n * entry_bytes > box_end:
        raise ValueError(
            f"MP4 {box} table claims {n} entries — exceeds its box or the "
            f"{MP4_MAX_SAMPLES}-sample guard"
        )


def _walk(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, pos + hdr, pos + size
        pos += size


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    """(version, payload_start_after_version_flags)."""
    return data[start], start + 4


def parse_mp4(payload: bytes) -> dict:
    """Parse the container: returns {"timescale_movie", "tracks": [
    {"handler", "timescale", "duration", "samples": [{"index", "time",
    "dur", "size", "offset", "sync"}...]}]}. Raises ValueError on
    non-BMFF input or missing mandatory boxes."""
    if len(payload) < 12 or payload[4:8] not in (b"ftyp", b"moov", b"mdat"):
        raise ValueError("not an ISO-BMFF (MP4) file")
    movie_ts = None
    tracks = []
    for btype, s, e in _walk(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for t2, s2, e2 in _walk(payload, s, e):
            if t2 == b"mvhd":
                ver, p = _fullbox(payload, s2)
                if ver == 1:
                    (movie_ts,) = struct.unpack_from(">I", payload, p + 16)
                else:
                    (movie_ts,) = struct.unpack_from(">I", payload, p + 8)
            elif t2 == b"trak":
                tracks.append(_parse_trak(payload, s2, e2))
    if movie_ts is None or not tracks:
        raise ValueError("MP4 missing moov/mvhd/trak")
    return {"timescale_movie": movie_ts, "tracks": tracks}


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    handler = b""
    codec = ""
    ts, dur = None, None
    stts: list[tuple[int, int]] = []
    stss: list[int] | None = None
    sizes: list[int] = []
    stsc: list[tuple[int, int]] = []
    chunk_offsets: list[int] = []

    def walk_mdia(s, e):
        nonlocal handler, ts, dur
        for t3, s3, e3 in _walk(data, s, e):
            if t3 == b"mdhd":
                ver, p = _fullbox(data, s3)
                if ver == 1:
                    ts_, dur_ = struct.unpack_from(">IQ", data, p + 16)
                else:
                    ts_, dur_ = struct.unpack_from(">II", data, p + 8)
                ts, dur = ts_, dur_
            elif t3 == b"hdlr":
                _, p = _fullbox(data, s3)
                handler = data[p + 4 : p + 8]
            elif t3 == b"minf":
                for t4, s4, e4 in _walk(data, s3, e3):
                    if t4 == b"stbl":
                        walk_stbl(s4, e4)

    def walk_stbl(s, e):
        nonlocal stss, codec
        for t4, s4, e4 in _walk(data, s, e):
            _, p = _fullbox(data, s4)
            if t4 == b"stsd":
                # first sample entry's format fourcc = the track codec
                (n_ent,) = struct.unpack_from(">I", data, p)
                if n_ent >= 1:
                    codec = data[p + 8 : p + 12].decode("ascii", "replace")
            elif t4 == b"stts":
                (n,) = struct.unpack_from(">I", data, p)
                _check_entries(n, 8, p + 4, e4, "stts")
                total_count = 0
                for i in range(n):
                    count, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
                    total_count += count
                    if total_count > MP4_MAX_SAMPLES:
                        # the EXPANSION, not the table, is the hazard: one
                        # 8-byte run can claim 2^32 samples
                        raise ValueError(
                            "MP4 stts runs claim more samples than the "
                            f"{MP4_MAX_SAMPLES}-sample guard"
                        )
                    stts.append((count, delta))
            elif t4 == b"stss":
                (n,) = struct.unpack_from(">I", data, p)
                _check_entries(n, 4, p + 4, e4, "stss")
                stss = [
                    struct.unpack_from(">I", data, p + 4 + 4 * i)[0]
                    for i in range(n)
                ]
            elif t4 == b"stsz":
                uniform, n = struct.unpack_from(">II", data, p)
                if uniform:
                    if n > MP4_MAX_SAMPLES:
                        raise ValueError(
                            "MP4 stsz claims more samples than the "
                            f"{MP4_MAX_SAMPLES}-sample guard"
                        )
                    sizes.extend([uniform] * n)
                else:
                    _check_entries(n, 4, p + 8, e4, "stsz")
                    for i in range(n):
                        sizes.append(
                            struct.unpack_from(">I", data, p + 8 + 4 * i)[0]
                        )
            elif t4 == b"stsc":
                (n,) = struct.unpack_from(">I", data, p)
                _check_entries(n, 12, p + 4, e4, "stsc")
                for i in range(n):
                    fc, spc, _sdi = struct.unpack_from(">III", data, p + 4 + 12 * i)
                    stsc.append((fc, spc))
            elif t4 == b"stco":
                (n,) = struct.unpack_from(">I", data, p)
                _check_entries(n, 4, p + 4, e4, "stco")
                chunk_offsets.extend(
                    struct.unpack_from(">I", data, p + 4 + 4 * i)[0]
                    for i in range(n)
                )
            elif t4 == b"co64":
                (n,) = struct.unpack_from(">I", data, p)
                _check_entries(n, 8, p + 4, e4, "co64")
                chunk_offsets.extend(
                    struct.unpack_from(">Q", data, p + 4 + 8 * i)[0]
                    for i in range(n)
                )

    for t2, s2, e2 in _walk(data, start, end):
        if t2 == b"mdia":
            walk_mdia(s2, e2)

    # expand stts runs -> per-sample durations; stsc/stco -> offsets
    durs: list[int] = []
    for count, delta in stts:
        durs.extend([delta] * count)
    n_samples = len(sizes) if sizes else len(durs)
    offsets: list[int] = [0] * n_samples
    if chunk_offsets and stsc:
        si = 0
        for ci, coff in enumerate(chunk_offsets):
            spc = 0
            for fc, n_ in stsc:
                if fc <= ci + 1:
                    spc = n_
            off = coff
            for _ in range(spc):
                if si >= n_samples:
                    break
                offsets[si] = off
                off += sizes[si] if si < len(sizes) else 0
                si += 1
    sync = set(stss) if stss is not None else None  # None = all sync
    samples = []
    t = 0
    for i in range(n_samples):
        d = durs[i] if i < len(durs) else 0
        samples.append(
            {
                "index": i,
                "time": t,
                "dur": d,
                "size": sizes[i] if i < len(sizes) else 0,
                "offset": offsets[i],
                # stss sample numbers are 1-based (ISO 14496-12 8.6.2)
                "sync": True if sync is None else (i + 1) in sync,
            }
        )
        t += d
    return {
        "handler": handler.decode("ascii", "replace"),
        "codec": codec,
        "timescale": ts or 0,
        "duration": dur or t,
        "samples": samples,
    }


def extract_sample(payload: bytes, sample: dict) -> bytes:
    """Byte range of one coded sample — an opaque codec payload; real
    pixel decode is the ffmpeg integration point."""
    return payload[sample["offset"] : sample["offset"] + sample["size"]]


def build_mp4(
    sample_payloads: list[bytes],
    durations: list[int],
    sync_every: int = 3,
    timescale: int = 1000,
    codec: bytes = b"raw ",
) -> bytes:
    """Minimal single-video-track MP4: ftyp + mdat + moov. Sample k is a
    sync sample (keyframe) iff k % sync_every == 0. Offsets in stco are
    absolute file offsets into mdat, all samples in one chunk. ``codec``
    is the stsd sample-entry format fourcc (``b"mjpa"`` marks an
    MJPEG track whose samples are standalone JPEG images)."""
    assert len(sample_payloads) == len(durations) and sample_payloads
    mdat_payload = b"".join(sample_payloads)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _box(b"mdat", mdat_payload)
    data_start = len(ftyp) + 8  # mdat header is 8 bytes

    total = sum(durations)
    stts_entries = b""
    # run-length encode consecutive equal durations (real stts shape)
    run_d, run_n = durations[0], 0
    entries = []
    for d in durations:
        if d == run_d:
            run_n += 1
        else:
            entries.append((run_n, run_d))
            run_d, run_n = d, 1
    entries.append((run_n, run_d))
    for n, d in entries:
        stts_entries += struct.pack(">II", n, d)
    stts = _full(b"stts", struct.pack(">I", len(entries)) + stts_entries)
    syncs = [i + 1 for i in range(len(durations)) if i % sync_every == 0]
    stss = _full(
        b"stss",
        struct.pack(">I", len(syncs)) + b"".join(struct.pack(">I", s) for s in syncs),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, len(sample_payloads))
        + b"".join(struct.pack(">I", len(p)) for p in sample_payloads),
    )
    stsc = _full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, len(sample_payloads), 1))
    stco = _full(b"stco", struct.pack(">I", 1) + struct.pack(">I", data_start))
    # minimal stsd with a generic visual entry (no real codec config)
    entry = struct.pack(">I", 16 + 70) + codec[:4] + b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70
    stsd = _full(b"stsd", struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
    vmhd = _full(b"vmhd", b"\x00" * 8, flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"vid\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, total) + b"\x55\xc4\x00\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, total) + b"\x00" * 52,
        flags=7,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


# stsd format fourccs whose samples are standalone JPEG images (motion
# JPEG variants) — the one codec family decodable with the in-repo
# jpeg.py; everything else is the documented ffmpeg integration point
_MJPEG_CODECS = {"mjpa", "mjpb", "jpeg", "mjpg", "MJPG", "AVDJ"}


def video_frame_sample(
    assets: DataFrame,
    every_ms: int = 500,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    decode: bool = False,
) -> DataFrame:
    """Seek-accurate frame sampling over REAL MP4 containers: for each
    target timestamp t = j*every_ms (j = 0 .. while t < duration), emit
    the latest KEYFRAME sample at or before t — what a decoder seeks to
    before decoding forward. One narrow Arrow map, no shuffle; output
    is integer sample metadata (index/time/size/sync ordinal), the
    shape a 100 TB video pipeline groups and joins on. Undecodable
    payloads yield no rows (honest skip, like the other decoders).

    ``decode=True`` additionally DECODES each selected keyframe to
    pixels and emits its integer-exact aHash — real end-to-end for
    MJPEG tracks (stsd fourcc in ``_MJPEG_CODECS``: each sample is a
    standalone JPEG, decoded by datapipe/jpeg.py); frames of any other
    codec emit NULL ``ahash_bits`` (the honest ffmpeg boundary, now
    pushed past the container INTO the sample payload) — a raise here
    would kill the whole Spark stage and discard rows already built for
    OTHER assets in the batch, violating this docstring's skip
    contract (driver_entry.py dp_mp4_frame_ahash).

    Output: (<id_col>, frame_ts_ms int, sample_index int,
    sample_time_ms long, sample_size long[, ahash_bits string])."""

    def _batches(batches):
        import pandas as pd

        for pdf in batches:
            ids, f_ts, s_idx, s_time, s_size = [], [], [], [], []
            hashes = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                try:
                    meta = parse_mp4(buf)
                except Exception:
                    continue
                vts = [t for t in meta["tracks"] if t["handler"] == "vide"]
                if not vts:
                    continue
                tr = vts[0]
                decodable = tr["codec"] in _MJPEG_CODECS
                tsc = tr["timescale"] or 1000
                samples = tr["samples"]
                if not samples:
                    continue
                keys = [s for s in samples if s["sync"]]
                total_ms = sum(s["dur"] for s in samples) * 1000 // tsc
                t = 0
                while t < max(total_ms, 1):
                    # latest keyframe with start time <= t
                    sel = keys[0]
                    for s in keys:
                        if s["time"] * 1000 // tsc <= t:
                            sel = s
                        else:
                            break
                    ids.append(aid)
                    f_ts.append(t)
                    s_idx.append(sel["index"])
                    s_time.append(sel["time"] * 1000 // tsc)
                    s_size.append(sel["size"])
                    if decode and not decodable:
                        hashes.append(None)  # non-MJPEG codec: no decoder
                    elif decode:
                        from victorialogs_spark.datapipe.jpeg import (
                            decode_jpeg,
                        )
                        from victorialogs_spark.datapipe.multimodal import (
                            ahash_bits_from_pixels,
                        )

                        # truncated/corrupt sample bytes can surface as
                        # IndexError or struct.error from the bit reader,
                        # not just ValueError
                        try:
                            px = decode_jpeg(extract_sample(buf, sel))
                            hashes.append(ahash_bits_from_pixels(px))
                        except (ValueError, IndexError, struct.error):
                            hashes.append(None)  # corrupt frame payload
                    t += every_ms
            cols = {
                "__id": pd.Series(ids, dtype="object"),
                "frame_ts_ms": pd.Series(f_ts, dtype="int64"),
                "sample_index": pd.Series(s_idx, dtype="int64"),
                "sample_time_ms": pd.Series(s_time, dtype="int64"),
                "sample_size": pd.Series(s_size, dtype="int64"),
            }
            if decode:
                cols["ahash_bits"] = pd.Series(hashes, dtype="object")
            yield pd.DataFrame(cols)

    id_type = dict(assets.dtypes)[id_col]
    schema = (
        f"__id {id_type}, frame_ts_ms long, sample_index long,"
        " sample_time_ms long, sample_size long"
    )
    if decode:
        schema += ", ahash_bits string"
    out = assets.select(id_col, payload_col).mapInPandas(_batches, schema)
    return out.withColumnRenamed("__id", id_col)
