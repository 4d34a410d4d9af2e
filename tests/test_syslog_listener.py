"""Syslog TCP/UDP listener tests: real sockets, RFC6587 framing parity."""

import socket
import time

from victorialogs_spark.sources.syslog_listener import (
    SyslogCollector,
    listen_tcp,
    listen_udp,
)

MSG1 = "<165>1 2024-01-01T00:00:05Z host1 app1 123 ID7 - structured hello"
MSG2 = "<34>Jan  2 03:04:05 host2 app2[77]: classic message"


def _wait(collector, n, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        with collector._lock:
            if len(collector._lines) >= n:
                return True
        time.sleep(0.02)
    return False


def test_tcp_mixed_framing():
    srv = listen_tcp()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            # octet-counting frame followed by a newline-delimited frame
            # on the SAME connection (syslog.go nextLine handles both)
            s.sendall(f"{len(MSG1)} {MSG1}".encode() + MSG2.encode() + b"\n")
        assert _wait(srv.collector, 2)
        lines = srv.collector.drain()
        assert lines == [MSG1, MSG2]
    finally:
        srv.stop()


def test_udp_datagrams():
    srv = listen_udp()
    try:
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            s.sendto(MSG1.encode(), ("127.0.0.1", srv.port))
            s.sendto(MSG2.encode() + b"\n" + MSG1.encode(), ("127.0.0.1", srv.port))
        assert _wait(srv.collector, 3)
        assert sorted(srv.collector.drain()) == sorted([MSG1, MSG2, MSG1])
    finally:
        srv.stop()


def test_drain_dataframe_parses(spark):
    srv = listen_tcp()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            s.sendall(f"{len(MSG1)} {MSG1}".encode())
            s.sendall(MSG2.encode() + b"\n")
        assert _wait(srv.collector, 2)
        df = srv.collector.drain_dataframe(spark)
        rows = {r["_msg"]: r.asDict() for r in df.collect()}
        assert rows["structured hello"]["hostname"] == "host1"
        assert rows["classic message"]["hostname"] == "host2"
        assert srv.collector.drain_dataframe(spark) is None  # drained empty
    finally:
        srv.stop()


def test_tcp_newline_framing_respects_max_len():
    """MAX_MSG_LEN bounds BOTH RFC6587 framing modes: a newline-less
    client must not grow the line buffer without bound (r14 review
    finding) — the reader drops the connection at the cap, and frames
    parsed before the oversize one survive."""
    import io

    from victorialogs_spark.sources.syslog_listener import (
        MAX_MSG_LEN,
        SyslogCollector,
        _read_frames,
    )

    good = b"<13>Jan  1 00:00:00 h app: ok\n"
    evil = b"A" * (MAX_MSG_LEN + 100)  # no newline, ever
    collector = SyslogCollector()
    _read_frames(io.BytesIO(good + evil), collector)
    lines = collector.drain()
    assert lines == [good[:-1].decode()]

    # the digits loop is capped too (digit stream with no space)
    collector2 = SyslogCollector()
    _read_frames(io.BytesIO(b"9" * 1000), collector2)
    assert collector2.drain() == []


def test_syslog_reader_corpus():
    """app/vlinsert/syslog/syslog_test.go TestSyslogLineReader_{Success,
    Failure} replayed through syslog_frames: mixed octet-counting and
    non-transparent framing, the space-less whole-stream quirks, and
    framing errors (bad/oversized octet counts)."""
    import sys
    from pathlib import Path

    import pytest

    sys.path.insert(0, str(Path(__file__).parent))
    from test_protocols import _extract_f_calls

    from victorialogs_spark.sources.syslog_listener import syslog_frames

    path = "/root/reference/app/vlinsert/syslog/syslog_test.go"

    good = _extract_f_calls(path, "TestSyslogLineReader_Success")
    assert len(good) >= 8, f"extraction regressed: {len(good)}"
    for blob, want in good:
        got = [f.decode() for f in syslog_frames(blob.encode())]
        assert got == (want or []), f"[{blob[:50]!r}] got {got} want {want}"

    bad = _extract_f_calls(path, "TestSyslogLineReader_Failure")
    assert len(bad) >= 3
    for (blob,) in bad:
        with pytest.raises(ValueError):
            syslog_frames(blob.encode())


def test_syslog_process_stream_corpus(spark):
    """app/vlinsert/syslog TestProcessStreamInternal_Success: the framed
    stream parses into the reference's exact rows (format, facility /
    severity keywords, RFC5424 SD params) and timestamps (µs)."""
    import re
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_protocols import _got_rows, _want_rows

    from victorialogs_spark.sources.protocols import parse_syslog_lines
    from victorialogs_spark.sources.syslog_listener import syslog_frames

    body = Path(
        "/root/reference/app/vlinsert/syslog/syslog_test.go"
    ).read_text().split("func TestProcessStreamInternal_Success")[1]
    blob = re.search(r"data := `([\s\S]*?)`", body).group(1)
    year = int(re.search(r"currentYear := (\d+)", body).group(1))
    ts_list = [
        int(x)
        for x in re.search(r"timestampsExpected := \[\]int64\{([^}]*)\}", body)
        .group(1)
        .split(",")
    ]
    want_s = re.search(r"resultExpected := `([\s\S]*?)`", body).group(1)

    lines = [f.decode() for f in syslog_frames(blob.encode())]
    df = parse_syslog_lines(
        spark, spark.createDataFrame([(l,) for l in lines], "value string"),
        year=year,
    )
    want = _want_rows(want_s)
    got = []
    for r in df.collect():
        d = {k: v for k, v in r.asDict().items() if v not in (None, "")}
        t = d.pop("_time", None)
        d.pop("_stream_id", None)
        d.pop("_day", None)
        d.pop("_stream", None)
        d.pop("_other", None)
        got.append((d, t))
    # order-insensitive: the distributed parse does not keep line order
    by_msg_want = {w["_msg"]: w for w in want}
    by_ts_want = dict(zip([w["_msg"] for w in want], ts_list))
    assert len(got) == len(want)
    for d, t in got:
        w = by_msg_want[d["_msg"]]
        assert d == w, (d, w)
        import datetime as dt

        t_us = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6) \
            if t.tzinfo is None else int(t.timestamp() * 1e6)
        assert t_us == by_ts_want[d["_msg"]] // 1000
