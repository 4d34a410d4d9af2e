"""Syslog TCP/UDP listeners (app/vlinsert/syslog/syslog.go:210-277).

Network receive is inherently driver/edge-side — the Spark work starts
once framed lines exist. These listeners implement the reference's wire
behavior exactly:

- TCP: RFC6587 framing — octet-counting (``<len> <msg>``) when a frame
  starts with a digit, else non-transparent (newline-delimited), mixed
  freely on one connection (syslog.go nextLine);
- UDP: one datagram = one or more newline-delimited messages.

Received lines buffer in a bounded, thread-safe collector;
``drain_dataframe`` hands them to sources.protocols.parse_syslog_lines
(the distributed RFC3164/5424 parser) in batches — the same
receive-then-parse split as the reference's line reader + processLine."""

from __future__ import annotations

import socket
import socketserver
import threading
from collections import deque

from pyspark.sql import DataFrame, SparkSession

MAX_MSG_LEN = 256 * 1024  # insertutil.MaxLineSizeBytes parity
MAX_BUFFERED_LINES = 1_000_000


class SyslogCollector:
    """Bounded thread-safe line buffer shared by the listeners."""

    def __init__(self, max_lines: int = MAX_BUFFERED_LINES):
        self._lines: deque[str] = deque(maxlen=max_lines)
        self._lock = threading.Lock()

    def add(self, line: str) -> None:
        line = line.strip()
        if line:
            with self._lock:
                self._lines.append(line)

    def drain(self) -> list[str]:
        with self._lock:
            out = list(self._lines)
            self._lines.clear()
        return out

    def drain_dataframe(
        self,
        spark: SparkSession,
        promote_keys: list[str] | None = None,
        year: int = 2024,
    ) -> DataFrame | None:
        """Drain buffered lines into a parsed log DataFrame (distributed
        parse via parse_syslog_lines); None when nothing buffered."""
        from victorialogs_spark.sources.protocols import parse_syslog_lines

        lines = self.drain()
        if not lines:
            return None
        lines_df = spark.createDataFrame([(ln,) for ln in lines], "value string")
        return parse_syslog_lines(spark, lines_df, promote_keys, year=year)


def _read_slice(rfile, delim: bytes, cap: int) -> tuple[bytes, bool]:
    """bufio.ReadSlice parity: bytes up to and INCLUDING ``delim``, plus
    an at-EOF flag. ``cap`` bounds the scan (ErrBufferFull in the
    reference aborts octet-counting prefixes; for the stuffing body the
    caller handles continuation — here one bounded read suffices since
    lines above MAX_MSG_LEN drop the connection anyway)."""
    buf = bytearray()
    while True:
        b = rfile.read(1)
        if not b:
            return bytes(buf), True
        buf += b
        if b == delim:
            return bytes(buf), False
        if len(buf) > cap:
            raise ValueError("frame longer than the line-size cap")


def next_syslog_frame(rfile, max_len: int = MAX_MSG_LEN) -> bytes | None:
    """One syslog wire frame, reference-exact (syslog.go:460 nextLine;
    pinned by the r15 syslog reader corpus). None at EOF; ValueError on
    framing errors (bad/oversized octet count, truncated payload).

    - the prefix is everything up to the first SPACE; leading '\\n's
      strip; an all-newlines/empty prefix retries;
    - a digit-leading prefix is octet-counting: its last byte drops (the
      space — or the final digit when EOF hit first, like the
      reference's unconditional prefix[:len-1]), the rest must parse as
      a decimal count <= max_len, and exactly that many bytes follow;
    - otherwise non-transparent framing: the line is the prefix plus
      everything up to (not including) the next '\\n', or through EOF —
      so a space-less stream keeps embedded newlines in ONE frame, and
      a space-less stream ending at EOF keeps its trailing newline."""
    prefix = b""
    while True:
        prefix, eof = _read_slice(rfile, b" ", max_len)
        prefix = prefix.lstrip(b"\n")
        if prefix:
            break
        if eof:
            return None
    if prefix[0:1].isdigit():
        # octet-counting: https://www.ietf.org/archive/id/
        # draft-gerhards-syslog-plain-tcp-07.html#msgxfer
        msg_len_str = prefix[:-1]
        if not msg_len_str.isdigit():
            raise ValueError(f"cannot parse message length {msg_len_str!r}")
        n = int(msg_len_str)
        if n > max_len:
            raise ValueError(f"cannot read message longer than {max_len}")
        buf = rfile.read(n)
        if len(buf) < n:
            raise ValueError(f"cannot read message with size {n}")
        return buf
    line = bytearray(prefix)
    rest, eof = _read_slice(rfile, b"\n", max_len)
    line += rest if eof else rest[:-1]
    return bytes(line)


def syslog_frames(data: bytes) -> list[bytes]:
    """All frames of a byte blob (tests + batch ingestion); raises
    ValueError on the first framing error, like the reference's reader
    stopping the stream."""
    import io

    rfile = io.BytesIO(data)
    out = []
    while True:
        frame = next_syslog_frame(rfile)
        if frame is None:
            return out
        out.append(frame)


def _read_frames(rfile, collector: SyslogCollector) -> None:
    """RFC6587 frame reader: octet-counting when the frame starts with a
    digit, newline-delimited otherwise (syslog.go nextLine parity); a
    framing error drops the connection, keeping frames already read."""
    while True:
        try:
            frame = next_syslog_frame(rfile)
        except ValueError:
            return
        if frame is None:
            return
        collector.add(frame.decode("utf-8", "replace"))


class _TCPHandler(socketserver.StreamRequestHandler):
    def handle(self):
        _read_frames(self.rfile, self.server.collector)


class _UDPHandler(socketserver.BaseRequestHandler):
    def handle(self):
        data = self.request[0]
        for raw in data.split(b"\n"):
            self.server.collector.add(raw.decode("utf-8", "replace"))


class SyslogListener:
    """One bound listener; ``collector`` accumulates framed lines."""

    def __init__(self, server: socketserver.BaseServer, collector: SyslogCollector):
        self.server = server
        self.collector = collector
        self.port = server.server_address[1]
        self._thread = threading.Thread(target=server.serve_forever, daemon=True)

    def start(self) -> "SyslogListener":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()


def listen_tcp(
    host: str = "127.0.0.1", port: int = 0, collector: SyslogCollector | None = None
) -> SyslogListener:
    collector = collector or SyslogCollector()
    srv = socketserver.ThreadingTCPServer((host, port), _TCPHandler, bind_and_activate=True)
    srv.daemon_threads = True
    srv.collector = collector
    return SyslogListener(srv, collector).start()


def listen_udp(
    host: str = "127.0.0.1", port: int = 0, collector: SyslogCollector | None = None
) -> SyslogListener:
    collector = collector or SyslogCollector()
    srv = socketserver.ThreadingUDPServer((host, port), _UDPHandler)
    srv.collector = collector
    return SyslogListener(srv, collector).start()
