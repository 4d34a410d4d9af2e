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


def _read_frames(rfile, collector: SyslogCollector) -> None:
    """RFC6587 frame reader: octet-counting when the frame starts with a
    digit, newline-delimited otherwise (syslog.go nextLine parity)."""
    while True:
        first = rfile.read(1)
        if not first:
            return
        if first in b"\n\r":
            continue
        if first.isdigit():
            # octet-counting: "<len> <msg>"
            digits = bytearray(first)
            while True:
                b = rfile.read(1)
                if not b:
                    return
                if b == b" ":
                    break
                digits += b
                if len(digits) > 20:  # no real length needs more digits
                    return
            try:
                n = int(digits)
            except ValueError:
                return
            if n > MAX_MSG_LEN:
                return
            buf = rfile.read(n)
            if len(buf) < n:
                return
            collector.add(buf.decode("utf-8", "replace"))
        else:
            buf = bytearray(first)
            while True:
                b = rfile.read(1)
                if not b or b == b"\n":
                    break
                buf += b
                if len(buf) > MAX_MSG_LEN:
                    # the cap must bound BOTH framing modes (the
                    # reference enforces MaxLineSizeBytes on the line
                    # reader too): a newline-less client otherwise grows
                    # this buffer without bound (r14 review finding).
                    # Drop the connection like the oversize octet path.
                    return
            collector.add(bytes(buf).decode("utf-8", "replace"))


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
