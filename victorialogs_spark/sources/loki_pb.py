"""Loki push-protocol wire formats, dependency-free:

- snappy BLOCK format codec (the transport promtail/Grafana Agent put
  around the protobuf body by default — reference
  app/vlinsert/loki/loki_protobuf.go:44 defaults Content-Encoding to
  "snappy"); pure Python per https://github.com/google/snappy
  format_description.txt;
- the PushRequest protobuf (app/vlinsert/loki/pb.go: PushRequest{
  repeated Stream streams=1 }, Stream{ string labels=1, repeated Entry
  entries=2 }, Entry{ Timestamp timestamp=1, string line=2, repeated
  LabelPair structuredMetadata=3 }, LabelPair{ name=1, value=2 });
- parsePromLabels (loki_protobuf.go:155): `{name="value", ...}` with
  Go strconv.Unquote value semantics.

Row assembly (metadata → message → msg_fields renaming) is shared with
the JSON path in sources/protocols.py; this module is wire-only."""

from __future__ import annotations

from victorialogs_spark.sources.otlp_pb import (
    _WT_LEN,
    _WT_VARINT,
    _len_field,
    _read_varint,
    _varint,
    iter_fields,
)

# ------------------------------------------------------------------ snappy

_MAX_SNAPPY_LEN = 1 << 30  # decoded-size guard for untrusted payloads


def snappy_decode(data: bytes) -> bytes:
    """Snappy block format → raw bytes. Raises ValueError on any
    malformed input (truncated preamble, bad offsets, length overrun)."""
    mv = memoryview(data)
    try:
        total, pos = _read_varint(mv, 0)
    except (IndexError, ValueError) as e:
        raise ValueError(f"snappy: bad preamble: {e}") from None
    if total > _MAX_SNAPPY_LEN:
        raise ValueError(f"snappy: decoded length {total} exceeds cap")
    out = bytearray()
    n = len(mv)
    while pos < n:
        tag = mv[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59  # 60→1, 61→2, 62→3, 63→4 length bytes
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(mv[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += mv[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            length = 4 + ((tag >> 2) & 0x7)
            offset = ((tag >> 5) << 8) | mv[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            length = 1 + (tag >> 2)
            offset = int.from_bytes(mv[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            length = 1 + (tag >> 2)
            offset = int.from_bytes(mv[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        # copies may overlap forward (offset < length repeats the tail)
        start = len(out) - offset
        for i in range(length):
            out.append(out[start + i])
        if len(out) > total:
            raise ValueError("snappy: output exceeds declared length")
    if len(out) != total:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble says {total}"
        )
    return bytes(out)


def snappy_encode(data: bytes) -> bytes:
    """Valid (uncompressed) snappy block stream: the preamble plus one
    max-width literal element per 4 GiB chunk. Decoders — including
    snappy_decode above and the reference's github.com/golang/snappy —
    accept all-literal streams; used by tests and ingest tooling."""
    out = bytearray(_varint(len(data)))
    for pos in range(0, len(data), 1 << 32):
        chunk = data[pos : pos + (1 << 32)]
        out.append(0xFC)  # literal, 4 length bytes
        out += (len(chunk) - 1).to_bytes(4, "little")
        out += chunk
    return bytes(out)


# ------------------------------------------------- Go quoted strings

_GO_ESC = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
    "v": "\v", "\\": "\\", '"': '"',
}


def go_quoted_prefix(s: str) -> tuple[str, int]:
    """strconv.QuotedPrefix + Unquote for a double- or back-quoted Go
    string at the START of ``s`` → (value, chars consumed). Raises
    ValueError when s does not begin with a complete quoted string."""
    if not s:
        raise ValueError("empty string")
    q = s[0]
    if q == "`":
        j = s.find("`", 1)
        if j < 0:
            raise ValueError("unterminated raw string")
        return s[1:j].replace("\r", ""), j + 1
    if q != '"':
        raise ValueError(f"not a quoted string: {s[:10]!r}")
    out: list[str] = []
    i = 1
    while i < len(s):
        c = s[i]
        if c == '"':
            return "".join(out), i + 1
        if c == "\n":
            raise ValueError("newline in quoted string")
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= len(s):
            raise ValueError("trailing backslash")
        e = s[i + 1]
        if e in _GO_ESC:
            out.append(_GO_ESC[e])
            i += 2
        elif e == "x":
            out.append(chr(int(s[i + 2 : i + 4], 16)))
            i += 4
        elif e == "u":
            out.append(chr(int(s[i + 2 : i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(s[i + 2 : i + 10], 16)))
            i += 10
        elif e in "01234567":
            out.append(chr(int(s[i + 1 : i + 4], 8)))
            i += 4
        else:
            raise ValueError(f"invalid escape \\{e}")
    raise ValueError("unterminated quoted string")


def go_quote(s: str) -> str:
    """strconv.Quote-compatible rendering (enough for round-tripping
    parse_prom_labels: printable ASCII kept, the rest escaped)."""
    out = ['"']
    for c in s:
        if c == '"':
            out.append('\\"')
        elif c == "\\":
            out.append("\\\\")
        elif c in ("\a", "\b", "\f", "\n", "\r", "\t", "\v"):
            out.append(
                {"\a": "\\a", "\b": "\\b", "\f": "\\f", "\n": "\\n",
                 "\r": "\\r", "\t": "\\t", "\v": "\\v"}[c]
            )
        elif " " <= c <= "~":
            out.append(c)
        elif ord(c) < 0x80:
            out.append(f"\\x{ord(c):02x}")
        elif ord(c) <= 0xFFFF:
            out.append(f"\\u{ord(c):04x}")
        else:
            out.append(f"\\U{ord(c):08x}")
    out.append('"')
    return "".join(out)


def parse_prom_labels(s: str) -> list[tuple[str, str]]:
    """parsePromLabels replica (loki_protobuf.go:155): `{n="v", ...}` →
    [(name, value)]; ValueError on malformed input. Names are taken
    verbatim up to `=`; values are Go-unquoted; separators are a
    mandatory `,` plus at most one optional space."""
    s = s.strip()
    if len(s) < 2:
        raise ValueError(f"too short string to parse: {s!r}")
    if s[0] != "{":
        raise ValueError(f"missing '{{' at the beginning of {s!r}")
    if s[-1] != "}":
        raise ValueError(f"missing '}}' at the end of {s!r}")
    s = s[1:-1]
    out: list[tuple[str, str]] = []
    while s:
        n = s.find("=")
        if n < 0:
            raise ValueError(f"cannot find '=' for label value at {s!r}")
        name = s[:n]
        s = s[n + 1 :]
        value, consumed = go_quoted_prefix(s)
        s = s[consumed:]
        out.append((name, value))
        if not s:
            break
        if not s.startswith(","):
            raise ValueError(f"missing ',' at {s!r}")
        s = s[1:]
        if s.startswith(" "):
            s = s[1:]
    return out


# ------------------------------------------------------- PushRequest wire


def _utf8(mv) -> str:
    return bytes(mv).decode("utf-8", "surrogateescape")


def _decode_timestamp_ns(buf) -> int:
    seconds = nanos = 0
    for fnum, wt, val in iter_fields(buf):
        if wt != _WT_VARINT:
            continue
        if fnum == 1:
            seconds = val - (1 << 64) if val >= 1 << 63 else val
        elif fnum == 2:
            nanos = val - (1 << 64) if val >= 1 << 63 else val
    return seconds * 10**9 + nanos


def _decode_label_pair(buf) -> tuple[str, str]:
    name = value = ""
    for fnum, wt, val in iter_fields(buf):
        if wt != _WT_LEN:
            continue
        if fnum == 1:
            name = _utf8(val)
        elif fnum == 2:
            value = _utf8(val)
    return name, value


def _decode_entry(buf) -> tuple[int, str, list[tuple[str, str]]]:
    ts_ns, line, metadata = 0, "", []
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1 and wt == _WT_LEN:
            ts_ns = _decode_timestamp_ns(val)
        elif fnum == 2 and wt == _WT_LEN:
            line = _utf8(val)
        elif fnum == 3 and wt == _WT_LEN:
            metadata.append(_decode_label_pair(val))
    return ts_ns, line, metadata


def decode_push_request(
    data: bytes,
) -> list[tuple[str, list[tuple[int, str, list[tuple[str, str]]]]]]:
    """PushRequest protobuf → [(labels_string, [(ts_ns, line,
    [(md_name, md_value)])])]. Raises ValueError on malformed wire."""
    streams = []
    for fnum, wt, val in iter_fields(data):
        if fnum != 1 or wt != _WT_LEN:
            continue
        labels, entries = "", []
        for sf, swt, sval in iter_fields(val):
            if sf == 1 and swt == _WT_LEN:
                labels = _utf8(sval)
            elif sf == 2 and swt == _WT_LEN:
                entries.append(_decode_entry(sval))
        streams.append((labels, entries))
    return streams


def _enc_varint_field(fnum: int, v: int) -> bytes:
    from victorialogs_spark.sources.otlp_pb import _tag

    return _tag(fnum, _WT_VARINT) + _varint(v & ((1 << 64) - 1))


def encode_push_request(
    streams: list[tuple[str, list[tuple[int, str, list[tuple[str, str]]]]]],
) -> bytes:
    """[(labels_string, [(ts_ns, line, [(name, value)])])] → PushRequest
    protobuf bytes (the tests' MarshalProtobuf counterpart)."""
    out = bytearray()
    for labels, entries in streams:
        s = bytearray(_len_field(1, labels.encode("utf-8")))
        for ts_ns, line, metadata in entries:
            # Go truncates toward zero: nsecs/1e9, nsecs%1e9 (signed)
            sec, nano = abs(ts_ns) // 10**9, abs(ts_ns) % 10**9
            if ts_ns < 0:
                sec, nano = -sec, -nano
            ts = _enc_varint_field(1, sec) + _enc_varint_field(2, nano)
            e = bytearray(_len_field(1, ts))
            e += _len_field(2, line.encode("utf-8"))
            for name, value in metadata:
                e += _len_field(
                    3,
                    _len_field(1, name.encode("utf-8"))
                    + _len_field(2, value.encode("utf-8")),
                )
            s += _len_field(2, bytes(e))
        out += _len_field(1, bytes(s))
    return bytes(out)
