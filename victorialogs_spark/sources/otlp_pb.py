"""Minimal OTLP/protobuf logs decoder (and a tiny encoder for tests).

The reference accepts ONLY protobuf on /insert/opentelemetry/v1/logs
(app/vlinsert/opentelemetry/opentelemetry.go:27 rejects JSON); this module
decodes the ExportLogsServiceRequest / LogsData wire format with a
hand-rolled protobuf reader — no generated code, no proto dependency.

Message layout (public OpenTelemetry logs.proto / common.proto, mirrored
by the reference's vendored parser, lib/protoparser/opentelemetry/pb/
logs.go + common.go):

    LogsData / ExportLogsServiceRequest:
        repeated ResourceLogs resource_logs = 1
    ResourceLogs:  Resource resource = 1; repeated ScopeLogs scope_logs = 2
    ScopeLogs:     repeated LogRecord log_records = 2
    Resource:      repeated KeyValue attributes = 1
    KeyValue:      string key = 1; AnyValue value = 2
    AnyValue:      oneof { string=1 bool=2 int=3 double=4
                           array=5 kvlist=6 bytes=7 }
    LogRecord:     fixed64 time_unix_nano = 1; varint severity_number = 2;
                   string severity_text = 3; AnyValue body = 5;
                   repeated KeyValue attributes = 6; bytes trace_id = 9;
                   bytes span_id = 10; fixed64 observed_time_unix_nano = 11
"""

from __future__ import annotations

import json
import struct

# ------------------------------------------------------------ wire reader

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(buf, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def iter_fields(buf):
    """Yield (field_num, wire_type, value) over a message buffer. Values:
    int for varint/fixed64/fixed32, memoryview for length-delimited."""
    mv = memoryview(buf)
    pos, n = 0, len(mv)
    while pos < n:
        tag, pos = _read_varint(mv, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == _WT_VARINT:
            val, pos = _read_varint(mv, pos)
        elif wt == _WT_I64:
            (val,) = struct.unpack_from("<Q", mv, pos)
            pos += 8
        elif wt == _WT_LEN:
            ln, pos = _read_varint(mv, pos)
            val = mv[pos : pos + ln]
            if len(val) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wt == _WT_I32:
            (val,) = struct.unpack_from("<I", mv, pos)
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


# ------------------------------------------------------------ OTLP decode


# OpenTelemetry severity names, SeverityNumber 0-24
# (opentelemetry-collector pdata/plog/severity_number.go, mirrored by
# the reference's pb.logSeverities)
LOG_SEVERITIES = ["Unspecified"] + [
    f"{name}{n}" if n else name
    for name in ("Trace", "Debug", "Info", "Warn", "Error", "Fatal")
    for n in ("", "2", "3", "4")
]


def es6_float(f: float) -> str:
    """pb.float64AsString replica: ES6/encoding-json float rendering —
    plain decimal inside [1e-6, 1e21), exponent form outside with the
    e-0X zero-padding trimmed; Inf/NaN render Go's unsupported-value
    message."""
    import math
    from decimal import Decimal

    if math.isinf(f) or math.isnan(f):
        g = "NaN" if math.isnan(f) else ("+Inf" if f > 0 else "-Inf")
        return f"json: unsupported value: {g}"
    a = abs(f)
    if a != 0 and (a < 1e-6 or a >= 1e21):
        s = repr(f)
        if "e" not in s:  # float repr switches later than Go json does
            s = f"{f:e}"  # unreachable for shortest reprs, kept for safety
        mant, _, exp = s.partition("e")
        e = int(exp)
        return f"{mant}e+{e}" if e >= 0 else f"{mant}e-{-e}"
    # shortest 'f' form: repr gives the shortest digits, Decimal expands
    # the exponent form repr uses above 1e16
    return format(Decimal(repr(f)), "f")


def _b64(mv) -> str:
    import base64

    return base64.b64encode(bytes(mv)).decode("ascii")


def _any_value_kvlist(buf):
    """The kvlist_value member of an AnyValue buffer, or None."""
    for fnum, wt, val in iter_fields(buf):
        if fnum == 6:
            return val
    return None


def _any_value_str(buf, toplevel: bool = True) -> str:
    """AnyValue.FormatString replica (pb/helpers.qtpl): strings raw at
    top level and JSON-quoted when nested; bools/ints bare; doubles via
    es6_float; arrays/kvlists JSON-shaped with NESTED quoting; bytes
    base64 (std); an unset value renders ''."""
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:  # string_value
            s = bytes(val).decode("utf-8", "replace")
            return s if toplevel else json.dumps(s, ensure_ascii=False)
        if fnum == 2:  # bool_value
            return "true" if val else "false"
        if fnum == 3:  # int_value (varint, two's complement for negatives)
            if val >= 1 << 63:
                val -= 1 << 64
            return str(val)
        if fnum == 4:  # double_value (wire type I64: bits, not int)
            return es6_float(struct.unpack("<d", struct.pack("<Q", val))[0])
        if fnum == 5:  # array_value { repeated AnyValue values = 1 }
            items = [
                _any_value_str(v, toplevel=False)
                for fn, _, v in iter_fields(val)
                if fn == 1
            ]
            return "[" + ",".join(items) + "]"
        if fnum == 6:  # kvlist_value { repeated KeyValue values = 1 }
            parts = []
            for fn, _, v in iter_fields(val):
                if fn == 1:
                    k, vbuf = _key_value_raw(v)
                    parts.append(
                        json.dumps(k, ensure_ascii=False)
                        + ":"
                        + (_any_value_str(vbuf, False) if vbuf is not None else "null")
                    )
            return "{" + ",".join(parts) + "}"
        if fnum == 7:  # bytes_value
            return _b64(val)
    return ""


def _key_value_raw(buf):
    """KeyValue buffer → (key, AnyValue buffer | None)."""
    key, vbuf = "", None
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:
            key = bytes(val).decode("utf-8", "replace")
        elif fnum == 2:
            vbuf = val
    return key, vbuf


def _append_kv_fields(
    out: list, kv_bufs: list, parent: str = ""
) -> None:
    """appendKeyValues replica (opentelemetry.go:139): kvlist-valued
    attributes flatten RECURSIVELY into dot-joined field names; every
    other value renders via FormatString(true)."""
    for kv in kv_bufs:
        key, vbuf = _key_value_raw(kv)
        name = f"{parent}.{key}" if parent else key
        kvl = _any_value_kvlist(vbuf) if vbuf is not None else None
        if kvl is not None:
            _append_kv_fields(
                out,
                [v for fn, _, v in iter_fields(kvl) if fn == 1],
                name,
            )
        else:
            out.append(
                (name, _any_value_str(vbuf, True) if vbuf is not None else "")
            )


def _log_record(
    buf, res_fields: list, msg_fields: list[str] | None
) -> dict[str, str]:
    """LogRecord → flat row (pushFieldsFromScopeLogs parity): resource
    fields, then the body (a kvlist body FLATTENS and honors msg_fields
    renaming; anything else becomes _msg), then attributes, trace/span
    ids, and ALWAYS a severity field (severity_text, else the
    severity_number name, clamped to Unspecified)."""
    t_ns = obs_ns = sev_num = 0
    sev_text = ""
    body_buf = None
    attr_bufs: list = []
    trace_id = span_id = ""
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:
            t_ns = val
        elif fnum == 11:
            obs_ns = val
        elif fnum == 2:
            sev_num = val - (1 << 64) if val >= 1 << 63 else val
        elif fnum == 3:
            sev_text = bytes(val).decode("utf-8", "replace")
        elif fnum == 5:
            body_buf = val
        elif fnum == 6:
            attr_bufs.append(val)
        elif fnum == 9:
            trace_id = bytes(val).hex()
        elif fnum == 10:
            span_id = bytes(val).hex()

    fields: list = list(res_fields)
    n_common = len(fields)
    body_kvl = _any_value_kvlist(body_buf) if body_buf is not None else None
    if body_kvl is not None:
        _append_kv_fields(
            fields, [v for fn, _, v in iter_fields(body_kvl) if fn == 1]
        )
        # RenameField: first non-empty msg_fields name among body fields
        for want in msg_fields or []:
            hit = next(
                (
                    i
                    for i in range(n_common, len(fields))
                    if fields[i][0] == want and fields[i][1] != ""
                ),
                None,
            )
            if hit is not None:
                fields[hit] = ("_msg", fields[hit][1])
                break
    else:
        fields.append(
            ("_msg", _any_value_str(body_buf, True) if body_buf is not None else "")
        )
    _append_kv_fields(fields, attr_bufs)
    if trace_id:
        fields.append(("trace_id", trace_id))
    if span_id:
        fields.append(("span_id", span_id))
    fields.append((
        "severity",
        sev_text
        if sev_text
        else (
            LOG_SEVERITIES[sev_num]
            if 0 <= sev_num < len(LOG_SEVERITIES)
            else LOG_SEVERITIES[0]
        ),
    ))

    flat = dict(fields)
    # OTLP's default stream identity is the RESOURCE attributes
    # (opentelemetry.go useDefaultStreamFields → commonFields)
    from victorialogs_spark.sources.protocols import stream_label_str

    flat["_stream"] = stream_label_str(res_fields)
    ts = t_ns or obs_ns
    if ts:
        # exact decimal seconds truncated to µs (float division would put
        # the µs digit at the double's ulp and sometimes round it wrong)
        us = ts // 1000
        flat["_time"] = f"{us // 10**6}.{us % 10**6:06d}"
    flat.setdefault("_msg", "")
    return flat


def decode_logs_data(
    payload: bytes, msg_fields: list[str] | None = None
) -> list[dict[str, str]]:
    """ExportLogsServiceRequest/LogsData protobuf → flat string-field
    dicts, reference-exact (opentelemetry.go pushProtobufRequest; pinned
    by the r15 OTLP corpus): resource attributes (kvlists dot-flattened)
    merge into every record, record fields on top, severity always
    present."""
    rows: list[dict[str, str]] = []
    for fnum, wt, rl in iter_fields(payload):
        if fnum != 1:  # resource_logs
            continue
        res_fields: list = []
        scopes = []
        for fn2, _, val in iter_fields(rl):
            if fn2 == 1:  # resource { repeated KeyValue attributes = 1 }
                _append_kv_fields(
                    res_fields,
                    [v for fn, _, v in iter_fields(val) if fn == 1],
                )
            elif fn2 == 2:  # scope_logs
                scopes.append(val)
        for sl in scopes:
            for fn3, _, rec in iter_fields(sl):
                if fn3 == 2:  # log_records
                    rows.append(_log_record(rec, res_fields, msg_fields))
    return rows


# ------------------------------------------------------------ tiny encoder
# (test fixtures only — real exporters produce these payloads)


def _tag(fnum: int, wt: int) -> bytes:
    return _varint((fnum << 3) | wt)


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, _WT_LEN) + _varint(len(payload)) + payload


def _enc_any_string(s: str) -> bytes:
    return _len_field(1, s.encode("utf-8"))


def _enc_kv(key: str, value: str) -> bytes:
    return _len_field(1, key.encode("utf-8")) + _len_field(2, _enc_any_string(value))


def encode_logs_data(
    resource_attrs: dict[str, str], records: list[dict]
) -> bytes:
    """Encode a single-resource LogsData payload. Each record dict:
    ``{"time_unix_nano": int, "body": str, "severity": str,
    "attrs": {k: v}}`` (all but body optional)."""
    resource = b"".join(_len_field(1, _enc_kv(k, v)) for k, v in resource_attrs.items())
    recs = b""
    for r in records:
        body = b""
        if r.get("time_unix_nano"):
            body += _tag(1, _WT_I64) + struct.pack("<Q", r["time_unix_nano"])
        if r.get("severity"):
            body += _len_field(3, r["severity"].encode("utf-8"))
        body += _len_field(5, _enc_any_string(r.get("body", "")))
        for k, v in (r.get("attrs") or {}).items():
            body += _len_field(6, _enc_kv(k, v))
        recs += _len_field(2, body)  # ScopeLogs.log_records
    scope_logs = _len_field(2, recs)  # ResourceLogs.scope_logs
    resource_logs = _len_field(1, resource) + scope_logs
    return _len_field(1, resource_logs)  # LogsData.resource_logs
