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


def _any_value_str(buf) -> str:
    """AnyValue → string, matching the OTLP/JSON path's stringification
    (string as-is, numbers/bools via repr, nested array/kvlist as JSON)."""
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:  # string_value
            return bytes(val).decode("utf-8", "replace")
        if fnum == 2:  # bool_value
            return "true" if val else "false"
        if fnum == 3:  # int_value (varint, two's complement for negatives)
            if val >= 1 << 63:
                val -= 1 << 64
            return str(val)
        if fnum == 4:  # double_value (wire type I64: bits, not int)
            return json.dumps(struct.unpack("<d", struct.pack("<Q", val))[0])
        if fnum == 5:  # array_value { repeated AnyValue values = 1 }
            items = [
                _any_value_str(v) for fn, _, v in iter_fields(val) if fn == 1
            ]
            return json.dumps(items, separators=(",", ":"))
        if fnum == 6:  # kvlist_value { repeated KeyValue values = 1 }
            kv = {}
            for fn, _, v in iter_fields(val):
                if fn == 1:
                    k, vv = _key_value(v)
                    kv[k] = vv
            return json.dumps(kv, separators=(",", ":"))
        if fnum == 7:  # bytes_value
            return bytes(val).hex()
    return ""


def _key_value(buf) -> tuple[str, str]:
    key, value = "", ""
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:
            key = bytes(val).decode("utf-8", "replace")
        elif fnum == 2:
            value = _any_value_str(val)
    return key, value


def _attrs(buf, field_num: int) -> dict[str, str]:
    out = {}
    for fnum, wt, val in iter_fields(buf):
        if fnum == field_num:
            k, v = _key_value(val)
            if k:
                out[k] = v
    return out


def _log_record(buf, res_attrs: dict[str, str]) -> dict[str, str]:
    flat = dict(res_attrs)
    t_ns = obs_ns = 0
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1:
            t_ns = val
        elif fnum == 11:
            obs_ns = val
        elif fnum == 3:
            sev = bytes(val).decode("utf-8", "replace")
            if sev:
                flat["severity"] = sev
        elif fnum == 5:
            flat["_msg"] = _any_value_str(val)
        elif fnum == 6:
            k, v = _key_value(val)
            if k:
                flat[k] = v
        elif fnum == 9:
            flat["trace_id"] = bytes(val).hex()
        elif fnum == 10:
            flat["span_id"] = bytes(val).hex()
    ts = t_ns or obs_ns
    if ts:
        # exact decimal seconds truncated to µs (float division would put
        # the µs digit at the double's ulp and sometimes round it wrong)
        us = ts // 1000
        flat["_time"] = f"{us // 10**6}.{us % 10**6:06d}"
    flat.setdefault("_msg", "")
    return flat


def decode_logs_data(payload: bytes) -> list[dict[str, str]]:
    """ExportLogsServiceRequest/LogsData protobuf → flat string-field dicts
    (resource attributes merged into every record, record attributes on
    top — same flattening as the OTLP/JSON parser)."""
    rows: list[dict[str, str]] = []
    for fnum, wt, rl in iter_fields(payload):
        if fnum != 1:  # resource_logs
            continue
        res_attrs: dict[str, str] = {}
        scopes = []
        for fn2, _, val in iter_fields(rl):
            if fn2 == 1:  # resource
                res_attrs = _attrs(val, 1)
            elif fn2 == 2:  # scope_logs
                scopes.append(val)
        for sl in scopes:
            for fn3, _, rec in iter_fields(sl):
                if fn3 == 2:  # log_records
                    rows.append(_log_record(rec, res_attrs))
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
