"""Ingestion-protocol parsers: the payload formats of the reference's
/insert/* endpoints (app/vlinsert/*), re-expressed as distributed
DataFrame transforms. Each parser turns raw payload text into the common
``(_time_raw, fields map<string,string>)`` shape from sources.ndjson, so
column promotion / stream-id assignment / day partitioning are shared.

Covered formats (each a mapInPandas batch parser — executors only):
- Elasticsearch bulk NDJSON  (app/vlinsert/elasticsearch)
- Loki push JSON             (app/vlinsert/loki/loki_json.go)
- OpenTelemetry OTLP/JSON    (app/vlinsert/opentelemetry)
- syslog RFC3164/RFC5424     (app/vlinsert/syslog)
- journald export format     (app/vlinsert/journald: MESSAGE +
                              __REALTIME_TIMESTAMP µs)
- Datadog logs JSON          (app/vlinsert/datadog)

The HTTP layer itself is out of scope (this engine is a library); these
parsers accept the payload bodies as text files / DataFrames of lines.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from victorialogs_spark.schema import flatten_json, with_stream_id
from victorialogs_spark.sources.ndjson import (
    DEFAULT_MSG,
    PARSED_SCHEMA,
    promote_columns,
    with_event_time,
)


def _batch_parser(parse_line: Callable[[str], list[dict]]):
    """Wrap a line → [flat-dict] parser into a mapInPandas function.
    Each produced dict may carry ``_time`` (string) + string fields."""

    def _parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            times, fields = [], []
            for line in pdf["value"]:
                try:
                    rows = parse_line(line or "")
                except Exception:
                    continue
                for flat in rows:
                    t = flat.pop("_time", "")
                    if not flat.get("_msg"):
                        flat["_msg"] = DEFAULT_MSG
                    times.append(t)
                    fields.append(flat)
            if times:  # empty frames infer float64 dtype, breaking Arrow maps
                yield pd.DataFrame(
                    {
                        "_time_raw": pd.Series(times, dtype="object"),
                        "fields": pd.Series(fields, dtype="object"),
                    }
                )

    return _parse


def _finish(
    parsed: DataFrame,
    stream_fields: list[str] | None,
    promote_keys: list[str] | None,
) -> DataFrame:
    out = promote_columns(with_event_time(parsed), promote_keys)
    if stream_fields:
        out = with_stream_id(out, [f for f in stream_fields if f in out.columns])
    return out


# ------------------------------------------------------------ elasticsearch

_ES_ACTIONS = {"index", "create", "delete", "update"}


def parse_elasticsearch_bulk(
    spark: SparkSession,
    path_or_lines,
    stream_fields: list[str] | None = None,
    promote_keys: list[str] | None = None,
) -> DataFrame:
    """ES bulk NDJSON: alternating action lines ({"index": {...}}) and
    document lines; only documents become log rows. ``@timestamp`` maps to
    ``_time``, ``message`` to ``_msg`` (app/vlinsert/elasticsearch)."""

    def one(line: str) -> list[dict]:
        line = line.strip()
        if not line:
            return []
        obj = json.loads(line)
        if (
            len(obj) == 1
            and next(iter(obj)) in _ES_ACTIONS
            # bulk action metadata is always an OBJECT value
            # ({"index": {"_id": ...}}); a single-key DOCUMENT whose key
            # happens to be named index/create/delete/update (e.g.
            # {"delete": "user pressed delete"}) is a real log row, not
            # metadata (r14 review finding)
            and isinstance(next(iter(obj.values())), dict)
        ):
            return []  # action/metadata line
        flat = flatten_json(obj)
        if "@timestamp" in flat:
            flat["_time"] = flat.pop("@timestamp")
        if "message" in flat and "_msg" not in flat:
            flat["_msg"] = flat.pop("message")
        return [flat]

    lines = (
        spark.read.text(path_or_lines)
        if isinstance(path_or_lines, str)
        else path_or_lines
    )
    parsed = lines.mapInPandas(_batch_parser(one), PARSED_SCHEMA)
    return _finish(parsed, stream_fields, promote_keys)


# --------------------------------------------------------------------- loki


def parse_loki_push(
    spark: SparkSession,
    path_or_lines,
    promote_keys: list[str] | None = None,
) -> DataFrame:
    """Loki push payloads (one JSON body per line):
    {"streams": [{"stream": {labels}, "values": [["<ns>", "line"], ...]}]}
    (app/vlinsert/loki/loki_json.go:74-122). Stream labels become fields
    AND the stream identity."""

    def one(line: str) -> list[dict]:
        line = line.strip()
        if not line:
            return []
        body = json.loads(line)
        out = []
        for stream in body.get("streams", []):
            labels = {
                str(k): str(v) for k, v in (stream.get("stream") or {}).items()
            }
            for v in stream.get("values", []):
                ts_ns, msg = v[0], v[1]
                flat = dict(labels)
                # ns-precision unix timestamp → exact decimal seconds
                flat["_time"] = unix_frac_seconds(int(ts_ns), 10**9)
                flat["_msg"] = msg
                if len(v) > 2 and isinstance(v[2], dict):  # structured metadata
                    for mk, mv in v[2].items():
                        flat[str(mk)] = str(mv)
                out.append(flat)
        return out

    lines = (
        spark.read.text(path_or_lines)
        if isinstance(path_or_lines, str)
        else path_or_lines
    )
    parsed = lines.mapInPandas(_batch_parser(one), PARSED_SCHEMA)
    # loki stream labels: promote + use every label as a stream field is
    # caller-specific; default promotes sampled keys only
    return _finish(parsed, None, promote_keys)


# --------------------------------------------------------------------- otlp


def unix_frac_seconds(value: int, scale: int) -> str:
    """Exact decimal-seconds string for an integer unix timestamp at
    1/``scale`` second resolution (truncated to µs — Spark's timestamp
    resolution). A float division here would put the µs digit at the
    double's ~0.24µs ulp and occasionally round it wrong."""
    us = value * (10**6 // scale) if scale <= 10**6 else value // (scale // 10**6)
    return f"{us // 10**6}.{us % 10**6:06d}"


def _otlp_value_str(v: dict) -> str:
    # explicit None checks: an `or` chain collapses false/0/0.0 to ''
    for k in ("stringValue", "intValue", "doubleValue", "boolValue"):
        val = v.get(k)
        if val is not None:
            if isinstance(val, bool):
                return "true" if val else "false"
            return str(val)
    return ""


def _otlp_attrs(attrs: list) -> dict:
    out = {}
    for a in attrs or []:
        out[str(a.get("key", ""))] = _otlp_value_str(a.get("value", {}))
    return out


def parse_otlp_logs(
    spark: SparkSession,
    path_or_lines,
    promote_keys: list[str] | None = None,
) -> DataFrame:
    """OTLP/JSON logs (one export body per line): resourceLogs →
    scopeLogs → logRecords with timeUnixNano / body.stringValue /
    attributes / severityText (app/vlinsert/opentelemetry)."""

    def one(line: str) -> list[dict]:
        line = line.strip()
        if not line:
            return []
        body = json.loads(line)
        out = []
        for rl in body.get("resourceLogs", []):
            res_attrs = _otlp_attrs((rl.get("resource") or {}).get("attributes"))
            for sl in rl.get("scopeLogs", []):
                for rec in sl.get("logRecords", []):
                    flat = dict(res_attrs)
                    flat.update(_otlp_attrs(rec.get("attributes")))
                    t_ns = rec.get("timeUnixNano") or rec.get("observedTimeUnixNano")
                    if t_ns:
                        flat["_time"] = unix_frac_seconds(int(t_ns), 10**9)
                    body_v = rec.get("body") or {}
                    flat["_msg"] = str(body_v.get("stringValue", ""))
                    if rec.get("severityText"):
                        flat["severity"] = str(rec["severityText"])
                    out.append(flat)
        return out

    lines = (
        spark.read.text(path_or_lines)
        if isinstance(path_or_lines, str)
        else path_or_lines
    )
    parsed = lines.mapInPandas(_batch_parser(one), PARSED_SCHEMA)
    return _finish(parsed, None, promote_keys)


def parse_otlp_protobuf(
    spark: SparkSession,
    payloads,
    promote_keys: list[str] | None = None,
) -> DataFrame:
    """OTLP/protobuf logs — the ONE encoding real exporters send (the
    reference rejects JSON: app/vlinsert/opentelemetry/opentelemetry.go:27).
    ``payloads``: a directory/glob of payload files (read via binaryFile —
    distributed), a DataFrame with a binary ``content`` column, or a list
    of ``bytes`` (driver-side convenience). Decoding runs in mapInPandas on
    executors via the dependency-free wire decoder (sources/otlp_pb.py)."""
    from victorialogs_spark.sources.otlp_pb import decode_logs_data

    if isinstance(payloads, str):
        bin_df = spark.read.format("binaryFile").load(payloads).select("content")
    elif isinstance(payloads, DataFrame):
        bin_df = payloads.select("content")
    else:
        bin_df = spark.createDataFrame(
            [(bytearray(p),) for p in payloads], "content binary"
        )

    def _parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            times, fields = [], []
            for payload in pdf["content"]:
                try:
                    rows = decode_logs_data(bytes(payload))
                except Exception:
                    continue
                for flat in rows:
                    t = flat.pop("_time", "")
                    if not flat.get("_msg"):
                        flat["_msg"] = DEFAULT_MSG
                    times.append(t)
                    fields.append(flat)
            if times:
                yield pd.DataFrame(
                    {
                        "_time_raw": pd.Series(times, dtype="object"),
                        "fields": pd.Series(fields, dtype="object"),
                    }
                )

    parsed = bin_df.mapInPandas(_parse, PARSED_SCHEMA)
    return _finish(parsed, None, promote_keys)


# ------------------------------------------------------------------- syslog


def parse_syslog_lines(
    spark: SparkSession,
    path_or_lines,
    promote_keys: list[str] | None = None,
    year: int = 2024,
) -> DataFrame:
    """Raw syslog lines (RFC3164/RFC5424) → log rows via the same regex
    battery as the unpack_syslog pipe; RFC3164 timestamps get ``year``
    (the wire format omits it)."""
    # the reference's ingest stores EVERY parser field, extracting
    # 'timestamp' as _time and renaming 'message' to _msg
    # (app/vlinsert/syslog/syslog.go:555-562); the shared progressive
    # parser (functions/syslogparse.py, syslog_parser.go semantics)
    # replaced this path's regex battery in r15 — partial headers and
    # RFC5424 structured-data params now ingest faithfully
    import time as _time

    from victorialogs_spark.functions.syslogparse import syslog_fields

    now_unix = _time.time()

    def one(line: str) -> list[dict]:
        line = line.rstrip("\n")
        if not line.strip():
            return []
        flat = dict(syslog_fields(line, year, now_unix))
        if not flat:
            return [{"_msg": line}]
        ts = flat.pop("timestamp", "")
        msg = flat.pop("message", "")
        return [{"_time": ts, "_msg": msg, **flat}]

    lines = (
        spark.read.text(path_or_lines)
        if isinstance(path_or_lines, str)
        else path_or_lines
    )
    parsed = lines.mapInPandas(_batch_parser(one), PARSED_SCHEMA)
    return _finish(parsed, None, promote_keys)


# ----------------------------------------------------------------- journald


def parse_journald_export(
    spark: SparkSession,
    path_or_blobs,
    promote_keys: list[str] | None = None,
) -> DataFrame:
    """journald export format: KEY=value lines, blank line between entries;
    MESSAGE → _msg, __REALTIME_TIMESTAMP (µs) → _time
    (app/vlinsert/journald/journald.go:37,66). Reads whole files (entries
    span lines) — one file per task, fine for export-style drops. Also
    accepts a one-column DataFrame of whole export blobs (HTTP bodies)."""
    rdd_like = (
        spark.read.text(path_or_blobs, wholetext=True)
        if isinstance(path_or_blobs, str)
        else path_or_blobs
    )

    parsed = rdd_like.mapInPandas(_batch_parser(journald_entries), PARSED_SCHEMA)
    return _finish(parsed, None, promote_keys)


_JOURNALD_NAME_RE = __import__("re").compile(rb"^[A-Z_][A-Z0-9_]*$")

_JOURNALD_LEVELS = {
    "0": "emerg", "1": "alert", "2": "critical", "3": "error",
    "4": "warning", "5": "notice", "6": "info", "7": "debug",
}


def journald_entries(blob: str) -> list[dict]:
    """Journal Export Format → rows, reference-exact
    (app/vlinsert/journald/journald.go readJournaldLogEntry; pinned by
    the r15 journald corpus):

    - a field is "NAME=value" or binary "NAME\\n<8-byte LE size><data>\\n"
      (data may span newlines); a malformed binary frame aborts the
      stream, keeping the rows already emitted;
    - names are [A-Z_][A-Z0-9_]* and at most 64 BYTES — invalid names
      skip the FIELD (the old parser lowercased and stripped
      underscores, inventing names the reference never stores);
    - __REALTIME_TIMESTAMP (µs) is consumed as the row time (0 or
      unparseable → ingest-time now); MESSAGE becomes _msg; PRIORITY
      also emits level=<keyword> and is kept; "__"-prefixed metadata
      fields drop;
    - an entry flushes on its blank line (or EOF); an entry whose every
      field was skipped emits nothing."""
    data = blob.encode("utf-8", "surrogateescape")
    n = len(data)
    rows: list[dict] = []
    fields: list[tuple[str, str]] = []
    ts_us: int | None = None

    def flush() -> None:
        nonlocal fields, ts_us
        if fields:
            row = dict(fields)
            row["_time"] = (
                unix_frac_seconds(ts_us, 10**6) if ts_us else ""
            )
            rows.append(row)
        fields, ts_us = [], None

    i = 0
    while True:
        if i >= n:
            flush()
            return rows
        j = data.find(b"\n", i)
        line = data[i:j] if j >= 0 else data[i:n]
        i = (j + 1) if j >= 0 else n
        if line == b"":
            flush()
            continue
        eq = line.find(b"=")
        if eq >= 0:
            name_b, value_b = line[:eq], line[eq + 1 :]
        else:
            # binary frame: 8-byte little-endian size, then the payload
            # and a mandatory trailing '\n'
            name_b = line
            if i + 8 > n:
                flush()
                return rows
            size = int.from_bytes(data[i : i + 8], "little")
            i += 8
            if size > n - i or data[i + size : i + size + 1] != b"\n":
                flush()
                return rows
            value_b = data[i : i + size]
            i += size + 1
        if len(name_b) > 64 or not _JOURNALD_NAME_RE.match(name_b):
            continue
        name = name_b.decode("utf-8", "surrogateescape")
        value = value_b.decode("utf-8", "surrogateescape")
        if name == "__REALTIME_TIMESTAMP":
            try:
                ts_us = int(value)
            except ValueError:
                ts_us = None
            continue
        if name == "MESSAGE":
            name = "_msg"
        if name == "PRIORITY":
            fields.append(("level", _JOURNALD_LEVELS.get(value, value)))
        if not name.startswith("__"):
            fields.append((name, value))


# ------------------------------------------------------------------ datadog


def parse_datadog_logs(
    spark: SparkSession,
    path_or_lines,
    promote_keys: list[str] | None = None,
) -> DataFrame:
    """Datadog logs payloads (one JSON array per line): [{"message": ...,
    "ddtags": "k:v,k2:v2", "hostname": ..., "service": ...}]
    (app/vlinsert/datadog). ddtags unpack into fields."""

    def one(line: str) -> list[dict]:
        line = line.strip()
        if not line:
            return []
        arr = json.loads(line)
        if isinstance(arr, dict):
            arr = [arr]
        out = []
        for obj in arr:
            flat = {}
            for k, v in obj.items():
                if k == "message":
                    flat["_msg"] = str(v)
                elif k == "ddtags":
                    for tag in str(v).split(","):
                        if ":" in tag:
                            tk, tv = tag.split(":", 1)
                            flat[tk] = tv
                elif k == "timestamp":
                    # Datadog's documented format is epoch MILLISECONDS;
                    # passing the raw integer through would later parse
                    # as seconds (1000x off, year ~56k — r14 review
                    # finding). Strings (RFC3339) pass through.
                    if isinstance(v, (int, float)) or str(v).isdigit():
                        flat["_time"] = unix_frac_seconds(int(v), 10**3)
                    else:
                        flat["_time"] = str(v)
                else:
                    flat[str(k)] = str(v)
            out.append(flat)
        return out

    lines = (
        spark.read.text(path_or_lines)
        if isinstance(path_or_lines, str)
        else path_or_lines
    )
    parsed = lines.mapInPandas(_batch_parser(one), PARSED_SCHEMA)
    return _finish(parsed, None, promote_keys)
