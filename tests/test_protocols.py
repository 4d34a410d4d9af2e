"""Tests for the /insert/* protocol payload parsers (sources/protocols.py)."""

import json

from victorialogs_spark.sources.protocols import (
    parse_datadog_logs,
    parse_elasticsearch_bulk,
    parse_journald_export,
    parse_loki_push,
    parse_otlp_logs,
    parse_syslog_lines,
)


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def test_elasticsearch_bulk(spark):
    lines = [
        json.dumps({"index": {"_index": "logs"}}),
        json.dumps({"@timestamp": "2024-01-01T00:00:01Z", "message": "hello",
                    "svc": "web", "nested": {"a": 1}}),
        json.dumps({"create": {}}),
        json.dumps({"@timestamp": "2024-01-01T00:00:02Z", "message": "bye", "svc": "db"}),
    ]
    df = parse_elasticsearch_bulk(spark, _lines_df(spark, lines), stream_fields=["svc"])
    got = {r["_msg"]: r.asDict() for r in df.collect()}
    assert set(got) == {"hello", "bye"}
    assert got["hello"]["nested.a"] == "1"
    assert got["hello"]["_time"].second == 1
    assert got["hello"]["_stream_id"] != got["bye"]["_stream_id"]


def test_loki_push(spark):
    body = {"streams": [{
        "stream": {"app": "web", "env": "prod"},
        "values": [["1704067201000000000", "line one"],
                   ["1704067202000000000", "line two", {"trace": "t1"}]],
    }]}
    df = parse_loki_push(spark, _lines_df(spark, [json.dumps(body)]))
    rows = {r["_msg"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"line one", "line two"}
    assert rows["line one"]["app"] == "web" and rows["line one"]["env"] == "prod"
    assert rows["line two"]["trace"] == "t1"
    assert rows["line one"]["_time"].isoformat().startswith("2024-01-01T00:00:01")


def test_otlp_logs(spark):
    body = {"resourceLogs": [{
        "resource": {"attributes": [{"key": "service.name",
                                     "value": {"stringValue": "cart"}}]},
        "scopeLogs": [{"logRecords": [
            {"timeUnixNano": "1704067201000000000",
             "body": {"stringValue": "oops"},
             "severityText": "ERROR",
             "attributes": [{"key": "http.status", "value": {"intValue": 500}}]},
        ]}],
    }]}
    df = parse_otlp_logs(spark, _lines_df(spark, [json.dumps(body)]))
    r = df.collect()[0].asDict()
    assert r["_msg"] == "oops"
    assert r["service.name"] == "cart"
    assert r["severity"] == "ERROR"
    assert r["http.status"] == "500"


def test_otlp_protobuf_roundtrip(spark):
    """Wire-format round-trip: encode a LogsData payload, decode it through
    the distributed parser, match the OTLP/JSON path's output shape."""
    from victorialogs_spark.sources.otlp_pb import decode_logs_data, encode_logs_data

    payload = encode_logs_data(
        {"service.name": "cart"},
        [
            {
                "time_unix_nano": 1704067201000000000,
                "body": "oops",
                "severity": "ERROR",
                "attrs": {"http.status": "500"},
            },
            {"time_unix_nano": 1704067202000000000, "body": "fine"},
        ],
    )
    # pure decoder first (no Spark): both records, resource attrs merged
    rows = decode_logs_data(payload)
    assert len(rows) == 2
    assert rows[0]["_msg"] == "oops" and rows[0]["service.name"] == "cart"
    assert rows[1]["_msg"] == "fine" and rows[1]["service.name"] == "cart"

    from victorialogs_spark.sources.protocols import parse_otlp_protobuf

    df = parse_otlp_protobuf(spark, [payload])
    got = {r["_msg"]: r.asDict() for r in df.collect()}
    assert got["oops"]["service.name"] == "cart"
    assert got["oops"]["severity"] == "ERROR"
    assert got["oops"]["http.status"] == "500"
    assert got["oops"]["_time"].second == 1
    assert got["fine"]["_time"].second == 2


def test_otlp_protobuf_all_value_types(spark):
    """AnyValue oneof coverage: bool/int/double/bytes/array/kvlist decode
    to the same stringification the JSON path produces."""
    import struct as st

    from victorialogs_spark.sources import otlp_pb as pb

    def any_field(fnum, raw):
        return pb._len_field(fnum, raw) if isinstance(raw, bytes) else raw

    cases = [
        (pb._len_field(1, b"plain"), "plain"),
        (pb._tag(2, 0) + pb._varint(1), "true"),
        (pb._tag(3, 0) + pb._varint((1 << 64) - 5), "-5"),  # negative int64
        (pb._tag(4, 1) + st.pack("<d", 2.5), "2.5"),
        (pb._len_field(7, b"\x01\xff"), "01ff"),
    ]
    for raw, want in cases:
        assert pb._any_value_str(raw) == want, (raw, want)
    # array_value of two strings
    arr = pb._len_field(1, pb._enc_any_string("a")) + pb._len_field(
        1, pb._enc_any_string("b")
    )
    assert pb._any_value_str(pb._len_field(5, arr)) == '["a","b"]'
    # kvlist_value
    kvl = pb._len_field(1, pb._enc_kv("k", "v"))
    assert pb._any_value_str(pb._len_field(6, kvl)) == '{"k":"v"}'


def test_otlp_protobuf_from_files(spark, tmp_path):
    from victorialogs_spark.sources.otlp_pb import encode_logs_data
    from victorialogs_spark.sources.protocols import parse_otlp_protobuf

    for i in range(3):
        payload = encode_logs_data(
            {"host": f"h{i}"},
            [{"time_unix_nano": 1704067200000000000 + i, "body": f"m{i}"}],
        )
        (tmp_path / f"p{i}.bin").write_bytes(payload)
    df = parse_otlp_protobuf(spark, str(tmp_path))
    rows = {r["_msg"]: r["host"] for r in df.collect()}
    assert rows == {"m0": "h0", "m1": "h1", "m2": "h2"}


def test_syslog_lines(spark):
    lines = [
        "<165>1 2024-01-01T00:00:05Z host1 app1 123 ID7 - structured hello",
        "<34>Jan  2 03:04:05 host2 app2[77]: classic message",
        "not really syslog",
    ]
    df = parse_syslog_lines(spark, _lines_df(spark, lines), year=2024)
    rows = {r["_msg"]: r.asDict() for r in df.collect()}
    assert rows["structured hello"]["hostname"] == "host1"
    assert rows["structured hello"]["severity"] == "5"
    assert rows["classic message"]["hostname"] == "host2"
    assert rows["classic message"]["proc_id"] == "77"
    assert rows["classic message"]["_time"].month == 1
    assert "not really syslog" in rows  # fallback: whole line as _msg


def test_journald_export(spark, tmp_path):
    p = tmp_path / "j.export"
    p.write_text(
        "__REALTIME_TIMESTAMP=1704067201000000\nMESSAGE=boot ok\nPRIORITY=6\n"
        "\n"
        "__REALTIME_TIMESTAMP=1704067202000000\nMESSAGE=svc start\n_PID=42\n"
    )
    df = parse_journald_export(spark, str(p))
    rows = {r["_msg"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"boot ok", "svc start"}
    # reference semantics (journald.go): names keep their case, PRIORITY
    # also emits level=<keyword>, single-underscore names are stored
    assert rows["boot ok"]["PRIORITY"] == "6"
    assert rows["boot ok"]["level"] == "info"
    assert rows["svc start"]["_PID"] == "42"
    assert rows["boot ok"]["_time"].isoformat().startswith("2024-01-01T00:00:01")


def test_datadog_logs(spark):
    payload = [{"message": "dd hello", "ddtags": "env:prod,team:core",
                "hostname": "h1", "service": "api"}]
    df = parse_datadog_logs(spark, _lines_df(spark, [json.dumps(payload)]))
    r = df.collect()[0].asDict()
    assert r["_msg"] == "dd hello"
    assert r["env"] == "prod" and r["team"] == "core"
    assert r["hostname"] == "h1" and r["service"] == "api"


def test_otlp_falsy_attribute_values(spark):
    """false/0/0.0 attribute values must survive, not collapse to ''."""
    import json as _json

    body = {"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "enabled", "value": {"boolValue": False}},
            {"key": "count", "value": {"intValue": 0}},
            {"key": "ratio", "value": {"doubleValue": 0.0}},
        ]},
        "scopeLogs": [{"logRecords": [
            {"timeUnixNano": "1704067201000000000",
             "body": {"stringValue": "m"}}]}],
    }]}
    df = parse_otlp_logs(spark, _lines_df(spark, [_json.dumps(body)]))
    r = df.collect()[0].asDict()
    assert r["enabled"] == "false"
    assert r["count"] == "0"
    assert r["ratio"] == "0.0"


def test_syslog_sd_message_with_brackets(spark):
    """Message text containing ']' after structured data must not be
    swallowed by a greedy SD capture."""
    line = '<34>1 2024-01-01T00:00:00Z host app 1 id [sd@1 x="y"] took [5] ms'
    df = parse_syslog_lines(spark, _lines_df(spark, [line]), year=2024)
    r = df.collect()[0].asDict()
    assert r["_msg"] == "took [5] ms"
    assert r["hostname"] == "host"


def test_datadog_epoch_ms_timestamp(spark):
    """Datadog's documented 'timestamp' attribute is epoch MILLISECONDS;
    it must parse to the right instant, not 1000x into the future
    (r14 review finding)."""
    import json

    from victorialogs_spark.sources.protocols import parse_datadog_logs

    line = json.dumps([{"message": "m", "timestamp": 1715000000000}])
    df = parse_datadog_logs(
        spark, spark.createDataFrame([(line,)], "value string")
    )
    row = df.collect()[0]
    assert row["_time"].year == 2024  # 2024-05-06, not year ~56k


def test_rfc3164_non_month_falls_back_to_raw(spark):
    """A capitalized 3-letter token that is not an English month
    (localized syslog) takes the designed raw-_msg fallback instead of
    a KeyError that silently drops the line (r14 review finding)."""
    from victorialogs_spark.sources.protocols import parse_syslog_lines

    lines = spark.createDataFrame(
        [("Okt 12 10:30:00 host app: localized",),
         ("Jan 12 10:30:00 host app[7]: real",)],
        "value string",
    )
    rows = {r["_msg"] for r in parse_syslog_lines(spark, lines).collect()}
    assert "Okt 12 10:30:00 host app: localized" in rows  # raw, not lost
    assert "real" in rows


def test_es_bulk_single_key_document_not_dropped(spark):
    """A single-key DOCUMENT whose key is named like a bulk action
    ({"delete": "user pressed delete"}) is a real log row; only
    object-valued action metadata is skipped (r14 review finding)."""
    import json

    from victorialogs_spark.sources.protocols import parse_elasticsearch_bulk

    lines = spark.createDataFrame(
        [(json.dumps({"index": {"_id": "1"}}),),      # action: skipped
         (json.dumps({"message": "doc one"}),),
         (json.dumps({"delete": "user pressed delete"}),)],  # document!
        "value string",
    )
    msgs = sorted(
        (r.asDict().get("_msg") or r.asDict().get("delete") or "")
        for r in parse_elasticsearch_bulk(spark, lines).collect()
    )
    assert len(msgs) == 2


def test_journald_corpus():
    """app/vlinsert/journald/journald_test.go TestPushJournald_Success
    replayed through journald_entries: binary length-framed values,
    field-name validation (names keep case; [A-Z_][A-Z0-9_]*, <=64
    bytes, __-metadata dropped), PRIORITY->level, entries flushing on
    blank lines only. Expected rows compare with ''-valued fields
    dropped (missing = empty)."""
    import json as _json
    import re
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_pipe_semantics_corpus import _go_string, _skip_ws

    from victorialogs_spark.sources.protocols import journald_entries

    src = Path(
        "/root/reference/app/vlinsert/journald/journald_test.go"
    ).read_text()
    body = src.split("func TestPushJournald_Success")[1].split("\nfunc ")[0]
    cases = []
    for m in re.finditer(r"\n\tf\(", body):
        i = _skip_ws(body, m.end())
        blob, i = _go_string(body, i)
        i = _skip_ws(body, i)
        assert body[i] == ","
        i = _skip_ws(body, i + 1)
        if body.startswith("nil", i):
            ts_list = []
            i += 3
        else:
            mm = re.match(r"\[\]int64\{([^}]*)\}", body[i:])
            ts_list = [int(x) for x in mm.group(1).split(",") if x.strip()]
            i += mm.end()
        i = _skip_ws(body, i)
        assert body[i] == ","
        want_s, i = _go_string(body, _skip_ws(body, i + 1))
        cases.append((blob, ts_list, want_s))
    assert len(cases) >= 10, f"extraction regressed: {len(cases)}"

    failures = []
    for blob, ts_list, want_s in cases:
        rows = journald_entries(blob)
        def _ns(t: str) -> int:
            sec, _, frac = t.partition(".")
            return int(sec) * 10**9 + int((frac + "000000000")[:9])

        got_ts = [_ns(r["_time"]) if r.get("_time") else None for r in rows]
        got_rows = [
            {k: v for k, v in r.items() if k != "_time" and v != ""}
            for r in rows
        ]
        want_rows = [
            {k: v for k, v in _json.loads(line).items() if v != ""}
            for line in want_s.split("\n")
            if line
        ]
        if got_rows != want_rows or got_ts != ts_list[: len(got_ts)] or len(
            got_ts
        ) != len(ts_list):
            failures.append(
                f"[{blob[:60]!r}] got {got_rows} ts {got_ts}"
                f" want {want_rows} ts {ts_list}"
            )
    assert not failures, "\n".join(failures[:6])
