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
    assert rows["boot ok"]["priority"] == "6"
    assert rows["svc start"]["pid"] == "42"
    assert rows["boot ok"]["_time"].isoformat().startswith("2024-01-01T00:00:01")


def test_datadog_logs(spark):
    payload = [{"message": "dd hello", "ddtags": "env:prod,team:core",
                "hostname": "h1", "service": "api"}]
    df = parse_datadog_logs(spark, _lines_df(spark, [json.dumps(payload)]))
    r = df.collect()[0].asDict()
    assert r["_msg"] == "dd hello"
    assert r["env"] == "prod" and r["team"] == "core"
    assert r["hostname"] == "h1" and r["service"] == "api"
