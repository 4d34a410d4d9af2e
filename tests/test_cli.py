"""CLI smoke tests (driving cli.main in-process)."""

import contextlib
import datetime as dt
import io
import json

import pytest

from victorialogs_spark import cli
from victorialogs_spark.schema import with_stream_id

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clitable") / "logs")
    rows = [
        (
            dt.datetime(2024, 1, 1, 0, 0, i, tzinfo=UTC),
            f"msg {i} " + ("error" if i % 2 else "ok"),
            "web" if i < 3 else "db",
        )
        for i in range(6)
    ]
    df = with_stream_id(
        spark.createDataFrame(rows, "_time timestamp, _msg string, app string"),
        ["app"],
    )
    df.write.parquet(d)
    return d


def run_cli(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(args)
    assert rc == 0
    return [json.loads(ln) for ln in buf.getvalue().splitlines()]


def test_cli_query(table):
    out = run_cli(["query", "error | fields _msg, app", "--table", table])
    assert len(out) == 3
    assert all("error" in r["_msg"] for r in out)


def test_cli_hits_and_streams(table):
    out = run_cli(["hits", "*", "--table", table, "--step", "1m"])
    assert out and out[0]["hits"] == "6"
    out = run_cli(["streams", "--table", table])
    assert {r["_stream"] for r in out} == {'{app="web"}', '{app="db"}'}


def test_cli_field_values_limit(table):
    out = run_cli(["field-values", "app", "--table", table, "--limit", "1"])
    assert len(out) == 1


def test_cli_curate(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    out_path = str(tmp_path / "curated")
    rows = [
        (0, "a perfectly normal document about distributed query engines"),
        (1, "a perfectly normal document about distributed query engines"),
        (2, "@@@ ### $$$ %%%"),  # symbol soup: fails quality
        (3, "another unique readable document with enough plain words here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        docs_path
    )
    rc = cli.main(["curate", "--table", docs_path, "--out", out_path])
    assert rc == 0
    kept = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    # dup folds to its min-id representative; symbol soup dropped
    assert kept == {0, 3}


def test_cli_explain(table):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["explain", "error | stats by (app) count() as hits",
                       "--table", table])
    assert rc == 0
    out = buf.getvalue()
    # empty arg list canonicalizes to '*' (stats_count.go String())
    assert out.startswith("-- canonical: error | stats by (app) count(*) as hits")
    assert "HashAggregate" in out and "Scan parquet" in out


def test_cli_index(spark, table, tmp_path):
    idx = str(tmp_path / "bloom_idx")
    # bare invocation (no field arg) defaults to indexing _msg
    rc = cli.main(["index", "--table", table, "--out", idx])
    assert rc == 0
    assert spark.read.parquet(idx).count() >= 1
    # --index registers the sidecar for the process and routes the query
    # through the pruning path form
    rows = run_cli(["query", "error | fields _msg",
                    "--table", table, "--index", idx])
    assert rows and all("error" in r["_msg"] for r in rows)


def test_cli_stream_index(spark, table, tmp_path):
    idx = str(tmp_path / "stream_idx")
    # default field is _stream_id; index app too (promoted label column)
    rc = cli.main(["stream-index", "_stream_id,app",
                   "--table", table, "--out", idx])
    assert rc == 0
    assert spark.read.parquet(idx).where("field = 'app'").count() >= 1
    rows = run_cli(["query", '{app="web"} | fields _msg, app',
                    "--table", table, "--stream-index", idx])
    assert rows and all(r["app"] == "web" for r in rows)


def test_cli_compact_rebuilds_indexes(spark, tmp_path):
    """compact --index/--stream-index rebuilds the sidecars over the
    rewritten files so pruning stays live after the file set changes."""
    import datetime as dt

    tdir = str(tmp_path / "tbl")
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, i, tzinfo=dt.timezone.utc),
         f"msg {i}", "web", "s1", "20240101")
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows,
        "_time timestamp, _msg string, app string, _stream_id string,"
        " _day string",
    )
    df.write.partitionBy("_day").parquet(tdir)
    bidx = str(tmp_path / "bidx")
    sidx = str(tmp_path / "sidx")
    rc = cli.main([
        "compact", "20240101", "--table", tdir, "--index", bidx,
        "--stream-index", sidx, "--stream-fields", "app",
    ])
    assert rc == 0
    # sidecars exist and name the POST-compaction files
    files = set(spark.read.parquet(tdir).inputFiles())
    bloom_files = {r["file"] for r in spark.read.parquet(bidx).collect()}
    stream_files = {r["file"] for r in spark.read.parquet(sidx).collect()}
    assert bloom_files <= files and bloom_files
    assert stream_files <= files and stream_files
    assert spark.read.parquet(sidx).where("field = 'app'").count() >= 1
