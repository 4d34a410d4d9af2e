"""Command-line interface: the engine's equivalent of the reference's HTTP
query surface, as a CLI (this engine is a library — no server needed).

    python -m victorialogs_spark.cli query '<logsql>' --table /path/to/parquet
    python -m victorialogs_spark.cli hits 'error' --table DIR --step 1h
    python -m victorialogs_spark.cli facets '*' --table DIR
    python -m victorialogs_spark.cli field-values app --table DIR
    python -m victorialogs_spark.cli streams --table DIR
    python -m victorialogs_spark.cli tail '*' --table DIR
    python -m victorialogs_spark.cli serve --table DIR --port 9428

``--table`` accepts a parquet path (a log table with _time/_msg columns).
Output is NDJSON on stdout (the /select/logsql wire format). ``serve``
starts the HTTP facade (http_server.py) on the reference's default port.
"""

from __future__ import annotations

import argparse
import json
import sys


def _emit(df, limit: int = 0) -> None:
    it = df.toLocalIterator()
    n = 0
    for row in it:
        d = row.asDict()
        for k, v in list(d.items()):
            if v is None:
                d[k] = ""
            elif not isinstance(v, str):
                d[k] = str(v)
        sys.stdout.write(json.dumps(d, separators=(",", ":")) + "\n")
        n += 1
        if limit and n >= limit:
            break


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="victorialogs-spark")
    ap.add_argument("command", choices=[
        "query", "hits", "facets", "field-names", "field-values",
        "streams", "stream-ids", "tail", "serve",
    ])
    ap.add_argument("arg", nargs="?", default="*",
                    help="LogsQL query (or field name for field-values)")
    ap.add_argument("--table", required=True, help="parquet log-table path")
    ap.add_argument("--step", default="1h")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--polls", type=int, default=0,
                    help="tail: number of polls (0 = forever)")
    ap.add_argument("--refresh", type=float, default=1.0)
    ap.add_argument("--port", type=int, default=9428,
                    help="serve: HTTP port (reference default 9428)")
    args = ap.parse_args(argv)

    from victorialogs_spark import endpoints as ep
    from victorialogs_spark.api import run_query
    from victorialogs_spark.session import get_spark

    spark = get_spark("victorialogs-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.table)

    if args.command == "query":
        out = run_query(spark, df, args.arg)
        _emit(out, args.limit)
    elif args.command == "hits":
        _emit(ep.hits(spark, df, args.arg, step=args.step), args.limit)
    elif args.command == "facets":
        _emit(ep.facets(spark, df, args.arg), args.limit)
    elif args.command == "field-names":
        _emit(ep.field_names(spark, df), args.limit)
    elif args.command == "field-values":
        _emit(ep.field_values(spark, df, args.arg), args.limit)
    elif args.command == "streams":
        _emit(ep.streams(spark, df), args.limit)
    elif args.command == "stream-ids":
        _emit(ep.stream_ids(spark, df), args.limit)
    elif args.command == "serve":
        from victorialogs_spark.http_server import serve

        srv = serve(spark, df, port=args.port)
        sys.stderr.write(f"listening on http://127.0.0.1:{srv.port}\n")
        try:
            import time as _time

            while True:
                _time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
    elif args.command == "tail":
        from victorialogs_spark.streaming.tail import LiveTailer

        tailer = LiveTailer(
            spark,
            lambda: spark.read.parquet(args.table),
            args.arg,
            refresh_interval=args.refresh,
        )
        for row in tailer.tail(max_polls=args.polls or None):
            d = {k: (str(v) if not isinstance(v, str) else v)
                 for k, v in row.asDict().items()}
            sys.stdout.write(json.dumps(d, separators=(",", ":")) + "\n")
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
