"""Live tailing (/select/logsql/tail): a poll loop over batch reads with
per-stream last-seen-timestamp dedup — the exact semantics of the
reference's ProcessLiveTailRequest (app/vlselect/logsql/logsql.go:497-576,
poll loop :552-575, per-stream dedup :658-688).

Only row-level pipes may appear in a tailed query; stateful pipes are
rejected up-front (canLiveTail, lib/logstorage/pipe.go:24-27).
"""

from __future__ import annotations

import datetime as _dt
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from victorialogs_spark.logsql import ast as A
from victorialogs_spark.logsql.parser import parse_query
from victorialogs_spark.planner.planner import plan_query

# canLiveTail() per pipe, mirroring the reference's classification
CAN_LIVE_TAIL: dict[type, bool] = {
    A.PFields: True, A.PDelete: True, A.PCopy: True, A.PRename: True,
    A.PFilter: True, A.PMath: True, A.PExtract: True, A.PExtractRegexp: True,
    A.PReplace: True, A.PFormat: True, A.PUnpackJson: True,
    A.PUnpackLogfmt: True, A.PUnpackSyslog: True, A.PUnpackWords: True,
    A.PUnroll: True, A.PPackJson: True, A.PPackLogfmt: True, A.PLen: True,
    A.PJsonArrayLen: True, A.PHash: True, A.PSample: True,
    A.PCollapseNums: True, A.PDecolorize: True, A.PDropEmptyFields: True,
    A.PJoin: True,
    # stateful pipes — rejected, matching the reference
    A.PLimit: False, A.POffset: False, A.PSort: False, A.PFirst: False,
    A.PStats: False, A.PUniq: False, A.PTop: False, A.PFacets: False,
    A.PFieldNames: False, A.PFieldValues: False, A.PUnion: False,
    A.PStreamContext: False, A.PBlocksCount: False, A.PBlockStats: False,
}

TAIL_OVERLAP_SECONDS = 5.0  # re-read window, mirrors tailOffsetNsecs

_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def collected_ts_to_us(ts) -> int:
    """Exact integer µs-since-epoch for a datetime from ``Row.collect()``.

    PySpark's ``TimestampType.fromInternal`` builds the collected value
    with ``datetime.fromtimestamp`` — a NAIVE datetime in the DRIVER's
    LOCAL timezone (the session timeZone config only affects SQL-side
    rendering, not collect()). ``astimezone(utc)`` interprets a naive
    value as local time (fold-aware across DST) and converts exactly, so
    the integer subtraction below matches ``unix_micros`` on any host TZ.
    A plain ``.replace(tzinfo=utc)`` would pin local wall-clock as UTC
    and offset every watermark by the host's UTC offset (r15 advice).
    """
    return (ts.astimezone(_dt.timezone.utc) - _EPOCH_UTC) // _dt.timedelta(
        microseconds=1
    )


def can_live_tail(q: A.Query) -> bool:
    return all(CAN_LIVE_TAIL.get(type(p), False) for p in q.pipes)


class LiveTailer:
    """Poll-based live tail over a (growing) log source.

    ``source_fn`` re-reads the source each poll (e.g. a fresh
    ``spark.read.parquet(dir)`` — new files are picked up each time).
    Rows are dedupped per stream by last seen ``_time`` (+ row hash for
    equal timestamps within the overlap window).
    """

    def __init__(
        self,
        spark: SparkSession,
        source_fn: Callable[[], DataFrame],
        query: str,
        refresh_interval: float = 1.0,
        overlap_seconds: float = TAIL_OVERLAP_SECONDS,
    ):
        self.spark = spark
        self.source_fn = source_fn
        self.q = parse_query(query)
        if not can_live_tail(self.q):
            bad = [
                type(p).__name__
                for p in self.q.pipes
                if not CAN_LIVE_TAIL.get(type(p), False)
            ]
            raise ValueError(f"query cannot be live-tailed: stateful pipes {bad}")
        self.refresh_interval = refresh_interval
        self.overlap = overlap_seconds
        # per-stream watermark: max seen _time (µs) per _stream_id
        self._seen_max_us: dict[str, int] = {}
        self._seen_keys: set[tuple] = set()
        self._floor_us: int | None = None

    def poll_once(self) -> list:
        """One poll: run the query over rows newer than the per-stream
        watermark (minus overlap), return fresh rows sorted by _time."""
        src = self.source_fn()
        priming = self._floor_us is None
        has_src_time = "_time" in src.columns
        if priming:
            # first poll starts at the current max time (tail semantics);
            # rows already inside the overlap window are marked seen (never
            # yielded) so boundary rows can't re-deliver on the next poll.
            # A source without _time (the case the has_src_time branches
            # below exist for) primes at 0 — referencing the column here
            # crashed before those guards could apply (r14 review finding)
            if has_src_time:
                row = src.agg(F.max(F.unix_micros(F.col("_time")))).first()
                self._floor_us = row[0] if row and row[0] is not None else 0
            else:
                self._floor_us = 0
        if has_src_time:
            cur_max_row = src.agg(F.max(F.unix_micros(F.col("_time")))).first()
            cur_max = cur_max_row[0] if cur_max_row and cur_max_row[0] is not None else self._floor_us
        else:
            cur_max = self._floor_us
        lo_us = self._floor_us - int(self.overlap * 1e6)
        windowed = src.where(F.unix_micros(F.col("_time")) > lo_us) if has_src_time else src
        out = plan_query(self.spark, windowed, self.q)
        has_sid = "_stream_id" in out.columns
        has_time = "_time" in out.columns
        if not has_time:
            # the query's pipes dropped _time, so per-row watermarks can't
            # apply. Poll over DISJOINT source windows instead: emit every
            # result row whose source window is strictly newer than the
            # floor (exact for append-in-order sources; late arrivals
            # inside the overlap are the same trade the reference makes)
            if has_src_time:
                windowed = src.where(
                    F.unix_micros(F.col("_time")) > self._floor_us
                )
            else:
                windowed = src  # no time axis at all: every poll re-plans
            out = plan_query(self.spark, windowed, self.q)
            rows = out.collect()
            self._floor_us = max(self._floor_us, cur_max)
            return [] if priming else rows
        rows = out.collect()
        fresh = []
        _us = collected_ts_to_us

        for r in rows:
            d = r.asDict()
            t_us = (
                _us(d["_time"])
                if has_time and d.get("_time") is not None
                else 0
            )
            sid = d.get("_stream_id", "") if has_sid else ""
            key = (sid, t_us, tuple(sorted((k, str(v)) for k, v in d.items())))
            wm = self._seen_max_us.get(sid, self._floor_us)
            if not priming and (t_us < wm or key in self._seen_keys):
                continue
            self._seen_keys.add(key)
            if t_us > wm:
                self._seen_max_us[sid] = t_us
            if not priming:
                fresh.append(r)
        # bound the dedup set: drop keys older than the global floor
        self._floor_us = max(
            self._floor_us, *(self._seen_max_us.values() or [0])
        )
        self._seen_keys = {
            k for k in self._seen_keys if k[1] >= self._floor_us - int(self.overlap * 1e6)
        }
        fresh.sort(key=lambda r: r["_time"] if has_time else 0)
        return fresh

    def tail(self, max_polls: int | None = None) -> Iterator:
        """Generator of fresh rows; sleeps refresh_interval between polls."""
        polls = 0
        while max_polls is None or polls < max_polls:
            yield from self.poll_once()
            polls += 1
            if max_polls is None or polls < max_polls:
                time.sleep(self.refresh_interval)
