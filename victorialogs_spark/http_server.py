"""Thin HTTP facade over the query/ingest API — the reference's primary
interface is HTTP (app/vlselect/main.go:216-266 routes /select/logsql/*;
app/vlinsert/main.go:63-85 routes /insert/*). This server maps those URLs
onto endpoints.py / sources, nothing more: every byte of query output is
produced by the same code paths the library API uses (an e2e GET of
/select/logsql/query returns exactly ``endpoints.query_ndjson``'s lines).

stdlib ThreadingHTTPServer on purpose: the work happens in Spark; the
facade only parses params and streams results. Ingested rows stage in an
in-memory micro-batch union and FLUSH to a parquet spill dir every
_State.FLUSH_ROWS acked rows, so the queryable frame is (preloaded table
∪ day-partitioned table scan ∪ flat spill scan ∪ a bounded union tail)
no matter how long ingest runs — the production shape, where acked
writes land in storage and memory only holds the tail. Point
``spill_dir`` at a durable path to keep flushed rows across restarts.

Spill lifecycle (the reference's small-parts → big-part LSM merge,
datadb.go:75-82): once _State.MIGRATE_FILES flat files accumulate, a
background migration rewrites them into ``<spill>/_table/_day=*``
(clustered ``(_stream_id, _time)`` like compact_day output) and commits
by atomically replacing ``_MANIFEST.json`` — the SINGLE commit point.
Tombstoned flat files stay on disk until the next migration (so plans
in flight never lose files) and are reaped at the next migration or
restart. A kill on either side of the commit cannot double-count:
before it, partial table files are unlisted orphans (deleted at
restore, rows still served flat); after it, tombstoned flat files are
skipped (rows served from the table). ``_State.apply_retention`` drops
whole day partitions from the migrated table, manifest included.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

from victorialogs_spark import endpoints as ep
from victorialogs_spark.logsql.parser import parse_time_point
from victorialogs_spark.schema import ingest_ndjson


def _unix_arg_ns(n: int) -> int:
    """Integer unix timestamp → ns via the reference's magnitude
    heuristic (timeutil.getUnixTimestampNanoseconds: the 2^31 boundary,
    i.e. 'fits int32 → seconds', not a power-of-ten guess)."""
    if -(1 << 31) <= n < (1 << 31):
        return n * 10**9
    if -(1 << 31) * 1000 <= n < (1 << 31) * 1000:
        return n * 10**6
    if -(1 << 31) * 10**6 <= n < (1 << 31) * 10**6:
        return n * 10**3
    return n


def _time_arg_ns(v: str | None, now_ns: int | None = None) -> int | None:
    """start/end/time args, mirroring timeutil.ParseTimeAt (the vendored
    function getTimeNsec calls for ALL THREE args): 'now', relative
    durations ('-1h', '5m', 'now-1h' — always toward the past), unix
    seconds/ms/µs/ns (possibly fractional), or RFC3339 (possibly
    partial). A partial timestamp is the START instant of its period for
    start AND end alike — the reference does not expand '2024-01-02' to
    end-of-day for end (seventh-pass finding; the old end=True path
    did). Integer timestamps parse as int end-to-end — a float hop
    would lose ns precision (53 mantissa bits vs 63 needed)."""
    if not v:
        return None
    now = now_ns if now_ns is not None else __import__("time").time_ns()
    if v == "now":
        return now
    # strip a trailing timezone only for the duration-vs-timestamp
    # decision (parse_time_point does the real offset arithmetic)
    s = v
    if len(s) > 6 and s[-6] in "+-" and s[-3] == ":":
        s = s[:-6]
    s = s[:-1] if s.endswith("Z") else s
    if s and (s[-1] > "9" or s[0] == "-" or s.startswith("now")):
        from victorialogs_spark.logsql.parser import parse_duration_ns

        d = parse_duration_ns(s[3:] if s.startswith("now") else s)
        if d is None:
            raise ValueError(f"cannot parse time arg {v!r}")
        if d > 0:
            d = -d  # bare '1h' means one hour AGO (ParseTimeAt:79-81)
        return now + d
    if "-" not in v:
        # unix timestamp (no date separators)
        if s.lstrip("+").isdigit():
            return _unix_arg_ns(int(s.lstrip("+")))
        # fractional: magnitude heuristic on the integer part, the
        # fraction scaled by the same unit
        whole, _, frac = s.partition(".")
        n = int(whole or "0")
        base = _unix_arg_ns(n)
        unit = base // n if n else 10**9  # ns per input unit
        fr = int((frac or "0")[:9].ljust(9, "0")) // (10**9 // unit)
        return base + (-fr if s.startswith("-") else fr)
    rng = parse_time_point(v)
    if rng is None:
        raise ValueError(f"cannot parse time arg {v!r}")
    return rng[0]


class _State:
    # every append adds a unionByName layer; past this depth the PENDING
    # frame is localCheckpoint'ed so plan analysis stays O(1) per request
    # instead of growing with ingest count (the same lineage rule
    # iterative algorithms follow, datapipe/clusters.py)
    CHECKPOINT_EVERY = 16
    # acked micro-batches flush to the spill dir as parquet once this
    # many rows accumulate; queries then replan over a plain file scan
    # instead of an ever-growing union of in-memory checkpoint blocks.
    # Before this bound existed, a sustained ingest wave pushed read p95
    # to 6.3 s vs 0.71 s read-only (SCALE.md "mixed read+ingest wave"):
    # the periodic whole-frame localCheckpoint was O(total ingested)
    # under the append lock. Flushing is O(pending) — amortized O(1)/row
    # — and mirrors production, where acked writes land in storage and
    # memory only stages the tail.
    FLUSH_ROWS = 20_000
    # flat spill files migrate into the day-partitioned table once this
    # many accumulate. Without a lifecycle the spill dir is an unbounded
    # flat pile every read scans in full (at the measured 1,971 rows/s
    # that is ~425 files/day, read cost growing linearly forever); with
    # it, long-running serve converges to the same clustered layout
    # compact_day produces — the reference's small-parts → big-part LSM
    # merge (datadb.go:75-82) applied to the facade's write path.
    MIGRATE_FILES = 8
    # tier-2 of the LSM: once a single day partition accumulates this
    # many live table files (each migration appends a few), the
    # migration pass rewrites that day into clustered files — without
    # it the table-file count grows linearly with migrations forever
    # (the 10-minute soak reached 72 files / 9 migrations) and every
    # read pays a task per file, the same unbounded-pile failure the
    # flat tier had
    COMPACT_FILES = 16
    # consecutive migration failures before the lifecycle gives up for
    # the process lifetime: transient failures retry (at the next flush
    # that re-trips the MIGRATE_FILES gate), persistent ones — a parquet
    # schema the partitioned writer rejects — stop after this many
    # attempts instead of re-running a doomed rewrite per flush
    MIGRATE_MAX_FAILS = 3
    # consecutive PER-DAY compaction failures before that day is skipped
    # (it keeps serving from its un-compacted files); tier-2 failures
    # are deliberately gated separately from MIGRATE_MAX_FAILS — one
    # unrewritable day must never disable healthy tier-1 migrations
    COMPACT_MAX_FAILS = 3

    def __init__(
        self,
        spark: SparkSession,
        logs: DataFrame | None,
        spill_dir: str | None = None,
        retention_days: int | None = None,
    ):
        self.spark = spark
        self.logs = logs
        self._empty: DataFrame | None = None  # lazy empty-store frame
        self.lock = threading.Lock()
        self.retention_days = retention_days
        self._depth = 0
        self._preloaded = logs  # the table served at startup, if any
        self._base = logs  # preloaded ∪ table scan ∪ flat spill scan
        self._pending: DataFrame | None = None  # un-flushed micro-batches
        self._pending_rows = 0
        self._spill_dir = spill_dir
        self._spill_ok = spill_dir is not None
        self._table_dir = (
            os.path.join(spill_dir, "_table") if spill_dir else None
        )
        self._manifest_path = (
            os.path.join(spill_dir, "_MANIFEST.json") if spill_dir else None
        )
        self._flat_files: list[str] = []  # live (un-migrated) spill files
        self._migrated: set[str] = set()  # tombstoned basenames, not yet rm'd
        self._table_tombs: set[str] = set()  # compacted-away, not yet rm'd
        self._table_files: list[str] = []  # manifest-listed, rel to _table
        self._flushing: DataFrame | None = None  # detached, being written
        self._flushing_rows = 0
        self._migrating = False
        self._migrate_ok = spill_dir is not None
        # consecutive _migrate failures; the gate only goes permanently
        # dark at MIGRATE_MAX_FAILS so one transient blip (executor
        # hiccup, disk pressure, a racing manual apply_retention) can't
        # silently revert serve to the unbounded flat-pile behavior —
        # but a schema-shaped failure that recurs stops burning rewrites
        self._migrate_fails = 0
        # days a compaction rewrite is reading OUTSIDE the lock;
        # retention defers their physical deletion (logical drop +
        # tombstones) so the in-flight read never loses files
        self._compacting_days: set[str] = set()
        # consecutive rewrite failures per day (tier-2 gate; a success
        # resets its day, COMPACT_MAX_FAILS skips it)
        self._compact_fails: dict[str, int] = {}
        # a DURABLE spill dir may already hold rows flushed by a prior
        # server run — they were acked, so they must be queryable from
        # request one, not only after the next flush re-reads the dir.
        # The manifest is the commit record of past flushes, migrations
        # and retention: a flat file it tombstones is ALREADY in the
        # table (kill landed between manifest commit and spill cleanup —
        # finish the cleanup, don't double-count); a table file it does
        # NOT list is a crashed migration's partial write (kill landed
        # mid-write, before the commit — the rows are still in their
        # flat files, delete the orphans, don't double-count); and a
        # flat file it does not list under "flat_files" is a TORN FLUSH
        # (kill landed between Spark's multi-file parquet commit and the
        # manifest append — those rows were never acked, delete the
        # partial files so a fraction of a flush can't half-appear). A
        # manifest without the "flat_files" key is pre-lifecycle legacy:
        # every non-tombstoned flat file is live.
        if spill_dir is not None:
            import glob as _glob

            manifest = self._read_manifest()
            tombs = set(manifest.get("migrated_flat", []))
            listed = manifest.get("table_files", [])
            flat_listed = manifest.get("flat_files")
            flat_all = sorted(_glob.glob(os.path.join(spill_dir, "*.parquet")))
            for f in flat_all:
                name = os.path.basename(f)
                if name in tombs:
                    os.remove(f)  # committed migration: rows live in table
                elif flat_listed is not None and name not in flat_listed:
                    os.remove(f)  # torn flush: never committed, never acked
                else:
                    self._flat_files.append(f)
            on_disk = set(self._list_table_files())
            self._table_files = [p for p in listed if p in on_disk]
            for orphan in sorted(on_disk - set(listed)):
                os.remove(os.path.join(self._table_dir, orphan))
            if self._flat_files or self._table_files:
                if retention_days is not None and self._table_files:
                    # a prior run's old days must drop at startup, not
                    # only after the next migration commits
                    if self._apply_retention_locked(
                        self._retention_keep_from()
                    ):
                        self._write_manifest_locked()
                self._replan_base_locked()
                self.logs = self._base
        # Prometheus-style counters, named like the reference's
        # (vl_http_requests_total{path=...}, vl_http_errors_total{...},
        # vl_rows_ingested_total{type=...} — app/vlselect/main.go:290+,
        # insertutil/common_params.go:318). Key = (name, label_k, label_v).
        self.counters: dict[tuple[str, str, str], int] = {}
        self._mlock = threading.Lock()

    def inc(self, name: str, label: str, value: str, n: int = 1) -> None:
        with self._mlock:
            k = (name, label, value)
            self.counters[k] = self.counters.get(k, 0) + n

    def render_metrics(self) -> bytes:
        def esc(v: str) -> str:
            # Prometheus exposition label escaping: one raw quote in a
            # label value would corrupt the whole scrape forever
            return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")

        with self._mlock:
            lines = [
                f'{name}{{{label}="{esc(value)}"}} {n}'
                for (name, label, value), n in sorted(self.counters.items())
            ]
        return ("\n".join(lines) + "\n").encode("utf-8")

    def df(self) -> DataFrame:
        with self.lock:
            if self.logs is None:
                # empty store, not an error: a server whose LAST day just
                # expired under retention (the r14 multi-day soak hit
                # this — every read 400'd between the drop and the next
                # ingest) and a fresh server both serve the reference's
                # empty-result semantics. The planner handles filters on
                # absent columns (missing field ≡ empty value), so the
                # canonical two-column empty frame answers any query.
                if self._empty is None:
                    self._empty = self.spark.createDataFrame(
                        [], "_time timestamp, _msg string"
                    )
                return self._empty
            return self.logs

    # ---- durable-spill lifecycle -------------------------------------

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _write_manifest_locked(self) -> None:
        """Atomically replace the manifest — the SINGLE commit point of a
        flush, a migration, and retention. Everything else (parquet
        writes, spill deletion) is recoverable from it on restart:
        "flat_files" makes a torn multi-file flush impossible to
        half-serve (files Spark's committer moved before the kill are
        unlisted and deleted at restore)."""
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "migrated_flat": sorted(self._migrated),
                    "table_files": sorted(self._table_files),
                    "flat_files": sorted(
                        os.path.basename(f) for f in self._flat_files
                    ),
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._manifest_path)

    def _list_table_files(self) -> list[str]:
        import glob as _glob

        if self._table_dir is None or not os.path.isdir(self._table_dir):
            return []
        return sorted(
            os.path.relpath(p, self._table_dir)
            for p in _glob.glob(
                os.path.join(self._table_dir, "_day=*", "*.parquet")
            )
        )

    def _replan_base_locked(self) -> None:
        """Rebuild ``_base`` = preloaded ∪ table scan ∪ flat spill scan.
        Both scans use EXPLICIT file lists (never a directory glob): a
        glob would resurrect tombstoned flat files after a migration
        commit — an instant double count. When the table part carries
        the ``_day`` partition column, the other parts derive it from
        ``_time`` so the planner's day pruning never sees a NULL ``_day``
        (allowMissingColumns would fill one, and a pruned query would
        silently drop every un-migrated row)."""
        from victorialogs_spark.schema import with_day_partition, with_tenant

        parts: list[DataFrame] = []
        if self._table_files:
            paths = [
                os.path.join(self._table_dir, p) for p in self._table_files
            ]
            parts.append(
                self.spark.read.option("mergeSchema", "true")
                .option("basePath", self._table_dir)
                .parquet(*paths)
            )
        if self._flat_files:
            parts.append(
                self.spark.read.option("mergeSchema", "true").parquet(
                    *self._flat_files
                )
            )
        pre = self._preloaded
        if pre is not None:
            if (
                "tenant" not in pre.columns
                and any("tenant" in p.columns for p in parts)
            ):
                # flushed rows always carry tenant; a tenant-less
                # preloaded table belongs to the default tenant —
                # unioning it unstamped would give its rows a NULL
                # tenant and hide them from every scoped query
                pre = with_tenant(pre, 0, 0)
                self._preloaded = pre
            parts.insert(0, pre)
        if any("_day" in p.columns for p in parts):
            parts = [
                p
                if "_day" in p.columns or "_time" not in p.columns
                else with_day_partition(p)
                for p in parts
            ]
        base = None
        for p in parts:
            base = (
                p
                if base is None
                else base.unionByName(p, allowMissingColumns=True)
            )
        self._base = base

    def _maybe_migrate_locked(self) -> None:
        """Kick a background migration when the flat pile crosses the
        threshold. Single-flight; the Spark work runs WITHOUT the state
        lock (the batch files are immutable once flushed and new flushes
        only add files), so read/ingest latency stays flat while the
        rewrite runs — only the commit takes the lock."""
        if (
            not self._migrate_ok
            or self._migrate_fails >= self.MIGRATE_MAX_FAILS
            or self._migrating
            or len(self._flat_files) < self.MIGRATE_FILES
        ):
            return
        self._migrating = True
        batch = list(self._flat_files)
        threading.Thread(
            target=self._migrate, args=(batch,), daemon=True
        ).start()

    def migrate_now(self) -> None:
        """Synchronous migration of the current flat pile (tests, CLI
        maintenance). No-op when empty or a background run is active."""
        with self.lock:
            if self._migrating or not self._flat_files:
                return
            self._migrating = True
            batch = list(self._flat_files)
        self._migrate(batch)

    def _migrate(self, batch: list[str]) -> None:
        from victorialogs_spark.streaming.ingest import append_day_partitioned

        try:
            # 1. physically drop the PREVIOUS migration's tombstones
            #    (flat AND compacted-away table files): every live plan
            #    was built after that commit (the commit replanned
            #    _base), so nothing references them anymore
            with self.lock:
                tombs = sorted(self._migrated)
                self._migrated = set()
                ttombs = sorted(self._table_tombs)
                self._table_tombs = set()
            for name in tombs:
                try:
                    os.remove(os.path.join(self._spill_dir, name))
                except FileNotFoundError:
                    pass
            for rel in ttombs:
                try:
                    os.remove(os.path.join(self._table_dir, rel))
                except FileNotFoundError:
                    pass
            # 2. the rewrite, outside the lock: batch files are immutable
            #    and only migrations write the table dir (single-flight),
            #    so a before/after listing diff attributes the new files
            before = set(self._list_table_files())
            df = self.spark.read.option("mergeSchema", "true").parquet(*batch)
            append_day_partitioned(df, self._table_dir)
            new_files = sorted(set(self._list_table_files()) - before)
            # 3. commit: manifest replace is the atomic point. A kill
            #    BEFORE it leaves orphan table files (deleted at restore,
            #    rows still served from flat); a kill AFTER it leaves
            #    tombstoned flat files (deleted at restore, rows served
            #    from the table). Neither double-counts.
            with self.lock:
                self._migrated = {os.path.basename(f) for f in batch}
                self._table_files = sorted(
                    set(self._table_files) | set(new_files)
                )
                in_batch = set(batch)
                self._flat_files = [
                    f for f in self._flat_files if f not in in_batch
                ]
                if self.retention_days is not None:
                    # fold the retention watcher into the migration
                    # commit: one manifest write covers both
                    self._apply_retention_locked(self._retention_keep_from())
                self._write_manifest_locked()
                self._replan_base_locked()
                self._rebuild_logs_locked()
            self.inc("vl_spill_migrations_total", "status", "ok")
            self._migrate_fails = 0
            # 4. tier-2: rewrite any day whose live file count crossed
            #    the gate into clustered files (compact_day's layout:
            #    stream-hashed, (_stream_id, _time)-sorted, bloom on
            #    _stream_id). Same crash protocol as every other step —
            #    new files are orphans until the manifest commit, old
            #    files stay on disk until the NEXT migration so live
            #    plans never lose them. Failures here are gated PER DAY
            #    (_compact_fails, inside _compact_days) and must never
            #    reach the tier-1 counter: the migration above already
            #    COMMITTED, so counting a compaction failure against
            #    _migrate_fails would let one unrewritable day disable
            #    healthy migrations for the process lifetime — the
            #    unbounded-flat-pile regression the counter exists to
            #    prevent (r14 review finding).
            try:
                self._compact_full_days()
            except Exception:  # noqa: BLE001 — per-day gating inside
                self.inc("vl_spill_compactions_total", "status", "error")
        except Exception:  # noqa: BLE001 — degrade to the flat pile
            # the flat files stay live (nothing was committed), reads
            # stay correct. Transient failures retry at the next flush;
            # only MIGRATE_MAX_FAILS consecutive failures (a rewrite
            # that can't work, e.g. a schema the partitioned writer
            # rejects) stop the lifecycle for the process
            self._migrate_fails += 1
            self.inc("vl_spill_migrations_total", "status", "error")
        finally:
            with self.lock:
                self._migrating = False

    def _compact_full_days(self) -> None:
        """Rewrite each day partition with >= COMPACT_FILES live files
        into a clustered file set (one output file per ~128 MB of
        input). Runs inside the migration thread (single-flight with the
        tier-1 writes, so listing diffs stay attributable); the Spark
        work holds no lock. Old files are NOT deleted at commit — they
        tombstone into _table_tombs and are reaped at the next
        migration (or, after a kill, at restore where the manifest
        marks them orphans) so plans in flight never lose files."""
        with self.lock:
            days: dict[str, list[str]] = {}
            for p in self._table_files:
                days.setdefault(p.split(os.sep, 1)[0], []).append(p)
            # forget failure counters for days no longer in the table
            # (retention dropped them): bounds the dict in a long-lived
            # server and un-gates a later re-created day partition
            self._compact_fails = {
                d: n for d, n in self._compact_fails.items() if d in days
            }
            todo = [
                (d, sorted(fs))
                for d, fs in sorted(days.items())
                if len(fs) >= self.COMPACT_FILES
                # a day whose rewrite keeps failing (e.g. a merged
                # schema the clustered writer rejects) is skipped after
                # COMPACT_MAX_FAILS consecutive failures instead of
                # re-failing every migration; it keeps serving from its
                # un-compacted files — correct, just not clustered
                and self._compact_fails.get(d, 0) < self.COMPACT_MAX_FAILS
            ]
            # while the rewrite reads these days outside the lock, a
            # racing apply_retention() must not physically delete their
            # files — it defers to a logical drop (the in-memory check
            # below then abandons the day's commit)
            self._compacting_days = {d for d, _ in todo}
        try:
            self._compact_days(todo)
        finally:
            with self.lock:
                self._compacting_days = set()

    def _compact_days(self, todo: list[tuple[str, list[str]]]) -> None:
        for day, files in todo:
            try:
                self._compact_one_day(day, files)
            except Exception:  # noqa: BLE001 — isolate per day
                # one day's failed rewrite must not abort the other
                # days' compactions nor (via _migrate's handler) the
                # tier-1 migration counter; gate this day after
                # COMPACT_MAX_FAILS consecutive failures
                with self.lock:
                    self._compact_fails[day] = (
                        self._compact_fails.get(day, 0) + 1
                    )
                self.inc("vl_spill_compactions_total", "status", "error")

    def _compact_one_day(self, day: str, files: list[str]) -> None:
        from pyspark.sql import functions as F

        paths = [os.path.join(self._table_dir, p) for p in files]
        day_dir = os.path.join(self._table_dir, day)
        in_bytes = sum(os.path.getsize(p) for p in paths)
        n_out = max(1, in_bytes // (128 << 20))
        before = set(self._list_table_files())
        df = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*paths)
        )
        sort_cols = [
            c for c in ("_stream_id", "_time") if c in df.columns
        ]
        if sort_cols:
            # hash-partition on the first cluster key so each output
            # file holds a SUBSET of streams (the compact_day rule:
            # round-robin would put every stream in every file and
            # kill sidecar pruning)
            out = df.repartition(n_out, F.col(sort_cols[0]))
            out = out.sortWithinPartitions(*sort_cols)
        else:
            out = df.coalesce(n_out)
        writer = out.write.mode("append").option("compression", "zstd")
        if "_stream_id" in df.columns:
            writer = writer.option(
                "parquet.bloom.filter.enabled#_stream_id", "true"
            )
        writer.parquet(day_dir)
        new_files = sorted(set(self._list_table_files()) - before)
        with self.lock:
            self._compact_fails.pop(day, None)  # success resets the gate
            if not set(files) <= set(self._table_files):
                # retention (or a manual apply) dropped this day
                # while we rewrote it: abandon — the new files stay
                # unlisted and the next restore/migration reaps them
                self._table_tombs.update(new_files)
                return
            self._table_files = sorted(
                (set(self._table_files) - set(files)) | set(new_files)
            )
            self._table_tombs.update(files)
            self._write_manifest_locked()
            self._replan_base_locked()
            self._rebuild_logs_locked()
        self.inc("vl_spill_compactions_total", "status", "ok")

    def _retention_keep_from(self) -> str:
        import datetime as _dt

        cutoff = _dt.datetime.now(_dt.timezone.utc) - _dt.timedelta(
            days=self.retention_days
        )
        return cutoff.strftime("%Y%m%d")

    def _apply_retention_locked(self, keep_days_from: str) -> list[str]:
        """Drop day partitions older than ``keep_days_from`` and their
        manifest rows; the CALLER commits the manifest and replans (so a
        migration commit folds retention into its single manifest
        write). Queries planned before the drop may fail on the deleted
        files — the reference's retention has the same semantics (data
        vanishes under running queries), and it beats serving expired
        rows."""
        from victorialogs_spark.streaming.ingest import (
            apply_retention as _apply,
        )

        if self._table_dir is None or not self._table_files:
            return []
        dropped = _apply(
            self._table_dir, keep_days_from, skip=self._compacting_days
        )
        # a day an in-flight compaction is reading outside the lock is
        # dropped LOGICALLY only: its files tombstone for the next
        # migration's reap (the compaction's commit check sees the day
        # missing from _table_files and abandons), and the emptied
        # day dir falls to the next physical retention pass
        for day in sorted(self._compacting_days):
            if day.split("=", 1)[-1] < keep_days_from:
                pre = f"{day}{os.sep}"
                deferred = [
                    p for p in self._table_files if p.startswith(pre)
                ]
                if deferred:
                    self._table_tombs.update(deferred)
                    dropped.append(day.split("=", 1)[-1])
        if dropped:
            gone = tuple(f"_day={d}{os.sep}" for d in dropped)
            self._table_files = [
                p for p in self._table_files if not p.startswith(gone)
            ]
        return dropped

    def apply_retention(self, keep_days_from: str) -> list[str]:
        """Drop table day-partitions older than ``keep_days_from``
        (YYYYMMDD) — proof that migrated rows are covered by the same
        retention the day-partitioned table gets (the reference's
        retention watcher, storage.go:50). Returns dropped day labels.
        Rows still in the flat pile or pending union are NOT covered
        until they migrate — the same window the reference's in-memory
        parts have. With ``retention_days`` set, this also runs
        automatically at restore and after every migration commit."""
        with self.lock:
            dropped = self._apply_retention_locked(keep_days_from)
            if dropped:
                self._write_manifest_locked()
                self._replan_base_locked()
                self._rebuild_logs_locked()
            return dropped

    def append(self, df: DataFrame) -> int:
        """Append a parsed request frame; returns its row count. The
        incoming frame is localCheckpoint-ed FIRST, so the request body
        is parsed exactly once: the count reads the materialized blocks
        (a separate count() on the lazy frame re-ran the whole parse —
        ingest CPU doubled for every protocol, round-6 advice), and
        queries over the union stop re-parsing request bodies while
        they wait for the depth checkpoint.

        The Spark work (parse, checkpoint, count) runs OUTSIDE the state
        lock — it touches only this request's frame. The round-12 wave
        held the lock through all of it, so every reader's df() queued
        behind ~1 s of ingest work per post: the like-for-like r13
        control measured read p95 0.40 s vs 2.21 s mixed (5.6x) before
        this change. Only the union/bookkeeping takes the lock."""
        df = df.localCheckpoint(eager=True)
        n = df.count()
        # post-checkpoint coalesce (no recompute, no shuffle): the
        # parse ran at full parallelism, but a ~10^3-row batch does
        # not need 32 near-empty partitions in every later read —
        # un-coalesced, a 20-request pending union cost readers 640
        # scan tasks (measured: read p95 7.3 s mixed-wave)
        df = df.coalesce(max(1, n // 100_000 + (1 if n % 100_000 else 0)))
        with self.lock:
            if (
                self._base is not None
                and "tenant" in df.columns
                and "tenant" not in self._base.columns
            ):
                # a tenant-less base (cli serve --table DIR, or a spill
                # dir restored from a run that append()-ed tenant-less
                # rows directly) belongs to the default tenant; stamping
                # it BEFORE the union keeps it visible — a NULL tenant
                # from allowMissingColumns would fail every tenant
                # filter. Stamp _base itself: it may be a restored spill
                # scan (or preloaded ∪ scan), not the raw preloaded
                # frame, and _preloaded may be None
                from victorialogs_spark.schema import with_tenant

                self._base = with_tenant(self._base, 0, 0)
                if (
                    self._preloaded is not None
                    and "tenant" not in self._preloaded.columns
                ):
                    self._preloaded = with_tenant(self._preloaded, 0, 0)
            self._pending = (
                df
                if self._pending is None
                else self._pending.unionByName(df, allowMissingColumns=True)
            )
            self._pending_rows += n
            self._depth += 1
            if self._spill_ok:
                # with a spill dir, lineage consolidation IS the flush:
                # detaching the union to the background writer bounds
                # plan depth without ever running an O(pending) Spark
                # job under the lock (the in-lock depth checkpoint was
                # the biggest remaining lock-holder after the parse
                # moved out — it fired every 16 posts, ahead of the
                # 20k-row flush). Early flushes write smaller flat
                # files; the migration compacts them later anyway.
                if (
                    self._pending_rows >= self.FLUSH_ROWS
                    or self._depth >= self.CHECKPOINT_EVERY
                ):
                    self._start_flush_locked()
            elif self._depth >= self.CHECKPOINT_EVERY:
                # no spill dir: consolidate the union-of-checkpoints
                # lineage in place (and free the per-request blocks it
                # referenced) — O(pending), never O(total ingested)
                self._pending = self._pending.localCheckpoint(eager=True)
                self._depth = 0
            self._rebuild_logs_locked()
            return n

    def _start_flush_locked(self) -> None:
        """Detach the pending union into the single-flight ``_flushing``
        slot and hand it to a background flusher: the parquet write (the
        next-biggest lock-held job after the parse moved out) runs with
        NO lock held — the detached frame is checkpointed and immutable,
        and readers keep seeing its rows via the ``_flushing`` leg of
        _rebuild_logs_locked until the commit swaps them into the flat
        file scan atomically."""
        if self._flushing is not None:  # a flush is already in flight;
            return  # re-checked on every append, so the next one catches up
        self._flushing = self._pending
        self._flushing_rows = self._pending_rows
        self._pending = None
        self._pending_rows = 0
        self._depth = 0
        threading.Thread(
            target=self._flush_bg,
            args=(self._flushing, self._flushing_rows),
            daemon=True,
        ).start()

    def wait_idle(self, timeout: float = 60.0) -> bool:
        """Block until no background flush or migration is in flight
        (tests, orderly shutdown). Returns False on timeout."""
        import time as _time

        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            with self.lock:
                if self._flushing is None and not self._migrating:
                    return True
            _time.sleep(0.05)
        return False

    def flush_now(self) -> None:
        """Synchronous flush of the current pending union (tests, CLI
        maintenance). No-op when empty, degraded, or already in flight."""
        with self.lock:
            if (
                self._flushing is not None
                or self._pending is None
                or not self._spill_ok
            ):
                return
            self._flushing = self._pending
            self._flushing_rows = self._pending_rows
            self._pending = None
            self._pending_rows = 0
            self._depth = 0
            frame, rows = self._flushing, self._flushing_rows
        self._flush_bg(frame, rows)

    def _flush_bg(self, frame: DataFrame, rows: int) -> None:
        """Write one detached pending union to the spill dir and commit.
        Falls back to the pure in-memory union (pre-flush behavior) if
        parquet can't store this schema — e.g. ingested field names
        containing characters the parquet writer rejects."""
        import glob as _glob

        try:
            # the pending union carries ~32 partitions PER REQUEST (the
            # parse parallelism); written as-is each flush would emit
            # hundreds of near-empty files and every later read would
            # pay a task per file. One output file per ~500k rows keeps
            # the spill dir at O(flush count) files. The before/after
            # diff attributes the new files (the _flushing slot makes
            # flushes single-flight; migrations never write flat files).
            before = set(_glob.glob(os.path.join(self._spill_dir, "*.parquet")))
            n_files = max(1, rows // 500_000)
            frame.coalesce(n_files).write.mode("append").parquet(
                self._spill_dir
            )
            after = set(_glob.glob(os.path.join(self._spill_dir, "*.parquet")))
        except Exception:  # noqa: BLE001 — degrade, don't drop the rows
            with self.lock:
                self._spill_ok = False
                # re-attach: the rows stay queryable from memory
                self._pending = (
                    frame
                    if self._pending is None
                    else frame.unionByName(
                        self._pending, allowMissingColumns=True
                    )
                )
                self._pending_rows += rows
                self._flushing = None
                self._rebuild_logs_locked()
            return
        with self.lock:
            self._flat_files = sorted(set(self._flat_files) | (after - before))
            # manifest commit: without it a restart would treat these
            # files as a torn flush and delete them
            self._write_manifest_locked()
            self._replan_base_locked()
            self._flushing = None
            self._rebuild_logs_locked()
            self._maybe_migrate_locked()
            if self._spill_ok and (
                self._pending_rows >= self.FLUSH_ROWS
                or self._depth >= self.CHECKPOINT_EVERY
            ):
                # appends that crossed a threshold while this flush was
                # in flight were skipped (single-flight); chain the next
                # flush so an idle tail above the threshold never lingers
                # in memory waiting for another request
                self._start_flush_locked()

    def _rebuild_logs_locked(self) -> None:
        from victorialogs_spark.schema import with_day_partition

        out = self._base
        for part in (self._flushing, self._pending):
            if part is None:
                continue
            if out is None:
                out = part
                continue
            if (
                "_day" in out.columns
                and "_day" not in part.columns
                and "_time" in part.columns
            ):
                # once the migrated table introduces the _day partition
                # column, in-memory rows must carry a derived one too — a
                # NULL _day from allowMissingColumns would let the
                # planner's day pruning silently drop every un-flushed row
                part = with_day_partition(part)
            out = out.unionByName(part, allowMissingColumns=True)
        self.logs = out


def _lines_df(
    spark: SparkSession, body: bytes, split: bool = True
) -> DataFrame:
    """HTTP body → one-column text DataFrame (the shape every protocol
    parser accepts). split=False keeps the body as ONE row — loki/datadog
    bodies are a single JSON document (possibly pretty-printed across
    lines) that the parser json.loads whole."""
    text = body.decode("utf-8", "replace")
    lines = (text.splitlines() or [""]) if split else [text]
    return spark.createDataFrame([(l,) for l in lines], "value string")


def _iter_json_values(df: DataFrame):
    """``{"values":[...]}`` as an incremental byte iterator. One row is
    in driver memory at a time (``toLocalIterator`` pulls one partition
    per job), so a stats_query_range over 10⁶ groups streams under a
    small driver heap instead of ``collect()``-ing into one string —
    the reference streams every response (vlselect/logsql/logsql.go:901).
    Byte-compatible with the former collect-based writer."""
    yield b'{"values":['
    first = True
    for r in df.toLocalIterator(prefetchPartitions=True):
        d = ep.row_to_wire_dict(r)
        blob = json.dumps(d, separators=(",", ":")).encode("utf-8")
        yield blob if first else b"," + blob
        first = False
    yield b"]}"


# the fixed route set whose traffic is counted (reference registers one
# counter per known route, never per observed path)
_METERED_PATHS = frozenset(
    [
        "/select/logsql/query", "/select/logsql/tail",
        "/select/logsql/hits", "/select/logsql/stats_query",
        "/select/logsql/stats_query_range", "/select/logsql/facets",
        "/select/logsql/field_names", "/select/logsql/field_values",
        "/select/logsql/streams", "/select/logsql/stream_ids",
        "/select/logsql/stream_field_names",
        "/select/logsql/stream_field_values",
        "/insert/jsonline", "/insert/elasticsearch/_bulk",
        "/insert/elasticsearch/", "/insert/loki/api/v1/push",
        "/insert/datadog/api/v2/logs", "/insert/journald",
        "/insert/opentelemetry/v1/logs",
    ]
)


class _Handler(BaseHTTPRequestHandler):
    state: _State  # set by serve()

    # ------------------------------------------------------------- plumbing
    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _params(self) -> dict[str, list[str]]:
        parsed = urllib.parse.urlparse(self.path)
        params = urllib.parse.parse_qs(parsed.query)
        if self.command == "POST":
            ln = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(ln) if ln else b""
            self._body = body
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype == "application/x-www-form-urlencoded":
                for k, vs in urllib.parse.parse_qs(body.decode("utf-8")).items():
                    params.setdefault(k, []).extend(vs)
        return params

    def _get(self, params, name, default=None):
        vs = params.get(name)
        return vs[0] if vs else default

    def _tenant(self) -> tuple[int, int]:
        """(AccountID, ProjectID) request headers, defaulting to (0,0) —
        the reference's GetTenantIDFromRequest (tenant_id.go:74-84)."""
        def u32(name):
            v = (self.headers.get(name) or "0").strip() or "0"
            n = int(v)
            if not 0 <= n < 2**32:
                raise ValueError(f"{name} must be a uint32, got {v}")
            return n

        return u32("AccountID"), u32("ProjectID")

    def _append(self, df: DataFrame, proto: str | None = None) -> None:
        """Stamp ingested rows with the request's tenant before they join
        the shared frame — physical per-tenant grouping, like the
        reference's per-tenant storage paths. ``proto`` feeds the
        vl_rows_ingested_total{type=...} counter; the count comes back
        from append()'s already-materialized checkpoint, so the body is
        parsed once (the reference also counts every parsed row,
        insertutil/common_params.go:318)."""
        from victorialogs_spark.schema import with_tenant

        n = self.state.append(with_tenant(df, *self._tenant()))
        if proto:
            # incremented AFTER the append succeeds — an append failure
            # must not leave the metric claiming rows /select can't return
            self.state.inc("vl_rows_ingested_total", "type", proto, n)

    def _send(self, code: int, body: bytes, ctype: str = "application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self._streaming = True  # headers are out; no second response allowed
        self.wfile.write(body)

    def _send_json_stream(self, df: DataFrame):
        """Stream a JSON-shaped endpoint response. The first pull runs
        the plan BEFORE headers go out, so parse/plan errors still
        surface as a clean 400; a mid-stream executor failure truncates
        the connection (same contract as the NDJSON query path)."""
        gen = _iter_json_values(df)
        head = next(gen)      # static prefix
        second = next(gen)    # first row (or closing bracket): runs the plan
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self._streaming = True
        self.wfile.write(head)
        self.wfile.write(second)
        for chunk in gen:
            self.wfile.write(chunk)

    def _err(self, e: Exception):
        if getattr(self, "_streaming", False):
            # a status line injected into an open 200 stream would corrupt
            # the client's NDJSON — truncate the connection instead
            self.close_connection = True
            return
        self._send(400, (str(e) + "\n").encode("utf-8"), "text/plain")

    # --------------------------------------------------------------- routes
    def do_GET(self):
        self._route()

    def do_POST(self):
        self._route()

    def _route(self):
        path = urllib.parse.urlparse(self.path).path
        self._streaming = False  # reset per request (keep-alive reuse)
        # route reads and ingest into separate FAIR scheduler pools:
        # spark.scheduler.mode=FAIR alone is a no-op (every job lands in
        # the single default pool, whose internal order is FIFO) — fair
        # sharing happens ACROSS pools, so a read job submitted while an
        # ingest flush occupies the task slots gets its share instead of
        # queuing behind the whole flush. Local properties are
        # per-thread, which is exactly the ThreadingHTTPServer model.
        pool = "facade-reads" if path.startswith("/select/") else "facade-ingest"
        self.state.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", pool
        )
        try:
            params = self._params()
            if path == "/health":
                return self._send(200, b"OK\n", "text/plain")
            if path == "/metrics":
                # Prometheus text exposition, reference metric names
                return self._send(
                    200, self.state.render_metrics(),
                    "text/plain; version=0.0.4",
                )
            if path.startswith("/select/") or path.startswith("/insert/"):
                # count only KNOWN routes (like the reference's fixed
                # counter set): arbitrary scanner paths must not grow
                # the counters dict without bound
                if path in _METERED_PATHS:
                    self.state.inc("vl_http_requests_total", "path", path)
                if path.startswith("/select/"):
                    return self._select(path, params)
                return self._insert(path, params)
            return self._send(404, b"unknown path\n", "text/plain")
        except BrokenPipeError:
            pass
        except Exception as e:  # surface errors as HTTP 400, like vlselect
            if path in _METERED_PATHS:
                self.state.inc("vl_http_errors_total", "path", path)
            try:
                self._err(e)
            except Exception:
                pass

    def _select(self, path: str, params):
        st = self.state
        spark, df = st.spark, st.df()
        if "tenant" in df.columns:
            # queries run over ONE tenant, chosen by the same headers as
            # ingestion (reference: every /select handler resolves
            # GetTenantIDFromRequest first); the tenant column itself is
            # engine identity, never a queryable log field — drop it so
            # wire output and field listings match the reference
            from victorialogs_spark.schema import for_tenant

            df = for_tenant(df, *self._tenant()).drop("tenant")
        q = self._get(params, "query", "*")
        start = _time_arg_ns(self._get(params, "start"))
        end = _time_arg_ns(self._get(params, "end"))
        # the query's evaluation timestamp ('now' anchors, relative
        # offsets): the `time` arg, else end, else now — minus 1 ns so
        # logs in the first nanosecond of the NEXT period aren't caught
        # (parseCommonArgs, logsql.go:1154-1171)
        import time as _t

        ts = _time_arg_ns(self._get(params, "time"))
        if ts is None:
            ts = end if end is not None else _t.time_ns()
        ts -= 1
        # every /select endpoint gets the full common-arg set, exactly
        # like the reference's parseCommonArgs (before r15 only /query
        # saw start/end, and extra_filters were dropped everywhere else)
        common = {
            "timestamp_ns": ts,
            "start_ns": start,
            "end_ns": end,
            "extra_filters": params.get("extra_filters"),
            "extra_stream_filters": params.get("extra_stream_filters"),
        }
        if path == "/select/logsql/query":
            limit = int(self._get(params, "limit", "0"))
            # the UNBOUNDED tenant frame: the endpoint builders apply
            # start/end themselves (tenant filtering must still apply)
            base = st.df()
            if "tenant" in base.columns:
                from victorialogs_spark.schema import for_tenant

                base = for_tenant(base, *self._tenant()).drop("tenant")
            from victorialogs_spark.logsql.parser import parse_query

            if limit > 0 and ep.can_return_last_n(parse_query(q, ts)):
                # limit on a plain query means "the NEWEST N rows,
                # ascending" (reference getLastNQueryResults), not the
                # first N the scan happens to produce
                out = ep.query_last_n(spark, base, q, limit, **common)
                lines = (
                    json.dumps(
                        ep.row_to_wire_dict(r), separators=(",", ":")
                    )
                    for r in out.toLocalIterator()
                )
                limit = 0  # already applied
            else:
                lines = ep.query_ndjson(spark, base, q, **common)
            # pull the first line BEFORE sending headers: query_ndjson is
            # a generator, so parse/plan/first-batch errors fire here and
            # surface as a clean 400 instead of corrupting a 200 stream
            _EOS = object()
            first = next(lines, _EOS)
            self.send_response(200)
            self.send_header("Content-Type", "application/stream+json")
            self.end_headers()
            self._streaming = True
            if first is _EOS:
                return
            import itertools

            for i, line in enumerate(itertools.chain([first], lines)):
                if limit > 0 and i >= limit:
                    break
                self.wfile.write(line.encode("utf-8") + b"\n")
            return
        if path == "/select/logsql/tail":
            from victorialogs_spark.logsql.parser import parse_query

            parse_query(q, ts)
            from victorialogs_spark.streaming.tail import LiveTailer

            polls = int(self._get(params, "polls", "0")) or None
            refresh = float(self._get(params, "refresh", "1.0"))
            from victorialogs_spark.planner.filters import _time_range
            from victorialogs_spark.schema import for_tenant

            lo = start if start is not None else None
            hi = end if end is not None else None
            acct, proj = self._tenant()

            extra = params.get("extra_filters")
            extra_stream = params.get("extra_stream_filters")

            def _src():
                # the lambda re-reads state, keeping liveness; each poll
                # re-applies the request's tenant + time bounds +
                # extra filters (the reference routes tail through
                # parseCommonArgs too, logsql.go:501)
                d = st.df()
                if "tenant" in d.columns:
                    d = for_tenant(d, acct, proj).drop("tenant")
                if lo is not None or hi is not None:
                    d = d.where(
                        _time_range(
                            d,
                            lo if lo is not None else -(2**62),
                            hi if hi is not None else 2**62,
                        )
                    )
                if extra or extra_stream:
                    from victorialogs_spark.planner.planner import plan_query

                    qf = ep.apply_common_args(
                        parse_query("*", ts), None, None,
                        extra, extra_stream, ts,
                    )
                    d = plan_query(spark, d, qf)
                return d
            tailer = LiveTailer(spark, _src, q, refresh_interval=refresh)
            self.send_response(200)
            self.send_header("Content-Type", "application/stream+json")
            self.end_headers()
            self._streaming = True
            for row in tailer.tail(max_polls=polls):
                d = ep.row_to_wire_dict(row)
                self.wfile.write(
                    json.dumps(d, separators=(",", ":")).encode("utf-8") + b"\n"
                )
                self.wfile.flush()
            return
        if path == "/select/logsql/hits":
            out = ep.hits(
                spark, df, q,
                step=self._get(params, "step", "1h"),
                offset=self._get(params, "offset", "0s"),
                fields=params.get("field"),
                **common,
            )
            return self._send_json_stream(out)
        if path == "/select/logsql/stats_query":
            out = ep.stats_query(spark, df, q, **common)
            return self._send_json_stream(out)
        if path == "/select/logsql/stats_query_range":
            out = ep.stats_query_range(
                spark, df, q, step=self._get(params, "step", "1h"), **common
            )
            return self._send_json_stream(out)
        def _limit(default="0"):
            # the reference clamps negative limits to 0 = unlimited
            # (ProcessStreamFieldValuesRequest et al.: if limit < 0 {0})
            return max(0, int(self._get(params, "limit", default)))

        def _field_arg():
            v = self._get(params, "field", "")
            if not v:
                # reference: httpserver.Errorf "missing 'field' query arg"
                raise ValueError("missing 'field' query arg")
            return v

        if path == "/select/logsql/facets":
            out = ep.facets(
                spark, df, q, limit=int(self._get(params, "limit", "10")),
                common=common,
            )
            return self._send_json_stream(out)
        if path == "/select/logsql/field_names":
            return self._send_json_stream(
                ep.field_names(spark, df, q, common=common)
            )
        if path == "/select/logsql/field_values":
            out = ep.field_values(
                spark, df, _field_arg(), q, limit=_limit(), common=common,
            )
            return self._send_json_stream(out)
        if path == "/select/logsql/streams":
            out = ep.streams(spark, df, q, limit=_limit(), common=common)
            return self._send_json_stream(out)
        if path == "/select/logsql/stream_ids":
            out = ep.stream_ids(spark, df, q, limit=_limit(), common=common)
            return self._send_json_stream(out)
        if path == "/select/logsql/stream_field_names":
            return self._send_json_stream(
                ep.stream_field_names(spark, df, q, common=common)
            )
        if path == "/select/logsql/stream_field_values":
            out = ep.stream_field_values(
                spark, df, _field_arg(), q, limit=_limit(), common=common,
            )
            return self._send_json_stream(out)
        return self._send(404, b"unknown /select path\n", "text/plain")

    def _insert(self, path: str, params):
        st = self.state
        body = getattr(self, "_body", b"")
        if path == "/insert/ready":
            # readiness probe for agents (app/vlinsert/main.go:66)
            return self._send(200, b"ok\n", "text/plain")
        if path == "/insert/jsonline":
            lines = body.decode("utf-8", "replace").splitlines()
            sf = self._get(params, "_stream_fields", "")
            # _time_field/_msg_field are comma-separated CANDIDATE lists
            # (httputil.GetArray; apptest key_concepts corpus)
            tfs = [
                t for t in self._get(params, "_time_field", "_time").split(",") if t
            ] or ["_time"]
            mfs = [
                m for m in self._get(params, "_msg_field", "_msg").split(",") if m
            ] or ["_msg"]
            df = ingest_ndjson(
                st.spark, lines,
                time_field=tfs,
                msg_field=mfs,
                stream_fields=[s for s in sf.split(",") if s] or None,
            )
            self._append(df, "jsonline")
            return self._send(200, b"", "text/plain")
        if path == "/insert/elasticsearch/_bulk":
            # app/vlinsert/elasticsearch: strictly-alternating bulk NDJSON
            # (command, then document); common args select the time/msg
            # fields (GetCommonParams defaults: _time, no msg rename) —
            # filebeat-style senders pass ?_time_field=@timestamp&
            # _msg_field=message; a malformed request 400s whole
            from victorialogs_spark.sources.protocols import (
                es_bulk_rows,
                parsed_rows_df,
            )

            def _arr(name, default):
                vals = [v for p in params.get(name, []) for v in p.split(",") if v]
                return vals or default

            try:
                rows = es_bulk_rows(
                    body.decode("utf-8", "replace"),
                    _arr("_time_field", ["_time"]),
                    _arr("_msg_field", []),
                )
            except ValueError as e:
                return self._send(
                    400,
                    f"cannot decode bulk request: {e}\n".encode(),
                    "text/plain",
                )
            if rows:
                self._append(
                    parsed_rows_df(st.spark, rows), "elasticsearch_bulk"
                )
            # ES clients require a JSON ack with per-item status
            return self._send(200, b'{"took":0,"errors":false,"items":[]}')
        if path == "/insert/elasticsearch/":
            # fake version probe answered like the reference so ES
            # exporters accept the endpoint (elasticsearch.go TODO probe)
            return self._send(
                200, b'{"version":{"number":"8.9.0"}}', "application/json"
            )
        if path == "/insert/loki/api/v1/push":
            # content negotiation like the reference (loki.go:35): only
            # application/json takes the JSON path; everything else is
            # protobuf, snappy-compressed unless Content-Encoding says
            # otherwise (loki_protobuf.go:44)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype == "application/json":
                from victorialogs_spark.sources.protocols import parse_loki_push

                self._append(
                    parse_loki_push(
                        st.spark, _lines_df(st.spark, body, split=False)
                    ),
                    "loki",
                )
            else:
                from victorialogs_spark.sources.protocols import (
                    parse_loki_protobuf,
                )

                enc = self.headers.get("Content-Encoding") or "snappy"
                self._append(
                    parse_loki_protobuf(
                        st.spark, [body], snappy=(enc == "snappy")
                    ),
                    "loki",
                )
            return self._send(204, b"", "text/plain")
        if path == "/insert/datadog/api/v2/logs":
            from victorialogs_spark.sources.protocols import (
                parse_datadog_logs,
            )

            self._append(
                parse_datadog_logs(
                    st.spark, _lines_df(st.spark, body, split=False)
                ),
                "datadog",
            )
            return self._send(202, b'{"status":"accepted"}')
        if path == "/insert/journald":
            from victorialogs_spark.sources.protocols import (
                parse_journald_export,
            )

            blob = st.spark.createDataFrame(
                [(body.decode("utf-8", "replace"),)], "value string"
            )
            self._append(parse_journald_export(st.spark, blob), "journald")
            return self._send(200, b"", "text/plain")
        if path == "/insert/opentelemetry/v1/logs":
            # protobuf ONLY, like the reference (opentelemetry.go:27)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype == "application/json":
                return self._send(
                    415, b"json encoding isn't supported; use protobuf\n",
                    "text/plain",
                )
            from victorialogs_spark.sources.protocols import parse_otlp_protobuf

            self._append(parse_otlp_protobuf(st.spark, [body]), "opentelemetry")
            return self._send(200, b"", "text/plain")
        return self._send(404, b"unknown /insert path\n", "text/plain")


class LogHTTPServer:
    """`serve(spark, df, port).stop()` — a facade instance per test/session.

    ``spill_dir`` is where acked ingest micro-batches are flushed as
    parquet once _State.FLUSH_ROWS accumulate (bounding read-path plan
    growth under sustained ingest). Default: a private temp dir removed
    by stop(). Pass a durable path to keep flushed rows across restarts
    (the production shape: acked writes belong in storage)."""

    def __init__(
        self,
        spark: SparkSession,
        logs: DataFrame | None = None,
        port: int = 0,
        spill_dir: str | None = None,
        retention_days: int | None = None,
    ):
        import tempfile

        self._own_spill = spill_dir is None
        if spill_dir is None:
            spill_dir = tempfile.mkdtemp(prefix="vlspark-ingest-spill-")
        self.spill_dir = spill_dir
        handler = type(
            "Handler", (_Handler,),
            {"state": _State(spark, logs, spill_dir,
                             retention_days=retention_days)},
        )
        self.httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
        self.port = self.httpd.server_address[1]
        self.state = handler.state
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def start(self) -> "LogHTTPServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        import shutil

        self.httpd.shutdown()
        self.httpd.server_close()
        # orderly shutdown: let an in-flight background flush/migration
        # commit (a kill skips this — the manifest protocol covers it)
        self.state.wait_idle(timeout=60)
        if self._own_spill:
            shutil.rmtree(self.spill_dir, ignore_errors=True)


def serve(
    spark: SparkSession,
    logs: DataFrame | None = None,
    port: int = 0,
    spill_dir: str | None = None,
    retention_days: int | None = None,
) -> LogHTTPServer:
    return LogHTTPServer(
        spark, logs, port, spill_dir, retention_days=retention_days
    ).start()
