"""Lifecycle of the facade's durable spill dir: flat flushed parquet
migrates into the day-partitioned table (``<spill>/_table/_day=*``) so
long-running serve converges to the clustered layout instead of an
unboundedly growing flat pile. The manifest (``_MANIFEST.json``) is the
single atomic commit point; these tests pin the crash-consistency
contract around it:

- a kill BETWEEN manifest commit and spill cleanup must not double-count
  (tombstoned flat files are skipped and deleted at restore);
- a kill DURING the table write (before the commit) must not
  double-count either (unlisted table files are orphans, deleted at
  restore, rows still served from flat);
- retention on the server covers migrated rows (the verdict's
  "make apply_retention provably cover migrated rows");
- time-filtered queries keep seeing un-migrated rows once the table
  part introduces the ``_day`` column (the NULL-``_day`` pruning hazard).
"""

import glob
import json
import os
import shutil
import time
import urllib.parse
import urllib.request

import pytest

from victorialogs_spark.http_server import LogHTTPServer, _State


def _post(srv, path, body: bytes):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=body,
        headers={"Content-Type": "text/plain"}, method="POST",
    )
    return urllib.request.urlopen(req)


def _count(srv, query: str) -> int:
    body = urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/select/logsql/query?query="
        + urllib.parse.quote(f"{query} | stats count() as n")
    ).read()
    return int(json.loads(body)["n"])


def _lines(day: str, n: int, tag: str) -> bytes:
    return "\n".join(
        json.dumps({"_time": f"{day}T00:00:{i % 60:02d}Z",
                    "_msg": f"{tag} {i}", "app": "life"})
        for i in range(n)
    ).encode()


def _drain(srv):
    """Background flushes are async now: wait for in-flight work, force
    a final flush of any pending tail, wait again."""
    assert srv.state.wait_idle()
    srv.state.flush_now()
    assert srv.state.wait_idle()


@pytest.fixture()
def tiny_thresholds():
    # tiny flushes; auto-migration OFF so tests drive migrate_now()
    # deterministically (the background-trigger test lowers it itself)
    old_flush, old_mig = _State.FLUSH_ROWS, _State.MIGRATE_FILES
    _State.FLUSH_ROWS = 10
    _State.MIGRATE_FILES = 99
    yield
    _State.FLUSH_ROWS = old_flush
    _State.MIGRATE_FILES = old_mig


def test_migration_compacts_flat_pile_into_day_table(
    spark, tmp_path, tiny_thresholds
):
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        # two days of data across several flushes (12 >= FLUSH_ROWS=10,
        # so each post flushes one flat file)
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"a{i}"))
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-02", 12, f"b{i}"))
        _drain(srv)
        before = _count(srv, '{app="life"}')
        assert before == 48
        n_flat_before = len(srv.state._flat_files)
        assert n_flat_before >= 3

        srv.state.migrate_now()

        # mid-lifecycle oracle: the same query is exact after migration
        assert _count(srv, '{app="life"}') == 48
        # day partitions materialized, flat pile drained
        days = sorted(os.path.basename(p) for p in
                      glob.glob(os.path.join(spill, "_table", "_day=*")))
        assert days == ["_day=20240101", "_day=20240102"]
        assert srv.state._flat_files == []
        assert os.path.exists(os.path.join(spill, "_MANIFEST.json"))
        # time-filtered query after migration: _day pruning must not
        # lose rows (both days in range)
        assert _count(
            srv, '{app="life"} _time:[2024-01-01, 2024-01-03)'
        ) == 48
        assert _count(
            srv, '{app="life"} _time:[2024-01-02, 2024-01-03)'
        ) == 24
    finally:
        srv.stop()


def test_unmigrated_rows_survive_day_pruning(spark, tmp_path,
                                             tiny_thresholds):
    """After a migration introduces the _day partition column, newly
    flushed (flat) and pending rows must still match time-filtered
    queries — a NULL _day from allowMissingColumns would silently drop
    them under the planner's day pruning."""
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        for i in range(4):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"m{i}"))
        _drain(srv)
        srv.state.migrate_now()
        assert srv.state._table_files
        # new flat flush + a pending (un-flushed) tail on a LATER day
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines("2024-01-02", 12, "flat"))
        assert srv.state.wait_idle()
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines("2024-01-02", 3, "pend"))
        assert srv.state._pending is not None
        assert _count(
            srv, '{app="life"} _time:[2024-01-02, 2024-01-03)'
        ) == 15
        assert _count(
            srv, '{app="life"} _time:[2024-01-01, 2024-01-03)'
        ) == 63
    finally:
        srv.stop()


def test_restart_between_commit_and_cleanup(spark, tmp_path,
                                            tiny_thresholds):
    """migrate_now() commits the manifest but leaves the migrated flat
    files on disk as tombstones (deleted at the NEXT migration, so
    in-flight plans never lose files) — exactly the state a kill between
    compaction and spill-cleanup leaves. A restart must serve every row
    exactly once and finish the cleanup."""
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        for i in range(4):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"k{i}"))
        _drain(srv)
        srv.state.migrate_now()
        # tombstones: committed in the manifest, still physically present
        manifest = json.load(open(os.path.join(spill, "_MANIFEST.json")))
        assert manifest["migrated_flat"]
        for name in manifest["migrated_flat"]:
            assert os.path.exists(os.path.join(spill, name))
        assert _count(srv, '{app="life"}') == 48
    finally:
        srv.stop()

    srv2 = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        assert _count(srv2, '{app="life"}') == 48  # no double count
        # restore finished the cleanup
        for name in manifest["migrated_flat"]:
            assert not os.path.exists(os.path.join(spill, name))
    finally:
        srv2.stop()


def test_restart_after_partial_table_write(spark, tmp_path,
                                           tiny_thresholds):
    """A kill DURING the table write leaves parquet under _table that no
    manifest lists. Restart must delete those orphans and keep serving
    the rows from their (still-live) flat files — once each."""
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"p{i}"))
        _drain(srv)
        flat = list(srv.state._flat_files)
        assert flat
    finally:
        srv.stop()
    # simulate the crashed migration: copy a flat file into a day dir
    # (real partial writes are spark part files; any parquet works)
    day_dir = os.path.join(spill, "_table", "_day=20240101")
    os.makedirs(day_dir)
    orphan = os.path.join(day_dir, "part-orphan.parquet")
    shutil.copy(flat[0], orphan)

    srv2 = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        assert not os.path.exists(orphan)  # orphan removed at restore
        assert _count(srv2, '{app="life"}') == 24
    finally:
        srv2.stop()


def test_server_retention_covers_migrated_rows(spark, tmp_path,
                                               tiny_thresholds):
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"o{i}"))
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-05", 12, f"n{i}"))
        _drain(srv)
        srv.state.migrate_now()
        assert _count(srv, '{app="life"}') == 48

        dropped = srv.state.apply_retention("20240103")
        assert dropped == ["20240101"]
        assert _count(srv, '{app="life"}') == 24
        assert not os.path.exists(
            os.path.join(spill, "_table", "_day=20240101")
        )
    finally:
        srv.stop()
    # retention survives a restart (manifest was rewritten)
    srv2 = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        assert _count(srv2, '{app="life"}') == 24
    finally:
        srv2.stop()


def test_background_migration_trigger(spark, tmp_path, tiny_thresholds):
    """Crossing MIGRATE_FILES at flush time kicks the background
    migration without blocking the ingest path; reads stay exact while
    it runs and after it commits."""
    spill = str(tmp_path / "spill")
    _State.MIGRATE_FILES = 3
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        for i in range(4):  # 4 flushes >= MIGRATE_FILES=3
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"t{i}"))
        deadline = time.time() + 60
        while time.time() < deadline:
            with srv.state.lock:
                done = (not srv.state._migrating
                        and bool(srv.state._table_files))
            if done:
                break
            assert _count(srv, '{app="life"}') == 48  # exact mid-flight
            time.sleep(0.2)
        assert done, "background migration never committed"
        assert _count(srv, '{app="life"}') == 48
    finally:
        srv.stop()


def test_restart_after_torn_flush(spark, tmp_path, tiny_thresholds):
    """A kill between Spark's multi-file parquet commit and the flush's
    manifest append leaves flat parquet no manifest lists — those rows
    were never committed (their flush never acked into the plan), so a
    restart must delete them instead of half-serving a torn flush."""
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"z{i}"))
        _drain(srv)
        flat = list(srv.state._flat_files)
        assert flat
    finally:
        srv.stop()
    # simulate the torn flush: a part file that landed but whose flush
    # never reached the manifest commit
    torn = os.path.join(spill, "part-torn-from-killed-flush.parquet")
    shutil.copy(flat[0], torn)

    srv2 = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        assert not os.path.exists(torn)  # deleted at restore
        assert _count(srv2, '{app="life"}') == 24  # no half-flush rows
    finally:
        srv2.stop()


def test_legacy_spill_dir_without_manifest(spark, tmp_path,
                                           tiny_thresholds):
    """A pre-lifecycle spill dir (flat parquet, no _MANIFEST.json) must
    restore every flat file — the flat_files key is absent, which means
    legacy, not torn."""
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"l{i}"))
        _drain(srv)
    finally:
        srv.stop()
    os.remove(os.path.join(spill, "_MANIFEST.json"))  # pre-r13 layout

    srv2 = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        assert _count(srv2, '{app="life"}') == 24
    finally:
        srv2.stop()


def test_automatic_retention_on_migration_and_restore(
    spark, tmp_path, tiny_thresholds
):
    """With retention_days set, expired day partitions drop at the
    migration commit (one manifest write covers migration + retention)
    and again at restore — the reference's -retentionPeriod watcher
    folded into the lifecycle's existing commit points."""
    import datetime as dt

    spill = str(tmp_path / "spill")
    old_day = (
        dt.datetime.now(dt.timezone.utc) - dt.timedelta(days=30)
    ).strftime("%Y-%m-%d")
    new_day = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d")
    srv = LogHTTPServer(
        spark, None, 0, spill_dir=spill, retention_days=7
    ).start()
    try:
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines(old_day, 12, f"x{i}"))
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines(new_day, 12, f"y{i}"))
        _drain(srv)
        assert _count(srv, '{app="life"}') == 48  # flat: not yet covered
        srv.state.migrate_now()
        # migration commit applied retention: the 30-day-old partition
        # never becomes servable from the table
        assert _count(srv, '{app="life"}') == 24
        assert not glob.glob(
            os.path.join(spill, "_table", f"_day={old_day.replace('-', '')}")
        )
    finally:
        srv.stop()
    # restore with retention still set: counts hold, no resurrection
    srv2 = LogHTTPServer(
        spark, None, 0, spill_dir=spill, retention_days=7
    ).start()
    try:
        assert _count(srv2, '{app="life"}') == 24
    finally:
        srv2.stop()


def test_day_compaction_bounds_table_file_count(spark, tmp_path,
                                                tiny_thresholds):
    """Tier-2 of the lifecycle: once a day partition accumulates
    COMPACT_FILES live files, the migration pass rewrites it into a
    clustered file set — the table-file count must PLATEAU instead of
    growing by a few files per migration forever. Old files tombstone
    (reaped at the next migration / restore), counts stay exact after
    every cycle, and a restart serves the compacted layout with the
    on-disk file set converged to the manifest."""
    old_cf = _State.COMPACT_FILES
    _State.COMPACT_FILES = 3
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    total = 0
    compacted = 0
    try:
        for i in range(6):  # each cycle: flush one file, migrate it
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"c{i}"))
            total += 12
            _drain(srv)
            srv.state.migrate_now()
            assert _count(srv, '{app="life"}') == total  # exact mid-cycle
            with srv.state.lock:
                live = list(srv.state._table_files)
                tombs = set(srv.state._table_tombs)
            # the gate bounds the live set: never COMPACT_FILES or more
            # right after a migration pass
            assert len(live) < _State.COMPACT_FILES, live
            if tombs:
                compacted += 1
                # tombstoned files still on disk for plans in flight
                for rel in tombs:
                    assert os.path.exists(os.path.join(spill, "_table", rel))
        assert compacted >= 1  # the gate actually fired
    finally:
        _State.COMPACT_FILES = old_cf
        srv.stop()

    # restart: manifest lists exactly the live set; tombstones and
    # orphans are reaped; counts hold over the compacted layout
    srv2 = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        assert _count(srv2, '{app="life"}') == total
        with srv2.state.lock:
            live = set(srv2.state._table_files)
        on_disk = set(srv2.state._list_table_files())
        assert on_disk == live
    finally:
        srv2.stop()


def test_transient_migration_failure_retries(spark, tmp_path,
                                             tiny_thresholds,
                                             monkeypatch):
    """One failed migration must NOT disable the lifecycle for the
    process (the unbounded-flat-pile regression): the gate retries
    until MIGRATE_MAX_FAILS consecutive failures, and a success resets
    the counter."""
    from victorialogs_spark.streaming import ingest as ingest_mod

    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines("2024-01-01", 12, "t0"))
        _drain(srv)

        real = ingest_mod.append_day_partitioned

        def boom(*a, **k):
            raise RuntimeError("transient blip")

        monkeypatch.setattr(ingest_mod, "append_day_partitioned", boom)
        srv.state.migrate_now()
        assert srv.state._migrate_fails == 1
        assert srv.state._migrate_ok  # still enabled
        assert _count(srv, '{app="life"}') == 12  # flat stays live

        # blip clears -> the retry succeeds and resets the counter
        monkeypatch.setattr(ingest_mod, "append_day_partitioned", real)
        srv.state.migrate_now()
        assert srv.state._migrate_fails == 0
        assert _count(srv, '{app="life"}') == 12
        with srv.state.lock:
            assert not srv.state._flat_files

        # persistent failure: after MIGRATE_MAX_FAILS consecutive
        # failures the BACKGROUND gate goes dark (manual migrate_now
        # still allowed), instead of re-running a doomed rewrite
        monkeypatch.setattr(ingest_mod, "append_day_partitioned", boom)
        for i in range(_State.MIGRATE_MAX_FAILS):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-02", 12, f"p{i}"))
            _drain(srv)
            srv.state.migrate_now()
        assert srv.state._migrate_fails == _State.MIGRATE_MAX_FAILS
        old_mig = _State.MIGRATE_FILES
        _State.MIGRATE_FILES = 1
        try:
            with srv.state.lock:
                srv.state._maybe_migrate_locked()
                assert not srv.state._migrating  # gate is dark
        finally:
            _State.MIGRATE_FILES = old_mig
        # reads stay correct throughout (rows served from flat)
        assert _count(srv, '{app="life"}') == 12 + 12 * _State.MIGRATE_MAX_FAILS
    finally:
        srv.stop()


def test_retention_defers_days_under_compaction(spark, tmp_path,
                                                tiny_thresholds):
    """apply_retention() racing a compaction must not physically delete
    the day files the rewrite is reading: the day drops LOGICALLY (out
    of _table_files, out of query results, into _table_tombs) and the
    bytes are reaped at the next migration instead."""
    import datetime as dt

    spill = str(tmp_path / "spill")
    old_day = (
        dt.datetime.now(dt.timezone.utc) - dt.timedelta(days=30)
    ).strftime("%Y-%m-%d")
    new_day = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d")
    old_label = old_day.replace("-", "")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines(old_day, 12, "old"))
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines(new_day, 12, "new"))
        _drain(srv)
        srv.state.migrate_now()
        assert _count(srv, '{app="life"}') == 24

        with srv.state.lock:
            day_files = [p for p in srv.state._table_files
                         if p.startswith(f"_day={old_label}")]
        assert day_files
        # simulate the in-flight compaction window
        with srv.state.lock:
            srv.state._compacting_days = {f"_day={old_label}"}
        keep_from = (
            dt.datetime.now(dt.timezone.utc) - dt.timedelta(days=7)
        ).strftime("%Y%m%d")
        dropped = srv.state.apply_retention(keep_from)
        assert old_label in dropped
        # logical drop: results exclude the day immediately...
        assert _count(srv, '{app="life"}') == 12
        # ...but the bytes the compaction is reading are still on disk
        for rel in day_files:
            assert os.path.exists(os.path.join(spill, "_table", rel))
        with srv.state.lock:
            assert set(day_files) <= srv.state._table_tombs
            srv.state._compacting_days = set()

        # the next migration reaps the deferred bytes
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines(new_day, 12, "new2"))
        _drain(srv)
        srv.state.migrate_now()
        for rel in day_files:
            assert not os.path.exists(os.path.join(spill, "_table", rel))
        assert _count(srv, '{app="life"}') == 24
    finally:
        srv.stop()


def test_manual_retention_during_migration_no_resurrection(
    spark, tmp_path, tiny_thresholds, monkeypatch
):
    """A manual apply_retention() landing INSIDE a migration's race
    window (after the Spark rewrite, before the manifest commit) must
    not resurrect the expired day's previously-committed table files,
    must leave live-day rows exact, and must not corrupt lifecycle
    state (the racing drop of the just-written expired files is
    semantically the same drop the retention_days fold would apply at
    that very commit — expired rows may vanish, never double-count)."""
    import datetime as dt

    from victorialogs_spark.streaming import ingest as ingest_mod

    spill = str(tmp_path / "spill")
    old_day = (
        dt.datetime.now(dt.timezone.utc) - dt.timedelta(days=30)
    ).strftime("%Y-%m-%d")
    new_day = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d")
    old_label = old_day.replace("-", "")
    keep_from = (
        dt.datetime.now(dt.timezone.utc) - dt.timedelta(days=7)
    ).strftime("%Y%m%d")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        # round 1: commit expired-day AND live-day rows into the table
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines(old_day, 12, "old1"))
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines(new_day, 12, "new1"))
        _drain(srv)
        srv.state.migrate_now()
        with srv.state.lock:
            committed = [p for p in srv.state._table_files
                         if p.startswith(f"_day={old_label}")]
        assert committed

        # round 2: more expired-day rows in the flat pile; retention
        # fires inside the migration's write->commit window
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines(old_day, 12, "old2"))
        _drain(srv)
        real = ingest_mod.append_day_partitioned

        def write_then_retention(df, table_dir):
            real(df, table_dir)
            dropped = srv.state.apply_retention(keep_from)
            assert old_label in dropped

        monkeypatch.setattr(
            ingest_mod, "append_day_partitioned", write_then_retention
        )
        srv.state.migrate_now()
        monkeypatch.setattr(ingest_mod, "append_day_partitioned", real)

        with srv.state.lock:
            live = list(srv.state._table_files)
            flat = list(srv.state._flat_files)
        # no resurrection: the round-1 files retention dropped must not
        # rejoin the manifest at the racing migration's commit
        assert not (set(committed) & set(live)), (committed, live)
        # the racing retention deleted the expired day's just-written
        # files before the commit's listing: expired rows are gone from
        # both tiers (the flat batch tombstoned at the commit), live-day
        # rows are exact, nothing double-counts
        assert flat == []
        assert _count(srv, '{app="life"}') == 12
        assert _count(srv, f'{{app="life"}} _time:[{old_day}, {new_day})') == 0
        with srv.state.lock:
            assert not [p for p in srv.state._table_files
                        if p.startswith(f"_day={old_label}")]
    finally:
        srv.stop()
    # restart: the racing commit's manifest restores cleanly, counts hold
    srv2 = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    try:
        assert _count(srv2, '{app="life"}') == 12
    finally:
        srv2.stop()


def test_empty_store_serves_empty_results(spark, tmp_path,
                                          tiny_thresholds):
    """A server whose LAST day expired under retention (and a fresh
    server before any ingest) serves empty results, not HTTP 400 — the
    r14 multi-day retention soak read-errored in exactly this window.
    The planner treats filters on absent columns as missing-field
    semantics, so stream filters on never-seen labels count 0."""
    import datetime as dt

    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill,
                        retention_days=1).start()
    try:
        # fresh server: reads answer 0 before any ingest
        assert _count(srv, '{app="life"}') == 0
        old_day = (
            dt.datetime.now(dt.timezone.utc) - dt.timedelta(days=30)
        ).strftime("%Y-%m-%d")
        _post(srv, "/insert/jsonline?_stream_fields=app",
              _lines(old_day, 12, "x"))
        _drain(srv)
        assert _count(srv, '{app="life"}') == 12  # flat tier serves
        # migration commit folds retention: the only day expires and the
        # store is empty again — reads must go back to 0, not 400
        srv.state.migrate_now()
        assert _count(srv, '{app="life"}') == 0
        assert _count(srv, '_time:[2020-01-01, 2030-01-01)') == 0
    finally:
        srv.stop()


@pytest.mark.slow  # ~42 s failure-injection soak
def test_compaction_failure_does_not_disable_migration(
    spark, tmp_path, tiny_thresholds, monkeypatch
):
    """Tier-2 failures are gated PER DAY, never against the tier-1
    counter: a day whose clustered rewrite always fails must (a) leave
    every migration committing normally — no unbounded flat pile —
    (b) keep serving its un-compacted files exactly, and (c) stop
    burning rewrite attempts after COMPACT_MAX_FAILS while OTHER days
    still compact."""
    old_cf = _State.COMPACT_FILES
    _State.COMPACT_FILES = 2
    spill = str(tmp_path / "spill")
    srv = LogHTTPServer(spark, None, 0, spill_dir=spill).start()
    attempts = {"n": 0}
    real = _State._compact_one_day

    def boom(self, day, files):
        if day == "_day=20240101":
            attempts["n"] += 1
            raise RuntimeError("synthetic rewrite failure")
        return real(self, day, files)

    monkeypatch.setattr(_State, "_compact_one_day", boom)
    total = 0
    try:
        for i in range(6):  # each cycle: flush one file, migrate
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-01", 12, f"f{i}"))
            total += 12
            _drain(srv)
            srv.state.migrate_now()
            # tier-1 keeps committing: the flat pile never accumulates
            assert srv.state._flat_files == []
            assert srv.state._migrate_fails == 0
            assert srv.state._migrate_ok
            # rows stay exact from the un-compacted files
            assert _count(srv, '{app="life"}') == total
        # the failing day was attempted exactly COMPACT_MAX_FAILS times
        assert attempts["n"] == _State.COMPACT_MAX_FAILS
        with srv.state.lock:
            fails = dict(srv.state._compact_fails)
        assert fails["_day=20240101"] == _State.COMPACT_MAX_FAILS
        # a healthy OTHER day still compacts (tombstones appear for it)
        for i in range(2):
            _post(srv, "/insert/jsonline?_stream_fields=app",
                  _lines("2024-01-02", 12, f"g{i}"))
            total += 12
            _drain(srv)
            srv.state.migrate_now()
        srv.state.migrate_now()
        assert _count(srv, '{app="life"}') == total
        with srv.state.lock:
            day2 = [p for p in srv.state._table_files
                    if p.startswith("_day=20240102")]
        assert day2  # committed and served
    finally:
        _State.COMPACT_FILES = old_cf
        srv.stop()
