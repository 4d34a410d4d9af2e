"""Token-bloom side index: per-file Bloom filters over message tokens,
used to prune input FILES for word/phrase filters before the scan even
starts — the Spark-side equivalent of the reference's per-block token
bloom filters (lib/logstorage/bloomfilter.go:16-19: 6 hashes, 16 bits per
token; here per parquet file instead of per 2 MB block).

Parquet's built-in bloom filters index whole VALUES; LogsQL word filters
match TOKENS inside the message, which value blooms can't serve — hence
this sidecar. Correctness never depends on it: files absent from the
index are always scanned, and the real filter still runs after pruning.

Build is fully distributed (distinct tokens per file → applyInPandas
bitset build). Probe reads only the tiny sidecar table.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BITS_PER_TOKEN = 16  # same density as the reference
NUM_HASHES = 6

# the bloom tokenizer MUST match the phrase-filter tokenizer exactly —
# a charset divergence makes pruning skip files containing real matches
# with no test signal; derive from the single source of truth
from victorialogs_spark.functions.text import TOKEN_RE as _TOKEN_CLASS
from victorialogs_spark.functions.text import py_tokens

_TOKEN_RE = _TOKEN_CLASS + "+"


def _bloom_positions(token: str, nbits: int) -> list[int]:
    """k deterministic bit positions for a token (md5-derived, engine- and
    process-independent)."""
    out = []
    for i in range(NUM_HASHES):
        h = hashlib.md5(f"{i}|{token}".encode("utf-8")).digest()
        out.append(int.from_bytes(h[:8], "big") % nbits)
    return out


def _bloom_size(n_tokens: int) -> int:
    bits = max(64, n_tokens * BITS_PER_TOKEN)
    return (bits + 7) // 8 * 8  # whole bytes


def build_token_bloom_index(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    fields: list[str] | None = None,
) -> None:
    """Build the sidecar: one row per (file) with a bloom over the distinct
    tokens of ``fields`` (default: _msg). Run it after ingest/compaction."""
    fields = fields or ["_msg"]
    df = spark.read.parquet(table_path)
    cols = [c for c in fields if c in df.columns]
    if not cols:
        raise ValueError(f"none of {fields} present in {table_path}")
    # coalesce each field to '': a single NULL field would make flatten()
    # NULL and drop the row's OTHER tokens from the bloom — a false
    # negative that would let pruning skip files containing real matches
    toks = F.explode(
        F.array_distinct(
            F.flatten(
                F.array(
                    *[
                        F.regexp_extract_all(
                            F.coalesce(F.col(c), F.lit("")), F.lit(_TOKEN_RE), 0
                        )
                        for c in cols
                    ]
                )
            )
        )
    )
    per_file = (
        df.select(F.input_file_name().alias("file"), toks.alias("token"))
        .distinct()
    )

    def _build(pdf):
        import pandas as pd

        file = pdf["file"].iloc[0]
        tokens = pdf["token"].tolist()
        nbits = _bloom_size(len(tokens))
        bits = bytearray(nbits // 8)
        for t in tokens:
            for pos in _bloom_positions(t, nbits):
                bits[pos // 8] |= 1 << (pos % 8)
        return pd.DataFrame(
            {"file": [file], "n_tokens": [len(tokens)], "bloom": [bytes(bits)]}
        )

    schema = "file string, n_tokens long, bloom binary"
    index = per_file.groupBy("file").applyInPandas(_build, schema)
    # record WHICH fields were indexed so a rebuild (cli compact
    # --index) can preserve the sidecar's semantics instead of silently
    # reverting to the default field set
    index.withColumn("fields", F.lit(",".join(cols))).write.mode(
        "overwrite"
    ).parquet(index_path)


def _maybe_contains(bloom: bytes, token: str) -> bool:
    nbits = len(bloom) * 8
    if nbits == 0:
        return True
    for pos in _bloom_positions(token, nbits):
        if not (bloom[pos // 8] >> (pos % 8)) & 1:
            return False
    return True


def candidate_files(
    spark: SparkSession,
    index_path: str,
    tokens: list[str],
    tokens_by_field: dict[str, list[str]] | None = None,
) -> list[str]:
    """Files that may contain ALL of ``tokens`` (bloom AND-semantics, the
    same conjunctive pruning the reference applies per block). Small
    local sidecars probe driver-side (index/local.py); otherwise the
    probe runs distributed over the sidecar — only matching file NAMES
    reach the driver, never the bloom bitsets (at 100 TB the sidecar
    holds one row per file; bitsets can be MBs each).

    When ``tokens_by_field`` is given, each file is probed ONLY with the
    tokens of fields THAT file's sidecar row indexed (per-row "fields"):
    in a heterogeneous sidecar (partial rebuild / append with a different
    field set), probing a file with tokens of a field it never indexed
    would wrongly prune matching files — r15 advice. A file whose field
    set carries no query tokens is kept (nothing prunable about it)."""
    from victorialogs_spark.index.local import read_local_index

    if tokens_by_field is not None:
        def _req(fields_str):
            out: list[str] = []
            for f in (fields_str or "_msg").split(","):
                out.extend(tokens_by_field.get(f, ()))
            return out

        local = read_local_index(index_path)
        if local is not None:
            return [
                r["file"]
                for r in local
                if r["bloom"] is not None
                and all(
                    _maybe_contains(bytes(r["bloom"]), t)
                    for t in _req(r.get("fields"))
                )
            ]

        def _probe_f(b, fields_str) -> bool:
            return b is not None and all(
                _maybe_contains(bytes(b), t) for t in _req(fields_str)
            )

        probe = F.udf(_probe_f, "boolean")
        idx = spark.read.parquet(index_path)
        fields_col = (
            F.col("fields") if "fields" in idx.columns else F.lit("_msg")
        )
        return [
            r["file"]
            for r in idx.where(probe(F.col("bloom"), fields_col))
            .select("file")
            .collect()
        ]

    toks = list(tokens)

    local = read_local_index(index_path)
    if local is not None:
        return [
            r["file"]
            for r in local
            if r["bloom"] is not None
            and all(_maybe_contains(bytes(r["bloom"]), t) for t in toks)
        ]

    def _probe(b) -> bool:
        return b is not None and all(
            _maybe_contains(bytes(b), t) for t in toks
        )

    probe = F.udf(_probe, "boolean")
    idx = spark.read.parquet(index_path)
    return [r["file"] for r in idx.where(probe(F.col("bloom"))).select("file").collect()]


def _indexed_fields(spark: SparkSession, index_path: str) -> set[str]:
    """The field set a sidecar was built over, from its recorded
    "fields" column; sidecars predating that column were always built
    with the default ["_msg"]."""
    from victorialogs_spark.index.local import read_local_index

    local = read_local_index(index_path)
    if local is not None:
        out: set[str] = set()
        for r in local:
            out.update((r.get("fields") or "_msg").split(","))
        return out or {"_msg"}
    try:
        idx = spark.read.parquet(index_path)
        if "fields" not in idx.columns:
            return {"_msg"}
        # union over DISTINCT row values — a heterogeneous sidecar
        # (partial rebuild / append over a different field set) must
        # surface every field any row indexed, not just the first row's
        # (r15 advice); per-file soundness is handled by candidate_files'
        # tokens_by_field probe
        out = set()
        for row in idx.select("fields").distinct().collect():
            out.update((row[0] or "_msg").split(","))
        return out or {"_msg"}
    except Exception:  # noqa: BLE001 — unreadable sidecar: no pruning
        return set()


def words_of_query(query: str, field: str = "_msg") -> list[str]:
    """Extract the top-level conjunct word/phrase tokens on ``field`` from a
    LogsQL query — the prunable part of the filter."""
    from victorialogs_spark.logsql import ast as A
    from victorialogs_spark.logsql.parser import parse_query

    q = parse_query(query)
    conjuncts = q.filter.children if isinstance(q.filter, A.FAnd) else [q.filter]
    toks: list[str] = []
    for c in conjuncts:
        if isinstance(c, A.FPhrase) and c.field == field and not c.case_insensitive:
            # py_tokens, not re.findall: Python re has no \p{L}, and the
            # probe MUST classify exactly like the JVM index build or
            # pruning silently drops matching files (r15 tokenizer parity)
            toks.extend(py_tokens(c.phrase))
    return toks


def read_pruned(
    spark: SparkSession,
    table_path: str,
    index_path: str | None,
    query: str,
    stream_index_path: str | None = None,
) -> DataFrame:
    """Read the log table scanning ONLY files that may match the query's
    word filters (token-bloom sidecar, ``index_path``) AND its stream
    constraints (stream-value sidecar, ``stream_index_path`` —
    index/streams.py). Unknown (unindexed) files are always included.
    Returns the full table reader when nothing is prunable."""
    tokens_by_field: dict[str, list[str]] = {}
    if index_path:
        # the probe is only sound for tokens of fields the sidecar
        # actually indexed: a sidecar built over a label column must not
        # prune on _msg tokens (files whose label bloom lacks the token
        # would be dropped even though their _msg matches — r14 review
        # finding). Collect tokens PER indexed field so each file is
        # probed only with the fields its own sidecar row indexed
        # (heterogeneous sidecars — r15 advice).
        for f in sorted(_indexed_fields(spark, index_path)):
            t = words_of_query(query, field=f)
            if t:
                tokens_by_field[f] = t
    full = spark.read.parquet(table_path)
    if not tokens_by_field and stream_index_path is None:
        return full
    # metadata-only file listing — a select(input_file_name()).distinct()
    # would scan every row just to enumerate files, costing more than the
    # pruning saves
    all_files = list(full.inputFiles())
    hive = any("=" in f.rsplit("/", 2)[-2] for f in all_files if "/" in f)
    keep = all_files
    if tokens_by_field:
        from victorialogs_spark.index.local import read_local_index

        local = read_local_index(index_path)
        if local is not None:
            indexed = {r["file"] for r in local}
        else:
            indexed = {
                r["file"]
                for r in spark.read.parquet(index_path).select("file").collect()
            }
        cands = set(
            candidate_files(
                spark, index_path, [], tokens_by_field=tokens_by_field
            )
        )
        keep = [f for f in keep if f not in indexed or f in cands]
    if stream_index_path is not None:
        from victorialogs_spark.index.streams import prune_files

        keep = prune_files(spark, table_path, stream_index_path, query, keep)
    if not keep:
        return full.limit(0)
    if len(keep) == len(all_files):
        return full
    reader = spark.read.schema(full.schema)
    if hive:
        # basePath keeps partition columns (_day=... directory values)
        # populated when reading leaf files directly — without it a
        # day-partitioned table (the compact_day layout) would come back
        # with NULL partition columns
        reader = reader.option("basePath", table_path)
    return reader.parquet(*keep)


# ---------------------------------------------------------------------------
# planner integration: registered indexes are consulted automatically when
# a query runs against a table PATH (api.run_query accepts either a
# DataFrame or a path) — the analogue of the reference probing its token
# blooms on every word filter (lib/logstorage/filter_phrase.go:85-122).
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, str] = {}


def _norm_path(p: str) -> str:
    import os
    import urllib.parse

    # strip a file: scheme FIRST (abspath("file:///x") would produce a
    # cwd-dependent "<cwd>/file:/x" key that never matches a later plain
    # path lookup — r14 review finding; same idiom as
    # index/local.read_local_index), then abspath only scheme-less
    # local paths: abspath would mangle s3://bucket/x into
    # <cwd>/s3:/bucket/x and make registered indexes unfindable
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    if urllib.parse.urlparse(p).scheme == "":
        return os.path.abspath(p).rstrip("/")
    return p.rstrip("/")


def register_bloom_index(table_path: str, index_path: str) -> None:
    """Associate a sidecar bloom index with a log-table path. Subsequent
    ``api.run_query(spark, table_path, query)`` calls prune input files
    through it automatically."""
    _REGISTRY[_norm_path(table_path)] = index_path


def open_log_table(spark: SparkSession, table_path: str, query: str) -> DataFrame:
    """Open a log table for a query, applying every registered sidecar
    prune (token bloom + stream values). Falls back to a plain reader
    when nothing is registered or nothing in the query is prunable;
    correctness never depends on the indexes."""
    from victorialogs_spark.index.streams import _STREAM_REGISTRY

    key = _norm_path(table_path)
    idx = _REGISTRY.get(key)
    sidx = _STREAM_REGISTRY.get(key)
    if idx is None and sidx is None:
        return spark.read.parquet(table_path)
    return read_pruned(spark, table_path, idx, query, stream_index_path=sidx)
