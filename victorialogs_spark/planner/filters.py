"""Filter AST → pyspark Column predicates.

Every filter compiles to a declarative Column expression so Catalyst can
push it into the Parquet scan (PushedFilters) wherever possible. String
matching uses token-boundary regexes (functions/text.py) mirroring the
reference matchers (lib/logstorage/filter_phrase.go et al.).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victorialogs_spark.functions.natural import fcol, ipv4_num, num, qcol
from victorialogs_spark.functions.text import (
    anonymize_named_groups,
    phrase_regex,
    prefix_regex,
    seq_regex,
    to_java_regex,
)
from victorialogs_spark.logsql import ast as A


def _java_pattern(pattern: str) -> str:
    """User regex → what rlike executes. Named groups are meaningless to
    a boolean match, so they are anonymized to plain groups (numbering
    preserved) — Java's group-name grammar rejects reference-legal
    names like ``_msg`` (r15 pipe-semantics corpus finding). (?u) makes
    Java's (?i) fold Unicode like Go's RE2 does — without UNICODE_CASE,
    Java folds ASCII only and (?i)йцу misses ЙЦУ (r15 filter corpus
    finding); it changes nothing else."""
    return "(?u)" + anonymize_named_groups(to_java_regex(pattern))


def compile_filter(f: A.Filter, df: DataFrame, ctx=None) -> Column:
    """Compile a filter tree into a boolean Column over `df`."""
    if isinstance(f, A.FNoop):
        return F.lit(True)
    if isinstance(f, A.FAnd):
        out = F.lit(True)
        for c in f.children:
            out = out & compile_filter(c, df, ctx)
        return out
    if isinstance(f, A.FOr):
        out = F.lit(False)
        for c in f.children:
            out = out | compile_filter(c, df, ctx)
        return out
    if isinstance(f, A.FNot):
        # coalesce: NULL (three-valued logic) must read as non-match BEFORE
        # the negation, so NOT of a NULL-row predicate keeps the row
        return ~F.coalesce(compile_filter(f.child, df, ctx), F.lit(False))

    if isinstance(f, A.FPhrase):
        return _phrase(df, f.field, f.phrase, f.case_insensitive)
    if isinstance(f, A.FPrefix):
        c = fcol(df, f.field)
        if f.prefix == "":
            return c != ""  # any non-empty value (field exists)
        if f.case_insensitive:
            return F.lower(c).rlike(prefix_regex(f.prefix.lower()))
        return c.rlike(prefix_regex(f.prefix))
    if isinstance(f, A.FExact):
        if f.value == "":
            return fcol(df, f.field) == ""  # '' must also match NULL/missing
        return _raw(df, f.field) == f.value
    if isinstance(f, A.FExactPrefix):
        if f.prefix == "":
            return F.lit(True)
        return _raw(df, f.field).startswith(f.prefix)
    if isinstance(f, A.FIn):
        if not f.values:
            return F.lit(False)
        if "" in f.values:
            return fcol(df, f.field).isin(f.values)
        return _raw(df, f.field).isin(f.values)
    if isinstance(f, A.FFlagCol):
        # membership precomputed by the planner as a left-join flag
        return F.coalesce(F.col(f.name), F.lit(False))
    if isinstance(f, A.FInSubquery):
        # normally resolved by planner._resolve_nested_in_subqueries into
        # FIn/FFlagCol; this direct path remains for per-func `if (...)`
        # conditions compiled outside apply_filter_df (bounded below)
        values = _subquery_values(f.query, ctx)
        if values is None:
            raise ValueError("in(subquery) requires a plan context")
        if not values:
            return F.lit(False)
        return fcol(df, f.field).isin(values)
    if isinstance(f, A.FContains):
        values = f.values
        if f.subquery is not None:
            values = _subquery_values(f.subquery, ctx) or []
        if not values:
            # contains_all() with no args matches all; contains_any() none
            return F.lit(True) if f.require_all else F.lit(False)
        # '' operand matches everything: contains_any short-circuits to
        # all-match (filter_contains_any.go:34-37), contains_all skips it
        # (matchAllPhrases, filter_contains_all.go:311-314) — r15 filter
        # corpus finding
        if "" in values:
            if not f.require_all:
                return F.lit(True)
            values = [v for v in values if v != ""]
            if not values:
                return F.lit(True)
        parts = [_phrase(df, f.field, v, False) for v in values]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if f.require_all else (out | p)
        return out
    if isinstance(f, A.FSeq):
        # empty phrases drop (filter_sequence.go initNonEmptyPhrases);
        # all-empty ≡ no phrases ≡ match everything
        values = [v for v in f.values if v != ""]
        if not values:
            return F.lit(True)
        return fcol(df, f.field).rlike(seq_regex(values))
    if isinstance(f, A.FRegexp):
        # trivial regexes fold like the reference's Query.optimize:
        # ~"" / ~".*" match everything; ~".+" is the non-empty check
        if f.pattern in ("", ".*"):
            return F.lit(True)
        if f.pattern == ".+":
            return fcol(df, f.field) != ""
        return fcol(df, f.field).rlike(_java_pattern(f.pattern))
    if isinstance(f, A.FRange):
        if dict(df.dtypes).get(f.field) in _INTEGRAL_TYPES:
            return _int_range(df, f)

        def bounds(n: Column) -> Column:
            lo = (n >= f.lo) if f.include_lo else (n > f.lo)
            hi = (n <= f.hi) if f.include_hi else (n < f.hi)
            if f.lo == float("-inf") and not f.include_lo:
                lo = F.lit(True)
            if f.hi == float("inf") and f.include_hi:
                hi = F.lit(True)
            return lo & hi

        n = num(df, f.field)
        # NaN never matches a range (Go: any NaN comparison is false;
        # Spark orders NaN above all doubles, which would make open-ended
        # '>x' ranges match "NaN" values).
        dt = dict(df.dtypes).get(f.field)
        if dt is not None and dt != "string":
            # typed numeric/timestamp column: no IPv4 strings possible,
            # and the plain conjunction stays pushable into the Parquet
            # scan (a CASE WHEN form kills PushedFilters — pinned by
            # test_compaction_value_type_specialization)
            return n.isNotNull() & ~F.isnan(n) & bounds(n)
        # string columns: matchRange parses each value with
        # parseMathNumber (filter_range.go:369-372) — plain/hex numbers,
        # duration literals (ns: 'request_time:>100ms' matches '150ms'),
        # byte sizes, RFC3339 timestamps, and IPv4 as packed uint32
        # (also matching the valueTypeIPv4 block fast path).
        from victorialogs_spark.planner.pipes import _math_num

        m = _math_num(df, f.field)
        return F.when(m.isNotNull() & ~F.isnan(m), bounds(m)).otherwise(
            F.lit(False)
        )
    if isinstance(f, A.FIPv4Range):
        n = ipv4_num(fcol(df, f.field))
        return n.isNotNull() & (n >= f.lo) & (n <= f.hi)
    if isinstance(f, A.FStringRange):
        if f.lo == "":
            c = fcol(df, f.field)  # lo='' must include NULL/missing values
            return (c >= f.lo) & (c < f.hi)
        c = _raw(df, f.field)
        return (c >= f.lo) & (c < f.hi)
    if isinstance(f, A.FLenRange):
        ln = F.octet_length(fcol(df, f.field))
        return (ln >= f.lo) & (ln <= f.hi)
    if isinstance(f, A.FValueType):
        return _value_type(df, f.field, f.value_type)
    if isinstance(f, A.FEqField):
        return fcol(df, f.field) == fcol(df, f.other)
    if isinstance(f, A.FCmpField):
        # leValuesString (filter_le_field.go:284): both sides through
        # parseMathNumber — plain/hex numbers, duration literals (ns),
        # byte sizes, RFC3339 timestamps (ns), IPv4 (uint32) — compared
        # numerically when BOTH parse ('5s' <= '1m', '1.2.3.4' <=
        # '1.2.4.0'), else bytewise string compare. This also matches
        # the per-valueType fast paths (applyFilterLeUint/Int64/Float64
        # compare the same parsed values on homogeneous columns).
        from victorialogs_spark.planner.pipes import _math_num

        a_s, b_s = fcol(df, f.field), fcol(df, f.other)
        a_n, b_n = _math_num(df, f.field), _math_num(df, f.other)
        both_num = a_n.isNotNull() & b_n.isNotNull()
        if f.allow_eq:
            return F.when(both_num, a_n <= b_n).otherwise(a_s <= b_s)
        return F.when(both_num, a_n < b_n).otherwise(a_s < b_s)
    if isinstance(f, A.FTime):
        return _time_range(df, f.lo_ns, f.hi_ns)
    if isinstance(f, A.FDayRange):
        # reference-exact ns-of-day semantics (filter_day_range.go:116-124,
        # parser.go:2448-2453): dayOffset = (ts - offset) % nsecsPerDay,
        # match start <= dayOffset <= end, with '('/')' braces moving the
        # bound by exactly 1 ns. The previous minute-resolution compare
        # wrongly admitted the whole end minute under an inclusive ']'
        # (day_range[.., 18:00] must stop at 18:00:00.000000000 — r15
        # filter_time family review). Spark's % keeps the dividend's sign
        # like Go's, so pre-epoch timestamps agree too.
        ns_day = 86_400_000_000_000
        start = f.lo_minute * 60_000_000_000 + (0 if f.include_lo else 1)
        end = f.hi_minute * 60_000_000_000 - (0 if f.include_hi else 1)
        if start > end:
            return F.lit(False)
        if "__time_nanos" in df.columns:
            ns = F.col("__time_nanos") - F.lit(f.offset_ns)
        else:
            ns = F.unix_micros(qcol("_time")) * F.lit(1000) - F.lit(f.offset_ns)
        d = ns % F.lit(ns_day)
        return (d >= F.lit(start)) & (d <= F.lit(end))
    if isinstance(f, A.FWeekRange):
        t = qcol("_time")
        if f.offset_ns:
            # reference subtracts the offset (filter_week_range.go)
            t = F.timestamp_micros(F.unix_micros(t) - f.offset_ns // 1000)
        dow = F.dayofweek(t) - 1  # Spark: 1=Sunday → 0=Sunday
        lo = (dow >= f.lo_day) if f.include_lo else (dow > f.lo_day)
        hi = (dow <= f.hi_day) if f.include_hi else (dow < f.hi_day)
        return lo & hi
    if isinstance(f, A.FStream):
        return _stream_filter(df, f)
    if isinstance(f, A.FStreamId):
        return fcol(df, "_stream_id").isin(f.ids)
    raise NotImplementedError(f"filter {type(f).__name__}")


def _raw(df: DataFrame, field: str) -> Column:
    """Raw column reference (no coalesce-to-'' wrapper) for predicates whose
    NULL result is equivalent to False — keeps the predicate pushable into
    the Parquet scan (PushedFilters), which the fcol() wrapper would block.
    Only valid when the compared value can never be '' (NULL ≡ missing ≡
    '' would otherwise need to match)."""
    if field not in df.columns:
        return F.lit(None).cast("string")
    dt = dict(df.dtypes).get(field)
    c = qcol(field)
    if dt == "timestamp":
        from victorialogs_spark.functions.natural import ts_rfc3339_str

        return ts_rfc3339_str(c)
    if dt != "string":
        return c.cast("string")
    return c


def _phrase(df: DataFrame, field: str, phrase: str, ci: bool) -> Column:
    c = fcol(df, field)
    if phrase == "":
        return c == ""
    if ci:
        return F.lower(c).rlike(phrase_regex(phrase.lower()))
    return c.rlike(phrase_regex(phrase))


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint", "long"}
_LONG_MIN, _LONG_MAX = -(2**63), 2**63 - 1


def _int_range(df: DataFrame, f: A.FRange) -> Column:
    """Range filter on an INTEGRAL typed column: compare with integer
    literals in the column's own type. The generic path casts the column
    to double, which Catalyst cannot push into the Parquet scan — on a
    typed log table that turns a row-group-pruned range into a full
    column scan. Float bounds round to the equivalent integer bound
    (n > 200.5 ≡ n >= 201); integers can't be NaN, so the double path's
    NaN guard is unnecessary."""
    import math

    c = qcol(f.field)
    cond = c.isNotNull()
    if f.lo != float("-inf"):
        lo_i = math.ceil(f.lo) if f.include_lo else math.floor(f.lo) + 1
        if lo_i > _LONG_MAX:
            return F.lit(False)
        if lo_i > _LONG_MIN:
            cond = cond & (c >= F.lit(max(lo_i, _LONG_MIN)))
    if f.hi != float("inf"):
        hi_i = math.floor(f.hi) if f.include_hi else math.ceil(f.hi) - 1
        if hi_i < _LONG_MIN:
            return F.lit(False)
        if hi_i < _LONG_MAX:
            cond = cond & (c <= F.lit(min(hi_i, _LONG_MAX)))
    return cond


def _time_range(df: DataFrame, lo_ns: int, hi_ns: int) -> Column:
    """Inclusive ns range on _time.

    When the scan kept the raw nano-long column (``__time_nanos``, see
    schema.load_table), compare on it directly: the conversion to timestamp
    is monotonic, so ``lo_ns <= raw <= hi_ns`` is exact at ns resolution AND
    the predicate reaches Parquet as a plain long range (row-group pruning —
    the reference's block min/max time pruning,
    lib/logstorage/storage_search.go:1069-1081). Otherwise fall back to the
    µs timestamp with conservative rounding (floor lo, ceil-truncate hi)."""
    if "__time_nanos" in df.columns:
        t = F.col("__time_nanos")
        out = F.lit(True)
        if lo_ns > -(2**62):
            out = out & (t >= F.lit(lo_ns))
        if hi_ns < 2**62:
            out = out & (t <= F.lit(hi_ns))
        return out
    t = qcol("_time")
    out = F.lit(True)
    if lo_ns > -(2**62):
        out = out & (t >= F.timestamp_micros(F.lit(_ceil_div(lo_ns, 1000))))
    if hi_ns < 2**62:
        # exclusive '<' on the next µs covers any sub-µs tail of hi_ns
        out = out & (t < F.timestamp_micros(F.lit(hi_ns // 1000 + 1)))
    return out


def _ceil_div(a: int, b: int) -> int:
    return -((-a) // b)


def _stream_filter(df: DataFrame, f: A.FStream) -> Column:
    """Stream label matchers evaluated against top-level label columns (our
    schema promotes stream labels to columns; see schema.py)."""
    out = F.lit(False)
    for term in f.or_terms:
        cur = F.lit(True)
        for m in term:
            c = fcol(df, m.label)
            if m.op == "=":
                cur = cur & (c == m.value)
            elif m.op == "!=":
                cur = cur & (c != m.value)
            elif m.op == "=~":
                cur = cur & c.rlike("^(?:" + _java_pattern(m.value) + ")$")
            elif m.op == "!~":
                cur = cur & ~c.rlike("^(?:" + _java_pattern(m.value) + ")$")
        out = out | cur
    return out


_TYPE_SNIFF = {
    "uint8": r"^(?:\d|[1-9]\d|1\d\d|2[0-4]\d|25[0-5])$",
    "uint16": r"^\d{1,5}$",
    "uint32": r"^\d{1,10}$",
    "uint64": r"^\d{1,20}$",
    "int64": r"^-?\d{1,19}$",
    "float64": r"^-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?$",
    "ipv4": r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$",
    "iso8601": r"^\d{4}-\d{2}-\d{2}T.*",
}


# Spark integer/float/timestamp dtype → the reference storage types it
# can correspond to (values_encoder.go valueType*). uint* additionally
# requires the VALUE to be non-negative (the reference only picks a
# uint encoding when every value in the block is >= 0 — a signed column
# holding -5 stores as int64, never uint32).
_DTYPE_VALUE_TYPES = {
    "tinyint": {"uint8", "int64"},
    "smallint": {"uint16", "int64"},
    "int": {"uint32", "int64"},
    "bigint": {"uint64", "int64"},
    "long": {"uint64", "int64"},
    "float": {"float64"},
    "double": {"float64"},
    "timestamp": {"iso8601"},
    "timestamp_ntz": {"iso8601"},
}


# thread fan-out for the dict-encoding probe's footer reads: at 100 TB
# inputFiles() can list 10^5 paths; footers are KB-sized metadata reads,
# IO-bound and GIL-releasing, so a bounded thread pool keeps the
# plan-time probe tolerable without sampling (sampling misclassified
# mixed-writer tables — round-6 advice)
_DICT_PROBE_THREADS = 16
# Footer probes are metadata-only but still one read per file: a 10^5-file
# listing would pay an unbounded plan-time walk. Past this ceiling the
# probe declines (None -> the documented lit(False) fallback, with a
# warning) instead of stalling planning.
_DICT_PROBE_MAX_FILES = 16_384


def _colocated_with_scan(df: DataFrame) -> bool:
    """True when every operator between this frame and its scan
    preserves task colocation with the file read — the precondition for
    ``F.input_file_name()`` to return the real URI. Any stage-breaking
    or row-regenerating node (aggregate, join, sort, window, exchange,
    global limit, Python map groups) makes input_file_name() return ''
    downstream, which would silently fail EVERY row of a mixed-encoding
    table; detect those from the analyzed plan and let the caller fall
    back explicitly instead."""
    try:
        s = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    bad = (
        "Aggregate", "Join", "Sort", "Window", "Deduplicate",
        "Repartition", "RepartitionByExpression", "GlobalLimit",
        "Distinct", "Expand", "MapInPandas", "FlatMapGroupsInPandas",
        "FlatMapGroupsInPandasWithState", "CoGroup", "Intersect", "Except",
    )
    for line in s.splitlines():
        head = line.lstrip(" :+-|")
        if head.startswith(bad):
            return False
    return True


def local_input_paths(df: DataFrame) -> list[str]:
    """``df.inputFiles()`` as pyarrow-readable paths. ``file:`` URIs are
    percent-encoded by Spark (a space becomes %20) and must be
    unquoted; a scheme-less entry is a RAW path (never encoded — a
    directory literally named ``100%20off`` must stay as-is); other
    schemes (s3://, hdfs://) pass through for pyarrow's filesystem
    layer. Shared by the dict-encoding probe below and the block-stats
    pipes (planner/pipes.py) so path handling cannot diverge. Returns
    [] when the frame has no input files (in-memory)."""
    import urllib.parse

    try:
        out = []
        for f in df.inputFiles():
            p = urllib.parse.urlparse(f)
            if p.scheme == "file":
                out.append(urllib.parse.unquote(p.path))
            else:
                out.append(f)
        return out
    except Exception:
        return []


def _dict_encoded_by_file(df: DataFrame, field: str) -> dict[str, bool] | None:
    """Per-FILE dict-encoding verdicts for ``field`` — the Parquet
    footer truth behind ``value_type(dict)`` (valueTypeDict,
    values_encoder.go:109-127: the reference picks dict encoding when a
    block has few distinct values; parquet-mr makes the same adaptive
    choice per column chunk — and the reference answers PER BLOCK, so a
    single table-wide verdict from a sample of footers misclassified
    rows of mixed-writer tables: a file appended by a PLAIN-falling
    writer beyond the sample inherited the sampled files' verdict).
    Every footer is read — footer reads are metadata-only, cheap
    relative to the scan the filter gates. Keys are the scan URIs
    (``df.inputFiles()`` form, which matches ``input_file_name()``) so
    the verdict can be applied as a per-file row filter. A file's
    verdict is True only when every chunk of the column carries a
    dictionary encoding (a PLAIN data-page fallback means storage gave
    up on the dict; PLAIN listed ALONGSIDE a dict encoding is pyarrow
    describing the dictionary page itself — documented ambiguity).
    Returns None when the frame has no input files (in-memory) or any
    footer/column is unreadable — sniff fallback."""
    import urllib.parse

    try:
        uris = list(df.inputFiles())
    except Exception:
        return None
    if not uris:
        return None
    if len(uris) > _DICT_PROBE_MAX_FILES:
        import warnings

        warnings.warn(
            f"value_type(dict): {len(uris)} input files exceed the"
            f" {_DICT_PROBE_MAX_FILES}-file footer-probe ceiling;"
            " falling back to no-match (storage not introspected)",
            stacklevel=3,
        )
        return None
    try:
        import pyarrow.parquet as pq
    except Exception:
        return None
    def probe(uri: str) -> bool | None:
        p = urllib.parse.urlparse(uri)
        path = urllib.parse.unquote(p.path) if p.scheme == "file" else uri
        md = pq.read_metadata(path)  # raises -> whole probe falls back
        idx = list(md.schema.names).index(field)  # ValueError likewise
        verdict: bool | None = None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(idx)
            ok = bool(set(col.encodings) & {"PLAIN_DICTIONARY", "RLE_DICTIONARY"})
            verdict = ok if verdict is None else (verdict and ok)
        return verdict  # None: zero-row-group file contributes no rows

    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(min(_DICT_PROBE_THREADS, len(uris))) as ex:
            verdicts = list(ex.map(probe, uris))
    except Exception:
        return None
    out = {u: v for u, v in zip(uris, verdicts) if v is not None}
    return out or None


def _value_type(df: DataFrame, field: str, vt: str) -> Column:
    """value_type(t) is storage introspection in the reference
    (filter_value_type.go:14). Storage answers wherever Parquet records
    the truth: typed columns (written by compact_day(type_columns=True))
    answer from the physical type via _DTYPE_VALUE_TYPES (NULL rows
    never match — missing ≡ no stored type; uint* claims are gated on
    the value being non-negative), and value_type(dict) answers from the
    footers' per-chunk encodings. Only string spill fields with no
    footer (in-memory frames) and unmapped dtypes (boolean, date,
    decimal) fall back to sniffing the logical type of the rendered
    value — the documented approximation."""
    dt = dict(df.dtypes).get(field)
    if dt in _DTYPE_VALUE_TYPES:
        ok = F.lit(vt in _DTYPE_VALUE_TYPES[dt]) & qcol(field).isNotNull()
        if vt.startswith("uint"):
            ok = ok & (qcol(field) >= 0)
        return ok
    c = fcol(df, field)
    if vt == "dict":
        by_file = _dict_encoded_by_file(df, field)
        if by_file is None:
            return F.lit(False)  # no storage to introspect
        dict_uris = [u for u, ok in by_file.items() if ok]
        # non-empty rows of a dict-encoded column match, like the
        # reference (empty ≡ field missing from the block). Uniform
        # tables fold to a constant; mixed-encoding tables filter rows
        # by their source file (per-file truth, not a sampled global).
        if len(dict_uris) == len(by_file):
            return c != ""
        if not dict_uris:
            return F.lit(False)
        if not _colocated_with_scan(df):
            # input_file_name() would return '' here (the filter no
            # longer evaluates in the scan's stage), silently failing
            # every row — decline loudly instead
            import warnings

            warnings.warn(
                "value_type(dict): mixed-encoding table filtered after a"
                " stage-breaking operator; per-file attribution is"
                " unavailable, falling back to no-match",
                stacklevel=2,
            )
            return F.lit(False)
        return F.input_file_name().isin(dict_uris) & (c != "")
    if vt == "string":
        # NOT made exclusive with dict (unlike the reference's type
        # partition): parquet dict-encodes string chunks adaptively with
        # a far looser threshold than the reference's ≤8-unique rule, so
        # excluding dict-encoded chunks would make value_type(string)
        # match nothing on typical parquet tables — documented divergence
        return c != ""
    pat = _TYPE_SNIFF.get(vt)
    if pat is None:
        return F.lit(False)
    return c.rlike(pat)


SUBQUERY_VALUES_MAX = 10_000


def _subquery_values(q: A.Query, ctx) -> list[str] | None:
    """Eagerly run an in(...)/contains_*(...) subquery and collect its single
    output column (reference: storage_search.go:582-606). Hard-capped at
    SUBQUERY_VALUES_MAX distinct values: contains_* needs driver-side values
    (each becomes a token-regex matcher), and per-func `if (...)` conditions
    compile outside the planner's join rewrite — an unbounded collect here
    would stall the driver at scale, so fail loudly with guidance instead."""
    if ctx is None:
        return None
    sub = ctx.run_subquery(q)
    if len(sub.columns) != 1:
        # reference errors on multi-column subqueries (storage_search.go)
        raise ValueError(
            f"in(subquery): subquery must return exactly one field, got {sub.columns}"
        )
    col0 = sub.columns[0]
    # qcol: a plain name string would resolve dots as struct access
    rows = sub.select(qcol(col0)).distinct().limit(SUBQUERY_VALUES_MAX + 1).collect()
    if len(rows) > SUBQUERY_VALUES_MAX:
        raise ValueError(
            f"subquery produced more than {SUBQUERY_VALUES_MAX} distinct values;"
            " narrow the subquery (add filters / limit), or use a top-level"
            " in(subquery) / OR of in(subquery) terms, which run as joins"
        )
    return [r[0] if r[0] is not None else "" for r in rows]
