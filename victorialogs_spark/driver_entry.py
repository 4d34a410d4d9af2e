"""Driver-contract query registry: one entry per implemented operator.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string over the same parquet tables. Column
names AND value formatting are aligned on both sides (the driver compares
row-count + schema + order-insensitive value-hash).

Conventions:
- log-shaped queries run LogsQL over ``schema.events_as_logs`` (all fields
  string, ts → _time, props → _msg) and oracles CAST native columns to
  VARCHAR to match;
- sums/avgs accumulate in decimal(38,9) then cast double on BOTH sides
  (bit-identical, order-independent);
- ``fmt()`` mirrors functions.natural.format_number (Go-style: integral
  doubles render without '.0').
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from victorialogs_spark.api import run_query
from victorialogs_spark.schema import events_as_logs, load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# keyed by the session OBJECT (held alive by the key) — an id() key could
# alias a new session after the old one is garbage-collected
_CACHE: dict[tuple, DataFrame] = {}


def _logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark, sf_dir, "events_logs")
    if key not in _CACHE:
        _CACHE[key] = events_as_logs(spark, sf_dir)
    return _CACHE[key]


def _spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table repartitioned for CPU-bound pandas-UDF stages (dedup /
    similarity hashing). Partition count scales with input bytes so tiny
    correctness-scale inputs don't pay a 32-way Python-worker fan-out
    (~50-100ms/partition of pure overhead), while bench/production scales
    use every core. At cluster scale the ceiling is defaultParallelism —
    the same rule, bigger denominator."""
    import os

    df = _table(spark, sf_dir, name)
    path = f"{sf_dir}/{name}.parquet"
    try:
        size = (
            os.path.getsize(path)
            if os.path.isfile(path)
            else sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
        )
    except OSError:
        size = 0
    target = max(4, min(spark.sparkContext.defaultParallelism, size // 16384))
    return df.repartition(target)


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark, sf_dir, name)
    if key not in _CACHE:
        if name == "lineitem_ts":
            # lineitem with l_shipdate exposed as _time (for time-bucket ops)
            _CACHE[key] = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_shipdate", "_time"
            )
        else:
            _CACHE[key] = load_table(spark, sf_dir, name)
    return _CACHE[key]


# LogsQL text of entries registered over the events log view — consumers
# (bench.py's layout column) re-run the SAME query text against other
# physical layouts of the same logical table
LOGSQL_TEXT: dict[str, str] = {}


def logsql(
    name: str,
    query: str,
    sql: str | None = None,
    table: str = "__logs__",
    spread: bool = False,
):
    """Register a LogsQL query (over the events log view by default).

    ``spread=True`` loads the table through the size-scaled round-robin
    repartition (_spread): the r13 rule — compute-bound stages are worth
    one exchange of their input, codegen'd scans are not — extended to
    exact-decimal aggregation entries whose per-row Decimal work
    dominates a single-row-group scan (r15 interleaved A/B:
    tpch_pricing_summary 0.98 → 0.78 s; top_orders/s_histogram measured
    WORSE with it and stay plain). Decimal sums are exact-associative,
    so partitioning cannot change results."""

    def fn(spark: SparkSession, sf_dir: str, _q=query, _t=table) -> DataFrame:
        if _t == "__logs__":
            df = _logs(spark, sf_dir)
        elif spread:
            df = _spread(spark, sf_dir, _t)
        else:
            df = _table(spark, sf_dir, _t)
        return run_query(spark, df, _q)

    fn.__name__ = f"q_{name}"
    QUERIES[name] = fn
    if table == "__logs__":
        LOGSQL_TEXT[name] = query
    if sql is not None:
        ORACLE[name] = sql


def register(name: str, sql: str | None = None):
    """Register a custom callable via decorator."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def fmt(expr: str) -> str:
    """DuckDB SQL replicating functions.natural.format_number."""
    return (
        f"CASE WHEN ({expr}) IS NULL THEN '' "
        f"WHEN ({expr}) = CAST(({expr}) AS BIGINT) AND ABS({expr}) < 1e15 "
        f"THEN CAST(CAST(({expr}) AS BIGINT) AS VARCHAR) "
        f"ELSE CAST(({expr}) AS VARCHAR) END"
    )


def dsum(expr: str) -> str:
    """DuckDB SQL replicating the engine's decimal(38,9) sum → double.
    The double conversion hops through VARCHAR: DuckDB's direct
    decimal→double rounds twice (int128→double, then /1e9) and can be off
    by 1 ulp on 12+ significant digits, while decimal→string→double
    rounds once — exactly what Java's BigDecimal.doubleValue does."""
    return (
        f"CAST(CAST(SUM(CAST(CAST({expr} AS VARCHAR) AS DECIMAL(38,9)))"
        " AS VARCHAR) AS DOUBLE)"
    )


def davg(expr: str) -> str:
    return f"{dsum(expr)} / COUNT({expr})"


EID = "CAST(event_id AS VARCHAR) AS event_id"
TOK = "[^0-9A-Za-z_]"

# ---------------------------------------------------------------------------
# §2.2 filters (word/phrase/prefix/exact/in/contains/seq/regexp/range/ipv4/
# string_range/len_range/eq_field/le_field/_time forms/stream/bool)
# ---------------------------------------------------------------------------

logsql(
    "f_word",
    "event_type:error | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type = 'error'",
)
logsql(
    "f_phrase",
    '_msg:"k\\": 4" | fields event_id',
    f"SELECT {EID} FROM events WHERE regexp_matches(props, '(^|{TOK})k\": 4({TOK}|$)')",
)
logsql(
    "f_prefix",
    "_msg:7* | fields event_id",
    f"SELECT {EID} FROM events WHERE regexp_matches(props, '(^|{TOK})7')",
)
logsql(
    "f_any_case",
    "event_type:i(ERROR) | fields event_id",
    f"SELECT {EID} FROM events WHERE lower(event_type) = 'error'",
)
logsql(
    "f_exact",
    "event_type:=purchase | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type = 'purchase'",
)
logsql(
    "f_exact_prefix",
    "event_type:exact(s*) | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type LIKE 's%'",
)
logsql(
    "f_in",
    "event_type:in(click, view) | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type IN ('click', 'view')",
)
logsql(
    "p_rename_wildcard",
    # wildcard field filters remap a whole prefix (pipe_rename.go)
    "* | rename event_* as e_* | fields e_id, e_type",
    "SELECT CAST(event_id AS VARCHAR) AS e_id, event_type AS e_type FROM events",
)
logsql(
    "f_field_group",
    # field scope distributes over a parenthesized group
    "event_type:(error or click) | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type IN ('error', 'click')",
)
logsql(
    "f_in_subquery",
    "user_id:in(event_type:signup | fields user_id) | fields event_id",
    f"SELECT {EID} FROM events WHERE user_id IN "
    "(SELECT user_id FROM events WHERE event_type = 'signup')",
)
logsql(
    "f_in_subquery_or",
    # in(subquery) under OR: planner resolves it bounded (inline isin or
    # left-join flag) instead of collecting unbounded values to the driver
    "user_id:in(event_type:signup | fields user_id) or event_type:error"
    " | fields event_id",
    f"SELECT {EID} FROM events WHERE user_id IN "
    "(SELECT user_id FROM events WHERE event_type = 'signup')"
    " OR event_type = 'error'",
)
logsql(
    "f_contains_all",
    "contains_all(k, 7) | fields event_id",
    f"SELECT {EID} FROM events WHERE regexp_matches(props, '(^|{TOK})k({TOK}|$)') "
    f"AND regexp_matches(props, '(^|{TOK})7({TOK}|$)')",
)
logsql(
    "f_contains_any",
    "contains_any(7, 8) | fields event_id",
    f"SELECT {EID} FROM events WHERE regexp_matches(props, '(^|{TOK})7({TOK}|$)') "
    f"OR regexp_matches(props, '(^|{TOK})8({TOK}|$)')",
)
logsql(
    "f_seq",
    # seq phrases match at TOKEN BOUNDARIES like the phrase filter
    # (matchSequence → getPhrasePos, filter_sequence.go; r15 filter
    # corpus). RE2 has no lookbehind: '(.*[^token])?' encodes "either
    # directly after the ':' or after any non-token char".
    'seq(":", "7") | fields event_id',
    f"SELECT {EID} FROM events WHERE"
    " regexp_matches(props, ':(.*[^0-9A-Za-z_])?7([^0-9A-Za-z_]|$)')",
)
logsql(
    "f_regexp",
    'event_type:~"^(click|view)$" | fields event_id',
    f"SELECT {EID} FROM events WHERE regexp_matches(event_type, '^(click|view)$')",
)
logsql(
    "f_range_gt",
    "value:>150 | fields event_id",
    f"SELECT {EID} FROM events WHERE value > 150",
)
logsql(
    "f_range_bracket",
    "value:range[10, 20] | fields event_id",
    f"SELECT {EID} FROM events WHERE value >= 10 AND value <= 20",
)
logsql(
    "f_range_halfopen",
    "value:range(10, 20] | fields event_id",
    f"SELECT {EID} FROM events WHERE value > 10 AND value <= 20",
)
logsql(
    "f_ipv4_range",
    '* | format "10.0.<user_id>.1" as ip | filter ip:ipv4_range(10.0.10.0, 10.0.20.255)'
    " | fields event_id",
    f"SELECT {EID} FROM events WHERE user_id BETWEEN 10 AND 20",
)
logsql(
    "f_string_range",
    "event_type:string_range(click, signup) | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type >= 'click' AND event_type < 'signup'",
)
logsql(
    "f_string_cmp",
    "event_type:>=signup | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type >= 'signup'",
)
logsql(
    "f_len_range",
    "_msg:len_range(9, 9) | fields event_id",
    f"SELECT {EID} FROM events WHERE LENGTH(props) = 9",
)
logsql(
    "f_eq_field",
    "event_id:eq_field(user_id) | fields event_id",
    f"SELECT {EID} FROM events WHERE CAST(event_id AS VARCHAR) = CAST(user_id AS VARCHAR)",
)
logsql(
    "f_le_field",
    "event_id:le_field(user_id) | fields event_id",
    f"SELECT {EID} FROM events WHERE event_id <= user_id",
)
logsql(
    "f_time_range",
    "_time:[2024-01-05, 2024-01-10) | fields event_id",
    f"SELECT {EID} FROM events WHERE ts >= '2024-01-05' AND ts < '2024-01-10'",
)
logsql(
    "f_time_duration_offset",
    "_time:<2024-01-20T00:00:00Z offset 24h | fields event_id",
    f"SELECT {EID} FROM events WHERE ts < TIMESTAMP '2024-01-19 00:00:00'",
)
logsql(
    "f_day_range",
    # ns-of-day inclusive bounds (filter_day_range.go:116-124): an
    # inclusive ']' stops at 12:00:00.000000000 exactly — the whole end
    # minute must NOT match (r15 fix of the minute-resolution compare)
    "_time:day_range[08:00, 12:00] | fields event_id",
    f"SELECT {EID} FROM events WHERE (epoch_ns(ts) % 86400000000000)"
    " BETWEEN 28800000000000 AND 43200000000000",
)
logsql(
    "f_week_range",
    "_time:week_range[Mon, Fri] | fields event_id",
    f"SELECT {EID} FROM events WHERE dayofweek(ts) BETWEEN 1 AND 5",
)
logsql(
    "f_day_range_offset",
    # offset SUBTRACTS from the timestamp before the range check
    # (filter_day_range.go:122) — the round-1 advisor bug, locked in
    "_time:day_range[08:00, 12:00] offset 2h | fields event_id",
    f"SELECT {EID} FROM events WHERE"
    " ((epoch_ns(ts) - 7200000000000) % 86400000000000)"
    " BETWEEN 28800000000000 AND 43200000000000",
)
logsql(
    "f_time_gt_offset",
    # '>' time filters honor offset too (round-1 advisor: the > branch
    # silently dropped it, turning 'offset 1h' into word filters)
    "_time:>2024-01-15T07:03:02Z offset 24h | fields event_id",
    f"SELECT {EID} FROM events WHERE ts > TIMESTAMP '2024-01-14 07:03:02'",
)
logsql(
    "f_stream",
    '{event_type=~"err.*|click"} | fields event_id',
    f"SELECT {EID} FROM events WHERE regexp_matches(event_type, '^(?:err.*|click)$')",
)
logsql(
    "f_bool",
    "(event_type:error OR event_type:click) NOT value:<10 | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type IN ('error','click')"
    " AND NOT (value < 10)",
)

# ---------------------------------------------------------------------------
# §2.3 pipes
# ---------------------------------------------------------------------------

logsql(
    "p_fields_delete",
    "* | fields event_id, event_type, user_id | delete user_id",
    f"SELECT {EID}, event_type FROM events",
)
logsql(
    "p_copy",
    "* | copy event_type as et2 | fields event_id, et2",
    f"SELECT {EID}, event_type AS et2 FROM events",
)
logsql(
    "p_rename",
    "* | rename event_type as kind | fields event_id, kind",
    f"SELECT {EID}, event_type AS kind FROM events",
)
logsql(
    "p_rename_overwrite",
    "* | rename event_type as user_id | fields event_id, user_id",
    f"SELECT {EID}, event_type AS user_id FROM events",
)
logsql(
    "p_filter",
    "* | filter value:>150 event_type:view | fields event_id",
    f"SELECT {EID} FROM events WHERE value > 150 AND event_type = 'view'",
)
logsql(
    "p_limit",
    "* | sort by (event_id) | limit 10 | fields event_id",
    f"SELECT {EID} FROM (SELECT event_id FROM events ORDER BY event_id LIMIT 10)",
)
logsql(
    "p_offset",
    "* | sort by (event_id) | offset 9990 | fields event_id",
    f"SELECT {EID} FROM (SELECT event_id FROM events ORDER BY event_id OFFSET 9990)",
)
logsql(
    "p_sort_desc_rank",
    "* | sort by (value, event_id) desc limit 5 rank as r | fields event_id, r",
    "SELECT CAST(event_id AS VARCHAR) AS event_id, CAST(r AS VARCHAR) AS r FROM ("
    "SELECT event_id, ROW_NUMBER() OVER (ORDER BY value DESC, event_id DESC) r"
    " FROM events) WHERE r <= 5",
)
logsql(
    "p_sort_natural_text",
    # non-numeric sort pairs compare like stringsutil.LessNatural:
    # digit runs inside text compare NUMERICALLY ('h2' < 'h10'); the
    # synthetic h<doc_id> key makes natural order ≡ ORDER BY doc_id,
    # which DuckDB expresses exactly (lexicographic would hash-mismatch)
    '* | format "h<doc_id>" as hkey | sort by (hkey) limit 7 rank as r'
    " | fields hkey, r",
    "SELECT hkey, CAST(r AS VARCHAR) AS r FROM ("
    "SELECT 'h' || CAST(doc_id AS VARCHAR) AS hkey,"
    " ROW_NUMBER() OVER (ORDER BY doc_id) AS r FROM documents"
    ") WHERE r <= 7",
    table="documents",
)
logsql(
    "p_sort_partition_topk",
    "* | sort by (value, event_id) desc partition by (event_type) limit 2"
    " | fields event_type, event_id",
    "SELECT event_type, CAST(event_id AS VARCHAR) AS event_id FROM ("
    "SELECT event_type, event_id, ROW_NUMBER() OVER"
    " (PARTITION BY event_type ORDER BY value DESC, event_id DESC) r FROM events)"
    " WHERE r <= 2",
)
logsql(
    "p_first",
    "* | first 5 by (event_id) | fields event_id",
    f"SELECT {EID} FROM (SELECT event_id FROM events ORDER BY event_id LIMIT 5)",
)
logsql(
    "p_last",
    "* | last 5 by (event_id) | fields event_id",
    f"SELECT {EID} FROM (SELECT event_id FROM events ORDER BY event_id DESC LIMIT 5)",
)
logsql(
    "p_math",
    "* | math value * 2 as v2, value + user_id as vu, round(value) as rv"
    " | fields event_id, v2, vu, rv",
    f"SELECT {EID}, {fmt('value * 2')} AS v2, {fmt('value + user_id')} AS vu,"
    f" {fmt('ROUND(value)')} AS rv FROM events",
)
logsql(
    "p_math_abs",
    # abs/least/greatest coverage (the modulo/power variants live in the
    # later p_math_funcs entry; this one was previously shadowed by it)
    "* | math abs(value - 60) as av, floor(value) as fv, ceil(value) as cv,"
    " min(value, user_id) as mn, max(value, user_id) as mx"
    " | fields event_id, av, fv, cv, mn, mx",
    f"SELECT {EID}, {fmt('ABS(value - 60)')} AS av, {fmt('FLOOR(value)')} AS fv,"
    f" {fmt('CEIL(value)')} AS cv, {fmt('LEAST(value, user_id)')} AS mn,"
    f" {fmt('GREATEST(value, user_id)')} AS mx FROM events",
)
logsql(
    "p_extract",
    '* | extract ": <kv>}" from _msg | fields event_id, kv',
    f"SELECT {EID}, regexp_extract(props, ': (.*?)\\}}', 1) AS kv FROM events",
)
logsql(
    "p_extract_regexp",
    '* | extract_regexp "k\\": (?P<kv>\\\\d+)" from _msg | fields event_id, kv',
    f"SELECT {EID}, regexp_extract(props, 'k\": ([0-9]+)', 1) AS kv FROM events",
)
logsql(
    "p_replace",
    '* | replace (":", "=") at _msg | fields event_id, _msg',
    f"SELECT {EID}, REPLACE(props, ':', '=') AS _msg FROM events",
)
logsql(
    "p_replace_regexp",
    '* | replace_regexp ("\\\\d+", "N") at _msg | fields event_id, _msg',
    f"SELECT {EID}, regexp_replace(props, '[0-9]+', 'N', 'g') AS _msg FROM events",
)
logsql(
    "p_format",
    '* | format "<event_type>:<user_id>" as key | fields event_id, key',
    f"SELECT {EID}, event_type || ':' || CAST(user_id AS VARCHAR) AS key FROM events",
)
logsql(
    "p_format_converters",
    '* | format "<uc:event_type>|<lc:event_type>|<q:event_type>" as x | fields event_id, x',
    f"SELECT {EID}, UPPER(event_type) || '|' || LOWER(event_type) || '|\"'"
    " || event_type || '\"' AS x FROM events",
)
logsql(
    "p_format_numeric_converters",
    # reference-exact numeric converters: fixed-width hexnum, ipv4 from
    # uint32 (real octet math — valid at any user_id scale), compound
    # duration bounded below 1µs so the SQL mirror stays one unit,
    # RFC3339Nano time
    "* | math user_id % 200 as m"
    ' | format "<hexnumencode:user_id>|<ipv4:user_id>|<duration:m>|<time:m>"'
    " as x | fields event_id, x",
    f"SELECT {EID}, UPPER(LPAD(to_hex(user_id), 16, '0'))"
    " || '|' || ((user_id >> 24) & 255) || '.' || ((user_id >> 16) & 255)"
    " || '.' || ((user_id >> 8) & 255) || '.' || (user_id & 255)"
    " || '|' || (CASE WHEN user_id % 200 = 0 THEN '0' ELSE (user_id % 200) || 'ns' END)"
    " || '|' || strftime(make_timestamp(CAST(user_id % 200 AS BIGINT) * 1000000),"
    " '%Y-%m-%dT%H:%M:%SZ') AS x FROM events",
)
logsql(
    "p_unpack_json",
    "* | unpack_json from _msg | fields event_id, k",
    f"SELECT {EID}, json_extract_string(props, '$.k') AS k FROM events",
)
logsql(
    "p_unpack_logfmt",
    '* | format "a=<user_id> b=\\"x y\\"" as lf | unpack_logfmt from lf'
    " | fields event_id, a, b",
    f"SELECT {EID}, CAST(user_id AS VARCHAR) AS a, 'x y' AS b FROM events",
)
logsql(
    "p_unpack_words",
    "* | unpack_words _msg as w | fields event_id, w",
    f"SELECT {EID}, '[\"k\",\"' || json_extract_string(props, '$.k') || '\"]' AS w"
    " FROM events",
)
logsql(
    "p_unpack_syslog",
    # '<165>' would parse as a format placeholder — inject it via replace
    '* | format "PRIO1 2024-01-01T00:00:00Z host1 app1 123 ID7 - hello <user_id>" as sl'
    ' | replace ("PRIO", "<165>") at sl'
    " | unpack_syslog from sl | fields event_id, hostname, app_name, severity, message",
    f"SELECT {EID}, 'host1' AS hostname, 'app1' AS app_name, '5' AS severity,"
    " 'hello ' || CAST(user_id AS VARCHAR) AS message FROM events",
)
logsql(
    "p_unroll",
    "* | unpack_words _msg as w | unroll (w) | fields event_id, w",
    f"SELECT {EID}, 'k' AS w FROM events UNION ALL "
    f"SELECT {EID}, json_extract_string(props, '$.k') AS w FROM events",
)
logsql(
    "p_pack_json",
    "* | pack_json as pj fields (event_type, user_id) | fields event_id, pj",
    f"SELECT {EID}, '{{\"event_type\":\"' || event_type || '\",\"user_id\":\"'"
    " || CAST(user_id AS VARCHAR) || '\"}' AS pj FROM events",
)
logsql(
    "p_pack_logfmt",
    "* | pack_logfmt as lf fields (event_type, user_id) | fields event_id, lf",
    f"SELECT {EID}, 'event_type=' || event_type || ' user_id='"
    " || CAST(user_id AS VARCHAR) AS lf FROM events",
)
logsql(
    "p_join",
    "* | join by (event_type) (* | stats by (event_type) count() as total)"
    " | fields event_id, total",
    f"SELECT {EID}, COUNT(*) OVER (PARTITION BY event_type) AS total FROM events",
)
logsql(
    "p_union",
    "event_type:error | union (event_type:click) | fields event_id",
    f"SELECT {EID} FROM events WHERE event_type IN ('error', 'click')",
)
logsql(
    "p_uniq",
    "* | uniq by (event_type)",
    "SELECT DISTINCT event_type FROM events",
)
logsql(
    "p_uniq_hits",
    "* | uniq by (event_type) with hits",
    "SELECT event_type, COUNT(*) AS hits FROM events GROUP BY event_type",
)
logsql(
    "p_top",
    "* | top 3 by (event_type)",
    "SELECT event_type, hits FROM (SELECT event_type, COUNT(*) AS hits,"
    " ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type ASC) r"
    " FROM events GROUP BY event_type) WHERE r <= 3",
)
logsql(
    "p_facets",
    "* | fields event_type, user_id | facets 3",
    # mirrors the engine's (and reference's) caps: fields with more than
    # 1000 distinct values are dropped entirely (pipe_facets.go
    # maxValuesPerField), as are constant fields
    "WITH melted AS ("
    "  SELECT 'event_type' AS field_name, event_type AS field_value FROM events"
    "  UNION ALL"
    "  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events"
    "), counted AS ("
    "  SELECT field_name, field_value, COUNT(*) AS hits FROM melted"
    "  WHERE field_value <> '' GROUP BY field_name, field_value"
    "), capped AS ("
    "  SELECT *, COUNT(*) OVER (PARTITION BY field_name) AS nvals,"
    "  (SELECT COUNT(*) FROM events) AS total FROM counted"
    ") SELECT field_name, field_value, hits FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY field_name"
    "  ORDER BY hits DESC, field_value ASC) r FROM capped"
    "  WHERE nvals <= 1000 AND NOT (nvals = 1 AND hits = total))"
    " WHERE r <= 3",
)
logsql(
    "p_field_names",
    "* | fields event_type, user_id, props | field_names",
    "SELECT 'event_type' AS name, COUNT(*) AS hits FROM events UNION ALL"
    " SELECT 'user_id', COUNT(*) FROM events UNION ALL"
    " SELECT 'props', COUNT(*) FROM events",
)
logsql(
    "p_field_values",
    "* | field_values event_type",
    "SELECT event_type, COUNT(*) AS hits FROM events GROUP BY event_type",
)
logsql(
    "p_len",
    "* | len(_msg) as l | fields event_id, l",
    f"SELECT {EID}, CAST(LENGTH(props) AS VARCHAR) AS l FROM events",
)
logsql(
    "p_json_array_len",
    "* | unpack_words _msg as w | json_array_len(w) as n | fields event_id, n",
    f"SELECT {EID}, '2' AS n FROM events",
)
logsql(
    "p_sample_all",
    "* | sample 1 | fields event_id",
    f"SELECT {EID} FROM events",
)
logsql(
    "p_collapse_nums",
    "* | collapse_nums at _msg | fields event_id, _msg",
    f"SELECT {EID}, regexp_replace(props, '[0-9]+', '<N>', 'g') AS _msg FROM events",
)
logsql(
    "p_decolorize",
    "* | decolorize | fields event_id, _msg",
    f"SELECT {EID}, props AS _msg FROM events",
)
logsql(
    "p_drop_empty_fields",
    '* | copy event_type as e2 | replace_regexp (".+", "") at e2'
    " | fields event_id, e2 | drop_empty_fields",
    f"SELECT {EID} FROM events",
)

# rows-only entries (no SQL-expressible oracle): hash values intentionally
# diverge from the reference; stream_context needs engine-computed stream ids
logsql("p_hash", "* | hash(event_type) as h | fields event_id, h")
logsql(
    "p_stream_context",
    "value:>199.8 | stream_context before 1 after 1 | fields _time, event_id, event_type",
)
logsql(
    "p_stream_context_window",
    # deterministic oracle-checked variant: single anchor (the max-value
    # row via in(subquery)), one context group (no delimiter rows), and
    # before/after large enough that the ±1h time window is the only
    # bound — row-rank tie-breaks can't affect the result
    "value:in(* | sort by (value) desc limit 1 | fields value)"
    " | stream_context before 100000 after 100000 | fields _time, event_id",
    "WITH m AS (SELECT event_type AS et, ts AS at FROM events"
    " ORDER BY value DESC, event_id LIMIT 1)"
    " SELECT DISTINCT CAST(e.ts AS TIMESTAMP) AS _time,"
    " CAST(e.event_id AS VARCHAR) AS event_id FROM events e, m"
    " WHERE e.event_type = m.et"
    " AND epoch_us(e.ts) BETWEEN epoch_us(m.at) - 3600000000"
    " AND epoch_us(m.at) + 3600000000",
)
# block_stats/blocks_count read parquet row-group metadata; DuckDB's
# parquet_metadata() is an exact independent oracle for them. The oracle
# SQL must embed a literal path: default to the driver contract's sf0.01,
# and follow SPARK_GRAFT_ORACLE_SF_DIR so the multi-scale soak gate
# (tools/check_oracle.py) stays green at every scale.
import os as _os

_EVENTS_PQ = (
    _os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    + "/events.parquet"
)
logsql(
    "p_blocks_count",
    "* | blocks_count",
    "SELECT CAST(COUNT(*) AS VARCHAR) AS blocks_count FROM"
    f" (SELECT DISTINCT file_name, row_group_id FROM parquet_metadata('{_EVENTS_PQ}'))",
)
logsql(
    "p_block_stats",
    "* | block_stats",
    "SELECT path_in_schema AS field, type,"
    " CAST(total_compressed_size AS VARCHAR) AS values_size,"
    " CAST(total_uncompressed_size AS VARCHAR) AS uncompressed_size,"
    ' CAST(num_values AS VARCHAR) AS "rows",'
    " file_name || '#rg' || row_group_id AS part_path"
    f" FROM parquet_metadata('{_EVENTS_PQ}')",
)

# ---------------------------------------------------------------------------
# §2.4 stats functions
# ---------------------------------------------------------------------------

logsql(
    "s_stats_by",
    "* | stats by (event_type) count() as hits, sum(value) as sv, avg(value) as av",
    f"SELECT event_type, COUNT(*) AS hits, {dsum('value')} AS sv,"
    f" {davg('value')} AS av FROM events GROUP BY event_type",
)
logsql(
    "s_global",
    "* | stats count() as c, count(props) as cp, count_uniq(user_id) as cu,"
    " count_uniq_hash(event_type) as ch, min(value) as mn, max(value) as mx",
    "SELECT COUNT(*) AS c, COUNT(*) AS cp, COUNT(DISTINCT user_id) AS cu,"
    " COUNT(DISTINCT event_type) AS ch, CAST(MIN(value) AS VARCHAR) AS mn,"
    " CAST(MAX(value) AS VARCHAR) AS mx FROM events",
)
logsql(
    "s_count_empty",
    "* | stats count_empty(nosuch) as ce, count(nosuch) as cn",
    "SELECT CAST(COUNT(*) AS BIGINT) AS ce, 0::BIGINT AS cn FROM events",
)
logsql(
    "s_sum_len",
    "* | stats sum_len(event_type) as sl",
    "SELECT CAST(SUM(LENGTH(event_type)) AS BIGINT) AS sl FROM events",
)
logsql(
    "s_median_quantile",
    # exact reference quantile (stats_quantile.go histogram.quantile):
    # natural-order sort, element int(phi*n) clamped, returned as the
    # ORIGINAL STRING — replicated in SQL with a row_number window
    "* | stats median(user_id) as m, quantile(0.9, user_id) as q",
    "WITH o AS (SELECT CAST(user_id AS VARCHAR) AS s,"
    " ROW_NUMBER() OVER (ORDER BY user_id, CAST(user_id AS VARCHAR)) AS rn"
    " FROM events), n AS (SELECT COUNT(*) AS n FROM o)"
    " SELECT"
    " (SELECT s FROM o, n WHERE rn = LEAST(CAST(FLOOR(0.5 * n) AS BIGINT), n - 1) + 1) AS m,"
    " (SELECT s FROM o, n WHERE rn = LEAST(CAST(FLOOR(0.9 * n) AS BIGINT), n - 1) + 1) AS q",
)
logsql(
    "s_uniq_values",
    "* | stats uniq_values(event_type) as u",
    "SELECT CAST(to_json(list_sort(list(DISTINCT event_type))) AS VARCHAR) AS u"
    " FROM events",
)
logsql(
    "s_time_bucket",
    "* | stats by (_time:1d) count() as hits",
    "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _time, COUNT(*) AS hits"
    " FROM events GROUP BY 1",
)
logsql(
    "s_time_bucket_month",
    # 'month' buckets by UTC calendar months, not a fixed width
    # (block_result.go truncateTimestampToMonth:2641)
    "* | stats by (_time:month) count() as hits",
    "SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS _time,"
    " COUNT(*) AS hits FROM events GROUP BY 1",
)
logsql(
    "s_time_bucket_week",
    # the literal word 'week' is Monday-aligned (truncateTimestamp adds
    # 4d of offset, block_result.go:819-822) — DuckDB's date_trunc
    # 'week' is ISO/Monday-aligned too, so the oracle is exact
    "* | stats by (_time:week) count() as hits",
    "SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS _time,"
    " COUNT(*) AS hits FROM events GROUP BY 1",
)
logsql(
    "s_value_bucket_passthrough",
    # getBucketedValue (block_result.go:1666): values not starting with
    # a digit or '-' can't be bucketed and group by THEMSELVES, not ''
    "* | stats by (event_type:100) count() as n",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1",
)
logsql(
    "s_value_bucket_int",
    # int64 values truncate with integer arithmetic (truncateInt64),
    # rendered without a decimal point
    "* | stats by (user_id:20) count() as n",
    "SELECT CAST(user_id - ((user_id % 20) + 20) % 20 AS VARCHAR)"
    " AS user_id, COUNT(*) AS n FROM events GROUP BY 1",
)
logsql(
    "s_num_bucket",
    "* | stats by (value:50) count() as c",
    f"SELECT {fmt('FLOOR(value / 50) * 50')} AS value, COUNT(*) AS c"
    " FROM events GROUP BY 1",
)
logsql(
    "s_wildcard_no_match",
    # wildcard stats args matching no columns ≡ aggregating an absent
    # field (docs example `stats avg(foo*)`; crashed the compiler before)
    "* | stats avg(zz*) as a, sum(zz*) as s, count() as c",
    # sum/avg over zero numeric values is NaN, not missing (stats_sum.go
    # starts the accumulator at NaN; r15 stats-semantics corpus)
    "SELECT CAST('NaN' AS DOUBLE) AS a, CAST('NaN' AS DOUBLE) AS s,"
    " COUNT(*) AS c FROM events",
)
logsql(
    "s_stats_if",
    "* | stats count() if (event_type:error) as errs, count() as total",
    "SELECT COUNT(*) FILTER (WHERE event_type = 'error') AS errs,"
    " COUNT(*) AS total FROM events",
)
logsql(
    "s_row_max",
    "* | stats row_max(value, event_id) as r",
    "SELECT '{\"event_id\":\"' || CAST(arg_max(event_id, value) AS VARCHAR)"
    " || '\"}' AS r FROM events",
)
logsql(
    "s_rate",
    "_time:[2024-01-01, 2024-02-01) | stats rate() as r, rate_sum(value) as rs",
    "SELECT COUNT(*) / 2678400.0 AS r,"
    f" {dsum('value')} / 2678400.0 AS rs"
    " FROM events WHERE ts >= '2024-01-01' AND ts < '2024-02-01'",
)
logsql(
    "s_histogram",
    "* | stats by (event_type) histogram(user_id) as h",
    # vmrange buckets: idx = ceil(log10(v)*18), bucket (10^((i-1)/18), 10^(i/18)]
    "WITH b AS (SELECT event_type,"
    " printf('%.3e', POW(10.0, (CEIL(LOG10(CAST(user_id AS DOUBLE)) * 18) - 1) / 18.0))"
    " || '...' ||"
    " printf('%.3e', POW(10.0, CEIL(LOG10(CAST(user_id AS DOUBLE)) * 18) / 18.0))"
    " AS vmrange FROM events WHERE user_id > 0"
    " UNION ALL SELECT event_type, '0...0' FROM events WHERE user_id = 0),"
    " c AS (SELECT event_type, vmrange, COUNT(*) AS hits FROM b GROUP BY 1, 2)"
    " SELECT event_type, CAST(to_json(list_sort(list({'vmrange': vmrange,"
    " 'hits': hits}))) AS VARCHAR) AS h FROM c GROUP BY event_type",
)

# rows-only: collect order is nondeterministic by design
logsql("s_values", "* | stats values(event_type) as v")
logsql("s_json_values", "event_type:error | stats json_values(event_id) as v")
logsql("s_row_any", "* | stats row_any(event_type) as r")

# deterministic oracle-checked variants of the collect-order stats above:
# values() content as a multiset (unrolled + recounted), row_any over a
# single-valued group, json_values over a constant-per-group field, and a
# hash() cardinality property (exact hash values are engine-specific).
logsql(
    "s_values_unrolled",
    "* | stats values(event_type) as v | unroll (v) | stats by (v) count() as n",
    "SELECT event_type AS v, COUNT(*) AS n FROM events GROUP BY 1",
)
logsql(
    "s_row_any_by",
    "* | stats by (event_type) row_any(event_type) as r",
    "SELECT event_type, CAST(to_json({'event_type': event_type}) AS VARCHAR) AS r"
    " FROM events GROUP BY event_type",
)
logsql(
    "s_json_values_by",
    "* | stats by (event_type) json_values(event_type) as v",
    "WITH g AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)"
    " SELECT event_type, '[' || array_to_string(list_transform(range(n),"
    " i -> '{\"event_type\":\"' || event_type || '\"}'), ',') || ']' AS v FROM g",
)
logsql(
    "p_hash_cardinality",
    "* | hash(event_type) as h | stats count_uniq(h) as nh",
    "SELECT COUNT(DISTINCT event_type) AS nh FROM events",
)

# ---------------------------------------------------------------------------
# scale/bench queries over the TPC-H-ish tables (typed columns)
# ---------------------------------------------------------------------------

logsql(
    "tpch_pricing_summary",
    "* | stats by (l_returnflag, l_linestatus) sum(l_quantity) as sum_qty,"
    " sum(l_extendedprice) as sum_price, avg(l_discount) as avg_disc, count() as cnt",
    f"SELECT l_returnflag, l_linestatus, {dsum('l_quantity')} AS sum_qty,"
    f" {dsum('l_extendedprice')} AS sum_price, {davg('l_discount')} AS avg_disc,"
    " COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus",
    table="lineitem",
    spread=True,
)
logsql(
    "tpch_top_orders",
    "* | stats by (o_custkey) sum(o_totalprice) as tot, count() as n"
    " | sort by (tot) desc limit 10",
    "SELECT CAST(o_custkey AS VARCHAR) AS o_custkey,"
    f" tot, n FROM (SELECT o_custkey, {dsum('o_totalprice')} AS tot, COUNT(*) AS n"
    " FROM orders GROUP BY o_custkey) ORDER BY tot DESC LIMIT 10",
    table="orders",
)
logsql(
    "p_math_funcs",
    # (value+1)^2 keeps results ≥ 1: tiny doubles render scientific in
    # Spark ('9.0E-4') but plain in DuckDB ('0.0009')
    "* | math value % 7 as m7, (value + 1) ^ 2 as p2, floor(value / 3) as f3,"
    " ceil(value) as cv, min(value, 50) as mn, max(value, 150) as mx"
    " | fields event_id, m7, p2, f3, cv, mn, mx",
    f"SELECT {EID}, {fmt('fmod(value, 7)')} AS m7, {fmt('(value + 1) * (value + 1)')} AS p2,"
    f" {fmt('FLOOR(value / 3)')} AS f3, {fmt('CEIL(value)')} AS cv,"
    f" {fmt('LEAST(value, 50)')} AS mn, {fmt('GREATEST(value, 150)')} AS mx"
    " FROM events",
)
logsql(
    "p_extract_keep_original",
    '* | copy event_type as kv | extract ": <kv>}" from _msg keep_original_fields'
    " | fields event_id, kv",
    f"SELECT {EID}, event_type AS kv FROM events",
)
logsql(
    "p_uniq_multi",
    "* | uniq by (event_type, user_id) with hits",
    "SELECT event_type, CAST(user_id AS VARCHAR) AS user_id, COUNT(*) AS hits"
    " FROM events GROUP BY 1, 2",
)
logsql(
    "p_top_rank",
    "* | top 3 by (event_type) rank as r",
    "SELECT event_type, hits, CAST(r AS VARCHAR) AS r FROM ("
    "SELECT event_type, COUNT(*) AS hits,"
    " ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type ASC) r"
    " FROM events GROUP BY event_type) WHERE r <= 3",
)
logsql(
    "p_fields_missing",
    "* | fields event_id, nosuch",
    f"SELECT {EID}, '' AS nosuch FROM events",
)
logsql(
    "s_count_uniq_limit",
    "* | stats count_uniq(user_id) limit 3 as cu, count_uniq(user_id) as cufull",
    "SELECT LEAST(COUNT(DISTINCT user_id), 3) AS cu,"
    " COUNT(DISTINCT user_id) AS cufull FROM events",
)
logsql(
    "s_row_min",
    # sort key = event_id (unique) so the chosen row is deterministic
    "* | stats row_min(event_id, user_id) as r",
    "SELECT '{\"user_id\":\"' || CAST(arg_min(user_id, event_id) AS VARCHAR)"
    " || '\"}' AS r FROM events",
)


logsql(
    "s_time_bucket_offset",
    "* | stats by (_time:1d offset 2h) count() as c",
    "SELECT make_timestamp(CAST(FLOOR((epoch_us(ts) - 7200000000)"
    " / 86400000000) * 86400000000 + 7200000000 AS BIGINT)) AS _time,"
    " COUNT(*) AS c FROM events GROUP BY 1",
)
logsql(
    "s_multi_bucket",
    "* | stats by (event_type, value:100) count() as c",
    f"SELECT event_type, {fmt('FLOOR(value / 100) * 100')} AS value,"
    " COUNT(*) AS c FROM events GROUP BY 1, 2",
)
logsql(
    "p_format_time_conv",
    # RFC3339Nano: integral seconds render without a fractional part
    '* | math round(value) as rv | format "<time:rv>" as t | fields event_id, t',
    f"SELECT {EID}, strftime(make_timestamp(CAST(ROUND(value) * 1000000 AS BIGINT)),"
    " '%Y-%m-%dT%H:%M:%SZ') AS t FROM events",
)
logsql(
    "p_unpack_words_limit",
    "* | unpack_words _msg as w limit 1 | fields event_id, w",
    f"SELECT {EID}, '[\"k\"]' AS w FROM events",
)
logsql(
    "s_ipv4_bucket",
    # user_id % 200 keeps the second octet valid at any data scale
    '* | math user_id % 200 as m | format "10.<m>.3.7" as ip'
    " | stats by (ip:/16) count() as c",
    "SELECT '10.' || CAST(CAST(user_id % 200 AS BIGINT) AS VARCHAR) || '.0.0' AS ip,"
    " COUNT(*) AS c FROM events GROUP BY 1",
)
logsql(
    "p_sort_partition_rank",
    "* | sort by (value, event_id) desc partition by (event_type) limit 2 rank as r"
    " | fields event_type, event_id, r",
    "SELECT event_type, CAST(event_id AS VARCHAR) AS event_id,"
    " CAST(r AS VARCHAR) AS r FROM (SELECT event_type, event_id,"
    " ROW_NUMBER() OVER (PARTITION BY event_type"
    " ORDER BY value DESC, event_id DESC) r FROM events) WHERE r <= 2",
)


logsql(
    "s_uniq_values_limit",
    "* | stats uniq_values(event_type) limit 3 as u",
    "SELECT CAST(to_json(list_sort(list(DISTINCT event_type))[:3]) AS VARCHAR)"
    " AS u FROM events",
)
logsql(
    "s_uniq_values_natural",
    # NATURAL sort order over numeric values ('9' before '10' — the
    # reference merge heap compares with lessString); the string-field
    # twins above cannot distinguish natural from lexicographic
    # (r15 finding: array_sort was lexicographic)
    "* | stats uniq_values(user_id) limit 12 as u",
    "SELECT CAST(to_json(list_transform(list_sort(list(DISTINCT user_id))[:12],"
    " x -> CAST(x AS VARCHAR))) AS VARCHAR) AS u FROM events",
)
logsql(
    "p_top_custom_hits",
    "* | top 2 by (event_type) hits as cnt",
    "SELECT event_type, cnt FROM (SELECT event_type, COUNT(*) AS cnt,"
    " ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type ASC) r"
    " FROM events GROUP BY event_type) WHERE r <= 2",
)
logsql(
    "p_format_duration_conv",
    # compound duration string: bound the value below one minute so the
    # DuckDB mirror stays simple; zero renders as '0'
    '* | math abs(round(value)) % 50 as s, s * 1000000000 as ns'
    ' | format "<duration:ns>" as d | fields event_id, d',
    f"SELECT {EID}, CASE WHEN CAST(ABS(ROUND(value)) AS BIGINT) % 50 = 0 THEN '0'"
    " ELSE (CAST(ABS(ROUND(value)) AS BIGINT) % 50) || 's' END AS d FROM events",
)
logsql(
    "p_unroll_zip",
    "* | unpack_words _msg as w | copy w as w2 | unroll (w, w2)"
    " | fields event_id, w, w2",
    f"SELECT {EID}, 'k' AS w, 'k' AS w2 FROM events UNION ALL"
    f" SELECT {EID}, json_extract_string(props, '$.k'),"
    " json_extract_string(props, '$.k') FROM events",
)


@register("f_stream_id")  # engine-computed stream hash — rows-only
def _f_stream_id(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.api import run_query

    logs = _logs(spark, sf_dir)
    sid = logs.where(F.col("event_type") == "error").first()["_stream_id"]
    return run_query(spark, logs, f"_stream_id:{sid} | fields event_id")


# ---------------------------------------------------------------------------
# /select/logsql/* endpoint helpers (endpoints.py)
# ---------------------------------------------------------------------------


@register(
    "ep_hits",
    "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _time, COUNT(*) AS hits"
    " FROM events WHERE event_type = 'error' GROUP BY 1",
)
def _ep_hits(spark, sf_dir):
    from victorialogs_spark import endpoints as ep

    return ep.hits(spark, _logs(spark, sf_dir), "event_type:error", step="1d")


@register(
    "ep_stats_query",
    "SELECT 'c' AS name, '{\"event_type\":\"' || event_type || '\"}' AS labels,"
    " CAST(COUNT(*) AS VARCHAR) AS value FROM events GROUP BY event_type",
)
def _ep_stats_query(spark, sf_dir):
    from victorialogs_spark import endpoints as ep

    return ep.stats_query(
        spark, _logs(spark, sf_dir), "* | stats by (event_type) count() as c"
    )


@register(
    "ep_stats_query_range",
    "SELECT 'c' AS name, '{\"event_type\":\"' || event_type || '\"}' AS labels,"
    " CAST(date_trunc('day', ts) AS TIMESTAMP) AS _time,"
    " CAST(COUNT(*) AS VARCHAR) AS value FROM events GROUP BY 2, 3",
)
def _ep_stats_query_range(spark, sf_dir):
    from victorialogs_spark import endpoints as ep

    return ep.stats_query_range(
        spark, _logs(spark, sf_dir), "* | stats by (event_type) count() as c",
        step="1d",
    )


# r15 serve-path pins: the seventh-pass common-args contract, checked at
# the driver gate. Window [2024-01-05, 2024-01-10] lies inside the
# events table's 30-day span at every sf.
_EPW_LO = 1704412800 * 10**9  # 2024-01-05T00:00:00Z
_EPW_HI = 1704844800 * 10**9  # 2024-01-10T00:00:00Z


@register(
    "ep_query_last_n",
    "SELECT CAST(ts AS TIMESTAMP) AS _time, CAST(event_id AS VARCHAR) AS event_id"
    " FROM events WHERE event_type = 'click' ORDER BY ts DESC LIMIT 50",
)
def _ep_query_last_n(spark, sf_dir):
    """/query with limit=N on a last-N-capable query returns the NEWEST
    N rows (reference getLastNQueryResults; app/vlselect/logsql/
    logsql.go:931-950) — not the first N in scan order. µs-level ts
    ties are absent from the synthetic events table at every sf, so
    the boundary row is deterministic in both engines."""
    from victorialogs_spark import endpoints as ep

    return ep.query_last_n(
        spark, _logs(spark, sf_dir),
        "event_type:click | fields _time, event_id", 50,
    )


@register(
    "ep_hits_common",
    "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS _time, COUNT(*) AS hits"
    " FROM events WHERE event_type IN ('click', 'error')"
    f" AND epoch_ns(ts) BETWEEN {_EPW_LO} AND {_EPW_HI}"
    " GROUP BY 1",
)
def _ep_hits_common(spark, sf_dir):
    """hits with the FULL common-arg set (start/end + JSON
    extra_filters) — parseCommonArgs applies to every select handler
    (logsql.go:1136-1211); before r15 only /query saw these args."""
    from victorialogs_spark import endpoints as ep

    return ep.hits(
        spark, _logs(spark, sf_dir), "*", step="1d",
        start_ns=_EPW_LO, end_ns=_EPW_HI,
        extra_filters='{"event_type":["click","error"]}',
    )


@register(
    "ep_stats_rate_window",
    "SELECT 'r' AS name, '{}' AS labels,"
    f" CAST(COUNT(*) / (({_EPW_HI} - {_EPW_LO} + 1) / 1e9) AS VARCHAR) AS value"
    f" FROM events WHERE epoch_ns(ts) BETWEEN {_EPW_LO} AND {_EPW_HI}",
)
def _ep_stats_rate_window(spark, sf_dir):
    """rate() divides by the API start/end window (the reference folds
    start/end into the query via AddTimeFilter BEFORE
    initStatsRateFuncs, parser.go:465,1219-1225) — the HTTP path's
    divisor, not just the library's (seventh-pass fix)."""
    from victorialogs_spark import endpoints as ep

    return ep.stats_query(
        spark, _logs(spark, sf_dir), "* | stats rate() as r",
        start_ns=_EPW_LO, end_ns=_EPW_HI,
    )


@register(
    "ep_stats_query_multi",
    # pins the r15 single-scan melt: one aggregate, one vector row per
    # (metric function, group) — value strings for long/double metrics
    # must match the wire cast exactly
    "WITH g AS (SELECT event_type, COUNT(*) AS c, "
    + dsum("value") + " AS sv, " + davg("value") + " AS av"
    " FROM events GROUP BY event_type)"
    " SELECT 'c' AS name,"
    " '{\"event_type\":\"' || event_type || '\"}' AS labels,"
    " CAST(c AS VARCHAR) AS value FROM g"
    " UNION ALL SELECT 'sv',"
    " '{\"event_type\":\"' || event_type || '\"}', CAST(sv AS VARCHAR) FROM g"
    " UNION ALL SELECT 'av',"
    " '{\"event_type\":\"' || event_type || '\"}', CAST(av AS VARCHAR) FROM g",
)
def _ep_stats_query_multi(spark, sf_dir):
    from victorialogs_spark import endpoints as ep

    return ep.stats_query(
        spark, _logs(spark, sf_dir),
        "* | stats by (event_type) count() as c, sum(value) as sv,"
        " avg(value) as av",
    )


@register(
    "ep_streams",
    "SELECT '{event_type=\"' || event_type || '\"}' AS _stream,"
    " COUNT(*) AS hits FROM events GROUP BY 1",
)
def _ep_streams(spark, sf_dir):
    from victorialogs_spark import endpoints as ep

    return ep.streams(spark, _logs(spark, sf_dir))


@register(
    "ep_stream_field_values",
    "SELECT event_type AS value, COUNT(*) AS hits FROM events GROUP BY 1",
)
def _ep_stream_field_values(spark, sf_dir):
    from victorialogs_spark import endpoints as ep

    return ep.stream_field_values(spark, _logs(spark, sf_dir), "event_type")


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators (datapipe/): dedup, similarity, text analysis,
# multimodal plumbing — first-class components per the brief
# ---------------------------------------------------------------------------

# normalization for oracle SQL: the EXPLICIT class [ \t\n\r\f\x0b] is
# exactly Java's \s (what Spark's normalize_text collapses); RE2's \s
# omits \x0b, so a literal '\s+' here would diverge from the engine on
# vertical-tab-containing text
_NORM = "trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g'))"


@register(
    "dp_exact_dedup",
    f"SELECT md5({_NORM}) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies"
    " FROM documents GROUP BY 1",
)
def _dp_exact_dedup(spark, sf_dir):
    from victorialogs_spark.datapipe.dedup import exact_dedup

    return exact_dedup(_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dp_ngram_jaccard",
    # exact token-5-gram Jaccard pairs >= 0.05, mirrored fully in SQL
    # (5-grams keep the inverted-index join selective on this corpus)
    "WITH toks AS (SELECT doc_id,"
    f" string_split_regex({_NORM}, '[ \\t\\n\\r\\f\\x0b]+') AS t FROM documents),"
    " grams AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id,"
    " UNNEST(list_transform(range(1, greatest(len(t) - 4, 1) + 1),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))"
    " AS g FROM toks)),"
    " sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),"
    " shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS sh"
    " FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id"
    " GROUP BY 1, 2)"
    " SELECT id_a, id_b, ROUND(CAST(sh AS DOUBLE) / (sa.sz + sb.sz - sh), 6)"
    " AS jaccard FROM shared JOIN sizes sa ON sa.doc_id = id_a"
    " JOIN sizes sb ON sb.doc_id = id_b"
    " WHERE CAST(sh AS DOUBLE) / (sa.sz + sb.sz - sh) >= 0.05",
)
def _dp_ngram_jaccard(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.dedup import ngram_jaccard_pairs

    docs = _spread(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.05)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register(
    "dp_minhash_md5",
    # the ENTIRE minhash pipeline (distinct 3-gram shingles → 8-row md5
    # signature → 4-band buckets → in-bucket pairs → signature-overlap
    # estimate) reproduced in DuckDB — pins the semantics the xxhash
    # production variant (dp_minhash_lsh, rows-only) shares
    f"WITH toks AS (SELECT doc_id, list_filter(string_split_regex({_NORM},"
    " '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '') AS t FROM documents),"
    " grams AS (SELECT doc_id, list_distinct(list_transform("
    " range(1, greatest(len(t) - 2, 1) + 1),"
    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g FROM toks),"
    " sigs AS (SELECT doc_id, list_transform(range(0, 8),"
    " j -> list_min(list_transform(g, s -> md5(CAST(j AS VARCHAR) || ':' || s))))"
    " AS sig FROM grams),"
    " bk AS (SELECT doc_id, sig, UNNEST(range(0, 4)) AS band FROM sigs),"
    " bk2 AS (SELECT doc_id, sig, band,"
    " md5(array_to_string(sig[band*2+1 : band*2+2], '|')) AS bucket FROM bk),"
    " pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,"
    " CAST(len(list_filter(range(1, 9), i -> a.sig[i] = b.sig[i])) AS DOUBLE)/8"
    " AS est_jaccard FROM bk2 a JOIN bk2 b ON a.band = b.band"
    " AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"
    " SELECT id_a, id_b, est_jaccard FROM pairs WHERE est_jaccard >= 0.5",
)
def _dp_minhash_md5(spark, sf_dir):
    from victorialogs_spark.datapipe.dedup import minhash_near_dups_md5

    return minhash_near_dups_md5(
        _spread(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=8, bands=4, threshold=0.5, n=3,
    )


@register("dp_minhash_lsh")  # xxhash64-based — rows-only by design
def _dp_minhash_lsh(spark, sf_dir):
    from victorialogs_spark.datapipe.dedup import minhash_near_dups

    # _spread: the corpus arrives as one small file but the shingle
    # hashing is CPU-bound — spread it across cores before the heavy map.
    # 4 bands × 8 rows (num_hashes=32): P(some band collides) = 0.5 at
    # sim ≈ 0.8 — the right operating point for near-dup detection on a
    # highly self-similar corpus
    docs = _spread(spark, sf_dir, "documents")
    return minhash_near_dups(
        docs, "doc_id", "text", num_hashes=32, bands=4, threshold=0.7,
    )


@register("dp_simhash")  # pandas-UDF path — rows-only
def _dp_simhash(spark, sf_dir):
    from victorialogs_spark.datapipe.dedup import simhash

    return simhash(_spread(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dp_text_stats",
    "SELECT doc_id, LENGTH(text) AS n_chars,"
    " len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> ''))"
    " AS n_tokens,"
    " len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))"
    " AS n_bpe_tokens FROM documents",
)
def _dp_text_stats(spark, sf_dir):
    from victorialogs_spark.datapipe.text import text_stats

    return text_stats(
        _table(spark, sf_dir, "documents"), "doc_id", "text"
    ).select("doc_id", "n_chars", "n_tokens", "n_bpe_tokens")


@register(
    "dp_quality",
    "SELECT doc_id, ROUND("
    " LEAST(len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '')) / 20.0, 1.0) * 0.4"
    " + CASE WHEN len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '')) > 0 THEN"
    "   CAST(len(list_distinct(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> ''))) AS DOUBLE)"
    "   / len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '')) ELSE 0.0 END * 0.4"
    " + (1 - CASE WHEN LENGTH(text) > 0 THEN"
    "   CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / LENGTH(text)"
    "   ELSE 1.0 END) * 0.2, 6) AS quality FROM documents",
)
def _dp_quality(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.text import quality_score

    docs = _table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


@register(
    "dp_lang_id",
    "WITH t AS (SELECT doc_id,"
    " list_distinct(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f\\x0b]+'),"
    " x -> x <> '')) AS toks FROM documents),"
    " s AS (SELECT doc_id,"
    " len(list_intersect(toks, ['the','a','of','and','to','in','is','that','it','for'])) AS en,"
    " len(list_intersect(toks, ['el','la','de','que','y','en','un','por','con','los'])) AS es,"
    " len(list_intersect(toks, ['der','die','das','und','ist','von','mit','den','für','auf'])) AS de,"
    " len(list_intersect(toks, ['le','la','de','et','les','des','est','dans','pour','que'])) AS fr"
    " FROM t)"
    " SELECT doc_id, CASE WHEN GREATEST(en, es, de, fr) = 0 THEN ''"
    " WHEN en >= es AND en >= de AND en >= fr THEN 'en'"
    " WHEN es >= de AND es >= fr THEN 'es'"
    " WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_guess FROM s",
)
def _dp_lang_id(spark, sf_dir):
    from victorialogs_spark.datapipe.text import with_lang_id

    return with_lang_id(_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dp_fingerprint",
    f"WITH n AS (SELECT doc_id, {_NORM} AS s FROM documents)"
    " SELECT doc_id, md5(s) AS fp_full,"
    " list_min(list_transform(range(1, greatest(LENGTH(s) - 15, 1) + 1),"
    " i -> md5(substr(s, CAST(i AS INT), 16)))) AS fp_rolling FROM n",
)
def _dp_fingerprint(spark, sf_dir):
    from victorialogs_spark.datapipe.text import doc_fingerprints

    # _spread, not _table: the rolling-md5 window loop is a CPU-bound
    # Python stage, and a single small input file would otherwise give
    # it ONE partition (measured 15 s single-task at sf1; at corpus
    # scale many files provide the parallelism naturally)
    return doc_fingerprints(_spread(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dp_winnowing",
    # winnowing fingerprints (Schleimer et al. 2003 / MOSS): k=5-token
    # gram hashes (first 15 hex digits of md5, exact in both engines),
    # w=4 windows, rightmost-minimum selection, distinct per doc.
    # DuckDB replica builds the identical grams/hashes with list
    # lambdas; hex -> BIGINT via exact shift-sum (POW would go through
    # doubles and lose bits past 2^53).
    f"WITH n AS (SELECT doc_id, list_filter(string_split_regex({_NORM},"
    " ' '), t -> t <> '') AS t FROM documents),"
    " g AS (SELECT doc_id, CASE WHEN len(t) = 0 THEN []"
    " WHEN len(t) < 5 THEN [array_to_string(t, ' ')]"
    " ELSE list_transform(range(1, len(t) - 3),"
    " i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])) END AS gs"
    " FROM n),"
    " h AS (SELECT doc_id, list_transform(gs, g -> CAST(list_sum("
    " list_transform(range(15), j -> CAST(strpos('0123456789abcdef',"
    " substr(md5(g), 1 + j, 1)) - 1 AS BIGINT) * (CAST(1 AS BIGINT)"
    " << (4 * (14 - j))))) AS BIGINT)) AS hs FROM g),"
    " wv AS (SELECT doc_id, hs,"
    " CASE WHEN len(hs) <= 4 THEN 1 ELSE len(hs) - 3 END AS nw FROM h"
    " WHERE len(hs) > 0),"
    " sel AS (SELECT doc_id, i - 1 + len(cur) - list_position(list_reverse(cur), m)"
    " AS pos, m AS fp FROM ("
    " SELECT doc_id, i, hs[i : i + least(4, len(hs)) - 1] AS cur,"
    " list_min(hs[i : i + least(4, len(hs)) - 1]) AS m"
    " FROM wv, UNNEST(range(1, nw + 1)) AS u(i)))"
    " SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, fp FROM sel",
)
def _dp_winnowing(spark, sf_dir):
    from victorialogs_spark.datapipe.text import winnowing_fingerprints

    # _spread: CPU-bound Arrow stage (grams + md5 + window minima) —
    # same single-input-split hazard as dp_fingerprint
    docs = _spread(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4)


@register(
    "dp_ngram_counts",
    # corpus trigram count table (KenLM-style export), min_count=2 —
    # identical gram construction to dp_ngram_repetition's oracle
    f"WITH n AS (SELECT list_filter(string_split_regex({_NORM}, ' '),"
    " t -> t <> '') AS t FROM documents),"
    " g AS (SELECT UNNEST(list_transform(range(1, len(t) - 1),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ngram"
    " FROM n WHERE len(t) >= 3)"
    " SELECT ngram, COUNT(*) AS count FROM g GROUP BY ngram"
    " HAVING COUNT(*) >= 2",
)
def _dp_ngram_counts(spark, sf_dir):
    from victorialogs_spark.datapipe.text import ngram_counts

    # _spread: the gram build + Counter pre-agg is a CPU-bound Arrow
    # stage (the single-input-split hazard, SCALE.md r13)
    docs = _spread(spark, sf_dir, "documents")
    return ngram_counts(docs, "text", n=3, min_count=2)


@register(
    "dp_cosine_threshold",
    # neighbors of vec 0 with cosine >= 0.25 (exact, double precision,
    # rounded 6dp on both sides)
    "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)"
    " SELECT vec_id, ROUND(list_cosine_similarity(embedding::DOUBLE[], qv), 6)"
    " AS cos FROM embeddings, q"
    " WHERE list_cosine_similarity(embedding::DOUBLE[], qv) >= 0.25",
)
def _dp_cosine_threshold(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import cosine_scores

    emb = _table(spark, sf_dir, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = cosine_scores(emb, "vec_id", "embedding", q)
    return out.where(F.col("cos") >= 0.25).withColumn("cos", F.round("cos", 6))


@register(
    "dp_label_centroids",
    # per-(label, dim) centroid means, decimal-summed for exact
    # order-independent addition (same scheme as the logprob entries)
    "WITH l AS (SELECT label, UNNEST(embedding::DOUBLE[]) AS val,"
    " UNNEST(range(0, len(embedding))) AS dim FROM embeddings)"
    " SELECT CAST(label AS INT) AS label, CAST(dim AS INT) AS dim,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(38,9))) AS DOUBLE)"
    " / COUNT(*), 6) AS mean_val"
    " FROM l GROUP BY label, dim",
)
def _dp_label_centroids(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import label_centroids

    emb = _table(spark, sf_dir, "embeddings")
    out = label_centroids(emb, "label", "embedding")
    return out.select(
        F.col("label").cast("int").alias("label"),
        F.col("dim").cast("int").alias("dim"),
        "n",
        "mean_val",
    )


@register(
    "dp_knn_purity",
    # nearest-neighbor label agreement for the 100 lowest-id vectors:
    # cosine rounded to 9dp on BOTH engines before the (cos desc, id asc)
    # winner pick, so the comparison key is engine-identical even for
    # near-tied neighbors (IEEE summation order differs between engines)
    # zero-norm vectors and NULL ids are excluded on both engines
    # (cosine undefined / NULLS-FIRST-vs-LAST ordering divergence)
    "WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v"
    " FROM embeddings WHERE vec_id IS NOT NULL"
    " AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),"
    " q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel FROM c"
    " ORDER BY vec_id LIMIT 100),"
    " s AS (SELECT qid, qlabel, c.vec_id AS cid, c.label AS clabel,"
    " FLOOR(list_cosine_similarity(c.v, qv) * 1e9 + 0.5) / 1e9 AS cos"
    " FROM c, q WHERE c.vec_id <> qid),"
    " r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid"
    " ORDER BY cos DESC, cid ASC) AS rn FROM s)"
    " SELECT qid AS vec_id, cid AS nn_id,"
    " FLOOR(cos * 1e6 + 0.5) / 1e6 AS nn_cos,"
    " clabel = qlabel AS same_label FROM r WHERE rn = 1",
)
def _dp_knn_purity(spark, sf_dir):
    from victorialogs_spark.datapipe.similarity import knn_label_purity

    emb = _table(spark, sf_dir, "embeddings")
    return knn_label_purity(emb, "vec_id", "embedding", "label",
                            n_queries=100)


@register(
    "dp_ann_quantized_topk",
    # int8-quantized cosine top-10: both engines quantize with the SAME
    # explicit half-up rule q = floor(x/(amax/127) + 0.5), then the score
    # is exact 64-bit integer dot/norms with one final IEEE sqrt/divide —
    # bit-identical, so a full-precision oracle checks the approximate op
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),"
    " dq AS (SELECT vec_id, v,"
    " list_max(list_transform(v, y -> abs(y))) AS amax FROM d),"
    " dv AS (SELECT vec_id, list_transform(v,"
    " x -> CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT)) AS qv"
    " FROM dq WHERE amax > 0),"
    " qv AS (SELECT qv AS qq FROM dv WHERE vec_id = 0),"
    " sc AS (SELECT vec_id,"
    " CAST(list_sum(list_transform(range(1, len(qv) + 1),"
    " i -> qv[i] * qq[i])) AS DOUBLE) /"
    " (sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) *"
    " sqrt(CAST(list_sum(list_transform(qq, x -> x * x)) AS DOUBLE)))"
    " AS qcos FROM dv, qv)"
    " SELECT vec_id, ROUND(qcos, 6) AS qcos FROM"
    " (SELECT * FROM sc ORDER BY qcos DESC, vec_id LIMIT 10)",
)
def _dp_ann_quantized(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import quantized_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = quantized_topk(emb, "vec_id", "embedding", q, k=10)
    return out.withColumn("qcos", F.round("qcos", 6))


@register(
    "dp_ann_bruteforce_topk",
    # exact top-10 by cosine (double precision both sides; deterministic
    # vec_id tie-break; scores rounded 6dp — synthetic embeddings keep
    # neighbor gaps far above double rounding noise)
    "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)"
    " SELECT vec_id, ROUND(list_cosine_similarity(embedding::DOUBLE[], qv), 6)"
    " AS cos FROM embeddings, q"
    " ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC, vec_id"
    " LIMIT 10",
)
def _dp_ann_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import brute_force_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return brute_force_topk(emb, "vec_id", "embedding", q, k=10).withColumn(
        "cos", F.round("cos", 6)
    )


# Integer hyperplanes for the engine-exact LSH twin: deterministic
# constants (seeded Gaussian, half-up-rounded to ints), embedded in the
# oracle SQL as literals so DuckDB derives the identical buckets.
def _int_planes_sql() -> str:
    from victorialogs_spark.datapipe.similarity import int_hyperplanes

    rows = ", ".join(
        f"({i}, [{', '.join(map(str, row))}])"
        for i, row in enumerate(int_hyperplanes(64, 6, 42))
    )
    return f"(VALUES {rows}) t(i, p)"


@register(
    "dp_ann_lsh_quantized_topk",
    # Engine-exact LSH top-10 (oracle twin of the rows-only
    # dp_ann_lsh_topk): int8-quantized vectors (explicit half-up rule),
    # INTEGER hyperplanes, each bucket bit = sign of an exact int64 dot (a
    # float dot's sign can flip with IEEE summation order — the reason
    # the float sibling is rows-only), multi-probe = single-bit flips,
    # quantized-cosine scoring (int64 dot/norms, one IEEE sqrt/divide).
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),"
    " dq AS (SELECT vec_id, v,"
    " list_max(list_transform(v, y -> abs(y))) AS amax FROM d),"
    " dv AS (SELECT vec_id, list_transform(v,"
    " x -> CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT)) AS qv"
    " FROM dq WHERE amax > 0),"
    f" pl AS (SELECT * FROM {_int_planes_sql()}),"
    " bk AS (SELECT vec_id, qv, CAST(SUM(CASE WHEN"
    " list_sum(list_transform(range(1, 65), j -> p[j] * qv[j])) >= 0"
    " THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS bucket"
    " FROM dv, pl GROUP BY vec_id, qv),"
    " qb AS (SELECT bucket AS b0 FROM bk WHERE vec_id = 0),"
    " pr AS (SELECT b0 AS pb FROM qb"
    " UNION SELECT xor(b0, 1::BIGINT << i) FROM qb, range(6) t(i)),"
    " qq AS (SELECT qv AS q FROM dv WHERE vec_id = 0),"
    " sc AS (SELECT bk.vec_id,"
    " CAST(list_sum(list_transform(range(1, 65), i -> bk.qv[i] * q[i]))"
    " AS DOUBLE) /"
    " (sqrt(CAST(list_sum(list_transform(bk.qv, x -> x * x)) AS DOUBLE)) *"
    " sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)))"
    " AS qcos FROM bk, qq WHERE bk.bucket IN (SELECT pb FROM pr))"
    " SELECT vec_id, ROUND(qcos, 6) AS qcos FROM"
    " (SELECT * FROM sc ORDER BY qcos DESC, vec_id LIMIT 10)",
)


def _dp_ann_lsh_quantized(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import ann_lsh_quantized_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = ann_lsh_quantized_topk(
        emb, "vec_id", "embedding", q, k=10, n_planes=6, probes=6
    )
    return out.withColumn("qcos", F.round("qcos", 6))


@register(
    "dp_ann_ivf_quantized_topk",
    # Engine-exact IVF top-10 (oracle twin of the rows-only
    # dp_ann_ivf_topk): Lloyd centroids are not cross-engine
    # reproducible, so cells are anchored to SEED ROWS (quantized
    # vectors of the 32 smallest ids); assignment and probing both use
    # the quantized cosine (int64-exact dots, correctly-rounded IEEE
    # sqrt/divide), ties to the smallest seed id.
    "WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),"
    " dq AS (SELECT vec_id, v,"
    " list_max(list_transform(v, y -> abs(y))) AS amax FROM d),"
    " dv AS (SELECT vec_id, list_transform(v,"
    " x -> CAST(floor(x / (amax / 127.0) + 0.5) AS BIGINT)) AS qv"
    " FROM dq WHERE amax > 0),"
    " cent AS (SELECT vec_id AS cid, qv AS cv,"
    " CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE) AS cn2"
    " FROM (SELECT * FROM dv ORDER BY vec_id LIMIT 32)),"
    " asn AS (SELECT dv.vec_id, c.cid,"
    " CAST(list_sum(list_transform(range(1, 65), i -> dv.qv[i] * c.cv[i]))"
    " AS DOUBLE) /"
    " (sqrt(CAST(list_sum(list_transform(dv.qv, x -> x * x)) AS DOUBLE)) *"
    " sqrt(c.cn2)) AS s FROM dv, cent c),"
    " cell AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, ROW_NUMBER()"
    " OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn FROM asn)"
    " WHERE rn = 1),"
    " qcells AS (SELECT cid FROM asn WHERE vec_id = 0"
    " ORDER BY s DESC, cid LIMIT 4),"
    " qq AS (SELECT qv AS q FROM dv WHERE vec_id = 0),"
    " sc AS (SELECT dv.vec_id,"
    " CAST(list_sum(list_transform(range(1, 65), i -> dv.qv[i] * q[i]))"
    " AS DOUBLE) /"
    " (sqrt(CAST(list_sum(list_transform(dv.qv, x -> x * x)) AS DOUBLE)) *"
    " sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)))"
    " AS qcos FROM dv JOIN cell USING (vec_id), qq"
    " WHERE cell.cid IN (SELECT cid FROM qcells))"
    " SELECT vec_id, ROUND(qcos, 6) AS qcos FROM"
    " (SELECT * FROM sc ORDER BY qcos DESC, vec_id LIMIT 10)",
)


def _dp_ann_ivf_quantized(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import ivf_quantized_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = ivf_quantized_topk(
        emb, "vec_id", "embedding", q, k=10, n_seed_cells=32, probes=4
    )
    return out.withColumn("qcos", F.round("qcos", 6))


@register("dp_ann_lsh_topk")  # approximate by construction — rows-only
def _dp_ann_lsh(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import ann_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return ann_topk(emb, "vec_id", "embedding", q, k=10, n_planes=6, probes=6)


@register("dp_ann_ivf_topk")  # approximate by construction — rows-only
def _dp_ann_ivf(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import ivf_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return ivf_topk(emb, "vec_id", "embedding", q, k=10, n_centroids=32, probes=4)


@register("dp_embedding_near_dup")  # LSH-bucketed pairs — rows-only
def _dp_embedding_near_dup(spark, sf_dir):
    from victorialogs_spark.datapipe.similarity import embedding_near_dup_pairs

    emb = _table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, "vec_id", "embedding", dim=64, threshold=0.5, n_planes=4
    )


@register("dp_embedding_clusters")  # composition over LSH pairs — rows-only
def _dp_embedding_clusters(spark, sf_dir):
    """Semantic dedup: transitive clusters over embedding-cosine near-dup
    pairs — the same components machinery the text path uses, applied to
    the vector modality (pairs are hyperplane-bucket pruned, never
    all-pairs; fixed seed keeps the run deterministic, but the bucket
    boundary depends on numpy hyperplanes no SQL engine reproduces)."""
    from victorialogs_spark.datapipe.clusters import dup_clusters

    # reuse the registered near-dup entry so both benchmarks share ONE
    # candidate-set definition (dim/threshold/n_planes tuned in one place)
    emb = _table(spark, sf_dir, "embeddings")
    pairs = _dp_embedding_near_dup(spark, sf_dir).select("id_a", "id_b")
    return dup_clusters(emb, "vec_id", pairs)


# shared CTE chain for the engine-exact embedding near-dup oracles:
# axis-aligned sign-bit buckets (sign of a stored float — no arithmetic,
# exact cross-engine; the dp_semdedup recipe) over comparable vectors
_EMB_EXACT_BUCKETS_SQL = (
    "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
    " WHERE vec_id IS NOT NULL),"
    " c AS (SELECT vec_id, v, CAST(list_sum(list_transform(range(8),"
    " j -> CASE WHEN v[j + 1] > 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS b"
    " FROM e WHERE len(v) = 64"
    " AND len(list_filter(v, x -> x IS NULL)) = 0"
    " AND list_sum(list_transform(v, x -> x * x)) > 0)"
)


@register(
    "dp_embedding_near_dup_exact",
    # engine-exact twin of dp_embedding_near_dup (whose numpy hyperplane
    # buckets no SQL engine reproduces): same-bucket pairs, cosine
    # ROUNDed 9dp before the threshold (verdict-stable) and 6dp in the
    # output (the dp_cosine_threshold value discipline)
    f"WITH {_EMB_EXACT_BUCKETS_SQL}"
    " SELECT a.vec_id AS id_a, b2.vec_id AS id_b,"
    " FLOOR(FLOOR(list_cosine_similarity(a.v, b2.v) * 1e9 + 0.5) / 1e9"
    " * 1e6 + 0.5) / 1e6 AS cos_6dp"
    " FROM c a JOIN c b2 ON a.b = b2.b AND a.vec_id < b2.vec_id"
    " WHERE FLOOR(list_cosine_similarity(a.v, b2.v) * 1e9 + 0.5) / 1e9"
    " >= 0.30",
)
def _dp_embedding_near_dup_exact(spark, sf_dir):
    from victorialogs_spark.datapipe.similarity import (
        embedding_near_dup_pairs_exact,
    )

    emb = _table(spark, sf_dir, "embeddings")
    # 0.30 for the same reason as dp_semdedup: the synthetic corpus'
    # cosine ceiling (~0.51) makes the production 0.85 vacuous here
    return embedding_near_dup_pairs_exact(
        emb, "vec_id", "embedding", dim=64, threshold=0.30, n_sign_bits=8
    )


@register(
    "dp_embedding_clusters_exact",
    # transitive clusters over the engine-exact pair graph — the vector
    # modality's dp_dup_clusters: large-star/small-star vs a DuckDB
    # recursive-CTE closure, min-id cluster labels, singletons kept
    f"WITH RECURSIVE {_EMB_EXACT_BUCKETS_SQL},"
    " prs AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b"
    " FROM c a JOIN c b2 ON a.b = b2.b AND a.vec_id < b2.vec_id"
    " WHERE FLOOR(list_cosine_similarity(a.v, b2.v) * 1e9 + 0.5) / 1e9 >= 0.30),"
    " edges AS (SELECT id_a AS u, id_b AS w FROM prs"
    " UNION SELECT id_b, id_a FROM prs),"
    " reach AS (SELECT u, w FROM edges UNION"
    " SELECT r.u, e2.w FROM reach r JOIN edges e2 ON r.w = e2.u"
    " WHERE e2.w <> r.u),"
    " comp AS (SELECT d.vec_id, COALESCE(LEAST(d.vec_id, m.mn), d.vec_id)"
    " AS cluster FROM e d LEFT JOIN"
    " (SELECT u, MIN(w) AS mn FROM reach GROUP BY u) m ON m.u = d.vec_id)"
    " SELECT vec_id, cluster FROM comp",
)
def _dp_embedding_clusters_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.clusters import dup_clusters
    from victorialogs_spark.datapipe.similarity import (
        embedding_near_dup_pairs_exact,
    )

    emb = _table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs_exact(
        emb, "vec_id", "embedding", dim=64, threshold=0.30, n_sign_bits=8
    ).select("id_a", "id_b")
    return dup_clusters(
        emb.where(F.col("vec_id").isNotNull()), "vec_id", pairs
    )


_B4 = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"


@register(
    "dp_chunk_documents",
    # 120-char windows, 20-char overlap (stride 100); every doc yields
    # >= 1 chunk
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id, i AS chunk_idx,"
    " i * 100 AS chunk_start,"
    " substr(text, i * 100 + 1, 120) AS chunk_text FROM documents,"
    " UNNEST(range(0, GREATEST(CAST(CEIL((LENGTH(text) - 20) / 100.0) AS BIGINT), 1)))"
    " AS u(i)",
)
def _dp_chunk_documents(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.text import chunk_documents

    docs = _table(spark, sf_dir, "documents")
    out = chunk_documents(docs, "doc_id", "text", chunk_chars=120, overlap=20)
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        "chunk_text",
    )


@register(
    "dp_hash_sample",
    # deterministic md5-bucket sampling: ~10% = buckets 0000..1998
    f"SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents"
    f" WHERE {_B4} <= '1998'",
)
def _dp_hash_sample(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.sampling import hash_sample

    docs = _table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1).select(
        F.col("doc_id").cast("string").alias("doc_id")
    )


@register(
    "dp_train_val_test_split",
    # stable content-keyed split labels: test = lowest 5% of buckets,
    # val = next 5%, train = rest
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
    f" CASE WHEN {_B4} <= '0ccb' THEN 'test'"
    f" WHEN {_B4} <= '1998' THEN 'val' ELSE 'train' END AS split"
    " FROM documents",
)
def _dp_split(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.sampling import train_val_test_split

    docs = _table(spark, sf_dir, "documents")
    return train_val_test_split(docs, "doc_id", 0.05, 0.05).select(
        F.col("doc_id").cast("string").alias("doc_id"), "split"
    )


@register(
    "dp_dedup_keep_best",
    # keep the highest-(score, id) copy per normalized-content fingerprint;
    # score = deterministic quality proxy (text length)
    f"WITH s AS (SELECT doc_id, LENGTH(text) AS score, md5({_NORM}) AS fp"
    " FROM documents), r AS (SELECT *,"
    " ROW_NUMBER() OVER (PARTITION BY fp ORDER BY score DESC, doc_id DESC) AS rn,"
    " COUNT(*) OVER (PARTITION BY fp) AS n FROM s)"
    " SELECT fp, doc_id, score, n AS n_copies FROM r WHERE rn = 1",
)
def _dp_dedup_keep_best(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.dedup import dedup_keep_best

    docs = _table(spark, sf_dir, "documents").withColumn(
        "score", F.length("text")
    )
    return dedup_keep_best(docs, "doc_id", "text", "score")


_NORM_NN = _NORM.replace("lower(text)", "lower(COALESCE(text, ''))")


@register(
    "dp_stratified_sample",
    # per-class rebalancing: keep all errors, 10% of clicks, drop the rest
    "SELECT CAST(event_id AS VARCHAR) AS event_id, event_type FROM events"
    " WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 4) <="
    " CASE event_type WHEN 'error' THEN 'ffff' WHEN 'click' THEN '1998'"
    " ELSE '' END"
    " AND event_type IN ('error', 'click')",
)
def _dp_stratified_sample(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.sampling import stratified_hash_sample

    ev = _table(spark, sf_dir, "events")
    out = stratified_hash_sample(
        ev, "event_type", "event_id", {"error": 1.0, "click": 0.1}
    )
    return out.select(
        F.col("event_id").cast("string").alias("event_id"), "event_type"
    )


@register(
    "dp_mix_sources",
    # corpus mixing to target proportions (60/25/15 over three langs):
    # the oracle recomputes the binding-group total T = min(n/w), the
    # per-group keep fractions and the 16-bit md5-bucket thresholds with
    # the same IEEE ops, then applies the same pushable string compare
    "WITH c AS (SELECT lang AS g, COUNT(*) AS n FROM documents"
    " WHERE lang IN ('en', 'zh', 'de') GROUP BY lang),"
    " w AS (SELECT * FROM (VALUES ('en', CAST(0.6 AS DOUBLE)),"
    " ('zh', CAST(0.25 AS DOUBLE)), ('de', CAST(0.15 AS DOUBLE)))"
    " AS t(g, w)),"
    " j AS (SELECT c.g, n, w FROM c JOIN w ON c.g = w.g),"
    " t AS (SELECT MIN(n / w) AS tot FROM j),"
    # binding group (n/w = tot) pins to exactly 1.0 like the engine;
    # fractions flooring to bucket 0 yield '' (group dropped — the
    # <= '' compare is never true), NOT printf(-1)='ffffffff'
    " f0 AS (SELECT g, n, CASE WHEN n / w = tot THEN 1.0"
    " ELSE LEAST(1.0, (w * tot) / n) END AS frac FROM j, t),"
    " f AS (SELECT g, CASE WHEN CAST(floor(frac * 65536) AS INT) = 0"
    " THEN '' ELSE printf('%04x',"
    " CAST(floor(frac * 65536) AS INT) - 1) END AS thr FROM f0)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang FROM documents"
    " JOIN f ON lang = f.g"
    " WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <= thr",
)
def _dp_mix_sources(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.sampling import mix_sources

    docs = _table(spark, sf_dir, "documents")
    out = mix_sources(docs, "lang", "doc_id",
                      {"en": 0.6, "zh": 0.25, "de": 0.15})
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"), "lang"
    )


@register(
    "dp_stream_stats",
    # one availableNow pass of the streaming windowed stats ≡ the batch
    # tumbling-window aggregate (decimal-accumulated sum on both sides)
    "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart,"
    f" event_type, COUNT(*) AS hits, {dsum('value')} AS total"
    " FROM events GROUP BY 1, 2",
)
def _dp_stream_stats(spark, sf_dir):
    """Streaming LogsQL stats (stream_stats) checked against the batch
    semantics: over a bounded source the watermarked hourly windows
    equal a plain tumbling-window GROUP BY."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from victorialogs_spark.streaming.windowed import stream_stats

    name = "sstats_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="vl_sstats_")
    # the streaming parquet reader hands TIMESTAMP(NANOS) over as a µs
    # timestamp when the declared schema says so (unlike the batch
    # reader, which needs the nanosAsLong detour in schema.load_table)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .parquet(f"{sf_dir}/events.*")
        .withColumn("_time", F.col("ts"))
    )
    agg = stream_stats(
        stream,
        "* | stats by (event_type) count() as hits, sum(value) as total",
        step="1 hour",
        watermark="365 days",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("dp_stream_stats: stream did not finish in 300s")
    out = spark.table(name)
    return out.select(
        F.col("window.start").alias("wstart"),
        "event_type",
        F.col("hits").cast("long").alias("hits"),
        "total",
    )


@register("dp_pca_topk")  # rows-only: the eigensolve isn't SQL-reproducible
def _dp_pca_topk(spark, sf_dir):
    """PCA 64→8 dims fitted on the corpus (distributed moment partials,
    driver eigensolve) then exact nearest-neighbors to vector 0 in the
    REDUCED space — the reduce-then-index shape an ANN pipeline uses."""
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.similarity import pca_fit, pca_transform

    emb = _table(spark, sf_dir, "embeddings")
    mean, comps = pca_fit(emb, "embedding", k=8)
    red = pca_transform(emb, "vec_id", "embedding", mean, comps)
    row = red.where(F.col("vec_id") == 0).first()
    if row is None or row["reduced"] is None:
        raise ValueError(
            "dp_pca_topk: embeddings table has no projectable vec_id 0"
        )
    q = row["reduced"]
    qarr = F.array(*[F.lit(float(v)) for v in q])
    d2 = F.aggregate(
        F.zip_with(F.col("reduced"), qarr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        red.where(F.col("reduced").isNotNull())
        .select(
            F.col("vec_id").cast("string").alias("vec_id"),
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
        .orderBy("dist", "vec_id")
        .limit(10)
    )


# shared hex-pair → byte-value extraction for the md5-stream fixtures of
# the integer-exact multimodal twins below: byte i of a doc's synthetic
# payload is byte (i % 16) of md5(doc_id || salt || (i // 16))
def _md5_byte(salt: str) -> str:
    h = f"md5(doc_id || '{salt}' || CAST(i // 16 AS VARCHAR))"
    return (
        f"(16 * (strpos('0123456789abcdef', substr({h}, 1 + 2 * (i % 16), 1)) - 1)"
        f" + (strpos('0123456789abcdef', substr({h}, 2 + 2 * (i % 16), 1)) - 1))"
    )


def _md5_stream_payload(salt: str, header: bytes, n_chunks: int):
    """Column: header || unhex(md5(doc_id||salt||0)) || ... — a
    deterministic byte stream both engines can regenerate exactly."""
    from pyspark.sql import functions as F

    sid = F.col("doc_id").cast("string")
    chunks = [
        F.unhex(F.md5(F.concat(sid, F.lit(f"{salt}{i}"))))
        for i in range(n_chunks)
    ]
    return F.concat(F.lit(header), *chunks)


@register(
    "dp_image_ahash",
    # integer-exact oracle twin of dp_image_phash: the 24x24 P6 pixel
    # bytes are an md5 stream both engines regenerate; aHash is pure
    # integer arithmetic (gray = (299R+587G+114B)//1000, 3x3-block sums,
    # strict cross-multiplied mean compare), so the DuckDB replica is
    # bit-identical while Spark still runs the REAL decode->pool path
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':img:')} AS v"
    " FROM ids, UNNEST(range(1728)) AS u(i)),"
    " px AS (SELECT doc_id, i // 3 AS p,"
    " CAST(SUM(CASE WHEN i % 3 = 0 THEN 299 * v"
    " WHEN i % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000 AS gray"
    " FROM b GROUP BY 1, 2),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import image_ahash

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    payload = _md5_stream_payload(":img:", b"P6\n24 24\n255\n", 108)
    assets = docs.select("doc_id", payload.alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_image_ahash_png",
    # the dp_image_ahash playbook through the REAL PNG codec: the same
    # md5 pixel stream (salt :imgpng:) is PNG-encoded Spark-side with
    # per-row filters cycling 0-4 (every unfilter path exercised), then
    # decoded by the stdlib zlib-inflate + scanline-unfilter decoder
    # before hashing. PNG is lossless, so the pixels DuckDB regenerates
    # arithmetically are bit-identical to what Spark decodes — the
    # oracle is dp_image_ahash's SQL with the new salt.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgpng:')} AS v"
    " FROM ids, UNNEST(range(1728)) AS u(i)),"
    " px AS (SELECT doc_id, i // 3 AS p,"
    " CAST(SUM(CASE WHEN i % 3 = 0 THEN 299 * v"
    " WHEN i % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000 AS gray"
    " FROM b GROUP BY 1, 2),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_png(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import encode_png, image_ahash

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgpng:", b"", 108)  # 1728 pixel bytes

    def _to_png(series):
        import numpy as np
        import pandas as pd

        return pd.Series(
            [
                encode_png(
                    np.frombuffer(bytes(b), np.uint8).reshape(24, 24, 3),
                    filter_types="cycle",
                )
                for b in series
            ]
        )

    _to_png.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_png = F.pandas_udf(_to_png, "binary")
    assets = docs.select("doc_id", to_png(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_mp4_frame_extract",
    # REAL MP4 container parsing under the sampler (datapipe/mp4.py):
    # each video doc's payload is a genuine ISO-BMFF file (ftyp + mdat +
    # moov with stts/stss/stsz/stsc/stco) built from md5-stream bytes —
    # n = 4 + b0 % 5 samples, duration_ms(k) = 100 + b[1+k], size(k) =
    # 32 + b[16+k], keyframe iff k % 3 == 0. Spark WALKS THE BOXES and
    # seeks: for each t = j*500 < total, the latest keyframe at or
    # before t. Pure integer sample-table arithmetic — DuckDB replicates
    # it from the same md5 bytes without ever touching the container.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents"
    " WHERE doc_id % 3 = 2),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':mp4:')} AS v"
    " FROM ids, UNNEST(range(32)) AS u(i)),"
    " n0 AS (SELECT doc_id, 4 + (v % 5) AS ns FROM b WHERE i = 0),"
    " s AS (SELECT b.doc_id, i - 1 AS k, 100 + v AS dur FROM b"
    " JOIN n0 USING (doc_id) WHERE i BETWEEN 1 AND ns),"
    " z AS (SELECT b.doc_id, i - 16 AS k, 32 + v AS size FROM b"
    " JOIN n0 USING (doc_id) WHERE i BETWEEN 16 AND 15 + ns),"
    " t AS (SELECT doc_id, k, dur, COALESCE(SUM(dur) OVER ("
    " PARTITION BY doc_id ORDER BY k"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st FROM s),"
    " tot AS (SELECT doc_id, SUM(dur) AS total FROM s GROUP BY doc_id),"
    " frames AS (SELECT doc_id, CAST(u.i * 500 AS BIGINT) AS ts FROM tot,"
    " UNNEST(range(0, CAST(CEIL(total / 500.0) AS BIGINT))) AS u(i)),"
    " key AS (SELECT doc_id, k, st FROM t WHERE k % 3 = 0),"
    " sel AS (SELECT f.doc_id, f.ts, MAX(key.k) AS k FROM frames f"
    " JOIN key ON key.doc_id = f.doc_id AND key.st <= f.ts GROUP BY 1, 2)"
    " SELECT CAST(sel.doc_id AS BIGINT) AS asset_id, sel.ts AS frame_ts_ms,"
    " CAST(sel.k AS BIGINT) AS sample_index,"
    " CAST(t.st AS BIGINT) AS sample_time_ms,"
    " CAST(z.size AS BIGINT) AS sample_size"
    " FROM sel JOIN t ON t.doc_id = sel.doc_id AND t.k = sel.k"
    " JOIN z ON z.doc_id = sel.doc_id AND z.k = sel.k",
)
def _dp_mp4_frame_extract(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.mp4 import video_frame_sample

    docs = (
        _spread(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 2)
    )
    raw = _md5_stream_payload(":mp4:", b"", 2)  # 32 deterministic bytes

    def _to_mp4(series):
        import pandas as pd

        from victorialogs_spark.datapipe.mp4 import build_mp4

        out = []
        for buf in series:
            raw_b = bytes(buf)
            n = 4 + raw_b[0] % 5
            durs = [100 + raw_b[1 + k] for k in range(n)]
            sizes = [32 + raw_b[16 + k] for k in range(n)]
            payloads = [bytes([k % 256]) * sizes[k] for k in range(n)]
            out.append(build_mp4(payloads, durs, sync_every=3))
        return pd.Series(out)

    _to_mp4.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_mp4 = F.pandas_udf(_to_mp4, "binary")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"), to_mp4(raw).alias("payload")
    )
    return video_frame_sample(assets, every_ms=500)


@register(
    "dp_image_ahash_jpeg",
    # REAL baseline-JPEG decode under the hash: each doc's payload is a
    # greyscale JPEG of 9 flat 8x8 blocks (greys = 9 md5-stream bytes),
    # encoded Spark-side by jpeg.encode_jpeg and decoded by the generic
    # marker/Huffman/dequantize path. Flat blocks take the decoder's
    # exact-integer DC-only fast path, so the decoded pixel of block
    # value v is dc = floor(8(v-128)/17 + 0.5) (q00 = 17, odd so encode
    # never hits a rounding tie) then clamp(floor((dc*17+4)/8) + 128) —
    # which DuckDB replicates arithmetically below. Lossy codec, exact
    # oracle: the loss itself is deterministic integer math.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgjpg:')} AS v"
    " FROM ids, UNNEST(range(9)) AS u(i)),"
    " e AS (SELECT doc_id, i AS blk, LEAST(GREATEST(CAST(FLOOR(("
    " CAST(FLOOR(8.0 * (v - 128) / 17.0 + 0.5) AS BIGINT) * 17 + 4) / 8.0)"
    " AS BIGINT) + 128, 0), 255) AS gray FROM b),"
    " px AS (SELECT q.doc_id, q.p, e.gray FROM"
    " (SELECT doc_id, u.i AS p FROM ids, UNNEST(range(576)) AS u(i)) q"
    " JOIN e ON e.doc_id = q.doc_id"
    " AND e.blk = ((q.p // 24) // 8) * 3 + ((q.p % 24) // 8)),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_jpeg(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import image_ahash

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgjpg:", b"", 1)  # 16 bytes; first 9 used

    def _to_jpeg(series):
        import numpy as np
        import pandas as pd

        from victorialogs_spark.datapipe.jpeg import encode_jpeg

        out = []
        for b in series:
            v = np.frombuffer(bytes(b), np.uint8, 9).astype(np.int64).reshape(3, 3)
            img = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
            out.append(encode_jpeg(img))
        return pd.Series(out)

    _to_jpeg.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_jpeg = F.pandas_udf(_to_jpeg, "binary")
    assets = docs.select("doc_id", to_jpeg(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_image_ahash_jpeg_progressive",
    # REAL PROGRESSIVE (SOF2) JPEG decode under the hash — the scan
    # playbook of dp_image_ahash_jpeg through the multi-scan path:
    # jpeg.encode_jpeg_progressive emits spectral-selection bands at
    # successive-approximation precision (DC at Al=1 then bit-refined;
    # AC bands 1-5 / 6-63 at Al=2 refined twice), and the decoder
    # accumulates coefficients scan by scan (T.81 Annex G: EOB runs,
    # correction bits). Because progressive coding is a reordering of
    # the SAME quantized coefficients, the fully-refined result equals
    # the baseline decode exactly — so the oracle is the baseline
    # entry's arithmetic with a new salt (q00 = 17, flat-block DC fast
    # path; see dp_image_ahash_jpeg).
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgjpgp:')} AS v"
    " FROM ids, UNNEST(range(9)) AS u(i)),"
    " e AS (SELECT doc_id, i AS blk, LEAST(GREATEST(CAST(FLOOR(("
    " CAST(FLOOR(8.0 * (v - 128) / 17.0 + 0.5) AS BIGINT) * 17 + 4) / 8.0)"
    " AS BIGINT) + 128, 0), 255) AS gray FROM b),"
    " px AS (SELECT q.doc_id, q.p, e.gray FROM"
    " (SELECT doc_id, u.i AS p FROM ids, UNNEST(range(576)) AS u(i)) q"
    " JOIN e ON e.doc_id = q.doc_id"
    " AND e.blk = ((q.p // 24) // 8) * 3 + ((q.p % 24) // 8)),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_jpeg_progressive(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import image_ahash

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgjpgp:", b"", 1)  # 16 bytes; first 9 used

    def _to_jpeg(series):
        import numpy as np
        import pandas as pd

        from victorialogs_spark.datapipe.jpeg import encode_jpeg_progressive

        out = []
        for b in series:
            v = np.frombuffer(bytes(b), np.uint8, 9).astype(np.int64).reshape(3, 3)
            img = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
            out.append(encode_jpeg_progressive(img))
        return pd.Series(out)

    _to_jpeg.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_jpeg = F.pandas_udf(_to_jpeg, "binary")
    assets = docs.select("doc_id", to_jpeg(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_image_ahash_png16",
    # 16-BIT + ADAM7-INTERLACED PNG under the hash: each 16-bit sample
    # is (b<<8)|b from the md5 stream, so the decoder's high-byte
    # (>>8) conversion recovers b exactly and the oracle stays the
    # dp_image_ahash arithmetic with a new salt. Spark-side the image
    # is encoded with interlace=1 (7 Adam7 passes, per-pass filter
    # restart) and filters cycling 0-4 ACROSS passes, then decoded by
    # the stdlib inflate + pass-reassembly path — every unfilter branch
    # and every pass geometry exercised in one image.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgpng16:')} AS v"
    " FROM ids, UNNEST(range(1728)) AS u(i)),"
    " px AS (SELECT doc_id, i // 3 AS p,"
    " CAST(SUM(CASE WHEN i % 3 = 0 THEN 299 * v"
    " WHEN i % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000 AS gray"
    " FROM b GROUP BY 1, 2),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_png16(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import encode_png, image_ahash

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgpng16:", b"", 108)  # 1728 sample bytes

    def _to_png16(series):
        import numpy as np
        import pandas as pd

        out = []
        for b in series:
            b8 = np.frombuffer(bytes(b), np.uint8).reshape(24, 24, 3)
            px16 = (b8.astype(np.uint16) << 8) | b8  # high byte == b
            out.append(
                encode_png(px16, filter_types="cycle", bit_depth=16,
                           interlace=1)
            )
        return pd.Series(out)

    _to_png16.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_png16 = F.pandas_udf(_to_png16, "binary")
    assets = docs.select("doc_id", to_png16(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_image_ahash_png_palette",
    # PALETTE (PLTE) PNG under the hash — the common web-corpus shape
    # (icons, screenshots, charts): each doc's payload is a colortype-3
    # PNG at bit depth 4 (sub-byte indexes, leftmost pixel in the high
    # bits per RFC 2083 §2.3), Adam7-interlaced with filters cycling
    # 0-4 across passes — inflate, per-pass byte-wise unfilter, 4-bit
    # unpack, PLTE lookup, and pass reassembly all exercised in one
    # image. Bytes 0-47 of the md5 stream are the 16-color RGB palette,
    # bytes 48-623 the 576 per-pixel indexes (v % 16), so DuckDB
    # recomputes the expected pixels from first principles (palette
    # gray = (299R+587G+114B)//1000 joined by index) while Spark
    # decodes the REAL bitstream.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgpal:')} AS v"
    " FROM ids, UNNEST(range(624)) AS u(i)),"
    " pal AS (SELECT doc_id, i // 3 AS ci,"
    " CAST(SUM(CASE WHEN i % 3 = 0 THEN 299 * v"
    " WHEN i % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000 AS gray"
    " FROM b WHERE i < 48 GROUP BY 1, 2),"
    " px AS (SELECT b.doc_id, i - 48 AS p, pal.gray FROM b"
    " JOIN pal ON pal.doc_id = b.doc_id AND pal.ci = b.v % 16"
    " WHERE i >= 48),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_png_palette(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import (
        encode_png_palette,
        image_ahash,
    )

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgpal:", b"", 39)  # 48 palette + 576 index

    def _to_png_pal(series):
        import numpy as np
        import pandas as pd

        out = []
        for b in series:
            s = np.frombuffer(bytes(b), np.uint8, 624)
            pal = s[:48].reshape(16, 3)
            idx = (s[48:] % 16).astype(np.uint8).reshape(24, 24)
            out.append(
                encode_png_palette(idx, pal, bit_depth=4,
                                   filter_types="cycle", interlace=1)
            )
        return pd.Series(out)

    _to_png_pal.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_png_pal = F.pandas_udf(_to_png_pal, "binary")
    assets = docs.select("doc_id", to_png_pal(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_image_ahash_gif",
    # GIF under the hash — the dp_image_ahash_png_palette playbook
    # through the REAL GIF codec (gif.py: pure-Python variable-width
    # LZW, the only compression GIF has): bytes 0-47 of the md5 stream
    # are the 16-color palette, bytes 48-623 the 576 indexes (v % 16),
    # exactly the palette-PNG fixture shape, so DuckDB recomputes the
    # expected pixels arithmetically while Spark decodes a genuine
    # GIF89a bitstream — interlaced (4-pass row reorder), with Graphic
    # Control + Comment extension blocks to skip, and the color table
    # GLOBAL or LOCAL by the parity of the first index byte so both
    # placements decode in every run.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imggif:')} AS v"
    " FROM ids, UNNEST(range(624)) AS u(i)),"
    " pal AS (SELECT doc_id, i // 3 AS ci,"
    " CAST(SUM(CASE WHEN i % 3 = 0 THEN 299 * v"
    " WHEN i % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000 AS gray"
    " FROM b WHERE i < 48 GROUP BY 1, 2),"
    " px AS (SELECT b.doc_id, i - 48 AS p, pal.gray FROM b"
    " JOIN pal ON pal.doc_id = b.doc_id AND pal.ci = b.v % 16"
    " WHERE i >= 48),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_gif(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.gif import encode_gif
    from victorialogs_spark.datapipe.multimodal import image_ahash

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imggif:", b"", 39)  # 48 palette + 576 index

    def _to_gif(series):
        import numpy as np
        import pandas as pd

        out = []
        for b in series:
            s = np.frombuffer(bytes(b), np.uint8, 624)
            pal = s[:48].reshape(16, 3)
            idx = (s[48:] % 16).astype(np.uint8).reshape(24, 24)
            out.append(
                encode_gif(idx, pal, interlace=True,
                           local_palette=bool(s[48] % 2))
            )
        return pd.Series(out)

    _to_gif.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_gif = F.pandas_udf(_to_gif, "binary")
    assets = docs.select("doc_id", to_gif(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_gif_frame_ahash",
    # ANIMATED GIF frame sampling end to end (the MP4 playbook through
    # gif.py's compositing decoder): each doc's payload is a real
    # GIF89a animation — frame 0 a full 24x24 canvas, frames 1..n-1
    # 8x8 sub-rectangle patches at (8,8) with disposal "leave", so
    # every sampled frame k >= 1 is the base canvas with patch k
    # composited into the center (later patches overwrite earlier, the
    # disposal-1 semantics). Spark walks the 89a blocks, LZW-decodes
    # every frame, composites the canvas, samples the DISPLAYED frame
    # at t = j*250ms, and hashes the composite. DuckDB replicates it
    # arithmetically: md5 layout b[0]=frame-count selector,
    # b[1..n]=delays ((10 + v%20) cs -> x10 ms), b[6..53]=palette,
    # b[54..629]=base indexes, b[630+..]=patch indexes; frame choice =
    # max k with cumulative start <= t; composite gray = patch gray in
    # the center cells else base gray; aHash in exact integers.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':giffr:')} AS v"
    " FROM ids, UNNEST(range(886)) AS u(i)),"
    " nf AS (SELECT doc_id, 2 + (v % 4) AS n FROM b WHERE i = 0),"
    " del AS (SELECT b.doc_id, i - 1 AS k, (10 + (v % 20)) * 10 AS ms"
    " FROM b JOIN nf USING (doc_id) WHERE i >= 1 AND i <= nf.n),"
    " st AS (SELECT doc_id, k, ms, CAST(COALESCE(SUM(ms) OVER ("
    " PARTITION BY doc_id ORDER BY k"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    " AS fstart FROM del),"
    " tot AS (SELECT doc_id, CAST(SUM(ms) AS BIGINT) AS total"
    " FROM del GROUP BY 1),"
    " ts AS (SELECT doc_id, UNNEST(range(0, total, 250)) AS t FROM tot),"
    " sel AS (SELECT ts.doc_id, ts.t, MAX(st.k) AS k FROM ts"
    " JOIN st ON st.doc_id = ts.doc_id AND st.fstart <= ts.t GROUP BY 1, 2),"
    " selst AS (SELECT sel.doc_id, sel.t, sel.k, st.fstart FROM sel"
    " JOIN st ON st.doc_id = sel.doc_id AND st.k = sel.k),"
    " pal AS (SELECT doc_id, (i - 6) // 3 AS ci,"
    " CAST(SUM(CASE WHEN (i - 6) % 3 = 0 THEN 299 * v"
    " WHEN (i - 6) % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000"
    " AS gray FROM b WHERE i BETWEEN 6 AND 53 GROUP BY 1, 2),"
    " basepx AS (SELECT b.doc_id, i - 54 AS p, pal.gray FROM b"
    " JOIN pal ON pal.doc_id = b.doc_id AND pal.ci = b.v % 16"
    " WHERE i BETWEEN 54 AND 629),"
    " patchpx AS (SELECT b.doc_id, 1 + (i - 630) // 64 AS k,"
    " (i - 630) % 64 AS q, pal.gray FROM b"
    " JOIN pal ON pal.doc_id = b.doc_id AND pal.ci = b.v % 16"
    " WHERE i >= 630),"
    " comp AS (SELECT s.doc_id, s.t, s.k, s.fstart, bp.p,"
    " CASE WHEN s.k >= 1 AND (bp.p // 24) BETWEEN 8 AND 15"
    " AND (bp.p % 24) BETWEEN 8 AND 15 THEN pp.gray ELSE bp.gray END AS gray"
    " FROM selst s JOIN basepx bp ON bp.doc_id = s.doc_id"
    " LEFT JOIN patchpx pp ON pp.doc_id = s.doc_id AND pp.k = s.k"
    " AND pp.q = ((bp.p // 24) - 8) * 8 + ((bp.p % 24) - 8)),"
    " cells AS (SELECT doc_id, t, k, fstart,"
    " ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM comp"
    " GROUP BY 1, 2, 3, 4, 5),"
    " tots AS (SELECT doc_id, t, CAST(SUM(cs) AS BIGINT) AS tsum,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1, 2)"
    " SELECT c.doc_id, c.t AS frame_ts_ms, c.k AS frame_index,"
    " c.fstart AS frame_time_ms,"
    " string_agg(CASE WHEN cs * tn > tsum * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tots USING (doc_id, t) GROUP BY 1, 2, 3, 4",
)
def _dp_gif_frame_ahash(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.gif import (
        encode_gif_animation,
        gif_frame_sample,
    )

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":giffr:", b"", 56)  # 886 bytes used

    def _to_gif_anim(series):
        import numpy as np
        import pandas as pd

        out = []
        for buf in series:
            s = np.frombuffer(bytes(buf), np.uint8, 886)
            n = 2 + s[0] % 4
            delays = [10 + int(s[1 + k]) % 20 for k in range(n)]
            pal = s[6:54].reshape(16, 3)
            base = (s[54:630] % 16).astype(np.uint8).reshape(24, 24)
            frames = [
                {"indices": base, "delay_cs": delays[0], "disposal": 1}
            ]
            for k in range(1, n):
                patch = (
                    s[630 + 64 * (k - 1) : 630 + 64 * k] % 16
                ).astype(np.uint8).reshape(8, 8)
                frames.append(
                    {"indices": patch, "left": 8, "top": 8,
                     "delay_cs": delays[k], "disposal": 1}
                )
            out.append(encode_gif_animation(frames, pal))
        return pd.Series(out)

    _to_gif_anim.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_gif = F.pandas_udf(_to_gif_anim, "binary")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"), to_gif(raw).alias("payload")
    )
    return gif_frame_sample(assets, every_ms=250, id_col="asset_id").select(
        F.col("asset_id").cast("string").alias("doc_id"),
        "frame_ts_ms", "frame_index", "frame_time_ms", "ahash_bits",
    )


@register(
    "dp_image_ahash_tiff",
    # TIFF under the hash — the dp_image_ahash playbook through the
    # REAL baseline-TIFF codec (tiff.py: IFD walking, strips, the
    # TIFF-variant LZW — MSB-first, early change — plus the horizontal
    # predictor): the 1728 md5 stream bytes are the 24x24 RGB pixels,
    # Spark-side encoded with LZW + predictor 2 in THREE strips
    # (RowsPerStrip=8, so multi-strip reassembly is exercised) and the
    # byte order II or MM by the parity of the first pixel byte, so
    # both endiannesses decode in every run. DuckDB recomputes the
    # expected aHash arithmetically from the same md5 bytes; only
    # Spark runs the bitstream.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgtiff:')} AS v"
    " FROM ids, UNNEST(range(1728)) AS u(i)),"
    " px AS (SELECT doc_id, i // 3 AS p,"
    " CAST(SUM(CASE WHEN i % 3 = 0 THEN 299 * v"
    " WHEN i % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000 AS gray"
    " FROM b GROUP BY 1, 2),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_tiff(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import image_ahash
    from victorialogs_spark.datapipe.tiff import encode_tiff

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgtiff:", b"", 108)  # 1728 pixel bytes

    def _to_tiff(series):
        import numpy as np
        import pandas as pd

        out = []
        for b in series:
            px = np.frombuffer(bytes(b), np.uint8, 1728).reshape(24, 24, 3)
            out.append(
                encode_tiff(
                    px, compression=5, predictor=2, rows_per_strip=8,
                    byte_order="II" if px[0, 0, 0] % 2 == 0 else "MM",
                )
            )
        return pd.Series(out)

    _to_tiff.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_tiff = F.pandas_udf(_to_tiff, "binary")
    assets = docs.select("doc_id", to_tiff(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_image_ahash_tiff_gray",
    # SUB-BYTE GRAYSCALE TIFF under the hash — the scanned-archive
    # shape (4-bit samples, MSB-first within each byte, rows padded to
    # byte boundaries, PackBits, big-endian IFD): each md5 byte v maps
    # to sample v % 16 which the decoder scales x17 to 8-bit; grayscale
    # broadcasts to RGB so gray == the scaled sample exactly
    # ((299+587+114)g/1000 = g). DuckDB recomputes the expected aHash
    # arithmetically; only Spark runs the bitstream.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgtif4:')} AS v"
    " FROM ids, UNNEST(range(576)) AS u(i)),"
    " px AS (SELECT doc_id, i AS p, (v % 16) * 17 AS gray FROM b),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_tiff_gray(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import image_ahash
    from victorialogs_spark.datapipe.tiff import encode_tiff

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgtif4:", b"", 36)  # 576 sample bytes

    def _to_tiff4(series):
        import numpy as np
        import pandas as pd

        out = []
        for b in series:
            g = (
                np.frombuffer(bytes(b), np.uint8, 576) % 16
            ).astype(np.uint8).reshape(24, 24)
            out.append(
                encode_tiff(g, compression=32773, byte_order="MM",
                            bit_depth=4, rows_per_strip=8)
            )
        return pd.Series(out)

    _to_tiff4.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_tiff4 = F.pandas_udf(_to_tiff4, "binary")
    assets = docs.select("doc_id", to_tiff4(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_image_ahash_webp",
    # LOSSLESS WEBP under the hash — the dp_image_ahash playbook
    # through the REAL VP8L codec (webp.py: RIFF walk, LSB-first
    # bitstream, canonical prefix codes via the code-length-code
    # bootstrap, and the transform machinery): the 1728 md5 stream
    # bytes are the 24x24 RGB pixels, Spark-side encoded with the
    # subtract-green transform plus the spatial-predictor transform
    # whose mode is the first pixel byte % 14 — across 500 docs every
    # predictor mode decodes in every run, through real recursively
    # coded mode sub-images. DuckDB recomputes the expected aHash
    # arithmetically from the same md5 bytes; only Spark runs the
    # bitstream.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':imgwebp:')} AS v"
    " FROM ids, UNNEST(range(1728)) AS u(i)),"
    " px AS (SELECT doc_id, i // 3 AS p,"
    " CAST(SUM(CASE WHEN i % 3 = 0 THEN 299 * v"
    " WHEN i % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000 AS gray"
    " FROM b GROUP BY 1, 2),"
    " cells AS (SELECT doc_id, ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS ts,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1)"
    " SELECT c.doc_id, string_agg(CASE WHEN cs * tn > ts * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tot USING (doc_id) GROUP BY c.doc_id",
)
def _dp_image_ahash_webp(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import image_ahash
    from victorialogs_spark.datapipe.webp import encode_vp8l

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":imgwebp:", b"", 108)  # 1728 pixel bytes

    def _to_webp(series):
        import numpy as np
        import pandas as pd

        out = []
        for b in series:
            px = np.frombuffer(bytes(b), np.uint8, 1728).reshape(24, 24, 3)
            out.append(
                encode_vp8l(
                    px, subtract_green=True, predictor=int(px[0, 0, 0]) % 14
                )
            )
        return pd.Series(out)

    _to_webp.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_webp = F.pandas_udf(_to_webp, "binary")
    assets = docs.select("doc_id", to_webp(raw).alias("payload"))
    return image_ahash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "ahash_bits"
    )


@register(
    "dp_webp_frame_ahash",
    # ANIMATED WEBP frame sampling end to end (the GIF-animation
    # playbook through webp.py's compositing decoder): each doc's
    # payload is a real extended-format WebP animation — frame 0 a
    # full 24x24 VP8L canvas, frames 1..n-1 8x8 VP8L sub-rectangle
    # patches at (8,8) with dispose "leave" and blend "overwrite", so
    # every sampled frame k >= 1 is the base canvas with patch k
    # composited into the center. Spark walks VP8X/ANIM/ANMF, decodes
    # every VP8L frame bitstream, composites, samples the DISPLAYED
    # frame at t = j*250ms, and hashes the composite. DuckDB
    # replicates it arithmetically: md5 layout b[0]=frame-count
    # selector, b[1..n]=durations ((10 + v%20)*10 ms), b[6..1733]=
    # base 24x24 RGB, b[1734+..]=8x8 RGB patches; frame choice = max k
    # with cumulative start <= t; composite gray = patch gray in the
    # center cells else base gray; aHash in exact integers.
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':webpfr:')} AS v"
    " FROM ids, UNNEST(range(2502)) AS u(i)),"
    " nf AS (SELECT doc_id, 2 + (v % 4) AS n FROM b WHERE i = 0),"
    " del AS (SELECT b.doc_id, i - 1 AS k, (10 + (v % 20)) * 10 AS ms"
    " FROM b JOIN nf USING (doc_id) WHERE i >= 1 AND i <= nf.n),"
    " st AS (SELECT doc_id, k, ms, CAST(COALESCE(SUM(ms) OVER ("
    " PARTITION BY doc_id ORDER BY k"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    " AS fstart FROM del),"
    " tot AS (SELECT doc_id, CAST(SUM(ms) AS BIGINT) AS total"
    " FROM del GROUP BY 1),"
    " ts AS (SELECT doc_id, UNNEST(range(0, total, 250)) AS t FROM tot),"
    " sel AS (SELECT ts.doc_id, ts.t, MAX(st.k) AS k FROM ts"
    " JOIN st ON st.doc_id = ts.doc_id AND st.fstart <= ts.t GROUP BY 1, 2),"
    " selst AS (SELECT sel.doc_id, sel.t, sel.k, st.fstart FROM sel"
    " JOIN st ON st.doc_id = sel.doc_id AND st.k = sel.k),"
    " basepx AS (SELECT doc_id, (i - 6) // 3 AS p,"
    " CAST(SUM(CASE WHEN (i - 6) % 3 = 0 THEN 299 * v"
    " WHEN (i - 6) % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) // 1000"
    " AS gray FROM b WHERE i BETWEEN 6 AND 1733 GROUP BY 1, 2),"
    " patchpx AS (SELECT doc_id, 1 + (i - 1734) // 192 AS k,"
    " ((i - 1734) % 192) // 3 AS q,"
    " CAST(SUM(CASE WHEN (i - 1734) % 3 = 0 THEN 299 * v"
    " WHEN (i - 1734) % 3 = 1 THEN 587 * v ELSE 114 * v END) AS BIGINT)"
    " // 1000 AS gray FROM b WHERE i >= 1734 GROUP BY 1, 2, 3),"
    " comp AS (SELECT s.doc_id, s.t, s.k, s.fstart, bp.p,"
    " CASE WHEN s.k >= 1 AND (bp.p // 24) BETWEEN 8 AND 15"
    " AND (bp.p % 24) BETWEEN 8 AND 15 THEN pp.gray ELSE bp.gray END AS gray"
    " FROM selst s JOIN basepx bp ON bp.doc_id = s.doc_id"
    " LEFT JOIN patchpx pp ON pp.doc_id = s.doc_id AND pp.k = s.k"
    " AND pp.q = ((bp.p // 24) - 8) * 8 + ((bp.p % 24) - 8)),"
    " cells AS (SELECT doc_id, t, k, fstart,"
    " ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM comp"
    " GROUP BY 1, 2, 3, 4, 5),"
    " tots AS (SELECT doc_id, t, CAST(SUM(cs) AS BIGINT) AS tsum,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1, 2)"
    " SELECT c.doc_id, c.t AS frame_ts_ms, c.k AS frame_index,"
    " c.fstart AS frame_time_ms,"
    " string_agg(CASE WHEN cs * tn > tsum * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits"
    " FROM cells c JOIN tots USING (doc_id, t) GROUP BY 1, 2, 3, 4",
)
def _dp_webp_frame_ahash(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.webp import (
        encode_webp_anim,
        webp_frame_sample,
    )

    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    raw = _md5_stream_payload(":webpfr:", b"", 157)  # 2502 bytes used

    def _to_webp_anim(series):
        import numpy as np
        import pandas as pd

        out = []
        for buf in series:
            s = np.frombuffer(bytes(buf), np.uint8, 2502)
            n = 2 + s[0] % 4
            durs = [(10 + int(s[1 + k]) % 20) * 10 for k in range(n)]
            base = s[6:1734].reshape(24, 24, 3)
            frames = [{"px": base, "duration_ms": durs[0]}]
            for k in range(1, n):
                patch = s[1734 + 192 * (k - 1) : 1734 + 192 * k].reshape(
                    8, 8, 3
                )
                frames.append(
                    {"px": patch, "x": 8, "y": 8, "duration_ms": durs[k]}
                )
            out.append(encode_webp_anim(frames, (24, 24)))
        return pd.Series(out)

    _to_webp_anim.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_anim = F.pandas_udf(_to_webp_anim, "binary")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"), to_anim(raw).alias("payload")
    )
    return webp_frame_sample(assets, every_ms=250, id_col="asset_id").select(
        F.col("asset_id").cast("string").alias("doc_id"),
        "frame_ts_ms", "frame_index", "frame_time_ms", "ahash_bits",
    )


@register(
    "dp_mp4_frame_ahash",
    # REAL VIDEO FRAME DECODE: MJPEG-in-MP4 end to end with zero new
    # dependencies — each doc's payload is a genuine ISO-BMFF file
    # (codec fourcc mjpa) whose n = 4 + b0 % 5 samples are standalone
    # flat-block JPEGs (frame k's 9 block greys = md5 bytes 16+9k ..
    # 16+9k+8; even frames baseline-encoded, odd frames PROGRESSIVE, so
    # the seek path exercises both decoders). Spark walks the boxes,
    # seeks the latest keyframe (k % 3 = 0) at or before each t =
    # j*500ms, EXTRACTS the coded sample, DECODES it via jpeg.py, and
    # hashes the pixels. DuckDB replicates every step arithmetically:
    # sample-table seek from the duration bytes, flat-block JPEG decode
    # as clamp(floor((floor(8(v-128)/17+0.5)*17+4)/8)+128), aHash in
    # exact integers. (sample_size is intentionally not emitted: the
    # JPEG byte length is entropy-coding detail, not sample-table math.)
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents"
    " WHERE doc_id % 3 = 1),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':mjpg:')} AS v"
    " FROM ids, UNNEST(range(96)) AS u(i)),"
    " n0 AS (SELECT doc_id, 4 + (v % 5) AS ns FROM b WHERE i = 0),"
    " s AS (SELECT b.doc_id, i - 1 AS k, 100 + v AS dur FROM b"
    " JOIN n0 USING (doc_id) WHERE i BETWEEN 1 AND ns),"
    " t AS (SELECT doc_id, k, dur, COALESCE(SUM(dur) OVER ("
    " PARTITION BY doc_id ORDER BY k"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st FROM s),"
    " tot AS (SELECT doc_id, SUM(dur) AS total FROM s GROUP BY doc_id),"
    " frames AS (SELECT doc_id, CAST(u.i * 500 AS BIGINT) AS ts FROM tot,"
    " UNNEST(range(0, CAST(CEIL(total / 500.0) AS BIGINT))) AS u(i)),"
    " key AS (SELECT doc_id, k, st FROM t WHERE k % 3 = 0),"
    " selk AS (SELECT f.doc_id, f.ts, MAX(key.k) AS k FROM frames f"
    " JOIN key ON key.doc_id = f.doc_id AND key.st <= f.ts GROUP BY 1, 2),"
    " e AS (SELECT b.doc_id, CAST((i - 16) // 9 AS BIGINT) AS k,"
    " (i - 16) % 9 AS blk, LEAST(GREATEST(CAST(FLOOR(("
    " CAST(FLOOR(8.0 * (v - 128) / 17.0 + 0.5) AS BIGINT) * 17 + 4) / 8.0)"
    " AS BIGINT) + 128, 0), 255) AS gray FROM b JOIN n0 USING (doc_id)"
    " WHERE i >= 16 AND i < 16 + 9 * ns AND ((i - 16) // 9) % 3 = 0),"
    " px AS (SELECT e.doc_id, e.k, u.i AS p, e.gray FROM e,"
    " UNNEST(range(576)) AS u(i)"
    " WHERE e.blk = ((u.i // 24) // 8) * 3 + ((u.i % 24) // 8)),"
    " cells AS (SELECT doc_id, k,"
    " ((p // 24) * 8 // 24) * 8 + (p % 24) * 8 // 24 AS cell,"
    " CAST(SUM(gray) AS BIGINT) AS cs, COUNT(*) AS cn FROM px"
    " GROUP BY 1, 2, 3),"
    " tots AS (SELECT doc_id, k, CAST(SUM(cs) AS BIGINT) AS tsum,"
    " CAST(SUM(cn) AS BIGINT) AS tn FROM cells GROUP BY 1, 2),"
    " hashes AS (SELECT c.doc_id, c.k, string_agg("
    " CASE WHEN cs * tn > tsum * cn THEN '1' ELSE '0' END,"
    " '' ORDER BY cell) AS ahash_bits FROM cells c"
    " JOIN tots USING (doc_id, k) GROUP BY c.doc_id, c.k)"
    " SELECT CAST(selk.doc_id AS BIGINT) AS asset_id,"
    " selk.ts AS frame_ts_ms, CAST(selk.k AS BIGINT) AS sample_index,"
    " CAST(t.st AS BIGINT) AS sample_time_ms, h.ahash_bits AS ahash_bits"
    " FROM selk JOIN t ON t.doc_id = selk.doc_id AND t.k = selk.k"
    " JOIN hashes h ON h.doc_id = selk.doc_id AND h.k = selk.k",
)
def _dp_mp4_frame_ahash(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.mp4 import video_frame_sample

    docs = (
        _spread(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 1)
    )
    raw = _md5_stream_payload(":mjpg:", b"", 6)  # 96 deterministic bytes

    def _to_mjpeg_mp4(series):
        import numpy as np
        import pandas as pd

        from victorialogs_spark.datapipe.jpeg import (
            encode_jpeg,
            encode_jpeg_progressive,
        )
        from victorialogs_spark.datapipe.mp4 import build_mp4

        out = []
        for buf in series:
            raw_b = bytes(buf)
            n = 4 + raw_b[0] % 5
            durs = [100 + raw_b[1 + k] for k in range(n)]
            payloads = []
            for k in range(n):
                v = np.frombuffer(
                    raw_b, np.uint8, 9, 16 + 9 * k
                ).astype(np.int64).reshape(3, 3)
                img = np.repeat(
                    np.repeat(v, 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                enc = encode_jpeg_progressive if k % 2 else encode_jpeg
                payloads.append(enc(img))
            out.append(
                build_mp4(payloads, durs, sync_every=3, codec=b"mjpa")
            )
        return pd.Series(out)

    _to_mjpeg_mp4.__annotations__ = {"series": pd.Series, "return": pd.Series}
    to_mp4 = F.pandas_udf(_to_mjpeg_mp4, "binary")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"), to_mp4(raw).alias("payload")
    )
    return video_frame_sample(assets, every_ms=500, decode=True).select(
        "asset_id", "frame_ts_ms", "sample_index", "sample_time_ms",
        "ahash_bits",
    )


@register(
    "dp_audio_zcr",
    # integer-exact oracle twin of dp_audio_fingerprint: 864 int16 LE
    # samples from an md5 stream, wrapped in a canonical 44-byte WAV
    # header that Spark REALLY decodes via stdlib wave; the features
    # (zero crossings, total |sample|) are integers, so DuckDB's
    # byte-level replica must agree exactly
    "WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),"
    f" b AS (SELECT doc_id, i, {_md5_byte(':aud:')} AS v"
    " FROM ids, UNNEST(range(1728)) AS u(i)),"
    " sm AS (SELECT doc_id, i // 2 AS j,"
    " CAST(SUM(CASE WHEN i % 2 = 0 THEN v ELSE 256 * v END) AS BIGINT) AS u"
    " FROM b GROUP BY 1, 2),"
    " ss AS (SELECT doc_id, j,"
    " u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS s FROM sm),"
    " lg AS (SELECT doc_id, s, LAG(s) OVER (PARTITION BY doc_id ORDER BY j) AS ps"
    " FROM ss)"
    " SELECT doc_id, CAST(864 AS BIGINT) AS n_samples,"
    " CAST(SUM(CASE WHEN ps IS NOT NULL AND ((ps >= 0) <> (s >= 0))"
    " THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,"
    " CAST(SUM(ABS(s)) AS BIGINT) AS total_abs"
    " FROM lg GROUP BY doc_id",
)
def _dp_audio_zcr(spark, sf_dir):
    import struct

    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import audio_zcr_energy

    header = (
        b"RIFF" + struct.pack("<I", 36 + 1728) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 1728)
    )
    docs = _spread(spark, sf_dir, "documents").select("doc_id")
    payload = _md5_stream_payload(":aud:", header, 108)
    assets = docs.select("doc_id", payload.alias("payload"))
    return audio_zcr_energy(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "n_samples",
        "zero_crossings",
        "total_abs",
    )


@register(
    "dp_pca_moments",
    # oracle twin #1 for the PCA fit: the distributed moment partials'
    # per-dimension mean and population variance must equal plain
    # AVG/VAR_POP over the unnested vectors (6dp; IEEE order differs at
    # ~1e-13 relative, far below the rounding grid)
    "WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings"
    " WHERE embedding IS NOT NULL AND len(embedding) = 64"
    " AND len(list_filter(embedding::DOUBLE[],"
    " x -> x IS NULL OR isnan(x) OR isinf(x))) = 0)"
    " SELECT CAST(i AS INT) AS dim, ROUND(AVG(v[i + 1]), 6) AS mean_6dp,"
    " ROUND(VAR_POP(v[i + 1]), 6) AS var_6dp"
    " FROM e, UNNEST(range(64)) AS u(i) GROUP BY i",
)
def _dp_pca_moments(spark, sf_dir):
    from victorialogs_spark.datapipe.similarity import pca_fit_model

    emb = _table(spark, sf_dir, "embeddings")
    m = pca_fit_model(emb, "embedding", k=8, dim=64)
    rows = [
        (i, round(m["mean"][i], 6), round(m["cov_diag"][i], 6))
        for i in range(m["d"])
    ]
    return spark.createDataFrame(
        rows, "dim int, mean_6dp double, var_6dp double"
    )


@register(
    "dp_pca_check",
    # oracle twin #2 for the PCA fit: sum of ALL eigenvalues from the
    # driver eigensolve must equal the covariance trace = SUM(VAR_POP)
    # over dimensions (a genuine cross-engine identity linking the
    # eigensolve to SQL-computable moments), and the k=8 component rows
    # must be orthonormal (||C C^T - I||_F = 0 at 9dp)
    "WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings"
    " WHERE embedding IS NOT NULL AND len(embedding) = 64"
    " AND len(list_filter(embedding::DOUBLE[],"
    " x -> x IS NULL OR isnan(x) OR isinf(x))) = 0),"
    " d AS (SELECT i, VAR_POP(v[i + 1]) AS vv"
    " FROM e, UNNEST(range(64)) AS u(i) GROUP BY i)"
    " SELECT CAST(64 AS BIGINT) AS n_dims, ROUND(SUM(vv), 6) AS trace_6dp,"
    " CAST(0.0 AS DOUBLE) AS ortho_err_9dp FROM d",
)
def _dp_pca_check(spark, sf_dir):
    import numpy as np

    from victorialogs_spark.datapipe.similarity import pca_fit_model

    emb = _table(spark, sf_dir, "embeddings")
    m = pca_fit_model(emb, "embedding", k=8, dim=64)
    C = np.asarray(m["components"])
    ortho_err = float(np.sqrt(((C @ C.T - np.eye(C.shape[0])) ** 2).sum()))
    trace = round(float(sum(m["eigenvalues"])), 6)
    return spark.createDataFrame(
        [(int(m["d"]), trace, round(ortho_err, 9))],
        "n_dims long, trace_6dp double, ortho_err_9dp double",
    )


@register(
    "dp_semdedup",
    # SemDeDup-style semantic dedup, deterministic min-id-leader variant:
    # axis-aligned sign-bit buckets (exact cross-engine: sign of a stored
    # float32), pair cosine ROUNDed to 9dp before the threshold on both
    # engines (knn_label_purity recipe), dup_of = smallest qualifying
    # smaller id. Incomparable vectors (wrong len / zero norm) kept.
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
    " WHERE vec_id IS NOT NULL),"
    # NULL-element exclusion mirrors Spark exactly: the engine's norm2
    # fold nulls out on a NULL element (row incomparable -> kept), while
    # DuckDB's list_sum would skip NULLs like SUM and keep comparing
    " c AS (SELECT vec_id, v, CAST(list_sum(list_transform(range(8),"
    " j -> CASE WHEN v[j + 1] > 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS b"
    " FROM e WHERE len(v) = 64"
    " AND len(list_filter(v, x -> x IS NULL)) = 0"
    " AND list_sum(list_transform(v, x -> x * x)) > 0),"
    " p AS (SELECT b2.vec_id AS bid, MIN(a.vec_id) AS dup_of"
    " FROM c a JOIN c b2 ON a.b = b2.b AND a.vec_id < b2.vec_id"
    " WHERE FLOOR(list_cosine_similarity(a.v, b2.v) * 1e9 + 0.5) / 1e9 >= 0.30"
    " GROUP BY b2.vec_id)"
    " SELECT e.vec_id, dup_of IS NULL AS kept, dup_of"
    " FROM e LEFT JOIN p ON p.bid = e.vec_id",
)
def _dp_semdedup(spark, sf_dir):
    from victorialogs_spark.datapipe.similarity import semantic_dedup

    emb = _table(spark, sf_dir, "embeddings")
    # 0.30: the synthetic embeddings' cluster structure is loose (the
    # all-pairs cosine max is ~0.51), so the production default 0.85
    # would be vacuously all-kept here; 0.30 exercises real drops
    return semantic_dedup(
        emb, "vec_id", "embedding", dim=64, threshold=0.30, n_sign_bits=8
    )


@register(
    "dp_semdedup_auto",
    # Same semantics as dp_semdedup but with the SCALE dial turned: bits
    # are not pinned — the oracle re-derives the operator's
    # scale-adaptive bit count (smallest bits in [4,24] with
    # count <= 64 << bits, integer-exact mirror of the Python loop in
    # similarity.semantic_dedup) and buckets with exactly that many
    # sign bits. Proves auto-bucketing is cross-engine deterministic,
    # not just documented.
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
    " WHERE vec_id IS NOT NULL),"
    " nb AS (SELECT COALESCE(MIN(bits), 24) AS bits FROM"
    " (SELECT UNNEST(range(4, 25)) AS bits),"
    " (SELECT COUNT(*) AS cnt FROM embeddings)"
    " WHERE cnt <= 64 * (1::BIGINT << bits)),"
    " c AS (SELECT vec_id, v, CAST(list_sum(list_transform("
    " range((SELECT bits FROM nb)),"
    " j -> CASE WHEN v[j + 1] > 0 THEN 1 << j ELSE 0 END)) AS BIGINT) AS b"
    " FROM e WHERE len(v) = 64"
    " AND len(list_filter(v, x -> x IS NULL)) = 0"
    " AND list_sum(list_transform(v, x -> x * x)) > 0),"
    " p AS (SELECT b2.vec_id AS bid, MIN(a.vec_id) AS dup_of"
    " FROM c a JOIN c b2 ON a.b = b2.b AND a.vec_id < b2.vec_id"
    " WHERE FLOOR(list_cosine_similarity(a.v, b2.v) * 1e9 + 0.5) / 1e9 >= 0.30"
    " GROUP BY b2.vec_id)"
    " SELECT e.vec_id, dup_of IS NULL AS kept, dup_of"
    " FROM e LEFT JOIN p ON p.bid = e.vec_id",
)
def _dp_semdedup_auto(spark, sf_dir):
    from victorialogs_spark.datapipe.similarity import semantic_dedup

    emb = _table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, "vec_id", "embedding", dim=64, threshold=0.30)


@register(
    "dp_frame_sample",
    # video frame-sampling plan (multimodal.frame_sample_plan): videos =
    # doc_id % 3 == 2 (assets_from_documents), fake-decode duration =
    # 1000 + md5(payload) bytes [2:4] big-endian (hex chars 5..8 via the
    # winnowing shift-sum recipe — POW would round through doubles), one
    # row per planned 500 ms frame timestamp, >= 1 frame per video.
    # Spark truncates (duration/500).cast(int); FLOOR matches for the
    # positive durations (DuckDB's double->INT cast rounds instead)
    "WITH v AS (SELECT doc_id AS asset_id, md5(text) AS h FROM documents"
    " WHERE doc_id % 3 = 2),"
    " d AS (SELECT asset_id, 1000 + CAST(list_sum(list_transform(range(4),"
    " j -> CAST(strpos('0123456789abcdef', substr(h, 5 + j, 1)) - 1 AS BIGINT)"
    " * (CAST(1 AS BIGINT) << (4 * (3 - j))))) AS BIGINT) AS dur FROM v),"
    " n AS (SELECT asset_id, GREATEST(CAST(FLOOR(dur / 500.0) AS INT), 1)"
    " AS nf FROM d)"
    " SELECT asset_id, CAST(i * 500 AS INT) AS frame_ts_ms"
    " FROM n, UNNEST(range(0, nf)) AS u(i)",
)
def _dp_frame_sample(spark, sf_dir):
    from victorialogs_spark.datapipe.multimodal import (
        assets_from_documents,
        frame_sample_plan,
    )

    docs = _table(spark, sf_dir, "documents")
    return frame_sample_plan(assets_from_documents(docs), every_ms=500)


@register("dp_image_phash")  # rows-only: 2-D DCT isn't SQL-reproducible
def _dp_image_phash(spark, sf_dir):
    """Deterministic P6 payloads rendered from document text (24x24 RGB =
    1728 bytes of rpad'ed text), hashed with the DCT perceptual hash —
    drives the real decode→resample→DCT path on the driver's corpus."""
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import image_phash

    docs = _spread(spark, sf_dir, "documents")
    body = F.encode(
        F.substring(F.rpad(F.coalesce(F.col("text"), F.lit("")), 1728, "x"), 1, 1728),
        "UTF-8",
    )
    assets = docs.select(
        F.col("doc_id"),
        F.concat(F.lit(b"P6\n24 24\n255\n"), body).alias("payload"),
    )
    return image_phash(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "phash"
    )


@register("dp_audio_fingerprint")  # rows-only: FFT isn't SQL-reproducible
def _dp_audio_fingerprint(spark, sf_dir):
    """Deterministic WAV payloads synthesized from document text (each
    byte = one int16 sample, 8 kHz mono), run through the spectral
    fingerprint — drives the real WAV decode→FFT→band-vote path."""
    import io
    import struct
    import wave

    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.multimodal import audio_fingerprint

    def _wav(s):
        out = []
        for text in s.tolist():
            data = ((text or "").encode("utf-8", "replace") * 40)[:4000]
            pcm = b"".join(
                struct.pack("<h", (b - 128) * 200) for b in data
            )
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(pcm)
            out.append(buf.getvalue())
        return pd.Series(out, dtype="object")

    _wav.__annotations__ = {"s": pd.Series, "return": pd.Series}
    wav_udf = F.pandas_udf(_wav, "binary")
    docs = _spread(spark, sf_dir, "documents")
    assets = docs.select("doc_id", wav_udf(F.col("text")).alias("payload"))
    return audio_fingerprint(assets, "doc_id").select(
        F.col("doc_id").cast("string").alias("doc_id"), "afp"
    )


@register(
    "dp_simhash_md5",
    # oracle-checked SimHash variant (md5 token hash, bitstring output):
    # bit b of a token's hash = bit (7-b%8) of md5 byte b//8, per-bit
    # vote summed over the token MULTISET, '1' iff the vote is positive
    "WITH toks AS (SELECT doc_id, t FROM documents,"
    " UNNEST(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0b]+')) AS u(t)"
    " WHERE t <> ''),"
    " tb AS (SELECT doc_id, b, CASE WHEN"
    " ((16 * (strpos('0123456789abcdef', substr(md5(t), 1 + 2*(b // 8), 1)) - 1)"
    "  + (strpos('0123456789abcdef', substr(md5(t), 2 + 2*(b // 8), 1)) - 1))"
    "  // CAST(POW(2, 7 - (b % 8)) AS BIGINT)) % 2 = 1"
    " THEN 1 ELSE -1 END AS v"
    " FROM toks, UNNEST(range(64)) AS u(b)),"
    " agg AS (SELECT doc_id, b, SUM(v) AS sv FROM tb GROUP BY 1, 2)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
    " string_agg(CASE WHEN sv > 0 THEN '1' ELSE '0' END, '' ORDER BY b)"
    " AS simhash_bits FROM agg GROUP BY doc_id",
)
def _dp_simhash_md5(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.dedup import simhash_md5_bitstring

    docs = _spread(spark, sf_dir, "documents")
    return simhash_md5_bitstring(docs, "doc_id", "text").select(
        F.col("doc_id").cast("string").alias("doc_id"), "simhash_bits"
    )


@register(
    "dp_unigram_logprob",
    # corpus-relative unigram log-prob (perplexity-style filter):
    # per-token lns round to 9dp and sum as DECIMAL(38,9) so the mean is
    # exact + order-independent in any engine
    f"WITH toks AS (SELECT doc_id, t AS tok FROM documents,"
    f" UNNEST(regexp_split_to_array({_NORM}, '[ \\t\\n\\r\\f\\x0b]+')) AS u(t)"
    " WHERE t <> ''),"
    " freq AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),"
    " tot AS (SELECT COUNT(*) AS n FROM toks),"
    " per AS (SELECT doc_id, COUNT(*) AS cnt,"
    " SUM(CAST(ROUND(LN(CAST(tf AS DOUBLE)), 9) AS DECIMAL(38,9))) AS s"
    " FROM toks JOIN freq USING (tok) GROUP BY doc_id)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(cnt AS BIGINT) AS n_tokens,"
    " ROUND(CAST(s AS DOUBLE) / cnt - LN(CAST(n AS DOUBLE)), 6) AS logprob"
    " FROM per, tot",
)
def _dp_unigram_logprob(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.quality import unigram_logprob

    docs = _table(spark, sf_dir, "documents")
    return unigram_logprob(docs, "doc_id", "text").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "n_tokens",
        "logprob",
    )


@register(
    "dp_perplexity_buckets",
    # CCNet head/middle/tail bucketing: unigram logprob terciles as fixed
    # broadcast thresholds. quantile_cont shares Spark percentile's
    # 1+p(n-1) interpolation; scores are 6dp-rounded before the cut so
    # both engines interpolate identical inputs.
    f"WITH toks AS (SELECT doc_id, t AS tok FROM documents,"
    f" UNNEST(regexp_split_to_array({_NORM}, '[ \\t\\n\\r\\f\\x0b]+')) AS u(t)"
    " WHERE t <> ''),"
    " freq AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),"
    " tot AS (SELECT COUNT(*) AS n FROM toks),"
    " per AS (SELECT doc_id, COUNT(*) AS cnt,"
    " SUM(CAST(ROUND(LN(CAST(tf AS DOUBLE)), 9) AS DECIMAL(38,9))) AS s"
    " FROM toks JOIN freq USING (tok) GROUP BY doc_id),"
    " sc AS (SELECT doc_id, CAST(cnt AS BIGINT) AS n_tokens,"
    " ROUND(CAST(s AS DOUBLE) / cnt - LN(CAST(n AS DOUBLE)), 6) AS logprob"
    " FROM per, tot),"
    " cuts AS (SELECT quantile_cont(logprob, 1.0/3.0) AS c1,"
    " quantile_cont(logprob, 2.0/3.0) AS c2 FROM sc)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id, n_tokens, logprob,"
    " CASE WHEN logprob > c2 THEN 'head' WHEN logprob > c1 THEN 'middle'"
    " ELSE 'tail' END AS bucket FROM sc, cuts",
)
def _dp_perplexity_buckets(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.quality import perplexity_buckets

    docs = _table(spark, sf_dir, "documents")
    out = perplexity_buckets(docs, "doc_id", "text")
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "n_tokens",
        "logprob",
        "bucket",
    )


@register(
    "dp_dsir_weights",
    # DSIR unigram importance log-weights: target = zh docs, source = the
    # whole corpus. One ln of one IEEE quotient per token, rounded 9dp,
    # summed as DECIMAL(38,9) → order-independent exact mean (6dp out).
    # Parenthesization of the smoothed ratio mirrors the Spark expression
    # term-for-term so both engines hit identical IEEE intermediates.
    f"WITH stoks AS (SELECT doc_id, t AS tok FROM documents,"
    f" UNNEST(regexp_split_to_array({_NORM}, '[ \\t\\n\\r\\f\\x0b]+')) AS u(t)"
    " WHERE t <> ''),"
    f" ttoks AS (SELECT t AS tok FROM documents,"
    f" UNNEST(regexp_split_to_array({_NORM}, '[ \\t\\n\\r\\f\\x0b]+')) AS u(t)"
    " WHERE lang = 'zh' AND t <> ''),"
    " sfq AS (SELECT tok, COUNT(*) AS sf FROM stoks GROUP BY tok),"
    " tfq AS (SELECT tok, COUNT(*) AS tf FROM ttoks GROUP BY tok),"
    " v AS (SELECT tok, COALESCE(sf, 0) AS sf, COALESCE(tf, 0) AS tf"
    " FROM sfq FULL OUTER JOIN tfq USING (tok)),"
    " tot AS (SELECT SUM(sf) AS ns, SUM(tf) AS nt, COUNT(*) AS vc FROM v),"
    " r AS (SELECT tok, ROUND(LN((CAST(tf + 1 AS DOUBLE) *"
    " CAST(ns + vc AS DOUBLE)) / (CAST(sf + 1 AS DOUBLE) *"
    " CAST(nt + vc AS DOUBLE))), 9) AS lr FROM v, tot),"
    " per AS (SELECT doc_id, COUNT(*) AS cnt,"
    " SUM(CAST(lr AS DECIMAL(38,9))) AS s"
    " FROM stoks JOIN r USING (tok) GROUP BY doc_id)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(cnt AS BIGINT)"
    " AS n_tokens, ROUND(CAST(s AS DOUBLE) / cnt, 6) AS dsir_logweight"
    " FROM per",
)
def _dp_dsir_weights(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.sampling import dsir_logweights

    docs = _table(spark, sf_dir, "documents")
    out = dsir_logweights(docs, docs.where(F.col("lang") == "zh"),
                          "doc_id", "text")
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "n_tokens",
        "dsir_logweight",
    )


@register(
    "dp_tfidf_terms",
    # top-5 TF-IDF terms per doc: smoothed sklearn-style idf; ORDER uses
    # the raw double (a count times one ln — IEEE-identical per engine),
    # the EMITTED score rounds to 6dp like the other ln-valued entries
    f"WITH toks AS (SELECT doc_id, t AS term FROM documents,"
    f" UNNEST(regexp_split_to_array({_NORM}, '[ \\t\\n\\r\\f\\x0b]+')) AS u(t)"
    " WHERE t <> ''),"
    " tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),"
    " dfq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY 1),"
    " n AS (SELECT COUNT(*) AS n FROM documents),"
    " s AS (SELECT doc_id, term, tf, CAST(tf AS DOUBLE) *"
    " (LN(CAST(n + 1 AS DOUBLE) / CAST(dfc + 1 AS DOUBLE)) + 1.0) AS tfidf"
    " FROM tf JOIN dfq USING (term) CROSS JOIN n),"
    " r AS (SELECT doc_id, term, tf, tfidf, ROW_NUMBER() OVER"
    " (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk FROM s)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id, term, CAST(tf AS BIGINT)"
    ' AS tf, ROUND(tfidf, 6) AS tfidf, CAST(rnk AS INT) AS "rank"'
    " FROM r WHERE rnk <= 5",
)
def _dp_tfidf_terms(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.text import tfidf_top_terms

    docs = _table(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, "doc_id", "text", k=5)
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "term",
        "tf",
        F.round("tfidf", 6).alias("tfidf"),
        "rank",
    )


@register(
    "dp_bigram_logprob",
    # corpus-relative bigram log-prob (KenLM-style fluency signal):
    # P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V) where c(w1) counts w1 occurrences
    # that have a successor; same decimal-sum determinism as unigram
    f"WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
    f"{_NORM}, '[ \\t\\n\\r\\f\\x0b]+'), x -> x <> '') AS t FROM documents),"
    " p AS (SELECT doc_id, UNNEST(t[1:len(t)-1]) AS w1,"
    " UNNEST(t[2:len(t)]) AS w2 FROM toks WHERE len(t) >= 2),"
    " pf AS (SELECT w1, w2, COUNT(*) AS pf FROM p GROUP BY w1, w2),"
    " uf AS (SELECT w1, COUNT(*) AS uf FROM p GROUP BY w1),"
    " v AS (SELECT COUNT(DISTINCT x) AS v FROM"
    " (SELECT UNNEST(t) AS x FROM toks)),"
    " r AS (SELECT w1, w2, ROUND(LN(CAST(pf + 1 AS DOUBLE) /"
    " CAST(uf + v AS DOUBLE)), 9) AS lr FROM pf JOIN uf USING (w1), v),"
    " per AS (SELECT doc_id, COUNT(*) AS cnt,"
    " SUM(CAST(lr AS DECIMAL(38,9))) AS s"
    " FROM p JOIN r USING (w1, w2) GROUP BY doc_id)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id, CAST(cnt AS BIGINT)"
    " AS n_bigrams, ROUND(CAST(s AS DOUBLE) / cnt, 6) AS bigram_logprob"
    " FROM per",
)
def _dp_bigram_logprob(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.quality import bigram_logprob

    docs = _table(spark, sf_dir, "documents")
    return bigram_logprob(docs, "doc_id", "text").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "n_bigrams",
        "bigram_logprob",
    )


@register(
    "dp_shuffle_shards",
    # deterministic corpus shuffle: md5(key || ':seed') orders rows,
    # 2-hex-char prefix = shard, dense position per shard — shards in
    # shard order reproduce the permutation (datapipe/packing.py)
    "WITH h AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
    " md5(CAST(doc_id AS VARCHAR) || ':7') AS hh FROM documents)"
    " SELECT doc_id, substr(hh, 1, 2) AS shard,"
    " CAST(ROW_NUMBER() OVER (PARTITION BY substr(hh, 1, 2)"
    " ORDER BY hh) AS BIGINT) AS shuffle_pos FROM h",
)
def _dp_shuffle_shards(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.packing import shuffle_shards

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, "doc_id", seed=7).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "shard",
        F.col("shuffle_pos").cast("long").alias("shuffle_pos"),
    )


@register(
    "dp_pack_sequences",
    # context-window packing: docs in deterministic shuffled order, cut
    # into 512-cost-unit sequences per shard (cost = n_chars here);
    # a doc belongs to the sequence its first unit lands in
    "WITH h AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, n_chars,"
    " md5(CAST(doc_id AS VARCHAR) || ':3') AS hh FROM documents),"
    " s AS (SELECT doc_id, n_chars, substr(hh, 1, 2) AS shard,"
    " SUM(n_chars) OVER (PARTITION BY substr(hh, 1, 2) ORDER BY hh"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS st"
    " FROM h)"
    " SELECT doc_id, shard, CAST(FLOOR(st / 512) AS BIGINT) AS seq,"
    " CAST(st % 512 AS BIGINT) AS seq_offset,"
    " CAST(n_chars AS BIGINT) AS n_chars FROM s",
)
def _dp_pack_sequences(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.packing import pack_sequences

    docs = _table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = pack_sequences(docs, "doc_id", "n_chars", budget=512, seed=3)
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "shard",
        "seq",
        "seq_offset",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@register(
    "dp_redact_pii",
    # the synthetic corpus carries no PII, so the entry constructs a row
    # with email/ipv4 shapes from typed columns and scrubs it; the same
    # regex battery runs in DuckDB (patterns are Java-regex/RE2 portable)
    "SELECT CAST(event_id AS VARCHAR) AS event_id,"
    " regexp_replace(regexp_replace("
    "   'reach u' || user_id || '@corp.example or 10.0.' || (user_id % 200) || '.7',"
    "   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),"
    "   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g')"
    " AS t FROM events",
)
def _dp_redact_pii(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.text import redact_pii

    ev = _table(spark, sf_dir, "events")
    raw = F.concat(
        F.lit("reach u"), F.col("user_id").cast("string"),
        F.lit("@corp.example or 10.0."),
        (F.col("user_id") % 200).cast("string"), F.lit(".7"),
    )
    return ev.select(
        F.col("event_id").cast("string").alias("event_id"),
        redact_pii(raw, ["email", "ipv4"]).alias("t"),
    )


@register(
    "dp_decontaminate",
    # benchmark decontamination: drop even-id docs whose normalized
    # content also appears among odd-id docs (fingerprint anti-join);
    # NULL text reads as empty content on both sides
    f"WITH f AS (SELECT doc_id, md5({_NORM_NN}) AS fp FROM documents)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM f"
    " WHERE doc_id % 2 = 0 AND fp NOT IN"
    " (SELECT fp FROM f WHERE doc_id % 2 = 1)",
)
def _dp_decontaminate(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.sampling import decontaminate

    docs = _table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    heldout = docs.where(F.col("doc_id") % 2 == 1)
    return decontaminate(train, heldout, "text").select(
        F.col("doc_id").cast("string").alias("doc_id")
    )


@register(
    "dp_stream_exact_dedup",
    # one availableNow pass over a bounded source ≡ the batch group-dedup:
    # min-string-doc_id representative per fingerprint + copy count
    f"WITH n AS (SELECT CAST(doc_id AS VARCHAR) AS did, text, {_NORM} AS s"
    " FROM documents)"
    " SELECT md5(s) AS fp, MIN(did) AS doc_id, arg_min(text, did) AS text,"
    " COUNT(*) AS n_copies FROM n GROUP BY 1",
)
def _dp_stream_exact_dedup(spark, sf_dir):
    """Streaming stateful dedup (applyInPandasWithState) checked against
    the batch semantics: over a bounded source, first-occurrence-wins
    equals group-by-fingerprint with the min doc_id representative."""
    import tempfile
    import uuid

    from victorialogs_spark.streaming.dedup import stream_exact_dedup

    name = "sded_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="vl_sded_")
    # the file stream source monitors directories (or globs) — a direct
    # file path is rejected; this glob matches only the documents table
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{sf_dir}/documents.*"
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # a partial memory table would be a flaky oracle FAIL and the
        # query/checkpoint would leak — fail loudly instead
        q.stop()
        raise TimeoutError("dp_stream_exact_dedup: stream did not finish in 300s")
    return spark.table(name)


_NGRAM13 = ", ".join(f"t[i+{j}]" for j in range(13))


@register(
    "dp_decontaminate_ngrams",
    # GPT-3-style 13-gram-overlap decontamination: drop even-id docs
    # sharing any distinct word 13-gram with the odd-id held-out half.
    # The Spark side joins on 64-bit gram hashes; the oracle joins on
    # the gram strings themselves — identical doc sets modulo a ~2^-64
    # collision that a fixed corpus either never has or always has.
    # COALESCE mirrors the engine's missing≡empty rule: a NULL text
    # yields the single '' gram on the Spark side, not zero grams.
    "WITH t AS (SELECT doc_id,"
    " list_filter(string_split_regex(lower(COALESCE(text, '')), '[ \\t\\n\\r\\f\\x0b]+'),"
    " x -> x <> '') AS t FROM documents),"
    " g AS (SELECT doc_id, UNNEST(CASE WHEN len(t) < 13"
    " THEN [array_to_string(t, ' ')]"
    f" ELSE list_transform(range(1, len(t) - 11), i -> concat_ws(' ', {_NGRAM13}))"
    " END) AS g FROM t),"
    " hog AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 1),"
    " bad AS (SELECT DISTINCT g.doc_id FROM g JOIN hog USING (g)"
    " WHERE g.doc_id % 2 = 0)"
    " SELECT doc_id FROM documents WHERE doc_id % 2 = 0"
    " AND doc_id NOT IN (SELECT doc_id FROM bad)",
)
def _dp_decontaminate_ngrams(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.sampling import decontaminate_ngrams

    docs = _spread(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    heldout = docs.where(F.col("doc_id") % 2 == 1)
    return decontaminate_ngrams(train, heldout, "text", n=13).select("doc_id")


_SPAN20 = ", ".join(f"t[i+{j}]" for j in range(20))
# distinct 20-token sliding spans per doc (short doc → whole text as one span)
_SPANS_CTE = (
    "WITH t AS (SELECT doc_id,"
    " list_filter(string_split_regex(lower(COALESCE(text, '')), '[ \\t\\n\\r\\f\\x0b]+'),"
    " x -> x <> '') AS t FROM documents),"
    " g AS (SELECT doc_id, UNNEST(CASE WHEN len(t) < 20"
    " THEN [array_to_string(t, ' ')]"
    f" ELSE list_distinct(list_transform(range(1, len(t) - 18),"
    f" i -> concat_ws(' ', {_SPAN20}))) END) AS g FROM t),"
    " d AS (SELECT g, COUNT(*) AS docs FROM g GROUP BY g),"
    " j AS (SELECT doc_id, COUNT(*) AS n_spans,"
    # CAST: DuckDB SUM over INT returns DECIMAL(38,0) (HUGEINT) while the
    # engine emits BIGINT — without it the type-sensitive driver hash
    # diverges even though values match (round-5 verdict, What's wrong #1).
    " CAST(SUM(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)"
    " AS shared_spans"
    " FROM g JOIN d USING (g) GROUP BY doc_id)"
)


@register(
    "dp_repeated_spans",
    # span-granular exact-substring dedup statistics (Lee et al. 2022
    # approximated at token-window boundaries): per doc, how many of its
    # distinct 20-token sliding spans occur in >=1 OTHER document. The
    # Spark side counts span HASHES, the oracle the span strings —
    # identical modulo the ~2^-64 collision argument decontaminate makes.
    _SPANS_CTE + " SELECT doc_id, n_spans, shared_spans,"
    " CAST(shared_spans AS DOUBLE) / n_spans AS dup_span_fraction FROM j",
)
def _dp_repeated_spans(spark, sf_dir):
    from victorialogs_spark.datapipe.dedup import repeated_spans

    docs = _spread(spark, sf_dir, "documents")
    return repeated_spans(docs, "doc_id", "text", span_tokens=20)


@register(
    "dp_span_dedup",
    # the filter form: drop docs with >50% duplicated spans — catches
    # heavy-boilerplate near-copies whose md5 fingerprints differ
    _SPANS_CTE + " SELECT doc_id FROM j"
    " WHERE CAST(shared_spans AS DOUBLE) / n_spans <= 0.5",
)
def _dp_span_dedup(spark, sf_dir):
    from victorialogs_spark.datapipe.dedup import span_dedup

    docs = _spread(spark, sf_dir, "documents")
    return span_dedup(docs, "doc_id", "text", span_tokens=20,
                      max_dup_fraction=0.5).select("doc_id")


@register(
    "dp_cut_spans",
    # exact-substring dedup, CUT variant: tokens covered by a span shared
    # across >=2 docs are removed from the text (Lee et al. 2022 cut the
    # duplicated substring, not the document). Spark counts span hashes,
    # the oracle span strings; DuckDB list lambdas are 1-indexed, hence
    # the i-1. Output text is single-space re-joined in both engines.
    "WITH tt AS (SELECT doc_id, list_filter(string_split_regex("
    " lower(COALESCE(text, '')), '[ \\t\\n\\r\\f\\x0b]+'), x -> x <> '') AS t"
    " FROM documents),"
    " w AS (SELECT doc_id, CASE WHEN len(t) = 0 THEN ['']"
    " WHEN len(t) < 20 THEN [array_to_string(t, ' ')]"
    f" ELSE list_transform(range(1, len(t) - 18),"
    f" i -> concat_ws(' ', {_SPAN20})) END AS spans FROM tt),"
    " g AS (SELECT doc_id, UNNEST(spans) AS g,"
    " UNNEST(range(0, len(spans))) AS pos FROM w),"
    " d AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM g)"
    " GROUP BY g HAVING COUNT(*) >= 2),"
    " st AS (SELECT doc_id, list_sort(list(pos)) AS starts"
    " FROM g JOIN d USING (g) GROUP BY doc_id),"
    " o AS (SELECT doc_id, list_filter(string_split_regex("
    " COALESCE(text, ''), '[ \\t\\n\\r\\f\\x0b]+'), x -> x <> '') AS otoks FROM documents),"
    " r AS (SELECT o.doc_id, otoks, COALESCE(starts, []) AS starts"
    " FROM o LEFT JOIN st USING (doc_id)),"
    " c AS (SELECT doc_id, otoks, list_filter(otoks, (x, i) ->"
    " len(list_filter(starts, s -> s <= i - 1 AND i - 1 <= s + 19)) = 0)"
    " AS kept FROM r)"
    " SELECT CAST(doc_id AS VARCHAR) AS doc_id,"
    " COALESCE(array_to_string(kept, ' '), '') AS text,"
    " CAST(len(otoks) - len(kept) AS INT) AS n_cut_tokens FROM c",
)
def _dp_cut_spans(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.dedup import cut_repeated_spans

    docs = _spread(spark, sf_dir, "documents")
    out = cut_repeated_spans(docs, "doc_id", "text", span_tokens=20)
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
        F.col("n_cut_tokens").cast("int").alias("n_cut_tokens"),
    )


@register(
    "dp_stream_neardup",
    # bounded availableNow run of the streaming minhash-band collision
    # detector ≡ batch bucket-min semantics: for every doc that is not
    # its bucket's minimum in >=1 band, dup_of = min over its colliding
    # buckets' minima. md5 signatures make the values engine-exact.
    f"WITH toks AS (SELECT doc_id, list_filter(string_split_regex({_NORM},"
    " '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '') AS t FROM documents),"
    " grams AS (SELECT doc_id, list_distinct(list_transform("
    " range(1, greatest(len(t) - 2, 1) + 1),"
    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g FROM toks),"
    " sigs AS (SELECT doc_id, list_transform(range(0, 8),"
    " j -> list_min(list_transform(g, s -> md5(CAST(j AS VARCHAR) || ':' || s))))"
    " AS sig FROM grams),"
    " bk AS (SELECT doc_id, sig, UNNEST(range(0, 4)) AS band FROM sigs),"
    " bk2 AS (SELECT doc_id, band,"
    " md5(array_to_string(sig[band*2+1 : band*2+2], '|')) AS bucket FROM bk),"
    " mins AS (SELECT band, bucket, MIN(doc_id) AS m FROM bk2 GROUP BY 1, 2)"
    " SELECT b.doc_id, MIN(m.m) AS dup_of FROM bk2 b"
    " JOIN mins m USING (band, bucket) WHERE m.m < b.doc_id GROUP BY 1",
)
def _dp_stream_neardup(spark, sf_dir):
    """Streaming stateful minhash near-dup over a bounded source, checked
    against the batch bucket-min oracle."""
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from victorialogs_spark.streaming.neardup import stream_minhash_neardup

    name = "sndup_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="vl_sndup_")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{sf_dir}/documents.*"
    )
    q = (
        stream_minhash_neardup(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("dp_stream_neardup: stream did not finish in 300s")
    return (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
    )


@register(
    "dp_multimodal_features",
    # the fake decoder is deterministic md5 arithmetic — mirror it in SQL
    "SELECT doc_id AS asset_id, LENGTH(text) AS payload_bytes,"
    " md5(text) AS content_hash FROM documents",
)
def _dp_multimodal(spark, sf_dir):
    from victorialogs_spark.datapipe.multimodal import (
        assets_from_documents,
        decode_features,
    )

    assets = assets_from_documents(_table(spark, sf_dir, "documents"))
    return decode_features(assets).select("asset_id", "payload_bytes", "content_hash")


@register(
    "dp_repetition",
    # Gopher-style line/paragraph duplication signals, mirrored with list
    # functions; NULL text propagates NULL through both engines
    "WITH p AS (SELECT doc_id,"
    " list_filter(str_split(text, chr(10)), l -> trim(l) <> '') AS lines,"
    " list_filter(string_split_regex(text, '\\n(?:[ \\t]*\\n)+'),"
    " l -> trim(l) <> '') AS paras FROM documents)"
    " SELECT doc_id, len(lines) AS n_lines,"
    " CASE WHEN len(lines) > 0 THEN CAST(len(lines) - len(list_distinct(lines))"
    "  AS DOUBLE) / len(lines) END AS dup_line_frac,"
    " CASE WHEN list_sum(list_transform(lines, x -> LENGTH(x))) > 0 THEN"
    "  CAST(list_sum(list_transform(lines, x -> LENGTH(x)))"
    "   - list_sum(list_transform(list_distinct(lines), x -> LENGTH(x)))"
    "  AS DOUBLE) / list_sum(list_transform(lines, x -> LENGTH(x)))"
    " END AS dup_line_char_frac,"
    " CASE WHEN len(paras) > 0 THEN CAST(len(paras) - len(list_distinct(paras))"
    "  AS DOUBLE) / len(paras) END AS dup_para_frac,"
    " CASE WHEN list_sum(list_transform(paras, x -> LENGTH(x))) > 0 THEN"
    "  CAST(list_sum(list_transform(paras, x -> LENGTH(x)))"
    "   - list_sum(list_transform(list_distinct(paras), x -> LENGTH(x)))"
    "  AS DOUBLE) / list_sum(list_transform(paras, x -> LENGTH(x)))"
    " END AS dup_para_char_frac FROM p",
)
def _dp_repetition(spark, sf_dir):
    from victorialogs_spark.datapipe.quality import repetition_stats

    return repetition_stats(_table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dp_ngram_repetition",
    # word-3-gram repetition: top-gram coverage + duplicated-gram chars.
    # ROW_NUMBER replicates the engine's min_by((cnt,gram),(-cnt,gram))
    # tie-break (most frequent, then lexicographically smallest gram)
    "WITH toks AS (SELECT doc_id,"
    " list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '') AS t"
    " FROM documents),"
    " g AS (SELECT doc_id, UNNEST(list_transform(range(1, len(t) - 1),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram"
    " FROM toks WHERE len(t) >= 3),"
    " pg AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),"
    " agg AS (SELECT doc_id, SUM(cnt * (LENGTH(gram) - 2)) AS total_chars,"
    " SUM(CASE WHEN cnt > 1 THEN (cnt - 1) * (LENGTH(gram) - 2) ELSE 0 END)"
    " AS dup_chars FROM pg GROUP BY 1),"
    " top AS (SELECT doc_id, cnt, gram, ROW_NUMBER() OVER (PARTITION BY doc_id"
    " ORDER BY cnt DESC, gram ASC) AS rn FROM pg)"
    " SELECT a.doc_id,"
    " CASE WHEN total_chars > 0 THEN CAST(t.cnt * (LENGTH(t.gram) - 2)"
    "  AS DOUBLE) / total_chars END AS top_ngram_char_frac,"
    " CASE WHEN total_chars > 0 THEN CAST(dup_chars AS DOUBLE) / total_chars"
    " END AS dup_ngram_char_frac"
    " FROM agg a JOIN top t ON t.doc_id = a.doc_id AND t.rn = 1",
)
def _dp_ngram_repetition(spark, sf_dir):
    from victorialogs_spark.datapipe.quality import ngram_repetition

    return ngram_repetition(_spread(spark, sf_dir, "documents"), "doc_id", "text", n=3)


@register(
    "dp_gopher_quality",
    # full Gopher rule set mirrored in DuckDB list/regexp functions
    "WITH w AS (SELECT doc_id, text,"
    " list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '') AS words,"
    " list_filter(str_split(text, chr(10)), l -> trim(l) <> '') AS lines,"
    " list_distinct(list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0b]+'),"
    " t -> t <> '')) AS low FROM documents),"
    " s AS (SELECT doc_id, len(words) AS n_words,"
    " CASE WHEN len(words) > 0 THEN CAST(list_sum(list_transform(words,"
    "  x -> LENGTH(x))) AS DOUBLE) / len(words) END AS mean_word_len,"
    " CASE WHEN len(words) > 0 THEN"
    "  CAST(LENGTH(text) - LENGTH(replace(text, '#', ''))"
    "   + FLOOR((LENGTH(text) - LENGTH(replace(text, '...', ''))) / 3)"
    "  AS DOUBLE) / len(words) END AS symbol_word_ratio,"
    " CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines,"
    "  l -> regexp_matches(trim(l), '^([-*•])'))) AS DOUBLE) / len(lines)"
    " END AS bullet_line_frac,"
    " CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines,"
    "  l -> regexp_matches(trim(l), '\\.\\.\\.$'))) AS DOUBLE) / len(lines)"
    " END AS ellipsis_line_frac,"
    " CASE WHEN len(words) > 0 THEN CAST(len(list_filter(words,"
    "  x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(words)"
    " END AS alpha_word_frac,"
    " len(list_intersect(low, ['the','be','to','of','and','that','have','with']))"
    " AS stopword_hits FROM w)"
    " SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,"
    " bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,"
    " COALESCE(n_words BETWEEN 50 AND 100000"
    "  AND mean_word_len BETWEEN 3 AND 10 AND symbol_word_ratio <= 0.1"
    "  AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3"
    "  AND alpha_word_frac >= 0.8 AND stopword_hits >= 2, FALSE)"
    " AS gopher_pass FROM s",
)
def _dp_gopher_quality(spark, sf_dir):
    from victorialogs_spark.datapipe.quality import gopher_quality_flags

    return gopher_quality_flags(_table(spark, sf_dir, "documents"), "doc_id", "text")


# shared edge set for the clustering oracles: exact token-5-gram Jaccard
# pairs >= 0.05 (same CTE chain as dp_ngram_jaccard, without the rounding).
# _cluster_edges_sql(base) rebinds the chain onto any doc-shaped CTE.
_CLUSTER_EDGES_SQL = (
    "toks AS (SELECT doc_id,"
    f" string_split_regex({_NORM}, '[ \\t\\n\\r\\f\\x0b]+') AS t FROM documents),"
    " grams AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id,"
    " UNNEST(list_transform(range(1, greatest(len(t) - 4, 1) + 1),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))"
    " AS g FROM toks)),"
    " sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),"
    " shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS sh"
    " FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id"
    " GROUP BY 1, 2),"
    " pairs AS (SELECT id_a, id_b FROM shared"
    " JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b"
    " WHERE CAST(sh AS DOUBLE) / (sa.sz + sb.sz - sh) >= 0.05),"
    " edges AS (SELECT id_a AS u, id_b AS v FROM pairs"
    " UNION SELECT id_b, id_a FROM pairs),"
    " reach AS (SELECT u, v FROM edges UNION"
    " SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),"
    " comp AS (SELECT d.doc_id, COALESCE(LEAST(d.doc_id, m.mn), d.doc_id)"
    " AS cluster FROM documents d LEFT JOIN"
    " (SELECT u, MIN(v) AS mn FROM reach GROUP BY u) m ON m.u = d.doc_id)"
)


def _cluster_edges_sql(base: str) -> str:
    """The cluster-edges CTE chain over an arbitrary doc-shaped CTE."""
    return _CLUSTER_EDGES_SQL.replace("FROM documents", f"FROM {base}")


def _cluster_pairs(spark, sf_dir):
    from victorialogs_spark.datapipe.dedup import ngram_jaccard_pairs

    docs = _spread(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.05)


@register(
    "dp_dup_clusters",
    # transitive duplicate clusters over the Jaccard pair graph: the
    # iterative large-star/small-star Spark algorithm checked against a
    # DuckDB recursive-CTE transitive closure
    f"WITH RECURSIVE {_CLUSTER_EDGES_SQL} SELECT doc_id, cluster FROM comp",
)
def _dp_dup_clusters(spark, sf_dir):
    from victorialogs_spark.datapipe.clusters import dup_clusters

    docs = _table(spark, sf_dir, "documents")
    return dup_clusters(docs, "doc_id", _cluster_pairs(spark, sf_dir))


@register(
    "dp_cluster_dedup",
    f"WITH RECURSIVE {_CLUSTER_EDGES_SQL}"
    " SELECT doc_id FROM comp WHERE cluster = doc_id",
)
def _dp_cluster_dedup(spark, sf_dir):
    from victorialogs_spark.datapipe.clusters import dedup_by_clusters

    docs = _table(spark, sf_dir, "documents")
    return dedup_by_clusters(
        docs, "doc_id", _cluster_pairs(spark, sf_dir)
    ).select("doc_id")


# the END-TO-END curation pipeline: quality filter (language-agnostic
# rules) → transitive near-dup dedup over even-id docs → exact-content
# decontamination against the odd-id half as held-out
_CURATE_SQL = (
    "WITH RECURSIVE"
    " base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),"
    " w AS (SELECT doc_id, text,"
    " list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '') AS words"
    " FROM base),"
    " q AS (SELECT doc_id, text FROM w WHERE len(words) >= 1"
    " AND CASE WHEN len(words) > 0 THEN"
    "  CAST(LENGTH(text) - LENGTH(replace(text, '#', ''))"
    "   + FLOOR((LENGTH(text) - LENGTH(replace(text, '...', ''))) / 3)"
    "  AS DOUBLE) / len(words) END <= 0.1"
    " AND CASE WHEN len(words) > 0 THEN CAST(len(list_filter(words,"
    "  x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(words)"
    " END >= 0.8),"
    f" {_cluster_edges_sql('q')},"
    " ho AS (SELECT DISTINCT md5("
    f" {_NORM_NN}) AS fp FROM documents WHERE doc_id % 2 = 1)"
    " SELECT c.doc_id FROM comp c JOIN q USING (doc_id)"
    f" WHERE c.cluster = c.doc_id AND md5({_NORM_NN.replace('(text', '(q.text')})"
    " NOT IN (SELECT fp FROM ho)"
)


@register("dp_curate", _CURATE_SQL)
def _dp_curate(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.pipeline import curate_corpus

    docs = _spread(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    heldout = docs.where(F.col("doc_id") % 2 == 1)
    return curate_corpus(
        train, "doc_id", "text", heldout=heldout,
        jaccard_n=5, jaccard_threshold=0.05,
    ).select("doc_id")


@register(
    "dp_curate_packed",
    # the curated corpus laid out as training sequences: the dp_curate
    # pipeline feeding pack_sequences (256-char budget, seed 3) — the
    # full filter → dedup → decontaminate → shuffle → pack chain with
    # one composed oracle
    "WITH h AS (SELECT CAST(c.doc_id AS VARCHAR) AS doc_id, d.n_chars,"
    " md5(CAST(c.doc_id AS VARCHAR) || ':3') AS hh"
    f" FROM ({_CURATE_SQL}) c JOIN documents d USING (doc_id)),"
    " s AS (SELECT doc_id, n_chars, substr(hh, 1, 2) AS shard,"
    " SUM(n_chars) OVER (PARTITION BY substr(hh, 1, 2) ORDER BY hh"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS st"
    " FROM h)"
    " SELECT doc_id, shard, CAST(FLOOR(st / 256) AS BIGINT) AS seq,"
    " CAST(st % 256 AS BIGINT) AS seq_offset FROM s",
)
def _dp_curate_packed(spark, sf_dir):
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.packing import pack_sequences
    from victorialogs_spark.datapipe.pipeline import curate_corpus

    docs = _spread(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    heldout = docs.where(F.col("doc_id") % 2 == 1)
    cur = curate_corpus(
        train, "doc_id", "text", heldout=heldout,
        jaccard_n=5, jaccard_threshold=0.05,
    )
    out = pack_sequences(
        cur.select("doc_id", "n_chars"), "doc_id", "n_chars",
        budget=256, seed=3,
    )
    return out.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "shard", "seq", "seq_offset",
    )


@register(
    "f_value_type_storage",
    # value_type from STORAGE truth end-to-end: the Spark side builds a
    # two-writer table (even event_ids parquet-default -> event_type
    # dict-encoded; odd with dictionary disabled -> PLAIN) and filters
    # with value_type(dict) + value_type(uint64). The oracle knows the
    # writers' truth by construction: dict rows are exactly the even
    # file's non-empty rows, uint64 rows are the non-NULL, non-negative
    # typed values. A sniff fallback could not produce this result —
    # it has no dict notion at all.
    "SELECT event_id, event_type, user_id FROM events"
    " WHERE event_id % 2 = 0 AND event_type <> ''"
    " AND user_id IS NOT NULL AND user_id >= 0",
)
def _f_value_type_storage(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from victorialogs_spark.api import run_query

    ev = _table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    out_dir = "/tmp/vl_value_type_storage_" + os.path.basename(
        os.path.normpath(sf_dir)
    )
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out_dir)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).option("parquet.enable.dictionary", "false").parquet(out_dir)
    stored = spark.read.parquet(out_dir)
    return run_query(
        spark,
        stored,
        "event_type:value_type(dict) user_id:value_type(uint64)"
        " | fields event_id, event_type, user_id",
    )


logsql(
    "tpch_ship_histogram",
    "* | stats by (_time:7d) count() as n, sum(l_quantity) as qty",
    "SELECT make_timestamp(CAST(FLOOR(epoch(l_shipdate) / 604800) * 604800"
    " * 1000000 AS BIGINT)) AS _time,"
    f" COUNT(*) AS n, {dsum('l_quantity')} AS qty FROM lineitem GROUP BY 1",
    table="lineitem_ts",
)


# ---------------------------------------------------------------------------
# Registry run order: a time-budgeted driver walks entries in dict order and
# may truncate the tail. Rounds 2-3 both covered only the first 50 entries —
# the same 50 each time — so everything registered after them has never been
# driver-verified. Reorder so the never-verified entries run FIRST; the
# 50 twice-green entries run last (they are the best-understood ones, and if
# the driver truncates again it now truncates re-verification, not coverage).
# ---------------------------------------------------------------------------

_DRIVER_VERIFIED_R2_R3 = [
    # exactly the 50-entry prefix recorded in CORRECTNESS_r02/r03.json
    "f_word", "f_phrase", "f_prefix", "f_any_case", "f_exact",
    "f_exact_prefix", "f_in", "p_rename_wildcard", "f_field_group",
    "f_in_subquery", "f_contains_all", "f_contains_any", "f_seq", "f_regexp",
    "f_range_gt", "f_range_bracket", "f_range_halfopen", "f_ipv4_range",
    "f_string_range", "f_string_cmp", "f_len_range", "f_eq_field",
    "f_le_field", "f_time_range", "f_time_duration_offset", "f_day_range",
    "f_week_range", "f_day_range_offset", "f_time_gt_offset", "f_stream",
    "f_bool", "p_fields_delete", "p_copy", "p_rename", "p_rename_overwrite",
    "p_filter", "p_limit", "p_offset", "p_sort_desc_rank",
    "p_sort_partition_topk", "p_first", "p_last", "p_math", "p_math_funcs",
    "p_extract", "p_extract_regexp", "p_replace", "p_replace_regexp",
    "p_format", "p_format_converters",
]


# exactly the 50-entry window recorded in CORRECTNESS_r05.json (all
# green there except dp_repeated_spans, whose oracle type is now fixed)
_DRIVER_VERIFIED_R5 = [
    "dp_repeated_spans", "dp_span_dedup", "dp_cut_spans", "dp_tfidf_terms",
    "dp_dsir_weights", "dp_ann_quantized_topk", "dp_perplexity_buckets",
    "dp_bigram_logprob", "dp_mix_sources", "dp_label_centroids",
    "dp_knn_purity", "dp_curate_packed", "dp_stream_stats", "dp_pca_topk",
    "dp_image_phash", "dp_audio_fingerprint", "dp_simhash_md5",
    "dp_unigram_logprob", "dp_shuffle_shards", "dp_pack_sequences",
    "dp_repetition", "dp_ngram_repetition", "dp_gopher_quality",
    "dp_dup_clusters", "dp_cluster_dedup", "dp_minhash_md5", "dp_curate",
    "dp_stream_neardup", "dp_decontaminate_ngrams", "f_in_subquery_or",
    "p_math_abs", "p_format_numeric_converters", "p_unpack_json",
    "p_unpack_logfmt", "p_unpack_words", "p_unpack_syslog", "p_unroll",
    "p_pack_json", "p_pack_logfmt", "p_join", "p_union", "p_uniq",
    "p_uniq_hits", "p_top", "p_facets", "p_field_names", "p_field_values",
    "p_len", "p_json_array_len", "p_sample_all",
]

# exactly the 50-entry window recorded in CORRECTNESS_r06.json (50/50 green)
_DRIVER_VERIFIED_R6 = [
    "dp_repeated_spans", "dp_image_ahash", "dp_audio_zcr", "dp_pca_moments",
    "dp_pca_check", "dp_semdedup", "dp_winnowing", "dp_ngram_counts",
    "p_collapse_nums", "p_decolorize", "p_drop_empty_fields",
    "p_stream_context_window", "p_blocks_count", "p_block_stats",
    "s_stats_by", "s_global", "s_count_empty", "s_sum_len",
    "s_median_quantile", "s_uniq_values", "s_time_bucket", "s_num_bucket",
    "s_wildcard_no_match", "s_stats_if", "s_row_max", "s_rate",
    "s_histogram", "s_values_unrolled", "s_row_any_by", "s_json_values_by",
    "p_hash_cardinality", "tpch_pricing_summary", "tpch_top_orders",
    "p_extract_keep_original", "p_uniq_multi", "p_top_rank",
    "p_fields_missing", "s_count_uniq_limit", "s_row_min",
    "s_time_bucket_offset", "s_multi_bucket", "p_format_time_conv",
    "p_unpack_words_limit", "s_ipv4_bucket", "p_sort_partition_rank",
    "s_uniq_values_limit", "p_top_custom_hits", "p_format_duration_conv",
    "p_unroll_zip", "ep_hits",
]

# exactly the 50-entry window recorded in CORRECTNESS_r07.json (50/50 green)
_DRIVER_VERIFIED_R7 = [
    "ep_stats_query", "ep_stats_query_range", "ep_streams",
    "ep_stream_field_values", "dp_exact_dedup", "dp_ngram_jaccard",
    "dp_text_stats", "dp_quality", "dp_lang_id", "dp_fingerprint",
    "dp_cosine_threshold", "dp_ann_bruteforce_topk",
    "dp_ann_lsh_quantized_topk", "dp_ann_ivf_quantized_topk",
    "dp_embedding_near_dup_exact", "dp_embedding_clusters_exact",
    "dp_chunk_documents", "dp_hash_sample", "dp_train_val_test_split",
    "dp_dedup_keep_best", "dp_stratified_sample", "dp_semdedup_auto",
    "dp_frame_sample", "dp_redact_pii", "dp_decontaminate",
    "dp_stream_exact_dedup", "dp_multimodal_features",
    "f_value_type_storage", "tpch_ship_histogram", "f_word", "f_phrase",
    "f_prefix", "f_any_case", "f_exact", "f_exact_prefix", "f_in",
    "p_rename_wildcard", "f_field_group", "f_in_subquery", "f_contains_all",
    "f_contains_any", "f_seq", "f_regexp", "f_range_gt", "f_range_bracket",
    "f_range_halfopen", "f_ipv4_range", "f_string_range", "f_string_cmp",
    "f_len_range",
]

# exactly the 50-entry window recorded in CORRECTNESS_r08.json (50/50 green)
_DRIVER_VERIFIED_R8 = [
    "dp_image_ahash_png", "dp_image_ahash_jpeg", "dp_mp4_frame_extract",
    "f_eq_field", "f_le_field", "f_time_range", "f_time_duration_offset",
    "f_day_range", "f_week_range", "f_day_range_offset", "f_time_gt_offset",
    "f_stream", "f_bool", "p_fields_delete", "p_copy", "p_rename",
    "p_rename_overwrite", "p_filter", "p_limit", "p_offset",
    "p_sort_desc_rank", "p_sort_partition_topk", "p_first", "p_last",
    "p_math", "p_math_funcs", "p_extract", "p_extract_regexp", "p_replace",
    "p_replace_regexp", "p_format", "p_format_converters", "dp_span_dedup",
    "dp_cut_spans", "dp_tfidf_terms", "dp_dsir_weights",
    "dp_ann_quantized_topk", "dp_perplexity_buckets", "dp_bigram_logprob",
    "dp_mix_sources", "dp_label_centroids", "dp_knn_purity",
    "dp_curate_packed", "dp_stream_stats", "dp_simhash_md5",
    "dp_unigram_logprob", "dp_shuffle_shards", "dp_pack_sequences",
    "dp_repetition", "dp_ngram_repetition",
]

# The 50 STALEST oracle-backed entries by last-green driver round, computed
# from the union of CORRECTNESS_r01..r07.json (artifact complete as of r07:
# every oracle-backed entry is green in some round, no latest check is red).
# 29 entries whose last green row is r03 (in r03 artifact order) followed by
# the 21 oldest r05 entries — the filters/pipes code behind the r03 batch has
# changed the most since it was last driver-checked, so it goes first.
# Superseded by _STALE_R9_WINDOW; kept for the historical record.
_STALE_R8_WINDOW = [
    "f_eq_field", "f_le_field", "f_time_range", "f_time_duration_offset",
    "f_day_range", "f_week_range", "f_day_range_offset", "f_time_gt_offset",
    "f_stream", "f_bool", "p_fields_delete", "p_copy", "p_rename",
    "p_rename_overwrite", "p_filter", "p_limit", "p_offset",
    "p_sort_desc_rank", "p_sort_partition_topk", "p_first", "p_last",
    "p_math", "p_math_funcs", "p_extract", "p_extract_regexp", "p_replace",
    "p_replace_regexp", "p_format", "p_format_converters", "dp_span_dedup",
    "dp_cut_spans", "dp_tfidf_terms", "dp_dsir_weights",
    "dp_ann_quantized_topk", "dp_perplexity_buckets", "dp_bigram_logprob",
    "dp_mix_sources", "dp_label_centroids", "dp_knn_purity",
    "dp_curate_packed", "dp_stream_stats", "dp_simhash_md5",
    "dp_unigram_logprob", "dp_shuffle_shards", "dp_pack_sequences",
    "dp_repetition", "dp_ngram_repetition", "dp_gopher_quality",
    "dp_dup_clusters", "dp_cluster_dedup",
]

# round-8 additions: brand-new oracle-backed entries registered that round —
# all three landed green in CORRECTNESS_r08.json (now in _DRIVER_VERIFIED_R8).
_NEW_R8 = [
    "dp_image_ahash_png",
    "dp_image_ahash_jpeg",
    "dp_mp4_frame_extract",
]

# The 50 STALEST oracle-backed entries by last-green driver round after r08:
# the 28 whose last green is the r05 artifact, followed by 22 r06-last
# entries selected ALPHABETICALLY (not r06 artifact order as the r9 review
# noted — the selection skipped the s_* stats family, which therefore stayed
# un-rechecked until the r10 window fronts it; see _STALE_R10_WINDOW).
# Superseded by _STALE_R10_WINDOW; kept for the historical record.
_STALE_R9_WINDOW = [
    # last green = r05
    "dp_cluster_dedup", "dp_curate", "dp_decontaminate_ngrams",
    "dp_dup_clusters", "dp_gopher_quality", "dp_minhash_md5",
    "dp_stream_neardup", "f_in_subquery_or", "p_facets", "p_field_names",
    "p_field_values", "p_format_numeric_converters", "p_join",
    "p_json_array_len", "p_len", "p_math_abs", "p_pack_json",
    "p_pack_logfmt", "p_sample_all", "p_top", "p_union", "p_uniq",
    "p_uniq_hits", "p_unpack_json", "p_unpack_logfmt", "p_unpack_syslog",
    "p_unpack_words", "p_unroll",
    # oldest r06 entries (r06 artifact order)
    "dp_audio_zcr", "dp_image_ahash", "dp_ngram_counts", "dp_pca_check",
    "dp_pca_moments", "dp_repeated_spans", "dp_semdedup", "dp_winnowing",
    "ep_hits", "p_block_stats", "p_blocks_count", "p_collapse_nums",
    "p_decolorize", "p_drop_empty_fields", "p_extract_keep_original",
    "p_fields_missing", "p_format_duration_conv", "p_format_time_conv",
    "p_hash_cardinality", "p_sort_partition_rank", "p_stream_context_window",
    "p_top_custom_hits",
]

# Names RESERVED in round 9 for the then-unbuilt codec features (MJPEG
# frame decode, progressive JPEG, 16-bit/interlaced PNG); none were
# registered that round — the `in QUERIES and in ORACLE` guard dropped
# them from the window. Registered for real in round 10 (see _NEW_R10).
_NEW_R9 = [
    "dp_mp4_frame_ahash",
    "dp_image_ahash_jpeg_progressive",
    "dp_image_ahash_png16",
]

# exactly the 50-entry window recorded in CORRECTNESS_r09.json (50/50 green)
_DRIVER_VERIFIED_R9 = [
    "dp_cluster_dedup", "dp_curate", "dp_decontaminate_ngrams",
    "dp_dup_clusters", "dp_gopher_quality", "dp_minhash_md5",
    "dp_stream_neardup", "f_in_subquery_or", "p_facets", "p_field_names",
    "p_field_values", "p_format_numeric_converters", "p_join",
    "p_json_array_len", "p_len", "p_math_abs", "p_pack_json", "p_pack_logfmt",
    "p_sample_all", "p_top", "p_union", "p_uniq", "p_uniq_hits",
    "p_unpack_json", "p_unpack_logfmt", "p_unpack_syslog", "p_unpack_words",
    "p_unroll", "dp_audio_zcr", "dp_image_ahash", "dp_ngram_counts",
    "dp_pca_check", "dp_pca_moments", "dp_repeated_spans", "dp_semdedup",
    "dp_winnowing", "ep_hits", "p_block_stats", "p_blocks_count",
    "p_collapse_nums", "p_decolorize", "p_drop_empty_fields",
    "p_extract_keep_original", "p_fields_missing", "p_format_duration_conv",
    "p_format_time_conv", "p_hash_cardinality", "p_sort_partition_rank",
    "p_stream_context_window", "p_top_custom_hits",
]

# The 50 STALEST oracle-backed entries by last-green driver round after r09
# (per the round-9 review's union re-derivation): the 28 whose last green is
# the r06 artifact (the entire oracle-backed stats-pipe family, un-rechecked
# since r6, fronted first), followed by the 22 oldest r07 entries in r07
# artifact order.
_STALE_R10_WINDOW = [
    # last green = r06 (stats family + TPC-H headliners)
    "p_top_rank", "p_uniq_multi", "p_unpack_words_limit", "p_unroll_zip",
    "s_count_empty", "s_count_uniq_limit", "s_global", "s_histogram",
    "s_ipv4_bucket", "s_json_values_by", "s_median_quantile",
    "s_multi_bucket", "s_num_bucket", "s_rate", "s_row_any_by", "s_row_max",
    "s_row_min", "s_stats_by", "s_stats_if", "s_sum_len", "s_time_bucket",
    "s_time_bucket_offset", "s_uniq_values", "s_uniq_values_limit",
    "s_values_unrolled", "s_wildcard_no_match", "tpch_pricing_summary",
    "tpch_top_orders",
    # oldest r07 entries (r07 artifact order)
    "ep_stats_query", "ep_stats_query_range", "ep_streams",
    "ep_stream_field_values", "dp_exact_dedup", "dp_ngram_jaccard",
    "dp_text_stats", "dp_quality", "dp_lang_id", "dp_fingerprint",
    "dp_cosine_threshold", "dp_ann_bruteforce_topk",
    "dp_ann_lsh_quantized_topk", "dp_ann_ivf_quantized_topk",
    "dp_embedding_near_dup_exact", "dp_embedding_clusters_exact",
    "dp_chunk_documents", "dp_hash_sample", "dp_train_val_test_split",
    "dp_dedup_keep_best", "dp_stratified_sample", "dp_semdedup_auto",
]

# round-10 additions; all three landed green in CORRECTNESS_r10.json
# (now in _DRIVER_VERIFIED_R10). Kept for the historical record.
_NEW_R10 = [
    "dp_mp4_frame_ahash",
    "dp_image_ahash_jpeg_progressive",
    "dp_image_ahash_png16",
]

# exactly the 50-entry window recorded in CORRECTNESS_r10.json (50/50 green)
_DRIVER_VERIFIED_R10 = [
    "dp_ann_bruteforce_topk", "dp_ann_ivf_quantized_topk",
    "dp_ann_lsh_quantized_topk", "dp_chunk_documents", "dp_cosine_threshold",
    "dp_embedding_clusters_exact", "dp_embedding_near_dup_exact",
    "dp_exact_dedup", "dp_fingerprint", "dp_hash_sample",
    "dp_image_ahash_jpeg_progressive", "dp_image_ahash_png16", "dp_lang_id",
    "dp_mp4_frame_ahash", "dp_ngram_jaccard", "dp_quality", "dp_text_stats",
    "dp_train_val_test_split", "ep_stats_query", "ep_stats_query_range",
    "ep_stream_field_values", "ep_streams", "p_top_rank", "p_uniq_multi",
    "p_unpack_words_limit", "p_unroll_zip", "s_count_empty",
    "s_count_uniq_limit", "s_global", "s_histogram", "s_ipv4_bucket",
    "s_json_values_by", "s_median_quantile", "s_multi_bucket", "s_num_bucket",
    "s_rate", "s_row_any_by", "s_row_max", "s_row_min", "s_stats_by",
    "s_stats_if", "s_sum_len", "s_time_bucket", "s_time_bucket_offset",
    "s_uniq_values", "s_uniq_values_limit", "s_values_unrolled",
    "s_wildcard_no_match", "tpch_pricing_summary", "tpch_top_orders",
]

# The 50 STALEST oracle-backed entries by last-green driver round after r10
# (per the round-10 review's union re-derivation): the 31 whose last green
# is the r07 artifact (the filter family + the dp entries the r10 window
# displaced), followed by the 19 oldest r08 entries in r08 artifact order.
_STALE_R11_WINDOW = [
    # last green = r07
    "f_word", "f_phrase", "f_prefix", "f_any_case", "f_exact",
    "f_exact_prefix", "f_in", "f_in_subquery", "f_field_group",
    "f_contains_all", "f_contains_any", "f_seq", "f_regexp", "f_range_gt",
    "f_range_bracket", "f_range_halfopen", "f_ipv4_range", "f_string_range",
    "f_string_cmp", "f_len_range", "f_value_type_storage",
    "p_rename_wildcard", "dp_dedup_keep_best", "dp_stratified_sample",
    "dp_semdedup_auto", "dp_frame_sample", "dp_redact_pii",
    "dp_decontaminate", "dp_stream_exact_dedup", "dp_multimodal_features",
    "tpch_ship_histogram",
    # oldest r08 entries (r08 artifact order)
    "f_eq_field", "f_le_field", "f_time_range", "f_time_duration_offset",
    "f_day_range", "f_week_range", "f_day_range_offset", "f_time_gt_offset",
    "f_stream", "f_bool", "p_fields_delete", "p_copy", "p_rename",
    "p_rename_overwrite", "p_filter", "p_limit", "p_offset",
    "p_sort_desc_rank", "p_sort_partition_topk",
]

# round-11 additions; landed green in CORRECTNESS_r11.json (now in
# _DRIVER_VERIFIED_R11). Kept for the historical record.
_NEW_R11 = [
    "dp_image_ahash_png_palette",
]

# exactly the 50-entry window recorded in CORRECTNESS_r11.json (50/50 green)
_DRIVER_VERIFIED_R11 = [
    "dp_image_ahash_png_palette", "f_word", "f_phrase", "f_prefix",
    "f_any_case", "f_exact", "f_exact_prefix", "f_in", "f_in_subquery",
    "f_field_group", "f_contains_all", "f_contains_any", "f_seq", "f_regexp",
    "f_range_gt", "f_range_bracket", "f_range_halfopen", "f_ipv4_range",
    "f_string_range", "f_string_cmp", "f_len_range", "f_value_type_storage",
    "p_rename_wildcard", "dp_dedup_keep_best", "dp_stratified_sample",
    "dp_semdedup_auto", "dp_frame_sample", "dp_redact_pii", "dp_decontaminate",
    "dp_stream_exact_dedup", "dp_multimodal_features", "tpch_ship_histogram",
    "f_eq_field", "f_le_field", "f_time_range", "f_time_duration_offset",
    "f_day_range", "f_week_range", "f_day_range_offset", "f_time_gt_offset",
    "f_stream", "f_bool", "p_fields_delete", "p_copy", "p_rename",
    "p_rename_overwrite", "p_filter", "p_limit", "p_offset", "p_sort_desc_rank",
]

# The 50 STALEST oracle-backed entries by last-green driver round after r11,
# derived programmatically from the union of CORRECTNESS_r01..r11.json
# sorted by (last-green round, position in that round's artifact): the 32
# whose last green is the r08 artifact — including the three codec entries
# at r08 positions 0-2 (dp_image_ahash_png/jpeg, dp_mp4_frame_extract) that
# the r11 review's hand-derived list omitted — followed by the 18 oldest
# r09 entries in r09 artifact order.
_STALE_R12_WINDOW = [
    # last green = r08 (r08 artifact order)
    "dp_image_ahash_png", "dp_image_ahash_jpeg", "dp_mp4_frame_extract",
    "p_sort_partition_topk", "p_first", "p_last", "p_math", "p_math_funcs",
    "p_extract", "p_extract_regexp", "p_replace", "p_replace_regexp",
    "p_format", "p_format_converters", "dp_span_dedup", "dp_cut_spans",
    "dp_tfidf_terms", "dp_dsir_weights", "dp_ann_quantized_topk",
    "dp_perplexity_buckets", "dp_bigram_logprob", "dp_mix_sources",
    "dp_label_centroids", "dp_knn_purity", "dp_curate_packed",
    "dp_stream_stats", "dp_simhash_md5", "dp_unigram_logprob",
    "dp_shuffle_shards", "dp_pack_sequences", "dp_repetition",
    "dp_ngram_repetition",
    # oldest r09 entries (r09 artifact order)
    "dp_cluster_dedup", "dp_curate",
    "dp_decontaminate_ngrams", "dp_dup_clusters", "dp_gopher_quality",
    "dp_minhash_md5", "dp_stream_neardup", "f_in_subquery_or", "p_facets",
    "p_field_names", "p_field_values", "p_format_numeric_converters", "p_join",
    "p_json_array_len", "p_len", "p_math_abs", "p_pack_json", "p_pack_logfmt",
]

# round-12 additions; landed green in CORRECTNESS_r12.json (now in
# _DRIVER_VERIFIED_R12). Kept for the historical record.
_NEW_R12 = [
    "dp_image_ahash_gif",
    "dp_gif_frame_ahash",
]

# exactly the 50-entry window recorded in CORRECTNESS_r12.json (50/50 green)
_DRIVER_VERIFIED_R12 = [
    "dp_image_ahash_gif", "dp_gif_frame_ahash", "dp_image_ahash_png",
    "dp_image_ahash_jpeg", "dp_mp4_frame_extract", "p_sort_partition_topk",
    "p_first", "p_last", "p_math", "p_math_funcs", "p_extract",
    "p_extract_regexp", "p_replace", "p_replace_regexp", "p_format",
    "p_format_converters", "dp_span_dedup", "dp_cut_spans", "dp_tfidf_terms",
    "dp_dsir_weights", "dp_ann_quantized_topk", "dp_perplexity_buckets",
    "dp_bigram_logprob", "dp_mix_sources", "dp_label_centroids",
    "dp_knn_purity", "dp_curate_packed", "dp_stream_stats", "dp_simhash_md5",
    "dp_unigram_logprob", "dp_shuffle_shards", "dp_pack_sequences",
    "dp_repetition", "dp_ngram_repetition", "dp_cluster_dedup", "dp_curate",
    "dp_decontaminate_ngrams", "dp_dup_clusters", "dp_gopher_quality",
    "dp_minhash_md5", "dp_stream_neardup", "f_in_subquery_or", "p_facets",
    "p_field_names", "p_field_values", "p_format_numeric_converters",
    "p_join", "p_json_array_len", "p_len", "p_math_abs",
]

# Historical record: the r13 window's stale-fill list. Every name below
# landed green in CORRECTNESS_r13.json; the LIVE window source is
# _STALE_R14_WINDOW + _NEW_R14 (nothing reads this list anymore — kept,
# like _NEW_R13, as the audit trail of what each round's window covered).
_STALE_R13_WINDOW = [
    # last green = r09 (r09 artifact order, positions 16-49)
    "p_pack_json", "p_pack_logfmt", "p_sample_all", "p_top", "p_union",
    "p_uniq", "p_uniq_hits", "p_unpack_json", "p_unpack_logfmt",
    "p_unpack_syslog", "p_unpack_words", "p_unroll", "dp_audio_zcr",
    "dp_image_ahash", "dp_ngram_counts", "dp_pca_check", "dp_pca_moments",
    "dp_repeated_spans", "dp_semdedup", "dp_winnowing", "ep_hits",
    "p_block_stats", "p_blocks_count", "p_collapse_nums", "p_decolorize",
    "p_drop_empty_fields", "p_extract_keep_original", "p_fields_missing",
    "p_format_duration_conv", "p_format_time_conv", "p_hash_cardinality",
    "p_sort_partition_rank", "p_stream_context_window", "p_top_custom_hits",
    # oldest r10 entries (r10 artifact order, positions 0-15)
    "dp_mp4_frame_ahash", "dp_image_ahash_jpeg_progressive",
    "dp_image_ahash_png16", "p_top_rank", "p_uniq_multi",
    "p_unpack_words_limit", "p_unroll_zip", "s_count_empty",
    "s_count_uniq_limit", "s_global", "s_histogram", "s_ipv4_bucket",
    "s_json_values_by", "s_median_quantile", "s_multi_bucket", "s_num_bucket",
]

# round-13 additions; both landed green in CORRECTNESS_r13.json (now in
# _DRIVER_VERIFIED_R13). Kept for the historical record.
_NEW_R13 = [
    "dp_image_ahash_tiff",
    "dp_image_ahash_tiff_gray",
]

# exactly the 50-entry window recorded in CORRECTNESS_r13.json (50/50 green)
_DRIVER_VERIFIED_R13 = [
    "dp_image_ahash_tiff", "dp_image_ahash_tiff_gray", "p_pack_json",
    "p_pack_logfmt", "p_sample_all", "p_top", "p_union", "p_uniq",
    "p_uniq_hits", "p_unpack_json", "p_unpack_logfmt", "p_unpack_syslog",
    "p_unpack_words", "p_unroll", "dp_audio_zcr", "dp_image_ahash",
    "dp_ngram_counts", "dp_pca_check", "dp_pca_moments",
    "dp_repeated_spans", "dp_semdedup", "dp_winnowing", "ep_hits",
    "p_block_stats", "p_blocks_count", "p_collapse_nums", "p_decolorize",
    "p_drop_empty_fields", "p_extract_keep_original", "p_fields_missing",
    "p_format_duration_conv", "p_format_time_conv", "p_hash_cardinality",
    "p_sort_partition_rank", "p_stream_context_window", "p_top_custom_hits",
    "dp_mp4_frame_ahash", "dp_image_ahash_jpeg_progressive",
    "dp_image_ahash_png16", "p_top_rank", "p_uniq_multi",
    "p_unpack_words_limit", "p_unroll_zip", "s_count_empty",
    "s_count_uniq_limit", "s_global", "s_histogram", "s_ipv4_bucket",
    "s_json_values_by", "s_median_quantile",
]

# The 52 STALEST oracle-backed entries by last-green driver round after r13,
# derived programmatically from the union of CORRECTNESS_r01..r13.json
# sorted by (last-green round, position in that round's artifact): the 36
# whose last green is the r10 artifact (r10 positions 14-49 — positions
# 0-13 were re-checked by the r13 window fill), followed by the 16 oldest
# r11 entries in r11 artifact order (two spare so a short _NEW_R14 still
# fills the window; _reorder_registry truncates to 50 - len(front)).
# Superseded by _STALE_R15_WINDOW; kept for the historical record.
_STALE_R14_WINDOW = [
    # last green = r10 (r10 artifact order, positions 14-49)
    "s_multi_bucket", "s_num_bucket", "s_rate", "s_row_any_by", "s_row_max",
    "s_row_min", "s_stats_by", "s_stats_if", "s_sum_len", "s_time_bucket",
    "s_time_bucket_offset", "s_uniq_values", "s_uniq_values_limit",
    "s_values_unrolled", "s_wildcard_no_match", "tpch_pricing_summary",
    "tpch_top_orders", "ep_stats_query", "ep_stats_query_range",
    "ep_streams", "ep_stream_field_values", "dp_exact_dedup",
    "dp_ngram_jaccard", "dp_text_stats", "dp_quality", "dp_lang_id",
    "dp_fingerprint", "dp_cosine_threshold", "dp_ann_bruteforce_topk",
    "dp_ann_lsh_quantized_topk", "dp_ann_ivf_quantized_topk",
    "dp_embedding_near_dup_exact", "dp_embedding_clusters_exact",
    "dp_chunk_documents", "dp_hash_sample", "dp_train_val_test_split",
    # oldest r11 entries (r11 artifact order, positions 0-15)
    "dp_image_ahash_png_palette", "f_word", "f_phrase", "f_prefix",
    "f_any_case", "f_exact", "f_exact_prefix", "f_in", "f_in_subquery",
    "f_field_group", "f_contains_all", "f_contains_any", "f_seq",
    "f_regexp", "f_range_gt", "f_range_bracket",
]

# exactly the 50-entry window recorded in CORRECTNESS_r14.json (50/50 green)
_DRIVER_VERIFIED_R14 = [
    "dp_image_ahash_webp", "dp_webp_frame_ahash", "s_multi_bucket",
    "s_num_bucket", "s_rate", "s_row_any_by", "s_row_max", "s_row_min",
    "s_stats_by", "s_stats_if", "s_sum_len", "s_time_bucket",
    "s_time_bucket_offset", "s_uniq_values", "s_uniq_values_limit",
    "s_values_unrolled", "s_wildcard_no_match", "tpch_pricing_summary",
    "tpch_top_orders", "ep_stats_query", "ep_stats_query_range",
    "ep_streams", "ep_stream_field_values", "dp_exact_dedup",
    "dp_ngram_jaccard", "dp_text_stats", "dp_quality", "dp_lang_id",
    "dp_fingerprint", "dp_cosine_threshold", "dp_ann_bruteforce_topk",
    "dp_ann_lsh_quantized_topk", "dp_ann_ivf_quantized_topk",
    "dp_embedding_near_dup_exact", "dp_embedding_clusters_exact",
    "dp_chunk_documents", "dp_hash_sample", "dp_train_val_test_split",
    "dp_image_ahash_png_palette", "f_word", "f_phrase", "f_prefix",
    "f_any_case", "f_exact", "f_exact_prefix", "f_in", "f_in_subquery",
    "f_field_group", "f_contains_all", "f_contains_any",
]

# The 52 STALEST oracle-backed entries by last-green driver round after r14,
# derived programmatically from the union of CORRECTNESS_r01..r14.json
# sorted by (last-green round, position in that round's artifact): the 38
# whose last green is the r11 artifact, followed by the 14 oldest r12
# entries in r12 artifact order (two spare so a short _NEW_R15 still
# fills the window; _reorder_registry truncates to 50 - len(front)).
_STALE_R15_WINDOW = [
    # last green = r11 (r11 artifact order)
    "f_seq", "f_regexp", "f_range_gt", "f_range_bracket",
    "f_range_halfopen", "f_ipv4_range", "f_string_range", "f_string_cmp",
    "f_len_range", "f_value_type_storage", "p_rename_wildcard",
    "dp_dedup_keep_best", "dp_stratified_sample", "dp_semdedup_auto",
    "dp_frame_sample", "dp_redact_pii", "dp_decontaminate",
    "dp_stream_exact_dedup", "dp_multimodal_features",
    "tpch_ship_histogram", "f_eq_field", "f_le_field", "f_time_range",
    "f_time_duration_offset", "f_day_range", "f_week_range",
    "f_day_range_offset", "f_time_gt_offset", "f_stream", "f_bool",
    "p_fields_delete", "p_copy", "p_rename", "p_rename_overwrite",
    "p_filter", "p_limit", "p_offset", "p_sort_desc_rank",
    # oldest r12 entries (r12 artifact order, positions 0-13)
    "dp_image_ahash_gif", "dp_gif_frame_ahash", "dp_image_ahash_png",
    "dp_image_ahash_jpeg", "dp_mp4_frame_extract", "p_sort_partition_topk",
    "p_first", "p_last", "p_math", "p_math_funcs", "p_extract",
    "p_extract_regexp", "p_replace", "p_replace_regexp",
]

# round-15 additions: brand-new oracle-backed entries registered this round
_NEW_R15: list[str] = [
    "ep_query_last_n", "ep_hits_common", "ep_stats_rate_window",
    "ep_stats_query_multi", "s_uniq_values_natural",
    # fourth-session calendar-bucket semantics (month/year UTC calendar
    # truncation, Monday-aligned 'week')
    "s_time_bucket_month", "s_time_bucket_week",
    # getBucketedValue dispatch parity (passthrough + int64 truncation)
    "s_value_bucket_passthrough", "s_value_bucket_int",
    # LessNatural text ordering (digit runs compare numerically)
    "p_sort_natural_text",
]

# entries whose SEMANTICS (and oracle SQL) were re-derived this round —
# fronted like new entries so the driver artifact records the new truth,
# not just the local check_oracle replica (r15 stats-semantics corpus:
# exact quantile, NaN empty-sum; the seq/day_range re-derivations are
# already in the stale fill below)
_REDERIVED_R15: list[str] = ["s_median_quantile", "s_wildcard_no_match"]

# round-14 additions; both landed green in CORRECTNESS_r14.json (now in
# _DRIVER_VERIFIED_R14). Kept for the historical record.
_NEW_R14: list[str] = ["dp_image_ahash_webp", "dp_webp_frame_ahash"]


def _reorder_registry() -> None:
    """The driver's correctness artifact covers the FIRST 50 registry
    entries each round. As of CORRECTNESS_r07.json the artifact is
    COMPLETE: every oracle-backed entry has a green driver row in some
    round and no entry's latest check is red. The window's value is now
    FRESHNESS: front this round's brand-new oracle entries, then the
    STALEST previously-green entries (for r15: the 38 whose last green
    is r11, then the oldest r12 entries; the code behind them has
    drifted the most since their check). The
    rows-only entries (no oracle_sql by design — hash/approx-valued,
    each with an oracle-exact twin elsewhere) stay OUT of the window:
    a driver row for them would read `err: no_oracle`, not green."""
    global QUERIES, ORACLE
    missing = [
        k for k in _NEW_R15 if k not in QUERIES or k not in ORACLE
    ]
    if missing:
        # a _NEW_R15 name that never got registered (or lost its oracle)
        # must fail loudly, not silently fall out of the window — the r9
        # reserved names did exactly that and the round shipped a false
        # "registered this round" comment
        raise RuntimeError(
            f"_NEW_R15 entries not registered with an oracle: {missing}"
        )
    checked = (
        set(_DRIVER_VERIFIED_R2_R3) | set(_DRIVER_VERIFIED_R5)
        | set(_DRIVER_VERIFIED_R6) | set(_DRIVER_VERIFIED_R7)
        | set(_DRIVER_VERIFIED_R8) | set(_DRIVER_VERIFIED_R9)
        | set(_DRIVER_VERIFIED_R10) | set(_DRIVER_VERIFIED_R11)
        | set(_DRIVER_VERIFIED_R12) | set(_DRIVER_VERIFIED_R13)
        | set(_DRIVER_VERIFIED_R14)
    )
    never = [k for k in QUERIES if k not in checked]
    never_with_oracle = [k for k in never if k in ORACLE]
    never_rows_only = [k for k in never if k not in ORACLE]
    front = list(_NEW_R15) + list(_REDERIVED_R15) + [
        k
        for k in never_with_oracle
        if k not in _NEW_R15 and k not in _REDERIVED_R15
    ]
    # fill the window with the stalest previously-green entries
    fill = [
        k for k in _STALE_R15_WINDOW
        if k in QUERIES and k in ORACLE and k not in front
    ][: max(0, 50 - len(front))]
    window = front + fill
    rest_checked = [
        k for k in QUERIES
        if k in ORACLE and k not in window and k not in never_rows_only
    ]
    order = window + rest_checked + never_rows_only
    order += [k for k in QUERIES if k not in order]
    QUERIES = {k: QUERIES[k] for k in order}
    ORACLE = {k: ORACLE[k] for k in order if k in ORACLE}


_reorder_registry()
