"""LogsQL printer: AST → query string, the inverse of the parser.

The reference's primary parser test layer is String() round-tripping
(parser_test.go TestParseQuery_Success asserts parse(s).String() matches
the canonical form). This printer provides the same guarantee
structurally: for every query the parser accepts,
``parse(print_query(parse(q))) == parse(q)`` — the printed text is valid
LogsQL that reparses to the identical AST (tests/test_printer_roundtrip.py
drives the reference's whole success corpus through this property).

Printing conventions favor explicitness over prettiness: values are
JSON-quoted whenever they are not plainly word-safe, result names are
always spelled with ``as``, and resolved ``_time`` bounds are emitted as
nanosecond-precision RFC3339 instants.
"""

from __future__ import annotations

import datetime as _dt
import json
import re

from victorialogs_spark.logsql import ast as A

NS = 10**9
_INF_LO = -(2**62)
_INF_HI = 2**62

# bare-safe tokens: never collide with syntax and relex as one token
_WORD_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")


import functools


@functools.lru_cache(maxsize=1)
def _reserved() -> frozenset:
    from victorialogs_spark.logsql.parser import _PIPE_NAMES, _STATS_FUNCS

    return frozenset(_PIPE_NAMES) | frozenset(_STATS_FUNCS) | {
        "and", "or", "not", "in", "as", "by", "if", "inf", "options",
        "seq", "exact", "i", "range", "contains_all", "contains_any",
        "eq_field", "le_field", "lt_field", "len_range", "string_range",
        "ipv4_range", "value_type", "offset", "limit",
    }


def _q(s: str) -> str:
    """Quote a value: bare if word-safe (and not syntax-significant),
    JSON-quoted otherwise."""
    if _WORD_RE.match(s) and s.lower() not in _reserved():
        return s
    return json.dumps(s, ensure_ascii=False)


def _qs(s: str) -> str:
    """Quote a string VALUE token like the reference's
    quoteStringTokenIfNeeded: bare when word-safe AND not number-like
    (a bare '12' would reparse as a number token)."""
    if s and (s[0] in "0123456789.+-" or s[:3].lower() == "inf"):
        return json.dumps(s, ensure_ascii=False)
    return _q(s)


def _qf(name: str) -> str:
    """Quote a field name. Names colliding with pipe/stats keywords MUST
    be quoted too: a bare 'stats:foo' is rejected at filter start and a
    bare field named 'not' reparses as negation. Wildcards ('*',
    'prefix*') must stay UNQUOTED — a JSON-quoted star reparses as a
    literal field name and silently changes semantics (r15 finding via
    the count(*) canonical form)."""
    if name == "*":
        return name
    if name.endswith("*"):
        return _qf(name[:-1]) + "*"
    if _WORD_RE.match(name) and name.lower() not in _reserved():
        return name
    return json.dumps(name, ensure_ascii=False)


def _num(v: float) -> str:
    if v == float("inf"):
        return "inf"
    if v == float("-inf"):
        return "-inf"
    if v == int(v) and abs(v) < 2**62:
        return str(int(v))
    return repr(v)


def _ipv4(v: int) -> str:
    return ".".join(str((v >> s) & 0xFF) for s in (24, 16, 8, 0))


def _iso_ns(ns: int) -> str:
    """Nanosecond-precision RFC3339 instant (always with 9-digit frac so
    the parser resolves it to exactly this instant)."""
    sec, frac = divmod(ns, NS)
    base = _dt.datetime.fromtimestamp(sec, tz=_dt.timezone.utc)
    return base.strftime("%Y-%m-%dT%H:%M:%S") + f".{frac:09d}Z"


def _duration_ns(ns: int) -> str:
    """Duration in a parse_duration_ns-compatible spelling."""
    if ns == 0:
        return "0s"
    out = []
    if ns < 0:
        out.append("-")
        ns = -ns
    for unit, width in (("w", 7 * 86400 * NS), ("d", 86400 * NS),
                        ("h", 3600 * NS), ("m", 60 * NS), ("s", NS),
                        ("ms", 10**6), ("µs", 10**3), ("ns", 1)):
        if ns >= width:
            k, ns = divmod(ns, width)
            out.append(f"{k}{unit}")
    return "".join(out)


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def _pfx(field: str) -> str:
    """Field prefix (omitted for the default _msg target)."""
    return "" if field in ("", "_msg") else _qf(field) + ":"


def print_filter(f: A.Filter) -> str:
    if isinstance(f, A.FNoop):
        return "*"
    if isinstance(f, A.FAnd):
        # parenthesize nested bool nodes: the parser does NOT flatten
        # nested AND/OR (the reference flattens only in optimize()), so
        # the printed text must preserve the tree shape exactly
        parts = []
        for c in f.children:
            s = print_filter(c)
            if isinstance(c, (A.FOr, A.FAnd)):
                s = f"({s})"
            parts.append(s)
        return " ".join(parts)
    if isinstance(f, A.FOr):
        parts = []
        for c in f.children:
            s = print_filter(c)
            if isinstance(c, A.FOr):
                s = f"({s})"
            parts.append(s)
        return " or ".join(parts)
    if isinstance(f, A.FNot):
        s = print_filter(f.child)
        if isinstance(f.child, (A.FAnd, A.FOr)):
            s = f"({s})"
        return f"!{s}"
    if isinstance(f, A.FPhrase):
        body = _q(f.phrase) if f.phrase else '""'
        if f.case_insensitive:
            return f"{_pfx(f.field)}i({body})"
        return f"{_pfx(f.field)}{body}"
    if isinstance(f, A.FPrefix):
        body = json.dumps(f.prefix, ensure_ascii=False) + "*"
        if f.case_insensitive:
            return f"{_pfx(f.field)}i({body})"
        return f"{_pfx(f.field)}{body}"
    if isinstance(f, A.FExact):
        return f"{_pfx(f.field)}exact({json.dumps(f.value, ensure_ascii=False)})"
    if isinstance(f, A.FExactPrefix):
        return (f"{_pfx(f.field)}exact("
                f"{json.dumps(f.prefix, ensure_ascii=False)}*)")
    if isinstance(f, A.FIn):
        vals = ",".join(_qs(v) for v in f.values)
        return f"{_pfx(f.field)}in({vals})"
    if isinstance(f, A.FInSubquery):
        return f"{_pfx(f.field)}in({print_query(f.query)})"
    if isinstance(f, A.FContains):
        name = "contains_all" if f.require_all else "contains_any"
        if f.subquery is not None:
            return f"{_pfx(f.field)}{name}({print_query(f.subquery)})"
        vals = ",".join(_qs(v) for v in f.values)
        return f"{_pfx(f.field)}{name}({vals})"
    if isinstance(f, A.FSeq):
        vals = ",".join(_qs(v) for v in f.values)
        return f"{_pfx(f.field)}seq({vals})"
    if isinstance(f, A.FRegexp):
        return f"{_pfx(f.field)}~{json.dumps(f.pattern, ensure_ascii=False)}"
    if isinstance(f, A.FRange):
        # comparison spellings only when the reparse reproduces the exact
        # include flags: '>lo' gives (lo, inf] and '<hi' gives [-inf, hi)
        if (f.hi == float("inf") and f.include_hi
                and f.lo != float("-inf")):
            op = ">=" if f.include_lo else ">"
            return f"{_pfx(f.field)}{op}{_num(f.lo)}"
        if (f.lo == float("-inf") and f.include_lo
                and f.hi != float("inf")):
            op = "<=" if f.include_hi else "<"
            return f"{_pfx(f.field)}{op}{_num(f.hi)}"
        lb = "[" if f.include_lo else "("
        rb = "]" if f.include_hi else ")"
        return f"{_pfx(f.field)}range{lb}{_num(f.lo)}, {_num(f.hi)}{rb}"
    if isinstance(f, A.FIPv4Range):
        return f"{_pfx(f.field)}ipv4_range({_ipv4(f.lo)}, {_ipv4(f.hi)})"
    if isinstance(f, A.FStringRange):
        return (f"{_pfx(f.field)}string_range("
                f"{json.dumps(f.lo, ensure_ascii=False)}, "
                f"{json.dumps(f.hi, ensure_ascii=False)})")
    if isinstance(f, A.FLenRange):
        hi = "inf" if f.hi >= 2**62 else str(f.hi)
        return f"{_pfx(f.field)}len_range({f.lo}, {hi})"
    if isinstance(f, A.FValueType):
        return (f"{_pfx(f.field)}value_type("
                f"{json.dumps(f.value_type, ensure_ascii=False)})")
    if isinstance(f, A.FEqField):
        return f"{_pfx(f.field)}eq_field({_qf(f.other)})"
    if isinstance(f, A.FCmpField):
        kw = "le_field" if f.allow_eq else "lt_field"
        return f"{_pfx(f.field)}{kw}({_qf(f.other)})"
    if isinstance(f, A.FTime):
        lo, hi = f.lo_ns, f.hi_ns
        if lo <= _INF_LO and hi >= _INF_HI:
            return "_time:[0, 9999]"  # effectively unbounded (not produced)
        if lo <= _INF_LO:
            return f"_time:<={_iso_ns(hi)}"
        if hi >= _INF_HI:
            return f"_time:>={_iso_ns(lo)}"
        return f"_time:[{_iso_ns(lo)}, {_iso_ns(hi)}]"
    if isinstance(f, A.FDayRange):
        lb = "[" if f.include_lo else "("
        rb = "]" if f.include_hi else ")"
        lo = f"{f.lo_minute // 60:02d}:{f.lo_minute % 60:02d}"
        hi = f"{f.hi_minute // 60:02d}:{f.hi_minute % 60:02d}"
        s = f"_time:day_range{lb}{lo}, {hi}{rb}"
        if f.offset_ns:
            s += f" offset {_duration_ns(f.offset_ns)}"
        return s
    if isinstance(f, A.FWeekRange):
        days = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]
        lb = "[" if f.include_lo else "("
        rb = "]" if f.include_hi else ")"
        s = f"_time:week_range{lb}{days[f.lo_day]}, {days[f.hi_day]}{rb}"
        if f.offset_ns:
            s += f" offset {_duration_ns(f.offset_ns)}"
        return s
    if isinstance(f, A.FStream):
        terms = []
        for matchers in f.or_terms:
            # ',' with no space: the reference's streamTagFilter String()
            # (pinned by TestNewTestStreamFilterSuccess — r15 corpus)
            terms.append(",".join(
                f"{_qf(m.label)}{m.op}{json.dumps(m.value, ensure_ascii=False)}"
                for m in matchers
            ))
        return "{" + " or ".join(terms) + "}"
    if isinstance(f, A.FStreamId):
        vals = ", ".join(json.dumps(v, ensure_ascii=False) for v in f.ids)
        return f"_stream_id:in({vals})"
    raise ValueError(f"cannot print filter node {type(f).__name__}"
                     " (planner-internal node?)")


# ---------------------------------------------------------------------------
# pipes
# ---------------------------------------------------------------------------

def _if(cond: A.Filter | None) -> str:
    return f" if ({print_filter(cond)})" if cond is not None else ""


def _fields_parens(fields: list[str]) -> str:
    return "(" + ", ".join(_qf(x) for x in fields) + ")"


def _stats_func_core(sf: A.StatsFunc) -> str:
    """statsFunc.String() parity: the func with args and its own
    'limit' clause, WITHOUT the pipe-level if-clause / result alias.
    quantile drops an all-match field list (stats_quantile.go:24-30)
    and prints phi with its source spelling (phiStr)."""
    if sf.name == "quantile":
        phi = sf.extra.get("phi_str")
        if not phi:
            v = sf.extra.get("phi")
            phi = f"{v:g}" if v is not None else "0.5"
        shown = [] if "*" in sf.fields else [_qf(x) for x in sf.fields]
        args = phi + (", " + ", ".join(shown) if shown else "")
    else:
        args = ", ".join(_qf(x) for x in sf.fields)
    s = f"{sf.name}({args})"
    if sf.extra.get("limit"):
        s += f" limit {sf.extra['limit']}"
    return s


def _stats_func(sf: A.StatsFunc) -> str:
    return _stats_func_core(sf) + _if(sf.cond) + f" as {_qf(sf.result)}"


def _by_field(bf: A.ByField) -> str:
    s = _qf(bf.name)
    if bf.ipv4_mask is not None:
        return f"{s}:/{bf.ipv4_mask}"
    if getattr(bf, "bucket_size_str", None):
        # byStatsField.String (pipe_stats.go:1511): source spellings
        # print verbatim ('week' stays 'week', '6.5h' stays '6.5h')
        s += f":{bf.bucket_size_str}"
        if bf.bucket_offset_str:
            s += f" offset {bf.bucket_offset_str}"
        return s
    if bf.bucket_size is not None:
        if bf.name == "_time":
            b = _duration_ns(int(bf.bucket_size * NS))
            s += f":{b}"
            if bf.bucket_offset:
                s += f" offset {_duration_ns(int(bf.bucket_offset * NS))}"
        else:
            s += f":{_num(bf.bucket_size)}"
            if bf.bucket_offset:
                s += f" offset {_num(bf.bucket_offset)}"
    return s


def _sort_fields(fields: list[A.SortField]) -> str:
    return "(" + ", ".join(
        _qf(sf.name) + (" desc" if sf.desc else "") for sf in fields
    ) + ")"


def _rank_str(name: str) -> str:
    # rankFieldNameString: the default name prints as bare ' rank'
    if name == "rank":
        return " rank"
    return f" rank as {_qf(name)}"


def print_pipe(p: A.Pipe) -> str:
    if isinstance(p, A.PFields):
        return "fields " + ", ".join(_qf(x) for x in p.fields)
    if isinstance(p, A.PDelete):
        return "delete " + ", ".join(_qf(x) for x in p.fields)
    if isinstance(p, A.PCopy):
        return "copy " + ", ".join(f"{_qf(a)} as {_qf(b)}" for a, b in p.pairs)
    if isinstance(p, A.PRename):
        return "rename " + ", ".join(f"{_qf(a)} as {_qf(b)}" for a, b in p.pairs)
    if isinstance(p, A.PFilter):
        return "filter " + print_filter(p.filter)
    if isinstance(p, A.PLimit):
        return f"limit {p.n}"
    if isinstance(p, A.POffset):
        return f"offset {p.n}"
    if isinstance(p, A.PSort):
        # canonical form mirrors pipe_sort.go String(): 'sort' is bare
        # without by-fields, offset precedes limit, default rank name
        # prints as bare ' rank'
        s = "sort by " + _sort_fields(p.fields) if p.fields else "sort"
        if p.desc:
            s += " desc"
        if p.partition_by:
            s += " partition by " + _fields_parens(p.partition_by)
        if p.offset:
            s += f" offset {p.offset}"
        if p.limit is not None:
            s += f" limit {p.limit}"
        if p.rank_name:
            s += _rank_str(p.rank_name)
        return s
    if isinstance(p, A.PFirst):
        kw = "last" if p.desc else "first"
        s = kw if p.n == 1 else f"{kw} {p.n}"
        if p.fields:
            s += " by " + _sort_fields(p.fields)
        if p.partition_by:
            s += " partition by " + _fields_parens(p.partition_by)
        if p.rank_name:
            s += _rank_str(p.rank_name)
        return s
    if isinstance(p, A.PStats):
        kw = "stats_remote" if p.mode == "remote" else "stats"
        s = kw
        if p.by:
            s += " by (" + ", ".join(_by_field(b) for b in p.by) + ")"
        s += " " + ", ".join(_stats_func(f) for f in p.funcs)
        return s
    if isinstance(p, A.PMath):
        return "math " + ", ".join(
            f"{_math(e)} as {_qf(name)}" for e, name in p.exprs
        )
    if isinstance(p, A.PExtract):
        s = "extract" + _if(p.cond)
        s += f" {json.dumps(p.pattern, ensure_ascii=False)}"
        if p.from_field != "_msg":
            s += f" from {_qf(p.from_field)}"
        if p.keep_original_fields:
            s += " keep_original_fields"
        if p.skip_empty_results:
            s += " skip_empty_results"
        return s
    if isinstance(p, A.PExtractRegexp):
        s = "extract_regexp" + _if(p.cond)
        s += f" {json.dumps(p.pattern, ensure_ascii=False)}"
        if p.from_field != "_msg":
            s += f" from {_qf(p.from_field)}"
        if p.keep_original_fields:
            s += " keep_original_fields"
        if p.skip_empty_results:
            s += " skip_empty_results"
        return s
    if isinstance(p, A.PReplace):
        kw = "replace_regexp" if p.regex else "replace"
        s = kw + _if(p.cond)
        s += f" ({_qs(p.old)}, {_qs(p.new)})"
        if p.field_name != "_msg":
            s += f" at {_qf(p.field_name)}"
        if p.limit:
            s += f" limit {p.limit}"
        return s
    if isinstance(p, A.PFormat):
        s = "format" + _if(p.cond)
        s += f" {_qs(p.pattern)}"
        if p.result != "_msg":
            s += f" as {_qf(p.result)}"
        if p.keep_original_fields:
            s += " keep_original_fields"
        if p.skip_empty_results:
            s += " skip_empty_results"
        return s
    if isinstance(p, (A.PUnpackJson, A.PUnpackLogfmt)):
        kw = "unpack_json" if isinstance(p, A.PUnpackJson) else "unpack_logfmt"
        s = kw + _if(p.cond)
        if p.from_field != "_msg":
            s += f" from {_qf(p.from_field)}"
        if p.fields:
            s += " fields " + _fields_parens(p.fields)
        if p.result_prefix:
            s += f" result_prefix {_qs(p.result_prefix)}"
        if p.keep_original_fields:
            s += " keep_original_fields"
        if p.skip_empty_results:
            s += " skip_empty_results"
        return s
    if isinstance(p, A.PUnpackSyslog):
        s = "unpack_syslog" + _if(p.cond)
        if p.from_field != "_msg":
            s += f" from {_qf(p.from_field)}"
        if p.offset_ns:
            s += f" offset {_duration_ns(p.offset_ns)}"
        if p.result_prefix:
            s += f" result_prefix {_qs(p.result_prefix)}"
        if p.keep_original_fields:
            s += " keep_original_fields"
        return s
    if isinstance(p, A.PUnpackWords):
        s = "unpack_words"
        if p.src != "_msg":
            s += f" from {_qf(p.src)}"
        if p.dst != p.src:
            s += f" as {_qf(p.dst)}"
        if p.limit:
            s += f" limit {p.limit}"
        if p.drop_duplicates:
            s += " drop_duplicates"
        return s
    if isinstance(p, A.PUnroll):
        return "unroll" + _if(p.cond) + " by " + _fields_parens(p.fields)
    if isinstance(p, (A.PPackJson, A.PPackLogfmt)):
        kw = "pack_json" if isinstance(p, A.PPackJson) else "pack_logfmt"
        s = kw
        if p.fields:
            s += " fields " + _fields_parens(p.fields)
        if p.result != "_msg":
            s += f" as {_qf(p.result)}"
        return s
    if isinstance(p, A.PJoin):
        s = f"join by {_fields_parens(p.by)} ({print_query(p.query)})"
        if p.inner:
            s += " inner"
        if p.prefix:
            s += f" prefix {_qf(p.prefix)}"
        return s
    if isinstance(p, A.PUnion):
        return f"union ({print_query(p.query)})"
    if isinstance(p, A.PUniq):
        s = "uniq"
        if p.by:
            s += " by " + _fields_parens(p.by)
        if p.hits_field:
            s += " with hits"
        if p.limit:
            s += f" limit {p.limit}"
        return s
    if isinstance(p, A.PTop):
        s = "top" if p.n == 10 else f"top {p.n}"
        if p.by:
            s += " by " + _fields_parens(p.by)
        if p.hits_field != "hits":
            s += f" hits as {_qf(p.hits_field)}"
        if p.rank_name:
            s += _rank_str(p.rank_name)
        return s
    if isinstance(p, A.PFacets):
        s = "facets" if p.n == 10 else f"facets {p.n}"
        if p.max_values_per_field != 1000:
            s += f" max_values_per_field {p.max_values_per_field}"
        if p.max_value_len != 128:
            s += f" max_value_len {p.max_value_len}"
        if p.keep_const_fields:
            s += " keep_const_fields"
        return s
    if isinstance(p, A.PFieldNames):
        if p.result == "name":
            return "field_names"
        return f"field_names as {_qf(p.result)}"
    if isinstance(p, A.PFieldValues):
        s = f"field_values {_qf(p.field_name)}"
        if p.limit:
            s += f" limit {p.limit}"
        return s
    if isinstance(p, A.PLen):
        return f"len({_qf(p.field_name)})" + (
            f" as {_qf(p.result)}" if p.result != "_msg" else ""
        )
    if isinstance(p, A.PJsonArrayLen):
        return f"json_array_len({_qf(p.field_name)})" + (
            f" as {_qf(p.result)}" if p.result != "_msg" else ""
        )
    if isinstance(p, A.PHash):
        return f"hash({_qf(p.field_name)})" + (
            f" as {_qf(p.result)}" if p.result != "_msg" else ""
        )
    if isinstance(p, A.PSample):
        return f"sample {p.n}"
    if isinstance(p, A.PCollapseNums):
        s = "collapse_nums" + _if(p.cond)
        if p.field_name != "_msg":
            s += f" at {_qf(p.field_name)}"
        if p.prettify:
            s += " prettify"
        return s
    if isinstance(p, A.PDecolorize):
        s = "decolorize"
        if p.field_name != "_msg":
            s += f" {_qf(p.field_name)}"
        return s
    if isinstance(p, A.PDropEmptyFields):
        return "drop_empty_fields"
    if isinstance(p, A.PStreamContext):
        s = "stream_context"
        if p.before:
            s += f" before {p.before}"
        if p.after:
            s += f" after {p.after}"
        if p.time_window_ns != 3600 * NS:
            s += f" time_window {_duration_ns(p.time_window_ns)}"
        return s
    if isinstance(p, A.PBlocksCount):
        if p.result == "blocks_count":
            return "blocks_count"
        return f"blocks_count as {_qf(p.result)}"
    if isinstance(p, A.PBlockStats):
        return "block_stats"
    raise ValueError(f"cannot print pipe node {type(p).__name__}")


# ---------------------------------------------------------------------------
# math expressions
# ---------------------------------------------------------------------------

_MATH_PRIO = {"^": 1, "*": 2, "/": 2, "%": 2, "+": 3, "-": 3, "&": 4,
              "xor": 5, "or": 6, "default": 10}


def math_expr_name(e: A.MathExpr) -> str:
    """The reference's mathExpr.String(): minimal parens by operator
    priority — used as the RESULT FIELD NAME when a math entry has no
    'as name' (parseMathEntry: resultField = me.String(); r15
    pipe-semantics corpus finding). _math() below stays fully
    parenthesized for round-trip printing (reparses identically)."""
    if isinstance(e, A.MNum):
        return _num(e.value)
    if isinstance(e, A.MField):
        return _qf(e.name)
    if isinstance(e, A.MUnary):
        arg = math_expr_name(e.arg)
        if isinstance(e.arg, A.MBinary):
            arg = "(" + arg + ")"
        return e.op + arg
    if isinstance(e, A.MBinary):
        pr = _MATH_PRIO.get(e.op, 3)
        ls, rs = math_expr_name(e.left), math_expr_name(e.right)
        if isinstance(e.left, A.MBinary) and _MATH_PRIO.get(e.left.op, 3) > pr:
            ls = "(" + ls + ")"
        if isinstance(e.right, A.MBinary) and _MATH_PRIO.get(e.right.op, 3) >= pr:
            rs = "(" + rs + ")"
        return f"{ls} {e.op} {rs}"
    if isinstance(e, A.MFunc):
        return f"{e.name}({', '.join(math_expr_name(a) for a in e.args)})"
    raise ValueError(f"cannot name math node {type(e).__name__}")


def _math(e: A.MathExpr) -> str:
    if isinstance(e, A.MNum):
        return _num(e.value)
    if isinstance(e, A.MField):
        return _qf(e.name)
    if isinstance(e, A.MUnary):
        return f"({e.op}{_math(e.arg)})"
    if isinstance(e, A.MBinary):
        return f"({_math(e.left)} {e.op} {_math(e.right)})"
    if isinstance(e, A.MFunc):
        return f"{e.name}({', '.join(_math(a) for a in e.args)})"
    raise ValueError(f"cannot print math node {type(e).__name__}")


# ---------------------------------------------------------------------------
# query
# ---------------------------------------------------------------------------

def print_query(q: A.Query) -> str:
    parts = []
    if q.options:
        opts = ", ".join(f"{k}={v}" for k, v in q.options.items())
        parts.append(f"options({opts})")
    parts.append(print_filter(q.filter))
    s = " ".join(parts)
    for p in q.pipes:
        s += " | " + print_pipe(p)
    return s
