"""Parser round-trip-ish tests, modeled on the reference parser corpus
(/root/reference/lib/logstorage/parser_test.go)."""

import pytest

from victorialogs_spark.logsql import ast as A
from victorialogs_spark.logsql.parser import ParseError, parse_query, parse_time_point

NS = 10**9


def test_word_filter():
    q = parse_query("error")
    assert isinstance(q.filter, A.FPhrase)
    assert q.filter.field == "_msg"
    assert q.filter.phrase == "error"
    assert q.pipes == []


def test_field_word():
    q = parse_query("event_type:error")
    assert q.filter == A.FPhrase("event_type", "error")


def test_phrase_quoted():
    q = parse_query('"connection refused"')
    assert q.filter == A.FPhrase("_msg", "connection refused")


def test_prefix():
    q = parse_query("err*")
    assert q.filter == A.FPrefix("_msg", "err")


def test_field_scoped_group():
    # field scope distributes over parens (parser.go parseParensFilter)
    q = parse_query("level:(error or warn)")
    assert q.filter == A.FOr([A.FPhrase("level", "error"), A.FPhrase("level", "warn")])
    q = parse_query("foo:(bar baz)")
    assert q.filter == A.FAnd([A.FPhrase("foo", "bar"), A.FPhrase("foo", "baz")])
    q = parse_query("foo:(not bar)")
    assert q.filter == A.FNot(A.FPhrase("foo", "bar"))
    # nested colon tokens become phrases under the scope, not nested fields
    q = parse_query("foo:(_time:abc or not z)")
    assert q.filter == A.FOr(
        [A.FPhrase("foo", "_time:abc"), A.FNot(A.FPhrase("foo", "z"))]
    )


def test_compound_suffix_glue():
    # mid-token quote / '{' / '=' glue into one phrase (getCompoundSuffix)
    q = parse_query('foo:seq(foo"bar-baz+aa, b)')
    assert q.filter == A.FSeq("foo", ['foo"bar-baz+aa', "b"])
    q = parse_query('foo:(_msg:a :x _stream:{c="d"})')
    assert q.filter == A.FAnd(
        [
            A.FPhrase("foo", "_msg:a"),
            A.FPhrase("foo", "x"),
            A.FPhrase("foo", '_stream:{c="d"}'),
        ]
    )


def test_trailing_comma_and_value_type_args():
    q = parse_query("ipv4_range(1.2.3.4,)")
    assert q.filter == A.FIPv4Range("_msg", 16909060, 16909060)
    q = parse_query("x:value_type(dict:x)")
    assert q.filter == A.FValueType("x", "dict:x")


def test_and_or_not():
    q = parse_query("error OR warn")
    assert isinstance(q.filter, A.FOr)
    q = parse_query("error warn")
    assert isinstance(q.filter, A.FAnd)
    q = parse_query("error AND warn")
    assert isinstance(q.filter, A.FAnd) and len(q.filter.children) == 2
    q = parse_query("!error")
    assert isinstance(q.filter, A.FNot)
    q = parse_query("-error")
    assert isinstance(q.filter, A.FNot)
    q = parse_query("NOT error")
    assert isinstance(q.filter, A.FNot)


def test_parens():
    q = parse_query("(error OR warn) fatal")
    assert isinstance(q.filter, A.FAnd)
    assert isinstance(q.filter.children[0], A.FOr)


def test_exact():
    q = parse_query("f:exact(abc)")
    assert q.filter == A.FExact("f", "abc")
    q = parse_query("f:=abc")
    assert q.filter == A.FExact("f", "abc")
    q = parse_query('f:exact("a b"*)')
    assert q.filter == A.FExactPrefix("f", "a b")
    q = parse_query("f:!=abc")
    assert q.filter == A.FNot(A.FExact("f", "abc"))


def test_in():
    q = parse_query("f:in(a, b, c)")
    assert q.filter == A.FIn("f", ["a", "b", "c"])


def test_in_subquery():
    q = parse_query("user_id:in(event_type:error | fields user_id)")
    assert isinstance(q.filter, A.FInSubquery)
    assert q.filter.field == "user_id"
    assert len(q.filter.query.pipes) == 1


def test_contains():
    q = parse_query("f:contains_all(foo, bar)")
    assert q.filter == A.FContains("f", ["foo", "bar"], True)
    q = parse_query("f:contains_any(foo, bar)")
    assert q.filter == A.FContains("f", ["foo", "bar"], False)


def test_seq():
    q = parse_query('f:seq("a", "b")')
    assert q.filter == A.FSeq("f", ["a", "b"])


def test_regexp():
    q = parse_query('f:~"err.*"')
    assert q.filter == A.FRegexp("f", "err.*")
    q = parse_query('f:re("err.*")')
    assert q.filter == A.FRegexp("f", "err.*")
    q = parse_query('f:!~"x"')
    assert q.filter == A.FNot(A.FRegexp("f", "x"))


def test_range():
    q = parse_query("f:>10")
    assert q.filter == A.FRange("f", 10.0, float("inf"), False, True)
    q = parse_query("f:>=10")
    assert q.filter == A.FRange("f", 10.0, float("inf"), True, True)
    q = parse_query("f:<10.5")
    assert q.filter == A.FRange("f", float("-inf"), 10.5, True, False)
    q = parse_query("f:range(10, 20]")
    assert q.filter == A.FRange("f", 10.0, 20.0, False, True)
    q = parse_query("f:range[10, 20)")
    assert q.filter == A.FRange("f", 10.0, 20.0, True, False)
    q = parse_query("f:>10KB")
    assert q.filter.lo == 10_000.0
    q = parse_query("f:>1_000")
    assert q.filter.lo == 1000.0


def test_ipv4_range():
    q = parse_query("ip:ipv4_range(1.2.3.0, 1.2.3.255)")
    assert q.filter == A.FIPv4Range("ip", 0x01020300, 0x010203FF)
    q = parse_query("ip:ipv4_range(1.2.3.0/24)")
    assert q.filter == A.FIPv4Range("ip", 0x01020300, 0x010203FF)


def test_string_range():
    q = parse_query("f:string_range(a, b)")
    assert q.filter == A.FStringRange("f", "a", "b")


def test_len_range():
    q = parse_query("f:len_range(1, 10)")
    assert q.filter == A.FLenRange("f", 1, 10)


def test_field_cmp():
    q = parse_query("a:eq_field(b)")
    assert q.filter == A.FEqField("a", "b")
    q = parse_query("a:le_field(b)")
    assert q.filter == A.FCmpField("a", "b", True)
    q = parse_query("a:lt_field(b)")
    assert q.filter == A.FCmpField("a", "b", False)


def test_time_filters():
    q = parse_query("_time:5m", timestamp_ns=1000 * NS)
    assert q.filter == A.FTime(1000 * NS - 300 * NS, 1000 * NS)
    q = parse_query("_time:[2024-01-01, 2024-01-02]")
    lo, _ = parse_time_point("2024-01-01")
    _, hi = parse_time_point("2024-01-02")
    assert q.filter == A.FTime(lo, hi)
    assert q.time_range == (lo, hi)
    q = parse_query("_time:2024-01-01")
    lo, hi = parse_time_point("2024-01-01")
    assert q.filter == A.FTime(lo, hi)


def test_time_point_parse():
    lo, hi = parse_time_point("2024")
    assert hi - lo == 366 * 86400 * NS - 1  # 2024 is a leap year
    lo, hi = parse_time_point("2024-01-01T10:20:30Z")
    assert hi - lo == NS - 1
    lo2, _ = parse_time_point("2024-01-01T12:20:30+02:00")
    assert lo2 == lo


def test_day_week_range():
    q = parse_query("_time:day_range[08:00, 18:00)")
    assert q.filter == A.FDayRange(480, 1080, True, False, 0)
    q = parse_query("_time:week_range[Mon, Fri]")
    assert q.filter == A.FWeekRange(1, 5, True, True, 0)


def test_stream_filter():
    q = parse_query('{app="nginx", env!="dev"}')
    assert isinstance(q.filter, A.FStream)
    [term] = q.filter.or_terms
    assert term[0] == A.StreamLabelMatcher("app", "=", "nginx")
    assert term[1] == A.StreamLabelMatcher("env", "!=", "dev")


def test_stream_or():
    q = parse_query('{app="a" or app="b"}')
    assert len(q.filter.or_terms) == 2


def test_pipes_fields():
    q = parse_query("* | fields f1, f2")
    assert q.pipes == [A.PFields(["f1", "f2"])]
    q = parse_query("* | delete f1")
    assert q.pipes == [A.PDelete(["f1"])]
    q = parse_query("* | copy a as b")
    assert q.pipes == [A.PCopy([("a", "b")])]
    q = parse_query("* | rename a as b, c as d")
    assert q.pipes == [A.PRename([("a", "b"), ("c", "d")])]


def test_pipe_limit_offset():
    q = parse_query("* | limit 10 | offset 5")
    assert q.pipes == [A.PLimit(10), A.POffset(5)]


def test_pipe_sort():
    q = parse_query("* | sort by (a, b desc) desc limit 10 offset 2 rank as r")
    p = q.pipes[0]
    assert p.fields == [A.SortField("a", False), A.SortField("b", True)]
    assert p.desc and p.limit == 10 and p.offset == 2 and p.rank_name == "r"
    q = parse_query("* | sort by (a) partition by (h) limit 3")
    assert q.pipes[0].partition_by == ["h"]


def test_pipe_first_last():
    q = parse_query("* | first 5 by (x)")
    p = q.pipes[0]
    assert p.n == 5 and p.fields == [A.SortField("x", False)] and not p.desc
    q = parse_query("* | last 3 by (y)")
    assert q.pipes[0].desc


def test_pipe_stats():
    q = parse_query("* | stats by (host) count() as hits")
    p = q.pipes[0]
    assert p.by == [A.ByField("host")]
    # empty arg list ≡ '*' (stats_avg.go:142-144 parseStatsFuncFieldFilters)
    assert p.funcs == [A.StatsFunc("count", ["*"], "hits", {}, None)]

    q = parse_query("* | stats count() hits, sum(x) s, avg(y) as a")
    assert [f.result for f in q.pipes[0].funcs] == ["hits", "s", "a"]

    q = parse_query("* | stats by (_time:1h, host) count()")
    bf = q.pipes[0].by[0]
    assert bf.name == "_time" and bf.bucket_size == 3600.0

    q = parse_query("* | stats by (size:10K) count()")
    assert q.pipes[0].by[0].bucket_size == 10_000

    q = parse_query("* | stats quantile(0.95, dur) as p95")
    f = q.pipes[0].funcs[0]
    assert f.name == "quantile" and f.extra["phi"] == 0.95 and f.fields == ["dur"]

    q = parse_query("* | stats count() if (error) errs")
    f = q.pipes[0].funcs[0]
    assert f.cond is not None and f.result == "errs"


def test_pipe_stats_implicit_by():
    q = parse_query("* | by (host) count()")
    assert isinstance(q.pipes[0], A.PStats)


def test_pipe_stats_remote():
    # cluster-internal spelling (pipe_stats.go:1258-1260) — same AST as
    # stats apart from the mode flag; Spark's partial+final aggregate is
    # the remote/local split, so planning is identical
    q = parse_query("* | stats_remote count() x")
    p = q.pipes[0]
    assert isinstance(p, A.PStats) and p.mode == "remote"
    assert p.funcs[0].result == "x"
    q2 = parse_query("* | stats_remote by (host) count() x, sum(v) s")
    assert q2.pipes[0].mode == "remote" and len(q2.pipes[0].funcs) == 2
    assert parse_query("* | stats count() x").pipes[0].mode == "default"


def test_pipe_math():
    q = parse_query("* | math (a + b) * 2 as c")
    p = q.pipes[0]
    e, name = p.exprs[0]
    assert name == "c"
    assert isinstance(e, A.MBinary) and e.op == "*"
    q = parse_query("* | math a + b * c as r")
    e, _ = q.pipes[0].exprs[0]
    assert e.op == "+" and isinstance(e.right, A.MBinary) and e.right.op == "*"
    q = parse_query("* | math max(a, b) as m, a default 0 as d")
    assert len(q.pipes[0].exprs) == 2


def test_pipe_extract():
    q = parse_query('* | extract "ip=<ip> port=<port>" from _msg')
    p = q.pipes[0]
    assert p.pattern == "ip=<ip> port=<port>" and p.from_field == "_msg"


def test_pipe_extract_regexp():
    q = parse_query('* | extract_regexp "(?P<ip>\\\\d+)" from x')
    assert q.pipes[0].from_field == "x"


def test_pipe_replace():
    q = parse_query('* | replace ("a", "b") at f limit 2')
    p = q.pipes[0]
    assert (p.old, p.new, p.field_name, p.limit, p.regex) == ("a", "b", "f", 2, False)
    q = parse_query('* | replace_regexp ("a.", "b") at f')
    assert q.pipes[0].regex


def test_pipe_format():
    q = parse_query('* | format "<a>:<b>" as out')
    p = q.pipes[0]
    assert p.pattern == "<a>:<b>" and p.result == "out"


def test_pipe_unpack():
    q = parse_query("* | unpack_json from props")
    assert q.pipes[0].from_field == "props"
    q = parse_query('* | unpack_json from p fields (a, b) result_prefix "x_"')
    p = q.pipes[0]
    assert p.fields == ["a", "b"] and p.result_prefix == "x_"
    q = parse_query("* | unpack_logfmt from m")
    assert q.pipes[0].from_field == "m"
    q = parse_query("* | unpack_words _msg as words limit 4")
    p = q.pipes[0]
    assert p.src == "_msg" and p.dst == "words" and p.limit == 4


def test_pipe_unroll():
    q = parse_query("* | unroll (tags)")
    assert q.pipes[0].fields == ["tags"]


def test_pipe_pack():
    q = parse_query("* | pack_json as blob fields (a, b)")
    p = q.pipes[0]
    assert p.result == "blob" and p.fields == ["a", "b"]


def test_pipe_join_union():
    q = parse_query("* | join by (k) (error | stats by (k) count() c) inner")
    p = q.pipes[0]
    assert p.by == ["k"] and p.inner
    q = parse_query("* | union (warning)")
    assert isinstance(q.pipes[0], A.PUnion)


def test_pipe_uniq_top():
    q = parse_query("* | uniq by (a, b) with hits limit 5")
    p = q.pipes[0]
    assert p.by == ["a", "b"] and p.hits_field == "hits" and p.limit == 5
    q = parse_query("* | top 7 by (x) rank as r")
    p = q.pipes[0]
    assert p.n == 7 and p.by == ["x"] and p.rank_name == "r"


def test_pipe_misc():
    q = parse_query("* | len(f) as l")
    assert q.pipes[0] == A.PLen("f", "l")
    q = parse_query("* | hash(f) as h")
    assert q.pipes[0] == A.PHash("f", "h")
    q = parse_query("* | sample 10")
    assert q.pipes[0] == A.PSample(10)
    q = parse_query("* | field_values event_type limit 3")
    assert q.pipes[0] == A.PFieldValues("event_type", 3)
    q = parse_query("* | field_names")
    assert isinstance(q.pipes[0], A.PFieldNames)
    q = parse_query("* | facets 5 max_values_per_field 100")
    p = q.pipes[0]
    assert p.n == 5 and p.max_values_per_field == 100
    q = parse_query("* | drop_empty_fields")
    assert isinstance(q.pipes[0], A.PDropEmptyFields)
    q = parse_query("* | decolorize f")
    assert q.pipes[0].field_name == "f"
    q = parse_query("* | collapse_nums at f")
    assert q.pipes[0].field_name == "f"


def test_implicit_filter_pipe():
    q = parse_query("* | fields a | error")
    assert isinstance(q.pipes[1], A.PFilter)


def test_query_options():
    q = parse_query("options(concurrency=4) error")
    assert q.options == {"concurrency": "4"}


def test_full_query():
    q = parse_query(
        '_time:5m {app="web"} error | stats by (host) count() as hits '
        "| sort by (hits) desc | limit 10"
    )
    assert isinstance(q.filter, A.FAnd)
    assert len(q.pipes) == 3


def test_parse_failures():
    for bad in [
        "f:range(1,",
        "| stats",
        "f:in(",
        '* | sort by (',
        "f:ipv4_range(999.1.1.1)",
    ]:
        with pytest.raises((ParseError, Exception)):
            parse_query(bad)


def test_number_literals():
    from victorialogs_spark.logsql.lexer import parse_number

    assert parse_number("10KiB") == 10 * 1024
    assert parse_number("1.5M") == 1_500_000
    assert parse_number("1h") == 3600 * NS
    assert parse_number("1h30m") == 5400 * NS
    assert parse_number("0x10") == 16.0
    assert parse_number("abc") is None


def test_malformed_queries_rejected():
    import pytest
    from victorialogs_spark.logsql.parser import ParseError, parse_query

    for bad in [
        "host:>",
        "host:>=",
        "_time:day_range[25:99, 26:00]",
        "_time:day_range[08:00, 99:00]",
        '* | replace ("a") at x',
        "v:range(5,)",
        "| stats",
    ]:
        with pytest.raises(ParseError):
            parse_query(bad)


def test_now_plus_arithmetic():
    """'now+30m' must parse (parse_duration_ns accepts a '+' prefix)."""
    from victorialogs_spark.logsql import ast as A
    from victorialogs_spark.logsql.parser import parse_query

    NOW = 1704067200_000000000
    q = parse_query("_time:now+30m", NOW)
    assert isinstance(q.filter, A.FTime)
    assert q.filter.lo_ns == q.filter.hi_ns == NOW + 30 * 60 * NS
    q2 = parse_query("_time:<now+1h", NOW)
    assert q2.filter.hi_ns == NOW + 3600 * NS - 1


def test_first_by_asc_keyword():
    """'asc' in a first/last by-list is the explicit default, not a field."""
    from victorialogs_spark.logsql.parser import parse_query

    q = parse_query("* | first 5 by (foo asc, bar desc)")
    p = q.pipes[0]
    assert [(f.name, f.desc) for f in p.fields] == [("foo", False), ("bar", True)]


def test_zero_arg_stats_functions():
    """sum()/min() parse as sum(*)/min(*) (stats_avg.go:142-144); row_min/
    row_max still need a non-wildcard source field (stats_row_max.go:
    parseStatsRowMax)."""
    import pytest

    from victorialogs_spark.logsql.parser import parse_query

    for q in ["* | stats sum() as s", "* | stats min() as m"]:
        sf = parse_query(q).pipes[0].funcs[0]
        assert sf.fields == ["*"]

    for q in ["* | stats row_min() as r", "* | stats row_max(a*) as r"]:
        with pytest.raises(Exception, match="source field"):
            parse_query(q)


def _dummy_df():
    class _D:
        columns = ["a", "b"]
        dtypes = [("a", "string"), ("b", "string")]
    return _D()


def test_time_comparison_reference_semantics():
    """_time comparison operators pin parser.go's exact bounds (r14
    review findings): durations carry AGE semantics under >/<
    (parseFilterTimeGt/Lt: '>1h' = OLDER than 1h), timestamp '>' and
    the exclusive '(' advance from the period's START (+1ns), and ')'
    backs off from the period's start (-1ns)."""
    from victorialogs_spark.logsql.parser import parse_query

    NOW = 1_700_000_000_000_000_000
    H = 3600 * 10**9
    JAN1 = 1704067200 * 10**9
    JAN2 = JAN1 + 86400 * 10**9
    cases = {
        "_time:>1h": (-(2**62), NOW - H - 1),
        "_time:>=1h": (-(2**62), NOW - H),
        "_time:<1h": (NOW - H + 1, NOW),
        "_time:<=1h": (NOW - H, NOW),
        "_time:(2024-01-01, 2024-01-02)": (JAN1 + 1, JAN2 - 1),
        "_time:[2024-01-01, 2024-01-02)": (JAN1, JAN2 - 1),
        "_time:>2024-01-01": (JAN1 + 1, 2**62),
        "_time:>=2024-01-01": (JAN1, 2**62),
        "_time:<2024-01-01": (-(2**62), JAN1 - 1),
        "_time:1h": (NOW - H, NOW),
    }
    for q, want in cases.items():
        f = parse_query(q, NOW).filter
        assert (f.lo_ns, f.hi_ns) == want, (q, f.lo_ns, f.hi_ns, want)
