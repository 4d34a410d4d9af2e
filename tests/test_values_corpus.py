"""Value-parser SEMANTICS parity against the reference's own
values_encoder tests (lib/logstorage/values_encoder_test.go), extracted
at runtime: durations, byte sizes, float64, uint64, IPv4 (+mask), and
RFC3339Nano / ISO8601 timestamps. These parsers back LogsQL literal
parsing (parser.go parseUint falls back to tryParseBytes →
tryParseDuration), range/ipv4/time filters, and the ES ingest timestamp
path."""

import re
import sys
from fractions import Fraction
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))

REF = "/root/reference/lib/logstorage/values_encoder_test.go"

# Go constant expressions in expected values evaluate EXACTLY (constant
# arithmetic is arbitrary-precision rational); Fraction reproduces that
_CONSTS = {
    "nsecsPerYear": Fraction(365 * 24 * 3600 * 10**9),
    "nsecsPerWeek": Fraction(7 * 24 * 3600 * 10**9),
    "nsecsPerDay": Fraction(24 * 3600 * 10**9),
    "nsecsPerHour": Fraction(3600 * 10**9),
    "nsecsPerMinute": Fraction(60 * 10**9),
    "nsecsPerSecond": Fraction(10**9),
    "nsecsPerMillisecond": Fraction(10**6),
    "nsecsPerMicrosecond": Fraction(10**3),
}
_EXPR_OK = re.compile(r"^[\w\s.+*/()<>_-]+$")


def _go_const(expr: str) -> int:
    assert _EXPR_OK.match(expr), expr
    # floats become exact Fractions; ints stay ints (<< needs ints)
    py = re.sub(
        r"\d[\d_]*\.\d[\d_]*",
        lambda m: f"Fraction('{m.group().replace('_', '')}')",
        expr,
    ).replace("_", "")
    # Go shifts bind tighter than +/- (1<<63-1 is (1<<63)-1); Python's
    # bind looser — parenthesize them
    py = re.sub(r"(-?\d+)\s*<<\s*(\d+)", r"(\1<<\2)", py)
    v = eval(py, {"__builtins__": {}, "Fraction": Fraction}, _CONSTS)  # noqa: S307
    assert v == int(v), expr
    return int(v)


def _f_calls(func: str):
    """[(raw_args_str, parsed string args...)] — args split respecting
    nesting-free commas (these tests only pass strings + const exprs)."""
    src = Path(REF).read_text()
    body = src.split(f"func {func}")[1].split("\nfunc ")[0]
    from test_pipe_semantics_corpus import _go_string, _skip_ws

    calls = []
    for m in re.finditer(r"\n\tf\(", body):
        i = _skip_ws(body, m.end())
        args = []
        depth = 0
        while True:
            if body[i] in "\"`":
                s, i = _go_string(body, i)
                args.append(("str", s))
                i = _skip_ws(body, i)
            else:
                j = i
                while depth > 0 or body[j] not in ",)":
                    if body[j] in "([":
                        depth += 1
                    elif body[j] in ")]":
                        depth -= 1
                    j += 1
                args.append(("expr", body[i:j].strip()))
                i = j
            if body[i] == ")":
                break
            i = _skip_ws(body, i + 1)
        calls.append(args)
    return calls


def test_duration_corpus():
    from victorialogs_spark.logsql.lexer import parse_duration_ns

    good = _f_calls("TestTryParseDuration_Success")
    assert len(good) >= 20, len(good)
    for (_, s), (_, expr) in good:
        assert parse_duration_ns(s) == _go_const(expr), s

    bad = _f_calls("TestTryParseDuration_Failure")
    assert len(bad) >= 10
    for ((_, s),) in bad:
        assert parse_duration_ns(s) is None, s


def test_bytes_corpus():
    from victorialogs_spark.logsql.lexer import try_parse_bytes

    good = _f_calls("TestTryParseBytes_Success")
    assert len(good) >= 20, len(good)
    for (_, s), (_, expr) in good:
        assert try_parse_bytes(s) == _go_const(expr), s

    bad = _f_calls("TestTryParseBytes_Failure")
    assert len(bad) >= 5
    for ((_, s),) in bad:
        assert try_parse_bytes(s) is None, s


def test_float64_corpus():
    import math

    from victorialogs_spark.logsql.lexer import try_parse_float64

    good = _f_calls("TestTryParseFloat64_Success")
    assert len(good) >= 15, len(good)
    for (_, s), (_, expr) in good:
        got = try_parse_float64(s)
        # expected is a Go float constant: evaluate exactly, round once
        v = _go_float(expr)
        assert got is not None and math.isclose(got, v, rel_tol=1e-15), (
            s, got, v,
        )

    bad = _f_calls("TestTryParseFloat64_Failure")
    assert len(bad) >= 10
    for ((_, s),) in bad:
        assert try_parse_float64(s) is None, s


def _go_float(expr: str) -> float:
    assert _EXPR_OK.match(expr), expr
    py = re.sub(
        r"\d[\d_]*\.\d[\d_]*",
        lambda m: f"Fraction('{m.group().replace('_', '')}')",
        expr,
    ).replace("_", "")
    py = re.sub(r"(-?\d+)\s*<<\s*(\d+)", r"(\1<<\2)", py)
    v = eval(py, {"__builtins__": {}, "Fraction": Fraction}, _CONSTS)  # noqa: S307
    return float(v)


def test_uint64_corpus():
    from victorialogs_spark.logsql.lexer import _try_uint64

    good = _f_calls("TestTryParseUint64_Success")
    assert len(good) >= 5, len(good)
    for (_, s), (_, expr) in good:
        assert _try_uint64(s) == _go_const(expr), s

    bad = _f_calls("TestTryParseUint64_Failure")
    assert len(bad) >= 5
    for ((_, s),) in bad:
        assert _try_uint64(s) is None, s


def test_ipv4_corpus():
    from victorialogs_spark.logsql.parser import ipv4_to_u32

    good = _f_calls("TestTryParseIPv4String_Success")
    assert len(good) >= 4
    for ((_, s),) in good:
        v = ipv4_to_u32(s)
        assert v is not None, s
        back = ".".join(str((v >> sh) & 0xFF) for sh in (24, 16, 8, 0))
        assert back == s

    bad = _f_calls("TestTryParseIPv4_Failure")
    assert len(bad) >= 10
    for ((_, s),) in bad:
        assert ipv4_to_u32(s) is None, s


def test_rfc3339_corpus():
    from victorialogs_spark.logsql.lexer import try_parse_rfc3339_ns

    good = _f_calls("TestTryParseTimestampRFC3339NanoString_Success")
    assert len(good) >= 15, len(good)
    for (_, s), (_, canon) in good:
        got = try_parse_rfc3339_ns(s)
        want = try_parse_rfc3339_ns(canon)
        assert got is not None and got == want, (s, got, want)
        # spot-pin the canonical instant arithmetically for one anchor
    # anchor: 2023-01-15T23:45:51Z
    assert try_parse_rfc3339_ns("2023-01-15T23:45:51Z") == 1673826351 * 10**9

    bad = _f_calls("TestTryParseTimestampRFC3339Nano_Failure")
    assert len(bad) >= 10
    for ((_, s),) in bad:
        assert try_parse_rfc3339_ns(s) is None, s


def test_iso8601_corpus():
    from victorialogs_spark.logsql.lexer import (
        try_parse_iso8601_ns,
        try_parse_rfc3339_ns,
    )

    good = _f_calls("TestTryParseTimestampISO8601String_Success")
    assert len(good) >= 3
    for ((_, s),) in good:
        got = try_parse_iso8601_ns(s)
        assert got is not None and got == try_parse_rfc3339_ns(s), s

    bad = _f_calls("TestTryParseTimestampISO8601_Failure")
    assert len(bad) >= 10
    for ((_, s),) in bad:
        assert try_parse_iso8601_ns(s) is None, s


def test_ipv4_mask():
    """tryParseIPv4Mask: '/num' with num ≤ 32 → 1<<(32-num); the CIDR
    form of the ipv4_range filter."""
    from victorialogs_spark.logsql.lexer import _try_uint64

    def mask(s):
        if not s or s[0] != "/":
            return None
        n = _try_uint64(s[1:])
        if n is None or n > 32:
            return None
        return 1 << (32 - n)

    good = _f_calls("TestTryParseIPv4Mask_Success")
    bad = _f_calls("TestTryParseIPv4Mask_Failure")
    for (_, s), (_, expr) in good:
        assert mask(s) == _go_const(expr), s
    for ((_, s),) in bad:
        assert mask(s) is None, s


def test_marshal_duration_corpus(spark):
    """marshalDurationString ↔ functions.natural.duration_string: one
    batched Spark select over every corpus case."""
    from pyspark.sql import functions as F

    from victorialogs_spark.functions.natural import duration_string

    cases = []
    for (_, expr), (_, want) in _f_calls("TestMarshalDurationString"):
        cases.append((_go_const(expr), want))
    assert len(cases) >= 8
    df = spark.createDataFrame(cases, "ns long, want string")
    rows = df.select(
        "ns", "want", duration_string(F.col("ns")).alias("got")
    ).collect()
    bad = [(r["ns"], r["got"], r["want"]) for r in rows if r["got"] != r["want"]]
    assert not bad, bad


def test_prefixfilter_corpus():
    """lib/prefixfilter/filter_test.go Match*/IsWildcardFilter replayed
    through functions.prefixfilter (the planner's shared field-wildcard
    predicates): '*' is special only at the END of a filter.
    AppendReplace is covered observably by the pipe-semantics corpus
    (copy/rename wildcard cases), not re-netted here."""
    from victorialogs_spark.functions.prefixfilter import (
        is_wildcard_filter,
        match_all,
        match_filter,
        match_filters,
    )

    path = "/root/reference/lib/prefixfilter/filter_test.go"
    from test_protocols import _extract_f_calls

    wc = _extract_f_calls(path, "TestIsWildcardFilter")
    assert len(wc) >= 6
    for s, want in wc:
        assert is_wildcard_filter(s) is want, s

    mf = _extract_f_calls(path, "TestMatchFilter")
    assert len(mf) >= 10
    for f_, s, want in mf:
        assert match_filter(f_, s) is want, (f_, s)

    mfs = _extract_f_calls(path, "TestMatchFilters")
    assert len(mfs) >= 10
    for filters, s, want in mfs:
        assert match_filters(filters or [], s) is want, (filters, s)

    ma = _extract_f_calls(path, "TestMatchAll")
    assert len(ma) >= 5
    for filters, want in ma:
        assert match_all(filters or []) is want, filters


def test_tokenize_strings_corpus():
    """tokenizer_test.go TestTokenizeStrings replayed through
    functions.text.py_tokens with the reference's cross-value global
    dedup (tokenizeStrings keeps first-seen order, once per call).
    getCommonTokensAndTokenSets (in_values_test.go) is storage-level
    bloom plumbing with no counterpart in the Parquet design."""
    import re as _re
    from pathlib import Path

    from victorialogs_spark.functions.text import py_tokens

    src = Path(
        "/root/reference/lib/logstorage/tokenizer_test.go"
    ).read_text()
    body = src.split("func TestTokenizeStrings")[1]
    from test_pipe_semantics_corpus import _go_string, _skip_ws

    def _str_slice(s, i):  # []string{...} | nil | strings.Split(`..`, "\n")
        i = _skip_ws(s, i)
        if s.startswith("nil", i):
            return [], i + 3
        if s.startswith("strings.Split(", i):
            blob, j = _go_string(s, _skip_ws(s, i + len("strings.Split(")))
            j = _skip_ws(s, j)
            assert s[j] == ","
            sep, j = _go_string(s, _skip_ws(s, j + 1))
            j = _skip_ws(s, j)
            assert s[j] == ")"
            return blob.split(sep), j + 1
        assert s.startswith("[]string{", i), s[i : i + 20]
        j = _skip_ws(s, i + len("[]string{"))
        out = []
        while s[j] != "}":
            v, j = _go_string(s, j)
            out.append(v)
            j = _skip_ws(s, j)
            if s[j] == ",":
                j = _skip_ws(s, j + 1)
        return out, j + 1

    cases = []
    for m in _re.finditer(r"\n\tf\(", body):
        vals, i = _str_slice(body, m.end())
        i = _skip_ws(body, i)
        assert body[i] == ","
        want, i = _str_slice(body, _skip_ws(body, i + 1))
        cases.append((vals, want))
    assert len(cases) >= 5, len(cases)

    for vals, want in cases:
        seen, got = set(), []
        for s in vals:
            for tok in py_tokens(s):
                if tok not in seen:
                    seen.add(tok)
                    got.append(tok)
        assert got == want, (vals, got, want)


def test_color_sequence_corpus(spark):
    """color_sequence_test.go TestDropColorSequences replayed through
    BOTH strip paths — functions.text.drop_color_sequences (ingest) and
    ANSI_COLOR_RE via regexp_replace (the decolorize pipe) — which must
    strip identically (CSI params/intermediates/final byte; a malformed
    sequence still loses its ESC[; OSC/DCS sequences stay)."""
    import re as _re
    from pathlib import Path

    from pyspark.sql import functions as F

    from victorialogs_spark.functions.text import (
        ANSI_COLOR_RE,
        drop_color_sequences,
    )

    src = Path(
        "/root/reference/lib/logstorage/color_sequence_test.go"
    ).read_text()
    body = src.split("func TestDropColorSequences")[1].split("\nfunc ")[0]
    from test_pipe_semantics_corpus import _go_string, _skip_ws

    cases = []
    for m in _re.finditer(r"\n\tf\(", body):
        a, i = _go_string(body, _skip_ws(body, m.end()))
        i = _skip_ws(body, i)
        assert body[i] == ","
        b, _ = _go_string(body, _skip_ws(body, i + 1))
        cases.append((a, b))
    assert len(cases) >= 10, len(cases)

    for s, want in cases:
        assert drop_color_sequences(s) == want, (s.encode(), want.encode())

    df = spark.createDataFrame(cases, "s string, want string")
    rows = df.select(
        "s", "want",
        F.regexp_replace(F.col("s"), ANSI_COLOR_RE, "").alias("got"),
    ).collect()
    bad = [(r["s"], r["got"], r["want"]) for r in rows if r["got"] != r["want"]]
    assert not bad, bad


def test_marshal_float64_corpus(spark):
    """values_encoder_test.go TestMarshalFloat64String (+ 'f'-form
    anchors Spark's string cast gets wrong: E-notation at 1e7/1e-3)
    against functions.natural.format_number."""
    from pyspark.sql import functions as F

    from victorialogs_spark.functions.natural import format_number

    cases = []
    for (_, expr), (_, want) in _f_calls("TestMarshalFloat64String"):
        cases.append((_go_float(expr), want))
    assert len(cases) >= 5
    # the reference's 'f'-rendering beyond Spark's E-notation thresholds
    cases += [
        (12345678.5, "12345678.5"),
        (0.0001, "0.0001"),
        (1.5e16, "15000000000000000"),
        (-123456789.25, "-123456789.25"),
    ]
    df = spark.createDataFrame(cases, "v double, want string")
    rows = df.select(
        "v", "want", format_number(F.col("v")).alias("got")
    ).collect()
    bad = [(r["v"], r["got"], r["want"]) for r in rows if r["got"] != r["want"]]
    assert not bad, bad


def test_column_duration_bytes_parsers(spark):
    """The Column twins of tryParseDuration/tryParseBytes
    (functions.natural.duration_ns_col / bytes_col) replay the same
    values_encoder corpus cases in ONE batched select each — the math
    pipe and the duration_seconds format converter ride them."""
    from pyspark.sql import functions as F

    from victorialogs_spark.functions.natural import bytes_col, duration_ns_col

    dur_good = [
        (s, _go_const(expr))
        for (_, s), (_, expr) in _f_calls("TestTryParseDuration_Success")
    ]
    dur_bad = [(s,) for ((_, s),) in _f_calls("TestTryParseDuration_Failure")]
    df = spark.createDataFrame(dur_good, "s string, want long")
    rows = df.select("s", "want", duration_ns_col(F.col("s")).alias("got")).collect()
    bad = [(r["s"], r["got"], r["want"]) for r in rows if r["got"] != r["want"]]
    assert not bad, bad
    df = spark.createDataFrame(dur_bad, "s string")
    rows = df.select("s", duration_ns_col(F.col("s")).alias("got")).collect()
    bad = [(r["s"], r["got"]) for r in rows if r["got"] is not None]
    assert not bad, bad

    b_good = [
        (s, _go_const(expr))
        for (_, s), (_, expr) in _f_calls("TestTryParseBytes_Success")
    ]
    b_bad = [(s,) for ((_, s),) in _f_calls("TestTryParseBytes_Failure")]
    df = spark.createDataFrame(b_good, "s string, want long")
    rows = df.select("s", "want", bytes_col(F.col("s")).alias("got")).collect()
    bad = [(r["s"], r["got"], r["want"]) for r in rows if r["got"] != r["want"]]
    assert not bad, bad
    df = spark.createDataFrame(b_bad, "s string")
    rows = df.select("s", bytes_col(F.col("s")).alias("got")).collect()
    bad = [(r["s"], r["got"]) for r in rows if r["got"] is not None]
    assert not bad, bad
