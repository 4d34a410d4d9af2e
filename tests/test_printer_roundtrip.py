"""Printer round-trip: for every query in the reference's success corpus,
parse → print → reparse must reproduce the identical AST. This is the
structural equivalent of the reference's String() round-trip test layer
(parser_test.go TestParseQuery_Success)."""

import re
from pathlib import Path

import pytest

from victorialogs_spark.logsql.parser import parse_query
from victorialogs_spark.logsql.printer import print_query

REF = Path("/root/reference/lib/logstorage/parser_test.go")

TS = 1704067200_000000000


def _corpus():
    src = REF.read_text()
    i = src.index("func TestParseQuery_Success")
    j = src.index("func TestParseQuery_Failure")
    return re.findall(r"f\(`((?:[^`])*)`", src[i:j])


@pytest.mark.skipif(not REF.exists(), reason="reference repo not present")
def test_print_parse_roundtrip_corpus():
    failures = []
    for q in _corpus():
        try:
            ast1 = parse_query(q, timestamp_ns=TS)
        except Exception:
            continue  # acceptance is test_parser_corpus's job
        try:
            printed = print_query(ast1)
            ast2 = parse_query(printed, timestamp_ns=TS)
        except Exception as ex:
            failures.append((q, f"print/reparse error: {ex}"))
            continue
        if ast2 != ast1:
            failures.append((q, f"AST drift via {printed!r}"))
    assert not failures, (
        f"{len(failures)} round-trip failures; first 10:\n"
        + "\n".join(f"  {q!r}: {why}" for q, why in failures[:10])
    )


def test_print_simple_queries():
    for q, expect_sub in [
        ("error | stats by (host) count() as hits", "stats by (host)"),
        ("* | sort by (x) desc limit 5 rank as r", "rank as r"),
        ('foo:in(bar:baz | fields foo) | limit 1', "in("),
    ]:
        printed = print_query(parse_query(q, timestamp_ns=TS))
        assert expect_sub in printed
        assert parse_query(printed, timestamp_ns=TS) == parse_query(q, timestamp_ns=TS)


DOCS = Path("/root/reference/docs/victorialogs/LogsQL.md")


@pytest.mark.skipif(not DOCS.exists(), reason="reference docs not present")
def test_print_parse_roundtrip_docs_examples():
    src = DOCS.read_text()
    markers = ("stats_func1", "<q>", "step offset", "_time:step")
    failures = []
    for block in re.findall(r"```logsql\n(.*?)```", src, re.S):
        q = block.strip()
        if not q or any(m in q for m in markers):
            continue
        try:
            ast1 = parse_query(q, timestamp_ns=TS)
        except Exception:
            continue
        try:
            printed = print_query(ast1)
            ast2 = parse_query(printed, timestamp_ns=TS)
        except Exception as ex:
            failures.append((q, f"print/reparse error: {ex}"))
            continue
        if ast2 != ast1:
            failures.append((q, f"AST drift via {printed!r}"))
    assert not failures, (
        f"{len(failures)} doc-example round-trip failures; first 10:\n"
        + "\n".join(f"  {q!r}: {why}" for q, why in failures[:10])
    )


def test_print_parse_roundtrip_fuzz_fragments():
    """Well-formed fragment combinations round-trip structurally."""
    import itertools

    filters = ["error", "i(Err)", "=x", '~"e.*"', ">5", "in(a,b)",
               "range[1,2]", "len_range(1,3)", "*", "contains_any(a)",
               "seq(a,b)", "string_range(a,b)", "ipv4_range(1.2.3.4/24)"]
    fields = ["_msg", "app", "f.q"]
    pipes = ["", " | fields a", " | stats count() as c",
             " | sort by (a) limit 3", " | uniq by (x)",
             " | math a + b * 2 as m", " | top 3 by (x) rank as r",
             ' | extract "ip=<ip>" from _msg',
             " | unpack_json from _msg fields (a, b)"]
    for filt, field, pipe in itertools.product(filters, fields, pipes):
        q = f"{field}:{filt}{pipe}"
        try:
            ast1 = parse_query(q, timestamp_ns=TS)
        except ValueError:
            continue
        printed = print_query(ast1)
        assert parse_query(printed, timestamp_ns=TS) == ast1, (
            f"{q!r} drifted via {printed!r}"
        )


def test_print_parse_roundtrip_adversarial_cases():
    """Regression cases from review: keyword-colliding field names and
    open-ended ranges whose include flags must survive the round-trip."""
    cases = [
        '"stats":foo', '"limit":x', '"not":x', '"options":y',
        '"count":v and "by":w', 'foo:range(-inf, 10]', 'foo:range[5, inf)',
        'foo:range(-inf, inf)', 'foo:>5', 'foo:<=3',
        '* | sort by ("count") limit 2', '* | fields "by", a',
        '* | stats by ("fields") count() as c',
    ]
    for q in cases:
        ast1 = parse_query(q, timestamp_ns=TS)
        printed = print_query(ast1)
        assert parse_query(printed, timestamp_ns=TS) == ast1, (q, printed)
