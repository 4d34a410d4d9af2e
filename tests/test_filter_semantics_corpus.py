"""Per-filter SEMANTICS parity against the reference's own filter tests.

The reference's filter_*_test.go files carry ~1k cases of the form
``testFilterMatchForColumns(t, columns, <filter struct>, col, idxs)``:
dense per-row column values, a filter built as a Go struct literal, and
the expected matching ROW INDEXES. This net extracts them AT RUNTIME
(nothing copied into the repo — the parser/pipe-corpus policy), renders
each struct to its LogsQL form, compiles it with the engine's own
``compile_filter``, and compares matched row sets.

Evaluation batches many filters per DataFrame (one boolean column per
case, one collect per ~40 cases) — ~1k cases in a couple of minutes
instead of ~1k separate queries.

Skipped files: filter_value_type (storage-encoding truth — ours is the
parquet-footer divergence, covered by f_value_type_storage),
filter_time/day_range/week_range/stream_id (different helper,
timestamp/storage-based — covered by the f_time_range/day/week oracle
entries), filter_timing (perf only).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from test_pipe_semantics_corpus import _go_string, _skip_ws
from victorialogs_spark.logsql.parser import parse_query
from victorialogs_spark.logsql.printer import _qf
from victorialogs_spark.planner.filters import compile_filter

REF_DIR = "/root/reference/lib/logstorage"

FILES = [
    "filter_exact_test.go",
    "filter_exact_prefix_test.go",
    "filter_phrase_test.go",
    "filter_prefix_test.go",
    "filter_any_case_phrase_test.go",
    "filter_any_case_prefix_test.go",
    "filter_in_test.go",
    "filter_contains_all_test.go",
    "filter_contains_any_test.go",
    "filter_sequence_test.go",
    "filter_range_test.go",
    "filter_string_range_test.go",
    "filter_ipv4_range_test.go",
    "filter_len_range_test.go",
    "filter_eq_field_test.go",
    "filter_le_field_test.go",
    "filter_regexp_test.go",
    "filter_and_test.go",
    "filter_or_test.go",
    "filter_not_test.go",
]

# (file, logsql, occurrence-index) -> reason; the honest ledger of known
# divergences, not a mute button (the test fails if a skip stops failing)
SKIP_CASES: dict[tuple[str, str, int], str] = {}


# ---------------------------------------------------------------------------
# Go struct-literal parser (filter expressions)
# ---------------------------------------------------------------------------

_NUM_RE = re.compile(r"-?(?:0x[0-9a-fA-F_]+|\d[\d_]*(?:\.\d+)?(?:[eE]-?\d+)?)")


def _parse_value(s: str, i: int):
    i = _skip_ws(s, i)
    if s.startswith("&", i):
        m = re.match(r"&(\w+)\s*\{", s[i:])
        if not m:
            raise ValueError(f"bad struct at {i}: {s[i:i+20]!r}")
        fields, j = _parse_struct_fields(s, i + m.end())
        return ("struct", m.group(1), fields), j
    if s.startswith("[]filter{", i):
        i += len("[]filter{")
        out = []
        while True:
            i = _skip_ws(s, i)
            if s[i] == "}":
                return out, i + 1
            if s[i] == ",":
                i += 1
                continue
            v, i = _parse_value(s, i)
            out.append(v)
    if s.startswith("[]string{", i):
        i += len("[]string{")
        out = []
        while True:
            i = _skip_ws(s, i)
            if s[i] == "}":
                return out, i + 1
            if s[i] == ",":
                i += 1
                continue
            v, i = _go_string(s, i)
            out.append(v)
    m = re.match(r"(?:mustCompileRegex|regexp\.MustCompile)\(", s[i:])
    if m:
        v, j = _go_string(s, i + m.end())
        j = _skip_ws(s, j)
        assert s[j] == ")"
        return ("re", v), j + 1
    if s[i] in "\"`":
        return _go_string(s, i)
    m = re.match(r"-?inf\b", s[i:])
    if m:
        return float(m.group(0)), i + m.end()
    m = re.match(r"(true|false)\b", s[i:])
    if m:
        return m.group(1) == "true", i + m.end()
    m = _NUM_RE.match(s, i)
    if m:
        t = m.group(0).replace("_", "")
        if t.lower().startswith(("0x", "-0x")):
            return int(t, 16), i + m.end() - m.start()
        v = float(t) if ("." in t or "e" in t or "E" in t) else int(t)
        return v, i + m.end() - m.start()
    raise ValueError(f"unparseable value at {i}: {s[i:i+24]!r}")


def _parse_struct_fields(s: str, i: int):
    fields: dict = {}
    while True:
        i = _skip_ws(s, i)
        if s[i] == "}":
            return fields, i + 1
        if s[i] == ",":
            i += 1
            continue
        m = re.match(r"(\w+)\s*:", s[i:])
        if not m:
            raise ValueError(f"bad field at {i}: {s[i:i+20]!r}")
        i += m.end()
        v, i = _parse_value(s, i)
        fields[m.group(1)] = v
    return fields, i


def _parse_columns(s: str, i: int):
    """Parse ``[]column{ {name: "...", values: []string{...}}, ... }``
    starting just after the opening brace of the outer literal."""
    cols = []
    while True:
        i = _skip_ws(s, i)
        if s[i] == "}":
            return cols, i + 1
        if s[i] == ",":
            i += 1
            continue
        assert s[i] == "{", f"bad column at {i}: {s[i:i+20]!r}"
        fields, i = _parse_struct_fields(s, i + 1)
        cols.append((fields["name"], fields["values"]))


# ---------------------------------------------------------------------------
# struct -> LogsQL
# ---------------------------------------------------------------------------


def _js(v: str) -> str:
    return json.dumps(v, ensure_ascii=False)


def _numtok(v) -> str:
    if isinstance(v, float):
        if v == float("inf"):
            return "inf"
        if v == float("-inf"):
            return "-inf"
        if v == int(v) and abs(v) < 2**62:
            return str(int(v))
        return repr(v)
    return str(v)


def _dotted(v: int) -> str:
    return f"{(v >> 24) & 255}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"


def _render(f) -> str:
    tag, typ, d = f
    assert tag == "struct"
    pre = _qf(d["fieldName"]) + ":" if d.get("fieldName") else ""
    if typ == "filterPhrase":
        return pre + _js(d.get("phrase", ""))
    if typ == "filterPrefix":
        return pre + _js(d.get("prefix", "")) + "*"
    if typ == "filterExact":
        return pre + "exact(" + _js(d.get("value", "")) + ")"
    if typ == "filterExactPrefix":
        return pre + "exact(" + _js(d.get("prefix", "")) + "*)"
    if typ == "filterAnyCasePhrase":
        return pre + "i(" + _js(d.get("phrase", "")) + ")"
    if typ == "filterAnyCasePrefix":
        return pre + "i(" + _js(d.get("prefix", "")) + "*)"
    if typ == "filterIn":
        return pre + "in(" + ",".join(_js(v) for v in d.get("values", [])) + ")"
    if typ == "filterContainsAll":
        return pre + "contains_all(" + ",".join(_js(v) for v in d.get("values", [])) + ")"
    if typ == "filterContainsAny":
        return pre + "contains_any(" + ",".join(_js(v) for v in d.get("values", [])) + ")"
    if typ == "filterSequence":
        return pre + "seq(" + ",".join(_js(v) for v in d.get("phrases", [])) + ")"
    if typ == "filterRange":
        return pre + f"range[{_numtok(d['minValue'])}, {_numtok(d['maxValue'])}]"
    if typ == "filterStringRange":
        return pre + "string_range(" + _js(d.get("minValue", "")) + "," + _js(d.get("maxValue", "")) + ")"
    if typ == "filterIPv4Range":
        return pre + f"ipv4_range({_dotted(d['minValue'])}, {_dotted(d['maxValue'])})"
    if typ == "filterLenRange":
        return pre + f"len_range({_numtok(d['minLen'])}, {_numtok(d['maxLen'])})"
    if typ == "filterEqField":
        return pre + "eq_field(" + _qf(d["otherFieldName"]) + ")"
    if typ == "filterLeField":
        fn = "lt_field" if d.get("excludeEqualValues") is True else "le_field"
        return pre + fn + "(" + _qf(d["otherFieldName"]) + ")"
    if typ == "filterLtField":
        return pre + "lt_field(" + _qf(d["otherFieldName"]) + ")"
    if typ == "filterRegexp":
        return pre + "~" + _js(d["re"][1])
    if typ == "filterAnd":
        return "(" + " ".join(_render(x) for x in d["filters"]) + ")"
    if typ == "filterOr":
        return "(" + " OR ".join(_render(x) for x in d["filters"]) + ")"
    if typ == "filterNot":
        return "!(" + _render(d["f"]) + ")"
    raise ValueError(f"unknown filter type {typ}")


# ---------------------------------------------------------------------------
# test-body scanner
# ---------------------------------------------------------------------------


def _extract_cases():
    """[(file, columns, logsql, expected_idxs)], plus unparseable count."""
    cases = []
    unparseable = 0
    for name in FILES:
        src = Path(f"{REF_DIR}/{name}").read_text()
        events = []
        for m in re.finditer(r"\n\t+columns :?= \[\]column\{", src):
            events.append((m.start(), "columns", m))
        for m in re.finditer(r"\n\t+(\w+) :?= (&filter\w+\s*\{)", src):
            events.append((m.start(), "assign", m))
        for m in re.finditer(r"\n\t+(\w+)\.values\.values = ", src):
            events.append((m.start(), "subassign", m))
        for m in re.finditer(
            r"testFilterMatchForColumns\(t, columns, (\w+), ", src
        ):
            events.append((m.start(), "call", m))
        events.sort(key=lambda e: e[0])

        columns = None
        env: dict = {}
        for _, kind, m in events:
            try:
                if kind == "columns":
                    columns, _ = _parse_columns(src, m.end())
                elif kind == "assign":
                    v, _ = _parse_value(src, src.index("&", m.start()))
                    env[m.group(1)] = v
                elif kind == "subassign":
                    v, _ = _parse_value(src, m.end())
                    tgt = env.get(m.group(1))
                    if tgt is not None:
                        tgt[2]["values"] = v
                elif kind == "call":
                    f = env.get(m.group(1))
                    if f is None or columns is None:
                        unparseable += 1
                        continue
                    i = m.end()
                    needed, i = _go_string(src, i)
                    i = _skip_ws(src, i)
                    assert src[i] == ","
                    i = _skip_ws(src, i + 1)
                    if src.startswith("nil", i):
                        expected: list[int] = []
                    else:
                        mm = re.match(r"\[\]int\{([^}]*)\}", src[i:])
                        assert mm, src[i : i + 30]
                        expected = [
                            int(x) for x in mm.group(1).replace("\n", " ").split(",")
                            if x.strip()
                        ]
                    cases.append((name, columns, _render(f), expected))
            except (ValueError, AssertionError, IndexError, KeyError):
                unparseable += 1
    return cases, unparseable


# ---------------------------------------------------------------------------
# batched evaluation
# ---------------------------------------------------------------------------


def _eval_cases(spark, cases):
    """cases: [(key, columns, logsql, expected)] -> failures list."""
    failures = []
    # group by identical columns content so each frame is built once
    groups: dict = {}
    for idx, (name, columns, qs, expected) in enumerate(cases):
        gk = tuple((c, tuple(v)) for c, v in columns)
        groups.setdefault(gk, []).append((idx, name, qs, expected))
    for gk, items in groups.items():
        cols = [c for c, _ in gk]
        nrows = len(gk[0][1]) if gk else 0
        data = [
            tuple(list(vals) + [i])
            for i, vals in enumerate(zip(*[v for _, v in gk]))
        ]
        schema = ", ".join(f"`{c}` string" for c in cols) + ", `__row` int"
        df = spark.createDataFrame(data, schema)
        for start in range(0, len(items), 40):
            batch = items[start : start + 40]
            exprs = []
            compiled = []
            for bi, (idx, name, qs, expected) in enumerate(batch):
                try:
                    ast = parse_query(qs)
                    c = compile_filter(ast.filter, df)
                    exprs.append(
                        F.when(c, F.lit(True)).otherwise(F.lit(False)).alias(f"c{bi}")
                    )
                    compiled.append((bi, idx, name, qs, expected))
                except Exception as e:  # noqa: BLE001 — collected below
                    failures.append((name, qs, f"compile error: {e}"))
            if not compiled:
                continue
            try:
                rows = df.select(F.col("__row"), *exprs).collect()
            except Exception as e:  # noqa: BLE001
                failures.append((batch[0][1], batch[0][2], f"exec error: {e}"))
                continue
            for bi, idx, name, qs, expected in compiled:
                got = sorted(r["__row"] for r in rows if r[f"c{bi}"])
                if got != sorted(expected):
                    failures.append(
                        (name, qs, f"rows: got {got} want {sorted(expected)}")
                    )
    return failures


@pytest.mark.slow  # ~8 min: full reference filter corpus
def test_filter_semantics_corpus(spark):
    cases, unparseable = _extract_cases()
    assert len(cases) >= 700, f"extraction regressed: only {len(cases)} cases"
    seen: dict = {}
    run = []
    skipped = 0
    for name, columns, qs, expected in cases:
        k = seen.get((name, qs), 0)
        seen[(name, qs)] = k + 1
        if (name, qs, k) in SKIP_CASES:
            skipped += 1
            continue
        run.append((name, columns, qs, expected))
    failures = _eval_cases(spark, run)
    msg = "\n".join(f"{n}: [{q}] {why}"[:400] for n, q, why in failures[:30])
    assert not failures, (
        f"{len(failures)}/{len(run)} reference filter cases diverge"
        f" (unparseable: {unparseable}; case-skips: {skipped})\n{msg}"
    )
    assert skipped == len(SKIP_CASES), "a SKIP_CASES entry no longer matches"


def _parse_stream_name(s: str) -> list[tuple[str, str]]:
    """`{a="b",c="d"}` → label pairs (Go-quoted values)."""
    assert s.startswith("{") and s.endswith("}")
    body = s[1:-1]
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(body):
        if body[i] == ",":
            i += 1
            continue
        j = body.index("=", i)
        name = body[i:j]
        v, i = _go_string(body, j + 1)
        out.append((name, v))
    return out


def test_stream_filter_corpus(spark):
    """stream_filter_test.go replayed three ways: matchStreamName cases
    through compile_filter on a frame with the stream's labels promoted
    to columns (our schema's stream model), the canonical-print cases
    through parse→print (including the in()/not_in() desugar to
    QuoteMeta'd =~/!~ alternations), and the failure cases asserted to
    reject."""
    import pytest as _pytest

    from victorialogs_spark.logsql.printer import print_query

    src = Path(f"{REF_DIR}/stream_filter_test.go").read_text()

    # -- matchStreamName ---------------------------------------------------
    body = src.split("func TestStreamFilterMatchStreamName")[1].split("\nfunc ")[0]
    cases = []
    for m in re.finditer(r"\n\tf\(", body):
        i = _skip_ws(body, m.end())
        flt, i = _go_string(body, i)
        i = _skip_ws(body, i)
        assert body[i] == ","
        name, i = _go_string(body, _skip_ws(body, i + 1))
        i = _skip_ws(body, i)
        assert body[i] == ","
        i = _skip_ws(body, i + 1)
        mm = re.match(r"(true|false)", body[i:])
        cases.append((flt, name, mm.group(1) == "true"))
    assert len(cases) >= 100, f"extraction regressed: {len(cases)}"

    groups: dict = {}
    for flt, name, want in cases:
        groups.setdefault(name, []).append((flt, want))
    failures = []
    for name, items in groups.items():
        labels = _parse_stream_name(name)
        if labels:
            data = [tuple(v for _, v in labels)]
            schema = ", ".join(f"`{k}` string" for k, _ in labels)
            df = spark.createDataFrame(data, schema)
        else:
            df = spark.createDataFrame([(1,)], "`__dummy` int")
        exprs = []
        for bi, (flt, _) in enumerate(items):
            c = compile_filter(parse_query(flt).filter, df)
            exprs.append(F.when(c, True).otherwise(False).alias(f"c{bi}"))
        row = df.select(*exprs).collect()[0]
        for bi, (flt, want) in enumerate(items):
            if bool(row[f"c{bi}"]) != want:
                failures.append(f"[{flt} vs {name}] got {not want} want {want}")
    assert not failures, "\n".join(failures[:15])

    # -- canonical print ---------------------------------------------------
    body = src.split("func TestNewTestStreamFilterSuccess")[1].split("\nfunc ")[0]
    n = 0
    for m in re.finditer(r"\n\tf\(", body):
        i = _skip_ws(body, m.end())
        inp, i = _go_string(body, i)
        i = _skip_ws(body, i)
        assert body[i] == ","
        want, i = _go_string(body, _skip_ws(body, i + 1))
        got = print_query(parse_query(inp))
        assert got == want, f"canonical {inp!r}: got {got!r} want {want!r}"
        n += 1
    assert n >= 8

    # -- failures ----------------------------------------------------------
    body = src.split("func TestNewTestStreamFilterFailure")[1].split("\nfunc ")[0]
    n = 0
    for m in re.finditer(r"\n\tf\(", body):
        bad, _ = _go_string(body, _skip_ws(body, m.end()))
        with _pytest.raises(Exception):
            parse_query(bad)
        n += 1
    assert n >= 10
