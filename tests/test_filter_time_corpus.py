"""Time-filter SEMANTICS parity against the reference's own tests.

filter_time_test.go carries ``testFilterMatchForTimestamps(timestamps,
&filterTime{minTimestamp, maxTimestamp}, idxs)`` cases with NANOSECOND
bounds. The net extracts them at runtime (the corpus policy) and
replays through ``compile_filter`` on a frame carrying ``__time_nanos``
(the scan-side raw nano column, schema.load_table) — the path that is
ns-exact; the µs ``_time`` fallback is intentionally conservative and
covered by its own unit tests.

filter_day_range_test.go / filter_week_range_test.go use raw
ns-of-day / weekday STRUCT bounds our HH:MM / day-name AST cannot
express, so their semantics are pinned by the hand-written edge tests
below (end-minute exactness, brace ±1ns, offset sign, pre-epoch) —
derived from filter_day_range.go:116-124 and parser.go:2448-2453.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import functions as F

from victorialogs_spark.logsql import ast as A
from victorialogs_spark.logsql.parser import parse_query
from victorialogs_spark.planner.filters import compile_filter

REF = Path("/root/reference/lib/logstorage/filter_time_test.go")


def _extract_time_cases():
    src = REF.read_text()
    m = re.search(r"timestamps := \[\]int64\{([^}]*)\}", src)
    timestamps = [int(x) for x in m.group(1).split(",") if x.strip()]
    cases = []
    cur: dict[str, int] = {}
    for sm in re.finditer(
        r"&filterTime\{\s*minTimestamp: (-?\d+),\s*maxTimestamp: (-?\d+),\s*\}"
        r"[\s\S]*?testFilterMatchForTimestamps\(t, timestamps, ft, (nil|\[\]int\{[^}]*\})\)",
        src,
    ):
        lo, hi = int(sm.group(1)), int(sm.group(2))
        tail = sm.group(3)
        idxs = (
            []
            if tail == "nil"
            else [int(x) for x in tail[len("[]int{"):-1].split(",") if x.strip()]
        )
        cases.append((lo, hi, idxs))
    return timestamps, cases, cur


def _ts_frame(spark, timestamps):
    rows = [(int(t), t // 1000, i) for i, t in enumerate(timestamps)]
    df = spark.createDataFrame(
        rows, "`__time_nanos` long, `__us` long, `__row` int"
    )
    return df.withColumn("_time", F.timestamp_micros(F.col("__us"))).drop("__us")


def test_filter_time_corpus(spark):
    timestamps, cases, _ = _extract_time_cases()
    assert len(cases) >= 10, f"extraction regressed: {len(cases)}"
    df = _ts_frame(spark, timestamps)
    exprs = []
    for bi, (lo, hi, _) in enumerate(cases):
        c = compile_filter(A.FTime(lo, hi), df)
        exprs.append(F.when(c, True).otherwise(False).alias(f"c{bi}"))
    rows = df.select(F.col("__row"), *exprs).collect()
    failures = []
    for bi, (lo, hi, want) in enumerate(cases):
        got = sorted(r["__row"] for r in rows if r[f"c{bi}"])
        if got != sorted(want):
            failures.append(f"[{lo},{hi}]: got {got} want {want}")
    assert not failures, "\n".join(failures)


def _day_eval(spark, query, ts_list):
    df = _ts_frame(spark, ts_list)
    c = compile_filter(parse_query(query).filter, df)
    rows = df.select("__row").where(c).collect()
    return sorted(r["__row"] for r in rows)


_NS_H = 3_600_000_000_000


def test_day_range_ns_of_day_semantics(spark):
    """filter_day_range.go:116-124 + parser.go:2448-2453: dayOffset =
    (ts - offset) % nsecsPerDay compared INCLUSIVELY against ns bounds,
    with '('/')' braces moving a bound by exactly 1 ns. An inclusive
    ']' stops at hh:mm:00.000000000 — the whole end minute must NOT
    match (the r15 minute-resolution compare wrongly admitted it)."""
    ts = [
        18 * _NS_H - 1,            # 0: 17:59:59.999999999
        18 * _NS_H,                # 1: 18:00:00.000000000 exactly
        18 * _NS_H + 500_000,      # 2: 18:00:00.0005
        18 * _NS_H + 59_000_000_000,  # 3: 18:00:59
        8 * _NS_H,                 # 4: 08:00:00
        8 * _NS_H + 1000,          # 5: 08:00:00.000001
        -1_000,                    # 6: pre-epoch (negative dayOffset)
    ]
    # inclusive ']' admits exactly 18:00:00.000000000
    assert _day_eval(spark, "_time:day_range[08:00, 18:00]", ts) == [0, 1, 4, 5]
    # exclusive ')' stops at 17:59:59.999999999
    assert _day_eval(spark, "_time:day_range[08:00, 18:00)", ts) == [0, 4, 5]
    # exclusive '(' start skips exactly 08:00:00.000000000
    assert _day_eval(spark, "_time:day_range(08:00, 18:00]", ts) == [0, 1, 5]
    # negative dayOffset (pre-epoch): never inside a non-negative range,
    # matching Go's sign-of-dividend %
    assert 6 not in _day_eval(spark, "_time:day_range[00:00, 23:59]", ts)
    # offset shifts the day window (filter_day_range.go:122 subtracts:
    # ts around 18:00 reads as around 17:00, so rows 0-3 enter the range
    # and the 08:00 rows fall out)
    assert _day_eval(
        spark, "_time:day_range[08:00, 18:00] offset 1h", ts
    ) == [0, 1, 2, 3]
    assert _day_eval(
        spark, "_time:day_range[07:00, 17:00] offset 1h", ts
    ) == [0, 1, 4, 5]


def test_tokenizer_unicode_parity(spark):
    """tokenizer.go isTokenRune: UNICODE letters/digits are token runes
    ('теСТ' is ONE token — tokenizer_test.go), so phrases bound at
    Unicode word edges and unpack_words keeps Unicode words whole
    (r15 tokenizer-parity fix of the ASCII-only classes)."""
    from victorialogs_spark.api import run_query
    from victorialogs_spark.functions.text import py_tokens

    assert py_tokens("foo bar---.!!([baz]!!! %$# TaSte") == [
        "foo", "bar", "baz", "TaSte",
    ]
    assert py_tokens("теСТ 1234 f12.34") == ["теСТ", "1234", "f12", "34"]

    df = spark.createDataFrame(
        [("тестовый прогон",), ("тест ок",)], "`_msg` string"
    )
    # phrase must NOT match inside a longer Unicode word
    assert run_query(spark, df, '"тест"').count() == 1
    # prefix match still crosses the word
    assert run_query(spark, df, '"тест"*').count() == 2
    out = run_query(spark, df, "* | unpack_words as w | fields w").collect()
    words = {r["w"] for r in out}
    assert '["тестовый","прогон"]' in words and '["тест","ок"]' in words
