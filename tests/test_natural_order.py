"""natural_text_key ⇔ stringsutil.LessNatural equivalence.

The Spark-side key (functions/natural.py natural_text_key) must order
any two strings exactly as the reference's LessNatural
(vendor/.../stringsutil/less_natural.go), which is the lessString tail
used by sort, min/max, uniq_values, row_min/row_max and quantile for
non-numeric pairs. The replica below is transcribed from the Go code;
the property test compares key order against it over adversarial and
hypothesis-generated inputs (digit runs > 19 chars are excluded — the
reference's u64-overflow fallback is pair-dependent and documented as
approximated)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

U64_MAX = (1 << 64) - 1


def less_natural(a: str, b: str) -> bool:
    """stringsutil.LessNatural transcription (byte-domain)."""
    a, b = a.encode(), b.encode()
    is_reverse = False
    while True:
        if len(a) > len(b):
            a, b = b, a
            is_reverse = not is_reverse
        i = 0
        while i < len(a):
            cA, cB = a[i], b[i]
            a_dig = 0x30 <= cA <= 0x39
            b_dig = 0x30 <= cB <= 0x39
            if a_dig:
                if b_dig:
                    break
                return not is_reverse
            if b_dig:
                return is_reverse
            if cA != cB:
                return (cB < cA) if is_reverse else (cA < cB)
            i += 1
        a, b = a[i:], b[i:]
        if len(a) == 0:
            return False if is_reverse else len(b) > 0

        iA, nA = 1, a[0] - 0x30
        while iA < len(a) and 0x30 <= a[iA] <= 0x39:
            if nA > (U64_MAX - 9) // 10:
                return (b < a) if is_reverse else (a < b)
            nA = nA * 10 + (a[iA] - 0x30)
            iA += 1
        iB, nB = 1, b[0] - 0x30
        while iB < len(b) and 0x30 <= b[iB] <= 0x39:
            if nB > (U64_MAX - 9) // 10:
                return (b < a) if is_reverse else (a < b)
            nB = nB * 10 + (b[iB] - 0x30)
            iB += 1
        if nA != nB:
            return (nB < nA) if is_reverse else (nA < nB)
        if iA != iB:
            return (iB < iA) if is_reverse else (iA < iB)
        a, b = a[iA:], b[iB:]


def _esc_ctl(t: bytes) -> bytes:
    """Twin of natural._esc_ctl: bytes ≤ \\x02 get a \\x02 escape prefix
    so one per-run text marker suffices (replaced the per-char markers
    in r15 — same order on every pair, ~free per row)."""
    return (
        t.replace(b"\x02", b"\x02\x02")
        .replace(b"\x01", b"\x02\x01")
        .replace(b"\x00", b"\x02\x00")
    )


def py_natural_key(s: str) -> bytes:
    """Python twin of the Spark natural_text_key encoding."""
    if s == "":
        return b""
    out = bytearray()
    runs = re.split(r"(?<=[^0-9])(?=[0-9])|(?<=[0-9])(?=[^0-9])", s)
    for run in runs:
        if run and run[0].isdigit() and run.isascii():
            if len(run) <= 19:
                d = run.lstrip("0") or "0"
                out += b"\x01" + f"{len(d):02d}".encode() + d.encode()
                out += f"{len(run) - len(d):04d}".encode()
            else:
                out += b"\x0199" + run.encode()
        else:
            out += b"\x02" + _esc_ctl(run.encode())
    return bytes(out)


CASES = [
    "", "0", "1", "01", "001", "9", "10", "a", "A", "z",
    "host1", "host2", "host10", "host10a", "host010",
    "a b", "a1", "aB", "a\x00b", "a\x01b", "a\x02b",
    "1.2.3", "1.10.2", "v1.9.0", "v1.10.0",
    "é", "z9", "zé", "日本2", "日本10",
    "0a", "00a", "a0", "a00", "-1", "-", "--", "123abc456",
    "42.371", "-42.371", "1.05", "1.5", "0.50", "12.", ".5", "--12",
    "-0012.003", "00.00",
    "2024-01-02T03:04:05Z", "2024-01-10T00:00:00Z",
]


def test_key_matches_less_natural_on_cases():
    for a in CASES:
        for b in CASES:
            want = less_natural(a, b)
            got = py_natural_key(a) < py_natural_key(b)
            assert got == want, (a, b, want)


@settings(max_examples=2000, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters=[]
        ),
        max_size=12,
    ),
    st.text(
        alphabet=st.sampled_from("0123456789abAB .-é\x00\x01\x02"),
        max_size=12,
    ),
)
def test_key_matches_less_natural_property(a, b):
    # cap digit runs at 19 (documented overflow-fallback approximation)
    if re.search(r"[0-9]{20}", a) or re.search(r"[0-9]{20}", b):
        return
    assert (py_natural_key(a) < py_natural_key(b)) == less_natural(a, b)


def test_spark_key_matches_python_twin(spark):
    from pyspark.sql import functions as F

    from victorialogs_spark.functions.natural import natural_text_key

    rows = [(s,) for s in CASES if "\x00" not in s]
    df = spark.createDataFrame(rows, "s string")
    got = {
        r["s"]: r["k"]
        for r in df.select("s", natural_text_key(F.col("s")).alias("k")).collect()
    }
    for s in got:
        assert got[s].encode() == py_natural_key(s), repr(s)


def test_sort_pipe_orders_naturally(spark):
    from victorialogs_spark.api import run_query

    df = spark.createDataFrame(
        [("host10",), ("host2",), ("host1",), ("b",), ("a10b",), ("a9z",)],
        "h string",
    )
    out = run_query(spark, df, "* | sort by (h) | fields h").collect()
    assert [r["h"] for r in out] == ["a9z", "a10b", "b", "host1", "host2", "host10"]


def test_min_max_uniq_values_natural_text(spark):
    from victorialogs_spark.api import run_query

    df = spark.createDataFrame(
        [("host10",), ("host9",), ("host100",)], "h string"
    )
    r = run_query(
        spark, df, "* | stats min(h) as lo, max(h) as hi, uniq_values(h) as u"
    ).collect()[0]
    assert r["lo"] == "host9" and r["hi"] == "host100"
    assert r["u"] == '["host9","host10","host100"]'


def test_sort_duration_size_literals_numeric(spark):
    """lessString's tryParseNumber layer (block_result.go:2710) parses
    duration literals as ns and byte sizes as bytes, so '5s' < '1m'
    numerically and both sort after plain '900'."""
    from victorialogs_spark.api import run_query

    df = spark.createDataFrame(
        [("5s",), ("1m",), ("150ms",), ("abc",), ("2KB",), ("900",)],
        "d string",
    )
    out = run_query(spark, df, "* | sort by (d) | fields d").collect()
    assert [r["d"] for r in out] == ["900", "2KB", "150ms", "5s", "1m", "abc"]
    r = run_query(spark, df, "* | stats min(d) as lo, max(d) as hi").collect()[0]
    assert r["lo"] == "900" and r["hi"] == "abc"


def test_le_field_parses_math_numbers(spark):
    """leValuesString (filter_le_field.go:284) compares through
    parseMathNumber: duration pairs numerically ('5s' <= '1m' even
    though '5' > '1' bytewise), falling back to bytewise only when a
    side doesn't parse."""
    from victorialogs_spark.api import run_query

    df = spark.createDataFrame(
        [("5s", "1m"), ("2m", "90s"), ("abc", "abd"), ("10", "9")],
        "a string, b string",
    )
    out = run_query(spark, df, "a:le_field(b) | fields a").collect()
    assert sorted(r["a"] for r in out) == ["5s", "abc"]


def test_range_filter_parses_math_numbers(spark):
    """matchRange (filter_range.go:369) parses string values with
    parseMathNumber, so a duration bound matches duration-literal
    values and hex values compare numerically."""
    from victorialogs_spark.api import run_query

    df = spark.createDataFrame(
        [("150ms",), ("50ms",), ("0x20",), ("abc",), ("2s",)], "d string"
    )
    out = run_query(spark, df, "d:>100ms | fields d").collect()
    assert sorted(r["d"] for r in out) == ["150ms", "2s"]
    out = run_query(spark, df, "d:range[0x10, 0x30] | fields d").collect()
    assert [r["d"] for r in out] == ["0x20"]


def test_sum_strict_float_gate(spark):
    """sum/avg parse values with tryParseFloat64 exactly: '_'-separated
    numbers COUNT ('1_000.5'), exponent forms and leading zeros DON'T
    ('1e5', '012' — getFloatValueAtRow skips them)."""
    from victorialogs_spark.api import run_query

    df = spark.createDataFrame(
        [("1_000.5",), ("1e5",), ("012",), ("2",)], "v string"
    )
    r = run_query(spark, df, "* | stats sum(v) as s, avg(v) as a").collect()[0]
    assert float(r["s"]) == 1002.5
    assert float(r["a"]) == 501.25


def test_histogram_parses_durations(spark):
    """histogram buckets string values through tryParseNumber, so
    duration literals land in their ns-value bucket instead of being
    dropped (stats_histogram.go:101)."""
    import json

    from victorialogs_spark.api import run_query

    df = spark.createDataFrame([("1s",), ("1000000000",)], "v string")
    r = run_query(spark, df, "* | stats histogram(v) as h").collect()[0]
    buckets = json.loads(r["h"])
    assert len(buckets) == 1 and buckets[0]["hits"] == 2  # same vmrange bucket
