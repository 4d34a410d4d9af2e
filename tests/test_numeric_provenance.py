"""Provenance-marked stringified-numeric columns (functions/natural.py
numeric_provenance) must behave EXACTLY like unmarked string columns of
the same values on every natural-order / tryParseNumber consumer — the
mark only licenses dropping expression trees that provably cannot fire
(duration/size scanners, LessNatural run encoder), it must never change
a result.

The equivalence is exercised end-to-end: the same value set runs once
through a frame whose column came from normalize_log_df's numeric cast
(marked) and once through a frame built from the identical strings with
no provenance (general path), over the operators that consume natural
order or parseMathNumber. Adversarial values include the injectivity
edge cases from the numeric_provenance proof: -0.0 vs 0.0, NaN,
±Infinity, E-notation boundaries, int64 beyond 2⁵³ (equal-double,
distinct-string pairs), and NULL → ''.
"""

import math

import pytest
from pyspark.sql import functions as F

DOUBLES = [
    0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 123.456, -123.456,
    float("nan"), float("inf"), float("-inf"), None,
    1e7, 9999999.0, 10000001.0, -1e7,          # E-notation boundary (1e7)
    1e-3, 9.99e-4, -1e-3,                       # E-notation boundary (1e-3)
    5e-324, 1.7976931348623157e308,             # extremes
    float(2**53), float(2**53) + 2.0,
]

LONGS = [
    0, 1, -1, 10, 2, 9, 100, None,
    2**53, 2**53 + 1, 2**53 + 2,                # distinct longs, equal doubles
    -(2**53), -(2**53) - 1,                     # negative equal-double pair
    (1 << 63) - 1, -(1 << 63),
]


def _frames(spark, vals, typ):
    """(marked, unmarked) log frames holding the same string values."""
    from victorialogs_spark.schema import normalize_log_df

    rows = [(i, v) for i, v in enumerate(vals)]
    typed = spark.createDataFrame(rows, f"rid bigint, v {typ}")
    marked = normalize_log_df(typed.select("v"))
    # same strings, no provenance: rebuild through a non-attribute
    # expression so Catalyst drops the metadata
    unmarked = marked.select(
        F.concat(F.col("v"), F.lit("")).alias("v")
    )
    return marked, unmarked


QUERIES = [
    "* | sort by (v) limit 1000 rank as r | fields v, r",
    "* | sort by (v) desc limit 1000 rank as r | fields v, r",
    "* | stats min(v) as lo, max(v) as hi, uniq_values(v) as u,"
    " quantile(0.4, v) as q, histogram(v) as h",
    "* | filter v:>1 | fields v",
    "* | filter v:range(-2, 9999999] | fields v",
    "* | math v * 2 as m | fields v, m",
]


@pytest.mark.slow  # ~40 s/param: exhaustive value-grid equivalence
@pytest.mark.parametrize("typ,vals", [("double", DOUBLES), ("bigint", LONGS)])
def test_marked_equals_general_path(spark, typ, vals):
    from victorialogs_spark.api import run_query
    from victorialogs_spark.functions.natural import numeric_provenance

    marked, unmarked = _frames(spark, vals, typ)
    assert numeric_provenance(marked, "v")
    assert not numeric_provenance(unmarked, "v")
    for q in QUERIES:
        got = [tuple(r) for r in run_query(spark, marked, q).collect()]
        want = [tuple(r) for r in run_query(spark, unmarked, q).collect()]
        assert got == want, q


@pytest.mark.parametrize("typ,vals", [("double", DOUBLES), ("bigint", LONGS)])
def test_marked_sum_avg_equals_general_path(spark, typ, vals):
    """sum/avg parse through _decimal_src, whose marked branch collapses
    strict_float_str to a single E-notation exclusion. The two gates
    must accept/reject IDENTICALLY on the marked domain — exercised over
    the E-form boundaries (1e7, 1e-3), NaN/±Infinity, ±0.0, int64
    extremes and NULL→''. (Not in the shared QUERIES list: the typed
    twin legitimately DIFFERS here — a typed double 1e7 sums directly
    while its string rendering '1.0E7' is rejected by the parse gate —
    so this equivalence is marked-vs-unmarked strings only.)"""
    from victorialogs_spark.api import run_query

    marked, unmarked = _frames(spark, vals, typ)
    q = "* | stats sum(v) as s, avg(v) as a"
    got = [tuple(r) for r in run_query(spark, marked, q).collect()]
    want = [tuple(r) for r in run_query(spark, unmarked, q).collect()]
    assert got == want


@pytest.mark.slow  # ~2 min/param: exhaustive value-grid equivalence
@pytest.mark.parametrize("typ,vals", [("double", DOUBLES), ("bigint", LONGS)])
def test_typed_equals_general_path(spark, typ, vals):
    """TYPED numeric columns share the provenance proof verbatim
    (natural_tiebreak): a query over the raw typed frame (the layout
    read path — compact_table re-encodes numeric strings typed) must
    return exactly what the same values as plain unmarked strings
    return, over every natural-order / tryParseNumber consumer."""
    from victorialogs_spark.api import run_query

    rows = [(i, v) for i, v in enumerate(vals)]
    typed = spark.createDataFrame(rows, f"rid bigint, v {typ}").select("v")
    _, unmarked = _frames(spark, vals, typ)
    for q in QUERIES:
        out = run_query(spark, typed, q)
        # typed frames legitimately return typed output columns; the
        # string frame returns their Spark-cast rendering (normalize_log_df's
        # exact conversion) — apply the same cast so only ORDER/VALUES
        # can differ
        out = out.select(
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c)
                for c in out.columns
            ]
        )
        got = [tuple(r) for r in out.collect()]
        want = [tuple(r) for r in run_query(spark, unmarked, q).collect()]
        assert got == want, q


def test_typed_sort_plan_is_scanner_free(spark):
    """The run encoder must be absent from a typed column's sort plan
    too — it was the layout-bench p_sort_desc_rank regression (the
    text tiebreak over cast(col as string) ran per heap comparison)."""
    from victorialogs_spark.api import run_query

    typed = spark.createDataFrame([(v,) for v in DOUBLES], "v double")
    q = "* | sort by (v) desc limit 5 rank as r | fields v, r"
    plan = run_query(spark, typed, q)._jdf.queryExecution().executedPlan().toString()
    for marker in ("regexp_extract_all", "forall", "aggregate("):
        assert marker not in plan, marker


def test_marked_sort_plan_is_scanner_free(spark):
    """The point of the mark: the HOF-bearing scanners/run-encoder
    (CodegenFallback — they evict the whole Project from whole-stage
    codegen) must be absent from a marked column's sort plan and present
    in the unmarked one."""
    from victorialogs_spark.api import run_query

    marked, unmarked = _frames(spark, DOUBLES, "double")
    q = "* | sort by (v) desc limit 5 rank as r | fields v, r"
    plan_m = run_query(spark, marked, q)._jdf.queryExecution().executedPlan().toString()
    plan_u = run_query(spark, unmarked, q)._jdf.queryExecution().executedPlan().toString()
    for marker in ("regexp_extract_all", "forall", "aggregate("):
        assert marker not in plan_m, marker
    # r16: the unmarked general path no longer carries the scanner
    # expressions either — staged text keys compute in an Arrow batch
    # UDF (natural_arrow.py). The mark's remaining value: the marked
    # plan stays pure-JVM (no Python boundary at all).
    assert "ArrowEvalPython" in plan_u
    assert "ArrowEvalPython" not in plan_m


def test_mark_drops_on_rewrite(spark):
    """A pipe that rewrites the column value (format) must lose the mark:
    its output can be an arbitrary string."""
    from victorialogs_spark.api import run_query
    from victorialogs_spark.functions.natural import numeric_provenance

    marked, _ = _frames(spark, DOUBLES, "double")
    out = run_query(spark, marked, '* | format "x<v>" as v')
    assert not numeric_provenance(out, "v")
    # and the rewritten values sort through the general path correctly
    df = spark.createDataFrame([(2.0,), (10.0,)], "v double")
    from victorialogs_spark.schema import normalize_log_df

    logs = normalize_log_df(df)
    r = run_query(
        spark, logs, '* | format "x<v>" as v | sort by (v) | fields v'
    ).collect()
    assert [x["v"] for x in r] == ["x2.0", "x10.0"]  # natural, not lexicographic
