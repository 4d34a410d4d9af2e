"""Stats functions → Spark aggregation expressions.

Reference: lib/logstorage/stats_*.go. Each function maps to a native
partial+final Spark aggregate (exactly the exportState/mergeState model the
reference uses for its cluster path, pipe_stats.go:73-110 — Catalyst gives
it to us for free).

Type conventions (documented divergence from everything-is-a-string):
- count/count_uniq/count_empty/sum_len → bigint
- sum/avg/median/quantile/rate/rate_sum → double (sum accumulates in
  decimal(38,9) for run-to-run determinism, then casts to double)
- min/max/values/uniq_values/row_* → string
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from victorialogs_spark.functions.casts import _try_cast

from victorialogs_spark.functions.natural import fcol, num
from victorialogs_spark.logsql import ast as A


def _expand_flagged(df: DataFrame, fields: list[str]) -> list[tuple[str, bool]]:
    """Expand '*' and 'prefix*' field args to (name, from_wildcard) pairs.
    '*' covers EVERY column, including the group-by fields: the
    reference's getMatchingColumns iterates all block columns with no
    by-field carve-out (stats_avg.go:133-146 defaults empty args to
    ["*"]; the stats_sum/avg/uniq_values pipe tests pin by-field
    inclusion). The flag matters for value-pooling funcs (min/max/
    median/quantile): a NAMED absent field materializes an empty column
    whose '' cells are real values (block_result.go:1986-2003), while a
    wildcard only matches columns existing in the row's block — with our
    every-column-carries-'' frames, ''-cells under a wildcard mean "the
    row doesn't have this field" and must be skipped (r15
    stats-semantics corpus finding: min(b) is '' but min(*) is not)."""
    from victorialogs_spark.functions.prefixfilter import (
        is_wildcard_filter,
        match_filter,
    )

    out: list[tuple[str, bool]] = []
    for f in fields:
        if f == "*":
            out.extend((c, True) for c in df.columns)
        elif is_wildcard_filter(f):
            out.extend((c, True) for c in df.columns if match_filter(f, c))
        else:
            out.append((f, False))
    return out


def _expand(df: DataFrame, fields: list[str]) -> list[str]:
    return [n for n, _ in _expand_flagged(df, fields)]


def _row_fields(df: DataFrame, filters: list[str]) -> list[str]:
    """Output-field list for row_any/row_min/row_max: the reference
    captures matching columns in BLOCK order (the row's own field
    order), each once — so order by df.columns for existing fields,
    dedup, and keep named-but-absent fields (they render '' and drop
    at the JSON step anyway)."""
    expanded = _expand(df, filters)
    ordered: list[str] = []
    seen: set[str] = set()
    for c in df.columns:
        if c in expanded and c not in seen:
            ordered.append(c)
            seen.add(c)
    for c in expanded:
        if c not in seen:
            ordered.append(c)
            seen.add(c)
    return ordered


def _row_json(df: DataFrame, filters: list[str]) -> Column:
    """JSON of the row's matching fields with ''-valued fields DROPPED —
    MarshalFieldsToJSON over the captured fields never sees a column the
    row didn't set (stats_row_max.go:233-235); with our every-column-
    carries-'' frame model, dropping empties is the faithful render."""
    names = _row_fields(df, filters)
    if not names:
        return F.lit("{}")
    m = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in names]),
            F.array(*[fcol(df, n) for n in names]),
        ),
        lambda _, v: v != "",
    )
    return F.to_json(m)


def _natural_struct(df: DataFrame, f: str) -> Column:
    """Orderable (kind, number, text) struct implementing natural order
    with '' as the SMALLEST value — lessString byte-compares '' below
    everything, and the stats_min pipe tests pin that a missing field
    (≡ '') wins min (r15 stats-semantics corpus finding)."""
    from victorialogs_spark.functions.natural import natural_num, natural_tiebreak

    s = fcol(df, f)
    n = natural_num(df, f)
    nn = F.when(s == "", None).otherwise(n)
    return F.struct(
        F.when(s == "", F.lit(-1))
        .when(nn.isNotNull(), F.lit(0))
        .otherwise(F.lit(1))
        .alias("k0"),
        F.coalesce(nn, F.lit(0.0)).alias("k1"),
        # non-numeric pairs compare like LessNatural ('9' < '10' even as
        # text); the encoding is injective, so 'v' never decides order —
        # it just carries the original value for projection.
        # (provenance-marked columns substitute the raw string — see
        # natural_tiebreak — which keeps the struct HOF-free)
        natural_tiebreak(df, f).alias("k2"),
        s.alias("v"),
    )


def _nonempty(df: DataFrame, f: str) -> Column:
    return F.nullif(fcol(df, f), F.lit(""))


# dtypes whose direct cast to decimal(38,9) is bit-identical to the
# string round-trip (Spark casts double→decimal through the shortest
# decimal representation, BigDecimal.valueOf; integers are trivially
# exact). float (32-bit) is NOT here: its string form re-parses through
# double and can differ in the 17th digit.
_DIRECT_DECIMAL_TYPES = ("double", "int", "bigint", "smallint", "tinyint", "long")


def _decimal_src(df: DataFrame, field: str) -> Column:
    """Source column for decimal(38,9) accumulation: typed numeric columns
    skip the fcol() double→string→decimal round-trip — 3 string
    conversions per row per function in the hot aggregate path, measured
    ~40% of tpch_pricing_summary wall at sf0.1 — with identical results.

    Provenance-MARKED string columns (every value is '' or Spark's cast
    of an int/float/double — numeric_provenance) collapse the strict
    gate to a single E-notation exclusion, with identical accepts on
    that domain:

    - int casts: plain '-'?digits, no leading zeros, ≤ 20 chars ≤ 27,
      |v| ≤ 2⁶³ < 1.845e19 — strict accepts, and so does the shortcut
      (no 'E');
    - float/double casts: Java toString emits f-form exactly for
      1e-3 ≤ |v| < 1e7 (plus ±0.0) — ≤ 19 chars, magnitude fine, strict
      accepts; everything else is E-form / 'NaN' / '±Infinity', which
      strict rejects by shape and the shortcut rejects via contains('E')
      or the downstream try_cast→NULL ('N'/'I' forms, '');
    - '_' separators and >27-char shapes cannot occur, so the translate
      and the length/magnitude guards are dead on this domain.

    decimal-typed sources stay on the DIRECT branch above (exact cast),
    never the mark (schema.py marks _NUMSRC_TYPES only) — important
    because a decimal(38,_) can render >27 chars, where the strict gate
    REJECTS and this shortcut must not be reached."""
    dt = dict(df.dtypes).get(field)
    if dt in _DIRECT_DECIMAL_TYPES or (dt or "").startswith("decimal"):
        from victorialogs_spark.functions.natural import qcol

        return qcol(field)
    from victorialogs_spark.functions.natural import numeric_provenance

    c = fcol(df, field)
    if numeric_provenance(df, field):
        return F.when(~c.contains("E"), c)
    return strict_float_str(c)


def strict_float_str(c: Column) -> Column:
    """Gate a string to tryParseFloat64's shape (values_encoder.go): no
    exponents, no edge dots, no leading zeros, '_' separators allowed
    (stripped for the SQL cast), ≤27 chars, magnitude within uint64.
    Sum/avg/histogram ignore values outside this shape
    (getFloatValueAtRow → tryParseFloat64); a bare decimal cast both
    over-accepts ('1e5') and under-accepts ('1_000.5')."""
    ok = (
        c.rlike(r"^-?(0|[1-9][0-9_]*)(\.[0-9_]+)?$")
        & (F.length(c) <= 27)
    )
    cleaned = F.translate(c, "_", "")
    ok = ok & (F.abs(_try_cast(cleaned, "double")) <= F.lit(1.8446744073709552e19))
    return F.when(ok, cleaned)


# functions whose zero-field form is meaningful: count()/rate() count
# rows; row_any() captures the whole row
_ZERO_ARG_FUNCS = ("count", "rate", "row_any")


def compile_stats_func(
    sf: A.StatsFunc,
    df: DataFrame,
    by_names: list[str],  # kept for the call sites; '*' includes by-fields
    cond: Column | None,
    range_seconds: float | None,
) -> Column:
    """Build the aggregate Column for one stats function. `cond` is the
    compiled per-function if-filter (pipe_stats.go:62-71). `by_names` is
    intentionally unused since the r15 wildcard fix — getMatchingColumns
    has no by-field carve-out — but stays in the signature so the two
    call sites keep reading naturally."""
    name = sf.name
    if name in ("count", "rate") and "*" in sf.fields:
        # count(*) counts ALL rows unconditionally — the reference's
        # MatchAll fast path (stats_count.go:42-46); expanding the star
        # and coalescing non-empties would skip all-empty rows
        # (r15 pipe-semantics corpus finding)
        sf = A.StatsFunc(name, [], sf.result, cond=getattr(sf, "cond", None),
                         extra=dict(getattr(sf, "extra", {}) or {}))
    fields = _expand(df, sf.fields)
    if sf.fields and not fields:
        # a wildcard arg that matched no columns behaves exactly like
        # naming an absent field (missing ≡ empty); without this, the
        # per-function loops would fold over zero operands and crash
        fields = ["__vl_absent__"]
    if not fields and name not in _ZERO_ARG_FUNCS:
        # reference rejects these at parse time; raising here covers every
        # entry path with a clear error instead of a fold-over-nothing crash
        raise ValueError(f"stats function {name}() requires at least one field arg")

    def guard(c: Column) -> Column:
        return F.when(cond, c) if cond is not None else c

    if name in ("count", "rate"):
        if not fields:
            out = F.count(guard(F.lit(1)))
        else:
            any_nonempty = F.coalesce(*[_nonempty(df, f) for f in fields])
            out = F.count(guard(any_nonempty))
        if name == "rate":
            secs = range_seconds if range_seconds and range_seconds > 0 else 1.0
            return (out / F.lit(secs)).alias(sf.result)
        return out.alias(sf.result)

    if name == "count_empty":
        if not fields:
            fields = list(df.columns)
        all_empty = F.lit(True)
        for f in fields:
            all_empty = all_empty & (fcol(df, f) == "")
        return F.sum(guard(F.when(all_empty, 1).otherwise(0))).cast("long").alias(sf.result)

    if name in ("count_uniq", "count_uniq_hash"):
        # exact distinct; the reference's `limit N` memory cap is observable
        # (returns N once exceeded) — reproduce with least(count, N)
        vals = [_nonempty(df, f) for f in fields] or [F.lit(None)]
        tup = vals[0] if len(vals) == 1 else F.struct(*[fcol(df, f) for f in fields])
        nonempty = F.coalesce(*vals).isNotNull()
        g = nonempty if cond is None else (nonempty & cond)
        out = F.count_distinct(F.when(g, tup))
        limit = sf.extra.get("limit")
        if limit:
            out = F.least(out, F.lit(int(limit)))
        return out.alias(sf.result)

    if name in ("sum", "rate_sum"):
        # per-field partial sums coalesce to 0 so a field with no numeric
        # values doesn't NULL-poison the total; NULL only when every field
        # contributes nothing (reference ignores unparseable values)
        total, nvals = None, None
        zero = F.lit(0).cast("decimal(38,9)")
        for f in fields:
            v = _try_cast(_decimal_src(df, f), "decimal(38,9)")
            if cond is not None:
                v = F.when(cond, v)
            s, c = F.coalesce(F.sum(v), zero), F.count(v)
            total = s if total is None else total + s
            nvals = c if nvals is None else nvals + c
        # zero parseable values → NaN, not missing: statsSumProcessor
        # starts at NaN and only flips on the first parsed number
        # (stats_sum.go; r15 stats-semantics corpus finding)
        out = F.when(nvals > 0, total.cast("double")).otherwise(
            F.lit(float("nan"))
        )
        if name == "rate_sum":
            secs = range_seconds if range_seconds and range_seconds > 0 else 1.0
            out = out / F.lit(secs)
        return out.alias(sf.result)

    if name == "sum_len":
        total = None
        for f in fields:
            v = F.octet_length(fcol(df, f))
            v = guard(v)
            # per-field coalesce: an all-filtered group sums to 0, not
            # missing (the if(...) pipe test pins x=0 for the empty
            # group — r15 stats-semantics corpus finding)
            s = F.coalesce(F.sum(v), F.lit(0))
            total = s if total is None else total + s
        return total.cast("long").alias(sf.result)

    if name == "avg":
        # avg over all numeric values across all listed fields; per-field
        # partials coalesce to 0 (no NULL-poisoning across fields)
        tsum, tcnt = None, None
        zero = F.lit(0).cast("decimal(38,9)")
        for f in fields:
            v = _try_cast(_decimal_src(df, f), "decimal(38,9)")
            v = guard(v)
            s, c = F.coalesce(F.sum(v), zero), F.count(v)
            tsum = s if tsum is None else tsum + s
            tcnt = c if tcnt is None else tcnt + c
        return (
            F.when(tcnt > 0, tsum.cast("double") / tcnt)
            .otherwise(F.lit(float("nan")))  # zero values → NaN (stats_avg.go)
            .alias(sf.result)
        )

    if name in ("min", "max"):
        # natural order via (kind, number, value) struct trick: pack the
        # orderable key and the original string, take min/max of the
        # struct. '' participates as the smallest value (k0=-1): min over
        # a field any row leaves empty is '' (stats_min.go updateStateString
        # has no empty skip — r15 stats-semantics corpus finding).
        pairs = _expand_flagged(df, sf.fields) or [("__vl_absent__", False)]
        keys = []
        for f, from_wild in pairs:
            key = _natural_struct(df, f)
            if from_wild:
                key = F.when(fcol(df, f) != "", key)
            keys.append(guard(key))
        merged = keys[0] if len(keys) == 1 else F.least(*keys) if name == "min" else F.greatest(*keys)
        agg = F.min(merged) if name == "min" else F.max(merged)
        return agg.getField("v").alias(sf.result)

    if name in ("median", "quantile"):
        # Exact reference semantics (stats_quantile.go histogram.quantile):
        # pool EVERY value of every matching field as a STRING ('' included),
        # sort in natural order, return element int(phi*n) (clamped) — the
        # result is a string, not a number, and non-numeric values are legal
        # quantile inputs. The reference reservoir-samples above 10k values
        # per group (approximate there); we collect exactly — per-group state
        # is O(values), documented in SCALE.md (the reference caps at O(10k)).
        phi = 0.5 if name == "median" else float(sf.extra.get("phi", 0.5))
        pairs = _expand_flagged(df, sf.fields) or [("__vl_absent__", False)]
        arrs = []
        for f, from_wild in pairs:
            key = _natural_struct(df, f)
            if from_wild:
                key = F.when(fcol(df, f) != "", key)
            arrs.append(F.collect_list(guard(key)))
        arr = arrs[0] if len(arrs) == 1 else F.concat(*arrs)
        arr = F.array_sort(arr)
        n_vals = F.size(arr)
        idx = F.greatest(
            F.least(F.floor(F.lit(phi) * n_vals).cast("int"), n_vals - 1),
            F.lit(0),
        )
        return (
            F.when(n_vals > 0, F.element_at(arr, idx + 1).getField("v"))
            .alias(sf.result)
        )

    if name == "histogram":
        # handled by the planner as a two-level aggregate
        # (pipes._histogram_agg) — O(rows) collect_list state per group
        # would OOM an executor on a hot group at 100 TB
        raise NotImplementedError("histogram is planned via pipes._histogram_agg")

    if name == "uniq_values":
        # unique values across ALL listed fields (union, not per-row
        # pick; '' skipped on every path — stats_uniq_values.go:362),
        # sorted in NATURAL order: the merge heap compares with
        # lessString, so "9" sorts before "10" (r15 review; the plain
        # array_sort was lexicographic). Collect the orderable
        # (kind, number, text) struct, sort, project the text back out.
        def key_set(f: str) -> Column:
            s = fcol(df, f)
            return F.collect_set(guard(F.when(s != "", _natural_struct(df, f))))

        arrs = [key_set(f) for f in fields]
        arr = arrs[0] if len(arrs) == 1 else F.array_distinct(F.concat(*arrs))
        arr = F.transform(F.array_sort(arr), lambda x: x.getField("v"))
        limit = sf.extra.get("limit")
        if limit:
            arr = F.slice(arr, 1, int(limit))
        return F.to_json(arr).alias(sf.result)

    if name == "values":
        # all values (dups kept) across all listed fields, COLUMN-major:
        # the reference appends every row of one column before the next
        # (stats_values.go updateStatsForAllRows iterates mc.cs). Named
        # absent fields contribute '' per row; wildcard-matched fields
        # skip ''-cells (the block-existence rule, as for min/max) —
        # r15 review of stats_values.go.
        pairs = _expand_flagged(df, sf.fields) or [("__vl_absent__", False)]
        arrs = []
        for f, from_wild in pairs:
            v = fcol(df, f)
            if from_wild:
                v = F.when(v != "", v)
            arrs.append(F.collect_list(guard(v)))
        arr = arrs[0] if len(arrs) == 1 else F.concat(*arrs)
        limit = sf.extra.get("limit")
        if limit:
            arr = F.slice(arr, 1, int(limit))
        return F.to_json(arr).alias(sf.result)

    if name == "json_values":
        # per-row JSON of the matching fields SORTED BY NAME
        # (stats_json_values.go:87 mc.sort()); named fields keep ''
        # values (the slow path materializes empty columns), while
        # wildcard-matched fields drop ''-cells (the row's block would
        # not have the column) — r15 review of stats_json_values.go
        pairs = _expand_flagged(df, sf.fields) or [("__vl_absent__", False)]
        flags: dict[str, bool] = {}
        for f, w in pairs:
            flags[f] = flags.get(f, True) and w  # named anywhere keeps ''
        names = sorted(flags)
        m = F.map_from_arrays(
            F.array(*[F.lit(n) for n in names]),
            F.array(*[fcol(df, n) for n in names]),
        )
        if any(flags.values()):
            named = [n for n, w in flags.items() if not w]
            if named:
                m = F.map_filter(m, lambda k, v: (v != "") | k.isin(*named))
            else:
                m = F.map_filter(m, lambda k, v: v != "")
        arr = F.collect_list(guard(F.to_json(m)))
        limit = sf.extra.get("limit")
        if limit:
            arr = F.slice(arr, 1, int(limit))
        return F.concat(F.lit("["), F.array_join(arr, ","), F.lit("]")).alias(sf.result)

    if name == "row_any":
        j = _row_json(df, sf.fields or ["*"])
        return F.coalesce(F.any_value(guard(j), True), F.lit("{}")).alias(
            sf.result
        )

    if name in ("row_min", "row_max"):
        # compare the source field in NATURAL order (lessString), skipping
        # '' values (needUpdateStateString rejects empty); capture the
        # matching fields of the winning row; a group with no non-empty
        # source value yields '{}' (r15 stats-semantics corpus findings)
        sort_field = sf.fields[0]
        j = _row_json(df, sf.fields[1:] or ["*"])
        s = fcol(df, sort_field)
        g = (s != "") if cond is None else ((s != "") & cond)
        key = F.when(g, _natural_struct(df, sort_field))
        j = F.when(g, j)
        agg = F.min_by(j, key) if name == "row_min" else F.max_by(j, key)
        return F.coalesce(agg, F.lit("{}")).alias(sf.result)

    raise NotImplementedError(f"stats function {name}")


# ---------------------------------------------------------------------------
# vmrange histogram buckets (VictoriaMetrics convention: 18 buckets per
# decade; bucket string "lo...hi")
# ---------------------------------------------------------------------------

_BUCKETS_PER_DECADE = 18.0


