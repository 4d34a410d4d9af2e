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


def _all_fields(df: DataFrame, exclude: list[str]) -> list[str]:
    return [c for c in df.columns if c not in exclude]


def _expand(df: DataFrame, fields: list[str], by: list[str]) -> list[str]:
    """Expand '*' and 'prefix*' field args."""
    out: list[str] = []
    for f in fields:
        if f == "*":
            out.extend(_all_fields(df, by))
        elif f.endswith("*"):
            out.extend(c for c in df.columns if c.startswith(f[:-1]))
        else:
            out.append(f)
    return out


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
    ~40% of tpch_pricing_summary wall at sf0.1 — with identical results."""
    dt = dict(df.dtypes).get(field)
    if dt in _DIRECT_DECIMAL_TYPES or (dt or "").startswith("decimal"):
        from victorialogs_spark.functions.natural import qcol

        return qcol(field)
    return fcol(df, field)


# functions whose zero-field form is meaningful: count()/rate() count
# rows; row_any() captures the whole row
_ZERO_ARG_FUNCS = ("count", "rate", "row_any")


def compile_stats_func(
    sf: A.StatsFunc,
    df: DataFrame,
    by_names: list[str],
    cond: Column | None,
    range_seconds: float | None,
) -> Column:
    """Build the aggregate Column for one stats function. `cond` is the
    compiled per-function if-filter (pipe_stats.go:62-71)."""
    name = sf.name
    if name in ("count", "rate") and "*" in sf.fields:
        # count(*) counts ALL rows unconditionally — the reference's
        # MatchAll fast path (stats_count.go:42-46); expanding the star
        # and coalescing non-empties would skip all-empty rows
        # (r15 pipe-semantics corpus finding)
        sf = A.StatsFunc(name, [], sf.result, cond=getattr(sf, "cond", None),
                         extra=dict(getattr(sf, "extra", {}) or {}))
    fields = _expand(df, sf.fields, by_names)
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
            fields = _all_fields(df, by_names)
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
        out = F.when(nvals > 0, total.cast("double"))
        if name == "rate_sum":
            secs = range_seconds if range_seconds and range_seconds > 0 else 1.0
            out = out / F.lit(secs)
        return out.alias(sf.result)

    if name == "sum_len":
        total = None
        for f in fields:
            v = F.octet_length(fcol(df, f))
            v = guard(v)
            s = F.sum(v)
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
        return F.when(tcnt > 0, tsum.cast("double") / tcnt).alias(sf.result)

    if name in ("min", "max"):
        # natural order via (numeric-first, value) struct trick: pack the
        # orderable key and the original string, take min/max of the struct
        keys = []
        for f in fields:
            n = num(df, f)
            s = fcol(df, f)
            nn = F.when(s == "", None).otherwise(n)
            key = F.struct(
                F.when(s == "", F.lit(2))
                .when(nn.isNotNull(), F.lit(0))
                .otherwise(F.lit(1))
                .alias("k0"),
                F.coalesce(nn, F.lit(0.0)).alias("k1"),
                s.alias("k2"),
            )
            keys.append(guard(F.when(s != "", key)))
        merged = keys[0] if len(keys) == 1 else F.least(*keys) if name == "min" else F.greatest(*keys)
        agg = F.min(merged) if name == "min" else F.max(merged)
        return agg.getField("k2").alias(sf.result)

    if name in ("median", "quantile"):
        phi = 0.5 if name == "median" else float(sf.extra.get("phi", 0.5))
        vals = [guard(num(df, f)) for f in fields]
        v = vals[0] if len(vals) == 1 else F.coalesce(*vals)
        # reference uses a 10k reservoir sample (stats_quantile.go:346);
        # percentile_approx is a different approximation — documented
        return F.percentile_approx(v, F.lit(phi), F.lit(10000)).alias(sf.result)

    if name == "histogram":
        # handled by the planner as a two-level aggregate
        # (pipes._histogram_agg) — O(rows) collect_list state per group
        # would OOM an executor on a hot group at 100 TB
        raise NotImplementedError("histogram is planned via pipes._histogram_agg")

    if name == "uniq_values":
        # unique values across ALL listed fields (union, not per-row pick)
        if len(fields) == 1:
            arr = F.array_sort(F.collect_set(guard(_nonempty(df, fields[0]))))
        else:
            row_vals = F.filter(
                F.array(*[fcol(df, f) for f in fields]), lambda x: x != ""
            )
            arr = F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(guard(row_vals))))
            )
        limit = sf.extra.get("limit")
        if limit:
            arr = F.slice(arr, 1, int(limit))
        return F.to_json(arr).alias(sf.result)

    if name == "values":
        # all values (dups kept) across all listed fields
        if len(fields) == 1:
            arr = F.collect_list(guard(fcol(df, fields[0])))
        else:
            arr = F.flatten(
                F.collect_list(guard(F.array(*[fcol(df, f) for f in fields])))
            )
        limit = sf.extra.get("limit")
        if limit:
            arr = F.slice(arr, 1, int(limit))
        return F.to_json(arr).alias(sf.result)

    if name == "json_values":
        struct = F.struct(*[fcol(df, f).alias(f) for f in fields])
        arr = F.collect_list(guard(F.to_json(struct)))
        limit = sf.extra.get("limit")
        if limit:
            arr = F.slice(arr, 1, int(limit))
        return F.concat(F.lit("["), F.array_join(arr, ","), F.lit("]")).alias(sf.result)

    if name == "row_any":
        struct = F.to_json(F.struct(*[fcol(df, f).alias(f) for f in fields])) if fields else F.to_json(
            F.struct(*[fcol(df, c).alias(c) for c in _all_fields(df, by_names)])
        )
        return F.any_value(guard(struct), True).alias(sf.result)

    if name in ("row_min", "row_max"):
        sort_field = sf.fields[0]
        out_fields = _expand(df, sf.fields[1:], by_names) or _all_fields(df, by_names)
        struct = F.to_json(F.struct(*[fcol(df, f).alias(f) for f in out_fields]))
        key = num(df, sort_field)
        g = key.isNotNull() if cond is None else (key.isNotNull() & cond)
        key = F.when(g, key)
        struct = F.when(g, struct)
        agg = F.min_by(struct, key) if name == "row_min" else F.max_by(struct, key)
        return agg.alias(sf.result)

    raise NotImplementedError(f"stats function {name}")


# ---------------------------------------------------------------------------
# vmrange histogram buckets (VictoriaMetrics convention: 18 buckets per
# decade; bucket string "lo...hi")
# ---------------------------------------------------------------------------

_BUCKETS_PER_DECADE = 18.0


