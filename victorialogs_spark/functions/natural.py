"""Shared expression helpers: field access, natural (numeric-aware) ordering,
Go-like number formatting.

VictoriaLogs semantics reproduced here:
- every field is logically a string; empty value ≡ missing field
  (lib/logstorage/block.go:69-73);
- comparisons are "natural": numeric when both sides parse as numbers,
  lexicographic otherwise (docs/victorialogs/LogsQL.md:2735-2738,
  lib/logstorage/pipe_sort.go lessString).

All helpers emit pure Column expressions (JVM-side, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from victorialogs_spark.functions.casts import _try_cast
from pyspark.sql import types as T

TOKEN_CHARS = "0-9A-Za-z_"
NON_TOKEN = f"[^{TOKEN_CHARS}]"


def qcol(name: str) -> Column:
    """Column reference that tolerates dots/special chars in field names."""
    return F.col("`" + name.replace("`", "") + "`")


def fcol(df: DataFrame, name: str) -> Column:
    """Field access with missing≡empty semantics: unknown fields and NULLs
    read as ''. `_time` reads as its RFC3339 string form when used as a
    string field."""
    if name not in df.columns:
        return F.lit("")
    dt = dict(df.dtypes).get(name)
    c = qcol(name)
    if dt == "timestamp":
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    if dt != "string":
        c = c.cast("string")
    return F.coalesce(c, F.lit(""))


def num(df: DataFrame, name: str) -> Column:
    """Numeric view of a field: double, NULL when not parseable."""
    if name in df.columns and dict(df.dtypes).get(name) == "timestamp":
        return (F.unix_micros(qcol(name)) / F.lit(1_000_000.0))
    return _try_cast(fcol(df, name), "double")


def natural_keys(df: DataFrame, name: str) -> list[Column]:
    """Sort keys implementing natural order: numeric values sort before
    non-numeric, numerically; non-numeric sort lexicographically.
    Divergence note vs reference: VictoriaLogs compares pairwise
    (lessString); a total order needs a rule for mixed groups — we place all
    numeric values first, which matches pairwise behavior on homogeneous
    data."""
    if name in df.columns and dict(df.dtypes).get(name) == "timestamp":
        return [qcol(name)]
    n = num(df, name)
    return [
        F.when(n.isNotNull(), F.lit(0)).otherwise(F.lit(1)),
        F.coalesce(n, F.lit(0.0)),
        fcol(df, name),
    ]


def format_number(c: Column) -> Column:
    """Format a double like Go's strconv.FormatFloat(-1): integral values get
    no decimal point ('18' not '18.0')."""
    as_long = c.cast("long")
    return F.when(c.isNull(), F.lit("")).otherwise(
        F.when(
            (c == as_long.cast("double"))
            & (F.abs(c) < F.lit(1e15)),
            as_long.cast("string"),
        ).otherwise(c.cast("string"))
    )


def ipv4_num(c: Column) -> Column:
    """Dotted-quad string → uint32 as long; NULL when not an IPv4."""
    is_ip = c.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    parts = F.split(c, r"\.")
    octets_ok = (
        (_try_cast(parts[0], "int") <= 255)
        & (_try_cast(parts[1], "int") <= 255)
        & (_try_cast(parts[2], "int") <= 255)
        & (_try_cast(parts[3], "int") <= 255)
    )
    val = (
        _try_cast(parts[0], "long") * 16777216
        + _try_cast(parts[1], "long") * 65536
        + _try_cast(parts[2], "long") * 256
        + _try_cast(parts[3], "long")
    )
    return F.when(is_ip & octets_ok, val)


def ipv4_str(c: Column) -> Column:
    """uint32 (long) → dotted-quad string."""
    return F.concat_ws(
        ".",
        ((c / 16777216).cast("long") % 256).cast("string"),
        ((c / 65536).cast("long") % 256).cast("string"),
        ((c / 256).cast("long") % 256).cast("string"),
        (c % 256).cast("string"),
    )


def unsigned_str(c: Column) -> Column:
    """Signed 64-bit → unsigned decimal string (for hash outputs)."""
    return F.conv(F.hex(c), 16, 10)
