"""Arrow-vectorized natural-order keys for the staged-sort path.

The natural-order keys over GENUINE string fields carry two
CodegenFallback subtrees: the tryParseDuration/tryParseBytes scanners
(higher-order functions over the token array) and the LessNatural run
encoder (transform over regexp_extract_all runs). One such expression
excludes the whole enclosing Project from whole-stage codegen, so the
staging projection _staged_sort builds runs INTERPRETED per row — the
recorded r15 "Not yet optimized" item and the largest remaining scale
risk in the query core (a 100 TB sort on a real mixed-text field pays
the interpreted path per row).

This module computes the same two values in ONE Arrow pandas UDF
(guide §4.2: hand whole batches to Python, keep the JVM expressions
codegen-friendly): per field, the staging Project then contains only
try_cast/when/coalesce (codegen'd) plus one ArrowEvalPython node.

EXACTNESS CONTRACT — the UDF must be byte-identical to the Column
expressions it replaces, because sort results are oracle-declared:

- ``_scan_value`` replicates ``_go_compound_col`` (functions/natural.py)
  operation by operation — the COLUMN algorithm, NOT the lexer twins in
  logsql/lexer.py (the lexer's FMA float combine can differ from the
  column's decimal try_cast in the last ulp, e.g. '0.3'): same token
  regexes, same validity gates, Python ``float()`` of the '_'-stripped
  decimal (correctly-rounded, same as Spark's string→double cast), same
  IEEE double multiply, ``_try_long`` twin of Spark's try_cast
  double→long (validity boundary pinned empirically: valid iff
  -2⁶³ ≤ d ≤ 2⁶³, with 2⁶³ saturating to i64-max), and the reference's
  overflow-clamped fold.
- ``_text_key`` is the py_natural_key twin already pinned byte-equal to
  ``natural_text_key`` by tests/test_natural_order.py (CASES + the
  LessNatural property suite); it returns the SAME codepoints so the
  UTF-8 string comparison matches the JVM key bytes.

Equality of UDF vs expressions is pinned by
tests/test_natural_arrow.py over the adversarial corpus + hypothesis
strings (duration/size shapes, unicode, controls, edge dots).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_I64_MAX = (1 << 63) - 1
_TWO63 = 9223372036854775808.0  # 2^63 as a double (exact)

# token regexes — verbatim from natural._GO_DUR_TOKEN_RE /
# _GO_BYTE_TOKEN_RE (minus the (?:...) wrapper semantics, identical in
# Python re); longest-first alternation order preserved
_DUR_TOKEN_RE = re.compile(r"[0-9._]+(?:µs|ms|ns|y|w|d|h|m|s)")
_BYTE_TOKEN_RE = re.compile(
    r"[0-9._]+(?:KiB|MiB|GiB|TiB|Ki|Mi|Gi|Ti|KB|MB|GB|TB|B|K|M|G|T)?"
)
_VAL_RE = re.compile(r"^([0-9._]+)")
_UNIT_RE = re.compile(r"([^0-9._]+)$")
_LEAD_ZERO_RE = re.compile(r"^0[0-9_]")
_TWO_DOTS_RE = re.compile(r"\..*\.")

_DUR_UNITS = {
    "µs": 1e3, "ms": 1e6, "ns": 1.0,
    "y": 365 * 24 * 3600 * 1e9, "w": 7 * 24 * 3600 * 1e9,
    "d": 24 * 3600 * 1e9, "h": 3600 * 1e9, "m": 60 * 1e9, "s": 1e9,
}
_BYTE_UNITS = {
    "KiB": float(1 << 10), "MiB": float(1 << 20),
    "GiB": float(1 << 30), "TiB": float(1 << 40),
    "Ki": float(1 << 10), "Mi": float(1 << 20),
    "Gi": float(1 << 30), "Ti": float(1 << 40),
    "KB": 1e3, "MB": 1e6, "GB": 1e9, "TB": 1e12,
    "B": 1.0, "K": 1e3, "M": 1e6, "G": 1e9, "T": 1e12,
}

_GATE_RE = re.compile(r"^-?[0-9._]")  # natural_num's scanner gate shape


def _try_long(d: float) -> int | None:
    """Spark try_cast(double → long) twin (boundary pinned empirically:
    NaN/out-of-[-2⁶³, 2⁶³] → NULL; exactly 2⁶³ saturates to i64-max;
    in-range truncates toward zero — Python int() matches Java (long))."""
    if math.isnan(d) or d < -_TWO63 or d > _TWO63:
        return None
    if d >= _TWO63:
        return _I64_MAX
    return int(d)


def _scan_one(s: str, token_re, units: dict, bare_int: bool) -> int | None:
    """_go_compound_col twin for ONE string (already non-empty)."""
    body = s[1:] if s.startswith("-") else s
    toks = token_re.findall(body)
    if not body or "".join(toks) != body:
        return None
    total = 0
    for t in toks:
        m = _VAL_RE.match(t)
        v = m.group(1) if m else ""
        um = _UNIT_RE.search(t)
        unit = um.group(1) if um else ""
        # tok_ok: one dot max, not at either edge, no leading zero in
        # the integer part; bytes additionally reject a bare fractional
        if (
            _TWO_DOTS_RE.search(v)
            or v.startswith(".")
            or v.endswith(".")
            or _LEAD_ZERO_RE.match(v)
        ):
            return None
        if bare_int and unit == "" and "." in v:
            return None
        stripped = v.replace("_", "")
        dval = 0.0 if stripped == "" else float(stripped)
        if unit == "":
            if not bare_int:
                return None  # unreachable: the duration regex demands a unit
            mult = 1.0
        else:
            mult = units[unit]  # regex guarantees membership
        x = _try_long(dval * mult)
        if x is None:
            x = _I64_MAX  # the coalesce clamp
        # least(total, MAX - x) + x — exact int64 fold, never overflows
        total = min(total, _I64_MAX - x) + x
    return -total if s.startswith("-") else total


def _scan_value(gated: str | None) -> float | None:
    """coalesce(duration_ns_col(gated), bytes_col(gated)).cast('double')
    twin. ``gated`` is NULL unless the value failed the numeric parse
    AND starts '-'?[0-9._] (the natural_num gate, computed JVM-side)."""
    if gated is None:
        return None
    ns = _scan_one(gated, _DUR_TOKEN_RE, _DUR_UNITS, False)
    if ns is None:
        ns = _scan_one(gated, _BYTE_TOKEN_RE, _BYTE_UNITS, True)
    return float(ns) if ns is not None else None


_NAT_SPLIT_RE = re.compile(r"(?<=[^0-9])(?=[0-9])|(?<=[0-9])(?=[^0-9])")


def _esc_ctl_b(t: bytes) -> bytes:
    return (
        t.replace(b"\x02", b"\x02\x02")
        .replace(b"\x01", b"\x02\x01")
        .replace(b"\x00", b"\x02\x00")
    )


def _text_key(s: str) -> str:
    """py_natural_key twin (tests/test_natural_order.py), decoded back
    to str: only ASCII marker bytes are injected and multi-byte UTF-8
    sequences contain no byte ≤ 0x02, so the bytes stay valid UTF-8 and
    the string's UTF-8 comparison equals the byte comparison."""
    if s == "":
        return ""
    out = bytearray()
    for run in _NAT_SPLIT_RE.split(s):
        if run and run[0].isdigit() and run.isascii():
            if len(run) <= 19:
                d = run.lstrip("0") or "0"
                out += b"\x01" + f"{len(d):02d}".encode() + d.encode()
                out += f"{len(run) - len(d):04d}".encode()
            else:
                out += b"\x0199" + run.encode()
        else:
            out += b"\x02" + _esc_ctl_b(run.encode())
    return out.decode("utf-8")


def natural_arrow_struct(gated: Column, s: Column) -> Column:
    """struct(scan double, key string) over (gated-scanner-input, value):
    ``scan`` twins coalesce(duration_ns, bytes) on the gated input,
    ``key`` twins natural_text_key(s). One Arrow batch round-trip per
    row set; marked nondeterministic (the function is deterministic) so
    CollapseProject cannot clone the UDF into each field extraction —
    the minhash r14 pathology."""
    import pandas as pd

    def _keys(g: pd.Series, v: pd.Series) -> pd.DataFrame:
        scans = [_scan_value(x) for x in g.tolist()]
        keys = [_text_key(x) if x is not None else "" for x in v.tolist()]
        return pd.DataFrame({"scan": scans, "key": keys})

    _keys.__annotations__ = {
        "g": pd.Series, "v": pd.Series, "return": pd.DataFrame
    }
    udf = F.pandas_udf(_keys, "scan double, key string").asNondeterministic()
    return udf(gated, s)
