"""Reference-exact JSON flattening for unpack_json.

Implements json_parser.go parseLogMessage/appendLogFields semantics
(maxFieldNameLen = MaxInt, the unpack-pipe configuration,
pipe_unpack_json.go:92):

- nested OBJECTS flatten recursively with dot-joined keys
  ({"y":{"z":{"a":"b"}}} -> y.z.a = "b");
- STRINGS decode their escapes;
- ARRAYS / numbers / true / false keep their source representation:
  numbers as the RAW token (fastjson TypeNumber marshals v.s verbatim —
  "1.20" stays "1.20", NaN stays NaN), arrays re-rendered COMPACTLY
  (whitespace dropped, strings re-escaped) exactly like
  fastjson MarshalTo;
- NULL values emit no field (appendLogFields "Skip nulls");
- an empty TOP-LEVEL key names the field "_msg" (appendLogField);
- duplicate flattened names: last one wins (fields applied in order);
- a non-object top level or any syntax error means the row is left
  unchanged (parseLogMessage returns the error) — flatten returns None.

Used by the unpack_json pipe through an Arrow-batched pandas UDF, but
ONLY for inputs where a plan-time probe finds object-valued keys — flat
JSON (the overwhelming majority of log data) stays on the JVM
from_json fast path.
"""

from __future__ import annotations

import json
import re
from json.decoder import scanstring

_WS = " \t\r\n"

# tokens fastjson accepts as non-string scalars (parseRawNumber plus the
# true/false keywords; null is handled by the caller)
_TOKEN_OK = re.compile(
    r"^(?:true|false|null"
    r"|-?(?:[Nn][Aa][Nn]|[Ii][Nn][Ff](?:[Ii][Nn][Ii][Tt][Yy])?"
    r"|(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?))$"
)

_DELIM = ",}] \t\r\n"


class _Err(ValueError):
    pass


def _ws(s: str, i: int) -> int:
    n = len(s)
    while i < n and s[i] in _WS:
        i += 1
    return i


def _token(s: str, i: int) -> tuple[str, int]:
    j = i
    n = len(s)
    while j < n and s[j] not in _DELIM:
        j += 1
    tok = s[i:j]
    if not _TOKEN_OK.match(tok):
        raise _Err(tok)
    return tok, j


def _render_val(s: str, i: int) -> tuple[str, int]:
    i = _ws(s, i)
    c = s[i]
    if c == '"':
        dec, j = scanstring(s, i + 1, False)
        return json.dumps(dec, ensure_ascii=False), j
    if c == "{":
        return _render_obj(s, i)
    if c == "[":
        return _render_arr(s, i)
    return _token(s, i)


def _render_arr(s: str, i: int) -> tuple[str, int]:
    parts: list[str] = []
    i = _ws(s, i + 1)
    if s[i] == "]":
        return "[]", i + 1
    while True:
        v, i = _render_val(s, i)
        parts.append(v)
        i = _ws(s, i)
        if s[i] == ",":
            i = _ws(s, i + 1)
            continue
        if s[i] == "]":
            return "[" + ",".join(parts) + "]", i + 1
        raise _Err(s[i])


def _render_obj(s: str, i: int) -> tuple[str, int]:
    parts: list[str] = []
    i = _ws(s, i + 1)
    if s[i] == "}":
        return "{}", i + 1
    while True:
        if s[i] != '"':
            raise _Err(s[i])
        k, i = scanstring(s, i + 1, False)
        i = _ws(s, i)
        if s[i] != ":":
            raise _Err(s[i])
        v, i = _render_val(s, i + 1)
        parts.append(json.dumps(k, ensure_ascii=False) + ":" + v)
        i = _ws(s, i)
        if s[i] == ",":
            i = _ws(s, i + 1)
            continue
        if s[i] == "}":
            return "{" + ",".join(parts) + "}", i + 1
        raise _Err(s[i])


def _flatten_obj(s: str, i: int, prefix: str, out: dict) -> int:
    i = _ws(s, i + 1)
    if s[i] == "}":
        return i + 1
    while True:
        if s[i] != '"':
            raise _Err(s[i])
        k, i = scanstring(s, i + 1, False)
        i = _ws(s, i)
        if s[i] != ":":
            raise _Err(s[i])
        i = _ws(s, i + 1)
        name = prefix + k
        if name == "":
            name = "_msg"
        c = s[i]
        if c == "{":
            i = _flatten_obj(s, i, name + ".", out)
        elif c == "[":
            v, i = _render_arr(s, i)
            out[name] = v
        elif c == '"':
            dec, i = scanstring(s, i + 1, False)
            out[name] = dec
        else:
            tok, i = _token(s, i)
            if tok != "null":
                out[name] = tok
        i = _ws(s, i)
        if s[i] == ",":
            i = _ws(s, i + 1)
            continue
        if s[i] == "}":
            return i + 1
        raise _Err(s[i])


def flatten_json_message(s: str) -> dict[str, str] | None:
    """Top-level entry: dict of flattened fields, or None when the value
    is not a parseable JSON object (the caller leaves the row as-is)."""
    try:
        i = _ws(s, 0)
        if i >= len(s) or s[i] != "{":
            return None
        out: dict[str, str] = {}
        j = _flatten_obj(s, i, "", out)
        if _ws(s, j) != len(s):
            return None
        return out
    except (_Err, ValueError, IndexError, RecursionError):
        # RecursionError: adversarially deep nesting — fastjson errors at
        # its own MaxDepth too; the row is left unchanged either way
        return None


def flatten_json_column(src):
    """Arrow-batched map<string,string> column of flattened fields."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _flat(col: "pd.Series") -> "pd.Series":
        return col.map(
            lambda v: flatten_json_message(v) if isinstance(v, str) else None
        )

    # explicit functionType: `from __future__ import annotations` turns the
    # hints into strings the decorator cannot resolve against a
    # function-local pandas import
    from pyspark.sql.functions import PandasUDFType

    udf = F.pandas_udf(_flat, "map<string,string>", PandasUDFType.SCALAR)
    return udf(src)
