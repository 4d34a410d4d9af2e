"""LogsQL lexer.

Token rules mirror the reference lexer behavior
(/root/reference/lib/logstorage/parser.go:148-247):

- a *simple token* is a maximal run of [letters, digits, '_', '.'];
- double-quoted / backtick strings use Go-style unquoting; single-quoted
  strings support the same escapes;
- ``=~``, ``!~``, ``!=``, ``>=``, ``<=`` are two-char tokens (>=/<= handled at
  parse level in the reference; we keep single-char here for fidelity);
- everything else is a single-char token;
- ``#`` starts a comment until end of line;
- whitespace separates tokens, and the parser needs to know whether a token
  was preceded by whitespace (compound phrases glue space-free tokens).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


def _is_token_rune(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


_GO_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
    "v": "\v", "\\": "\\", "'": "'", '"': '"', "`": "`", "/": "/",
}


def _unquote(s: str, pos: int, quote: str) -> tuple[str, int]:
    """Unquote a Go-style quoted string starting at s[pos] == quote.

    Returns (value, end_pos_after_closing_quote). Raises ValueError on bad
    syntax.
    """
    if quote == "`":
        end = s.find("`", pos + 1)
        if end < 0:
            raise ValueError("missing closing backtick")
        return s[pos + 1 : end], end + 1
    out: list[str] = []
    i = pos + 1
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == quote:
            return "".join(out), i + 1
        if ch == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in _GO_ESCAPES:
                out.append(_GO_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "x" and i + 3 < n:
                out.append(chr(int(s[i + 2 : i + 4], 16)))
                i += 4
                continue
            if nxt == "u" and i + 5 < n:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 9 < n:
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            if nxt.isdigit() and i + 3 < n:
                out.append(chr(int(s[i + 1 : i + 4], 8)))
                i += 4
                continue
            raise ValueError(f"unsupported escape \\{nxt}")
        out.append(ch)
        i += 1
    raise ValueError(f"missing closing quote {quote!r}")


@dataclass
class Token:
    text: str          # unquoted token value
    raw: str           # original source text
    quoted: bool       # True if the token was a quoted string
    space_before: bool # True if whitespace preceded this token
    pos: int           # byte offset in source

    def is_kw(self, *kws: str) -> bool:
        """Case-insensitive keyword check; quoted tokens are never keywords."""
        if self.quoted:
            return False
        t = self.text.lower()
        return any(t == k for k in kws)


_EOF = Token(text="", raw="", quoted=False, space_before=True, pos=-1)


class Lexer:
    """Streaming tokenizer with one-token lookahead and state backup."""

    def __init__(self, s: str):
        self.src = s
        self._pos = 0
        self.token: Token = _EOF
        self.prev_token: Token = _EOF
        self.next_token()

    # -- state management (the parser backtracks like the reference does) --
    def backup(self) -> tuple:
        return (self._pos, self.token, self.prev_token)

    def restore(self, state: tuple) -> None:
        self._pos, self.token, self.prev_token = state

    def context(self) -> str:
        head = self.src[: self._pos]
        return head[-60:]

    # -- core --
    def is_end(self) -> bool:
        return self.token is _EOF or (self.token.text == "" and self.token.raw == "")

    def next_token(self) -> Token:
        self.prev_token = self.token
        s, i, n = self.src, self._pos, len(self.src)
        space = False
        while True:
            while i < n and s[i].isspace():
                space = True
                i += 1
            if i < n and s[i] == "#":
                j = s.find("\n", i)
                i = n if j < 0 else j + 1
                space = True
                continue
            break
        if i >= n:
            self._pos = i
            self.token = Token("", "", False, space, i)
            return self.token
        start = i
        ch = s[i]
        # simple token: [alnum_] plus '.'
        if _is_token_rune(ch) or ch == ".":
            while i < n and (_is_token_rune(s[i]) or s[i] == "."):
                i += 1
            self.token = Token(s[start:i], s[start:i], False, space, start)
        elif ch in ('"', "'", "`"):
            try:
                val, i = _unquote(s, i, ch)
                self.token = Token(val, s[start:i], True, space, start)
            except ValueError:
                # not a valid quoted string: emit the quote as a plain
                # single-char token (parser.go nextToken falls back to
                # nextCharToken on QuotedPrefix error; compound phrases
                # glue it mid-token, and getCompoundPhrase rejects it at
                # phrase START via isInvalidQuotedString)
                i = start + 1
                self.token = Token(ch, ch, False, space, start)
        elif ch == "=" and s[i : i + 2] == "=~":
            i += 2
            self.token = Token("=~", "=~", False, space, start)
        elif ch == "!" and s[i : i + 2] in ("!~", "!="):
            i += 2
            self.token = Token(s[start:i], s[start:i], False, space, start)
        else:
            i += 1
            self.token = Token(ch, ch, False, space, start)
        self._pos = i
        return self.token


class LexError(ValueError):
    pass


# ---------------------------------------------------------------------------
# numeric / duration literals (docs/victorialogs/LogsQL.md:4148-4190)
# ---------------------------------------------------------------------------

_U64_MAX = (1 << 64) - 1
_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)


def _try_uint64(s: str) -> int | None:
    """values_encoder.go tryParseUint64: ASCII decimal digits with '_'
    separators; leading zeros and >u64 overflow reject."""
    if not s or len(s) > 26:  # len("18_446_744_073_709_551_615")
        return None
    if len(s) > 1 and s[0] == "0":
        return None
    n = 0
    for ch in s:
        if ch == "_":
            continue
        if not "0" <= ch <= "9":
            return None
        n = n * 10 + (ord(ch) - 48)
        if n > _U64_MAX:
            return None
    return n


def try_parse_float64(s: str) -> float | None:
    """values_encoder.go tryParseFloat64: decimal digits, one dot, '_'
    separators, optional leading '-'; NO exponents, NO edge dots, NO
    leading zeros in the integer part; the fraction combines via a fused
    multiply-add (single rounding)."""
    from fractions import Fraction

    if not s or len(s) > 27:  # len("-18_446_744_073_709_551_615")
        return None
    minus = s[0] == "-"
    if minus:
        s = s[1:]
    dot = s.find(".")
    if dot < 0:
        n = _try_uint64(s)
        if n is None:
            return None
        return -float(n) if minus else float(n)
    if dot == 0 or dot == len(s) - 1:
        return None
    n_int = _try_uint64(s[:dot])
    if n_int is None:
        return None
    frac = s[dot + 1 :]
    k = 0
    while k < len(frac) - 1 and frac[k] == "0":
        k += 1
    n_frac = _try_uint64(frac[k:])
    if n_frac is None:
        return None
    p10 = 10.0 ** (frac.count("_") - len(frac))
    # math.fma is 3.13+; exact-rational emulation rounds once like FMA
    f = float(Fraction(n_frac) * Fraction(p10) + n_int)
    return -f if minus else f


def _float64_prefix(s: str) -> tuple[float | None, str]:
    """tryParseFloat64Prefix: the leading [0-9._]+ run as a float64 plus
    the tail (None float when the run is empty or unparseable)."""
    i = 0
    while i < len(s) and (s[i].isdigit() and s[i].isascii() or s[i] in "._"):
        i += 1
    if i == 0:
        return None, s
    return try_parse_float64(s[:i]), s[i:]


def _add_i64_no_overflow(n: int, f: float) -> int:
    """addInt64NoOverflow parity, including Go/amd64 float→int64
    saturation-to-MIN for out-of-range values (which the clamp then
    turns into i64-max)."""
    import math as _math

    if _math.isnan(f) or not _I64_MIN <= f < float(1 << 63):
        x = _I64_MIN
    else:
        x = int(f)
    if n < 0 or x < 0 or x > _I64_MAX - n:
        return _I64_MAX
    return n + x


_DUR_UNITS = [  # checked longest-first, like the reference's prefix tests
    ("µs", 1e3), ("ms", 1e6), ("ns", 1.0),
    ("y", 365 * 24 * 3600 * 1e9), ("w", 7 * 24 * 3600 * 1e9),
    ("d", 24 * 3600 * 1e9), ("h", 3600 * 1e9), ("m", 60 * 1e9),
    ("s", 1e9),
]


def parse_duration_ns(s: str) -> int | None:
    """values_encoder.go tryParseDuration replica: ``1h33m55s`` compound
    durations → nanoseconds with per-part int64 truncation and overflow
    clamping to ±(2⁶³−1); '_' digit separators; case-sensitive units
    (µs, not us); no embedded spaces. Extension: a '+' sign prefix is
    accepted ('now+30m' arithmetic passes '+30m')."""
    if not s:
        return None
    neg = s[0] == "-"
    if neg or s[0] == "+":
        s = s[1:]
    if not s:
        # the reference returns (0, true) for a bare sign, but no query
        # reaches it that way — its lexer never glues '-' to nothing;
        # accepting it here would let 'limit -1' parse (failure corpus)
        return None
    nsecs = 0
    while s:
        f, s = _float64_prefix(s)
        if f is None or not s:
            return None  # unparseable number, or a number with no unit
        for unit, mult in _DUR_UNITS:
            if s.startswith(unit):
                nsecs = _add_i64_no_overflow(nsecs, f * mult)
                s = s[len(unit) :]
                break
        else:
            return None
    return -nsecs if neg else nsecs


_BYTE_SUFFIXES = [  # tryParseBytes: longest-first, case-sensitive
    ("KiB", 1 << 10), ("MiB", 1 << 20), ("GiB", 1 << 30), ("TiB", 1 << 40),
    ("Ki", 1 << 10), ("Mi", 1 << 20), ("Gi", 1 << 30), ("Ti", 1 << 40),
    ("KB", 1e3), ("MB", 1e6), ("GB", 1e9), ("TB", 1e12),
    ("B", 1.0), ("K", 1e3), ("M", 1e6), ("G", 1e9), ("T", 1e12),
]


def try_parse_bytes(s: str) -> int | None:
    """values_encoder.go tryParseBytes replica: compound size literals
    ('1.5KB', '22MB100KB', bare integers) → bytes with per-part int64
    truncation and overflow clamping; case-sensitive suffixes
    (K/KB/Ki/KiB families plus bare B); a FRACTIONAL number without a
    suffix rejects."""
    import math as _math

    if not s:
        return None
    neg = s[0] == "-"
    if neg:
        s = s[1:]
    if not s:
        return None  # bare '-': see the note in parse_duration_ns
    n = 0
    while s:
        f, tail = _float64_prefix(s)
        if f is None:
            return None
        if not tail and _math.modf(f)[0] != 0.0:
            return None  # deny floating-point numbers without any suffix
        s = tail
        if not s:
            n = _add_i64_no_overflow(n, f)
            continue
        for suf, mult in _BYTE_SUFFIXES:
            if s.startswith(suf):
                n = _add_i64_no_overflow(n, f * mult)
                s = s[len(suf) :]
                break
        else:
            return None
    return -n if neg else n


def _date_uint(s: str) -> int | None:
    """values_encoder.go tryParseDateUint64: ASCII digits, ≤9 chars —
    INCLUDING its two-char fast path that validates only the first
    char (so '1x' yields 10 + ('x'-'0' mod 256); kept bug-for-bug, it
    feeds date/ipv4 parsing in the reference)."""
    if not s or len(s) > 9:
        return None
    if len(s) == 2:
        if not ("0" <= s[0] <= "9" and s.isascii()):
            return None
        return 10 * (ord(s[0]) - 48) + ((ord(s[1]) - 48) % 256)
    n = 0
    for ch in s:
        if not ("0" <= ch <= "9" and ch.isascii()):
            return None
        n = n * 10 + (ord(ch) - 48)
    return n


def _try_hhmm_ns(s: str) -> int | None:
    # tryParseHHMM: 'hh:mm' with the reference's lax bounds (h<=24, m<=60)
    if len(s) != 5 or s[2] != ":":
        return None
    h, m = _date_uint(s[:2]), _date_uint(s[3:])
    if h is None or h > 24 or m is None or m > 60:
        return None
    return (h * 3600 + m * 60) * 10**9


def _tz_offset_ns(s: str) -> tuple[int, str] | None:
    """parseTimezoneOffset: trailing Z, ±hh:mm, or (no marker) the LOCAL
    timezone offset; returns (offset_ns, prefix) or None."""
    if s.endswith("Z"):
        return 0, s[:-1]
    n = max(s.rfind("+"), s.rfind("-"))
    if n < 0:
        import time as _time

        local = -(
            _time.altzone
            if _time.daylight and _time.localtime().tm_isdst
            else _time.timezone
        )
        return local * 10**9, s
    off = _try_hhmm_ns(s[n + 1 :])
    if off is None:
        return None
    return (-off if s[n] == "-" else off), s[:n]


def _timestamp_secs(s: str) -> tuple[int, str] | None:
    """tryParseTimestampSecs: 'YYYY-MM-DD[T ]HH:MM:SS' → (unix seconds,
    tail). Year bounds 1677..2262 (int64-ns representability); month /
    day / time components NORMALIZE like Go time.Date (month 13 = Jan of
    the next year) rather than rejecting."""
    import datetime as _dt

    if s[4] != "-":
        return None
    year = _date_uint(s[:4])
    if year is None or not 1677 <= year <= 2262:
        return None
    s = s[5:]
    if s[2] != "-":
        return None
    month = _date_uint(s[:2])
    if month is None:
        return None
    s = s[3:]
    if s[2] not in ("T", " "):  # space: SQL datetime form (issue 6721)
        return None
    day = _date_uint(s[:2])
    if day is None:
        return None
    s = s[3:]
    if s[2] != ":":
        return None
    hour = _date_uint(s[:2])
    if hour is None:
        return None
    s = s[3:]
    if s[2] != ":":
        return None
    minute = _date_uint(s[:2])
    if minute is None:
        return None
    s = s[3:]
    second = _date_uint(s[:2])
    if second is None:
        return None
    s = s[2:]
    # Go time.Date component normalization
    year += (month - 1) // 12
    month = (month - 1) % 12 + 1
    try:
        d0 = _dt.date(year, month, 1)
    except ValueError:
        return None
    days = (d0 - _dt.date(1970, 1, 1)).days + (day - 1)
    secs = days * 86400 + hour * 3600 + minute * 60 + second
    if secs < _I64_MIN // 10**9 + 1 or secs >= _I64_MAX // 10**9:
        return None  # too big or too small for int64 nanoseconds
    return secs, s


def try_parse_rfc3339_ns(s: str) -> int | None:
    """values_encoder.go TryParseTimestampRFC3339Nano replica: full
    RFC3339 (or SQL space-separated) datetime with optional fractional
    seconds (≤9 digits) and Z/±hh:mm/absent(→local) zone → unix ns;
    None when unparseable or outside int64-ns range."""
    if len(s) < 19:  # len("2006-01-02T15:04:05")
        return None
    r = _timestamp_secs(s)
    if r is None:
        return None
    secs, tail = r
    ns = secs * 10**9
    tz = _tz_offset_ns(tail)
    if tz is None:
        return None
    off, frac_s = tz
    ns -= off
    if not frac_s:
        return ns
    if frac_s[0] == ".":
        frac_s = frac_s[1:]
    if len(frac_s) > 9:
        return None
    n = _date_uint(frac_s)
    if n is None:
        return None
    return ns + n * 10 ** (9 - len(frac_s))


def try_parse_iso8601_ns(s: str) -> int | None:
    """values_encoder.go tryParseTimestampISO8601 replica: exactly
    'YYYY-MM-DD[T ]hh:mm:ss.mmmZ' (millisecond precision, Z only — no
    other zone, so values round-trip) → unix ns."""
    if len(s) != 24:  # len("2006-01-02T15:04:05.000Z")
        return None
    r = _timestamp_secs(s)
    if r is None:
        return None
    secs, tail = r
    if tail[0] != "." or tail[4] != "Z":
        return None
    msecs = _date_uint(tail[1:4])
    if msecs is None:
        return None
    return secs * 10**9 + msecs * 10**6


def parse_number(s: str) -> float | None:
    """Parse a LogsQL numeric literal: plain, underscores, size suffix,
    or duration (durations → nanoseconds). Returns None if not numeric."""
    s = s.strip()
    if not s:
        return None
    t = s.replace("_", "")
    low = t.lower()
    if low in ("inf", "+inf"):
        return float("inf")
    if low == "-inf":
        return float("-inf")
    if low == "nan":
        return float("nan")
    try:
        if low.startswith("0x") or low.startswith("-0x"):
            return float(int(t, 16))
        if low.startswith("0o") or low.startswith("-0o"):
            return float(int(t, 8))
        if low.startswith("0b") or low.startswith("-0b"):
            return float(int(t, 2))
        return float(t)
    except ValueError:
        pass
    # parser.go parseUint/parseFloat64 fall back to tryParseBytes, then
    # tryParseDuration — keep that order (underscores already stripped)
    v = try_parse_bytes(t)
    if v is not None:
        return float(v)
    ns = parse_duration_ns(t)
    if ns is not None:
        return float(ns)
    return None
