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

_SIZE_SUFFIXES = [
    ("KiB", 2**10), ("MiB", 2**20), ("GiB", 2**30), ("TiB", 2**40),
    ("Ki", 2**10), ("Mi", 2**20), ("Gi", 2**30), ("Ti", 2**40),
    ("KB", 10**3), ("MB", 10**6), ("GB", 10**9), ("TB", 10**12),
    ("K", 10**3), ("M", 10**6), ("G", 10**9), ("T", 10**12),
]

_DUR_UNITS = [
    ("ns", 1), ("µs", 1_000), ("us", 1_000), ("ms", 1_000_000),
    ("s", 10**9), ("m", 60 * 10**9), ("h", 3600 * 10**9),
    ("d", 86400 * 10**9), ("w", 7 * 86400 * 10**9), ("y", 365 * 86400 * 10**9),
]

_DUR_RE = re.compile(
    r"(?i)(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w|y)"
)


def parse_duration_ns(s: str) -> int | None:
    """Parse ``1h33m55s`` style durations → nanoseconds, or None.
    Accepts a '+' or '-' sign prefix ('now+30m' arithmetic passes '+30m')."""
    s = s.strip()
    neg = s.startswith("-")
    if neg or s.startswith("+"):
        s = s[1:]
    pos = 0
    total = 0.0
    while pos < len(s):
        m = _DUR_RE.match(s, pos)
        if not m:
            return None
        val = float(m.group(1))
        unit = m.group(2)
        mult = None
        for u, ns in _DUR_UNITS:
            if unit.lower() == u:
                mult = ns
                break
        if mult is None:
            return None
        total += val * mult
        pos = m.end()
    if pos == 0:
        return None
    return int(-total if neg else total)


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
    v = _parse_size_compound(t)
    if v is not None:
        return v
    ns = parse_duration_ns(t)
    if ns is not None:
        return float(ns)
    return None


_SIZE_PART_RE = re.compile(r"(-?\d+(?:\.\d+)?)([A-Za-z]+)")


def _parse_size_compound(t: str) -> float | None:
    """Size literals incl. compound ones: '1.5KB', '22MB100KB' (sum of
    parts, like compound durations)."""
    pos, total = 0, 0.0
    neg = t.startswith("-")
    if neg:
        t = t[1:]
    while pos < len(t):
        m = _SIZE_PART_RE.match(t, pos)
        if not m:
            return None
        mult = None
        for suf, sm in _SIZE_SUFFIXES:
            # single-letter suffixes stay case-sensitive: 'm' is minutes
            # (duration), 'M' is mega
            if m.group(2) == suf or (
                len(suf) >= 2 and m.group(2).lower() == suf.lower()
            ):
                mult = sm
                break
        if mult is None:
            return None
        total += float(m.group(1)) * mult
        pos = m.end()
    if pos == 0:
        return None
    return -total if neg else total
