"""Token-boundary regex builders for word/phrase/prefix filters.

Tokenization parity with the reference: a token is a run of
[letters, digits, '_'] (lib/logstorage/tokenizer.go:142-147). A phrase
matches when it appears as a substring with non-token chars (or string
edges) on both sides — but a boundary is only required on a side whose
adjacent phrase char is itself a token char (filter_phrase.go matcher).
"""

from __future__ import annotations

import re

TOKEN_RE = "[0-9A-Za-z_]"
NON_TOKEN_RE = "[^0-9A-Za-z_]"


def _is_token_char(ch: str) -> bool:
    return ch.isascii() and (ch.isalnum() or ch == "_")


def java_quote(s: str) -> str:
    """Escape a literal for a Java regex."""
    return re.sub(r"([\\.^$|?*+\[\]{}()])", r"\\\1", s)


def phrase_regex(phrase: str) -> str:
    """Regex matching `phrase` at token boundaries (unanchored)."""
    body = java_quote(phrase)
    pre = f"(?:^|{NON_TOKEN_RE})" if _is_token_char(phrase[0]) else ""
    post = f"(?:{NON_TOKEN_RE}|$)" if _is_token_char(phrase[-1]) else ""
    return pre + body + post


def prefix_regex(prefix: str) -> str:
    """Regex for `prefix*`: a token starting with `prefix`."""
    body = java_quote(prefix)
    pre = f"(?:^|{NON_TOKEN_RE})" if _is_token_char(prefix[0]) else ""
    return pre + body


def seq_regex(values: list[str]) -> str:
    """Regex for seq(a, b, ...): substrings in order (filter_sequence.go)."""
    return ".*".join(java_quote(v) for v in values)


ANSI_COLOR_RE = r"\x1B\[[0-9;]*[A-Za-z]"

# collapse_nums (pipe_collapse_nums.go): number-ish runs → <N>, plus UUID/IP
# prettification
UUID_RE = r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
HEXNUM_RE = r"0[xX][0-9a-fA-F]+"
NUM_RE = r"\d+"
