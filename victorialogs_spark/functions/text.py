"""Token-boundary regex builders for word/phrase/prefix filters.

Tokenization parity with the reference: a token is a run of
[letters, digits, '_'] (lib/logstorage/tokenizer.go:142-147). A phrase
matches when it appears as a substring with non-token chars (or string
edges) on both sides — but a boundary is only required on a side whose
adjacent phrase char is itself a token char (filter_phrase.go matcher).
"""

from __future__ import annotations

import re

# Token runes are UNICODE letters/digits plus '_' (tokenizer.go
# isTokenRune: unicode.IsLetter || unicode.IsDigit || '_'; the ASCII
# range is just its fast path). The ASCII-only classes made 'тест'
# match inside 'тестовый' and split Unicode words at every char in
# unpack_words / the token index (r15 tokenizer-parity finding,
# tokenizer_test.go pins 'теСТ' as ONE token). \p{L}/\p{Nd} are the
# Java spellings of Go's IsLetter/IsDigit.
TOKEN_RE = "[0-9A-Za-z_\\p{L}\\p{Nd}]"
NON_TOKEN_RE = "[^0-9A-Za-z_\\p{L}\\p{Nd}]"


def _is_token_char(ch: str) -> bool:
    if ch.isascii():
        return ch.isalnum() or ch == "_"
    import unicodedata

    cat = unicodedata.category(ch)
    return cat.startswith("L") or cat == "Nd"


def py_tokens(s: str) -> list[str]:
    """Go tokenizeStrings over one string (tokenizer.go): runs of token
    runes. The PYTHON twin of the Java TOKEN_RE class — both sides of
    the bloom sidecar (JVM index build, driver-side query-token probe)
    must classify identically or pruning silently drops matching files;
    Python's re has no \\p{L}, hence the char-walk."""
    out: list[str] = []
    cur: list[str] = []
    for ch in s:
        if _is_token_char(ch):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


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


def _phrase_lookaround(phrase: str) -> str:
    """Phrase-at-token-boundary regex with NON-CONSUMING boundaries, for
    chaining: a consuming boundary group would need the single separator
    char between adjacent phrases twice."""
    body = java_quote(phrase)
    pre = f"(?<!{TOKEN_RE})" if _is_token_char(phrase[0]) else ""
    post = f"(?!{TOKEN_RE})" if _is_token_char(phrase[-1]) else ""
    return pre + body + post


def seq_regex(values: list[str]) -> str:
    """Regex for seq(a, b, ...): PHRASE matches in order — each phrase
    needs token boundaries like the phrase filter (matchSequence →
    getPhrasePos, filter_sequence.go:260-269; r15 filter corpus finding:
    plain substrings matched '1234' inside '12345'). The reference
    commits to the FIRST boundary-valid occurrence of each phrase;
    earliest-choice always extends to a full match when any placement
    exists, so backtracking regex semantics coincide."""
    return ".*".join(_phrase_lookaround(v) for v in values)


# CSI sequences (color_sequence.go skipANSISequence; ECMA-35 §13.1):
# parameter bytes 0x30-0x3f, intermediate bytes 0x20-0x2f, ONE final
# byte 0x30-0x7e (optional — a malformed sequence still drops its ESC[).
# The r15 color-sequence corpus retired the letters-only [0-9;]*[A-Za-z]
# form, which left '?'-params, '~'/'@' finals, and bare ESC[ behind.
ANSI_COLOR_RE = r"\x1B\[[\x30-\x3F]*[\x20-\x2F]*[\x30-\x7E]?"


def drop_color_sequences(s: str) -> str:
    """dropColorSequences replica (color_sequence.go:15) — the Python
    twin of ANSI_COLOR_RE for the ingest-side decolorize_fields path;
    both sides must strip identically."""
    out: list[str] = []
    while True:
        n = s.find("\x1b[")
        if n < 0:
            out.append(s)
            return "".join(out)
        out.append(s[:n])
        s = s[n + 2 :]
        i = 0
        while i < len(s) and "\x30" <= s[i] <= "\x3f":
            i += 1
        while i < len(s) and "\x20" <= s[i] <= "\x2f":
            i += 1
        if i < len(s) and "\x30" <= s[i] <= "\x7e":
            i += 1
        s = s[i:]

# collapse_nums (pipe_collapse_nums.go): number-ish runs → <N>, plus UUID/IP
# prettification
UUID_RE = r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
HEXNUM_RE = r"0[xX][0-9a-fA-F]+"
NUM_RE = r"\d+"


_GROUP_NAME_RE = re.compile(r"\w+")


def _scan_regex(pattern: str, rewrite, rewrite_escape=None):
    """Walk `pattern` tracking escapes and character classes; call
    ``rewrite(pattern, i)`` at each position OUTSIDE both — it returns
    ``(replacement, next_i)`` or None to pass the char through.
    ``rewrite_escape`` gets the same chance at each ``\\x`` escape pair
    outside classes. Blind ``str.replace`` corrupted escaped parens
    (``\\(?P<``) and class literals (``[(?P<]``) — r15 advice."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            if not in_class and rewrite_escape is not None:
                hit = rewrite_escape(pattern, i)
                if hit is not None:
                    rep, i = hit
                    out.append(rep)
                    continue
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            # leading ^ and a literal ']' immediately after '[' / '[^'
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            if i < n and pattern[i] == "]":
                out.append("]")
                i += 1
            continue
        hit = rewrite(pattern, i)
        if hit is not None:
            rep, i = hit
            out.append(rep)
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def to_java_regex(pattern: str) -> str:
    """Python/RE2-flavor regex → the Java flavor rlike/regexp_extract
    execute: ``(?P<name>`` → ``(?<name>``, ``(?P=name)`` → ``\\k<name>``.
    Remaining engine differences (possessive quantifiers, \\p classes)
    are the documented regexp divergence."""

    def rw(p: str, i: int):
        if p.startswith("(?P<", i):
            j = p.find(">", i + 4)
            if j != -1 and _GROUP_NAME_RE.fullmatch(p, i + 4, j):
                return "(?<" + p[i + 4 : j] + ">", j + 1
        elif p.startswith("(?P=", i):
            j = p.find(")", i + 4)
            if j != -1 and _GROUP_NAME_RE.fullmatch(p, i + 4, j):
                return "\\k<" + p[i + 4 : j] + ">", j + 1
        return None

    return _scan_regex(pattern, rw)


def to_python_regex(pattern: str) -> str:
    """Java-flavor named groups → Python flavor (for driver-side
    ``re.compile`` group-index probing): ``(?<name>`` → ``(?P<name>``,
    ``\\k<name>`` → ``(?P=name)``. Lookbehinds ``(?<=`` / ``(?<!`` are
    left untouched (the old blind replace turned them into invalid
    ``(?P<=`` groups)."""

    def rw(p: str, i: int):
        if p.startswith("(?<", i) and not p.startswith("(?<=", i) and not p.startswith("(?<!", i):
            j = p.find(">", i + 3)
            if j != -1 and _GROUP_NAME_RE.fullmatch(p, i + 3, j):
                return "(?P<" + p[i + 3 : j] + ">", j + 1
        return None

    def rw_esc(p: str, i: int):
        if p.startswith("\\k<", i):
            j = p.find(">", i + 3)
            if j != -1 and _GROUP_NAME_RE.fullmatch(p, i + 3, j):
                return "(?P=" + p[i + 3 : j] + ")", j + 1
        return None

    return _scan_regex(pattern, rw, rw_esc)


def anonymize_named_groups(pattern: str) -> str:
    """Python/Java named groups → PLAIN capturing groups, named backrefs
    → numeric backrefs. Group numbering is identical either way, so
    index-based extraction (regexp_extract with idx) and boolean rlike
    are unaffected — while Java's group-NAME grammar ([a-zA-Z][a-zA-Z0-9]*)
    stops rejecting reference-legal names like ``_msg``
    (pipe_extract_regexp_test.go; r15 pipe-semantics corpus finding).
    Escape/class-aware via the same scanner as to_java_regex."""
    # first pass: capturing-group order → name -> index
    names: dict[str, int] = {}
    counter = [0]

    def count_rw(p: str, i: int):
        if p[i] != "(":
            return None
        if p.startswith("(?P<", i) or (
            p.startswith("(?<", i)
            and not p.startswith("(?<=", i)
            and not p.startswith("(?<!", i)
        ):
            off = 4 if p.startswith("(?P<", i) else 3
            j = p.find(">", i + off)
            if j != -1 and _GROUP_NAME_RE.fullmatch(p, i + off, j):
                counter[0] += 1
                names[p[i + off : j]] = counter[0]
                return p[i : j + 1], j + 1
        if not p.startswith("(?", i):
            counter[0] += 1
        return None

    _scan_regex(pattern, count_rw)

    def rw(p: str, i: int):
        if p.startswith("(?P<", i) or (
            p.startswith("(?<", i)
            and not p.startswith("(?<=", i)
            and not p.startswith("(?<!", i)
        ):
            off = 4 if p.startswith("(?P<", i) else 3
            j = p.find(">", i + off)
            if j != -1 and _GROUP_NAME_RE.fullmatch(p, i + off, j):
                return "(", j + 1
        if p.startswith("(?P=", i):
            j = p.find(")", i + 4)
            if j != -1 and p[i + 4 : j] in names:
                return "\\" + str(names[p[i + 4 : j]]), j + 1
        return None

    def rw_esc(p: str, i: int):
        if p.startswith("\\k<", i):
            j = p.find(">", i + 3)
            if j != -1 and p[i + 3 : j] in names:
                return "\\" + str(names[p[i + 3 : j]]), j + 1
        return None

    return _scan_regex(pattern, rw, rw_esc)
