"""LogsQL recursive-descent parser.

Grammar mirrors the reference parser
(/root/reference/lib/logstorage/parser.go:1280+, pipe dispatch
lib/logstorage/pipe.go:119-386) — re-implemented from scratch in Python.

    query  := options? filterOr ( '|' pipe )*
    filterOr  := filterAnd ( 'or' filterAnd )*
    filterAnd := filterNot ( 'and'? filterNot )*
    filterNot := ('not'|'!'|'-') filterNot | filterPrim
    filterPrim := '(' filterOr ')' | '{' streamFilter '}'
              | fieldName ':' fieldExpr | fieldExpr     # default field _msg
"""

from __future__ import annotations

import datetime as _dt
import re

from victorialogs_spark.logsql import ast as A
from victorialogs_spark.logsql.lexer import (
    Lexer,
    Token,
    parse_duration_ns,
    parse_number,
    try_parse_bytes,
    try_parse_float64,
)

NS = 10**9

# Practically-unbounded upper bound for lexicographic string ranges
# (reference: maxStringRangeValue, filter_string_range.go:9).
MAX_STRING_RANGE = "\U0010ffff" * 4

# fmt: off
_PIPE_NAMES = {
    "fields", "keep", "delete", "drop", "rm", "del", "copy", "cp", "rename", "mv",
    "filter", "where", "limit", "head", "offset", "skip", "sort", "order",
    "first", "last", "stats", "stats_remote", "by", "math", "eval", "extract",
    "extract_regexp", "replace", "replace_regexp", "format", "unpack_json",
    "unpack_logfmt", "unpack_syslog", "unpack_words", "unroll", "pack_json",
    "pack_logfmt", "join", "union", "uniq", "top", "facets", "field_names",
    "field_values", "len", "json_array_len", "hash", "sample",
    "collapse_nums", "decolorize", "drop_empty_fields", "stream_context",
    "blocks_count", "block_stats",
}

_STATS_FUNCS = {
    "count", "count_empty", "count_uniq", "count_uniq_hash", "sum", "sum_len",
    "avg", "min", "max", "median", "quantile", "histogram", "uniq_values",
    "values", "json_values", "row_any", "row_min", "row_max", "rate",
    "rate_sum",
}
# fmt: on


class ParseError(ValueError):
    pass


def parse_query(s: str, timestamp_ns: int | None = None) -> A.Query:
    p = Parser(s, timestamp_ns)
    q = p.parse()
    if not p.lex.is_end():
        raise ParseError(f"unexpected tail at {p.lex.context()!r}: {p.lex.token.raw!r}")
    return q


class Parser:
    def __init__(self, s: str, timestamp_ns: int | None = None):
        self.lex = Lexer(s)
        now = timestamp_ns
        if now is None:
            now = int(_dt.datetime.now(_dt.timezone.utc).timestamp() * NS)
        self.now_ns = now
        self._opts_ctx: list[dict] = []  # enclosing-query options stack

    # ------------------------------------------------------------------ util
    def tok(self) -> Token:
        return self.lex.token

    def advance(self) -> Token:
        return self.lex.next_token()

    def expect(self, text: str) -> None:
        if not self.tok().is_kw(text):
            raise ParseError(
                f"expected {text!r}, got {self.tok().raw!r} near {self.lex.context()!r}"
            )
        self.advance()

    def err(self, msg: str) -> ParseError:
        return ParseError(f"{msg} near {self.lex.context()!r} (token {self.tok().raw!r})")

    def _guard_end(self, what: str) -> None:
        if self.lex.is_end():
            raise ParseError(f"unexpected end of query while parsing {what}")

    def _check_filter_start(self) -> None:
        """A filter cannot start with an unquoted pipe / stats-func name
        (parser.go parseFilter:1430-1435; pipeNames includes statsNames) —
        catches `filter foo:bar`, `foo | count`, etc."""
        t = self.tok()
        if t.quoted:
            return
        name = t.text.lower()
        if name in _PIPE_NAMES or name in _STATS_FUNCS:
            # a name immediately followed by '(' is a function-style filter
            # (e.g. len_range(...)) or implicit stats — let those dispatch
            if getattr(self, f"_parse_f_{name}", None) is not None:
                return
            raise self.err(
                f"query filter cannot start with pipe keyword {name!r};"
                " put the word into quotes to search for it"
            )

    # ------------------------------------------------------------------ query
    def parse(self, subquery: bool = False) -> A.Query:
        options = self._parse_options()
        if self._opts_ctx:
            # subqueries inherit the enclosing query's options; their own
            # options(...) clause overrides per key (parser.go:261-262)
            options = {**self._opts_ctx[-1], **options}
        self._opts_ctx.append(options)
        try:
            self._check_filter_start()
            f = self.parse_filter_or()
            pipes: list[A.Pipe] = []
            while self.tok().is_kw("|"):
                self.advance()
                pipes.append(self.parse_pipe())
        finally:
            self._opts_ctx.pop()
        q = A.Query(filter=f, pipes=pipes, options=options)
        q.time_range = extract_time_range(q.filter)
        return q

    def _parse_options(self) -> dict:
        opts: dict = {}
        if not self.tok().is_kw("options"):
            return opts
        self.advance()
        # 'options' is reserved at query start — reference requires '('
        # (ParseQuery → parseOptions; a bare 'options' search word must be
        # quoted)
        self.expect("(")
        while not self.tok().is_kw(")"):
            self._guard_end("options")
            name = self.tok().text
            self.advance()
            self.expect("=")
            opts[name] = self.tok().text
            self.advance()
            if self.tok().is_kw(","):
                self.advance()
        self.advance()
        return opts

    # ---------------------------------------------------------------- filters
    def parse_filter_or(self, field: str = "") -> A.Filter:
        terms = [self.parse_filter_and(field)]
        while self.tok().is_kw("or"):
            self.advance()
            terms.append(self.parse_filter_and(field))
        if len(terms) == 1:
            return terms[0]
        return A.FOr(terms)

    _FILTER_END = ("|", ")", "", "or")

    def parse_filter_and(self, field: str = "") -> A.Filter:
        terms = [self.parse_filter_not(field)]
        while True:
            t = self.tok()
            if t.is_kw(*self._FILTER_END) and not t.quoted:
                break
            if self.lex.is_end():
                break
            if t.is_kw("and"):
                self.advance()
            terms.append(self.parse_filter_not(field))
        if len(terms) == 1:
            return terms[0]
        return A.FAnd(terms)

    def parse_filter_not(self, field: str = "") -> A.Filter:
        if self.tok().is_kw("not", "!", "-"):
            self.advance()
            child = self.parse_filter_not(field)
            return A.FNot(child)
        return self.parse_filter_prim(field)

    def parse_filter_prim(self, field: str) -> A.Filter:
        t = self.tok()
        fld = canonical_field(field)
        if t.is_kw("{"):
            if field not in ("", "_stream"):
                raise self.err(
                    f"stream filter cannot be applied to {field!r} field"
                )
            return self._parse_stream_filter()
        if t.is_kw("("):
            # '(': only valid after whitespace or an opener token —
            # `unknown_function(foo)` is an error, not phrase+group
            # (parser.go:1516-1519)
            prev = self.lex.prev_token
            if not t.space_before and prev.raw.lower() not in ("", ":", "(", "!", "-", "not"):
                raise self.err(f"missing whitespace after the search word {prev.text!r}")
            # field scope distributes over the group:  foo:(a or b)
            # == foo:a or foo:b  (parser.go parseParensFilter propagates
            # fieldName)
            self.advance()
            f = self.parse_filter_or(field)
            self.expect(")")
            return f
        if t.is_kw("*"):
            self.advance()
            if self.tok().is_kw(":") and not self.tok().quoted:
                raise self.err("cannot search for wildcard field name")
            if field == "":
                return A.FNoop()
            return A.FPrefix(fld, "")
        if t.is_kw(":") and not t.quoted:
            # stray ':' before a filter is skipped (parser.go:1501-1506)
            self.advance()
            self._guard_end("filter after ':'")
            return self.parse_filter_prim(field)
        if t.is_kw(">"):
            return self._parse_cmp_filter(fld, ">")
        if t.is_kw("<"):
            return self._parse_cmp_filter(fld, "<")
        if t.is_kw("="):
            self.advance()
            val, wild = self._compound_phrase_star(allow_colon=True)
            if wild:
                return A.FExactPrefix(fld, val)
            return A.FExact(fld, val)
        if t.is_kw("!="):
            self.advance()
            val, wild = self._compound_phrase_star(allow_colon=True)
            inner: A.Filter = A.FExactPrefix(fld, val) if wild else A.FExact(fld, val)
            return A.FNot(inner)
        if t.is_kw("~"):
            self.advance()
            return A.FRegexp(fld, self._regexp_arg())
        if t.is_kw("!~"):
            self.advance()
            return A.FNot(A.FRegexp(fld, self._regexp_arg()))
        if t.is_kw("not", "!", "-"):
            self.advance()
            return A.FNot(self.parse_filter_prim(field))

        # function-style filters (only when followed by '(' without space)
        if not t.quoted:
            name = t.text.lower()
            fn = getattr(self, f"_parse_f_{name}", None)
            if fn is not None:
                state = self.lex.backup()
                self.advance()
                opener = ("(", "[") if name == "range" else ("(",)
                if self.tok().is_kw(*opener) and not self.tok().space_before:
                    return fn(fld)
                self.lex.restore(state)

        # plain word / phrase / prefix, or  field:expr
        phrase = self._compound_phrase(allow_colon=field != "")
        if self.tok().is_kw(":") and field == "" and not self.tok().space_before:
            self.advance()
            fname = canonical_field(phrase)
            if fname == "_time":
                return self._parse_time_filter()
            if fname == "_stream_id":
                return self._parse_stream_id_filter()
            if fname == "_stream":
                return self.parse_filter_prim("_stream")
            return self.parse_filter_prim(fname)
        if self.tok().is_kw("*") and not self.tok().space_before:
            self.advance()
            if self.tok().is_kw(":") and not self.tok().quoted:
                # foo*:bar — prefix field names are not supported
                # (parser.go parseFilterForPhrase:1690-1692)
                raise self.err(f"field name prefix filter {phrase!r}* isn't supported")
            return A.FPrefix(fld, phrase)
        return A.FPhrase(fld, phrase)

    # -- helpers -----------------------------------------------------------
    _STOP = ("*", ",", "(", ")", "[", "]", "|", "{", "}", "", "=", "!", ">", "<", "~", "=~", "!=", "!~")

    def _compound_token(self, stop: tuple = (",", "(", ")", "[", "]", "|", "")) -> str:
        """Raw-glued compound token (parser.go getCompoundTokenExt)."""
        t = self.tok()
        if not t.quoted and t.text in ('"', "'", "`"):
            raise self.err("improperly quoted string")
        if not t.quoted and t.text in stop:
            raise self.err(f"compound token cannot start with {t.text!r}")
        first = t
        self.advance()
        suffix: list[str] = []
        while True:
            t = self.tok()
            if t.space_before or self.lex.is_end():
                break
            if not t.quoted and t.text in stop:
                break
            suffix.append(t.raw)
            self.advance()
        if not suffix:
            return first.text
        return first.raw + "".join(suffix)

    def _regexp_arg(self) -> str:
        """Regex argument for '~' / '!~': a compound token that must
        compile (the reference rejects bad patterns at newFilterRegexp)."""
        pat = self._compound_token()
        try:
            re.compile(pat)
        except re.error as e:
            raise self.err(f"invalid regexp {pat!r}: {e}")
        return pat

    def _compound_phrase(self, allow_colon: bool = False) -> str:
        """Glue adjacent space-free tokens into one phrase
        (parser.go getCompoundPhrase, :1578-1609)."""
        t = self.tok()
        if not t.quoted and t.is_kw(*self._STOP):
            raise self.err("unexpected token while parsing phrase")
        if not t.quoted and t.text in ('"', "'", "`"):
            # a bare quote char here means an invalid quoted string
            # (lexer fell back to a single-char token) — reject like
            # parser.go isInvalidQuotedString
            raise self.err("improperly quoted string")
        first = t
        self.advance()
        # suffix gluing uses the reference's stop set (getCompoundSuffix:
        # only * , ( ) [ ] | end) and RAW source text, so {`=~<>!} and even
        # quoted runs fuse verbatim:  _stream:{c="d"} under a field scope
        # becomes the phrase `_stream:{c="d"}`
        stop = {"*", ",", "(", ")", "[", "]", "|", ""}
        if not allow_colon:
            stop.add(":")
        suffix: list[str] = []
        while True:
            t = self.tok()
            if t.space_before or self.lex.is_end():
                break
            if not t.quoted and t.text in stop:
                break
            suffix.append(t.raw)
            self.advance()
        if not suffix:
            return first.text
        return first.raw + "".join(suffix)

    def _compound_phrase_star(self, allow_colon: bool = False) -> tuple[str, bool]:
        """Phrase plus optional trailing '*' → (value, is_prefix)."""
        if self.tok().is_kw("*") and not self.tok().quoted:
            self.advance()
            return "", True
        val = self._compound_phrase(allow_colon)
        if self.tok().is_kw("*") and not self.tok().space_before and not self.tok().quoted:
            self.advance()
            return val, True
        return val, False

    def _parse_string_list(self) -> list[str]:
        """'(' v1, v2, ... ')' — each value is a word or quoted string;
        '*', bare ',', '|' etc. in value position are errors (the reference
        rejects prefixes/multi-token args in in()/contains_*())."""
        self.expect("(")
        vals: list[str] = []
        while not self.tok().is_kw(")"):
            self._guard_end("argument list")
            t = self.tok()
            if not t.quoted and t.is_kw(",", "*", "|", "("):
                raise self.err(f"unexpected {t.text!r} in argument list")
            vals.append(self._compound_phrase(allow_colon=True))
            t = self.tok()
            if t.is_kw(","):
                self.advance()
            elif not t.is_kw(")"):
                raise self.err(f"expected ',' or ')' in argument list, got {t.text!r}")
        self.advance()
        return vals

    def _looks_like_subquery(self) -> bool:
        """Lookahead from a '(' token: does it hold a subquery (filter/pipe
        syntax) vs a plain comma-separated value list?"""
        state = self.lex.backup()
        self.advance()  # consume '('
        depth = 0
        is_sub = False
        while not self.lex.is_end():
            t = self.tok()
            if not t.quoted:
                txt = t.text
                if txt == "(":
                    depth += 1
                elif txt == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif depth == 0 and txt in ("|", ":", "{", "=", ">", "<", "~", "!~", "!="):
                    is_sub = True
            self.advance()
        self.lex.restore(state)
        return is_sub

    # -- function-style filters ---------------------------------------------
    def _parse_f_exact(self, field: str) -> A.Filter:
        self.expect("(")
        val, wild = self._compound_phrase_star(allow_colon=True)
        self.expect(")")
        if wild:
            return A.FExactPrefix(field, val)
        return A.FExact(field, val)

    def _parse_f_i(self, field: str) -> A.Filter:
        self.expect("(")
        if self.tok().is_kw("*") and not self.tok().quoted:
            self.advance()
            self.expect(")")
            return A.FPrefix(field, "", case_insensitive=True)
        val, wild = self._compound_phrase_star(allow_colon=True)
        self.expect(")")
        if wild:
            return A.FPrefix(field, val, case_insensitive=True)
        return A.FPhrase(field, val, case_insensitive=True)

    def _star_arg(self) -> bool:
        """Consume a sole unquoted '(*)' argument list (match-all) if present."""
        state = self.lex.backup()
        if not self.tok().is_kw("("):
            return False
        self.advance()
        if self.tok().is_kw("*") and not self.tok().quoted:
            self.advance()
            if self.tok().is_kw(")"):
                self.advance()
                return True
        self.lex.restore(state)
        return False

    def _check_subquery_fields(self, q: A.Query) -> None:
        """A value subquery must expose exactly one output field via a
        trailing `fields x` / `uniq by (x)` pipe (storage_search.go
        getFieldsFromQuery — in(x | limit 10) and in(x | fields a,b) are
        rejected at parse time in the reference)."""
        if not q.pipes:
            return
        last = q.pipes[-1]
        if isinstance(last, A.PFields) and len(last.fields) == 1 and "*" not in last.fields[0]:
            return
        if isinstance(last, A.PUniq) and len(last.by) == 1:
            return
        raise self.err(
            "value subquery must end with a 'fields <single-field>'"
            " or 'uniq by (<single-field>)' pipe"
        )

    def _parse_f_in(self, field: str) -> A.Filter:
        if self._star_arg():
            return A.FNoop()  # in(*) matches everything
        if self._looks_like_subquery():
            self.expect("(")
            q = self.parse(subquery=True)
            self.expect(")")
            self._check_subquery_fields(q)
            return A.FInSubquery(field, q)
        return A.FIn(field, self._parse_string_list())

    def _parse_f_contains_all(self, field: str) -> A.Filter:
        if self._star_arg():
            return A.FNoop()
        if self._looks_like_subquery():
            self.expect("(")
            q = self.parse(subquery=True)
            self.expect(")")
            self._check_subquery_fields(q)
            return A.FContains(field, [], True, subquery=q)
        return A.FContains(field, self._parse_string_list(), True)

    def _parse_f_contains_any(self, field: str) -> A.Filter:
        if self._star_arg():
            return A.FNoop()
        if self._looks_like_subquery():
            self.expect("(")
            q = self.parse(subquery=True)
            self.expect(")")
            self._check_subquery_fields(q)
            return A.FContains(field, [], False, subquery=q)
        return A.FContains(field, self._parse_string_list(), False)

    def _parse_f_seq(self, field: str) -> A.Filter:
        return A.FSeq(field, self._parse_string_list())

    def _parse_f_re(self, field: str) -> A.Filter:
        self.expect("(")
        if self.tok().quoted:
            pat = self.tok().text
            self.advance()
        else:
            # bare regex arg: glue tokens (incl. '-', '/', '.') until the
            # matching ')' — regexes with spaces must be quoted
            parts: list[str] = []
            depth = 0
            while not self.lex.is_end():
                t = self.tok()
                if parts and t.space_before:
                    # re(a b) is invalid — a spaced regex must be quoted
                    break
                if not t.quoted and t.is_kw("("):
                    depth += 1
                elif not t.quoted and t.is_kw(")"):
                    if depth == 0:
                        break
                    depth -= 1
                parts.append(t.text)
                self.advance()
            pat = "".join(parts)
        self.expect(")")
        try:
            re.compile(pat)
        except re.error as e:
            raise self.err(f"invalid regexp {pat!r}: {e}")
        return A.FRegexp(field, pat)

    def _parse_f_range(self, field: str) -> A.Filter:
        # range(lo, hi) / range[lo, hi] / range(lo, hi]
        t = self.tok()
        if t.is_kw("("):
            inc_lo = False
        elif t.is_kw("["):
            inc_lo = True
        else:
            raise self.err("range: expected ( or [")
        self.advance()
        lo = self._parse_float("range lower bound")
        self.expect(",")
        hi = self._parse_float("range upper bound")
        t = self.tok()
        if t.is_kw(")"):
            inc_hi = False
        elif t.is_kw("]"):
            inc_hi = True
        else:
            raise self.err("range: expected ) or ]")
        self.advance()
        return A.FRange(field, lo, hi, inc_lo, inc_hi)

    def _parse_f_ipv4_range(self, field: str) -> A.Filter:
        self.expect("(")
        first = self.tok().text
        self.advance()
        if "/" in first:
            # quoted CIDR form: ipv4_range("127.0.0.0/8")
            base_s, _, bits_s = first.partition("/")
            base = ipv4_to_u32(base_s)
            try:
                bits = int(bits_s)
            except ValueError:
                bits = -1
            if base is None or not (0 <= bits <= 32):
                raise self.err("ipv4_range: invalid CIDR")
            self.expect(")")
            mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
            lo = base & mask
            return A.FIPv4Range(field, lo, lo | (~mask & 0xFFFFFFFF))
        if self.tok().is_kw(","):
            self.advance()
            if self.tok().is_kw(")"):  # trailing comma: ipv4_range(ip,) == (ip, ip)
                self.advance()
                ip = ipv4_to_u32(first)
                if ip is None:
                    raise self.err("ipv4_range: invalid IPv4")
                return A.FIPv4Range(field, ip, ip)
            second = self.tok().text
            self.advance()
            if self.tok().is_kw(","):  # tolerate a trailing comma
                self.advance()
            self.expect(")")
            lo = ipv4_to_u32(first)
            hi = ipv4_to_u32(second)
            if lo is None or hi is None:
                raise self.err("ipv4_range: invalid IPv4 bounds")
            return A.FIPv4Range(field, lo, hi)
        # CIDR form: a.b.c.d '/' N — '/' lexes as its own token
        if self.tok().is_kw("/"):
            self.advance()
            bits = int(self.tok().text)
            self.advance()
            self.expect(")")
            base = ipv4_to_u32(first)
            if base is None or not (0 <= bits <= 32):
                raise self.err("ipv4_range: invalid CIDR")
            mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
            lo = base & mask
            hi = lo | (~mask & 0xFFFFFFFF)
            return A.FIPv4Range(field, lo, hi)
        self.expect(")")
        ip = ipv4_to_u32(first)
        if ip is None:
            raise self.err("ipv4_range: invalid IPv4")
        return A.FIPv4Range(field, ip, ip)

    def _parse_f_string_range(self, field: str) -> A.Filter:
        vals = self._parse_string_list()
        if len(vals) != 2:
            raise self.err("string_range expects 2 args")
        return A.FStringRange(field, vals[0], vals[1])

    def _parse_f_len_range(self, field: str) -> A.Filter:
        self.expect("(")
        lo = self._parse_float("len_range lower")
        self.expect(",")
        t = self.tok()
        hi = float("inf") if t.is_kw("inf") else None
        if hi is None:
            hi = self._parse_float("len_range upper")
        else:
            self.advance()
        if self.tok().is_kw(","):  # tolerate a trailing comma
            self.advance()
        self.expect(")")
        if lo != int(lo) or (hi != float("inf") and hi != int(hi)):
            raise self.err("len_range bounds must be non-negative integers")
        return A.FLenRange(field, int(lo), int(hi) if hi != float("inf") else 2**62)

    def _parse_f_value_type(self, field: str) -> A.Filter:
        self.expect("(")
        # type name may be a compound token with ':' (e.g. dict:x —
        # parser_test.go canonicalizes to value_type("dict:x"))
        vt = self._compound_phrase(allow_colon=True)
        self.expect(")")
        return A.FValueType(field, vt)

    def _parse_f_eq_field(self, field: str) -> A.Filter:
        # _field_name, not a single token: bare dashed/dotted names like
        # non-existing-column are one compound field name (r15 filter
        # corpus finding — the single-token form rejected them)
        self.expect("(")
        other = self._field_name()
        self.expect(")")
        return A.FEqField(field, other)

    def _parse_f_le_field(self, field: str) -> A.Filter:
        self.expect("(")
        other = self._field_name()
        self.expect(")")
        return A.FCmpField(field, other, allow_eq=True)

    def _parse_f_lt_field(self, field: str) -> A.Filter:
        self.expect("(")
        other = self._field_name()
        self.expect(")")
        return A.FCmpField(field, other, allow_eq=False)

    def _parse_cmp_filter(self, field: str, op: str) -> A.Filter:
        self.advance()
        allow_eq = False
        if self.tok().is_kw("=") and not self.tok().space_before:
            self.advance()
            allow_eq = True
        if not self.tok().is_kw("-", "+") and parse_number(self.tok().text) is None:
            ot = self.tok()
            if not ot.quoted and ot.is_kw("(", ")", "[", "]", ",", "|", "", "*"):
                raise self.err(f"missing operand after '{op}'")
            # non-numeric operand → lexicographic string-range fallback
            # (reference parser.go:2182-2217 tryParseFilterGT/LTString)
            val = self._compound_time_token()
            if not val or val == "|":
                raise self.err(f"missing operand after '{op}'")
            if op == ">":
                lo = val if allow_eq else val + "\x00"
                return A.FStringRange(field, lo, MAX_STRING_RANGE)
            hi = val + "\x00" if allow_eq else val
            return A.FStringRange(field, "", hi)
        val = self._parse_float(f"{op} operand")
        if op == ">":
            return A.FRange(field, val, float("inf"), allow_eq, True)
        return A.FRange(field, float("-inf"), val, True, allow_eq)

    def _parse_float(self, what: str) -> float:
        neg = False
        if self.tok().is_kw("-"):
            self.advance()
            neg = True
        elif self.tok().is_kw("+"):
            self.advance()
        txt = self.tok().text
        self.advance()
        # glue scientific notation split at the exponent sign: '1.2e' '-' '5'
        if (
            txt
            and txt[-1] in "eE"
            and not self.lex.is_end()
            and not self.tok().space_before
            and self.tok().is_kw("-", "+")
        ):
            sign = self.tok().text
            self.advance()
            if not self.tok().space_before and not self.lex.is_end():
                txt += sign + self.tok().text
                self.advance()
        v = parse_number(txt)
        if v is None:
            raise self.err(f"cannot parse number for {what}: {txt!r}")
        return -v if neg else v

    # -- _time filters -------------------------------------------------------
    def _parse_time_filter(self) -> A.Filter:
        t = self.tok()
        if t.is_kw("day_range"):
            self.advance()
            return self._parse_day_range()
        if t.is_kw("week_range"):
            self.advance()
            return self._parse_week_range()
        if t.is_kw("offset"):
            # bare '_time:offset 1h' = (-inf, now-1h] (parser.go
            # parseFilterTimeRange leading-offset branch)
            self.advance()
            off = parse_duration_ns(self._compound_time_token())
            if off is None:
                raise self.err("invalid _time offset")
            return A.FTime(-(2**62), self.now_ns - off)
        if t.is_kw("="):
            # '_time:=<point>' — exact point/interval (e.g. '=2024Z', '=2d')
            self.advance()
            lo, hi = self._parse_time_point()
            return self._with_time_offset(A.FTime(lo, hi))
        if t.is_kw(">"):
            self.advance()
            allow_eq = False
            if self.tok().is_kw("=") and not self.tok().space_before:
                self.advance()
                allow_eq = True
            kind, lo, hi = self._time_cmp_parts()
            if kind == "dur":
                # reference parseFilterTimeGt duration form
                # (parser.go:2727-2743): '>DUR' selects logs OLDER than
                # the duration — (-inf, now-d] with d++ for strict '>'.
                # Treating the duration as the time-point now-d and
                # applying the timestamp rule selected the COMPLEMENTARY
                # window (r14 review finding).
                end = self.now_ns - lo - (0 if allow_eq else 1)
                return self._with_time_offset(A.FTime(-(2**62), end))
            # timestamp form: start = the period's START instant (+1ns
            # for strict '>', parser.go:2715-2717) — NOT the period end,
            # which skipped the whole period for partial stamps
            start = lo if allow_eq else lo + 1
            return self._with_time_offset(A.FTime(start, 2**62))
        if t.is_kw("<"):
            self.advance()
            allow_eq = False
            if self.tok().is_kw("=") and not self.tok().space_before:
                self.advance()
                allow_eq = True
            kind, lo, hi = self._time_cmp_parts()
            if kind == "dur":
                # reference parseFilterTimeLt duration form: '<DUR'
                # selects logs NEWER than the duration — [now-d, now]
                # with d-- for strict '<' (r14 review finding)
                start = self.now_ns - lo + (0 if allow_eq else 1)
                return self._with_time_offset(A.FTime(start, self.now_ns))
            end = hi if allow_eq else lo - 1
            return self._with_time_offset(A.FTime(-(2**62), end))
        if t.is_kw("[") or t.is_kw("("):
            inc_lo = t.is_kw("[")
            self.advance()
            lo_lo, lo_hi = self._parse_time_point()
            self.expect(",")
            hi_lo, hi_hi = self._parse_time_point()
            t2 = self.tok()
            if t2.is_kw("]"):
                inc_hi = True
            elif t2.is_kw(")"):
                inc_hi = False
            else:
                raise self.err("time range: expected ] or )")
            self.advance()
            # reference parseFilterTime (parser.go:2671-2686):
            # '(' = the period's START +1ns (startTime++), NOT its end
            # +1ns — using the end made '(day, next-day)' an EMPTY range
            # (r14 review finding); ')' = the period's start -1ns and
            # ']' = its matching end, both as before
            start = lo_lo if inc_lo else lo_lo + 1
            end = hi_hi if inc_hi else hi_lo - 1
            return self._with_time_offset(A.FTime(start, end))
        # duration (last N), 'now'/'now±dur', or a timestamp point
        txt = self._compound_time_token()
        dur = parse_duration_ns(txt)
        if dur is not None:
            return self._with_time_offset(A.FTime(self.now_ns - dur, self.now_ns))
        np = self._now_arith(txt)
        if np is not None:
            return self._with_time_offset(A.FTime(np, np))
        rng = parse_time_point(txt)
        if rng is None:
            raise self.err(f"cannot parse _time filter value {txt!r}")
        return self._with_time_offset(A.FTime(rng[0], rng[1]))

    def _now_arith(self, txt: str) -> int | None:
        """'now', 'now-1h', 'now+30m' → absolute ns, else None."""
        low = txt.lower()
        if not low.startswith("now"):
            return None
        rest = low[3:]
        if not rest:
            return self.now_ns
        d = parse_duration_ns(rest)
        return self.now_ns + d if d is not None else None

    def _with_time_offset(self, f: A.FTime) -> A.FTime:
        if self.tok().is_kw("offset"):
            self.advance()
            off = parse_duration_ns(self._compound_time_token())
            if off is None:
                raise self.err("invalid _time offset")
            lo = f.lo_ns if f.lo_ns <= -(2**62) else f.lo_ns - off
            hi = f.hi_ns if f.hi_ns >= 2**62 else f.hi_ns - off
            return A.FTime(lo, hi)
        return f

    def _compound_time_token(self) -> str:
        """Glue tokens of a timestamp like 2024-01-01T10:20:30+02:00."""
        parts = [self.tok().text]
        quoted = self.tok().quoted
        self.advance()
        if quoted:
            return parts[0]
        while not self.lex.is_end():
            t = self.tok()
            if t.space_before or t.quoted:
                break
            if t.text in (",", ")", "]", "[", "(", "|", "}", "{"):
                break
            parts.append(t.text)
            self.advance()
        return "".join(parts)

    def _parse_time_point(self) -> tuple[int, int]:
        kind, lo, hi = self._time_cmp_parts()
        if kind == "dur":
            ts = self.now_ns - lo
            return ts, ts
        return lo, hi

    def _time_cmp_parts(self) -> tuple[str, int, int]:
        """Parse a _time operand: ("dur", |d|, |d|) for a bare duration
        (the comparison operators give durations AGE semantics, opposite
        to time points — parser.go parseFilterTimeGt/Lt) or
        ("point", lo, hi) for timestamps / now-arithmetic / unix
        seconds, where (lo, hi) is the instant's period."""
        txt = self._compound_time_token()
        np = self._now_arith(txt)
        if np is not None:
            return "point", np, np
        dur = parse_duration_ns(txt)
        if dur is not None and not re.match(r"^\d{4}", txt):
            d = abs(dur)
            return "dur", d, d
        rng = parse_time_point(txt)
        if rng is None:
            v = parse_number(txt)
            if v is not None:  # unix seconds
                ns = int(v * NS)
                return "point", ns, ns
            raise self.err(f"cannot parse time point {txt!r}")
        return "point", rng[0], rng[1]

    def _parse_day_range(self) -> A.Filter:
        t = self.tok()
        inc_lo = t.is_kw("[")
        if not (t.is_kw("[") or t.is_kw("(")):
            raise self.err("day_range: expected [ or (")
        self.advance()
        lo = self._parse_hhmm()
        self.expect(",")
        hi = self._parse_hhmm()
        t = self.tok()
        inc_hi = t.is_kw("]")
        if not (t.is_kw("]") or t.is_kw(")")):
            raise self.err("day_range: expected ] or )")
        self.advance()
        off = 0
        if self.tok().is_kw("offset"):
            self.advance()
            d = parse_duration_ns(self._compound_time_token())
            if d is None:
                raise self.err("day_range: invalid offset")
            off = d
        return A.FDayRange(lo, hi, inc_lo, inc_hi, off)

    def _parse_hhmm(self) -> int:
        txt = self._compound_time_token()
        m = re.match(r"^(\d{1,2})(?::(\d{2}))?$", txt)
        if not m:
            raise self.err(f"invalid time-of-day {txt!r}")
        hh, mm = int(m.group(1)), int(m.group(2) or 0)
        if hh > 24 or mm > 59 or hh * 60 + mm > 24 * 60:
            raise self.err(f"time-of-day out of range {txt!r}")
        return hh * 60 + mm

    _WEEKDAYS = {
        "sun": 0, "sunday": 0, "mon": 1, "monday": 1, "tue": 2, "tuesday": 2,
        "wed": 3, "wednesday": 3, "thu": 4, "thursday": 4, "fri": 5,
        "friday": 5, "sat": 6, "saturday": 6,
    }

    def _parse_week_range(self) -> A.Filter:
        t = self.tok()
        inc_lo = t.is_kw("[")
        if not (t.is_kw("[") or t.is_kw("(")):
            raise self.err("week_range: expected [ or (")
        self.advance()
        lo = self._WEEKDAYS.get(self.tok().text.lower())
        self.advance()
        self.expect(",")
        hi = self._WEEKDAYS.get(self.tok().text.lower())
        self.advance()
        t = self.tok()
        inc_hi = t.is_kw("]")
        if not (t.is_kw("]") or t.is_kw(")")):
            raise self.err("week_range: expected ] or )")
        self.advance()
        if lo is None or hi is None:
            raise self.err("week_range: bad weekday")
        off = 0
        if self.tok().is_kw("offset"):
            self.advance()
            d = parse_duration_ns(self._compound_time_token())
            if d is None:
                raise self.err("week_range: invalid offset")
            off = d
        return A.FWeekRange(lo, hi, inc_lo, inc_hi, off)

    def _parse_stream_id_filter(self) -> A.Filter:
        if self.tok().is_kw("in"):
            self.advance()
            if self._star_arg():
                return A.FNoop()
            if self._looks_like_subquery():
                self.expect("(")
                q = self.parse(subquery=True)
                self.expect(")")
                return A.FInSubquery("_stream_id", q)
            return A.FStreamId(self._parse_string_list())
        sid = self.tok().text
        self.advance()
        return A.FStreamId([sid])

    # -- stream filter {...} --------------------------------------------------
    def _stream_compound(self, stops: tuple[str, ...]) -> str:
        """Stream label names/values are COMPOUND tokens — unquoted
        pieces written without spaces glue until a stop token
        (stream_filter.go parseStreamTagName/Value via
        getCompoundTokenExt): `{a-q:w.z=y-z=q}` has label 'a-q:w.z' and
        value 'y-z=q' (r15 stream-filter corpus). A quoted first token
        stands alone."""
        t = self.tok()
        if self.lex.is_end() or (not t.quoted and t.text in stops):
            raise self.err("missing stream filter token")
        name = t.text
        quoted = t.quoted
        self.advance()
        if quoted:
            return name
        while (
            not self.lex.is_end()
            and not self.tok().space_before
            and not self.tok().quoted
            and self.tok().text not in stops
        ):
            name += self.tok().text
            self.advance()
        return name

    def _parse_stream_filter(self) -> A.Filter:
        self.expect("{")
        or_terms: list[list[A.StreamLabelMatcher]] = []
        cur: list[A.StreamLabelMatcher] = []
        while not self.tok().is_kw("}"):
            self._guard_end("stream filter")
            if self.tok().is_kw("or") and not self.tok().quoted:
                # 'or' is a separator only when NOT used as a label name
                # (i.e. the following token is not a matcher op)
                state = self.lex.backup()
                self.advance()
                is_label = self.tok().text in ("=", "!=", "=~", "!~")
                self.lex.restore(state)
                if not is_label:
                    self.advance()
                    or_terms.append(cur)
                    cur = []
                    continue
            label = self._stream_compound(("=", "!=", "=~", "!~", ",", "{", "}"))
            op = self.tok().text
            if op not in ("=", "!=", "=~", "!~", "in", "not_in"):
                raise self.err(f"stream filter: bad op {op!r}")
            self.advance()
            if op in ("in", "not_in"):
                # desugar to a regex matcher (stream_filter.go:185-203):
                # in (*) ≡ =~".*"; else QuoteMeta'd values joined with '|'
                self.expect("(")
                args: list[str] = []
                while not self.tok().is_kw(")"):
                    self._guard_end("stream filter in() args")
                    args.append(self.tok().text)
                    self.advance()
                    if self.tok().is_kw(","):
                        self.advance()
                self.advance()
                if len(args) == 1 and args[0] == "*":
                    val = ".*"
                else:
                    val = "|".join(_quote_meta(a) for a in args)
                cur.append(
                    A.StreamLabelMatcher(
                        label, "=~" if op == "in" else "!~", val
                    )
                )
            else:
                val = self._stream_compound((",", "{", "}", "("))
                cur.append(A.StreamLabelMatcher(label, op, val))
            if self.tok().is_kw(","):
                self.advance()
            elif not (
                self.tok().is_kw("}")
                or (self.tok().is_kw("or") and not self.tok().quoted)
            ):
                # matchers need an explicit ',' / 'or' separator —
                # `{foo='bar' baz='x'}` is invalid (stream_filter.go:163,
                # pinned by TestNewTestStreamFilterFailure; r15 corpus)
                raise self.err(
                    "stream filter: expected ',', 'or' or '}' between matchers"
                )
        self.advance()
        or_terms.append(cur)
        return A.FStream(or_terms)

    # ---------------------------------------------------------------- pipes
    def parse_pipe(self) -> A.Pipe:
        t = self.tok()
        name = t.text.lower() if not t.quoted else ""
        fn = getattr(self, f"_parse_p_{name}", None)
        if fn is None:
            if name in _STATS_FUNCS and not t.quoted:
                # implicit stats pipe: '| count() ...' (pipe.go:367-384)
                state = self.lex.backup()
                self.advance()
                is_call = self.tok().is_kw("(") and not self.tok().space_before
                self.lex.restore(state)
                if is_call:
                    return self._parse_p_stats()
            if t.is_kw("(") and not t.quoted:
                # '| (host) count() ...' — implicit stats with a paren
                # by-list; fall back to a filter group if stats parsing fails
                state = self.lex.backup()
                try:
                    return self._parse_p_stats()
                except ParseError:
                    self.lex.restore(state)
            # implicit filter pipe (pipe.go:367-384)
            self._check_filter_start()
            f = self.parse_filter_or()
            return A.PFilter(f)
        self.advance()
        return fn()

    # helper: parse a (possibly parenthesized) comma-separated field list
    def _field_list(
        self, parens_required: bool = False, min_fields: int = 0
    ) -> list[str]:
        has_paren = self.tok().is_kw("(")
        if has_paren:
            self.advance()
        elif parens_required:
            raise self.err("expected (")
        fields: list[str] = []
        while True:
            t = self.tok()
            if t.is_kw(")") and not t.quoted:
                break
            if self.lex.is_end() or (t.is_kw("|") and not has_paren):
                break
            name = self._field_name()
            if self.tok().is_kw("*") and not self.tok().space_before:
                self.advance()
                name += "*"
            fields.append(name)
            if self.tok().is_kw(","):
                self.advance()
                nt = self.tok()
                # a ',' must be followed by another field name
                if self.lex.is_end() or (
                    not nt.quoted and nt.is_kw(")", "|", ",")
                ):
                    raise self.err("missing field name after ','")
            elif not has_paren:
                break
        if has_paren:
            self.expect(")")
        if len(fields) < min_fields:
            raise self.err("missing field name(s)")
        return fields

    def _field_name(self) -> str:
        t = self.tok()
        if t.is_kw("*") and not t.quoted:
            self.advance()
            return "*"
        if self.lex.is_end():
            raise self.err("missing field name")
        if not t.quoted and t.text in (
            ",", ")", "(", "|", "]", "[", "{", "}", "=", ":",
        ):
            raise self.err(f"missing field name, got {t.text!r}")
        name = t.text
        self.advance()
        # glue '-'/'.'-ish pieces written without quotes
        while (
            not self.lex.is_end()
            and not self.tok().space_before
            and not self.tok().quoted
            and self.tok().text not in (",", ")", "(", "|", ":", "*", "]", "[", "=", "}", "{")
        ):
            name += self.tok().text
            self.advance()
        return canonical_field(name)

    def _int(self, what: str) -> int:
        v = parse_number(self.tok().text)
        if v is None or v != int(v):
            raise self.err(f"expected integer for {what}")
        self.advance()
        return int(v)

    def _opt_as_name(self, default: str) -> str:
        if self.tok().is_kw("as"):
            self.advance()
            return self._field_name()
        t = self.tok()
        if (
            not self.lex.is_end()
            and not t.is_kw("|", ",", ")", "(")
            and not t.is_kw(*_PIPE_NAMES)
            and (t.quoted or re.match(r"^[\w.]+$", t.text))
        ):
            return self._field_name()
        return default

    # -- simple pipes ---------------------------------------------------------
    def _parse_p_fields(self) -> A.Pipe:
        return A.PFields(self._field_list(min_fields=1))

    _parse_p_keep = _parse_p_fields

    def _parse_p_delete(self) -> A.Pipe:
        return A.PDelete(self._field_list(min_fields=1))

    _parse_p_drop = _parse_p_delete
    _parse_p_rm = _parse_p_delete
    _parse_p_del = _parse_p_delete

    def _no_wildcards(self, fields, what: str):
        """Reject '*'/'prefix*' names where the reference's parser does
        (sort/partition/top/uniq/unroll by-lists, result names, from
        fields — r15 pipe-parse corpus)."""
        for f in fields:
            name = f.name if hasattr(f, "name") else f
            if name == "*" or name.endswith("*"):
                raise self.err(f"wildcard field name not allowed in {what}")
        return fields

    def _field_name_maybe_star(self) -> str:
        """Field name with an optional fused wildcard suffix (copy/rename
        accept field FILTERS: foo*, *; pipe_copy.go parseFieldFilter)."""
        name = self._field_name()
        if name != "*" and self.tok().is_kw("*") and not self.tok().space_before:
            self.advance()
            name += "*"
        return name

    def _pairs(self) -> list[tuple[str, str]]:
        pairs = []
        while True:
            src = self._field_name_maybe_star()
            self.expect("as") if self.tok().is_kw("as") else None
            dst = self._field_name_maybe_star()
            pairs.append((src, dst))
            if self.tok().is_kw(","):
                self.advance()
            else:
                break
        return pairs

    def _parse_p_copy(self) -> A.Pipe:
        return A.PCopy(self._pairs())

    _parse_p_cp = _parse_p_copy

    def _parse_p_rename(self) -> A.Pipe:
        return A.PRename(self._pairs())

    _parse_p_mv = _parse_p_rename

    def _parse_p_filter(self) -> A.Pipe:
        self._check_filter_start()
        return A.PFilter(self.parse_filter_or())

    _parse_p_where = _parse_p_filter

    def _parse_p_limit(self) -> A.Pipe:
        if self.lex.is_end() or self.tok().is_kw("|", ")"):
            return A.PLimit(10)  # bare 'limit' defaults to 10 (pipe_limit.go:107)
        return A.PLimit(self._int("limit"))

    _parse_p_head = _parse_p_limit

    def _parse_p_offset(self) -> A.Pipe:
        return A.POffset(self._int("offset"))

    _parse_p_skip = _parse_p_offset

    def _parse_p_sort(self) -> A.Pipe:
        had_by = False
        if self.tok().is_kw("by"):
            self.advance()
            had_by = True
        fields: list[A.SortField] = []
        if had_by and not self.tok().is_kw("("):
            raise self.err("expected '(' after 'sort by'")
        if self.tok().is_kw("("):
            self.advance()
            while not self.tok().is_kw(")"):
                self._guard_end("sort fields")
                name = self._field_name()
                desc = False
                if self.tok().is_kw("desc"):
                    self.advance()
                    desc = True
                elif self.tok().is_kw("asc"):
                    self.advance()
                fields.append(A.SortField(name, desc))
                if self.tok().is_kw(","):
                    self.advance()
            self.advance()
        p = A.PSort(fields)
        while True:
            if self.tok().is_kw("desc"):
                self.advance()
                p.desc = True
            elif self.tok().is_kw("asc"):
                self.advance()
            elif self.tok().is_kw("partition"):
                self.advance()
                if self.tok().is_kw("by"):
                    self.advance()
                p.partition_by = self._no_wildcards(
                    self._field_list(parens_required=True, min_fields=1),
                    "sort partition by",
                )
            elif self.tok().is_kw("limit"):
                self.advance()
                if p.limit:
                    raise self.err("duplicate 'limit' in sort")
                p.limit = self._int("sort limit")
            elif self.tok().is_kw("offset"):
                self.advance()
                if p.offset:
                    raise self.err("duplicate 'offset' in sort")
                p.offset = self._int("sort offset")
            elif self.tok().is_kw("rank"):
                self.advance()
                p.rank_name = self._opt_as_name("rank")
                self._no_wildcards([p.rank_name], "rank name")
            else:
                break
        self._no_wildcards([f.name for f in p.fields], "sort by")
        if p.partition_by and p.limit is None:
            # the reference's sort accepts partitions only with a limit
            raise self.err("sort 'partition by' requires 'limit'")
        return p

    def _parse_p_order(self) -> A.Pipe:
        # 'order by (...)'
        return self._parse_p_sort()

    def _parse_p_first(self, desc: bool = False) -> A.Pipe:
        n = 1
        t = self.tok()
        if not t.quoted and re.match(r"^\d+$", t.text):
            n = self._int("first N")
        fields: list[A.SortField] = []
        partition: list[str] = []
        rank = None
        if self.tok().is_kw("by") or self.tok().is_kw("("):
            # 'by' is optional: 'first 5 (words_count desc)' (docs examples)
            if self.tok().is_kw("by"):
                self.advance()
            if self.tok().is_kw("("):
                self.advance()
                while not self.tok().is_kw(")"):
                    self._guard_end("first/last fields")
                    name = self._field_name()
                    fdesc = False
                    if self.tok().is_kw("desc"):
                        self.advance()
                        fdesc = True
                    elif self.tok().is_kw("asc"):
                        self.advance()  # explicit ascending (the default)
                    fields.append(A.SortField(name, fdesc))
                    if self.tok().is_kw(","):
                        self.advance()
                self.advance()
            else:
                fields.append(A.SortField(self._field_name(), False))
        while True:
            if self.tok().is_kw("partition"):
                self.advance()
                if self.tok().is_kw("by"):
                    self.advance()
                partition = self._no_wildcards(
                    self._field_list(parens_required=True, min_fields=1),
                    "partition by",
                )
            elif self.tok().is_kw("rank"):
                self.advance()
                rank = self._opt_as_name("rank")
                self._no_wildcards([rank], "rank name")
            else:
                break
        self._no_wildcards([f.name for f in fields], "first/last by")
        return A.PFirst(n, fields, desc=desc, rank_name=rank, partition_by=partition)

    def _parse_p_last(self) -> A.Pipe:
        return self._parse_p_first(desc=True)

    # -- stats ---------------------------------------------------------------
    def _parse_p_stats(self) -> A.Pipe:
        by: list[A.ByField] = []
        if self.tok().is_kw("by"):
            self.advance()
            by = self._parse_by_fields()
        elif self.tok().is_kw("("):
            # 'stats (...)' — the by keyword is optional (pipe_stats.go)
            by = self._parse_by_fields()
        return A.PStats(by, self._parse_stats_funcs(by))

    def _parse_p_stats_remote(self) -> A.Pipe:
        # cluster-internal spelling: the storage-node half of a split
        # aggregation (pipe_stats.go:1258-1260). Parsed for full LogsQL
        # surface parity; planned as a regular stats pipe because Spark's
        # partial+final hash aggregate IS the remote/local split the
        # reference implements by hand (pipe.go:15-22 splitToRemoteAndLocal).
        ps = self._parse_p_stats()
        ps.mode = "remote"
        return ps

    def _parse_p_by(self) -> A.Pipe:
        by = self._parse_by_fields()
        return A.PStats(by, self._parse_stats_funcs(by))

    def _parse_stats_funcs(self, by: list) -> list[A.StatsFunc]:
        funcs = [self._parse_stats_func()]
        while self.tok().is_kw(","):
            self.advance()
            funcs.append(self._parse_stats_func())
        # result names must be unique and must not shadow a 'by' field
        # (pipe_stats.go parsePipeStats seenByFields/seenResultNames)
        by_names = {bf.name for bf in by}
        seen: set = set()
        for f in funcs:
            if f.result in by_names:
                raise self.err(
                    f"stats result name {f.result!r} clashes with a 'by' field"
                )
            if f.result in seen:
                raise self.err(f"duplicate stats result name {f.result!r}")
            seen.add(f.result)
        return funcs

    def _parse_by_fields(self) -> list[A.ByField]:
        self.expect("(")
        by: list[A.ByField] = []
        while not self.tok().is_kw(")"):
            self._guard_end("by fields")
            name = self._field_name()
            self._no_wildcards([name], "stats by")
            bf = A.ByField(name)
            if self.tok().is_kw(":") and not self.tok().space_before:
                self.advance()
                if self.tok().is_kw("/"):  # ipv4 mask
                    self.advance()
                    bf.ipv4_mask = self._int("ipv4 mask")
                else:
                    txt = self._compound_time_token()
                    bf.bucket_size_str = txt
                    if txt in ("month", "year"):
                        # calendar buckets: verbatim spelling, no numeric
                        # size (pipe_stats.go:1554, block_result.go:834)
                        pass
                    else:
                        size = _parse_bucket_size(txt, is_time=name == "_time")
                        if size is None:
                            raise self.err(f"invalid bucket size {txt!r}")
                        if size <= 0:
                            raise self.err("bucket size must be positive")
                        bf.bucket_size = size
                    if self.tok().is_kw("offset"):
                        self.advance()
                        otxt = self._compound_time_token()
                        osize = _parse_bucket_offset(otxt, is_time=name == "_time")
                        if osize is None:
                            raise self.err(f"invalid bucket offset {otxt!r}")
                        bf.bucket_offset = osize
                        bf.bucket_offset_str = otxt
            by.append(bf)
            if self.tok().is_kw(","):
                self.advance()
            elif not self.tok().is_kw(")"):
                raise self.err("missing `,` in 'by' fields")
        self.advance()
        return by

    # the five collecting funcs whose parsers accept a trailing
    # 'limit N' (stats_count_uniq.go:24, stats_values.go, ...); any
    # other func leaves 'limit' unconsumed, where the stats pipe treats
    # it as a bare result alias (parsePipeStats parseFieldName)
    _LIMIT_STATS_FUNCS = frozenset(
        {"count_uniq", "count_uniq_hash", "json_values", "uniq_values", "values"}
    )

    def _parse_stats_func_core(self) -> tuple[str, list[str], dict]:
        """parseStatsFunc parity (pipe_stats.go:1340): the func name, its
        parenthesized args and — for the five collecting funcs only — a
        trailing 'limit N'. No 'if' clause and no result alias: those
        belong to the enclosing stats pipe (parsePipeStats). Args follow
        parseFieldFiltersInParens comma discipline: a leading ',' and a
        missing ',' both reject, a trailing ',' is fine."""
        t = self.tok()
        name = t.text.lower()
        if name not in _STATS_FUNCS:
            raise self.err(f"unknown stats function {t.text!r}")
        self.advance()
        self.expect("(")
        extra: dict = {}
        fields: list[str] = []
        if name == "quantile":
            phi_txt = self.tok().text
            phi = parse_number(phi_txt)
            if phi is None or not (0.0 <= phi <= 1.0):
                raise self.err("quantile phi must be in [0, 1]")
            extra["phi"] = phi
            extra["phi_str"] = phi_txt  # statsQuantile.phiStr prints verbatim
            self.advance()
            if self.tok().is_kw(","):
                self.advance()
            elif not self.tok().is_kw(")"):
                raise self.err("missing `,` after quantile phi")
        while not self.tok().is_kw(")"):
            self._guard_end("stats args")
            fields.append(self._field_name_star())
            if self.tok().is_kw(","):
                self.advance()
            elif not self.tok().is_kw(")"):
                raise self.err(f"missing `,` in {name} args")
        self.advance()
        if name in self._LIMIT_STATS_FUNCS and self.tok().is_kw("limit"):
            self.advance()
            extra["limit"] = self._int("stats limit")
        if name == "histogram" and (
            len(fields) != 1 or "*" in fields[0]
        ):
            raise self.err("histogram() expects exactly one field")
        if name in ("count_uniq", "count_uniq_hash"):
            # stats_count_uniq.go: at least one field, no wildcards
            if not fields:
                raise self.err(f"{name}() needs at least one field")
            self._no_wildcards(fields, name)
        if name == "rate" and fields:
            # stats_rate.go: rate() accepts no args at all
            raise self.err("rate() accepts no args")
        if name in ("row_min", "row_max"):
            if not fields:
                raise self.err(f"missing source field for '{name}' func")
            if "*" in fields[0]:
                raise self.err(
                    f"the source field {fields[0]!r} in '{name}' cannot be a wildcard"
                )
        elif not fields and name not in ("histogram", "rate"):
            # empty arg list ≡ '*' for every stats func
            # (stats_avg.go:142-144 parseStatsFuncFieldFilters);
            # rate() keeps its empty list — 'rate(*)' is invalid
            fields = ["*"]
        if name == "quantile" and "*" in fields:
            # statsQuantile.String drops an all-match list entirely
            # (stats_quantile.go:24-30); normalizing here keeps
            # print→reparse AST-stable for mixed lists like '0.99, a, *'
            fields = ["*"]
        return name, fields, extra

    def _parse_stats_func(self) -> A.StatsFunc:
        name, fields, extra = self._parse_stats_func_core()
        cond = None
        if_text = ""
        if self.tok().is_kw("if"):
            self.advance()
            p0 = self.tok().pos  # position of '('
            self.expect("(")
            if self.tok().is_kw(")"):  # 'if ()' — empty condition is a noop
                cond = None
            else:
                cond = self.parse_filter_or()
            self.expect(")")
            p1 = self.lex.prev_token.pos  # position of ')'
            if_text = "if " + self.lex.src[p0 : p1 + 1]
        default_name = _default_stats_name(name, fields, extra)
        if if_text:
            # auto-generated result names include the if-clause so two
            # identical funcs with different conditions stay distinct
            # (pipe_stats.go: resultName = sf.String() + " " + iff.String())
            default_name += " " + if_text
        result = self._opt_as_name(default_name)
        if result != default_name:
            self._no_wildcards([result], "stats result name")
        return A.StatsFunc(name, fields, result, extra, cond)

    def _field_name_star(self) -> str:
        if self.tok().is_kw("*") and not self.tok().quoted:
            self.advance()
            return "*"
        name = self._field_name()
        if self.tok().is_kw("*") and not self.tok().space_before:
            self.advance()
            name += "*"
        return name

    # -- math ------------------------------------------------------------------
    def _parse_p_math(self) -> A.Pipe:
        exprs: list[tuple[A.MathExpr, str]] = []
        while True:
            e = self._parse_math_expr(999)
            self._check_math_arity(e)
            name = self._opt_as_name("")
            if name:
                self._no_wildcards([name], "math result name")
            if not name:
                # the reference auto-names an unnamed entry with the
                # expression's canonical string (parseMathEntry:
                # resultField = me.String(); r15 pipe-semantics corpus)
                from victorialogs_spark.logsql.printer import math_expr_name

                name = math_expr_name(e)
            exprs.append((e, name))
            if self.tok().is_kw(","):
                self.advance()
            else:
                break
        return A.PMath(exprs)

    _parse_p_eval = _parse_p_math

    # pipe_math.go per-function arg counts (min, max)
    _MATH_ARITY = {
        "abs": (1, 1), "ceil": (1, 1), "exp": (1, 1), "floor": (1, 1),
        "ln": (1, 1), "max": (2, None), "min": (2, None),
        "round": (1, 2), "now": (0, 0), "rand": (0, 0),
    }

    def _check_math_arity(self, e) -> None:
        if isinstance(e, A.MFunc):
            lo, hi = self._MATH_ARITY.get(e.name, (0, None))
            n = len(e.args)
            if n < lo or (hi is not None and n > hi):
                raise self.err(f"'{e.name}' takes {lo}"
                               + (f"..{hi}" if hi not in (None, lo) else "")
                               + f" args; got {n}")
            for a in e.args:
                self._check_math_arity(a)
        elif isinstance(e, A.MBinary):
            self._check_math_arity(e.left)
            self._check_math_arity(e.right)
        elif isinstance(e, A.MUnary):
            self._check_math_arity(e.arg)

    _MATH_PRIO = {"^": 1, "*": 2, "/": 2, "%": 2, "+": 3, "-": 3, "&": 4,
                  "xor": 5, "or": 6, "default": 10}
    _MATH_FUNCS = {"abs", "ceil", "exp", "floor", "ln", "max", "min", "round", "now", "rand"}

    def _parse_math_expr(self, max_prio: int) -> A.MathExpr:
        left = self._parse_math_prim()
        while True:
            t = self.tok()
            op = t.text.lower() if not t.quoted else ""
            if op == "|" or op not in self._MATH_PRIO:
                break
            prio = self._MATH_PRIO[op]
            if prio >= max_prio:
                break
            self.advance()
            right = self._parse_math_expr(prio if op != "^" else prio + 1)
            left = A.MBinary(op, left, right)
        return left

    def _parse_math_prim(self) -> A.MathExpr:
        t = self.tok()
        if t.is_kw("("):
            self.advance()
            e = self._parse_math_expr(999)
            self.expect(")")
            return e
        if t.is_kw("-"):
            self.advance()
            return A.MUnary("-", self._parse_math_prim())
        name = t.text
        if not t.quoted and name.lower() in self._MATH_FUNCS:
            state = self.lex.backup()
            self.advance()
            if self.tok().is_kw("(") and not self.tok().space_before:
                self.advance()
                args: list[A.MathExpr] = []
                while not self.tok().is_kw(")"):
                    self._guard_end("math args")
                    args.append(self._parse_math_expr(999))
                    if self.tok().is_kw(","):
                        self.advance()
                self.advance()
                return A.MFunc(name.lower(), args)
            self.lex.restore(state)
        if t.quoted:
            # quoted operands are CONSTANTS when they parse as a number,
            # an RFC3339 timestamp (→ unix ns) or an IPv4 address
            # (parseMathNumber, pipe_math.go:1066-1080); otherwise a
            # quoted field name
            v = parse_number(name)
            if v is None:
                rng = parse_time_point(name)
                if rng is not None:
                    v = float(rng[0])
            if v is None:
                m = re.fullmatch(r"(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})", name)
                if m and all(int(x) < 256 for x in m.groups()):
                    v = float(
                        (int(m.group(1)) << 24) | (int(m.group(2)) << 16)
                        | (int(m.group(3)) << 8) | int(m.group(4))
                    )
            if v is not None:
                self.advance()
                return A.MNum(v)
        v = parse_number(name) if not t.quoted else None
        if v is not None:
            self.advance()
            return A.MNum(v)
        fname = self._math_field_name()
        return A.MField(fname)

    # math operands glue space-free tokens like field names do, but STOP
    # at math operator chars (getCompoundMathToken stopTokens,
    # pipe_math.go:826-848) — the generic _field_name glued `b+1` into
    # one field, silently turning arithmetic into a missing-field NaN
    # (r15 pipe-semantics corpus finding)
    _MATH_STOP = ("=", "+", "-", "*", "/", "%", "^", ",", ")", "|", "!")

    def _math_field_name(self) -> str:
        t = self.tok()
        if self.lex.is_end() or (not t.quoted and t.text in self._MATH_STOP):
            raise self.err("missing math operand")
        name = t.text
        self.advance()
        while (
            not self.lex.is_end()
            and not self.tok().space_before
            and not (
                not self.tok().quoted and self.tok().text in self._MATH_STOP
            )
        ):
            name += self.tok().text
            self.advance()
        return canonical_field(name)

    # -- string transform pipes -------------------------------------------------
    def _common_unpack_opts(self, p) -> None:
        while True:
            if self.tok().is_kw("keep_original_fields"):
                self.advance()
                p.keep_original_fields = True
            elif self.tok().is_kw("skip_empty_results"):
                self.advance()
                p.skip_empty_results = True
            else:
                break

    def _opt_if_cond(self):
        if self.tok().is_kw("if"):
            self.advance()
            self.expect("(")
            cond = self.parse_filter_or()
            self.expect(")")
            return cond
        return None

    def _parse_p_extract(self) -> A.Pipe:
        cond = self._opt_if_cond()
        t = self.tok()
        if self.lex.is_end() or (not t.quoted and t.is_kw("from", "|")):
            raise self.err("missing pattern in 'extract'")
        pat = t.text
        # the pattern needs at least one NAMED placeholder; '<>', '<_>' and
        # '<*>' are anonymous skips (pipe_extract.go pattern validation)
        names = [m for m in re.findall(r"<([^>]*)>", pat) if m not in ("", "_", "*")]
        if not names:
            raise self.err("extract pattern needs at least one named <field>")
        if re.search(r"><", pat):
            # adjacent placeholders have no delimiter to split on
            # (pattern.go parsePatternSteps rejects '<a><b>' — r15
            # pattern corpus finding)
            raise self.err("extract pattern has no delimiter between <fields>")
        if any("*" in n for n in names):
            # '<a*>' is not a valid capture name ('<*>' alone is a skip)
            raise self.err("wildcard placeholder name in extract pattern")
        self.advance()
        frm = "_msg"
        if self.tok().is_kw("from"):
            self.advance()
            frm = self._field_name()
        self._no_wildcards([frm], "extract from")
        p = A.PExtract(pat, frm, cond=cond)
        self._common_unpack_opts(p)
        return p

    def _parse_p_extract_regexp(self) -> A.Pipe:
        cond = self._opt_if_cond()
        t = self.tok()
        if self.lex.is_end() or (
            not t.quoted
            and t.is_kw(
                "from", "|", "keep_original_fields", "skip_empty_results", "if"
            )
        ):
            raise self.err("missing pattern in 'extract_regexp'")
        pat = t.text
        # pipe_extract_regexp.go requires at least one VALID named
        # capture group — '(?P<*>...)' and '(?P<bar*>...)' reject
        # named groups only — '(?<=' / '(?<!' are lookarounds, accepted
        # as a documented Java-flavor extension (the RE2 reference has
        # no lookbehind at all)
        gnames = re.findall(r"\(\?P?<(?![=!])([^>]*)>", pat)
        valid = [n for n in gnames if n and re.match(r"^\w+$", n)]
        if any(n and not re.match(r"^\w+$", n) for n in gnames):
            raise self.err("invalid capture group name in extract_regexp")
        if not valid:
            raise self.err(
                "extract_regexp pattern needs at least one (?P<name>...) group"
            )
        self.advance()
        frm = "_msg"
        if self.tok().is_kw("from"):
            self.advance()
            frm = self._field_name()
        self._no_wildcards([frm], "extract_regexp from")
        p = A.PExtractRegexp(pat, frm, cond=cond)
        self._common_unpack_opts(p)
        return p

    def _parse_replace_args(self, regex: bool) -> A.PReplace:
        cond = self._opt_if_cond()
        self.expect("(")
        # args are compound tokens ('secret-password' spans lexer
        # tokens), like the reference's getCompoundToken
        old = self._compound_token()
        self.expect(",")
        new = self._compound_token()
        self.expect(")")
        fieldn = "_msg"
        if self.tok().is_kw("at"):
            self.advance()
            fieldn = self._field_name()
            self._no_wildcards([fieldn], "replace at")
        limit = 0
        if self.tok().is_kw("limit"):
            self.advance()
            limit = self._int("replace limit")
        if regex:
            try:  # pipe_replace_regexp.go compiles at parse time
                re.compile(old)
            except re.error as ex:
                raise self.err(f"invalid replace_regexp pattern: {ex}")
        return A.PReplace(old, new, fieldn, limit, regex, cond)

    def _parse_p_replace(self) -> A.Pipe:
        return self._parse_replace_args(False)

    def _parse_p_replace_regexp(self) -> A.Pipe:
        return self._parse_replace_args(True)

    def _parse_p_format(self) -> A.Pipe:
        cond = self._opt_if_cond()
        t = self.tok()
        if self.lex.is_end() or (
            not t.quoted
            and t.is_kw(
                "|", "as", "keep_original_fields", "skip_empty_results", "if"
            )
        ):
            raise self.err("missing pattern in 'format'")
        pat = t.text
        if any(
            "*" in n
            for n in re.findall(r"<([^>]*)>", pat)
            if n not in ("", "_", "*")
        ):
            raise self.err("wildcard placeholder name in format pattern")
        self.advance()
        p = A.PFormat(pat)
        if self.tok().is_kw("as"):
            self.advance()
            p.result = self._field_name()
        elif not self.lex.is_end() and not self.tok().is_kw("|") and not self.tok().is_kw(
            "keep_original_fields", "skip_empty_results", "if"
        ):
            # pipe_format.go accepts the result only via 'as'
            raise self.err("unexpected token after format pattern")
        self._no_wildcards([p.result], "format result")
        self._common_unpack_opts(p)
        p.cond = cond
        return p

    def _parse_unpack_common(self, cls):
        cond = self._opt_if_cond()
        frm = "_msg"
        flds: list[str] = []
        prefix = ""
        if self.tok().is_kw("from"):
            self.advance()
            frm = self._field_name()
        elif not self.lex.is_end() and not self.tok().is_kw(
            "|", "fields", "result_prefix", "keep_original_fields", "skip_empty_results"
        ):
            frm = self._field_name()
        if self.tok().is_kw("fields"):
            self.advance()
            flds = self._field_list(parens_required=True)
        if self.tok().is_kw("result_prefix"):
            self.advance()
            t = self.tok()
            if self.lex.is_end() or (not t.quoted and t.is_kw("|", ")", ",")):
                raise self.err("missing value after 'result_prefix'")
            prefix = t.text
            self.advance()
        self._no_wildcards([frm], "unpack from")
        p = cls(frm, flds, prefix, cond=cond)
        self._common_unpack_opts(p)
        return p

    def _parse_p_unpack_json(self) -> A.Pipe:
        return self._parse_unpack_common(A.PUnpackJson)

    def _parse_p_unpack_logfmt(self) -> A.Pipe:
        return self._parse_unpack_common(A.PUnpackLogfmt)

    def _parse_p_unpack_syslog(self) -> A.Pipe:
        cond = self._opt_if_cond()
        frm = "_msg"
        if self.tok().is_kw("from"):
            self.advance()
            frm = self._field_name()
        elif not self.lex.is_end() and not self.tok().is_kw(
            "offset", "result_prefix", "keep_original_fields", "|", ")"
        ):
            # bare positional from-field (pipe_unpack_syslog.go:130)
            frm = self._field_name()
        self._no_wildcards([frm], "unpack_syslog from")
        off = 0
        if self.tok().is_kw("offset"):
            self.advance()
            d = parse_duration_ns(self._compound_time_token())
            if d is None:
                raise self.err("missing duration after 'offset'")
            off = d
        prefix = ""
        if self.tok().is_kw("result_prefix"):
            self.advance()
            t = self.tok()
            if self.lex.is_end() or (not t.quoted and t.is_kw("|", ")", ",")):
                raise self.err("missing value after 'result_prefix'")
            prefix = t.text
            self.advance()
        p = A.PUnpackSyslog(frm, prefix, off, cond=cond)
        if self.tok().is_kw("keep_original_fields"):
            self.advance()
            p.keep_original_fields = True
        return p

    def _parse_p_unpack_words(self) -> A.Pipe:
        src = "_msg"
        had_from = False
        if self.tok().is_kw("from"):
            self.advance()
            had_from = True
        if had_from or (
            not self.tok().is_kw("as", "drop_duplicates")
            and not self.lex.is_end()
            and not self.tok().is_kw("|")
        ):
            if had_from and (
                self.lex.is_end() or self.tok().is_kw("|", "as")
            ):
                raise self.err("missing field after 'from'")
            if not (had_from or self.lex.is_end() or self.tok().is_kw("|")):
                src = self._field_name()
            elif had_from:
                src = self._field_name()
        self._no_wildcards([src], "unpack_words from")
        dst = src
        if self.tok().is_kw("as"):
            self.advance()
            dst = self._field_name()
        elif not self.lex.is_end() and not self.tok().is_kw(
            "|", "limit", "drop_duplicates"
        ):
            dst = self._field_name()  # positional result: 'unpack_words x y'
        self._no_wildcards([dst], "unpack_words result")
        limit = 0
        if self.tok().is_kw("limit"):
            self.advance()
            limit = self._int("unpack_words limit")
        drop_dups = False
        if self.tok().is_kw("drop_duplicates"):
            self.advance()
            drop_dups = True
        return A.PUnpackWords(src, dst, limit, drop_dups)

    def _parse_p_unroll(self) -> A.Pipe:
        cond = self._opt_if_cond()
        had_by = False
        if self.tok().is_kw("by"):  # 'unroll by (...)' (pipe_unroll.go)
            self.advance()
            had_by = True
        return A.PUnroll(
            self._no_wildcards(
                # docs examples use the bare 'unroll words' form; after
                # an explicit 'by' the parens are mandatory
                self._field_list(parens_required=had_by, min_fields=1),
                "unroll fields",
            ),
            cond=cond,
        )

    def _parse_pack(self, cls):
        # both orders are accepted: 'pack_json [as] result [fields (...)]'
        # and 'pack_json fields (...) as result' (docs examples)
        result = "_msg"
        flds: list[str] = []
        if self.tok().is_kw("fields"):
            self.advance()
            flds = self._field_list(parens_required=True)
        if not self.lex.is_end() and not self.tok().is_kw("|", "fields"):
            if self.tok().is_kw("as"):
                self.advance()
            result = self._field_name()
        if self.tok().is_kw("fields") and not flds:
            self.advance()
            flds = self._field_list(parens_required=True)
        self._no_wildcards([result], "pack result")
        return cls(result, flds)

    def _parse_p_pack_json(self) -> A.Pipe:
        return self._parse_pack(A.PPackJson)

    def _parse_p_pack_logfmt(self) -> A.Pipe:
        return self._parse_pack(A.PPackLogfmt)

    # -- multi-query pipes --------------------------------------------------------
    def _parse_p_join(self) -> A.Pipe:
        if self.tok().is_kw("by") or self.tok().is_kw("on"):
            self.advance()
        by = self._no_wildcards(
            self._field_list(parens_required=True, min_fields=1), "join by"
        )
        self.expect("(")
        q = self.parse(subquery=True)
        self.expect(")")
        inner = False
        prefix = ""
        if self.tok().is_kw("inner"):  # pipe_join.go: inner BEFORE prefix
            self.advance()
            inner = True
        if self.tok().is_kw("prefix"):
            self.advance()
            t = self.tok()
            if self.lex.is_end() or (not t.quoted and t.is_kw("|", ")")):
                raise self.err("missing value after 'prefix'")
            prefix = t.text
            self.advance()
        return A.PJoin(by, q, inner, prefix)

    def _parse_p_union(self) -> A.Pipe:
        self.expect("(")
        q = self.parse(subquery=True)
        self.expect(")")
        return A.PUnion(q)

    def _parse_p_uniq(self) -> A.Pipe:
        by: list[str] = []
        if self.tok().is_kw("by"):
            # 'by' works with or without parens (pipe_uniq.go:
            # parseCommaSeparatedFields fallback; r15 corpus), but a
            # following KEYWORD is not a field list ('uniq by hits')
            self.advance()
            if not self.tok().is_kw("(") and self.tok().is_kw(
                "hits", "with", "limit", "|"
            ):
                raise self.err("missing field list after 'uniq by'")
            by = self._field_list(min_fields=1)
        elif self.tok().is_kw("("):
            by = self._field_list()
        elif (
            not self.lex.is_end()
            and not self.tok().is_kw("|", "with", "hits", "limit")
        ):
            by = self._field_list()  # bare 'uniq foo, bar' form
        if not by:
            # pipe_uniq.go requires at least one by-field
            raise self.err("uniq requires 'by (...)' fields")
        self._no_wildcards(by, "uniq by")
        hits = None
        if self.tok().is_kw("with"):
            self.advance()
            if not self.tok().is_kw("hits"):
                raise self.err("missing 'hits' after 'with'")
        if self.tok().is_kw("hits"):
            # bare 'hits' flag — 'with' is optional (pipe_uniq.go)
            self.advance()
            hits = "hits"
        limit = 0
        if self.tok().is_kw("limit"):
            self.advance()
            limit = self._int("uniq limit")
        return A.PUniq(by, hits, limit)

    def _parse_p_top(self) -> A.Pipe:
        n = 10
        t = self.tok()
        if not t.quoted and re.match(r"^\d+$", t.text):
            n = self._int("top N")
        by: list[str] = []
        if self.tok().is_kw("by"):
            # parens optional after 'by' (pipe_top.go; r15 corpus)
            self.advance()
            by = self._field_list(min_fields=1)
        elif self.tok().is_kw("("):
            by = self._field_list()
        elif not self.lex.is_end() and not self.tok().is_kw(
            "|", "hits", "rank", ")"
        ):
            by = self._field_list()  # bare 'top N foo, bar' form
        if not by:
            # pipe_top.go requires by-fields ('top' / 'top rank' reject)
            raise self.err("top requires field(s)")
        self._no_wildcards(by, "top by")
        p = A.PTop(n, by)
        while True:
            if self.tok().is_kw("hits"):
                self.advance()
                # a bare trailing 'hits' is invalid — it must rename
                # ('hits as abc'; r15 pipe-parse corpus)
                name = self._opt_as_name("")
                if not name:
                    raise self.err("missing name after 'hits'")
                p.hits_field = name
                self._no_wildcards([name], "hits name")
            elif self.tok().is_kw("rank"):
                self.advance()
                p.rank_name = self._opt_as_name("rank")
                self._no_wildcards([p.rank_name], "rank name")
            else:
                break
        return p

    def _parse_p_facets(self) -> A.Pipe:
        p = A.PFacets()
        t = self.tok()
        if not t.quoted and re.match(r"^\d+$", t.text):
            p.n = self._int("facets N")
        while True:
            if self.tok().is_kw("max_values_per_field"):
                self.advance()
                p.max_values_per_field = self._int("max_values_per_field")
            elif self.tok().is_kw("max_value_len"):
                self.advance()
                p.max_value_len = self._int("max_value_len")
            elif self.tok().is_kw("keep_const_fields"):
                self.advance()
                p.keep_const_fields = True
            else:
                break
        return p

    def _parse_p_field_names(self) -> A.Pipe:
        result = self._opt_as_name("name")
        self._no_wildcards([result], "field_names result")
        return A.PFieldNames(result=result)

    def _parse_p_field_values(self) -> A.Pipe:
        has_paren = self.tok().is_kw("(")
        if has_paren:
            self.advance()
        name = self._field_name()
        self._no_wildcards([name], "field_values field")
        if has_paren:
            self.expect(")")
        limit = 0
        if self.tok().is_kw("limit"):
            self.advance()
            limit = self._int("field_values limit")
        return A.PFieldValues(name, limit)

    def _single_field_as(self):
        has_paren = self.tok().is_kw("(")
        if has_paren:
            self.advance()
        name = self._field_name()
        if has_paren:
            self.expect(")")
        self._no_wildcards([name], "field argument")
        # default result field is _msg (pipe_len.go:156, pipe_hash.go,
        # pipe_json_array_len.go:173)
        result = self._opt_as_name("_msg")
        self._no_wildcards([result], "result name")
        return name, result

    def _parse_p_len(self) -> A.Pipe:
        name, result = self._single_field_as()
        return A.PLen(name, result)

    def _parse_p_json_array_len(self) -> A.Pipe:
        name, result = self._single_field_as()
        return A.PJsonArrayLen(name, result)

    def _parse_p_hash(self) -> A.Pipe:
        name, result = self._single_field_as()
        return A.PHash(name, result)

    def _parse_p_sample(self) -> A.Pipe:
        n = self._int("sample N")
        if n < 1:
            raise self.err("sample N must be a positive integer")
        return A.PSample(n)

    def _parse_p_collapse_nums(self) -> A.Pipe:
        cond = self._opt_if_cond()
        p = A.PCollapseNums(cond=cond)
        # pipe_collapse_nums.go: 'at <field>' then 'prettify' — 'prettify
        # at x' rejects (r15 pipe-parse corpus)
        if self.tok().is_kw("at"):
            self.advance()
            p.field_name = self._field_name()
        if self.tok().is_kw("prettify"):
            self.advance()
            p.prettify = True
        return p

    def _parse_p_decolorize(self) -> A.Pipe:
        p = A.PDecolorize()
        if not self.lex.is_end() and not self.tok().is_kw("|"):
            p.field_name = self._field_name()
            self._no_wildcards([p.field_name], "decolorize field")
        return p

    def _parse_p_drop_empty_fields(self) -> A.Pipe:
        return A.PDropEmptyFields()

    def _parse_p_stream_context(self) -> A.Pipe:
        p = A.PStreamContext()
        if not self.tok().is_kw("before", "after", "time_window"):
            # pipe_stream_context.go requires at least one clause
            raise self.err(
                "stream_context needs 'before', 'after' or 'time_window'"
            )
        while True:
            if self.tok().is_kw("before"):
                self.advance()
                p.before = self._int("before")
            elif self.tok().is_kw("after"):
                self.advance()
                p.after = self._int("after")
            elif self.tok().is_kw("time_window"):
                self.advance()
                d = parse_duration_ns(self._compound_time_token())
                if d is None:
                    raise self.err("stream_context: bad time_window")
                p.time_window_ns = d
            else:
                break
        return p

    def _parse_p_blocks_count(self) -> A.Pipe:
        return A.PBlocksCount(result=self._opt_as_name("blocks_count"))

    def _parse_p_block_stats(self) -> A.Pipe:
        return A.PBlockStats()


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _quote_meta(s: str) -> str:
    """Go regexp.QuoteMeta: escape ONLY the regex specials. Python's
    re.escape over-escapes (e.g. '-'), which would change the canonical
    printed form of desugared in()/not_in() stream matchers."""
    return re.sub(r"([\\.+*?()|\[\]{}^$])", r"\\\1", s)


def canonical_field(name: str) -> str:
    """'' → _msg;  leading '.'-relative names kept as-is."""
    if name in ("", "_"):
        return "_msg"
    return name


def ipv4_to_u32(s: str) -> int | None:
    """values_encoder.go tryParseIPv4 replica (pinned by the r15 ipv4
    corpus): 7..15 chars, exactly 3 dots, 1-3 chars per octet parsed via
    the shared date-uint scanner (leading zeros allowed), each ≤ 255."""
    from victorialogs_spark.logsql.lexer import _date_uint

    if not 7 <= len(s) <= 15 or s.count(".") != 3:
        return None
    v = 0
    for p in s.split("."):
        if not 1 <= len(p) <= 3:
            return None
        n = _date_uint(p)
        if n is None or n > 255:
            return None
        v = (v << 8) | n
    return v


_TIME_POINT_RE = re.compile(
    r"^(?P<y>\d{4})(?:-(?P<mo>\d{2})(?:-(?P<d>\d{2})"
    r"(?:[T ](?P<h>\d{2})(?::(?P<mi>\d{2})(?::(?P<s>\d{2})(?:\.(?P<frac>\d+))?)?)?)?)?)?"
    r"(?P<tz>Z|[+-]\d{2}:?\d{2})?$"
)


def parse_time_point(s: str) -> tuple[int, int] | None:
    """Parse a (possibly partial) RFC3339 timestamp into the inclusive ns
    range it denotes: '2024' → the whole year, '2024-01-01' → the whole day,
    a full timestamp → a single instant. Mirrors the reference's partial
    timestamp semantics (docs/victorialogs/LogsQL.md time filter section)."""
    s = s.strip()
    m = _TIME_POINT_RE.match(s)
    if not m:
        return None
    g = m.groupdict()
    y = int(g["y"])
    tz_off = 0
    if g["tz"] and g["tz"] != "Z":
        t = g["tz"].replace(":", "")
        sign = 1 if t[0] == "+" else -1
        tz_off = sign * (int(t[1:3]) * 3600 + int(t[3:5])) * NS

    def ts(year, mo, d, h, mi, sec) -> int:
        dt = _dt.datetime(year, mo, d, h, mi, sec, tzinfo=_dt.timezone.utc)
        return int(dt.timestamp()) * NS

    if g["mo"] is None:
        lo = ts(y, 1, 1, 0, 0, 0)
        hi = ts(y + 1, 1, 1, 0, 0, 0) - 1
    elif g["d"] is None:
        mo = int(g["mo"])
        lo = ts(y, mo, 1, 0, 0, 0)
        ny, nm = (y + 1, 1) if mo == 12 else (y, mo + 1)
        hi = ts(ny, nm, 1, 0, 0, 0) - 1
    elif g["h"] is None:
        lo = ts(y, int(g["mo"]), int(g["d"]), 0, 0, 0)
        hi = lo + 86400 * NS - 1
    elif g["mi"] is None:
        lo = ts(y, int(g["mo"]), int(g["d"]), int(g["h"]), 0, 0)
        hi = lo + 3600 * NS - 1
    elif g["s"] is None:
        lo = ts(y, int(g["mo"]), int(g["d"]), int(g["h"]), int(g["mi"]), 0)
        hi = lo + 60 * NS - 1
    else:
        lo = ts(y, int(g["mo"]), int(g["d"]), int(g["h"]), int(g["mi"]), int(g["s"]))
        if g["frac"]:
            frac_ns = int(float("0." + g["frac"]) * NS)
            lo += frac_ns
            hi = lo
        else:
            hi = lo + NS - 1
    return lo - tz_off, hi - tz_off


_BUCKET_WORDS_NS = {
    # tryParseBucketSize word sizes (pipe_stats.go:1624), exact lowercase
    # spellings, values in the reference's single numeric space (ns for
    # durations). 'month'/'year' are NOT here: they carry no numeric size
    # and bucket by UTC calendar boundaries (block_result.go:834-837).
    "nanosecond": 1.0, "microsecond": 1e3, "millisecond": 1e6,
    "second": 1e9, "minute": 60e9, "hour": 3600e9, "day": 86400e9,
    "week": 7 * 86400e9,
}


def _parse_bucket_num(txt: str, *, words: bool) -> float | None:
    """tryParseBucketSize / tryParseBucketOffset replica
    (pipe_stats.go:1598,1624): word sizes (sizes only), then float,
    duration, bytes — ONE numeric space: a bare number on ``_time``
    means NANOSECONDS, same as a duration literal."""
    raw = _BUCKET_WORDS_NS.get(txt) if words else None
    if raw is None:
        raw = try_parse_float64(txt)
    if raw is None:
        d = parse_duration_ns(txt)
        raw = None if d is None else float(d)
    if raw is None:
        b = try_parse_bytes(txt)
        raw = None if b is None else float(b)
    return raw


def _parse_bucket_size(txt: str, is_time: bool) -> float | None:
    raw = _parse_bucket_num(txt, words=True)
    if raw is None:
        return None
    return raw / 1e9 if is_time else raw


def _parse_bucket_offset(txt: str, is_time: bool) -> float | None:
    raw = _parse_bucket_num(txt, words=False)
    if raw is None:
        return None
    return raw / 1e9 if is_time else raw


def _default_stats_name(name: str, fields: list[str], extra: dict) -> str:
    """Auto result name = the func's own String() (parsePipeStats:
    resultName = sf.String()) — one implementation, shared with the
    printer, so mixed lists like 'avg(a, *, b)' name verbatim."""
    from victorialogs_spark.logsql.printer import _stats_func_core

    return _stats_func_core(A.StatsFunc(name, fields, "", extra, None))


def extract_time_range(f: A.Filter) -> tuple[int, int] | None:
    """Global time range from the top-level AND of the filter tree
    (parser.go:504-525) — used for partition pruning and rate()."""
    lo, hi = -(2**62), 2**62
    found = False

    def walk_and(node: A.Filter):
        nonlocal lo, hi, found
        if isinstance(node, A.FTime):
            lo = max(lo, node.lo_ns)
            hi = min(hi, node.hi_ns)
            found = True
        elif isinstance(node, A.FAnd):
            for c in node.children:
                walk_and(c)

    walk_and(f)
    if not found:
        return None
    return lo, hi
