"""Structural parser parity: the reference's success corpus pairs each
query with its canonical form (Query.String() after Query.optimize). The
canonicalization is semantics-preserving, so parsing the original and the
canonical must yield the SAME AST modulo the reference's documented
rewrites (AND/OR flattening, match-all dropping, trivial-regex folding,
'*' field-list normalization, stream-filter hoisting).

This catches silent misparses that acceptance testing can't: a query that
parses but binds the wrong field/precedence produces a different AST than
its canonical form.
"""

import re
from pathlib import Path

import pytest

from victorialogs_spark.logsql import ast as A
from victorialogs_spark.logsql.parser import parse_query

REF = Path("/root/reference/lib/logstorage/parser_test.go")

TS = 1704067200_000000000

# queries using features we deliberately don't support
KNOWN_SKIPS = {
    "* | stats_remote count() x",
}


def _pairs():
    src = REF.read_text()
    i = src.index("func TestParseQuery_Success")
    j = src.index("func TestParseQuery_Failure")
    return re.findall(r"f\(`((?:[^`])*)`,\s*`((?:[^`])*)`\)", src[i:j])


def _norm_filter(f):
    """Apply the reference's semantic rewrites so equivalent filters
    compare equal (parser.go Query.optimize + String() sugar)."""
    if isinstance(f, A.FAnd):
        kids = []
        for c in (_norm_filter(c) for c in f.children):
            if isinstance(c, A.FAnd):
                kids.extend(c.children)
            elif isinstance(c, A.FNoop):
                continue  # 'foo *' == 'foo'
            else:
                kids.append(c)
        if not kids:
            return A.FNoop()
        # adjacent single-term stream filters merge into one selector:
        # {a="b"} {c="d"} == {a="b",c="d"}
        streams = [k for k in kids if isinstance(k, A.FStream) and len(k.or_terms) == 1]
        if len(streams) > 1:
            matchers = sorted(
                (m for s in streams for m in s.or_terms[0]), key=repr
            )
            kids = [k for k in kids if k not in streams] + [A.FStream([matchers])]
        if len(kids) == 1:
            return kids[0]
        # AND is commutative; the reference hoists stream filters first
        return A.FAnd(sorted(kids, key=repr))
    if isinstance(f, A.FOr):
        kids = []
        for c in (_norm_filter(c) for c in f.children):
            if isinstance(c, A.FOr):
                kids.extend(c.children)
            else:
                kids.append(c)
        if len(kids) == 1:
            return kids[0]
        return A.FOr(kids)
    if isinstance(f, A.FNot):
        return A.FNot(_norm_filter(f.child))
    if isinstance(f, A.FRegexp):
        # trivial regexes fold (parser.go: ~".*" -> *, ~".+" -> prefix)
        if f.pattern in (".*", ""):
            return A.FNoop()
        if f.pattern == ".+":
            return _norm_filter(A.FPrefix(f.field, ""))
        return f
    if isinstance(f, A.FPrefix) and f.prefix == "" and f.field in ("", "_msg"):
        return A.FNoop()  # _msg:* == *
    if isinstance(f, A.FStream):
        # matcher order within a selector term is insignificant
        return A.FStream(sorted((sorted(t, key=repr) for t in f.or_terms), key=repr))
    if isinstance(f, A.FInSubquery):
        return A.FInSubquery(f.field, _norm_query(f.query))
    if isinstance(f, A.FContains) and f.subquery is not None:
        return A.FContains(
            f.field, f.values, f.require_all, subquery=_norm_query(f.subquery)
        )
    return f


def _norm_stats_fields(fields):
    return ["*"] if (not fields or "*" in fields) else fields


def _norm_pipe(p, opts):
    if isinstance(p, A.PFilter):
        return A.PFilter(_norm_filter(p.filter))
    if isinstance(p, A.PStats):
        funcs = []
        for f in p.funcs:
            cond = _norm_filter(f.cond) if f.cond is not None else None
            if isinstance(cond, A.FNoop):
                cond = None  # 'if (*)' == no condition
            funcs.append(
                A.StatsFunc(f.name, _norm_stats_fields(f.fields), f.result, f.extra, cond)
            )
        return A.PStats(p.by, funcs)
    if isinstance(p, A.PUnion):
        return A.PUnion(_norm_query(p.query, opts))
    if isinstance(p, A.PJoin):
        return A.PJoin(p.by, _norm_query(p.query, opts), p.inner, p.prefix)
    return p


def _fuse_pipes(pipes):
    """Mirror Query.optimize pipe fusion: sort absorbs following offset /
    limit; uniq absorbs a following limit."""
    out = []
    for p in pipes:
        prev = out[-1] if out else None
        if isinstance(p, A.POffset) and isinstance(prev, A.PSort) and not prev.offset and not prev.limit:
            prev.offset = p.n
            continue
        if isinstance(p, A.PLimit) and isinstance(prev, A.PSort) and not prev.limit:
            prev.limit = p.n
            continue
        if isinstance(p, A.PLimit) and isinstance(prev, A.PUniq) and not prev.limit:
            prev.limit = p.n
            continue
        out.append(p)
    return out


def _norm_options(opts, parent):
    """Subqueries inherit the parent's options (parser.go:261-262);
    concurrency=0 is the default and drops out."""
    eff = dict(parent or {})
    eff.update(opts or {})
    return {k: v for k, v in eff.items() if not (k == "concurrency" and str(v) == "0")}


def _norm_query(q, parent_opts=None):
    opts = _norm_options(q.options, parent_opts)
    f = _norm_filter(q.filter)
    pipes = [_norm_pipe(p, opts) for p in _fuse_pipes(list(q.pipes))]
    # the reference folds leading filter pipes into the base filter
    while pipes and isinstance(pipes[0], A.PFilter):
        pf = pipes.pop(0)
        f = _norm_filter(A.FAnd([f, pf.filter]))
    return A.Query(filter=f, pipes=pipes, options=opts, time_range=q.time_range)


@pytest.mark.skipif(not REF.exists(), reason="reference repo not present")
def test_ast_matches_canonical_form():
    mismatches = []
    parse_errors = []
    for q, c in _pairs():
        if q in KNOWN_SKIPS or c in KNOWN_SKIPS:
            continue
        try:
            a1 = _norm_query(parse_query(q, timestamp_ns=TS))
            a2 = _norm_query(parse_query(c, timestamp_ns=TS))
        except Exception as e:  # noqa: BLE001
            parse_errors.append((q, c, str(e)))
            continue
        if a1 != a2:
            mismatches.append((q, c))
    assert not parse_errors, f"parse errors: {parse_errors[:3]}"
    assert not mismatches, (
        f"{len(mismatches)} AST mismatches vs canonical, e.g. {mismatches[:3]}"
    )
