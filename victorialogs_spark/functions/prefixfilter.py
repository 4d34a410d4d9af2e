"""Field-name wildcard filters (lib/prefixfilter/filter.go; pinned by
the r15 prefixfilter corpus): a '*' is special ONLY as the trailing
char — 'foo*' prefix-matches, a lone '*' matches everything, and a
'*' anywhere else is a literal (IsWildcardFilter("*f") is false, and
MatchFilter("*f*", s) prefix-matches the literal "*f").

The planner's projection/stats/copy-rename wildcard expansion all run
through these predicates so the semantics live in one place."""

from __future__ import annotations


def is_wildcard_filter(f: str) -> bool:
    """IsWildcardFilter: true iff the filter ends with '*'."""
    return f.endswith("*")


def match_filter(f: str, s: str) -> bool:
    """MatchFilter: trailing-'*' prefix match, else exact equality."""
    if f.endswith("*"):
        return s.startswith(f[:-1])
    return s == f


def match_filters(filters: list[str], s: str) -> bool:
    """MatchFilters: any-of (empty list matches nothing)."""
    return any(match_filter(f, s) for f in filters)


def match_all(filters: list[str]) -> bool:
    """MatchAll: some filter is the lone '*'."""
    return "*" in filters
