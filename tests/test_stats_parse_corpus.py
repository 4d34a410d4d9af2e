"""Func-level stats-parse parity against the reference's own
TestParseStats*Success/Failure tests (lib/logstorage/stats_*_test.go,
runtime-extracted).

These cases are FUNC-level, not query-level: the reference harness runs
parseStatsFunc on the raw string (stats_avg_test.go:388-414) and asserts
(a) full consumption — so 'avg(x) y' REJECTS here even though it is a
legal aliased func at pipe level — and (b) canonical printing through
the func's own String(), which carries no if-clause and no result alias.
We replay through Parser._parse_stats_func_core + printer._stats_func_core.

The r15 wave this net landed with fixed: field-list comma discipline
(parseFieldFiltersInParens: leading ',' and missing ',' reject, trailing
',' accepted), 'limit' gated to the five collecting funcs (count_uniq,
count_uniq_hash, json_values, uniq_values, values — elsewhere the stats
pipe reads 'limit' as a bare alias), quantile phiStr source-spelling
printing ('quantile(1, a)' keeps '1'), and quantile's all-match field
list dropping from the printed form ('quantile(0.3)', not
'quantile(0.3, *)') per stats_quantile.go:24-30.
"""

import glob
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

REF_DIR = "/root/reference/lib/logstorage"


def _cases():
    from test_pipe_semantics_corpus import _go_string, _skip_ws

    succ, fail = [], []
    for path in sorted(glob.glob(f"{REF_DIR}/stats_*_test.go")):
        src = Path(path).read_text()
        for fm in re.finditer(
            r"func (TestParseStats\w+?)(Success|Failure)\(t \*testing\.T\)"
            r" \{([\s\S]*?)(?=\nfunc |\Z)",
            src,
        ):
            kind, body = fm.group(2), fm.group(3)
            if "expectParseStatsFunc" not in body:
                continue
            for cm in re.finditer(r"\n\t+f\(", body):
                try:
                    s, _ = _go_string(body, _skip_ws(body, cm.end()))
                except ValueError:
                    continue
                (succ if kind == "Success" else fail).append(s)
    return succ, fail


def _parse_func_level(s):
    """parseStatsFunc harness replica: parse one func, demand EOF."""
    from victorialogs_spark.logsql.parser import Parser

    p = Parser(s)
    name, fields, extra = p._parse_stats_func_core()
    t = p.tok()
    if t.text != "" or t.quoted:
        raise ValueError(f"unexpected tail after stats func: {t.text!r}")
    return name, fields, extra


def test_stats_func_parse_canonical_corpus():
    from victorialogs_spark.logsql import ast as A
    from victorialogs_spark.logsql.printer import _stats_func_core

    succ, _ = _cases()
    assert len(succ) >= 70, f"extraction regressed: {len(succ)}"
    failures = []
    for s in succ:
        try:
            name, fields, extra = _parse_func_level(s)
        except Exception as e:  # noqa: BLE001
            failures.append((s, f"parse error: {e}"))
            continue
        got = _stats_func_core(A.StatsFunc(name, fields, name, extra, None))
        if got != s:
            failures.append((s, got))
    assert not failures, (
        f"{len(failures)} canonical failures; first 10:\n"
        + "\n".join(f"  {s!r} -> {got!r}" for s, got in failures[:10])
    )


def test_stats_func_parse_reject_corpus():
    _, fail = _cases()
    assert len(fail) >= 75, f"extraction regressed: {len(fail)}"
    accepted = []
    for s in fail:
        try:
            _parse_func_level(s)
            accepted.append(s)
        except Exception:  # noqa: BLE001
            pass
    assert not accepted, (
        f"{len(accepted)} wrongly accepted:\n"
        + "\n".join(f"  {s!r}" for s in accepted[:15])
    )
