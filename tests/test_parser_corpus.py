"""Parser parity against the reference's own query corpora.

Extracts the TestParseQuery_Success / TestParseQuery_Failure query strings
from the reference test file AT RUNTIME (nothing is copied into this repo)
and asserts our parser's accept/reject rates. The corpus is the
query-language syntax itself (SURVEY.md §5 adopted plan, item 1).
"""

import re
from pathlib import Path

import pytest

from victorialogs_spark.logsql.parser import parse_query

REF = Path("/root/reference/lib/logstorage/parser_test.go")

# documented remaining gaps (none — stats_remote parses as of round 5)
KNOWN_MISSES: set[str] = set()


def _extract():
    src = REF.read_text()
    i = src.index("func TestParseQuery_Success")
    j = src.index("func TestParseQuery_Failure")
    # bound the failure section at the next test func — later tests also
    # call f(`...`) with queries that parse fine (they test other props)
    m = re.search(r"\nfunc Test", src[j + 10 :])
    end = j + 10 + m.start() if m else len(src)
    succ = re.findall(r"f\(`((?:[^`])*)`", src[i:j])
    fails = re.findall(r"f\(`((?:[^`])*)`\)", src[j:end])
    return succ, fails


@pytest.mark.skipif(not REF.exists(), reason="reference repo not present")
def test_success_corpus_parses():
    succ, _ = _extract()
    misses = []
    for q in succ:
        try:
            parse_query(q, timestamp_ns=1704067200_000000000)
        except Exception:
            misses.append(q)
    unexpected = [q for q in misses if q not in KNOWN_MISSES]
    assert not unexpected, f"new parse misses: {unexpected[:5]}"
    assert len(misses) <= len(KNOWN_MISSES) + 2


@pytest.mark.skipif(not REF.exists(), reason="reference repo not present")
def test_failure_corpus_mostly_rejected():
    _, fails = _extract()
    accepted = 0
    for q in fails:
        try:
            parse_query(q, timestamp_ns=1704067200_000000000)
            accepted += 1
        except Exception:
            pass
    # every query in the reference's failure corpus is rejected; keep a
    # tiny slack for future corpus drift
    assert accepted / len(fails) < 0.02, f"{accepted}/{len(fails)} wrongly accepted"
