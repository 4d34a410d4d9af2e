"""Every runnable LogsQL example in the reference's documentation must
parse. The docs are the syntax users actually write — acceptance here
means a user can paste any documented query into this engine.

Template pseudo-queries (placeholders like `stats_func1(...)`, `<q>`,
`_time:step`) are skipped.
"""

import re
from pathlib import Path

import pytest

from victorialogs_spark.logsql.parser import parse_query

DOCS = Path("/root/reference/docs/victorialogs/LogsQL.md")

TS = 1704067200_000000000

_TEMPLATE_MARKERS = ("stats_func1", "<q>", "step offset", "_time:step")


def _examples():
    src = DOCS.read_text()
    out = []
    for block in re.findall(r"```logsql\n(.*?)```", src, re.S):
        q = block.strip()
        if q and not any(m in q for m in _TEMPLATE_MARKERS):
            out.append(q)
    return out


@pytest.mark.skipif(not DOCS.exists(), reason="reference docs not present")
def test_all_docs_examples_parse():
    failures = []
    for q in _examples():
        try:
            parse_query(q, timestamp_ns=TS)
        except Exception as e:  # noqa: BLE001
            failures.append((q, str(e)[:80]))
    assert not failures, f"{len(failures)} docs examples fail: {failures[:5]}"
