"""Every runnable LogsQL example in the reference's documentation must
parse. The docs are the syntax users actually write — acceptance here
means a user can paste any documented query into this engine.

Template pseudo-queries (placeholders like `stats_func1(...)`, `<q>`,
`_time:step`) are skipped.
"""

import re
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # ~3.7 min: executes every docs example end-to-end

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


@pytest.mark.skipif(not DOCS.exists(), reason="reference docs not present")
def test_all_docs_examples_plan(spark):
    """Parsing is not enough: every docs example must also COMPILE to a
    DataFrame plan against a representative log table (catches
    filter/pipe-compile crashes on exotic combinations the registry
    doesn't cover). Planning is lazy — no execution here."""
    from victorialogs_spark.planner.planner import plan_query
    from victorialogs_spark.schema import events_as_logs

    logs = events_as_logs(spark, "/root/testdata/sf0.001")
    failures = []
    for q in _examples():
        try:
            ast = parse_query(q, timestamp_ns=TS)
            plan_query(spark, logs, ast)
        except NotImplementedError:
            # documented engine divergences may refuse at plan time
            # (e.g. cluster-only pipes) — refusing cleanly is fine
            pass
        except ValueError:
            # semantic errors over this particular table (e.g. join on a
            # missing field) are legitimate refusals, not crashes
            pass
        except Exception as e:  # noqa: BLE001
            failures.append((q, type(e).__name__, str(e)[:80]))
    assert not failures, f"{len(failures)} docs examples fail to plan: {failures[:5]}"


@pytest.mark.skipif(not DOCS.exists(), reason="reference docs not present")
def test_all_docs_examples_execute(spark):
    """The strongest net: every docs example must also EXECUTE against a
    real log table (limit 3 — runtime behavior, not result values; the
    oracle registry checks values). Catches execution-only failures the
    lazy plan step can't see (bad casts, UDF errors, codegen issues)."""
    from victorialogs_spark.planner.planner import plan_query
    from victorialogs_spark.schema import events_as_logs

    logs = events_as_logs(spark, "/root/testdata/sf0.001")
    failures = []
    for q in _examples():
        try:
            ast = parse_query(q, timestamp_ns=TS)
            plan_query(spark, logs, ast).limit(3).collect()
        except (NotImplementedError, ValueError):
            pass  # clean documented refusals
        except Exception as e:  # noqa: BLE001
            failures.append((q, type(e).__name__, str(e)[:80]))
    assert not failures, f"{len(failures)} docs examples fail to run: {failures[:5]}"
