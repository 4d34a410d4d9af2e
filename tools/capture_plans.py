"""Capture .explain("formatted") for every headline query into
plans/r15/<query>_<tag>.txt (tag = before/after). Usage:

    python tools/capture_plans.py before [query ...]

Explain-only: no actions are executed (iterative operators that run jobs
while BUILDING their DataFrame do execute those driver-side steps)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main(argv: list[str]) -> int:
    tag = argv[0] if argv else "before"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    out_dir = os.path.join(here, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE
    from victorialogs_spark.driver_entry import QUERIES
    from victorialogs_spark.session import get_spark

    names = argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        plan = buf.getvalue()
        print(
            f"{name}: Exchange={plan.count('Exchange')} "
            f"PythonNodes={sum(plan.count(k) for k in ('BatchEvalPython', 'ArrowEvalPython', 'MapInArrow', 'MapInPandas', 'FlatMapGroupsInPandas'))} "
            f"-> {path}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
