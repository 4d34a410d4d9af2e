"""Interleaved A/B: staged-sort natural keys on GENUINE text fields —
r15 expression path (CodegenFallback HOF scanners + run encoder,
interpreted Project) vs r16 Arrow pandas UDF (natural_arrow.py).

Round-robin within ONE session so host drift hits both arms equally;
best-of + median per arm. Usage: python tools/ab_natural_arrow.py [sf_dir]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from victorialogs_spark.api import run_query  # noqa: E402
from victorialogs_spark.planner import pipes  # noqa: E402
from victorialogs_spark.schema import events_as_logs, load_table  # noqa: E402
from victorialogs_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_natural_arrow")
    spark.sparkContext.setLogLevel("ERROR")
    events = events_as_logs(spark, sf_dir)
    events.count()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    QUERIES = {
        # TakeOrdered top-k over a real log-text field (staged keys feed
        # the heap comparator)
        "msg_topk": (events, "* | sort by (_msg) limit 10 | fields _msg"),
        # full global sort of the text field (exchange + per-row keys)
        "msg_fullsort": (events, "* | sort by (_msg) | fields _msg"),
        # the declared natural-text query (format output: mixed digit
        # runs, provenance dropped)
        "natural_text_rank": (
            docs,
            '* | format "h<doc_id>" as hkey | sort by (hkey) limit 7'
            " rank as r | fields hkey, r",
        ),
        # mixed numeric-string + text sort (value parses numeric on most
        # rows; gate fires only on scanner-shaped rows)
        "value_sort": (events, "* | sort by (value) limit 10 | fields value"),
    }

    ROUNDS = 5
    res = {q: {"expr": [], "arrow": []} for q in QUERIES}
    for rnd in range(ROUNDS):
        for qname, (src, q) in QUERIES.items():
            for arm in ("expr", "arrow"):
                pipes.STAGED_TEXT_ARROW = arm == "arrow"
                t0 = time.monotonic()
                df = run_query(spark, src, q)
                df.write.format("noop").mode("overwrite").save()
                res[qname][arm].append(time.monotonic() - t0)
    pipes.STAGED_TEXT_ARROW = True
    print(f"{'query':20} {'expr best/med':>16} {'arrow best/med':>16} ratio")
    for qname, arms in res.items():
        eb, em = min(arms["expr"]), statistics.median(arms["expr"])
        ab, am = min(arms["arrow"]), statistics.median(arms["arrow"])
        print(
            f"{qname:20} {eb:7.3f}/{em:7.3f} {ab:8.3f}/{am:7.3f} "
            f"best {ab / eb:.2f}x med {am / em:.2f}x"
        )


if __name__ == "__main__":
    main()
