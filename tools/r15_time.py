"""Quick per-query timing probe (bench.py protocol: warm session, noop
write, best-of-N). Usage:

    python tools/r15_time.py [-n REPS] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time


def main(argv: list[str]) -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    reps = 5
    if argv and argv[0] == "-n":
        reps = int(argv[1])
        argv = argv[2:]
    names = argv

    from victorialogs_spark.driver_entry import QUERIES
    from victorialogs_spark.schema import events_as_logs, load_table
    from victorialogs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-time")
    spark.sparkContext.setLogLevel("ERROR")
    events_as_logs(spark, sf_dir).count()
    load_table(spark, sf_dir, "lineitem").count()
    shuffle_parts = spark.conf.get("spark.sql.shuffle.partitions")
    for name in names:
        fn = QUERIES[name]
        samples = []
        spark.catalog.clearCache()
        for _ in range(reps):
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
            spark.sparkContext.setJobDescription(f"r15_time:{name}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        samples.sort()
        mid = len(samples) // 2
        med = samples[mid] if len(samples) % 2 else (samples[mid - 1] + samples[mid]) / 2
        print(f"{name}: best {samples[0]:.3f} median {med:.3f} all {[round(s, 3) for s in samples]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
