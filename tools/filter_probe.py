"""Scratch runner: dump ALL failing cases of the filter semantics corpus."""
import sys
sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from test_filter_semantics_corpus import _extract_cases, _eval_cases  # noqa: E402


def main():
    subs = sys.argv[1:]
    import os
    from victorialogs_spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("vl-fprobe", master="local[4]")
    cases, unparseable = _extract_cases()
    run = [c for c in cases if not subs or any(s in c[0] or s in c[2] for s in subs)]
    failures = _eval_cases(spark, run)
    for n, q, why in failures:
        print(f"FAIL {n} [{q}] {why}")
    print(f"total failures: {len(failures)} / {len(run)} (unparseable {unparseable})")


if __name__ == "__main__":
    main()
