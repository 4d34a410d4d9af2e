"""Scratch runner: dump ALL failing cases of the semantics corpus.

Usage: python tools/corpus_probe.py [file-substring ...]
"""
import sys
sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from test_pipe_semantics_corpus import (  # noqa: E402
    _extract_cases, _norm_rows, _run_case, SKIP_CASES,
)


def main():
    subs = sys.argv[1:]
    import os
    from victorialogs_spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("vl-probe", master="local[4]")
    cases, _ = _extract_cases()
    seen = {}
    nfail = 0
    for name, pipe_str, rows, expected in cases:
        k = seen.get((name, pipe_str), 0)
        seen[(name, pipe_str)] = k + 1
        if (name, pipe_str, k) in SKIP_CASES:
            continue
        if subs and not any(s in name for s in subs):
            continue
        try:
            got = _run_case(spark, pipe_str, rows)
        except Exception as e:  # noqa: BLE001
            nfail += 1
            print(f"FAIL {name} [{pipe_str}] error: {e}")
            continue
        a = _norm_rows(got)
        b = _norm_rows([dict(r) for r in expected])
        if a != b:
            nfail += 1
            print(f"FAIL {name} [{pipe_str}]\n  got  {a}\n  want {b}")
    print(f"total failures: {nfail}")


if __name__ == "__main__":
    main()
