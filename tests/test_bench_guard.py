"""Unit tests for bench.py's regression guard — pure-Python, no Spark.

The guard normalizes per-query ratios by the session-median ratio
(host-drift absorption), which makes it blind to a regression hitting
>= half the queries; the DRIFT_BACKSTOP flag exists to catch exactly
that case.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import DRIFT_BACKSTOP, compute_regression_flags  # noqa: E402

PRIOR = {f"q{i}": 1.0 for i in range(10)}


def test_no_change_no_flags():
    flags = compute_regression_flags(dict(PRIOR), PRIOR)
    assert flags["regressions"] == {}
    assert flags["host_drift_factor"] == 1.0
    assert not flags["drift_backstop_exceeded"]
    assert flags["uniform_slowdown_raw"] == {}


def test_localized_regression_flagged():
    medians = dict(PRIOR)
    medians["q3"] = 1.6  # one query 60% slower, the rest flat
    flags = compute_regression_flags(medians, PRIOR)
    assert list(flags["regressions"]) == ["q3"]
    assert flags["host_drift_factor"] == 1.0
    assert not flags["drift_backstop_exceeded"]


def test_host_drift_absorbs_moderate_uniform_shift():
    # everything 15% slower — classic co-tenant contention, below the
    # backstop: absorbed, recorded in the factor, no false flags
    medians = {n: v * 1.15 for n, v in PRIOR.items()}
    flags = compute_regression_flags(medians, PRIOR)
    assert flags["regressions"] == {}
    assert 1.1 < flags["host_drift_factor"] < 1.2
    assert not flags["drift_backstop_exceeded"]


def test_uniform_genuine_regression_trips_backstop():
    # EVERY query 50% slower (e.g. a session-conf regression): the
    # normalization zeroes the per-query flags — the backstop must fire
    # and list the raw-slow queries so the run cannot read as clean
    medians = {n: v * 1.5 for n, v in PRIOR.items()}
    flags = compute_regression_flags(medians, PRIOR)
    assert flags["regressions"] == {}  # the blindness being backstopped
    assert flags["host_drift_factor"] > DRIFT_BACKSTOP
    assert flags["drift_backstop_exceeded"]
    assert set(flags["uniform_slowdown_raw"]) == set(PRIOR)


def test_missing_prior_reports_null_drift_not_fabricated_one():
    # r9's artifact recorded host_drift_factor 1.0 with an EMPTY prior,
    # which read as "checked, clean" when nothing was checked — a missing
    # prior must say null so the blind spot is visible in the artifact
    flags = compute_regression_flags(dict(PRIOR), {})
    assert flags["regressions"] == {}
    assert flags["host_drift_factor"] is None
    assert not flags["drift_backstop_exceeded"]


def test_history_roundtrip(tmp_path):
    from bench import append_history, load_history_priors

    here = str(tmp_path)
    # missing file -> empty record, no label
    rec, label = load_history_priors(here, 0.1)
    assert (rec, label) == ({}, None)
    append_history(here, 9, 0.1, {"q1": 1.0}, {"q1": 2.0})
    append_history(here, 10, 0.1, {"q1": 1.1}, {"q1": 2.1}, {"q1": 0.9})
    rec, label = load_history_priors(here, 0.1)
    assert rec["query_medians"] == {"q1": 1.1}
    assert rec["layout_query_medians"] == {"q1": 2.1}
    assert rec["query_bests"] == {"q1": 0.9}
    assert label == "BENCH_HISTORY.jsonl:r10"
    # sf mismatch (local sf0.01 run) must not see the sf0.1 baseline
    assert load_history_priors(here, 0.01) == ({}, None)
    # same-round re-run replaces, never stacks duplicates
    append_history(here, 10, 0.1, {"q1": 1.2}, {})
    rec, _ = load_history_priors(here, 0.1)
    assert rec["query_medians"] == {"q1": 1.2}
    hist = (tmp_path / "BENCH_HISTORY.jsonl").read_text().strip().split("\n")
    assert len(hist) == 2


def test_best_ratio_pre_triages_noise_shaped_flag():
    # median regressed 1.6x but best-of is flat: the co-tenant-burst
    # signature r8-r10 adjudicated by manual A/B three times — the flag
    # stays (never hidden) but arrives pre-triaged as noise_shaped
    medians = dict(PRIOR)
    medians["q3"] = 1.6
    bests = {n: 0.8 for n in PRIOR}
    prior_bests = {n: 0.8 for n in PRIOR}
    flags = compute_regression_flags(medians, PRIOR, bests, prior_bests)
    assert list(flags["regressions"]) == ["q3"]
    f = flags["regressions"]["q3"]
    assert f["best_ratio"] == 1.0
    assert f["noise_shaped"] is True


def test_best_ratio_confirms_genuine_regression():
    # median AND best-of both regressed: not noise-shaped
    medians = dict(PRIOR)
    medians["q3"] = 1.6
    bests = {n: 0.8 for n in PRIOR}
    bests["q3"] = 1.3
    prior_bests = {n: 0.8 for n in PRIOR}
    flags = compute_regression_flags(medians, PRIOR, bests, prior_bests)
    f = flags["regressions"]["q3"]
    assert f["best_ratio"] == round(1.3 / 0.8, 3)
    assert f["noise_shaped"] is False


def test_best_ratio_null_when_prior_bests_missing():
    # pre-r11 history lines carry no query_bests: the flag must say
    # best_ratio null (not adjudicated), never a fabricated verdict
    medians = dict(PRIOR)
    medians["q3"] = 1.6
    flags = compute_regression_flags(medians, PRIOR, {"q3": 1.5}, {})
    f = flags["regressions"]["q3"]
    assert f["best_ratio"] is None
    assert "noise_shaped" not in f


def test_committed_history_carries_r9_seed():
    # the committed r9 seed must EXIST with sane (r8-level) priors for the
    # three r9-contaminated queries.  bench.py appends each round's medians
    # to the same committed file, so we locate the r9 record by its `round`
    # field rather than asserting it is the newest line (asserting newest
    # would self-break at the very next round-snapshot commit).
    import json

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r9 = None
    with open(os.path.join(here, "BENCH_HISTORY.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if rec.get("round") == 9 and rec.get("sf") == 0.1:
                r9 = rec
    assert r9 is not None
    med = r9["query_medians"]
    assert med["f_word"] < 1.0          # r9 artifact said 3.354 (contaminated)
    assert med["f_time_range"] < 1.0    # r9 artifact said 1.416
    assert med["s_stats_by"] < 1.0      # r9 artifact said 4.352
    assert r9.get("layout_query_medians")  # layout baseline present too


def test_committed_history_newest_line_is_usable_prior():
    # whatever round is newest, load_history_priors must return non-empty
    # medians with a well-formed label — the guard must never go blind on
    # the committed tree
    import re

    from bench import load_history_priors

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rec, label = load_history_priors(here, 0.1)
    assert rec.get("query_medians"), "committed history yielded empty priors"
    assert label and re.fullmatch(r"BENCH_HISTORY\.jsonl:r\d+", label)


def test_adjudicated_flag_suppressed_inside_envelope():
    # the p_sort_desc_rank shape: prior round measured the warm-protocol
    # floor (~0.33), this round the cold one (~0.52) — a 1.57x median
    # ratio with best-of inside the adjudicated envelope must move to
    # adjudicated_flags, not regressions
    from bench import ADJUDICATIONS

    prior = dict(PRIOR)
    prior["p_sort_desc_rank"] = 0.33
    medians = dict(PRIOR)
    medians["p_sort_desc_rank"] = 0.52
    bests = {n: 0.8 for n in PRIOR}
    bests["p_sort_desc_rank"] = 0.44
    prior_bests = {n: 0.8 for n in PRIOR}
    prior_bests["p_sort_desc_rank"] = 0.31
    flags = compute_regression_flags(
        medians, prior, bests, prior_bests,
        sf=0.1, adjudications=ADJUDICATIONS,
    )
    assert flags["regressions"] == {}
    assert list(flags["adjudicated"]) == ["p_sort_desc_rank"]
    assert "SCALE.md" in flags["adjudicated"]["p_sort_desc_rank"][
        "adjudication"
    ]


def test_adjudication_does_not_cover_other_sf():
    # the envelope is a sf0.1 measurement; a sf1 flag must NOT be eaten
    from bench import ADJUDICATIONS

    prior = dict(PRIOR)
    prior["p_sort_desc_rank"] = 0.33
    medians = dict(PRIOR)
    medians["p_sort_desc_rank"] = 0.52
    bests = {n: 0.8 for n in PRIOR}
    bests["p_sort_desc_rank"] = 0.44
    prior_bests = dict(bests)
    prior_bests["p_sort_desc_rank"] = 0.31
    flags = compute_regression_flags(
        medians, prior, bests, prior_bests,
        sf=1.0, adjudications=ADJUDICATIONS,
    )
    assert list(flags["regressions"]) == ["p_sort_desc_rank"]
    assert flags["adjudicated"] == {}


def test_genuine_slowdown_outside_envelope_still_flags():
    # a deliberate 1.3x slowdown pushing the query OUT of its adjudicated
    # band (median above the band max, best above best_max) must flag as
    # a normal regression — the adjudication is an envelope, not a mute
    from bench import ADJUDICATIONS

    band_hi = ADJUDICATIONS["p_sort_desc_rank"]["median_band"][1]
    best_max = ADJUDICATIONS["p_sort_desc_rank"]["best_max"]
    prior = dict(PRIOR)
    prior["p_sort_desc_rank"] = 0.52
    medians = dict(PRIOR)
    medians["p_sort_desc_rank"] = round(band_hi * 1.3, 3)
    bests = {n: 0.8 for n in PRIOR}
    bests["p_sort_desc_rank"] = round(best_max * 1.3, 3)
    prior_bests = {n: 0.8 for n in PRIOR}
    prior_bests["p_sort_desc_rank"] = 0.44
    flags = compute_regression_flags(
        medians, prior, bests, prior_bests,
        sf=0.1, adjudications=ADJUDICATIONS,
    )
    assert list(flags["regressions"]) == ["p_sort_desc_rank"]
    assert flags["adjudicated"] == {}
    # and a non-adjudicated query slowed 1.3x still flags regardless
    medians2 = dict(PRIOR)
    medians2["q5"] = 1.31
    flags2 = compute_regression_flags(
        medians2, PRIOR, sf=0.1, adjudications=ADJUDICATIONS,
    )
    assert list(flags2["regressions"]) == ["q5"]


def test_history_protocol_like_for_like(tmp_path):
    # a warm-validation line (different protocol) must never become the
    # fresh-process baseline; legacy lines without the field count as
    # fresh-process (they were all written by bench.py's full run)
    import json

    from bench import append_history, load_history_priors

    here = str(tmp_path)
    append_history(here, 11, 0.1, {"q1": 1.0}, {})
    path = tmp_path / "BENCH_HISTORY.jsonl"
    lines = [json.loads(ln) for ln in path.read_text().splitlines()]
    assert lines[-1]["protocol"] == "bench-full-fresh-process"
    # splice in a newer warm-validation record by hand
    lines.append({"round": 12, "sf": 0.1, "query_medians": {"q1": 0.3},
                  "protocol": "warm-validation"})
    path.write_text("\n".join(json.dumps(r) for r in lines) + "\n")
    rec, label = load_history_priors(here, 0.1)
    assert rec["query_medians"] == {"q1": 1.0}
    assert label == "BENCH_HISTORY.jsonl:r11"
