"""The driver's correctness artifact covers the FIRST 50 registry
entries each round; _reorder_registry() fronts this round's brand-new
oracle entries and fills with the stalest previously-green names. These
tests pin the round-15 window so an accidental registry reshuffle (a
new entry registered without an oracle, a stale name dropped) is caught
at pytest time instead of as a silently thinner CORRECTNESS artifact.
No Spark session needed — the registry builds at import."""

import glob
import json
import os
import re

from victorialogs_spark import driver_entry as D

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_is_new_entries_then_stalest_fill():
    keys = list(D.QUERIES)
    window = keys[:50]
    # new r15 entries land first, then the re-derived-semantics entries
    front = list(D._NEW_R15) + list(D._REDERIVED_R15)
    assert window[: len(front)] == front
    # the fill is drawn from the stale list in ITS order
    fill = window[len(front):]
    stale_ordered = [
        k for k in D._STALE_R15_WINDOW
        if k in D.QUERIES and k in D.ORACLE and k not in front
    ]
    assert fill == stale_ordered[: len(fill)]


def test_window_entries_all_oracle_backed():
    # a rows-only entry in the window would record `err: no_oracle`
    # instead of a green row — the window must stay fully checkable
    for name in list(D.QUERIES)[:50]:
        assert name in D.ORACLE, f"{name} in the driver window has no oracle"


def test_new_entries_are_actually_new():
    # _NEW_R15 means "never in any prior artifact": appearing in a prior
    # verified set would waste a freshness slot on an already-green name
    prior = (
        set(D._DRIVER_VERIFIED_R2_R3) | set(D._DRIVER_VERIFIED_R5)
        | set(D._DRIVER_VERIFIED_R6) | set(D._DRIVER_VERIFIED_R7)
        | set(D._DRIVER_VERIFIED_R8) | set(D._DRIVER_VERIFIED_R9)
        | set(D._DRIVER_VERIFIED_R10) | set(D._DRIVER_VERIFIED_R11)
        | set(D._DRIVER_VERIFIED_R12) | set(D._DRIVER_VERIFIED_R13)
        | set(D._DRIVER_VERIFIED_R14)
    )
    assert not prior.intersection(D._NEW_R15)


def test_verified_sets_match_committed_artifacts():
    # the newest verified set must be EXACTLY the names in the committed
    # CORRECTNESS artifact it claims to mirror
    with open(os.path.join(HERE, "CORRECTNESS_r14.json")) as fh:
        art = json.load(fh)
    assert sorted(art) == sorted(D._DRIVER_VERIFIED_R14)
    assert list(art)[: len(D._NEW_R14)] == list(D._NEW_R14)


def test_stale_window_matches_artifact_union():
    # the stale list must be EXACTLY the 52 stalest oracle-backed entries
    # by (last-green round, artifact position) over the artifacts that
    # DEFINED this window (r01..r14) — re-derive rather than trust the
    # hand copy (the r11 hand-derived list missed the three r08 codec
    # entries). Deliberately NOT a glob over all CORRECTNESS_r*.json:
    # the driver commits r15+ artifacts later, and a derivation that
    # shifts under them would make this test a time-bomb, not a pin.
    last = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if rnd > 14:
            continue
        with open(path) as fh:
            for i, name in enumerate(json.load(fh)):
                last[name] = (rnd, i)
    oracle_backed = [k for k in D.QUERIES if k in D.ORACLE]
    expected = sorted(
        (k for k in oracle_backed if k in last), key=lambda k: last[k]
    )[:52]
    assert list(D._STALE_R15_WINDOW) == expected
