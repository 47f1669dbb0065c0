"""Regression-gate plumbing for bench.py.

The r4 verdict found the gate silently disarming: the driver's
BENCH_r{N}.json capture truncates bench stdout to a 2000-char tail with
``parsed: null`` once the query map grows, so ``latest_bench_baseline``
returned a dict with no ``queries`` key and every per-query comparison
was skipped without a word. These tests pin the fix: the loader must
always return a non-empty query map for the current repo state (falling
past truncated captures to the newest usable one), and every HEADLINE
name must be a registered query so the bench can't KeyError mid-run.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402


def test_baseline_loader_returns_nonempty_queries():
    base = bench.latest_bench_baseline()
    assert base is not None, "no usable bench baseline in the repo"
    name, data = base
    assert isinstance(data.get("queries"), dict) and data["queries"], (
        f"baseline {name} has no per-query timings — the regression "
        "gate would silently compare against nothing"
    )
    assert all(
        isinstance(v, (int, float)) and v >= 0
        for v in data["queries"].values()
    )


def test_baseline_loader_skips_truncated_captures():
    """BENCH_r04.json is a real truncated capture (tail-only,
    parsed: null); the loader must not select it."""
    here = os.path.dirname(os.path.abspath(bench.__file__))
    r04 = os.path.join(here, "BENCH_r04.json")
    if not os.path.exists(r04):
        pytest.skip("BENCH_r04.json not present")
    with open(r04) as fh:
        data = json.load(fh)
    if isinstance(data.get("queries"), dict) and data["queries"]:
        pytest.skip("BENCH_r04.json is not truncated after all")
    name, _ = bench.latest_bench_baseline()
    assert name != "BENCH_r04.json"


def test_headline_names_are_registered_queries():
    from gee_datapipeline_spark.plans import queries

    qs = queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_local_result_preferred_once_written():
    """If BENCH_LOCAL.json exists (written by every sf0.1 bench run),
    it must win over the driver captures."""
    here = os.path.dirname(os.path.abspath(bench.__file__))
    local = os.path.join(here, bench.LOCAL_RESULT)
    if not os.path.exists(local):
        pytest.skip("BENCH_LOCAL.json not written yet this checkout")
    name, data = bench.latest_bench_baseline()
    assert name == bench.LOCAL_RESULT
    assert data["queries"]


def test_no_unadjudicated_regression_flags():
    """Rounds 7 and 8 both ended with fresh ``regressions`` entries
    sitting in BENCH_LOCAL.json that nobody had adjudicated — the
    exact state the judge flagged twice. This test makes that state
    impossible to end a round in silently: every name the last bench
    run flagged must either be fixed (re-run clears it) or carry an
    EXPECTED_DELTAS annotation recording the adjudication evidence.

    r10: the artifact judged is the HEAD-committed one (see
    test_tripwire_is_provenance_aware), so the driver's post-round
    capture sitting uncommitted in the working tree cannot redden
    this — but committing one unannotated still does."""
    stale = bench.unadjudicated_flags()
    assert not stale, (
        f"unadjudicated bench regressions: {stale} — re-run bench.py "
        "after a fix, or annotate the adjudication in "
        "bench.EXPECTED_DELTAS"
    )


def test_expected_deltas_are_structured():
    """r9 ADVICE: every annotation must carry its adjudication kind
    and the measured level the evidence explains, so waivers are
    bounded and countable rather than permanent prose."""
    assert bench.EXPECTED_DELTAS, "annotation ledger unexpectedly empty"
    for name, e in bench.EXPECTED_DELTAS.items():
        assert e["kind"] in ("host-noise", "plan-cost", "oracle-cost"), (
            name,
            e["kind"],
        )
        assert (
            isinstance(e["adjudicated_sec"], (int, float))
            and e["adjudicated_sec"] > 0
        ), name
        assert isinstance(e["note"], str) and len(e["note"]) > 20, name


def test_annotation_bounds_are_enforced():
    """An annotation covers measurements only up to its adjudicated
    level plus the normal flag margin (1.2x AND +0.5s). The r9
    committed capture demonstrated the hole this closes:
    streaming_road_enrich at 15.935s filed silently under a stale
    6.85-7.25s adjudication."""
    table = {"q": {"kind": "host-noise", "adjudicated_sec": 5.0,
                   "note": "solo re-measure 4.8-5.0s"}}
    # at / near the adjudicated level: covered
    assert bench.delta_covered("q", 5.0, table)
    assert bench.delta_covered("q", 5.4, table)  # +0.4s < floor
    assert bench.delta_covered("q", 5.9, table)  # 1.18x < ratio
    # beyond both margins: stale annotation, must re-flag
    assert not bench.delta_covered("q", 6.2, table)
    assert not bench.delta_covered("q", 15.9, table)
    # unannotated queries are never covered
    assert not bench.delta_covered("other", 1.0, table)
    # sub-second queries keep the absolute jitter floor
    table2 = {"s": {"kind": "host-noise", "adjudicated_sec": 0.3,
                    "note": "sub-second jitter class evidence"}}
    assert bench.delta_covered("s", 0.75, table2)
    assert not bench.delta_covered("s", 0.85, table2)


def test_mismatched_cpus_baseline_is_skipped():
    """VERDICT r10 item 3: the driver's 8-core scaling run must never
    become the drift baseline for a 32-core run (and vice versa). The
    loader skips any capture recording a different cpus count; a
    capture with no recorded cpus (pre-r11) stays accepted."""
    base = bench.latest_bench_baseline(cpus=32)
    assert base is not None
    name32, data32 = base
    rec = data32.get("cpus")
    if rec is None:
        pytest.skip("current baseline predates cpus stamping")
    assert int(rec) == 32
    # At a different core count the 32-core local baseline must NOT be
    # selected; whatever is returned (an old unstamped driver capture,
    # or nothing) must not be a stamped mismatch.
    other = bench.latest_bench_baseline(cpus=8)
    if other is not None:
        _, data8 = other
        assert data8.get("cpus") in (None, 8), (
            "loader returned a baseline stamped with a different cpus"
        )
        assert not (name32 == bench.LOCAL_RESULT and data8 is data32)


def test_write_guard_refuses_mismatched_cpus():
    """An existing baseline with cpus=32 blocks a cpus=8 run from
    replacing it (the exact r10 incident: the driver's 8-core scaling
    run overwrote and then committed over the 32-core baseline)."""
    existing32 = {"cpus": 32, "queries": {"q": 1.0}}
    assert not bench.baseline_write_allowed(8, existing32)
    assert bench.baseline_write_allowed(32, existing32)
    # first-ever write and legacy unstamped captures remain writable
    assert bench.baseline_write_allowed(8, None)
    assert bench.baseline_write_allowed(8, {"queries": {"q": 1.0}})
    # and the shipped baseline itself is stamped, so the door is shut
    here = os.path.dirname(os.path.abspath(bench.__file__))
    with open(os.path.join(here, bench.LOCAL_RESULT)) as fh:
        shipped = json.load(fh)
    assert shipped.get("cpus") is not None, (
        "BENCH_LOCAL.json must record its cpus or the guard is moot"
    )


def _git(tmp, *args):
    import subprocess

    subprocess.run(
        ["git", "-C", str(tmp), *args],
        check=True,
        capture_output=True,
        env={**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL":
             "t@t", "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL":
             "t@t"},
    )


def test_tripwire_is_provenance_aware(tmp_path):
    """The r9 failure mode, pinned end-to-end in a scratch repo: the
    driver re-runs bench.py after the round ends and its noisy capture
    lands in the working tree. Flags in an UNCOMMITTED capture must
    not redden the suite (nobody can adjudicate after round end);
    COMMITTING such a capture unannotated must."""
    clean = {
        "queries": {"pricing_summary": 2.0},
        "regressions": {},
        "expected_deltas": {},
    }
    noisy = {
        "queries": {"made_up_query_xyz": 9.9, "pricing_summary": 6.0},
        "regressions": {
            "made_up_query_xyz": "1.0s -> 9.9s vs BENCH_LOCAL.json"
        },
        "expected_deltas": {},
    }
    _git(tmp_path, "init", "-q")
    art = tmp_path / bench.LOCAL_RESULT
    art.write_text(json.dumps(clean))
    _git(tmp_path, "add", bench.LOCAL_RESULT)
    _git(tmp_path, "commit", "-qm", "clean capture")
    assert bench.unadjudicated_flags(str(tmp_path)) == {}

    # driver-style: noisy capture in the working tree, uncommitted
    art.write_text(json.dumps(noisy))
    assert bench.unadjudicated_flags(str(tmp_path)) == {}, (
        "an uncommitted capture must not trip the adjudication gate"
    )

    # committing it unannotated is the state the gate exists to catch
    _git(tmp_path, "add", bench.LOCAL_RESULT)
    _git(tmp_path, "commit", "-qm", "noisy capture")
    assert "made_up_query_xyz" in bench.unadjudicated_flags(
        str(tmp_path)
    )


def test_stale_annotation_reflagged_in_committed_capture(tmp_path):
    """ADVICE r9: an entry the capture filed under expected_deltas is
    re-checked against its annotation's adjudicated bound — a stale
    annotation cannot keep covering a bigger regression even in a
    committed artifact."""
    name = "streaming_road_enrich"  # real ledger entry
    adj = bench.EXPECTED_DELTAS[name]["adjudicated_sec"]
    capture = {
        "queries": {name: adj * 3.0},
        "regressions": {},
        "expected_deltas": {name: f"x -> {adj * 3.0}s (old prose)"},
    }
    _git(tmp_path, "init", "-q")
    (tmp_path / bench.LOCAL_RESULT).write_text(json.dumps(capture))
    _git(tmp_path, "add", bench.LOCAL_RESULT)
    _git(tmp_path, "commit", "-qm", "capture with stale waiver")
    stale = bench.unadjudicated_flags(str(tmp_path))
    assert name in stale and "adjudicated bound" in stale[name]
    # and within the bound it stays covered
    capture["queries"][name] = adj
    (tmp_path / bench.LOCAL_RESULT).write_text(json.dumps(capture))
    _git(tmp_path, "add", bench.LOCAL_RESULT)
    _git(tmp_path, "commit", "-qm", "capture at adjudicated level")
    assert bench.unadjudicated_flags(str(tmp_path)) == {}
