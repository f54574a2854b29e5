"""Contention guard in the bench harness (r13, VERDICT r12 #1).

The r12 round record carried a phantom sf1 cliff (dedup_clusters ratio
46.65 recorded under box contention; 2.33 re-measured quiet). These pin
the guard that keeps that from recurring: per-pass loadavg snapshots,
the >2x-committed-prior re-run trigger, and the prior loader that reads
the COMMITTED artifact (git HEAD), immune to same-session overwrites.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_contention_suspects_trigger_and_nontrigger():
    timings = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}
    large = {"a": 10.0, "b": 4.0, "c": 10.0, "d": 10.0}
    prior = {"a": 2.0, "b": 2.5, "d": 0.0}
    got = bench._contention_suspects(large, timings, prior)
    # a: ratio 10 > 2*2.0 → rerun. b: 4 <= 2*2.5 → no.
    # c: no prior → no (first-run queries have nothing to compare).
    # d: degenerate prior 0 → no (guard, not divide-by-zero).
    assert got == ["a"]
    # missing main timing never divides by zero / triggers
    assert bench._contention_suspects({"x": 9.9}, {}, {"x": 1.0}) == []


def test_committed_prior_ratios_reads_git_head():
    """The prior must come from HEAD, not the working copy — bench runs
    within a round overwrite artifacts/bench_full.json, and a poisoned
    prior would disarm the guard for the driver's pass."""
    ratios = bench._committed_prior_ratios(REPO)
    head = subprocess.run(
        ["git", "-C", REPO, "show", "HEAD:artifacts/bench_full.json"],
        capture_output=True, text=True,
    )
    if head.returncode != 0:  # artifact not committed yet this round
        assert isinstance(ratios, dict)
        return
    expected = json.loads(head.stdout).get("scale_ratio_large") or {}
    expected = {
        k: v for k, v in expected.items() if isinstance(v, (int, float))
    }
    assert ratios == expected
    assert ratios, "committed artifact should carry large-pass ratios"
    assert all(isinstance(v, (int, float)) for v in ratios.values())


def test_committed_prior_ratios_outside_git(tmp_path):
    """Fallback path: outside a git checkout the on-disk artifact is the
    prior; absent or malformed → empty dict (guard disarmed, not a
    crash)."""
    assert bench._committed_prior_ratios(str(tmp_path)) == {}
    art = tmp_path / "artifacts"
    art.mkdir()
    (art / "bench_full.json").write_text(
        json.dumps({"scale_ratio_large": {"q": 3.5, "bad": None}})
    )
    assert bench._committed_prior_ratios(str(tmp_path)) == {"q": 3.5}
    (art / "bench_full.json").write_text("not json")
    assert bench._committed_prior_ratios(str(tmp_path)) == {}


def test_large_subset_is_subset_of_headline_or_registry():
    """Every LARGE_SUBSET row must be a registered query — a typo here
    would crash the driver's large pass at the end of a long run."""
    from llm_training_data_pipeline_spark.plans.queries import registry

    reg = set(registry())
    missing = [n for n in bench.LARGE_SUBSET if n not in reg]
    assert not missing
    missing_h = [n for n in bench.HEADLINE if n not in reg]
    assert not missing_h


def test_quiet_verdict_criterion():
    """r14 (VERDICT r13 #2): the committed closing headline is binding
    only when the pass started on a quiet box (start < 1.5) and did not
    end drowned (end < 4.0 — the pass's own local[32] work contributes,
    hence the looser end bar)."""
    assert bench._quiet_verdict(0.04, 3.2)
    assert bench._quiet_verdict(1.49, 3.99)
    assert not bench._quiet_verdict(1.5, 0.1)   # started contended
    assert not bench._quiet_verdict(0.1, 4.0)   # ended drowned
    assert not bench._quiet_verdict(5.0, 6.0)
    # thresholds are parameters, not constants
    assert bench._quiet_verdict(2.0, 5.0, start_max=3.0, end_max=6.0)


def test_wait_for_quiet_polls_until_quiet_or_deadline():
    loads = iter([8.0, 4.0, 1.0])
    slept = []
    la = bench._wait_for_quiet(
        1.5, deadline_secs=100, poll_secs=10,
        load_fn=lambda: next(loads), sleep_fn=slept.append,
    )
    assert la == 1.0 and slept == [10, 10]
    # deadline: gives up after budget is spent, returns last observation
    la = bench._wait_for_quiet(
        1.5, deadline_secs=25, poll_secs=10,
        load_fn=lambda: 9.0, sleep_fn=lambda s: None,
    )
    assert la == 9.0
