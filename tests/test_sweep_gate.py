"""Closing-sweep completeness gate (r13, VERDICT r12 #4).

Round 12 shipped a 248-query sweep artifact while the registry held 249
— the last two commits added ``gif_frame_stats`` after the sweep ran,
and nothing tripped. This gate makes that impossible: the HIGHEST-
numbered committed sweep artifact must cover exactly the registered
queries. When it fails, the fix is to re-run the closing sweep at the
final tree (``python tools/driver_mimic.py > artifacts/sweep_r{N}.json``),
never to edit the artifact.
"""

import json
import os
import re

import pytest

from llm_training_data_pipeline_spark.plans.queries import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = os.path.join(REPO, "artifacts")


def _latest_sweep() -> tuple[str, dict]:
    sweeps = {}
    for fn in os.listdir(ARTIFACTS):
        m = re.fullmatch(r"sweep_r(\d+)\.json", fn)
        if m:
            sweeps[int(m.group(1))] = fn
    assert sweeps, "no sweep artifact committed at all"
    fn = sweeps[max(sweeps)]
    with open(os.path.join(ARTIFACTS, fn)) as fh:
        return fn, json.load(fh)


def test_latest_sweep_covers_every_registered_query():
    fn, sweep = _latest_sweep()
    reg = set(registry())
    missing = sorted(reg - set(sweep))
    stale = sorted(set(sweep) - reg)
    assert not missing, (
        f"{fn} is missing registered queries {missing} — re-run the "
        f"closing sweep at this tree (tools/driver_mimic.py), don't ship "
        f"a query the sweep never executed"
    )
    assert not stale, (
        f"{fn} contains unregistered queries {stale} — the artifact "
        f"predates a registry rename/removal; regenerate it"
    )


def test_latest_sweep_is_all_green():
    """A committed sweep with a red row is worse than no sweep — every
    row must be pass / rows_only (the driver's two green statuses)."""
    fn, sweep = _latest_sweep()
    bad = {
        n: r.get("status")
        for n, r in sweep.items()
        if r.get("status") not in ("pass", "rows_only")
    }
    assert not bad, f"{fn} has non-green rows: {bad}"
