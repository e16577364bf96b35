"""Smoke gate: the driver entry points must always run.

Round-2 postmortem: a half-finished MapState migration broke every
constructor call site while the per-module unit tests of the day still
passed, so the snapshot shipped red (VERDICT round 2, item 1).  This test
executes the exact code paths the driver exercises — `entry()` single-chip
and `dryrun_multichip(8)` on the virtual CPU mesh — so any state-shape or
sharding-spec drift fails the suite itself.
"""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402


def test_entry_runs():
    fn, ex = ge.entry()
    new_state, diag = fn(*ex)
    jax.block_until_ready(new_state)
    assert int(diag.map_size) > 0
    assert diag.packed.shape[0] == 28


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    ge.dryrun_multichip(8)
