"""Exercise the driver entry points (``__graft_entry__``).

The driver runs ``dryrun_multichip(8)`` under a kill timer; round 4's
artifact recorded rc=124 because the realistic certification overran it.
These tests pin the behaviors that keep the artifact green:

- the tiny mesh sweep certifies sharded==single in-process,
- ``PIXELNERF_DRYRUN_FAST=1`` skips the realistic certification,
- an exhausted ``PIXELNERF_DRYRUN_BUDGET`` skips gracefully (prints a
  "skipped (time budget)" line) instead of being killed mid-compile.
"""
import os

import __graft_entry__


def _run(monkeypatch, capsys, **env):
    for k in ("PIXELNERF_DRYRUN_FAST", "PIXELNERF_DRYRUN_FULL",
              "PIXELNERF_DRYRUN_BUDGET"):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    # conftest pins JAX_PLATFORMS=cpu with 8 virtual devices, so n=2 runs
    # in-process (no subprocess re-exec)
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    __graft_entry__.dryrun_multichip(2)
    return capsys.readouterr().out


def test_dryrun_fast_mode_tiny_sweep(monkeypatch, capsys):
    out = _run(monkeypatch, capsys, PIXELNERF_DRYRUN_FAST="1")
    assert out.count("sharded==single ok") == 2  # meshes 1x2 and 2x1
    assert "adam smoke" in out
    assert "realistic" not in out


def test_dryrun_budget_exhaustion_skips_gracefully(monkeypatch, capsys):
    # ~zero budget: the first certification still runs (it is the gate),
    # everything gated on remaining() prints an explicit skip line
    out = _run(monkeypatch, capsys, PIXELNERF_DRYRUN_BUDGET="1")
    assert out.count("sharded==single ok") >= 1
    assert "skipped (time budget" in out
