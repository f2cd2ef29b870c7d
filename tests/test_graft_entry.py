"""Driver interface: entry() compile-check and multichip dry run."""

import sys

sys.path.insert(0, ".")  # repo root for __graft_entry__

import jax
import numpy as np
import pytest

# Tier: full-model multi-device compiles -- excluded from the fast
# signal tier (pytest -m 'not slow'); the driver also runs the dryrun.
pytestmark = pytest.mark.slow


def test_entry_jits():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert set(out) == {"majority", "max", "top", "multi"}
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)   # asserts finite loss internally


def test_dryrun_multichip_odd():
    import __graft_entry__ as g
    g.dryrun_multichip(5)   # falls back to pure DP


def test_dryrun_multichip_bare_subprocess():
    """Driver-faithful invocation: a bare interpreter with ONE ambient
    device must self-provision the virtual CPU mesh (round-1 failure:
    MULTICHIP_r01.json rc=1 because the entry relied on conftest's mesh).
    """
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"      # parent sees 1 CPU device, not 8
    env.pop("_IPS_DRYRUN_CHILD", None)
    code = ("from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
