"""Driver interface: entry() compile-check and multichip dry run."""

import sys

sys.path.insert(0, ".")  # repo root for __graft_entry__

import jax
import numpy as np


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
