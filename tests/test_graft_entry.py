"""The driver entry points must keep working: entry() compiles and runs on
the test backend; dryrun_multichip exercises the full sharded step on the
virtual 8-device mesh."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    x, S, status = out
    assert x.shape == (8, 64)
    import numpy as np

    assert (np.asarray(status) > 0).all()


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
