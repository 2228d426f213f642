"""The driver-facing multichip dryrun is itself a test: it must pass on
the fake CPU mesh (it asserts bit-exactness of every distributed path)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def test_dryrun_multichip_gate():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__ as g
    step, args = g.entry()
    y = jax.jit(step)(*args)
    jax.block_until_ready(y)
