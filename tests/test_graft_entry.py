"""Driver-contract guard: entry() compiles; dryrun_multichip runs the sharded
training + sampling step on the test session's virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8  # conftest forces the virtual mesh
    ge.dryrun_multichip(8)  # asserts finite loss + finite sharded sample


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape  # args = (params, x, t, context)
    assert bool(jnp.isfinite(out).all())
