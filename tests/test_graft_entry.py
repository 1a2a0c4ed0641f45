"""Driver entry points: single-chip jit and multichip dry run must work."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


@pytest.mark.slow
def test_entry_compiles_and_runs():
    fn, (params, batch) = graft.entry()
    loss = jax.jit(fn)(params, batch)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
