"""Driver entry points must stay runnable: entry() jits single-device,
dryrun_multichip compiles+runs the full sharded step on the CPU mesh."""

import jax
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    total, bits = out  # flagship bloom probe: survivor total + bitmap
    assert total.shape == (1,)
    assert bits.ndim == 2 and bits.shape[1] >= 16


def test_dryrun_multichip():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs simulated multi-device mesh")
    graft.dryrun_multichip(n)
