"""Driver entry points must stay runnable: entry() jits single-device,
dryrun_multichip compiles+runs the full sharded step on the CPU mesh."""

import jax
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    counts, slot_state, slot_pos = out
    assert counts.shape == (16,)
    assert slot_state.shape == (16, 16)


def test_dryrun_multichip():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs simulated multi-device mesh")
    graft.dryrun_multichip(n)
