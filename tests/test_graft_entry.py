"""The driver's entry points must always compile and run."""

import jax

import __graft_entry__ as graft


def test_entry_compiles():
    fn, args = graft.entry()
    ids, dists = jax.jit(fn)(*args)
    assert ids.shape == (64, 10)
    assert dists.shape == (64, 10)


def test_dryrun_multichip():
    graft.dryrun_multichip(8)
