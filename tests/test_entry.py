"""Driver entry points: single-chip compile and 8-device sharded train step."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] > 0


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    graft.dryrun_multichip(8)
