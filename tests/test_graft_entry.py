"""Driver entry points: single-chip compile check + multi-chip dry run."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (512, 2)


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)  # 4x2 (data, model) mesh


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)  # 1-D data mesh fallback
