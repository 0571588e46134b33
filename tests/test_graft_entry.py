"""Validate the driver entry points on the 8-device virtual CPU mesh."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    kv, logits = jax.jit(fn)(*args)
    jax.block_until_ready(logits)
    assert logits.shape[0] == args[2].logits_indices.shape[0]


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
