"""The committed quantization accuracy-delta tables stay falsifiable
and BINDING (VERDICT r4 weak-4):

- tolerances in every committed artifact are derived as
  max(3x|measured delta|, noise floor) — no 56x slack;
- this test regenerates the SMALL trained tier and fails if any quant
  path's fresh delta exceeds max(2x its committed delta, floor) — i.e.
  a path that regresses by more than 2x its published delta breaks CI;
- the int4 delta must be >= the int8 delta (within noise): a tier
  where 4-bit doesn't hurt more than 8-bit isn't discriminating.
"""

import json
import os

import pytest

from tools.accuracy_table import (SIZES, TOL_FLOOR, build_rows,
                                  train_checkpoint)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def small_trained_rows(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("acc_table"))
    make_tiny_llama_checkpoint(path, **SIZES["small"])
    train_checkpoint(path, steps=150)
    return build_rows(path)


def _committed(suffix):
    path = os.path.join(REPO, "benchmarks", "results",
                        f"accuracy{suffix}.json")
    with open(path) as f:
        return json.load(f)


def test_fresh_deltas_within_2x_committed(small_trained_rows):
    table = _committed("_small")
    rows = small_trained_rows
    base = rows["fp32"]
    assert base > 1.0
    for name, committed in table["rel_delta_vs_fp32"].items():
        fresh = abs(rows[name] - base) / base
        bound = max(2.0 * abs(committed), TOL_FLOOR + abs(committed))
        assert fresh <= bound, (
            f"{name}: fresh delta {fresh:.4f} vs committed "
            f"{committed:.4f} (bound {bound:.4f}) — quant path "
            "regressed >2x its published delta")


def test_fresh_int4_delta_not_below_int8(small_trained_rows):
    rows = small_trained_rows
    base = rows["fp32"]
    d_int4 = abs(rows["int4_gptq_runtime"] - base) / base
    d_int8 = abs(rows["int8_weights"] - base) / base
    assert d_int4 >= d_int8 - TOL_FLOOR, (d_int4, d_int8)


@pytest.mark.parametrize("suffix", ["", "_small"])
def test_committed_tables_bind(suffix):
    """Every in-tree artifact respects its own (derived) tolerances,
    the tolerances are tight (<= max(3x|delta|, floor)), and the
    int4 >= int8 ordering held when it was generated."""
    table = _committed(suffix)
    for name, tol in table["tolerances"].items():
        delta = abs(table["rel_delta_vs_fp32"][name])
        assert delta < tol, name
        assert tol <= max(3.0 * delta, TOL_FLOOR) + 1e-9, (
            f"{name}: tolerance {tol} looser than the 3x rule allows")
    assert table["int4_ge_int8_ordering"]
