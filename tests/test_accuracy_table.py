"""The committed quantization accuracy-delta table stays falsifiable:
regenerate a small instance of tools/accuracy_table.py's measurement
and assert every config's perplexity delta is inside its published
tolerance (BASELINE ppl-delta criterion, synthetic tier)."""

import json
import os

import pytest

from tools.accuracy_table import SIZES, TOLERANCES, build_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def small_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("acc_table"))
    make_tiny_llama_checkpoint(path, **SIZES["small"])
    return path


def test_accuracy_deltas_within_tolerance(small_dir):
    rows = build_rows(small_dir)
    base = rows["fp32"]
    assert base > 1.0
    for name, tol in TOLERANCES.items():
        delta = abs(rows[name] - base) / base
        assert delta < tol, (name, rows[name], base, delta, tol)


def test_committed_table_is_within_tolerance():
    """The artifact in-tree must respect its own tolerances."""
    path = os.path.join(REPO, "benchmarks", "results", "accuracy.json")
    with open(path) as f:
        table = json.load(f)
    for name, tol in table["tolerances"].items():
        assert abs(table["rel_delta_vs_fp32"][name]) < tol, name
