"""KV-scale calibration toolkit (reference aphrodite/kv_quant/)."""

import json

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_kvcal"))
    make_tiny_llama_checkpoint(path)
    return path


def test_calibrate_export_load_roundtrip(tiny_dir, tmp_path):
    from aphrodite_tpu.loader.weights import load_kv_cache_scales
    from aphrodite_tpu.tools.kv_calibrate import (calibrate_kv_scales,
                                                  export_kv_params,
                                                  observe_kv_absmax)

    llm = LLM(model=tiny_dir, dtype="bfloat16", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    scales = calibrate_kv_scales(
        llm, texts=["the quick brown fox jumps over the lazy dog"])
    num_layers = llm.engine.runner.model.num_layers
    assert set(scales) == set(range(num_layers))
    assert all(s > 0 for s in scales.values())

    # Scale must equal observed absmax / e4m3 max for observed layers.
    obs = observe_kv_absmax(llm)
    amax = np.maximum(obs["k_amax"], obs["v_amax"])
    for layer, s in scales.items():
        if amax[layer] > 0:
            assert s == pytest.approx(float(amax[layer]) / 448.0)

    path = str(tmp_path / "kv_scales.json")
    export_kv_params(scales, path)
    with open(path) as f:
        schema = json.load(f)
    assert "kv_cache" in schema and "scaling_factor" in schema["kv_cache"]

    k_s, v_s = load_kv_cache_scales(tiny_dir, num_layers,
                                    quantization_param_path=path)
    np.testing.assert_allclose(
        k_s, [scales[i] for i in range(num_layers)], rtol=1e-6)
    np.testing.assert_allclose(k_s, v_s)


def test_calibrated_fp8_kv_perplexity_delta(tiny_dir, tmp_path):
    """Serving with calibrated fp8-E4M3 scales keeps teacher-forced
    perplexity close to the full-precision run (the BASELINE.md accuracy
    criterion applied through the calibrate -> serve loop; greedy-exact
    is too strict for random tiny-model near-tie logits)."""
    from aphrodite_tpu.tools.kv_calibrate import (calibrate_kv_scales,
                                                  export_kv_params)
    from aphrodite_tpu.tools.perplexity import evaluate_perplexity

    texts = ["the quick brown fox jumps over the lazy dog and runs on"]
    base = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    ppl_base = evaluate_perplexity(base, texts)

    calib = LLM(model=tiny_dir, dtype="bfloat16", max_num_seqs=4,
                num_device_blocks_override=128, block_size=8)
    scales = calibrate_kv_scales(calib, texts=texts)
    path = str(tmp_path / "scales.json")
    export_kv_params(scales, path)
    del base, calib

    fp8 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              kv_cache_dtype="fp8", quantization_param_path=path)
    ppl_fp8 = evaluate_perplexity(fp8, texts)
    assert abs(ppl_fp8 - ppl_base) / ppl_base < 0.05
