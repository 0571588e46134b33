"""Quantized KV cache (fp8-e4m3/e5m2, int8) end-to-end.

Reference capability: cache_dtype fp8/fp8_e5m2 (common/config.py:772-782)
+ int8 at kernel level — explicitly unsupported on the reference's TPU
backend (pallas.py:116-117); here it is native.
"""

import json

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_kv")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


def _generate(tiny_dir, **kwargs):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8, **kwargs)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True,
                        logprobs=1)
    return llm.generate(["the quick brown fox jumps over"], sp)[0].outputs[0]


@pytest.mark.parametrize("kv_dtype", ["fp8_e4m3", "fp8_e5m2", "int8"])
def test_kv_quant_generates_close_to_fp32(tiny_dir, kv_dtype, tmp_path):
    base = _generate(tiny_dir)
    kwargs = {}
    if kv_dtype == "int8":
        # int8 KV is only usable with calibrated scales (reference
        # int8_kvcache kernels take k/v scales; scale=1 truncates
        # everything to {-1, 0, 1}). Provide a plausible scale.
        scales = {"kv_cache": {"scaling_factor": {"0": {
            str(i): 0.05 for i in range(2)}}}}
        path = tmp_path / "scales.json"
        path.write_text(json.dumps(scales))
        kwargs["quantization_param_path"] = str(path)
    quant = _generate(tiny_dir, kv_cache_dtype=kv_dtype, **kwargs)
    assert len(quant.token_ids) == 12
    for lp in quant.logprobs:
        for e in lp.values():
            assert np.isfinite(e.logprob)
    # Early tokens should agree with the fp32 cache (quantization noise
    # can flip later tokens on a random tiny model).
    agree = sum(a == b for a, b in zip(base.token_ids, quant.token_ids))
    assert agree >= 4, (base.token_ids, quant.token_ids)


def test_kv_scales_json_loading(tiny_dir, tmp_path):
    scales = {"kv_cache": {"scaling_factor": {"0": {
        str(i): 0.5 for i in range(2)}}}}
    path = tmp_path / "kv_scales.json"
    path.write_text(json.dumps(scales))
    out = _generate(tiny_dir, kv_cache_dtype="int8",
                    quantization_param_path=str(path))
    assert len(out.token_ids) == 12

    # Runner must have picked the scales up.
    llm = LLM(model=tiny_dir, dtype="float32", kv_cache_dtype="int8",
              quantization_param_path=str(path), max_num_seqs=4,
              num_device_blocks_override=64, block_size=8)
    k_s, v_s = llm.engine.runner.kv_scales
    np.testing.assert_allclose(np.asarray(k_s), 0.5)
    np.testing.assert_allclose(np.asarray(v_s), 0.5)
