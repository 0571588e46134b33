"""Quantization tests: numerics oracles + packed-format roundtrips + e2e.

Mirrors the reference's kernel-vs-native tests (tests/kernels/
test_marlin_gemm.py, test_int8_quant.py, test_fp8_quant.py) and
load-and-generate smokes (tests/quantization/*).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphrodite_tpu.quantization import int4, int8, fp8
from aphrodite_tpu.ops.quant_matmul import (int4p_matmul_pallas,
                                            int4p_matmul_ref,
                                            pack_int4_rows,
                                            unpack_int4_rows)


def _q4_of(c):
    return c["q4"] if "q4" in c else unpack_int4_rows(c["q4p"])
from aphrodite_tpu.quantization.qlinear import dequantize, qmatmul

RNG = np.random.default_rng(42)


def test_int8_quant_roundtrip_error():
    w = RNG.standard_normal((64, 128)).astype(np.float32)
    c = int8.quantize_from_float(w)
    assert c["q"].dtype == np.int8
    wd = np.asarray(dequantize(c, jnp.float32))
    err = np.abs(wd - w).max() / np.abs(w).max()
    assert err < 0.01  # 8-bit per-channel: <1% of range


def test_int8_matmul_matches_dequant():
    w = RNG.standard_normal((64, 128)).astype(np.float32)
    x = RNG.standard_normal((8, 64)).astype(np.float32)
    c = jax.tree.map(jnp.asarray, int8.quantize_from_float(w))
    got = np.asarray(qmatmul(jnp.asarray(x), c))
    want = x @ np.asarray(dequantize(c, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fp8_matmul_close_to_dense():
    w = RNG.standard_normal((64, 128)).astype(np.float32) * 0.1
    x = RNG.standard_normal((8, 64)).astype(np.float32)
    c = jax.tree.map(jnp.asarray, fp8.quantize_from_float(w))
    got = np.asarray(qmatmul(jnp.asarray(x), c))
    want = x @ w
    # W8A8 e4m3: both operands quantized; tolerance is loose.
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.1, rel


def test_int4_quant_roundtrip_error():
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    c = int4.quantize_from_float(w, group=64)
    assert _q4_of(c).min() >= 0 and _q4_of(c).max() <= 15
    wd = np.asarray(dequantize(c, jnp.float32))
    err = np.abs(wd - w).max()
    # 4-bit asymmetric with 64-wide groups: max err ~ scale/2.
    scales = c["scale"]
    assert err <= scales.max() * 0.51 + 1e-6


def test_int4_matmul_matches_dequant():
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    x = RNG.standard_normal((8, 256)).astype(np.float32)
    c = jax.tree.map(jnp.asarray, int4.quantize_from_float(w, group=64))
    got = np.asarray(qmatmul(jnp.asarray(x), c))
    want = x @ np.asarray(dequantize(c, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def _pack_rows_int4(q: np.ndarray) -> np.ndarray:
    """Reference GPTQ row packing (quant_utils.py pack_rows): 8 rows per
    int32, low nibble = first row."""
    K, N = q.shape
    out = np.zeros((K // 8, N), dtype=np.uint32)
    for i in range(8):
        out |= q[i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def _pack_cols_int4(q: np.ndarray) -> np.ndarray:
    """Column packing: 8 cols per int32, low nibble = first col."""
    K, N = q.shape
    out = np.zeros((K, N // 8), dtype=np.uint32)
    for i in range(8):
        out |= q[:, i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def test_gptq_unpack_roundtrip():
    K, N, G = 64, 32, 16
    q = RNG.integers(0, 16, size=(K, N)).astype(np.uint8)
    zeros = RNG.integers(1, 15, size=(K // G, N)).astype(np.uint8)
    scales = (RNG.random((K // G, N)).astype(np.float32) + 0.1)
    qweight = _pack_rows_int4(q)
    qzeros = _pack_cols_int4(zeros - 1)  # AutoGPTQ stores zero-1
    c = int4.load_gptq_tensors(qweight, qzeros, scales)
    np.testing.assert_array_equal(_q4_of(c), q)
    np.testing.assert_array_equal(c["zero"], zeros.astype(np.float32))
    np.testing.assert_allclose(c["scale"], scales)


def test_awq_unpack_roundtrip():
    K, N, G = 32, 64, 16
    q = RNG.integers(0, 16, size=(K, N)).astype(np.uint8)
    zeros = RNG.integers(0, 16, size=(K // G, N)).astype(np.uint8)
    scales = (RNG.random((K // G, N)).astype(np.float32) + 0.1)
    interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])

    def awq_pack(arr):
        il = arr.reshape(-1, 8)[:, interleave].ravel().reshape(arr.shape)
        return _pack_cols_int4(il)

    c = int4.load_awq_tensors(awq_pack(q), awq_pack(zeros), scales)
    np.testing.assert_array_equal(_q4_of(c), q)
    np.testing.assert_array_equal(c["zero"], zeros.astype(np.float32))


@pytest.mark.parametrize("method", ["int8", "fp8"])
def test_e2e_quantized_generation(tiny_llama_dir, method):
    """Quantized engine must generate and stay close to the dense engine
    (token-level agreement is not guaranteed on a random tiny model, but
    the run must be finite and produce the full token budget)."""
    from aphrodite_tpu import LLM, SamplingParams

    llm = LLM(model=tiny_llama_dir, dtype="float32", quantization=method,
              max_num_seqs=4, num_device_blocks_override=64, block_size=8)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        logprobs=1)
    out = llm.generate(["the quick brown fox"], sp)[0].outputs[0]
    assert len(out.token_ids) == 8
    for lp in out.logprobs:
        for e in lp.values():
            assert np.isfinite(e.logprob)


def test_e2e_int4_dummy_weights(tiny_llama_dir):
    """GPTQ-style int4 via runtime quantization of the tiny checkpoint."""
    from aphrodite_tpu import LLM, SamplingParams

    llm = LLM(model=tiny_llama_dir, dtype="float32", quantization="gptq",
              max_num_seqs=4, num_device_blocks_override=64, block_size=8)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate(["hello world"], sp)[0].outputs[0]
    assert len(out.token_ids) == 8


# ---------------------------------------------------------------------------
# Packed (2 nibbles per byte) int4
# ---------------------------------------------------------------------------


def test_pack_unpack_int4_roundtrip():
    q = RNG.integers(0, 16, size=(3, 256, 64)).astype(np.int8)
    p = pack_int4_rows(q)
    assert p.shape == (3, 128, 64) and p.dtype == np.int8
    np.testing.assert_array_equal(unpack_int4_rows(p), q)


def test_quantize_from_float_emits_packed():
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    c = int4.quantize_from_float(w, group=64)
    assert "q4p" in c and c["q4p"].shape == (128, 128)
    # dequantize() and qmatmul() consume the packed form directly.
    wd = np.asarray(dequantize(jax.tree.map(jnp.asarray, c), jnp.float32))
    assert np.abs(wd - w).max() <= c["scale"].max() * 0.51 + 1e-6
    x = RNG.standard_normal((8, 256)).astype(np.float32)
    got = np.asarray(qmatmul(jnp.asarray(x),
                             jax.tree.map(jnp.asarray, c)))
    np.testing.assert_allclose(got, x @ wd, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("T", [32, 512])  # groupwise (decode) vs dense body
def test_int4p_pallas_kernel_matches_ref(T):
    K, N, G = 512, 256, 64
    w = RNG.standard_normal((K, N)).astype(np.float32)
    c = int4.quantize_from_float(w, group=G)
    assert "q4p" in c
    x = (RNG.standard_normal((T, K)) * 0.3).astype(np.float32)
    q4p, scale, zero = (jnp.asarray(c["q4p"]), jnp.asarray(c["scale"]),
                        jnp.asarray(c["zero"]))
    xj = jnp.asarray(x)
    want = np.asarray(int4p_matmul_ref(xj, q4p, scale, zero, G))
    got = np.asarray(int4p_matmul_pallas(xj, q4p, scale, zero, G,
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_int4p_pallas_kernel_multi_ktile():
    # Force several k grid steps so the scale-row offsets are exercised.
    T, K, N, G = 32, 1024, 128, 64
    w = RNG.standard_normal((K, N)).astype(np.float32)
    c = int4.quantize_from_float(w, group=G)
    x = (RNG.standard_normal((T, K)) * 0.3).astype(np.float32)
    q4p, scale, zero = (jnp.asarray(c["q4p"]), jnp.asarray(c["scale"]),
                        jnp.asarray(c["zero"]))
    xj = jnp.asarray(x)
    want = np.asarray(int4p_matmul_ref(xj, q4p, scale, zero, G))
    got = np.asarray(int4p_matmul_pallas(xj, q4p, scale, zero, G,
                                         block_kp=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("T", [64, 256])  # groupwise and dense bodies
def test_int4_stacked_kernel_matches_per_layer(T):
    """Layer-stacked UNPACKED grouped kernel (gguf q6/q8/iq containers
    in scanned models): the scalar-prefetched layer index must select
    the right layer and any int8 value range must decode exactly."""
    from aphrodite_tpu.ops.quant_matmul import (int4_matmul_pallas_stacked,
                                                int4_matmul_ref)

    L, K, N, G = 3, 512, 256, 16
    q = jnp.asarray(RNG.integers(-64, 64, size=(L, K, N)), jnp.int8)
    scale = jnp.asarray(
        RNG.random((L, K // G, N)).astype(np.float32) * 0.02 + 1e-3)
    zero = jnp.asarray(
        RNG.integers(0, 32, size=(L, K // G, N)).astype(np.float32))
    x = jnp.asarray((RNG.standard_normal((T, K)) * 0.3), jnp.float32)
    for lidx in range(L):
        want = np.asarray(int4_matmul_ref(x, q[lidx], scale[lidx],
                                          zero[lidx], G))
        got = np.asarray(int4_matmul_pallas_stacked(
            x, q, scale, zero, G, layer_idx=lidx, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=f"layer {lidx} T={T}")


@pytest.mark.parametrize("T", [16, 128])
def test_w4a8_kernel_matches_ref(T):
    """The int8-activation packed kernel (int8 x int8 MXU dots +
    per-group rank-1 fixups) reproduces the exact-dequant w4a8 oracle
    (interpret mode; on-device validation in tools/tpu_kernel_smoke)."""
    from aphrodite_tpu.ops.quant_matmul import (int4p_matmul_w4a8_pallas,
                                                int4p_matmul_w4a8_ref,
                                                pack_int4_rows)

    rng = np.random.default_rng(11)
    K, N, G = 512, 256, 128
    x = jnp.asarray(rng.standard_normal((T, K)) * 0.3, jnp.float32)
    q4 = rng.integers(0, 16, size=(K, N), dtype=np.int8)
    q4p = jnp.asarray(pack_int4_rows(q4))
    s = jnp.asarray(rng.random((K // G, N)) * 0.02 + 0.001, jnp.float32)
    z = jnp.asarray(rng.integers(0, 16, size=(K // G, N)), jnp.float32)
    got = np.asarray(int4p_matmul_w4a8_pallas(x, q4p, s, z, G,
                                              interpret=True))
    want = np.asarray(int4p_matmul_w4a8_ref(x, q4p, s, z, G))
    scale_ref = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale_ref < 1e-5


def test_w4a8_quantization_error_bounded():
    """w4a8 vs w4a16 numerics: per-token symmetric a8 stays within
    ~1% relative of the a16 result at activation scales typical of
    normed hidden states."""
    from aphrodite_tpu.ops.quant_matmul import (int4p_matmul_ref,
                                                int4p_matmul_w4a8_ref,
                                                pack_int4_rows)

    rng = np.random.default_rng(12)
    T, K, N, G = 32, 1024, 512, 128
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    q4 = rng.integers(0, 16, size=(K, N), dtype=np.int8)
    q4p = jnp.asarray(pack_int4_rows(q4))
    s = jnp.asarray(rng.random((K // G, N)) * 0.02 + 0.001, jnp.float32)
    z = jnp.asarray(rng.integers(0, 16, size=(K // G, N)), jnp.float32)
    a16 = np.asarray(int4p_matmul_ref(x, q4p, s, z, G))
    a8 = np.asarray(int4p_matmul_w4a8_ref(x, q4p, s, z, G))
    rel = np.abs(a8 - a16).max() / (np.abs(a16).max() + 1e-9)
    assert rel < 0.02, rel


def test_experts_int8_mixtral_close(tmp_path):
    """experts_int8 (reference quantization/experts_int8.py): MoE
    expert stacks quantize to int8 containers at load; generation
    stays close to the f32 engine and the expert leaves are int8."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    kw = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=128,
              tie_word_embeddings=False, num_local_experts=4,
              num_experts_per_tok=2)
    model_dir = str(tmp_path / "mixtral8")
    make_tiny_checkpoint(model_dir, tf.MixtralConfig(**kw))

    from aphrodite_tpu import LLM, SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    base = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    prompt = base.get_tokenizer().encode("the quick brown fox")
    expect = base.generate(prompt_token_ids=[prompt],
                           sampling_params=sp)[0].outputs[0].token_ids
    del base

    qllm = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               quantization="experts_int8")
    layers = qllm.engine.runner.params["layers"]
    w1 = layers["w1"]
    assert isinstance(w1, dict) and str(w1["q"].dtype) == "int8"
    # Everything non-expert stays dense (attention may be fused qkv).
    for k, v in layers.items():
        if k not in ("w1", "w2", "w3"):
            assert not isinstance(v, dict), k
    got = qllm.generate(prompt_token_ids=[prompt],
                        sampling_params=sp)[0].outputs[0].token_ids
    agree = sum(a == b for a, b in zip(got, expect))
    assert agree >= 9, (got, expect)


def test_eetq_aliases_int8(tmp_path):
    """eetq = int8 weight-only quantized at load (reference eetq.py);
    token-identical to quantization='int8'."""
    from tests.utils import make_tiny_llama_checkpoint

    model_dir = str(tmp_path / "tl")
    make_tiny_llama_checkpoint(model_dir)
    from aphrodite_tpu import LLM, SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    a = LLM(model=model_dir, dtype="float32", max_num_seqs=2,
            num_device_blocks_override=64, block_size=8,
            quantization="int8")
    prompt = a.get_tokenizer().encode("hello world")
    expect = a.generate(prompt_token_ids=[prompt],
                        sampling_params=sp)[0].outputs[0].token_ids
    del a
    b = LLM(model=model_dir, dtype="float32", max_num_seqs=2,
            num_device_blocks_override=64, block_size=8,
            quantization="eetq")
    got = b.generate(prompt_token_ids=[prompt],
                     sampling_params=sp)[0].outputs[0].token_ids
    assert got == expect


def test_modelopt_fp8_checkpoint(tmp_path):
    """ModelOpt FP8 checkpoints (fp8_e4m3 weights + per-tensor
    weight_scale + static input_scale): dequantize at load and serve
    through the fp8 W8A8 path; close to the f32 baseline."""
    import json
    import os
    import shutil

    import ml_dtypes
    import safetensors.numpy as stnp

    from aphrodite_tpu.loader.weights import safetensors_weight_iterator
    from tests.utils import make_tiny_llama_checkpoint

    src = str(tmp_path / "f32src")
    make_tiny_llama_checkpoint(src)
    dst = str(tmp_path / "modelopt")
    shutil.copytree(src, dst)
    tensors = {}
    for name, arr in safetensors_weight_iterator(src):
        w = np.asarray(arr, np.float32)
        is_proj = (name.endswith(".weight") and w.ndim == 2
                   and ("self_attn" in name or "mlp" in name))
        if not is_proj:
            tensors[name] = w
            continue
        scale = float(np.abs(w).max() / 448.0 + 1e-12)
        wq = (w / scale).astype(ml_dtypes.float8_e4m3fn)
        tensors[name] = wq
        tensors[name + "_scale"] = np.asarray(scale, np.float32)
        tensors[name[:-len(".weight")] + ".input_scale"] = np.asarray(
            1.0, np.float32)
    stnp.save_file(tensors, os.path.join(dst, "model.safetensors"))
    cfg_path = os.path.join(dst, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {"quant_method": "modelopt"}
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    # Exact oracle: a twin checkpoint holding the DEQUANTIZED dense
    # weights served through the same fp8 W8A8 runtime path must be
    # token-identical (isolates the modelopt format parsing from fp8
    # numerics).
    from aphrodite_tpu.loader.bnb import modelopt_dequant_iterator

    twin = str(tmp_path / "twin")
    shutil.copytree(src, twin)
    stnp.save_file(
        {k: np.ascontiguousarray(np.asarray(v, np.float32))
         for k, v in modelopt_dequant_iterator(dst)},
        os.path.join(twin, "model.safetensors"))

    from aphrodite_tpu import LLM, SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    base = LLM(model=twin, dtype="float32", max_num_seqs=2,
               num_device_blocks_override=64, block_size=8,
               quantization="fp8")
    prompt = base.get_tokenizer().encode("the quick brown fox")
    expect = base.generate(prompt_token_ids=[prompt],
                           sampling_params=sp)[0].outputs[0].token_ids
    del base
    q = LLM(model=dst, dtype="float32", max_num_seqs=2,
            num_device_blocks_override=64, block_size=8)
    assert q.engine.model_config.quantization == "modelopt"
    got = q.generate(prompt_token_ids=[prompt],
                     sampling_params=sp)[0].outputs[0].token_ids
    assert got == expect


def test_deepspeedfp_side_config(tmp_path):
    """DeepSpeedFP: quant_config.json {bits, group_size} beside a
    normal checkpoint -> fpX rounding at load (capability of the
    reference's load-time quantizer); engine output close to f32."""
    import json
    import os
    import shutil

    from tests.utils import make_tiny_llama_checkpoint

    src = str(tmp_path / "f32ds")
    make_tiny_llama_checkpoint(src)
    dst = str(tmp_path / "ds")
    shutil.copytree(src, dst)
    with open(os.path.join(dst, "quant_config.json"), "w") as f:
        json.dump({"bits": 8, "group_size": 64}, f)

    from aphrodite_tpu import LLM, SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    base = LLM(model=src, dtype="float32", max_num_seqs=2,
               num_device_blocks_override=64, block_size=8)
    prompt = base.get_tokenizer().encode("hello world this is")
    expect = base.generate(prompt_token_ids=[prompt],
                           sampling_params=sp)[0].outputs[0].token_ids
    del base
    q = LLM(model=dst, dtype="float32", max_num_seqs=2,
            num_device_blocks_override=64, block_size=8)
    assert q.engine.model_config.quantization == "deepspeedfp"
    got = q.generate(prompt_token_ids=[prompt],
                     sampling_params=sp)[0].outputs[0].token_ids
    agree = sum(a == b for a, b in zip(got, expect))
    assert agree >= 9, (got, expect)
