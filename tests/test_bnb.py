"""bitsandbytes checkpoint loading tests.

A tiny llama is nf4-quantized into the bnb >=0.42 serialization
(packed nibbles, 64-blocks, double-quantized absmax, JSON quant_state)
and also DEQUANTIZED back into a plain dense checkpoint; the
bnb-loaded engine must match the dense engine token-for-token (the
rounded values are identical, so any format/layout mistake shows up as
a divergence)."""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

NF4 = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0
], np.float32)

TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
           "up_proj", "down_proj")


def _quantize_nf4(w: np.ndarray, blocksize=64, nested=256):
    """bnb-style nf4 quantization -> (packed, side tensors, rounded)."""
    shape = w.shape
    flat = w.reshape(-1).astype(np.float32)
    n = flat.size
    pad = -n % blocksize
    padded = np.pad(flat, (0, pad))
    blocks = padded.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    absmax = np.maximum(absmax, 1e-8)
    normed = blocks / absmax[:, None]
    codes = np.abs(normed[..., None] - NF4[None, None]).argmin(-1)
    # Double-quantize absmax: uint8 codes into a 256-entry linear map.
    offset = np.float32(absmax.mean())
    centered = absmax - offset
    npad = -centered.size % nested
    cpad = np.pad(centered, (0, npad))
    am2 = np.abs(cpad.reshape(-1, nested)).max(axis=1)
    am2 = np.maximum(am2, 1e-8)
    nested_map = np.linspace(-1, 1, 256).astype(np.float32)
    cn = cpad.reshape(-1, nested) / am2[:, None]
    codes8 = np.abs(cn[..., None] - nested_map[None, None]).argmin(-1)
    codes8 = codes8.reshape(-1)[:absmax.size].astype(np.uint8)
    # Rounded-back values (what the loader must reproduce exactly).
    absmax_deq = (nested_map[codes8.astype(np.int64)] *
                  np.repeat(am2, nested)[:absmax.size] + offset)
    rounded = (NF4[codes] * absmax_deq[:, None]).reshape(-1)[:n].reshape(
        shape).astype(np.float32)
    # Pack two codes per byte, first element in the HIGH nibble.
    cflat = codes.reshape(-1)[:n].astype(np.uint8)
    if cflat.size % 2:
        cflat = np.pad(cflat, (0, 1))
    packed = ((cflat[0::2] << 4) | cflat[1::2]).reshape(-1, 1)
    meta = {"quant_type": "nf4", "blocksize": blocksize,
            "dtype": "bfloat16", "shape": list(shape),
            "nested_blocksize": nested, "nested_dtype": "float32",
            "nested_offset": float(offset)}
    qs = np.frombuffer(json.dumps(meta).encode(), np.uint8).copy()
    side = {
        ".absmax": codes8,
        ".quant_map": NF4,
        ".nested_absmax": am2.astype(np.float32),
        ".nested_quant_map": nested_map,
        ".quant_state.bitsandbytes__nf4": qs,
    }
    return packed.astype(np.uint8), side, rounded


@pytest.fixture(scope="module")
def bnb_dirs(tmp_path_factory):
    from safetensors.numpy import save_file

    from tests.utils import make_tiny_llama_checkpoint

    dense_dir = str(tmp_path_factory.mktemp("tiny_dense"))
    make_tiny_llama_checkpoint(dense_dir)
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    tensors = dict(safetensors_weight_iterator(dense_dir))
    bnb_tensors = {}
    rounded_tensors = {}
    n_q = 0
    for name, arr in tensors.items():
        if any(t in name for t in TARGETS) and name.endswith(".weight"):
            packed, side, rounded = _quantize_nf4(np.asarray(arr))
            bnb_tensors[name] = packed
            for sfx, v in side.items():
                bnb_tensors[name + sfx] = v
            rounded_tensors[name] = rounded
            n_q += 1
        else:
            bnb_tensors[name] = np.asarray(arr)
            rounded_tensors[name] = np.asarray(arr)
    assert n_q == 2 * 7  # 2 layers x 7 target modules

    import shutil
    bnb_dir = str(tmp_path_factory.mktemp("tiny_bnb"))
    round_dir = str(tmp_path_factory.mktemp("tiny_rounded"))
    for d, t in ((bnb_dir, bnb_tensors), (round_dir, rounded_tensors)):
        save_file(t, os.path.join(d, "model.safetensors"))
        for fn in os.listdir(dense_dir):
            if not fn.endswith(".safetensors"):
                shutil.copy(os.path.join(dense_dir, fn),
                            os.path.join(d, fn))
    with open(os.path.join(bnb_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "bitsandbytes", "load_in_4bit": True,
        "bnb_4bit_quant_type": "nf4", "bnb_4bit_use_double_quant": True,
    }
    with open(os.path.join(bnb_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    return bnb_dir, round_dir


def test_bnb_nf4_matches_rounded_dense(bnb_dirs):
    bnb_dir, round_dir = bnb_dirs
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = ["the quick brown fox", "one two three four"]
    dense = LLM(model=round_dir, dtype="float32", max_num_seqs=4,
                num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in dense.generate(prompts, sp)]
    del dense

    bnb = LLM(model=bnb_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    assert bnb.engine.model_config.quantization == "bitsandbytes"
    got = [o.outputs[0].token_ids for o in bnb.generate(prompts, sp)]
    assert got == expect


def test_squeezellm_matches_rounded_dense(tmp_path):
    """SqueezeLLM LUT checkpoint == its dequantized dense twin."""
    import shutil

    from safetensors.numpy import save_file

    from aphrodite_tpu.loader.weights import safetensors_weight_iterator
    from tests.utils import make_tiny_llama_checkpoint

    dense_dir = str(tmp_path / "dense")
    make_tiny_llama_checkpoint(dense_dir)
    tensors = dict(safetensors_weight_iterator(dense_dir))
    sq_tensors, rounded = {}, {}
    rng = np.random.default_rng(0)
    for name, arr in tensors.items():
        if any(t in name for t in TARGETS) and name.endswith(".weight"):
            w = np.asarray(arr, np.float32)  # [out, in]
            out_d, in_d = w.shape
            # Per-channel 16-entry LUT: quantiles of the row.
            lut = np.ascontiguousarray(
                np.quantile(w, np.linspace(0, 1, 16), axis=1).T
            ).astype(np.float32)  # [out, 16]
            codes = np.abs(w[:, :, None] - lut[:, None, :]).argmin(-1)
            wr = np.take_along_axis(lut, codes, axis=1)  # rounded [out, in]
            # Pack [in, out] codes, 8 per int32, low nibble first.
            c = codes.T.astype(np.uint32)  # [in, out]
            c = c.reshape(in_d // 8, 8, out_d)
            packed = np.zeros((in_d // 8, out_d), np.uint32)
            for j in range(8):
                packed |= c[:, j, :] << np.uint32(4 * j)
            base = name[:-len(".weight")]
            sq_tensors[base + ".qweight"] = np.ascontiguousarray(
                packed.astype(np.int32))
            sq_tensors[base + ".lookup_table"] = lut
            rounded[name] = wr.astype(np.float32)
        else:
            sq_tensors[name] = np.asarray(arr)
            rounded[name] = np.asarray(arr)

    sq_dir = str(tmp_path / "sq")
    round_dir = str(tmp_path / "round")
    for d, t in ((sq_dir, sq_tensors), (round_dir, rounded)):
        import os as _os
        _os.makedirs(d, exist_ok=True)
        save_file(t, _os.path.join(d, "model.safetensors"))
        for fn in _os.listdir(dense_dir):
            if not fn.endswith(".safetensors"):
                shutil.copy(_os.path.join(dense_dir, fn),
                            _os.path.join(d, fn))
    with open(f"{sq_dir}/quant_config.json", "w") as f:
        json.dump({"wbits": 4}, f)

    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = ["the quick brown fox"]
    dense = LLM(model=round_dir, dtype="float32", max_num_seqs=4,
                num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in dense.generate(prompts, sp)]
    del dense
    sq = LLM(model=sq_dir, dtype="float32", max_num_seqs=4,
             num_device_blocks_override=128, block_size=8)
    assert sq.engine.model_config.quantization == "squeezellm"
    got = [o.outputs[0].token_ids for o in sq.generate(prompts, sp)]
    assert got == expect


def test_aqlm_matches_reference_torch_dequant(tmp_path):
    """AQLM: random codes/codebooks/scales dequantized by the
    REFERENCE torch math (F.embedding_bag sum) build the dense twin;
    the aqlm-loaded engine must match it exactly."""
    import shutil

    import torch
    import torch.nn.functional as Fn
    from safetensors.numpy import save_file

    from aphrodite_tpu.loader.weights import safetensors_weight_iterator
    from tests.utils import make_tiny_llama_checkpoint

    NBITS, NCB, CBS, OGS, IGS = 8, 2, 256, 1, 8

    def torch_dequant(codes, codebooks, scales):
        # Port of reference aqlm.py:34 dequantize_weight.
        og, ig, ncb = codes.shape
        _, _, ogs, igs = codebooks.shape
        offsets = torch.arange(0, ncb * CBS, CBS)
        flat = Fn.embedding_bag(
            codes.flatten(0, -2) + offsets,
            codebooks.flatten(0, 1).flatten(-2, -1), mode="sum")
        w = flat.view(og, ig, ogs, igs) * scales
        return w.swapaxes(-3, -2).reshape(og * ogs, ig * igs)

    dense_dir = str(tmp_path / "dense")
    make_tiny_llama_checkpoint(dense_dir)
    tensors = dict(safetensors_weight_iterator(dense_dir))
    aq, rounded = {}, {}
    g = torch.Generator().manual_seed(4)
    for name, arr in tensors.items():
        if any(t in name for t in TARGETS) and name.endswith(".weight"):
            out_d, in_d = np.asarray(arr).shape
            codes = torch.randint(0, CBS, (out_d // OGS, in_d // IGS,
                                           NCB), generator=g)
            cbs = torch.randn(NCB, CBS, OGS, IGS, generator=g) * 0.02
            scales = torch.rand(out_d // OGS, 1, 1, 1,
                                generator=g) + 0.5
            w = torch_dequant(codes, cbs, scales)
            base = name[:-len(".weight")]
            aq[base + ".codes"] = codes.numpy().astype(np.int16)
            aq[base + ".codebooks"] = cbs.numpy().astype(np.float32)
            aq[base + ".scales"] = scales.numpy().astype(np.float32)
            rounded[name] = w.numpy().astype(np.float32)
        else:
            aq[name] = np.asarray(arr)
            rounded[name] = np.asarray(arr)

    aq_dir = str(tmp_path / "aq")
    round_dir = str(tmp_path / "round")
    for d, t in ((aq_dir, aq), (round_dir, rounded)):
        os.makedirs(d, exist_ok=True)
        save_file(t, os.path.join(d, "model.safetensors"))
        for fn in os.listdir(dense_dir):
            if not fn.endswith(".safetensors"):
                shutil.copy(os.path.join(dense_dir, fn),
                            os.path.join(d, fn))
    with open(os.path.join(aq_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "aqlm", "nbits_per_codebook": NBITS,
        "num_codebooks": NCB, "in_group_size": IGS,
        "out_group_size": OGS}
    with open(os.path.join(aq_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = ["the quick brown fox"]
    dense = LLM(model=round_dir, dtype="float32", max_num_seqs=4,
                num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in dense.generate(prompts, sp)]
    del dense
    aqllm = LLM(model=aq_dir, dtype="float32", max_num_seqs=4,
                num_device_blocks_override=128, block_size=8)
    assert aqllm.engine.model_config.quantization == "aqlm"
    got = [o.outputs[0].token_ids for o in aqllm.generate(prompts, sp)]
    assert got == expect
