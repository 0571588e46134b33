"""MiniCPM-V 2.0 (timm SigLIP ViT + Resampler2) vs a composed oracle.

The tower oracle is a from-scratch torch implementation of the timm
ViT semantics (fused qkv, exact GELU, bicubic-antialias position
resampling for dynamic sizes) + the reference Resampler2 math
(fixed-grid sincos queries, get_abs_pos-interpolated keys, torch
MultiheadAttention); greedy generation with spliced features matches
HF Llama on the same inputs_embeds (muP knobs set neutral so the
MiniCPM text stack reduces to Llama)."""

import json
import math
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 200
PATCH = 4
VSIZE = 16  # timm base grid 4x4
V_HID = 32
V_HEADS = 2
V_FF = 64
V_DEPTH = 3  # drop_vision_last_layer -> 2 used
QNUM = 4    # resampler grid 2x2
T_HID = 64


def _llama_cfg():
    import transformers as tf

    return tf.LlamaConfig(
        vocab_size=256, hidden_size=T_HID, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)


@pytest.fixture(scope="module")
def mcv2_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaForCausalLM

    from aphrodite_tpu.models.minicpmv import _sincos_2d_v20
    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    g = torch.Generator().manual_seed(4)
    E, D = V_HID, T_HID
    sd = {}
    lm = LlamaForCausalLM(_llama_cfg()).float()
    for k, v in lm.state_dict().items():
        sd["llm." + k] = v.contiguous()
    # timm ViT tensors
    sd["vpm.patch_embed.proj.weight"] = torch.randn(
        E, 3, PATCH, PATCH, generator=g) * 0.1
    sd["vpm.patch_embed.proj.bias"] = torch.randn(E, generator=g) * 0.02
    S = VSIZE // PATCH
    sd["vpm.pos_embed"] = torch.randn(1, S * S, E, generator=g) * 0.02
    for i in range(V_DEPTH):
        b = f"vpm.blocks.{i}."
        sd[b + "norm1.weight"] = torch.ones(E)
        sd[b + "norm1.bias"] = torch.zeros(E)
        sd[b + "attn.qkv.weight"] = torch.randn(3 * E, E,
                                                generator=g) * 0.1
        sd[b + "attn.qkv.bias"] = torch.randn(3 * E, generator=g) * 0.02
        sd[b + "attn.proj.weight"] = torch.randn(E, E, generator=g) * 0.1
        sd[b + "attn.proj.bias"] = torch.zeros(E)
        sd[b + "norm2.weight"] = torch.ones(E)
        sd[b + "norm2.bias"] = torch.zeros(E)
        sd[b + "mlp.fc1.weight"] = torch.randn(V_FF, E,
                                               generator=g) * 0.1
        sd[b + "mlp.fc1.bias"] = torch.zeros(V_FF)
        sd[b + "mlp.fc2.weight"] = torch.randn(E, V_FF,
                                               generator=g) * 0.1
        sd[b + "mlp.fc2.bias"] = torch.zeros(E)
    sd["vpm.norm.weight"] = torch.ones(E)
    sd["vpm.norm.bias"] = torch.zeros(E)
    # Resampler2: the stored pos_embed is the fixed 2x2 sincos grid.
    sd["resampler.query"] = torch.randn(QNUM, D, generator=g) * 0.1
    grid = int(math.isqrt(QNUM))
    sd["resampler.pos_embed"] = torch.tensor(
        _sincos_2d_v20(D, grid, grid))
    sd["resampler.kv_proj.weight"] = torch.randn(D, E,
                                                 generator=g) * 0.1
    for n in ("ln_q", "ln_kv", "ln_post"):
        sd[f"resampler.{n}.weight"] = torch.ones(D)
        sd[f"resampler.{n}.bias"] = torch.zeros(D)
    sd["resampler.proj"] = torch.randn(D, D, generator=g) * D**-0.5
    sd["resampler.attn.in_proj_weight"] = torch.randn(
        3 * D, D, generator=g) * 0.1
    sd["resampler.attn.in_proj_bias"] = torch.zeros(3 * D)
    sd["resampler.attn.out_proj.weight"] = torch.randn(
        D, D, generator=g) * 0.1
    sd["resampler.attn.out_proj.bias"] = torch.zeros(D)

    path = str(tmp_path_factory.mktemp("tiny_minicpmv2"))
    save_file(sd, os.path.join(path, "model.safetensors"))
    cfg = json.loads(_llama_cfg().to_json_string())
    cfg.update({
        "architectures": ["MiniCPMV"],
        "model_type": "minicpmv",
        "version": 2.0,
        # Neutral muP: scale_emb 1, residual mult scale_depth/sqrt(L)=1,
        # logit scale dim_model_base/hidden = 1 -> reduces to Llama.
        "scale_emb": 1.0, "scale_depth": math.sqrt(2.0),
        "dim_model_base": T_HID,
        "vision_config": dict(hidden_size=V_HID, intermediate_size=V_FF,
                              num_hidden_layers=V_DEPTH,
                              num_attention_heads=V_HEADS,
                              image_size=VSIZE, patch_size=PATCH),
        "query_num": QNUM,
        "drop_vision_last_layer": True,
        "image_token_index": IMG,
    })
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def make_slice(seed, hw=(16, 16)):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3,) + hw).astype(np.float32) * 0.5


def torch_features(model_dir, px):
    """From-scratch timm-ViT + Resampler2 oracle."""
    import torch
    import torch.nn.functional as F
    from safetensors.torch import load_file

    sd = load_file(os.path.join(model_dir, "model.safetensors"))
    with torch.no_grad():
        x = torch.tensor(px)[None]
        ph, pw = -x.shape[2] % PATCH, -x.shape[3] % PATCH
        x = F.pad(x, (0, pw, 0, ph))  # dynamic_img_pad
        x = F.conv2d(x, sd["vpm.patch_embed.proj.weight"],
                     sd["vpm.patch_embed.proj.bias"], stride=PATCH)
        _, E, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)[0]  # [n, E]
        pos = sd["vpm.pos_embed"][0]
        S = int(math.isqrt(pos.shape[0]))
        if (h, w) != (S, S):
            pos = F.interpolate(
                pos.reshape(1, S, S, E).permute(0, 3, 1, 2),
                size=(h, w), mode="bicubic", align_corners=False,
                antialias=True).permute(0, 2, 3, 1).reshape(h * w, E)
        x = x + pos
        heads = V_HEADS
        dh = E // heads
        for i in range(V_DEPTH - 1):  # drop_vision_last_layer
            b = f"vpm.blocks.{i}."
            hx = F.layer_norm(x, (E,), sd[b + "norm1.weight"],
                              sd[b + "norm1.bias"], 1e-6)
            qkv = hx @ sd[b + "attn.qkv.weight"].T + \
                sd[b + "attn.qkv.bias"]
            q, k, v = qkv.chunk(3, dim=-1)
            q = (q * dh**-0.5).reshape(-1, heads, dh)
            k = k.reshape(-1, heads, dh)
            v = v.reshape(-1, heads, dh)
            a = torch.einsum("qhd,khd->hqk", q, k).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", a, v).reshape(-1, E)
            x = x + o @ sd[b + "attn.proj.weight"].T + \
                sd[b + "attn.proj.bias"]
            hx = F.layer_norm(x, (E,), sd[b + "norm2.weight"],
                              sd[b + "norm2.bias"], 1e-6)
            hx = F.gelu(hx @ sd[b + "mlp.fc1.weight"].T +
                        sd[b + "mlp.fc1.bias"])
            x = x + hx @ sd[b + "mlp.fc2.weight"].T + \
                sd[b + "mlp.fc2.bias"]
        x = F.layer_norm(x, (E,), sd["vpm.norm.weight"],
                         sd["vpm.norm.bias"], 1e-6)
        # Resampler2 (reference resampler.py:248-280).
        D = T_HID

        def ln(t, name):
            return F.layer_norm(t, (D,), sd[f"resampler.{name}.weight"],
                                sd[f"resampler.{name}.bias"], 1e-6)

        kv = ln(x @ sd["resampler.kv_proj.weight"].T, "ln_kv")
        q = ln(sd["resampler.query"], "ln_q")
        rp = sd["resampler.pos_embed"]
        gs = int(math.isqrt(rp.shape[0]))
        kpos = F.interpolate(
            rp.reshape(1, gs, gs, D).permute(0, 3, 1, 2).float(),
            size=(h, w), mode="bicubic",
            align_corners=False).permute(0, 2, 3, 1).reshape(h * w, D)
        attn = torch.nn.MultiheadAttention(D, max(1, D // 128))
        attn.in_proj_weight.data = sd["resampler.attn.in_proj_weight"]
        attn.in_proj_bias.data = sd["resampler.attn.in_proj_bias"]
        attn.out_proj.weight.data = sd["resampler.attn.out_proj.weight"]
        attn.out_proj.bias.data = sd["resampler.attn.out_proj.bias"]
        out = attn((q + rp)[:, None], (kv + kpos)[:, None],
                   kv[:, None])[0][:, 0]
        out = ln(out, "ln_post") @ sd["resampler.proj"]
    return out.numpy()


def test_minicpmv20_features_match_oracle(mcv2_dir):
    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.minicpmv import MiniCPMV2_0
    from aphrodite_tpu.models.registry import get_model_class

    mc = ModelConfig(model=mcv2_dir, dtype="float32")
    assert get_model_class(mc) is MiniCPMV2_0
    model = MiniCPMV2_0(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    # (16,16) = base grid (no resampling); (8,12) and the non-multiple
    # (10,13) exercise dynamic_img_pad + both interpolations.
    for hw in [(16, 16), (8, 12), (10, 13)]:
        px = make_slice(2, hw)
        got = model.encode_image_item(params, px)
        expect = torch_features(mcv2_dir, px)
        assert got.shape == expect.shape == (QNUM, T_HID)
        np.testing.assert_allclose(got, expect, rtol=4e-4, atol=4e-4)


def test_minicpmv20_greedy_matches_composed_hf(mcv2_dir):
    import torch
    from safetensors.torch import load_file
    from transformers import LlamaForCausalLM

    llm = LLM(model=mcv2_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    px = make_slice(1)
    prompt_ids = [5, 6, IMG, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": {"pixel_values": px}}}],
        sp)[0].outputs[0]

    feats = torch.tensor(torch_features(mcv2_dir, px))
    sd = load_file(os.path.join(mcv2_dir, "model.safetensors"))
    lm = LlamaForCausalLM(_llama_cfg()).float()
    lm.load_state_dict({k[4:]: v for k, v in sd.items()
                        if k.startswith("llm.")})
    lm.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * QNUM if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        embeds = lm.model.embed_tokens(ids)
        pos = expanded.index(IMG)
        embeds[0, pos:pos + QNUM] = feats
        exp = lm.generate(
            inputs_embeds=embeds, attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0].tolist()
