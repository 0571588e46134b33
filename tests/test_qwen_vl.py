"""Qwen-VL (v1 visual) engine tests vs a composed oracle.

Exactness bar: the OpenCLIP-style visual transformer (per-head
interleaved in_proj, torch-exact bicubic position interpolation) +
256-query attention pool match a torch composition of the reference
math, and greedy generation matches HF Qwen2 (the text stack is
qwen2-identical) fed the same spliced inputs_embeds."""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.test_model_zoo_remote import _save_renamed
from tests.utils import make_tiny_checkpoint

IMG_START = 240
IMG_PAD = 242  # start + 2
V_W = 32  # visual width
V_HEADS = 2
T_HID = 64
NQ = 4  # pool queries (grid 2)
S = 32  # image size; patch 4 -> grid 8
PATCH = 4


def _qwen2_cfg():
    import transformers as tf

    return tf.Qwen2Config(
        vocab_size=256, hidden_size=T_HID, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=128,
        tie_word_embeddings=False, rope_theta=10000.0,
        use_sliding_window=False)


def _visual_cfg():
    return dict(image_size=S, patch_size=PATCH, width=V_W, layers=2,
                heads=V_HEADS, mlp_ratio=2.0, output_dim=T_HID,
                n_queries=NQ, image_start_id=IMG_START)


@pytest.fixture(scope="module")
def qwen_vl_dir(tmp_path_factory):
    import torch

    base = str(tmp_path_factory.mktemp("qwen2_base"))
    make_tiny_checkpoint(base, _qwen2_cfg())

    def transform(tensors):
        out = dict(tensors)
        for i in range(2):
            p = f"model.layers.{i}.self_attn"
            out[f"transformer.h.{i}.attn.c_attn.weight"] = \
                np.concatenate([out.pop(f"{p}.q_proj.weight"),
                                out.pop(f"{p}.k_proj.weight"),
                                out.pop(f"{p}.v_proj.weight")], axis=0)
            out[f"transformer.h.{i}.attn.c_attn.bias"] = \
                np.concatenate([out.pop(f"{p}.q_proj.bias"),
                                out.pop(f"{p}.k_proj.bias"),
                                out.pop(f"{p}.v_proj.bias")], axis=0)
        # Visual tower weights (reference qwen.py VisionTransformer).
        g = torch.Generator().manual_seed(5)

        def rn(*shape, scale=0.1):
            return (torch.randn(*shape, generator=g) * scale).numpy()

        vt = "transformer.visual."
        out[vt + "conv1.weight"] = rn(V_W, 3, PATCH, PATCH)
        out[vt + "positional_embedding"] = rn(256, V_W)  # 16x16 src
        out[vt + "ln_pre.weight"] = np.ones(V_W, np.float32)
        out[vt + "ln_pre.bias"] = np.zeros(V_W, np.float32)
        for i in range(2):
            rb = f"{vt}transformer.resblocks.{i}."
            out[rb + "ln_1.weight"] = np.ones(V_W, np.float32)
            out[rb + "ln_1.bias"] = np.zeros(V_W, np.float32)
            out[rb + "attn.in_proj.weight"] = rn(3 * V_W, V_W)
            out[rb + "attn.in_proj.bias"] = rn(3 * V_W)
            out[rb + "attn.out_proj.weight"] = rn(V_W, V_W)
            out[rb + "attn.out_proj.bias"] = rn(V_W)
            out[rb + "ln_2.weight"] = np.ones(V_W, np.float32)
            out[rb + "ln_2.bias"] = np.zeros(V_W, np.float32)
            out[rb + "mlp.c_fc.weight"] = rn(2 * V_W, V_W)
            out[rb + "mlp.c_fc.bias"] = rn(2 * V_W)
            out[rb + "mlp.c_proj.weight"] = rn(V_W, 2 * V_W)
            out[rb + "mlp.c_proj.bias"] = rn(V_W)
        ap = vt + "attn_pool."
        out[ap + "query"] = rn(NQ, T_HID)
        out[ap + "pos_embed"] = rn(NQ, T_HID)
        out[ap + "kv_proj.weight"] = rn(T_HID, V_W)
        for n in ("ln_q", "ln_kv"):
            out[ap + n + ".weight"] = np.ones(T_HID, np.float32)
            out[ap + n + ".bias"] = np.zeros(T_HID, np.float32)
        out[ap + "attn.in_proj_weight"] = rn(3 * T_HID, T_HID)
        out[ap + "attn.in_proj_bias"] = rn(3 * T_HID)
        out[ap + "attn.out_proj.weight"] = rn(T_HID, T_HID)
        out[ap + "attn.out_proj.bias"] = rn(T_HID)
        out[vt + "ln_post.weight"] = np.ones(T_HID, np.float32)
        out[vt + "ln_post.bias"] = np.zeros(T_HID, np.float32)
        out[vt + "proj"] = rn(T_HID, T_HID)
        return out

    def rename(n):
        n = n.replace("model.embed_tokens.weight",
                      "transformer.wte.weight")
        n = n.replace("model.norm.weight", "transformer.ln_f.weight")
        n = n.replace("model.layers.", "transformer.h.")
        n = n.replace(".input_layernorm.weight", ".ln_1.weight")
        n = n.replace(".post_attention_layernorm.weight", ".ln_2.weight")
        n = n.replace(".self_attn.o_proj.", ".attn.c_proj.")
        n = n.replace(".mlp.gate_proj.", ".mlp.w2.")
        n = n.replace(".mlp.up_proj.", ".mlp.w1.")
        n = n.replace(".mlp.down_proj.", ".mlp.c_proj.")
        return n

    path = str(tmp_path_factory.mktemp("qwen_vl"))
    _save_renamed(base, path, rename, {
        "architectures": ["QWenLMHeadModel"],
        "intermediate_size": 256,  # declared at 2x actual
        "layer_norm_epsilon": 1e-6,
        "rotary_emb_base": 10000.0,
        "seq_length": 128,
        "visual": _visual_cfg(),
    }, tensor_transform=transform)
    return path, base


def make_image(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3, S, S)).astype(np.float32) * 0.5


def torch_visual_features(model_dir, px):
    """Reference VisionTransformer + Resampler2 composition in torch."""
    import torch
    import torch.nn.functional as Fn
    from safetensors.torch import load_file

    sd = load_file(os.path.join(model_dir, "model.safetensors"))
    vt = "transformer.visual."
    g = S // PATCH

    def interp(t, tgt):
        src = int(np.sqrt(t.shape[0]))
        if src == tgt:
            return t
        t4 = t.reshape(1, src, src, -1).permute(0, 3, 1, 2).float()
        t4 = Fn.interpolate(t4, size=(tgt, tgt), mode="bicubic",
                            align_corners=False)
        return t4.permute(0, 2, 3, 1).reshape(tgt * tgt, -1)

    def ln(t, pre, dim):
        return Fn.layer_norm(t, (dim,), sd[pre + ".weight"],
                             sd[pre + ".bias"], 1e-6)

    with torch.no_grad():
        x = Fn.conv2d(torch.tensor(px[None]), sd[vt + "conv1.weight"],
                      stride=PATCH)
        x = x.flatten(2).transpose(1, 2)[0]  # [n, W]
        x = x + interp(sd[vt + "positional_embedding"], g)
        x = ln(x, vt + "ln_pre", V_W)
        D = V_W // V_HEADS
        for i in range(2):
            rb = f"{vt}transformer.resblocks.{i}."
            h = ln(x, rb + "ln_1", V_W)
            mixed = h @ sd[rb + "attn.in_proj.weight"].T + \
                sd[rb + "attn.in_proj.bias"]
            # reference VisualAttention: per-head [q|k|v] interleave.
            mixed = mixed.reshape(-1, V_HEADS, 3 * D)
            q, k, v = mixed.split(D, dim=-1)
            q = q / np.sqrt(D)
            attn = torch.softmax(
                torch.einsum("qhd,khd->hqk", q, k), dim=-1)
            o = torch.einsum("hqk,khd->qhd", attn, v).reshape(-1, V_W)
            x = x + o @ sd[rb + "attn.out_proj.weight"].T + \
                sd[rb + "attn.out_proj.bias"]
            h = ln(x, rb + "ln_2", V_W)
            h = Fn.gelu(h @ sd[rb + "mlp.c_fc.weight"].T +
                        sd[rb + "mlp.c_fc.bias"])
            x = x + h @ sd[rb + "mlp.c_proj.weight"].T + \
                sd[rb + "mlp.c_proj.bias"]
        ap = vt + "attn_pool."
        kv = ln(x @ sd[ap + "kv_proj.weight"].T, ap + "ln_kv", T_HID)
        q = ln(sd[ap + "query"], ap + "ln_q", T_HID) + \
            sd[ap + "pos_embed"]
        keys = kv + interp(sd[ap + "pos_embed"], g)
        attn = torch.nn.MultiheadAttention(T_HID, max(1, T_HID // 128))
        attn.in_proj_weight.data = sd[ap + "attn.in_proj_weight"]
        attn.in_proj_bias.data = sd[ap + "attn.in_proj_bias"]
        attn.out_proj.weight.data = sd[ap + "attn.out_proj.weight"]
        attn.out_proj.bias.data = sd[ap + "attn.out_proj.bias"]
        out = attn(q[:, None], keys[:, None], kv[:, None])[0][:, 0]
        out = ln(out, vt + "ln_post", T_HID) @ sd[vt + "proj"]
    return out.numpy()


def test_qwen_vl_features_match_oracle(qwen_vl_dir):
    path, _ = qwen_vl_dir
    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.qwen import QWenVL
    from aphrodite_tpu.models.registry import get_model_class

    mc = ModelConfig(model=path, dtype="float32")
    assert get_model_class(mc) is QWenVL
    model = QWenVL(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    px = make_image(2)
    got = model.encode_image_item(params, px)
    expect = torch_visual_features(path, px)
    assert got.shape == expect.shape == (NQ, T_HID)
    np.testing.assert_allclose(got, expect, rtol=4e-4, atol=4e-4)


def test_qwen_vl_greedy_matches_qwen2_on_spliced_embeds(qwen_vl_dir):
    import torch
    import transformers as tf

    path, base = qwen_vl_dir
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    px = make_image(1)
    prompt_ids = [5, IMG_START, IMG_PAD, IMG_START + 1, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": px}}], sp)[0].outputs[0]

    feats = torch.tensor(torch_visual_features(path, px))
    lm = tf.Qwen2ForCausalLM.from_pretrained(base,
                                             torch_dtype=torch.float32)
    lm.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG_PAD] * NQ if t == IMG_PAD else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        embeds = lm.model.embed_tokens(ids)
        pos = expanded.index(IMG_PAD)
        embeds[0, pos:pos + NQ] = feats
        exp = lm.generate(
            inputs_embeds=embeds, attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0].tolist()
