"""Molmo engine tests vs composed oracles.

Exactness bar: the ViT backbone (two-layer feature concat, pad-embed
adjustment, 2x2 attention pooling, SwiGLU projector) matches a torch
composition of the reference math, and greedy generation matches HF
Qwen2 (Molmo-7B-D's text stack is qwen2-shaped) on renamed weights
with spliced image features."""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.test_model_zoo_remote import _save_renamed
from tests.utils import make_tiny_checkpoint

IMG = 250
T_HID = 64
V_E = 32
V_HEADS = 2
V_LAYERS = 10  # needs >= 9 for the [-2, -9] feature taps
GRID = 4  # image_default_input_size 16 / patch 4
PDIM = 3 * 4 * 4
POOLED = 4  # (4/2)^2
I_HALF = 64  # text intermediate (actual, declared at 2x)


def _qwen2_cfg():
    import transformers as tf

    return tf.Qwen2Config(
        vocab_size=256, hidden_size=T_HID, intermediate_size=I_HALF,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False, rope_theta=10000.0,
        use_sliding_window=False)


def _vision_cfg():
    return dict(image_emb_dim=V_E, image_num_layers=V_LAYERS,
                image_num_heads=V_HEADS, image_mlp_dim=64,
                image_patch_size=4, image_num_pos=GRID * GRID + 1,
                image_norm_eps=1e-5,
                image_default_input_size=[16, 16])


@pytest.fixture(scope="module")
def molmo_dir(tmp_path_factory):
    import torch

    base = str(tmp_path_factory.mktemp("qwen2_base"))
    make_tiny_checkpoint(base, _qwen2_cfg())

    def transform(tensors):
        out = dict(tensors)
        emb = out.pop("model.embed_tokens.weight")
        out["model.transformer.wte.embedding"] = emb
        out["model.transformer.wte.new_embedding"] = \
            np.zeros((128, T_HID), np.float32)
        for i in range(2):
            p = f"model.layers.{i}.self_attn"
            out[f"model.transformer.blocks.{i}.att_proj.weight"] = \
                np.concatenate([out.pop(f"{p}.q_proj.weight"),
                                out.pop(f"{p}.k_proj.weight"),
                                out.pop(f"{p}.v_proj.weight")], axis=0)
            out[f"model.transformer.blocks.{i}.att_proj.bias"] = \
                np.concatenate([out.pop(f"{p}.q_proj.bias"),
                                out.pop(f"{p}.k_proj.bias"),
                                out.pop(f"{p}.v_proj.bias")], axis=0)
            m = f"model.layers.{i}.mlp"
            # ff_proj packs [up; gate].
            out[f"model.transformer.blocks.{i}.ff_proj.weight"] = \
                np.concatenate([out.pop(f"{m}.up_proj.weight"),
                                out.pop(f"{m}.gate_proj.weight")], axis=0)
            out[f"model.transformer.blocks.{i}.ff_out.weight"] = \
                out.pop(f"{m}.down_proj.weight")
        # Vision backbone weights.
        g = torch.Generator().manual_seed(9)

        def rn(*shape, scale=0.1):
            return (torch.randn(*shape, generator=g) * scale).numpy()

        vb = "vision_backbone."
        out[vb + "image_vit.class_embedding"] = rn(V_E)
        out[vb + "image_vit.positional_embedding"] = rn(GRID * GRID + 1,
                                                        V_E)
        out[vb + "image_vit.patch_embedding.weight"] = rn(V_E, PDIM)
        out[vb + "image_vit.pre_ln.weight"] = np.ones(V_E, np.float32)
        out[vb + "image_vit.pre_ln.bias"] = np.zeros(V_E, np.float32)
        for i in range(V_LAYERS):
            rb = f"{vb}image_vit.transformer.resblocks.{i}."
            for n, shp in [("attention.wq", (V_E, V_E)),
                           ("attention.wk", (V_E, V_E)),
                           ("attention.wv", (V_E, V_E)),
                           ("attention.wo", (V_E, V_E)),
                           ("feed_forward.w1", (64, V_E)),
                           ("feed_forward.w2", (V_E, 64))]:
                out[rb + n + ".weight"] = rn(*shp)
                out[rb + n + ".bias"] = rn(shp[0])
            for n in ("attention_norm", "ffn_norm"):
                out[rb + n + ".weight"] = np.ones(V_E, np.float32)
                out[rb + n + ".bias"] = np.zeros(V_E, np.float32)
        out[vb + "pad_embed"] = rn(2, 2 * V_E)
        for n in ("wq", "wk", "wv"):
            out[vb + f"image_pooling_2d.{n}.weight"] = rn(V_E, 2 * V_E)
            out[vb + f"image_pooling_2d.{n}.bias"] = rn(V_E)
        out[vb + "image_pooling_2d.wo.weight"] = rn(V_E, V_E)
        out[vb + "image_pooling_2d.wo.bias"] = rn(V_E)
        out[vb + "image_projector.w1.weight"] = rn(I_HALF, V_E)
        out[vb + "image_projector.w3.weight"] = rn(I_HALF, V_E)
        out[vb + "image_projector.w2.weight"] = rn(T_HID, I_HALF)
        return out

    def rename(n):
        n = n.replace("model.norm.weight", "model.transformer.ln_f.weight")
        n = n.replace("lm_head.weight", "model.transformer.ff_out.weight")
        n = n.replace(".input_layernorm.weight", ".attn_norm.weight")
        n = n.replace(".post_attention_layernorm.weight",
                      ".ff_norm.weight")
        n = n.replace(".self_attn.o_proj.", ".attn_out.")
        n = n.replace("model.layers.", "model.transformer.blocks.")
        return n

    path = str(tmp_path_factory.mktemp("molmo"))
    _save_renamed(base, path, rename, {
        "architectures": ["MolmoForCausalLM"],
        "model_type": "molmo",
        "intermediate_size": 2 * I_HALF,  # declared at 2x actual
        "layer_norm_eps": 1e-6,
        "layer_norm_type": "rms",
        "qkv_bias": True,
        "norm_after": False,
        "attention_layer_norm": False,
        "weight_tying": False,
        "embedding_size": 256,
        "image_token_index": IMG,
        "vision_config": _vision_cfg(),
    }, tensor_transform=transform)
    return path, base


def make_item(seed, n_crops=2):
    rng = np.random.default_rng(seed)
    masks = np.ones((n_crops, GRID * GRID), np.float32)
    masks[-1, -3:] = 0.0  # some all-pad patches
    masks[-1, -6:-3] = 0.5  # some partial-pad patches
    return {
        "images": rng.standard_normal(
            (n_crops, GRID * GRID, PDIM)).astype(np.float32) * 0.5,
        "image_masks": masks,
    }


def torch_molmo_features(model_dir, item):
    import torch
    import torch.nn.functional as Fn
    from safetensors.torch import load_file

    sd = load_file(os.path.join(model_dir, "model.safetensors"))
    vb = "vision_backbone."
    crops = torch.tensor(item["images"])
    masks = torch.tensor(item["image_masks"])
    B = crops.shape[0]

    def ln(t, pre, dim, eps=1e-5):
        return Fn.layer_norm(t, (dim,), sd[pre + ".weight"],
                             sd[pre + ".bias"], eps)

    with torch.no_grad():
        x = crops @ sd[vb + "image_vit.patch_embedding.weight"].T
        cls = sd[vb + "image_vit.class_embedding"].expand(B, 1, V_E)
        x = torch.cat([cls, x], dim=1)
        x = x + sd[vb + "image_vit.positional_embedding"]
        x = ln(x, vb + "image_vit.pre_ln", V_E)
        D = V_E // V_HEADS
        hiddens = []
        for i in range(V_LAYERS):
            rb = f"{vb}image_vit.transformer.resblocks.{i}."
            h = ln(x, rb + "attention_norm", V_E)
            q = (h @ sd[rb + "attention.wq.weight"].T +
                 sd[rb + "attention.wq.bias"]) / np.sqrt(D)
            k = h @ sd[rb + "attention.wk.weight"].T + \
                sd[rb + "attention.wk.bias"]
            v = h @ sd[rb + "attention.wv.weight"].T + \
                sd[rb + "attention.wv.bias"]
            q = q.reshape(B, -1, V_HEADS, D)
            k = k.reshape(B, -1, V_HEADS, D)
            v = v.reshape(B, -1, V_HEADS, D)
            attn = torch.softmax(
                torch.einsum("bqhd,bkhd->bhqk", q, k), dim=-1)
            o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(
                B, -1, V_E)
            x = x + o @ sd[rb + "attention.wo.weight"].T + \
                sd[rb + "attention.wo.bias"]
            h = ln(x, rb + "ffn_norm", V_E)
            h = h @ sd[rb + "feed_forward.w1.weight"].T + \
                sd[rb + "feed_forward.w1.bias"]
            h = h * torch.sigmoid(1.702 * h)
            x = x + h @ sd[rb + "feed_forward.w2.weight"].T + \
                sd[rb + "feed_forward.w2.bias"]
            hiddens.append(x)
        feats = torch.cat([hiddens[-2], hiddens[-9]], dim=-1)[:, 1:]
        pad = sd[vb + "pad_embed"]
        all_pad = (masks == 0).float()
        partial = ((masks < 1) & (masks > 0)).float()
        feats = feats + pad[0] * all_pad[..., None]
        feats = feats + pad[1] * partial[..., None]
        g = GRID
        feats = feats.reshape(B, g // 2, 2, g // 2, 2, 2 * V_E)
        win = feats.permute(0, 1, 3, 2, 4, 5).reshape(-1, 4, 2 * V_E)
        q_in = win.mean(1, keepdim=True)
        q = (q_in @ sd[vb + "image_pooling_2d.wq.weight"].T +
             sd[vb + "image_pooling_2d.wq.bias"]) / np.sqrt(D)
        k = win @ sd[vb + "image_pooling_2d.wk.weight"].T + \
            sd[vb + "image_pooling_2d.wk.bias"]
        v = win @ sd[vb + "image_pooling_2d.wv.weight"].T + \
            sd[vb + "image_pooling_2d.wv.bias"]
        q = q.reshape(-1, 1, V_HEADS, D)
        k = k.reshape(-1, 4, V_HEADS, D)
        v = v.reshape(-1, 4, V_HEADS, D)
        attn = torch.softmax(
            torch.einsum("bqhd,bkhd->bhqk", q, k), dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, V_E)
        o = o @ sd[vb + "image_pooling_2d.wo.weight"].T + \
            sd[vb + "image_pooling_2d.wo.bias"]
        h = Fn.silu(o @ sd[vb + "image_projector.w1.weight"].T) * \
            (o @ sd[vb + "image_projector.w3.weight"].T)
        out = h @ sd[vb + "image_projector.w2.weight"].T
    return out.reshape(-1, T_HID).numpy()


def test_molmo_features_match_oracle(molmo_dir):
    path, _ = molmo_dir
    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.molmo import MolmoForCausalLM

    mc = ModelConfig(model=path, dtype="float32")
    model = MolmoForCausalLM(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    item = make_item(2)
    got = model.encode_image_item(params, item)
    expect = torch_molmo_features(path, item)
    assert got.shape == expect.shape == (2 * POOLED, T_HID)
    np.testing.assert_allclose(got, expect, rtol=4e-4, atol=4e-4)


def test_molmo_greedy_matches_qwen2_on_spliced_embeds(molmo_dir):
    import torch
    import transformers as tf

    path, base = molmo_dir
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    item = make_item(1)
    n_feat = 2 * POOLED
    prompt_ids = [5, 6, IMG, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": item}}], sp)[0].outputs[0]

    feats = torch.tensor(torch_molmo_features(path, item))
    lm = tf.Qwen2ForCausalLM.from_pretrained(base,
                                             torch_dtype=torch.float32)
    lm.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * n_feat if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        embeds = lm.model.embed_tokens(ids)
        pos = expanded.index(IMG)
        embeds[0, pos:pos + n_feat] = feats
        exp = lm.generate(
            inputs_embeds=embeds, attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0].tolist()
