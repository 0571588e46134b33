"""MiniCPM-V 2.5 engine tests vs a composed HF oracle.

Exactness bar: the navit ViT (Idefics2 layout, bucketized position
ids, dropped last layer) + perceiver resampler (2D sincos keys,
MultiheadAttention math) match a torch composition, and greedy
generation with spliced slice features matches HF Llama on the same
inputs_embeds."""

import json
import math
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 200
PATCH = 4
VSIZE = 32  # patches_per_side = 8
QNUM = 8
V_HID = 32
T_HID = 64  # llama hidden; resampler heads = 64 // 128 -> must be >=1


def _vision_cfg_dict():
    return dict(hidden_size=V_HID, intermediate_size=64,
                num_hidden_layers=3, num_attention_heads=2,
                num_channels=3, image_size=VSIZE, patch_size=PATCH,
                hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
                model_type="idefics2_vision")


def _llama_cfg():
    import transformers as tf

    return tf.LlamaConfig(
        vocab_size=256, hidden_size=T_HID, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)


@pytest.fixture(scope="module")
def minicpmv_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaForCausalLM
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2VisionConfig)
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer)

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    vpm = Idefics2VisionTransformer(
        Idefics2VisionConfig(**_vision_cfg_dict())).float()
    lm = LlamaForCausalLM(_llama_cfg()).float()
    g = torch.Generator().manual_seed(3)
    D = T_HID
    sd = {}
    for k, v in vpm.state_dict().items():
        sd["vpm." + k] = v.contiguous()
    for k, v in lm.state_dict().items():
        sd["llm." + k] = v.contiguous()
    sd["resampler.query"] = torch.randn(QNUM, D, generator=g) * 0.1
    sd["resampler.kv_proj.weight"] = torch.randn(D, V_HID,
                                                 generator=g) * 0.1
    for n in ("ln_q", "ln_kv", "ln_post"):
        sd[f"resampler.{n}.weight"] = torch.ones(D)
        sd[f"resampler.{n}.bias"] = torch.zeros(D)
    sd["resampler.proj"] = torch.randn(D, D, generator=g) * D**-0.5
    sd["resampler.attn.in_proj_weight"] = torch.randn(3 * D, D,
                                                      generator=g) * 0.1
    sd["resampler.attn.in_proj_bias"] = torch.zeros(3 * D)
    sd["resampler.attn.out_proj.weight"] = torch.randn(D, D,
                                                       generator=g) * 0.1
    sd["resampler.attn.out_proj.bias"] = torch.zeros(D)

    path = str(tmp_path_factory.mktemp("tiny_minicpmv"))
    save_file(sd, os.path.join(path, "model.safetensors"))
    cfg = json.loads(_llama_cfg().to_json_string())
    cfg.update({
        "architectures": ["MiniCPMV"],
        "model_type": "minicpmv",
        "version": 2.5,
        "vision_config": _vision_cfg_dict(),
        "query_num": QNUM,
        "drop_vision_last_layer": True,
        "image_token_index": IMG,
    })
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def make_slice(seed, hw=(16, 24)):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3,) + hw).astype(np.float32) * 0.5


def torch_slice_features(model_dir, px):
    import torch
    from safetensors.torch import load_file
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2VisionConfig)
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer)

    from aphrodite_tpu.models.minicpmv import _sincos_2d

    sd = load_file(os.path.join(model_dir, "model.safetensors"))
    vpm = Idefics2VisionTransformer(
        Idefics2VisionConfig(**_vision_cfg_dict())).float()
    vpm.load_state_dict({k[4:]: v for k, v in sd.items()
                         if k.startswith("vpm.")})
    vpm.encoder.layers = vpm.encoder.layers[:-1]  # drop_vision_last_layer
    vpm.eval()
    h, w = px.shape[1] // PATCH, px.shape[2] // PATCH
    with torch.no_grad():
        mask = torch.ones(1, h, w, dtype=torch.bool)
        x = vpm(torch.tensor(px[None]),
                patch_attention_mask=mask).last_hidden_state[0]
        # Resampler (reference Resampler2_5.forward).
        D = T_HID

        def ln(t, name):
            return torch.nn.functional.layer_norm(
                t, (D,), sd[f"resampler.{name}.weight"],
                sd[f"resampler.{name}.bias"], 1e-6)

        kv = ln(x @ sd["resampler.kv_proj.weight"].T, "ln_kv")
        q = ln(sd["resampler.query"], "ln_q")
        pos = torch.tensor(_sincos_2d(D, h, w))
        attn = torch.nn.MultiheadAttention(D, 1)  # max(1, D // 128)
        attn.in_proj_weight.data = sd["resampler.attn.in_proj_weight"]
        attn.in_proj_bias.data = sd["resampler.attn.in_proj_bias"]
        attn.out_proj.weight.data = sd["resampler.attn.out_proj.weight"]
        attn.out_proj.bias.data = sd["resampler.attn.out_proj.bias"]
        out = attn(q[:, None], (kv + pos)[:, None], kv[:, None])[0][:, 0]
        out = ln(out, "ln_post") @ sd["resampler.proj"]
    return out.numpy()


def test_slice_features_match_oracle(minicpmv_dir):
    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.minicpmv import MiniCPMV

    mc = ModelConfig(model=minicpmv_dir, dtype="float32")
    model = MiniCPMV(mc)
    assert model.r_heads == 1  # max(1, hidden // 128) on tiny dims
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    for hw in [(16, 24), (8, 8)]:
        px = make_slice(2, hw)
        got = model.encode_image_item(params, px)
        expect = torch_slice_features(minicpmv_dir, px)
        assert got.shape == expect.shape == (QNUM, T_HID)
        np.testing.assert_allclose(got, expect, rtol=4e-4, atol=4e-4)


def test_minicpmv_greedy_matches_composed_hf(minicpmv_dir):
    import torch
    from safetensors.torch import load_file
    from transformers import LlamaForCausalLM

    llm = LLM(model=minicpmv_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    px = make_slice(1)
    prompt_ids = [5, 6, IMG, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": {"pixel_values": px}}}],
        sp)[0].outputs[0]

    feats = torch.tensor(torch_slice_features(minicpmv_dir, px))
    sd = load_file(os.path.join(minicpmv_dir, "model.safetensors"))
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
