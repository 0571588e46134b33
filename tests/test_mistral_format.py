"""mistral-format (consolidated.safetensors + params.json) loading.

The HF-format tiny Pixtral checkpoint is re-serialized the way Mistral
releases ship it — mistral weight names (attention.wq, feed_forward.w1,
tok_embeddings, output), INTERLEAVED rotary q/k layouts, vision_encoder
/ vision_language_adapter towers, params.json with dim/n_layers/... —
and must produce identical greedy tokens, proving the params.json
translation, the name remap, and the interleaved->half-split rope
permutation (both stacks) line up."""

import json
import os
import re

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 256
PATCH = 8


def _inv_rope_permute(w, n_heads):
    """half-split -> interleaved (inverse of the loader's permute)."""
    out_d, in_d = w.shape
    d = out_d // n_heads
    return np.ascontiguousarray(
        w.reshape(n_heads, 2, d // 2, in_d).transpose(0, 2, 1, 3)
        .reshape(out_d, in_d))


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    hf_dir = str(tmp_path_factory.mktemp("tiny_pixtral_hf"))
    mi_dir = str(tmp_path_factory.mktemp("tiny_pixtral_mistral"))
    cfg = tf.LlavaConfig(
        vision_config=dict(model_type="pixtral", hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, head_dim=16,
                           image_size=64, patch_size=PATCH,
                           rope_theta=10000.0),
        text_config=dict(model_type="mistral", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=260, max_position_embeddings=128,
                         tie_word_embeddings=False),
        image_token_index=IMG, vision_feature_layer=-1,
        vision_feature_select_strategy="full",
    )
    torch.manual_seed(0)
    model = tf.LlavaForConditionalGeneration(cfg).to(torch.float32)
    model.save_pretrained(hf_dir, safe_serialization=True)
    make_tiny_tokenizer(hf_dir, vocab_size=260)

    from safetensors.numpy import save_file

    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    out = {}
    for name, arr in safetensors_weight_iterator(hf_dir):
        arr = np.asarray(arr)
        n = name
        if n in ("lm_head.weight", "language_model.lm_head.weight"):
            out["output.weight"] = arr
            continue
        n = n.replace("model.multi_modal_projector.",
                      "multi_modal_projector.", 1)
        n = n.replace("model.vision_tower.", "vision_tower.", 1)
        n = n.replace("model.language_model.", "language_model.model.", 1)
        if n.startswith("multi_modal_projector."):
            sub = n[len("multi_modal_projector."):]
            out["vision_language_adapter." +
                sub.replace("linear_1.", "w_in.")
                .replace("linear_2.", "w_out.")] = arr
            continue
        if n.startswith("vision_tower."):
            v = n[len("vision_tower."):]
            if "attention.q_proj" in v or "attention.k_proj" in v:
                arr = _inv_rope_permute(arr, 2)
            v = (v.replace("attention.q_proj.", "attention.wq.")
                 .replace("attention.k_proj.", "attention.wk.")
                 .replace("attention.v_proj.", "attention.wv.")
                 .replace("attention.o_proj.", "attention.wo.")
                 .replace("feed_forward.gate_proj.", "feed_forward.w1.")
                 .replace("feed_forward.down_proj.", "feed_forward.w2.")
                 .replace("feed_forward.up_proj.", "feed_forward.w3."))
            out["vision_encoder." + v] = arr
            continue
        if n.startswith("language_model.model."):
            t = n[len("language_model.model."):]
            if "self_attn.q_proj" in t:
                arr = _inv_rope_permute(arr, 4)
            elif "self_attn.k_proj" in t:
                arr = _inv_rope_permute(arr, 2)
            t = (t.replace("self_attn.q_proj.", "attention.wq.")
                 .replace("self_attn.k_proj.", "attention.wk.")
                 .replace("self_attn.v_proj.", "attention.wv.")
                 .replace("self_attn.o_proj.", "attention.wo.")
                 .replace("input_layernorm.", "attention_norm.")
                 .replace("post_attention_layernorm.", "ffn_norm.")
                 .replace("mlp.gate_proj.", "feed_forward.w1.")
                 .replace("mlp.down_proj.", "feed_forward.w2.")
                 .replace("mlp.up_proj.", "feed_forward.w3.")
                 .replace("embed_tokens.", "tok_embeddings.")
                 .replace("norm.weight", "norm.weight"))
            out[t] = arr
            continue
        out[n] = arr

    save_file({k: np.ascontiguousarray(v) for k, v in out.items()},
              os.path.join(mi_dir, "consolidated.safetensors"))
    params = {
        "dim": 48, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
        "hidden_dim": 96, "head_dim": 12, "norm_eps": 1e-6,
        "vocab_size": 260, "rope_theta": 10000.0, "max_seq_len": 128,
        "activation": "silu",
        "vision_encoder": {
            "hidden_size": 32, "num_channels": 3, "image_size": 64,
            "patch_size": PATCH, "rope_theta": 10000.0,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 2, "head_dim": 16,
            "image_token_id": IMG,
        },
    }
    with open(os.path.join(mi_dir, "params.json"), "w") as f:
        json.dump(params, f)
    return hf_dir, mi_dir


def make_image(seed, hw=(24, 40)):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3,) + hw).astype(np.float32)


def test_mistral_format_config_translation(dirs):
    from aphrodite_tpu.common.config import ModelConfig
    from aphrodite_tpu.models.registry import get_model_class

    _, mi_dir = dirs
    mc = ModelConfig(model=mi_dir, dtype="float32")
    assert mc.architecture == "PixtralForConditionalGeneration"
    assert mc.hf_config["hidden_size"] == 48
    assert mc.hf_config["num_key_value_heads"] == 2
    assert mc.hf_config["vision_config"]["hidden_size"] == 32
    assert mc.skip_tokenizer_init  # no HF tokenizer in a mistral dir
    assert get_model_class(mc).__name__ == \
        "PixtralForConditionalGeneration"


def test_mistral_format_greedy_matches_hf(dirs):
    hf_dir, mi_dir = dirs
    img = make_image(5, (24, 40))
    prompt_ids = [5, 6, IMG, 10, 11]
    req = [{"prompt_token_ids": prompt_ids,
            "multi_modal_data": {"image": img}}]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    ref = LLM(model=hf_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128)
    expect = [list(o.outputs[0].token_ids) for o in ref.generate(req, sp)]
    del ref

    llm = LLM(model=mi_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128)
    got = [list(o.outputs[0].token_ids) for o in llm.generate(req, sp)]
    assert got == expect


def test_mistral_format_with_tekken_serves_text(dirs, tmp_path):
    """A mistral-format dir that carries tekken.json serves TEXT
    (r5: native tekken parsing lifts the token-id-only restriction)."""
    import shutil

    from aphrodite_tpu.common.config import ModelConfig
    from aphrodite_tpu.transformers_utils.tekken import TekkenTokenizer
    from tests.test_tekken import _write_tekken

    _, mi_dir = dirs
    d = str(tmp_path / "mi_tekken")
    shutil.copytree(mi_dir, d)
    _write_tekken(os.path.join(d, "tekken.json"))

    mc = ModelConfig(model=d, dtype="float32")
    assert not mc.skip_tokenizer_init  # text serving enabled

    from aphrodite_tpu.transformers_utils.tokenizer import get_tokenizer

    t = get_tokenizer(d)
    assert isinstance(t, TekkenTokenizer)
    ids = t.encode("hello world")
    assert t.decode(ids) == "hello world"
