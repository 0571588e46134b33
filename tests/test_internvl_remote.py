"""Remote-code InternVLChatModel (OpenGVLab layout) loading tests.

The HF-format tiny InternVL checkpoint is re-serialized into the
remote-code layout (vision_model.* with fused attn.qkv, mlp1.{0,1,3}
projector, language_model.model.* text stack, llm_config-spelled
composite config, no image_token_id) and must produce identical tower
features and greedy tokens — proving the alternate weight-name
mappings, the aux qkv split, the config-spelling fallbacks, and the
tokenizer-resolved <IMG_CONTEXT> placeholder all line up."""

import json
import os
import re

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

SIZE = 16
PATCH = 4
TOKENS_PER_TILE = 4


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    hf_dir = str(tmp_path_factory.mktemp("tiny_internvl_hf"))
    remote_dir = str(tmp_path_factory.mktemp("tiny_internvl_remote"))

    # Tokenizer first: the <IMG_CONTEXT> id decides the vocab size.
    make_tiny_tokenizer(hf_dir, vocab_size=300)
    tok = tf.AutoTokenizer.from_pretrained(hf_dir)
    tok.add_tokens(["<IMG_CONTEXT>"], special_tokens=True)
    img_id = tok.convert_tokens_to_ids("<IMG_CONTEXT>")
    vocab = img_id + 8
    for d in (hf_dir, remote_dir):
        tok.save_pretrained(d)

    vision = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=2,
                  image_size=SIZE, patch_size=PATCH, use_qk_norm=False,
                  norm_type="layer_norm", layer_scale_init_value=0.1,
                  attention_bias=True,
                  use_absolute_position_embeddings=True)
    text = dict(model_type="qwen2", hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, vocab_size=vocab,
                max_position_embeddings=128, tie_word_embeddings=False)
    cfg = tf.InternVLConfig(
        vision_config=vision, text_config=text, image_token_id=img_id,
        downsample_ratio=0.5, vision_feature_layer=-1,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    model = tf.InternVLForConditionalGeneration(cfg).to(torch.float32)
    model.save_pretrained(hf_dir, safe_serialization=True)

    # ---- re-serialize in the OpenGVLab remote-code layout ----
    from safetensors.numpy import save_file

    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    tensors = {k: np.asarray(v)
               for k, v in safetensors_weight_iterator(hf_dir)}
    out = {}
    qkv = {}
    for name, arr in tensors.items():
        n = name
        if n.startswith("model.language_model."):
            out["language_model.model." +
                n[len("model.language_model."):]] = arr
            continue
        if n == "lm_head.weight":
            out["language_model.lm_head.weight"] = arr
            continue
        if n.startswith("model.multi_modal_projector."):
            sub = n[len("model.multi_modal_projector."):]
            sub = (sub.replace("layer_norm.", "mlp1.0.")
                   .replace("linear_1.", "mlp1.1.")
                   .replace("linear_2.", "mlp1.3."))
            out[sub] = arr
            continue
        if n.startswith("model.vision_tower."):
            v = n[len("model.vision_tower."):]
            v = (v.replace("embeddings.cls_token",
                           "embeddings.class_embedding")
                 .replace("embeddings.position_embeddings",
                          "embeddings.position_embedding")
                 .replace("embeddings.patch_embeddings.projection.",
                          "embeddings.patch_embedding."))
            v = re.sub(r"encoder\.layer\.(\d+)\.", r"encoder.layers.\1.",
                       v)
            v = (v.replace("layernorm_before.", "norm1.")
                 .replace("layernorm_after.", "norm2.")
                 .replace("lambda_1", "ls1").replace("lambda_2", "ls2")
                 .replace("attention.projection_layer.", "attn.proj."))
            m = re.match(r"(encoder\.layers\.\d+\.)attention\."
                         r"([qkv])_proj\.(weight|bias)", v)
            if m:
                qkv.setdefault((m.group(1), m.group(3)), {})[
                    m.group(2)] = arr
                continue
            out["vision_model." + v] = arr
            continue
        out[n] = arr
    for (lay, kind), parts in qkv.items():
        out[f"vision_model.{lay}attn.qkv.{kind}"] = np.concatenate(
            [parts["q"], parts["k"], parts["v"]], axis=0)

    save_file({k: np.ascontiguousarray(v) for k, v in out.items()},
              os.path.join(remote_dir, "model.safetensors"))
    remote_cfg = {
        "architectures": ["InternVLChatModel"],
        "model_type": "internvl_chat",
        "llm_config": dict(text, architectures=["Qwen2ForCausalLM"]),
        "vision_config": dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=SIZE, patch_size=PATCH,
            qk_normalization=False, norm_type="layer_norm",
            qkv_bias=True),
        "select_layer": -1, "downsample_ratio": 0.5, "ps_version": "v2",
        "template": "internvl2_5", "torch_dtype": "float32",
    }
    with open(os.path.join(remote_dir, "config.json"), "w") as f:
        json.dump(remote_cfg, f)
    return hf_dir, remote_dir, img_id


def make_tiles(seed, n_tiles=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tiles, 3, SIZE, SIZE)).astype(
        np.float32)


def test_remote_tower_matches_hf(dirs):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.registry import get_model_class

    hf_dir, remote_dir, _ = dirs
    mc = ModelConfig(model=remote_dir, dtype="float32")
    cls = get_model_class(mc)
    assert cls.__name__ == "InternVLForConditionalGeneration"
    model = cls(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)

    hf = tf.InternVLForConditionalGeneration.from_pretrained(
        hf_dir, torch_dtype=torch.float32)
    hf.eval()
    tiles = make_tiles(3, 2)
    got = model.encode_image_item(params, tiles)
    with torch.no_grad():
        expect = hf.get_image_features(
            torch.tensor(tiles)).reshape(-1, got.shape[-1]).numpy()
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_remote_greedy_matches_hf_format_engine(dirs):
    hf_dir, remote_dir, img_id = dirs
    tiles = make_tiles(4, 1)
    prompt_ids = [5, 6, img_id, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    req = [{"prompt_token_ids": prompt_ids,
            "multi_modal_data": {"image": tiles}}]

    ref = LLM(model=hf_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128)
    expect = [list(o.outputs[0].token_ids) for o in ref.generate(req, sp)]
    del ref

    llm = LLM(model=remote_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128)
    # <IMG_CONTEXT> resolves from the tokenizer (no image_token_id in
    # the remote config).
    got = [list(o.outputs[0].token_ids) for o in llm.generate(req, sp)]
    assert llm.engine.runner.model.image_token_index == img_id
    assert got == expect
