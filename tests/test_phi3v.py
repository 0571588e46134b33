"""Phi-3-Vision multimodal tests.

No monolithic transformers class exists (remote-code arch); the oracle
composes HF pieces exactly as the reference does: HF CLIPVisionModel
(feature layer -2, CLS dropped) + a torch translation of the HD
transform (reference phi3v.py:202-290) + HF Phi3ForCausalLM driven via
inputs_embeds."""

import json
import os

import numpy as np
import pytest
import torch

from aphrodite_tpu import LLM, SamplingParams

IMG = 250
V_CFG = dict(image_dim_out=32, num_attention_heads=4,
             intermediate_size=64, image_size=24, patch_size=6,
             num_hidden_layers=3, layer_idx=-2, num_img_tokens=16)


def _clip_cfg():
    import transformers as tf

    return tf.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=24, patch_size=6,
        hidden_act="quick_gelu", projection_dim=32)


@pytest.fixture(scope="module")
def p3v_dir(tmp_path_factory):
    import transformers as tf
    from safetensors.torch import save_file

    from tests.utils import make_tiny_tokenizer

    text_cfg = tf.Phi3Config(
        vocab_size=260, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(0)
    text = tf.Phi3ForCausalLM(text_cfg).to(torch.float32)
    clip = tf.CLIPVisionModel(_clip_cfg()).to(torch.float32)

    tensors = {k: v.clone() for k, v in text.state_dict().items()}
    for k, v in clip.state_dict().items():
        tensors["model.vision_embed_tokens.img_processor." + k] = \
            v.clone()
    g = torch.Generator().manual_seed(1)
    C4 = 4 * 32
    tensors["model.vision_embed_tokens.glb_GN"] = torch.randn(
        (1, 1, C4), generator=g) * 0.1
    tensors["model.vision_embed_tokens.sub_GN"] = torch.randn(
        (1, 1, 1, C4), generator=g) * 0.1
    tensors["model.vision_embed_tokens.img_projection.0.weight"] = \
        torch.randn((48, C4), generator=g) / np.sqrt(C4)
    tensors["model.vision_embed_tokens.img_projection.0.bias"] = \
        torch.randn((48,), generator=g) * 0.1
    tensors["model.vision_embed_tokens.img_projection.2.weight"] = \
        torch.randn((48, 48), generator=g) / np.sqrt(48)
    tensors["model.vision_embed_tokens.img_projection.2.bias"] = \
        torch.randn((48,), generator=g) * 0.1

    path = str(tmp_path_factory.mktemp("tiny_phi3v"))
    save_file({k: v.contiguous() for k, v in tensors.items()},
              os.path.join(path, "model.safetensors"))
    cfg = json.loads(text_cfg.to_json_string())
    cfg.update({
        "architectures": ["Phi3VForCausalLM"],
        "model_type": "phi3_v",
        "image_token_id": IMG,
        "img_processor": V_CFG,
        "embd_layer": {"use_hd_transform": True,
                       "with_learnable_separator": True,
                       "hd_transform_order": "sub_glb"},
    })
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(path, vocab_size=260)
    return path, tensors


def _oracle_features(tensors, crops, hc, wc):
    """Reference Phi3HDImageEmbedding in torch (phi3v.py:202-290)."""
    import transformers as tf

    clip = tf.CLIPVisionModel(_clip_cfg()).to(torch.float32)
    clip.load_state_dict({
        k[len("model.vision_embed_tokens.img_processor."):]: v
        for k, v in tensors.items()
        if k.startswith("model.vision_embed_tokens.img_processor.")})
    clip.eval()
    with torch.no_grad():
        hs = clip(torch.tensor(crops), output_hidden_states=True) \
            .hidden_states[-2]
    feats = hs[:, 1:]  # drop CLS
    C = 32
    G = 4  # 24/6
    Hh = G // 2

    def merge(x, h_crop, w_crop):
        N = x.shape[0]
        x = (x.reshape(N, G, G, C)
             .reshape(N, Hh, 2, Hh, 2, C)
             .permute(0, 1, 3, 2, 4, 5)
             .reshape(N, -1, 4 * C)
             .reshape(1, h_crop, w_crop, Hh, Hh, 4 * C)
             .permute(0, 1, 3, 2, 4, 5)
             .reshape(1, h_crop * Hh, w_crop * Hh, 4 * C))
        return x

    sub_gn = tensors["model.vision_embed_tokens.sub_GN"]
    glb_gn = tensors["model.vision_embed_tokens.glb_GN"]

    def add_newline(x):
        n, h, w, d = x.shape
        nl = sub_gn.expand(n, h, -1, -1)
        return torch.cat([x, nl], dim=2).reshape(n, -1, d)

    glb = add_newline(merge(feats[:1], 1, 1))[0]
    sub = add_newline(merge(feats[1:1 + hc * wc], hc, wc))[0]
    emb = torch.cat([sub, glb_gn.squeeze(0), glb], dim=0)
    w1 = tensors["model.vision_embed_tokens.img_projection.0.weight"]
    b1 = tensors["model.vision_embed_tokens.img_projection.0.bias"]
    w2 = tensors["model.vision_embed_tokens.img_projection.2.weight"]
    b2 = tensors["model.vision_embed_tokens.img_projection.2.bias"]
    emb = torch.nn.functional.gelu(emb @ w1.T + b1)
    return emb @ w2.T + b2


def test_phi3v_greedy_matches_composed_hf(p3v_dir):
    import transformers as tf

    path, tensors = p3v_dir
    rng = np.random.default_rng(5)
    hc, wc = 2, 1
    crops = rng.standard_normal((1 + hc * wc, 3, 24, 24)).astype(
        np.float32)
    item = {"pixel_values": crops, "image_size": (48, 24)}

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    prompt_ids = [1, IMG, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": item}}], sp)[0].outputs[0]

    feats = _oracle_features(tensors, crops, hc, wc)
    text = tf.Phi3ForCausalLM.from_pretrained(
        path, torch_dtype=torch.float32)
    text.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * feats.shape[0] if t == IMG else [t])
    ids = torch.tensor([expanded])
    embeds = text.get_input_embeddings()(ids)
    mask = ids == IMG
    embeds[mask] = feats.to(embeds.dtype)
    with torch.no_grad():
        hf_out = text.generate(
            inputs_embeds=embeds,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    expect = hf_out[0].tolist()  # inputs_embeds: only new tokens
    assert out.token_ids == expect
