"""InternVL (HF-format) engine tests vs HF transformers.

Exactness bar: InternViT tower + pixel shuffle + projector match HF's
get_image_features (incl. multi-tile dynamic resolution), and greedy
generation matches InternVLForConditionalGeneration token-for-token
in fp32 on a Qwen2 text stack."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 290
SIZE = 16
PATCH = 4
TOKENS_PER_TILE = 4  # ((16/4) * 0.5)^2


def _tiny_cfg():
    import transformers as tf

    return tf.InternVLConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=SIZE, patch_size=PATCH,
                           use_qk_norm=False, norm_type="layer_norm",
                           layer_scale_init_value=0.1, attention_bias=True,
                           use_absolute_position_embeddings=True),
        text_config=dict(model_type="qwen2", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=300, max_position_embeddings=128,
                         tie_word_embeddings=False),
        image_token_id=IMG, downsample_ratio=0.5,
        vision_feature_layer=-1,
        vision_feature_select_strategy="default",
    )


@pytest.fixture(scope="module")
def internvl_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.InternVLForConditionalGeneration(_tiny_cfg()).to(
        torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_internvl"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=300)
    return path


def make_tiles(seed, n_tiles=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tiles, 3, SIZE, SIZE)).astype(
        np.float32)


def test_internvl_tower_matches_hf(internvl_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.internvl import (
        InternVLForConditionalGeneration)

    mc = ModelConfig(model=internvl_dir, dtype="float32")
    model = InternVLForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)

    hf = tf.InternVLForConditionalGeneration.from_pretrained(
        internvl_dir, torch_dtype=torch.float32)
    hf.eval()
    for n_tiles in (1, 3):
        tiles = make_tiles(2, n_tiles)
        got = model.encode_image_item(params, tiles)
        with torch.no_grad():
            expect = hf.get_image_features(
                torch.tensor(tiles)).reshape(-1, got.shape[-1]).numpy()
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def hf_generate(model_dir, prompt_ids, tiles, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.InternVLForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    n_feat = tiles.shape[0] * TOKENS_PER_TILE
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * n_feat if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, pixel_values=torch.tensor(tiles),
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


def test_internvl_greedy_matches_hf(internvl_dir):
    llm = LLM(model=internvl_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    tiles = make_tiles(1, 2)  # dynamic-resolution: 2 tiles
    prompt_ids = [5, 6, IMG, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": tiles}}], sp)[0].outputs[0]
    expect = hf_generate(internvl_dir, prompt_ids, tiles, 8)
    assert list(out.token_ids) == expect
