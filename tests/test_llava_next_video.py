"""LLaVA-NeXT-Video engine tests vs HF transformers.

Exactness bar: per-frame CLIP tower + spatial pool + projector match
HF's get_video_features, and greedy generation with a spliced video
matches LlavaNextVideoForConditionalGeneration token-for-token."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

VID = 257
S = 24
TOKENS_PER_FRAME = 1  # ((24/8)/2)^2 = 1 with pool stride 2... see cfg


def _cfg():
    import transformers as tf

    return tf.LlavaNextVideoConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=S, patch_size=4,
                           projection_dim=32),
        text_config=dict(model_type="llama", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=260, max_position_embeddings=128,
                         tie_word_embeddings=False),
        image_token_index=256, video_token_index=VID,
        spatial_pool_stride=2, spatial_pool_mode="average",
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[24, 24]],
    )


@pytest.fixture(scope="module")
def lnv_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.LlavaNextVideoForConditionalGeneration(_cfg()).to(
        torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_lnv"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


def make_video(seed, frames=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((frames, 3, S, S)).astype(np.float32)


def test_video_features_match_hf(lnv_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.llava_next_video import (
        LlavaNextVideoForConditionalGeneration)

    mc = ModelConfig(model=lnv_dir, dtype="float32")
    model = LlavaNextVideoForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    vid = make_video(2)
    got = model.encode_image_item(params, vid)

    hf = tf.LlavaNextVideoForConditionalGeneration.from_pretrained(
        lnv_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        feats = hf.get_video_features(
            torch.tensor(vid[None]), vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        expect = (feats[0] if isinstance(feats, (list, tuple))
                  else feats).reshape(-1, got.shape[-1]).numpy()
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_lnv_greedy_matches_hf(lnv_dir):
    import torch
    import transformers as tf

    llm = LLM(model=lnv_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    vid = make_video(1)
    n_feat = vid.shape[0] * llm.engine.runner.model.tokens_per_frame
    prompt_ids = [1, 5, VID, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"video": vid}}], sp)[0].outputs[0]

    model = tf.LlavaNextVideoForConditionalGeneration.from_pretrained(
        lnv_dir, torch_dtype=torch.float32)
    model.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([VID] * n_feat if t == VID else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(
            input_ids=ids, pixel_values_videos=torch.tensor(vid[None]),
            attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0, ids.shape[1]:].tolist()
