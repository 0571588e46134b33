"""Qwen2-VL engine tests vs HF transformers.

Exactness bar: the vision tower matches HF's Qwen2VisionTransformer,
the M-RoPE position tables match HF's get_rope_index, and greedy
generation with image patches matches Qwen2VLForConditionalGeneration
token-for-token in fp32 (prefill + M-RoPE-shifted decode)."""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

VOCAB = 256
IMG = 251
VIDEO = 252
VSTART = 249
VEND = 250
PATCH = 4
TPS = 2
MERGE = 2
PDIM = 3 * TPS * PATCH * PATCH  # 96


def _tiny_cfg():
    import transformers as tf

    return tf.Qwen2VLConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        rope_theta=10000.0, tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64,
                           num_heads=2, mlp_ratio=2.0, patch_size=PATCH,
                           temporal_patch_size=TPS,
                           spatial_merge_size=MERGE, in_chans=3),
        image_token_id=IMG, video_token_id=VIDEO,
        vision_start_token_id=VSTART, vision_end_token_id=VEND,
    )


@pytest.fixture(scope="module")
def qvl_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.Qwen2VLForConditionalGeneration(_tiny_cfg()).to(
        torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_qwen2vl"))
    model.save_pretrained(path, safe_serialization=True)
    # save_pretrained on a from-config model omits `architectures`;
    # real hub checkpoints carry it at the top level.
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    cfg["architectures"] = ["Qwen2VLForConditionalGeneration"]
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(path, vocab_size=VOCAB)
    return path


def make_item(seed, grid=(1, 8, 8)):
    rng = np.random.default_rng(seed)
    t, h, w = grid
    return {
        "pixel_values": rng.standard_normal(
            (t * h * w, PDIM)).astype(np.float32),
        "image_grid_thw": np.asarray(grid, np.int64),
    }


def test_vision_tower_matches_hf(qvl_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    mc = ModelConfig(model=qvl_dir, dtype="float32")
    model = Qwen2VLForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)

    hf = tf.Qwen2VLForConditionalGeneration.from_pretrained(
        qvl_dir, torch_dtype=torch.float32)
    hf.eval()
    for grid in [(1, 8, 8), (1, 4, 12), (1, 6, 6)]:
        item = make_item(3, grid)
        got = model.encode_image_item(params, item)
        with torch.no_grad():
            visual = getattr(hf, "visual", None) or hf.model.visual
            expect = visual(
                torch.tensor(item["pixel_values"]),
                grid_thw=torch.tensor(item["image_grid_thw"])[None],
            ).numpy()
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_mrope_positions_match_hf(qvl_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import ModelConfig
    from aphrodite_tpu.models.qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    mc = ModelConfig(model=qvl_dir, dtype="float32")
    model = Qwen2VLForConditionalGeneration(mc)
    grid = (1, 8, 8)
    n_feat = (grid[0] * grid[1] * grid[2]) // (MERGE * MERGE)
    ids = [5, 6, VSTART] + [IMG] * n_feat + [VEND, 7, 8, 9]
    table, delta = model.mrope_input_positions([int(t) for t in ids],
                                               [make_item(0, grid)])

    hf = tf.Qwen2VLForConditionalGeneration.from_pretrained(
        qvl_dir, torch_dtype=torch.float32)
    fn = getattr(hf, "get_rope_index", None) or hf.model.get_rope_index
    pos, d = fn(torch.tensor([ids]),
                image_grid_thw=torch.tensor([grid]),
                attention_mask=torch.ones(1, len(ids), dtype=torch.long))
    np.testing.assert_array_equal(table, pos[:, 0].numpy())
    assert delta == int(d[0, 0])


def hf_generate(model_dir, prompt_ids, item, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.Qwen2VLForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    g = item["image_grid_thw"]
    n_feat = int(g[0] * g[1] * g[2]) // (MERGE * MERGE)
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * n_feat if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids,
            pixel_values=torch.tensor(item["pixel_values"]),
            image_grid_thw=torch.tensor(g)[None],
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


def test_qwen2vl_greedy_matches_hf(qvl_dir):
    llm = LLM(model=qvl_dir, dtype="float32", max_num_seqs=4,
              max_model_len=256)
    item = make_item(1)
    prompt_ids = [5, 6, VSTART, IMG, VEND, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": item}}], sp)[0].outputs[0]
    expect = hf_generate(qvl_dir, prompt_ids, item, 8)
    assert list(out.token_ids) == expect


def test_qwen2vl_text_only_matches_hf(qvl_dir):
    """Text-only requests to an mrope model use plain positions."""
    import torch
    import transformers as tf

    llm = LLM(model=qvl_dir, dtype="float32", max_num_seqs=4,
              max_model_len=256)
    prompt_ids = [5, 6, 7, 8, 9, 10]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate([{"prompt_token_ids": prompt_ids}],
                       sp)[0].outputs[0]
    model = tf.Qwen2VLForConditionalGeneration.from_pretrained(
        qvl_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(input_ids=ids,
                             attention_mask=torch.ones_like(ids),
                             max_new_tokens=8, do_sample=False,
                             suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0, ids.shape[1]:].tolist()


def test_server_preprocess_matches_hf_processor():
    """prepare_server_image == HF Qwen2VLImageProcessor bit-for-bit."""
    import types

    from PIL import Image
    from transformers import Qwen2VLImageProcessor

    from aphrodite_tpu.models.qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (50, 70, 3), dtype=np.uint8))
    proc = Qwen2VLImageProcessor(
        patch_size=PATCH, temporal_patch_size=TPS, merge_size=MERGE,
        min_pixels=56 * 56, max_pixels=14 * 14 * 4 * 1280)
    expect = proc(images=[img], return_tensors="np")
    self = types.SimpleNamespace(v_patch=PATCH, v_merge=MERGE, v_tps=TPS)
    got = Qwen2VLForConditionalGeneration.prepare_server_image(self, img)
    np.testing.assert_array_equal(got["image_grid_thw"],
                                  expect["image_grid_thw"][0])
    np.testing.assert_allclose(got["pixel_values"],
                               expect["pixel_values"], atol=1e-5)


def test_qwen2vl_two_images_chunked_prefill(qvl_dir):
    """Two images + chunked prefill that splits a feature span."""
    llm = LLM(model=qvl_dir, dtype="float32", max_num_seqs=2,
              max_model_len=256, enable_chunked_prefill=True,
              max_num_batched_tokens=16)
    items = [make_item(1), make_item(2, grid=(1, 4, 12))]
    prompt_ids = [5, VSTART, IMG, VEND, 6, 7, VSTART, IMG, VEND, 8]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": items}}], sp)[0].outputs[0]

    import torch
    import transformers as tf

    model = tf.Qwen2VLForConditionalGeneration.from_pretrained(
        qvl_dir, torch_dtype=torch.float32)
    model.eval()
    expanded = []
    per_feat = [int(np.prod(i["image_grid_thw"])) // 4 for i in items]
    j = 0
    for t in prompt_ids:
        if t == IMG:
            expanded.extend([IMG] * per_feat[j])
            j += 1
        else:
            expanded.append(t)
    ids = torch.tensor([expanded], dtype=torch.long)
    px = torch.tensor(np.concatenate(
        [i["pixel_values"] for i in items], axis=0))
    grids = torch.tensor(np.stack(
        [i["image_grid_thw"] for i in items]))
    with torch.no_grad():
        exp = model.generate(
            input_ids=ids, pixel_values=px, image_grid_thw=grids,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=6, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0, ids.shape[1]:].tolist()


def make_video_item(seed, grid=(2, 4, 4)):
    """HF-processor-shaped video item (pixel_values_videos /
    video_grid_thw): grid_t > 1, temporal_patch_size frames folded into
    the channel dim exactly like images."""
    rng = np.random.default_rng(seed)
    t, h, w = grid
    return {
        "pixel_values_videos": rng.standard_normal(
            (t * h * w, PDIM)).astype(np.float32),
        "video_grid_thw": np.asarray(grid, np.int64),
    }


def test_vision_tower_video_matches_hf(qvl_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    mc = ModelConfig(model=qvl_dir, dtype="float32")
    model = Qwen2VLForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    hf = tf.Qwen2VLForConditionalGeneration.from_pretrained(
        qvl_dir, torch_dtype=torch.float32)
    hf.eval()
    for grid in [(2, 4, 4), (3, 4, 8)]:
        item = make_video_item(11, grid)
        got = model.encode_image_item(params, item)
        with torch.no_grad():
            visual = getattr(hf, "visual", None) or hf.model.visual
            expect = visual(
                torch.tensor(item["pixel_values_videos"]),
                grid_thw=torch.tensor(item["video_grid_thw"])[None],
            ).numpy()
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_qwen2vl_video_and_image_greedy_matches_hf(qvl_dir):
    """Mixed video + image request: temporal M-RoPE grid layout and
    per-modality placeholder expansion vs HF generate."""
    import torch
    import transformers as tf

    llm = LLM(model=qvl_dir, dtype="float32", max_num_seqs=2,
              max_model_len=256)
    vid = make_video_item(7)
    img = make_item(1, grid=(1, 4, 8))
    prompt_ids = [5, VSTART, VIDEO, VEND, 6, VSTART, IMG, VEND, 8]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": img, "video": vid}}],
        sp)[0].outputs[0]

    model = tf.Qwen2VLForConditionalGeneration.from_pretrained(
        qvl_dir, torch_dtype=torch.float32)
    model.eval()
    n_vid = int(np.prod(vid["video_grid_thw"])) // (MERGE * MERGE)
    n_img = int(np.prod(img["image_grid_thw"])) // (MERGE * MERGE)
    expanded = []
    for t in prompt_ids:
        if t == VIDEO:
            expanded.extend([VIDEO] * n_vid)
        elif t == IMG:
            expanded.extend([IMG] * n_img)
        else:
            expanded.append(t)
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(
            input_ids=ids,
            pixel_values=torch.tensor(img["pixel_values"]),
            image_grid_thw=torch.tensor(img["image_grid_thw"])[None],
            pixel_values_videos=torch.tensor(
                vid["pixel_values_videos"]),
            video_grid_thw=torch.tensor(vid["video_grid_thw"])[None],
            attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0, ids.shape[1]:].tolist()
