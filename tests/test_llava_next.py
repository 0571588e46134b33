"""LLaVA-NeXT (anyres) multimodal tests vs HF transformers.

Greedy generation with tiled pixel inputs must match HF's
LlavaNextForConditionalGeneration token-for-token in fp32, including
the spatial_unpad feature re-assembly and image_newline rows. The
placeholder expansion count comes from OUR merge math; HF's
masked_scatter hard-fails on any count mismatch, so agreement is
doubly checked."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 256
PINPOINTS = [[24, 24], [24, 48], [48, 24], [48, 48]]


@pytest.fixture(scope="module")
def ln_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.LlavaNextConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=24, patch_size=8,
                           projection_dim=32),
        text_config=dict(model_type="llama", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=260, max_position_embeddings=256,
                         tie_word_embeddings=False),
        image_token_index=IMG,
        image_grid_pinpoints=PINPOINTS,
    )
    torch.manual_seed(0)
    model = tf.LlavaNextForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_llava_next"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


def make_item(seed, image_size):
    from transformers.models.llava_next.modeling_llava_next import (
        image_size_to_num_patches)

    n_tiles = image_size_to_num_patches(image_size, PINPOINTS, 24)
    rng = np.random.default_rng(seed)
    tiles = rng.standard_normal((n_tiles, 3, 24, 24)).astype(np.float32)
    return {"pixel_values": tiles, "image_size": image_size}


def n_features(image_size):
    from aphrodite_tpu.models.llava_next import (
        get_anyres_image_grid_shape, unpad_image)

    g = 3  # 24 / 8
    nph, npw = get_anyres_image_grid_shape(image_size, PINPOINTS, 24)
    dummy = np.zeros((1, nph * g, npw * g))
    ch, cw = unpad_image(dummy, image_size).shape[1:]
    return g * g + ch * (cw + 1)


def hf_generate(model_dir, prompt_ids, item, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.LlavaNextForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    nf = n_features(item["image_size"])
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * nf if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    px = torch.tensor(item["pixel_values"][None], dtype=torch.float32)
    sizes = torch.tensor([list(item["image_size"])])
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, pixel_values=px, image_sizes=sizes,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


@pytest.mark.parametrize("image_size", [(30, 40), (50, 20), (24, 24)])
def test_llava_next_greedy_matches_hf(ln_dir, image_size):
    llm = LLM(model=ln_dir, dtype="float32", max_num_seqs=4,
              max_model_len=256)
    item = make_item(hash(image_size) % 100, image_size)
    prompt_ids = [1, IMG, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": item}}], sp)[0].outputs[0]
    expect = hf_generate(ln_dir, prompt_ids, item, 8)
    assert out.token_ids == expect, image_size
