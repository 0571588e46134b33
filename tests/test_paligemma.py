"""PaliGemma multimodal tests vs HF transformers.

Greedy generation with pixel inputs must match HF's
PaliGemmaForConditionalGeneration token-for-token in fp32, including
the SigLIP tower numerics and the Gemma embedding-normalizer / feature
H**-0.5 scale cancellation."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 250  # image_token_index inside the 260-token vocab
N_FEAT = 9  # (24/8)^2 patches


@pytest.fixture(scope="module")
def pg_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.PaliGemmaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=24, patch_size=8),
        text_config=dict(model_type="gemma", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=12, vocab_size=260,
                         max_position_embeddings=128,
                         num_image_tokens=N_FEAT),
        image_token_index=IMG,
        projection_dim=48,  # = text hidden (HF reads the top-level key)
    )
    torch.manual_seed(0)
    model = tf.PaliGemmaForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_paligemma"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


def make_image(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3, 24, 24)).astype(np.float32)


def hf_generate(model_dir, prompt_ids, image, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.PaliGemmaForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * N_FEAT if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    px = torch.tensor(image[None], dtype=torch.float32)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, pixel_values=px,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


def test_paligemma_greedy_matches_hf(pg_dir):
    llm = LLM(model=pg_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    image = make_image(1)
    prompt_ids = [IMG, 1, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": image}}], sp)[0].outputs[0]
    expect = hf_generate(pg_dir, prompt_ids, image, 8)
    assert out.token_ids == expect


def test_paligemma_two_images(pg_dir):
    llm = LLM(model=pg_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    img1, img2 = make_image(2), make_image(3)
    prompt_ids = [IMG, IMG, 1, 30, 31]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": [img1, img2]}}], sp)[0].outputs[0]

    import torch
    import transformers as tf

    model = tf.PaliGemmaForConditionalGeneration.from_pretrained(
        pg_dir, torch_dtype=torch.float32)
    model.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * N_FEAT if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    px = torch.tensor(np.stack([img1, img2]), dtype=torch.float32)
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=ids, pixel_values=px,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=6, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    expect = hf_out[0, ids.shape[1]:].tolist()
    assert out.token_ids == expect
