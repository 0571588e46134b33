"""LLaVA multimodal engine tests vs HF transformers.

Exactness bar: greedy generation with pixel inputs must match HF's
LlavaForConditionalGeneration token-for-token in fp32, including when
chunked prefill splits an image's feature span across chunks."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 256  # image_token_index (inside the 260-token text vocab)
N_FEAT = 9  # (24/8)^2 patches


@pytest.fixture(scope="module")
def llava_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=24, patch_size=8, projection_dim=32),
        text_config=dict(model_type="llama", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=260, max_position_embeddings=128,
                         tie_word_embeddings=False),
        image_token_index=IMG,
    )
    torch.manual_seed(0)
    model = tf.LlavaForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_llava"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


def make_image(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3, 24, 24)).astype(np.float32)


def hf_generate(model_dir, prompt_ids, image, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.LlavaForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    # HF expects the placeholder pre-expanded to one token per feature.
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * N_FEAT if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    px = torch.tensor(image[None], dtype=torch.float32)
    with torch.no_grad():
        # Suppress EOS on both sides (here and via custom_token_bans in
        # SP below) so greedy runs the full length deterministically.
        out = model.generate(
            input_ids=ids, pixel_values=px,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


def test_llava_greedy_matches_hf(llava_dir):
    llm = LLM(model=llava_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    image = make_image(1)
    prompt_ids = [1, IMG, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": image}}], sp)[0].outputs[0]
    expect = hf_generate(llava_dir, prompt_ids, image, 8)
    assert out.token_ids == expect


def test_llava_chunked_prefill_splits_image_span(llava_dir):
    llm = LLM(model=llava_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, max_num_batched_tokens=8,
              enable_chunked_prefill=True)
    image = make_image(2)
    # 1 + 9 + 3 = 13 prompt tokens -> chunks of 8 split the image span.
    prompt_ids = [1, IMG, 20, 21, 22]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": image}}], sp)[0].outputs[0]
    expect = hf_generate(llava_dir, prompt_ids, image, 6)
    assert out.token_ids == expect


def test_llava_different_images_not_prefix_cached_together(llava_dir):
    llm = LLM(model=llava_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, enable_prefix_caching=True, block_size=8)
    prompt_ids = [1, IMG, 30, 31]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        custom_token_bans=[2])
    img_a, img_b = make_image(3), make_image(4)
    out_a = llm.generate([{"prompt_token_ids": prompt_ids,
                           "multi_modal_data": {"image": img_a}}],
                         sp)[0].outputs[0]
    # Same token ids, different image: block hashes must differ, so this
    # must NOT reuse img_a's cached KV.
    out_b = llm.generate([{"prompt_token_ids": prompt_ids,
                           "multi_modal_data": {"image": img_b}}],
                         sp)[0].outputs[0]
    assert out_b.token_ids == hf_generate(llava_dir, prompt_ids, img_b, 6)
    assert out_a.token_ids == hf_generate(llava_dir, prompt_ids, img_a, 6)


def test_llava_text_only_still_works(llava_dir):
    llm = LLM(model=llava_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    out = llm.generate([{"prompt_token_ids": [1, 10, 11]}], sp)[0]
    assert len(out.outputs[0].token_ids) == 5


def test_llava_placeholder_count_mismatch_raises(llava_dir):
    llm = LLM(model=llava_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    with pytest.raises(ValueError, match="placeholder"):
        llm.generate([{"prompt_token_ids": [1, 10],  # no IMG token
                       "multi_modal_data": {"image": make_image(5)}}],
                     SamplingParams(max_tokens=2))
