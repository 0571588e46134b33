"""BLIP-2 engine tests vs HF transformers.

Exactness bar: the ViT + Q-Former + projection image path matches HF's
get_image_features, and greedy generation matches
Blip2ForConditionalGeneration (OPT decoder) token-for-token in fp32."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 256
NQ = 8


def _tiny_cfg():
    import transformers as tf

    return tf.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=2,
                           image_size=24, patch_size=8),
        qformer_config=dict(hidden_size=40, num_hidden_layers=3,
                            num_attention_heads=2, intermediate_size=80,
                            encoder_hidden_size=32,
                            cross_attention_frequency=2),
        text_config=dict(model_type="opt", hidden_size=48, ffn_dim=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         vocab_size=260, max_position_embeddings=128,
                         word_embed_proj_dim=48),
        num_query_tokens=NQ, image_token_index=IMG,
    )


@pytest.fixture(scope="module")
def blip2_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.Blip2ForConditionalGeneration(_tiny_cfg()).to(
        torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_blip2"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


def make_image(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3, 24, 24)).astype(np.float32)


def test_blip2_image_path_matches_hf(blip2_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.blip2 import Blip2ForConditionalGeneration

    mc = ModelConfig(model=blip2_dir, dtype="float32")
    model = Blip2ForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)

    hf = tf.Blip2ForConditionalGeneration.from_pretrained(
        blip2_dir, torch_dtype=torch.float32)
    hf.eval()
    img = make_image(2)
    got = np.asarray(model.encode_images(params, img[None]))[0]
    with torch.no_grad():
        out = hf.get_image_features(torch.tensor(img[None]))
        expect = (out[0] if isinstance(out, tuple) else out)[0].numpy()
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def hf_generate(model_dir, prompt_ids, image, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.Blip2ForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * NQ if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, pixel_values=torch.tensor(image[None]),
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


def test_blip2_greedy_matches_hf(blip2_dir):
    llm = LLM(model=blip2_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    image = make_image(1)
    prompt_ids = [IMG, 10, 11, 12, 13]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": image}}], sp)[0].outputs[0]
    expect = hf_generate(blip2_dir, prompt_ids, image, 8)
    assert list(out.token_ids) == expect


def test_blip2_t5_greedy_matches_hf(tmp_path_factory):
    """Flan-T5-decoder BLIP-2: query features splice into the T5
    ENCODER; greedy must match HF token-for-token."""
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=2,
                           image_size=24, patch_size=8),
        qformer_config=dict(hidden_size=40, num_hidden_layers=3,
                            num_attention_heads=2, intermediate_size=80,
                            encoder_hidden_size=32,
                            cross_attention_frequency=2),
        text_config=dict(model_type="t5", d_model=48, d_kv=12, d_ff=96,
                         num_layers=2, num_decoder_layers=2, num_heads=4,
                         relative_attention_num_buckets=8,
                         relative_attention_max_distance=32,
                         feed_forward_proj="gated-gelu",
                         tie_word_embeddings=True,
                         decoder_start_token_id=0, pad_token_id=0,
                         eos_token_id=1, vocab_size=260),
        num_query_tokens=NQ, image_token_index=IMG,
    )
    torch.manual_seed(1)
    model = tf.Blip2ForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_blip2_t5"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    from aphrodite_tpu.models.blip2 import Blip2T5ForConditionalGeneration
    assert isinstance(llm.engine.runner.model,
                      Blip2T5ForConditionalGeneration)
    image = make_image(1)
    prompt_ids = [IMG, 10, 11, 12, 13]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[1])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": image}}], sp)[0].outputs[0]

    model.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * NQ if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(
            input_ids=ids, pixel_values=torch.tensor(image[None]),
            attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[1], pad_token_id=0)
    # HF returns [decoder_start, tokens...] for enc-dec generate.
    assert list(out.token_ids) == exp[0, 1:].tolist()
