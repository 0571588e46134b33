"""Chameleon engine tests vs HF transformers.

Exactness bar: the VQ-VAE encoder + img2bpe remap produce HF's exact
image token ids, and greedy generation (with the always-on image-token
logit mask and per-head LayerNorm qk-norm) matches
ChameleonForConditionalGeneration token-for-token in fp32."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

RES = 16
IMG = 290  # "<image>" placeholder id
N_IMG_TOKENS = 64  # (16 / 2)^2 latent grid


def _vocab_map():
    m = {"<image>": IMG}
    for n in range(16):
        name = "IMGIMG" + "".join(chr(ord("A") + int(d))
                                  for d in str(n)) + "Z"
        m[name] = 270 + n
    return m


def _tiny_cfg():
    import transformers as tf

    return tf.ChameleonConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        vocabulary_map=_vocab_map(), swin_norm=False,
        model_parallel_size=1, tie_word_embeddings=False,
        vq_config=dict(embed_dim=8, num_embeddings=16, base_channels=32,
                       channel_multiplier=[1, 2], num_res_blocks=1,
                       resolution=RES, attn_resolutions=[8],
                       latent_channels=8, double_latent=False,
                       in_channels=3),
    )


@pytest.fixture(scope="module")
def chameleon_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.ChameleonForConditionalGeneration(_tiny_cfg()).to(
        torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_chameleon"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=300)
    return path


def make_image(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3, RES, RES)).astype(np.float32)


def test_vq_tokens_match_hf(chameleon_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.chameleon import (
        ChameleonForConditionalGeneration)

    mc = ModelConfig(model=chameleon_dir, dtype="float32")
    model = ChameleonForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)

    hf = tf.ChameleonForConditionalGeneration.from_pretrained(
        chameleon_dir, torch_dtype=torch.float32)
    hf.eval()
    img = make_image(2)
    got = model.encode_image_item(params, img).astype(np.int64)
    with torch.no_grad():
        expect = hf.model.get_image_tokens(
            torch.tensor(img[None]))[0].numpy()
    assert got.shape == expect.shape == (N_IMG_TOKENS,)
    np.testing.assert_array_equal(got, expect)


def hf_generate(model_dir, prompt_ids, image, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.ChameleonForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * N_IMG_TOKENS if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, pixel_values=torch.tensor(image[None]),
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


def test_chameleon_greedy_matches_hf(chameleon_dir):
    llm = LLM(model=chameleon_dir, dtype="float32", max_num_seqs=4,
              max_model_len=256)
    image = make_image(1)
    prompt_ids = [5, 6, IMG, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": image}}], sp)[0].outputs[0]
    expect = hf_generate(chameleon_dir, prompt_ids, image, 8)
    assert list(out.token_ids) == expect


def test_chameleon_text_only_matches_hf(chameleon_dir):
    import torch
    import transformers as tf

    llm = LLM(model=chameleon_dir, dtype="float32", max_num_seqs=4,
              max_model_len=256)
    prompt_ids = [5, 6, 7, 8, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate([{"prompt_token_ids": prompt_ids}],
                       sp)[0].outputs[0]
    model = tf.ChameleonForConditionalGeneration.from_pretrained(
        chameleon_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(input_ids=ids,
                             attention_mask=torch.ones_like(ids),
                             max_new_tokens=8, do_sample=False,
                             suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0, ids.shape[1]:].tolist()


def test_chameleon_swin_norm_matches_hf(tmp_path_factory):
    """30b-style swin_norm (post-norm residual order) stays exact —
    this also validates the shared llama norm_after knob Molmo's
    norm_after checkpoints use."""
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = _tiny_cfg()
    cfg.swin_norm = True
    torch.manual_seed(3)
    model = tf.ChameleonForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_chameleon_swin"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=300)

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=256)
    prompt_ids = [5, 6, 7, 8, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate([{"prompt_token_ids": prompt_ids}],
                       sp)[0].outputs[0]
    model.eval()
    ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(input_ids=ids,
                             attention_mask=torch.ones_like(ids),
                             max_new_tokens=8, do_sample=False,
                             suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0, ids.shape[1]:].tolist()
