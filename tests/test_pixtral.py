"""Pixtral (HF LLaVA composite with a pixtral tower) tests vs HF.

Exactness bar: the native-resolution tower + projector match HF's
PixtralVisionModel + LlavaMultiModalProjector, and greedy generation
matches LlavaForConditionalGeneration token-for-token in fp32 across
image aspect ratios."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

IMG = 256
PATCH = 8


def _tiny_cfg():
    import transformers as tf

    return tf.LlavaConfig(
        vision_config=dict(model_type="pixtral", hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=2, head_dim=16,
                           image_size=64, patch_size=PATCH,
                           rope_theta=10000.0),
        text_config=dict(model_type="mistral", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=260, max_position_embeddings=128,
                         tie_word_embeddings=False),
        image_token_index=IMG, vision_feature_layer=-1,
        vision_feature_select_strategy="full",
    )


@pytest.fixture(scope="module")
def pixtral_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.LlavaForConditionalGeneration(_tiny_cfg()).to(
        torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_pixtral"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


def make_image(seed, hw=(24, 40)):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((3,) + hw).astype(np.float32)


def test_pixtral_tower_matches_hf(pixtral_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.pixtral import (
        PixtralForConditionalGeneration)
    from aphrodite_tpu.models.registry import get_model_class

    mc = ModelConfig(model=pixtral_dir, dtype="float32")
    assert get_model_class(mc) is PixtralForConditionalGeneration
    model = PixtralForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)

    hf = tf.LlavaForConditionalGeneration.from_pretrained(
        pixtral_dir, torch_dtype=torch.float32)
    hf.eval()
    for hw in [(24, 40), (16, 16), (32, 8)]:
        img = make_image(2, hw)
        got = model.encode_image_item(params, img)
        with torch.no_grad():
            feats = hf.get_image_features(
                pixel_values=torch.tensor(img[None]),
                image_sizes=torch.tensor([list(hw)]),
                vision_feature_layer=-1,
                vision_feature_select_strategy="full")
            expect = (feats[0] if isinstance(feats, (list, tuple))
                      else feats[0]).numpy()
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def hf_generate(model_dir, prompt_ids, image, max_new_tokens):
    import torch
    import transformers as tf

    model = tf.LlavaForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    n_feat = (image.shape[1] // PATCH) * (image.shape[2] // PATCH)
    expanded = []
    for t in prompt_ids:
        expanded.extend([IMG] * n_feat if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, pixel_values=torch.tensor(image[None]),
            image_sizes=torch.tensor([[image.shape[1], image.shape[2]]]),
            attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    return out[0, ids.shape[1]:].tolist()


def test_pixtral_greedy_matches_hf(pixtral_dir):
    llm = LLM(model=pixtral_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    image = make_image(1, (24, 40))
    prompt_ids = [1, 5, IMG, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": image}}], sp)[0].outputs[0]
    expect = hf_generate(pixtral_dir, prompt_ids, image, 8)
    assert list(out.token_ids) == expect
