"""Qwen2-Audio engine tests vs HF transformers.

Exactness bar: the whisper tower + in-encoder AvgPool + projector match
HF's audio path, and greedy generation with spliced audio features
matches Qwen2AudioForConditionalGeneration token-for-token."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

AUD = 250
MELS = 8
D_AUDIO = 32
MAX_POS = 8  # mel window 16


def _cfg():
    import transformers as tf

    return tf.Qwen2AudioConfig(
        audio_config=dict(d_model=D_AUDIO, encoder_layers=2,
                          encoder_attention_heads=2, encoder_ffn_dim=64,
                          num_mel_bins=MELS, max_source_positions=MAX_POS),
        text_config=dict(model_type="qwen2", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=256, max_position_embeddings=128,
                         tie_word_embeddings=False),
        audio_token_index=AUD,
    )


@pytest.fixture(scope="module")
def q2a_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.Qwen2AudioForConditionalGeneration(_cfg()).to(
        torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_q2a"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def make_mel(seed, frames=16):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((MELS, frames)).astype(np.float32) * 0.5


def test_q2a_audio_path_matches_hf(q2a_dir):
    import torch
    import transformers as tf

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.qwen2_audio import (
        Qwen2AudioForConditionalGeneration)

    mc = ModelConfig(model=q2a_dir, dtype="float32")
    model = Qwen2AudioForConditionalGeneration(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    hf = tf.Qwen2AudioForConditionalGeneration.from_pretrained(
        q2a_dir, torch_dtype=torch.float32)
    hf.eval()
    mel = make_mel(1)
    got = model.encode_image_item(params, mel)
    with torch.no_grad():
        tower = getattr(hf, "audio_tower", None) or hf.model.audio_tower
        proj = getattr(hf, "multi_modal_projector",
                       None) or hf.model.multi_modal_projector
        enc = tower(torch.tensor(mel)[None]).last_hidden_state
        expect = proj(enc)[0].numpy()
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_q2a_greedy_matches_hf(q2a_dir):
    import torch
    import transformers as tf

    llm = LLM(model=q2a_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    mel = make_mel(2)
    n_feat = llm.engine.runner.encode_image_item(mel).shape[0]
    prompt_ids = [5, 6, AUD, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"audio": mel}}], sp)[0].outputs[0]

    model = tf.Qwen2AudioForConditionalGeneration.from_pretrained(
        q2a_dir, torch_dtype=torch.float32)
    model.eval()
    expanded = []
    for t in prompt_ids:
        expanded.extend([AUD] * n_feat if t == AUD else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    feat_mask = torch.ones(1, mel.shape[1], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(
            input_ids=ids,
            input_features=torch.tensor(mel)[None],
            feature_attention_mask=feat_mask,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0, ids.shape[1]:].tolist()
