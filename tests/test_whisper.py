"""Whisper ASR engine tests vs HF transformers.

Exactness bar: greedy transcription decoding matches HF's
WhisperForConditionalGeneration token-for-token — full-window
(silence-padded) audio encoding, cross-KV pages, the pre-norm decoder
without embedding LN / k biases, tied-head logits."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

MELS = 8
MAX_SRC = 8  # mel window 16
SOT = 3


def _cfg():
    import transformers as tf

    return tf.WhisperConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=MELS,
        max_source_positions=MAX_SRC, max_target_positions=64,
        decoder_start_token_id=SOT, pad_token_id=0, eos_token_id=2,
        bos_token_id=1, begin_suppress_tokens=None, suppress_tokens=None,
        forced_decoder_ids=None)


@pytest.fixture(scope="module")
def whisper_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.WhisperForConditionalGeneration(_cfg()).to(torch.float32)
    model.generation_config.forced_decoder_ids = None
    model.generation_config.begin_suppress_tokens = None
    model.generation_config.suppress_tokens = None
    model.generation_config.no_timestamps_token_id = None
    path = str(tmp_path_factory.mktemp("tiny_whisper"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def make_mel(seed, frames=10):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((MELS, frames)).astype(np.float32) * 0.5


def test_whisper_decoder_logits_match_hf(whisper_dir):
    """Full-logits check for the audio-encoder + cross pages +
    pre-norm decoder path."""
    import torch
    import transformers as tf

    import jax.numpy as jnp

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.interface import ForwardBatch
    from aphrodite_tpu.models.whisper import (
        WhisperForConditionalGeneration)

    mc = ModelConfig(model=whisper_dir, dtype="float32",
                     max_model_len=64)
    m = WhisperForConditionalGeneration(mc)
    params = load_model_params(m, mc, LoadConfig(), mesh=None)
    hf = tf.WhisperForConditionalGeneration.from_pretrained(
        whisper_dir, torch_dtype=torch.float32)
    hf.eval()
    mel = make_mel(2)
    full = np.pad(mel, ((0, 0), (0, MAX_SRC * 2 - mel.shape[1])))
    dec = [SOT, 7, 9]
    with torch.no_grad():
        expect = hf(input_features=torch.tensor(full[None]),
                    decoder_input_ids=torch.tensor([dec])
                    ).logits[0].numpy()
    page = 8
    cross = jnp.zeros((m.num_layers, 9, page) +
                      m.cross_kv_cache_shape_suffix, jnp.float32)
    slots = 1 * page + np.arange(MAX_SRC)
    cross = m.encode_audio_and_write_cross(
        params, cross, jnp.asarray(full),
        jnp.asarray(slots, dtype=jnp.int32))
    kv = jnp.zeros((m.num_layers, 9, page) + m.kv_cache_shape_suffix,
                   jnp.float32)
    pi = np.zeros((2, 4), np.int32); pi[0, 0] = 2
    ci = np.zeros((2, 4), np.int32); ci[0, 0] = 1
    T = 4
    tok = np.zeros(T, np.int32); tok[:3] = dec
    pos = np.zeros(T, np.int32); pos[:3] = np.arange(3)
    sl = np.full(T, 8 * page, np.int32); sl[:3] = 2 * page + np.arange(3)
    b = ForwardBatch(
        token_ids=jnp.asarray(tok), positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(sl),
        kv_lens=jnp.asarray([3, 0], jnp.int32),
        page_indices=jnp.asarray(pi),
        cu_q_lens=jnp.asarray([0, 3, 3], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        logits_indices=jnp.asarray([2, 0], jnp.int32),
        cross_page_indices=jnp.asarray(ci),
        cross_kv_lens=jnp.asarray([MAX_SRC, 0], jnp.int32))
    kv, h = m.forward(params, kv, b, cross_kv=cross)
    got = np.asarray(m.compute_logits(params, h))[:3]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_whisper_greedy_matches_hf(whisper_dir):
    import torch
    import transformers as tf

    llm = LLM(model=whisper_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              max_model_len=64)
    mel = make_mel(1)
    prompt_ids = [SOT, 7]  # decoder prompt: start + a "language" token
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"audio": mel}}], sp)[0].outputs[0]

    # Manual greedy oracle (HF's whisper .generate() carries
    # task-token forcing logic that doesn't apply to tiny configs).
    model = tf.WhisperForConditionalGeneration.from_pretrained(
        whisper_dir, torch_dtype=torch.float32)
    model.eval()
    full = np.pad(mel, ((0, 0), (0, MAX_SRC * 2 - mel.shape[1])))
    dec = list(prompt_ids)
    with torch.no_grad():
        for _ in range(8):
            lg = model(input_features=torch.tensor(full[None]),
                       decoder_input_ids=torch.tensor([dec])
                       ).logits[0, -1]
            lg[2] = -1e30  # banned token
            dec.append(int(lg.argmax()))
    assert list(out.token_ids) == dec[len(prompt_ids):]


def test_whisper_tp2_matches_tp1(whisper_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    req = [{"prompt_token_ids": [SOT, 7],
            "multi_modal_data": {"audio": make_mel(3)}}]
    o1 = LLM(model=whisper_dir, dtype="float32", max_num_seqs=2,
             max_model_len=64).generate(req, sp)
    o2 = LLM(model=whisper_dir, dtype="float32", max_num_seqs=2,
             max_model_len=64,
             tensor_parallel_size=2).generate(req, sp)
    assert [o.outputs[0].token_ids for o in o1] == \
        [o.outputs[0].token_ids for o in o2]
