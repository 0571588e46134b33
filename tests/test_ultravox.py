"""Ultravox (audio) engine tests vs a composed HF oracle.

Exactness bar: the whisper-encoder + stack/SwiGLU projector audio path
matches a torch composition of HF WhisperEncoder modules (including the
reference's shorter-than-30s relaxation and zero-padded stack groups),
and greedy generation with spliced audio embeddings matches HF Llama
fed the same inputs_embeds."""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

AUD = 253
MELS = 8
D_AUDIO = 32
STACK = 2
MAX_POS = 8  # full mel window = 16 frames


def _whisper_cfg():
    import transformers as tf

    return tf.WhisperConfig(
        d_model=D_AUDIO, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, num_mel_bins=MELS, max_source_positions=MAX_POS,
        vocab_size=64, decoder_layers=1, decoder_attention_heads=2,
        decoder_ffn_dim=64)


def _llama_cfg():
    import transformers as tf

    return tf.LlamaConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)


@pytest.fixture(scope="module")
def ultravox_dir(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaForCausalLM
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    enc = WhisperEncoder(_whisper_cfg()).float()
    lm = LlamaForCausalLM(_llama_cfg()).float()
    sd = {}
    for k, v in enc.state_dict().items():
        sd["audio_tower." + k] = v.contiguous()
    for k, v in lm.state_dict().items():
        sd["language_model." + k] = v.contiguous()
    sdim = D_AUDIO * STACK
    g = torch.Generator().manual_seed(7)
    sd["multi_modal_projector.ln_pre.weight"] = torch.ones(sdim)
    sd["multi_modal_projector.linear_1.weight"] = \
        torch.randn(48, sdim, generator=g) * 0.1
    sd["multi_modal_projector.linear_2.weight"] = \
        torch.randn(48, 24, generator=g) * 0.1
    sd["multi_modal_projector.ln_post.weight"] = torch.ones(48)

    path = str(tmp_path_factory.mktemp("tiny_ultravox"))
    save_file(sd, os.path.join(path, "model.safetensors"))
    cfg = {
        "architectures": ["UltravoxModel"],
        "model_type": "ultravox",
        "audio_config": json.loads(_whisper_cfg().to_json_string()),
        "text_config": json.loads(_llama_cfg().to_json_string()),
        "stack_factor": STACK,
        "projector_act": "swiglu",
        "audio_token_index": AUD,
        "hidden_size": 48,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def make_mel(seed, frames):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((MELS, frames)).astype(np.float32) * 0.5


def torch_audio_features(model_dir, mel):
    """Reference composition: ModifiedWhisperEncoder (sliced positions,
    any length) + StackAudioFrames zero-pad + SwiGLU projector."""
    import torch
    import torch.nn.functional as Fn
    from safetensors.torch import load_file
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    sd = load_file(os.path.join(model_dir, "model.safetensors"))
    enc = WhisperEncoder(_whisper_cfg()).float()
    enc.load_state_dict({k[len("audio_tower."):]: v for k, v in sd.items()
                         if k.startswith("audio_tower.")})
    enc.eval()
    x = torch.tensor(mel)[None]
    with torch.no_grad():
        h = Fn.gelu(enc.conv1(x))
        h = Fn.gelu(enc.conv2(h)).permute(0, 2, 1)
        h = h + enc.embed_positions.weight[:h.shape[1]]
        for layer in enc.layers:
            h = layer(h, None, layer_head_mask=None)[0]
        h = enc.layer_norm(h)[0]  # [T, E]
        T = h.shape[0]
        pad = (-T) % STACK
        if pad:
            h = torch.cat([h, torch.zeros(pad, h.shape[1])], dim=0)
        h = h.reshape(-1, STACK * h.shape[1])

        def rms(t, w, eps=1e-6):
            var = (t.float()**2).mean(-1, keepdim=True)
            return t * torch.rsqrt(var + eps) * w

        h = rms(h, sd["multi_modal_projector.ln_pre.weight"])
        h = h @ sd["multi_modal_projector.linear_1.weight"].T
        x1, x2 = h.chunk(2, dim=-1)
        h = Fn.silu(x2) * x1
        h = h @ sd["multi_modal_projector.linear_2.weight"].T
        h = rms(h, sd["multi_modal_projector.ln_post.weight"])
    return h.numpy()


@pytest.mark.parametrize("frames", [16, 10])
def test_audio_path_matches_composed_oracle(ultravox_dir, frames):
    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.ultravox import UltravoxModel

    mc = ModelConfig(model=ultravox_dir, dtype="float32")
    model = UltravoxModel(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    mel = make_mel(1, frames)
    got = model.encode_image_item(params, mel)
    expect = torch_audio_features(ultravox_dir, mel)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_ultravox_greedy_matches_hf(ultravox_dir):
    import torch
    from safetensors.torch import load_file
    from transformers import LlamaForCausalLM

    llm = LLM(model=ultravox_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    mel = make_mel(2, 16)
    prompt_ids = [5, 6, AUD, 10, 11]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"audio": mel}}], sp)[0].outputs[0]

    feats = torch.tensor(torch_audio_features(ultravox_dir, mel))
    sd = load_file(os.path.join(ultravox_dir, "model.safetensors"))
    lm = LlamaForCausalLM(_llama_cfg()).float()
    lm.load_state_dict({k[len("language_model."):]: v
                        for k, v in sd.items()
                        if k.startswith("language_model.")})
    lm.eval()
    n_feat = feats.shape[0]
    expanded = []
    for t in prompt_ids:
        expanded.extend([AUD] * n_feat if t == AUD else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    with torch.no_grad():
        embeds = lm.model.embed_tokens(ids)
        pos = expanded.index(AUD)
        embeds[0, pos:pos + n_feat] = feats
        exp = lm.generate(
            inputs_embeds=embeds,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    assert list(out.token_ids) == exp[0].tolist()
