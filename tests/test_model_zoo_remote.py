"""Remote-code architectures (no transformers class available): build a
tiny checkpoint with an equivalent-math HF architecture, rename tensors /
rewrite config.json into the remote arch's scheme, and require our engine
to reproduce the HF oracle's greedy continuation exactly.

Covers reference registry rows (models/__init__.py:10-73) whose HF
classes live in remote code: Exaone, Orion, InternLM2, Baichuan, MiniCPM,
Solar, StableLM-Epoch, plus the plain llama aliases (Aquila/InternLM/
Xverse).
"""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import make_tiny_checkpoint

COMMON = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    tie_word_embeddings=False,
)

PROMPTS = ["the quick brown fox", "hello world"]


def _load_tensors(model_dir):
    from safetensors.numpy import load_file

    return load_file(os.path.join(model_dir, "model.safetensors"))


def _save_renamed(model_dir, out_dir, rename_fn, config_updates,
                  tensor_transform=None):
    """Copy a checkpoint dir with tensors renamed (rename_fn: old->new,
    None drops) and config.json fields replaced."""
    import shutil

    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    tensors = _load_tensors(model_dir)
    if tensor_transform:
        tensors = tensor_transform(tensors)
    out = {}
    for name, arr in tensors.items():
        new = rename_fn(name)
        if new is not None:
            out[new] = arr
    save_file(out, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg.update(config_updates)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    for fn in os.listdir(model_dir):
        if fn != "config.json" and not fn.endswith(".safetensors"):
            shutil.copy(os.path.join(model_dir, fn),
                        os.path.join(out_dir, fn))


def _hf_greedy_with_class(model_dir, cls_name, prompt_ids, n):
    import torch
    import transformers

    cls = getattr(transformers, cls_name)
    model = cls.from_pretrained(model_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=n, do_sample=False,
                             num_beams=1, pad_token_id=2)
    return out[0, len(prompt_ids):].tolist()


def _ours_greedy(model_dir, prompt, n, **llm_kw):
    llm = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8, **llm_kw)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    outs = llm.generate(prompt, sp)
    ids = [tok.encode(p) for p in prompt]
    return [o.outputs[0].token_ids for o in outs], ids


def _make_llama(tmp_path, name="base", **overrides):
    import transformers as tf

    kw = dict(COMMON)
    kw.update(overrides)
    cfg = tf.LlamaConfig(**kw)
    d = str(tmp_path / name)
    make_tiny_checkpoint(d, cfg)
    return d


def test_aquila_alias(tmp_path):
    base = _make_llama(tmp_path)
    aq = str(tmp_path / "aquila")
    _save_renamed(base, aq, lambda n: n,
                  {"architectures": ["AquilaForCausalLM"]})
    outs, ids = _ours_greedy(aq, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "LlamaForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_exaone_matches_llama_oracle(tmp_path):
    base = _make_llama(tmp_path)

    def rename(n):
        n = n.replace("model.embed_tokens.weight", "transformer.wte.weight")
        n = n.replace("model.norm.weight", "transformer.ln_f.weight")
        n = n.replace("model.layers.", "transformer.h.")
        n = n.replace(".input_layernorm.weight", ".ln_1.weight")
        n = n.replace(".post_attention_layernorm.weight", ".ln_2.weight")
        n = n.replace(".self_attn.q_proj.", ".attn.attention.q_proj.")
        n = n.replace(".self_attn.k_proj.", ".attn.attention.k_proj.")
        n = n.replace(".self_attn.v_proj.", ".attn.attention.v_proj.")
        n = n.replace(".self_attn.o_proj.", ".attn.attention.out_proj.")
        n = n.replace(".mlp.gate_proj.", ".mlp.c_fc_0.")
        n = n.replace(".mlp.up_proj.", ".mlp.c_fc_1.")
        n = n.replace(".mlp.down_proj.", ".mlp.c_proj.")
        return n

    ex = str(tmp_path / "exaone")
    _save_renamed(base, ex, rename, {
        "architectures": ["ExaoneForCausalLM"],
        "num_layers": COMMON["num_hidden_layers"],
        "layer_norm_epsilon": 1e-6,
        "activation_function": "silu",
    })
    outs, ids = _ours_greedy(ex, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "LlamaForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_internlm2_matches_llama_oracle(tmp_path):
    base = _make_llama(tmp_path)
    NH, KV = COMMON["num_attention_heads"], COMMON["num_key_value_heads"]
    D = COMMON["hidden_size"] // NH
    H = COMMON["hidden_size"]

    def transform(tensors):
        out = dict(tensors)
        for i in range(COMMON["num_hidden_layers"]):
            p = f"model.layers.{i}.self_attn"
            q = out.pop(f"{p}.q_proj.weight")  # [NH*D, H]
            k = out.pop(f"{p}.k_proj.weight")
            v = out.pop(f"{p}.v_proj.weight")
            qpk = NH // KV
            q = q.reshape(KV, qpk, D, H)
            k = k.reshape(KV, 1, D, H)
            v = v.reshape(KV, 1, D, H)
            wqkv = np.concatenate([q, k, v], axis=1).reshape(-1, H)
            out[f"model.layers.{i}.attention.wqkv.weight"] = wqkv
        return out

    def rename(n):
        n = n.replace("model.embed_tokens.weight",
                      "model.tok_embeddings.weight")
        n = n.replace("lm_head.weight", "output.weight")
        n = n.replace(".input_layernorm.weight", ".attention_norm.weight")
        n = n.replace(".post_attention_layernorm.weight",
                      ".ffn_norm.weight")
        n = n.replace(".self_attn.o_proj.", ".attention.wo.")
        n = n.replace(".mlp.gate_proj.", ".feed_forward.w1.")
        n = n.replace(".mlp.up_proj.", ".feed_forward.w3.")
        n = n.replace(".mlp.down_proj.", ".feed_forward.w2.")
        return n

    il = str(tmp_path / "internlm2")
    _save_renamed(base, il, rename,
                  {"architectures": ["InternLM2ForCausalLM"]},
                  tensor_transform=transform)
    outs, ids = _ours_greedy(il, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "LlamaForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_baichuan_7b_matches_llama_oracle(tmp_path):
    # Baichuan is MHA with a fused W_pack.
    base = _make_llama(tmp_path, num_key_value_heads=4)

    def transform(tensors):
        out = dict(tensors)
        for i in range(COMMON["num_hidden_layers"]):
            p = f"model.layers.{i}.self_attn"
            q = out.pop(f"{p}.q_proj.weight")
            k = out.pop(f"{p}.k_proj.weight")
            v = out.pop(f"{p}.v_proj.weight")
            out[f"{p}.W_pack.weight"] = np.concatenate([q, k, v], axis=0)
        return out

    bc = str(tmp_path / "baichuan")
    _save_renamed(base, bc, lambda n: n,
                  {"architectures": ["BaiChuanForCausalLM"]},
                  tensor_transform=transform)
    outs, ids = _ours_greedy(bc, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "LlamaForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_baichuan_13b_alibi_slopes_and_smoke(tmp_path):
    """The 13B variant (hidden != 4096) switches to ALiBi (no rope).
    Slope schedule equals the Bloom closest-power-of-2 formula the
    reference reuses (baichuan.py:49-72); the alibi attention path itself
    is HF-validated by the Bloom family test."""
    from aphrodite_tpu.models.bloom import get_alibi_slopes

    slopes = get_alibi_slopes(12)
    closest = 8
    base = 2 ** (-(2 ** -(np.log2(closest) - 3)))
    assert np.allclose(slopes[:8], [base ** i for i in range(1, 9)])

    base_dir = _make_llama(tmp_path, num_key_value_heads=4)

    def transform(tensors):
        out = dict(tensors)
        for i in range(COMMON["num_hidden_layers"]):
            p = f"model.layers.{i}.self_attn"
            q = out.pop(f"{p}.q_proj.weight")
            k = out.pop(f"{p}.k_proj.weight")
            v = out.pop(f"{p}.v_proj.weight")
            out[f"{p}.W_pack.weight"] = np.concatenate([q, k, v], axis=0)
        return out

    bc = str(tmp_path / "baichuan13b")
    _save_renamed(base_dir, bc, lambda n: n,
                  {"architectures": ["BaichuanForCausalLM"]},
                  tensor_transform=transform)
    outs, _ = _ours_greedy(bc, PROMPTS[:1], 8)
    assert len(outs[0]) == 8


def test_baichuan2_normhead():
    from aphrodite_tpu.models import baichuan as bc_mod

    class Dummy:
        vocab_size = bc_mod._BAICHUAN2_VOCAB

    head = np.random.default_rng(0).standard_normal((8, 16)).astype(
        np.float32)
    params = {"lm_head": head.copy()}
    bc_mod.BaiChuanForCausalLM.finalize_params(Dummy(), params)
    np.testing.assert_allclose(np.linalg.norm(params["lm_head"], axis=0),
                               np.ones(16), rtol=1e-5)


def test_orion_matches_stablelm_oracle(tmp_path):
    import transformers as tf

    cfg = tf.StableLmConfig(use_qkv_bias=False, use_parallel_residual=False,
                            partial_rotary_factor=1.0, **COMMON)
    base = str(tmp_path / "stablelm_base")
    make_tiny_checkpoint(base, cfg)
    orion = str(tmp_path / "orion")
    _save_renamed(base, orion, lambda n: n, {
        "architectures": ["OrionForCausalLM"],
        "rms_norm_eps": cfg.layer_norm_eps,
    })
    outs, ids = _ours_greedy(orion, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "StableLmForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_stablelm_epoch_keys(tmp_path):
    import transformers as tf

    cfg = tf.StableLmConfig(use_qkv_bias=True, use_parallel_residual=False,
                            partial_rotary_factor=0.25, **COMMON)
    base = str(tmp_path / "stablelm_base2")
    make_tiny_checkpoint(base, cfg)
    epoch = str(tmp_path / "epoch")
    _save_renamed(base, epoch, lambda n: n, {
        "architectures": ["StableLMEpochForCausalLM"],
        "norm_eps": cfg.layer_norm_eps,
        "rope_pct": 0.25,
        "use_qkv_bias": True,
    })
    outs, ids = _ours_greedy(epoch, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "StableLmForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_minicpm_matches_granite_oracle(tmp_path):
    import transformers as tf

    scale_emb, scale_depth, dim_model_base = 12.0, 1.4, 32
    L = COMMON["num_hidden_layers"]
    H = COMMON["hidden_size"]
    head_dim = H // COMMON["num_attention_heads"]
    cfg = tf.GraniteConfig(
        embedding_multiplier=scale_emb,
        residual_multiplier=scale_depth / np.sqrt(L),
        logits_scaling=H / dim_model_base,
        attention_multiplier=head_dim ** -0.5,
        **COMMON)
    base = str(tmp_path / "granite_base")
    make_tiny_checkpoint(base, cfg)
    mc = str(tmp_path / "minicpm")
    _save_renamed(base, mc, lambda n: n, {
        "architectures": ["MiniCPMForCausalLM"],
        "scale_emb": scale_emb,
        "scale_depth": scale_depth,
        "dim_model_base": dim_model_base,
    })
    outs, ids = _ours_greedy(mc, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "GraniteForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_solar_bskcn_matches_patched_llama(tmp_path):
    """Solar = llama + bskcn blends. Oracle: HF llama with each decoder
    layer wrapped to apply the reference's snapshot/blend schedule
    (solar.py:320-339) before the layer runs."""
    import torch
    import transformers

    base = _make_llama(tmp_path, name="solar_base", num_hidden_layers=4)
    bskcn = {"bskcn_1": [1], "bskcn_2": [], "bskcn_3": [3], "bskcn_4": [],
             "bskcn_tv": [0.9, 0.25]}
    so = str(tmp_path / "solar")
    _save_renamed(base, so, lambda n: n,
                  {"architectures": ["SolarForCausalLM"], **bskcn})

    model = transformers.LlamaForCausalLM.from_pretrained(
        base, torch_dtype=torch.float32)
    model.eval()
    state = {}
    tv = bskcn["bskcn_tv"][1]

    class Wrap(torch.nn.Module):
        def __init__(self, inner, idx):
            super().__init__()
            self.inner = inner
            self.idx = idx

        def forward(self, hidden_states, *args, **kwargs):
            if self.idx in bskcn["bskcn_1"]:
                state["h1"] = hidden_states.clone()
            if self.idx in bskcn["bskcn_3"]:
                hidden_states = state["h1"] * tv + hidden_states * (1 - tv)
            return self.inner(hidden_states, *args, **kwargs)

    model.model.layers = torch.nn.ModuleList(
        [Wrap(layer, i) for i, layer in enumerate(model.model.layers)])

    outs, ids = _ours_greedy(so, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        with torch.no_grad():
            out = model.generate(
                torch.tensor([prompt_ids]), max_new_tokens=8,
                do_sample=False, num_beams=1, pad_token_id=2)
        expect = out[0, len(prompt_ids):].tolist()
        assert got == expect


def test_mistral_model_embedding_arch(tmp_path):
    """Reference _EMBEDDING_MODELS: 'MistralModel' serves e5-mistral via
    the pooling path; checkpoints carry no lm_head."""
    import transformers as tf

    kw = dict(COMMON)
    kw["sliding_window"] = 32
    cfg = tf.MistralConfig(**kw)
    base = str(tmp_path / "mistral_base")
    make_tiny_checkpoint(base, cfg)
    emb = str(tmp_path / "e5")
    _save_renamed(base, emb, lambda n: None if n == "lm_head.weight" else n,
                  {"architectures": ["MistralModel"]})
    llm = LLM(model=emb, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    outs = llm.encode(["the quick brown fox"])
    v = np.asarray(outs[0].embedding)
    assert v.shape == (COMMON["hidden_size"],)
    assert np.isfinite(v).all()
