"""Phi-3-Small tests: blocksparse attention, gegelu MLP, muP scales.

No transformers class exists (remote-code arch), so the oracle is a
from-scratch numpy forward implementing the reference semantics
(aphrodite/modeling/models/phi3_small.py + the blocksparse mask rule in
attention/ops/blocksparse_attention/utils.py:117-120, hetero-head
variant utils.py:206-219).
"""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

PROMPTS = ["the quick brown fox jumps over", "one two three four"]

CFG = dict(vocab_size=256, hidden_size=64, intermediate_size=96,
           num_hidden_layers=4, num_attention_heads=4,
           num_key_value_heads=2, layer_norm_epsilon=1e-5,
           rope_embedding_base=10000.0, rope_position_scale=1.0,
           max_position_embeddings=128,
           blocksparse_block_size=4, blocksparse_num_local_blocks=2,
           blocksparse_vert_stride=3,
           blocksparse_homo_head_pattern=False,
           dense_attention_every_n_layers=2,
           mup_use_scaling=True, mup_attn_multiplier=1.0,
           mup_embedding_multiplier=2.0, mup_width_multiplier=4.0,
           gegelu_limit=0.5, hidden_act="gegelu",
           dummy_token_indices=[250, 251])


def _make_checkpoint(save_dir, cfg, seed=7):
    from safetensors.numpy import save_file

    from tests.utils import make_tiny_tokenizer

    rng = np.random.default_rng(seed)
    H, F = cfg["hidden_size"], cfg["intermediate_size"]
    NH, KV = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    D = H // NH
    V, L = cfg["vocab_size"], cfg["num_hidden_layers"]
    g = NH // KV

    def w(*shape):
        return (rng.standard_normal(shape).astype(np.float32)
                / np.sqrt(shape[-1]))

    t = {"model.embed_tokens.weight": w(V, H),
         "model.final_layernorm.weight": np.ones((H,), np.float32),
         "model.final_layernorm.bias": w(H) * 0.1}
    for i in range(L):
        la = f"model.layers.{i}."
        t[la + "input_layernorm.weight"] = np.ones((H,), np.float32)
        t[la + "input_layernorm.bias"] = w(H) * 0.1
        t[la + "post_attention_layernorm.weight"] = np.ones(
            (H,), np.float32)
        t[la + "post_attention_layernorm.bias"] = w(H) * 0.1
        # Head-major fused qkv: [KV, g+2, D] groups on the output dim.
        t[la + "self_attn.query_key_value.weight"] = w(
            KV * (g + 2) * D, H)
        t[la + "self_attn.query_key_value.bias"] = w(
            KV * (g + 2) * D) * 0.1
        t[la + "self_attn.dense.weight"] = w(H, H)
        t[la + "self_attn.dense.bias"] = w(H) * 0.1
        # Fused up_proj with interleaved gelu/linear columns.
        t[la + "mlp.up_proj.weight"] = w(2 * F, H)
        t[la + "mlp.up_proj.bias"] = w(2 * F) * 0.1
        t[la + "mlp.down_proj.weight"] = w(H, F)
        t[la + "mlp.down_proj.bias"] = w(H) * 0.1
    os.makedirs(save_dir, exist_ok=True)
    save_file(t, os.path.join(save_dir, "model.safetensors"))
    with open(os.path.join(save_dir, "config.json"), "w") as fh:
        json.dump({"architectures": ["Phi3SmallForCausalLM"],
                   "model_type": "phi3small", **cfg}, fh)
    make_tiny_tokenizer(save_dir, vocab_size=V)
    return t


def _oracle_forward(t, cfg, ids):
    H, F = cfg["hidden_size"], cfg["intermediate_size"]
    NH, KV = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    D = H // NH
    g = NH // KV
    eps = cfg["layer_norm_epsilon"]
    T = len(ids)
    bsz = cfg["blocksparse_block_size"]
    local = cfg["blocksparse_num_local_blocks"]
    vert = cfg["blocksparse_vert_stride"]
    step = (0 if cfg["blocksparse_homo_head_pattern"]
            else max(1, vert // NH))
    dense_every = cfg["dense_attention_every_n_layers"]
    scale = (cfg["mup_attn_multiplier"] / D if cfg["mup_use_scaling"]
             else 1.0 / np.sqrt(D))

    def ln(x, wname, bname):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * t[wname] + t[bname]

    inv = 1.0 / cfg["rope_embedding_base"] ** (np.arange(0, D, 2) / D)
    pos = np.arange(T)[:, None] * inv[None, :]
    cos, sin = np.cos(pos), np.sin(pos)

    def rope(x):
        x1, x2 = x[..., :D // 2], x[..., D // 2:]
        return np.concatenate(
            [x1 * cos[:, None] - x2 * sin[:, None],
             x2 * cos[:, None] + x1 * sin[:, None]], axis=-1)

    def attention(x, la, sparse):
        h = ln(x, la + "input_layernorm.weight",
               la + "input_layernorm.bias")
        qkv = (h @ t[la + "self_attn.query_key_value.weight"].T
               + t[la + "self_attn.query_key_value.bias"])
        qkv = qkv.reshape(T, KV, g + 2, D)
        q = qkv[:, :, :g, :].reshape(T, NH, D)
        k = qkv[:, :, g, :]  # [T, KV, D]
        v = qkv[:, :, g + 1, :]
        q, k = rope(q), rope(k)
        k = np.repeat(k, g, axis=1)
        v = np.repeat(v, g, axis=1)
        scores = np.einsum("tnd,snd->nts", q, k) * scale
        mask = np.tril(np.ones((T, T), bool))[None].repeat(NH, 0)
        if sparse:
            bq = np.arange(T)[:, None] // bsz
            bk = np.arange(T)[None, :] // bsz
            local_ok = (bq - bk) < local
            for hh in range(NH):
                vert_ok = ((bk + hh * step + 1) % vert) == 0
                mask[hh] &= local_ok | vert_ok
        scores = np.where(mask, scores, -1e30)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        attn = np.einsum("nts,snd->tnd", p, v).reshape(T, NH * D)
        return x + (attn @ t[la + "self_attn.dense.weight"].T
                    + t[la + "self_attn.dense.bias"])

    def gegelu_mlp(h, la):
        z = (h @ t[la + "mlp.up_proj.weight"].T
             + t[la + "mlp.up_proj.bias"])
        a_g, a_l = z[..., 0::2], z[..., 1::2]
        lim = cfg["gegelu_limit"]
        a_g = np.minimum(a_g, lim)
        a_l = np.clip(a_l, -lim, lim)
        act = (a_g / (1 + np.exp(-1.702 * a_g))) * (a_l + 1)
        return (act @ t[la + "mlp.down_proj.weight"].T
                + t[la + "mlp.down_proj.bias"])

    x = (t["model.embed_tokens.weight"][ids]
         * cfg["mup_embedding_multiplier"])
    for i in range(cfg["num_hidden_layers"]):
        la = f"model.layers.{i}."
        sparse = not (dense_every and (i + 1) % dense_every == 0)
        x = attention(x, la, sparse)
        x = x + gegelu_mlp(
            ln(x, la + "post_attention_layernorm.weight",
               la + "post_attention_layernorm.bias"), la)
    x = ln(x, "model.final_layernorm.weight",
           "model.final_layernorm.bias")
    logits = (x[-1] @ t["model.embed_tokens.weight"].T
              / cfg["mup_width_multiplier"])
    logits[np.asarray(cfg["dummy_token_indices"])] = -1e30
    return logits


def test_phi3small_matches_numpy_oracle(tmp_path):
    path = str(tmp_path / "phi3small")
    t = _make_checkpoint(path, CFG)
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=14, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out_req in zip(PROMPTS, outs):
        ids = list(tok.encode(prompt))
        expect = []
        cur = list(ids)
        for _ in range(14):
            nxt = int(np.argmax(_oracle_forward(t, CFG, cur)))
            expect.append(nxt)
            cur.append(nxt)
        assert out_req.outputs[0].token_ids == expect, prompt


def test_phi3small_dummy_tokens_never_sampled(tmp_path):
    path = str(tmp_path / "phi3small_dummy")
    _make_checkpoint(path, CFG, seed=9)
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    sp = SamplingParams(temperature=1.0, seed=3, max_tokens=24,
                        ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for o in outs:
        assert not set(o.outputs[0].token_ids) & {250, 251}


def test_phi3small_tp2_matches_tp1(tmp_path):
    """Hetero-head vertical phases must follow GLOBAL head indices
    under tensor parallelism."""
    path = str(tmp_path / "phi3small_tp")
    _make_checkpoint(path, CFG)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    one = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    base = [o.outputs[0].token_ids for o in one.generate(PROMPTS, sp)]
    two = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8, tensor_parallel_size=2)
    got = [o.outputs[0].token_ids for o in two.generate(PROMPTS, sp)]
    assert got == base
