"""Snowflake Arctic tests.

Two oracles:
- moe_layer_frequency=1 + use_residual=False makes Arctic exactly a
  Mixtral (same attention, same softmax-topk-renorm MoE, same weight
  names), so a renamed tiny Mixtral checkpoint anchors against real HF.
- The full interleaved structure (alternating dense/MoE layers with
  the parallel residual-MLP branch and Arctic's post-LN-of-layer-input
  quirk, reference arctic.py:330-349) has no transformers class; a
  from-scratch numpy forward written against the reference semantics
  is the oracle.
"""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

PROMPTS = ["the quick brown fox", "one two three four five"]


def test_arctic_all_moe_matches_mixtral(tmp_path):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    oracle = tf.MixtralForCausalLM(cfg).to(torch.float32)
    base = str(tmp_path / "mixtral_base")
    oracle.save_pretrained(base, safe_serialization=True)
    make_tiny_tokenizer(base, vocab_size=256)

    arctic = str(tmp_path / "arctic")
    os.makedirs(arctic)
    for fn in os.listdir(base):
        if fn != "config.json":
            os.link(os.path.join(base, fn), os.path.join(arctic, fn))
    with open(os.path.join(base, "config.json")) as f:
        c = json.load(f)
    c.update({"architectures": ["ArcticForCausalLM"],
              "model_type": "arctic", "moe_layer_frequency": 1,
              "use_residual": False})
    with open(os.path.join(arctic, "config.json"), "w") as f:
        json.dump(c, f)

    llm = LLM(model=arctic, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    oracle.eval()
    for prompt, out_req in zip(PROMPTS, outs):
        ids = tok.encode(prompt)
        with torch.no_grad():
            gen = oracle.generate(
                torch.tensor([ids]), max_new_tokens=12, do_sample=False,
                num_beams=1, pad_token_id=2)
        expect = gen[0, len(ids):].tolist()
        n = min(len(out_req.outputs[0].token_ids), len(expect))
        assert out_req.outputs[0].token_ids[:n] == expect[:n], prompt


# ---- full-structure oracle -----------------------------------------------

CFG = dict(vocab_size=256, hidden_size=64, intermediate_size=96,
           num_hidden_layers=5, num_attention_heads=4,
           num_key_value_heads=2, num_local_experts=4,
           num_experts_per_tok=2, moe_layer_frequency=2,
           use_residual=True, rms_norm_eps=1e-5, rope_theta=10000.0,
           max_position_embeddings=128, tie_word_embeddings=False)


def _make_arctic_checkpoint(save_dir, cfg, seed=5):
    from safetensors.numpy import save_file

    from tests.utils import make_tiny_tokenizer

    rng = np.random.default_rng(seed)
    H, F, E = (cfg["hidden_size"], cfg["intermediate_size"],
               cfg["num_local_experts"])
    NH, NKV = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    D = H // NH
    V, L, f = (cfg["vocab_size"], cfg["num_hidden_layers"],
               cfg["moe_layer_frequency"])

    def w(*shape):
        return (rng.standard_normal(shape).astype(np.float32)
                / np.sqrt(shape[-1]))

    t = {"model.embed_tokens.weight": w(V, H),
         "model.norm.weight": np.ones((H,), np.float32),
         "lm_head.weight": w(V, H)}
    for i in range(L):
        la = f"model.layers.{i}."
        t[la + "input_layernorm.weight"] = np.ones((H,), np.float32)
        t[la + "post_attention_layernorm.weight"] = np.ones((H,),
                                                            np.float32)
        t[la + "self_attn.q_proj.weight"] = w(NH * D, H)
        t[la + "self_attn.k_proj.weight"] = w(NKV * D, H)
        t[la + "self_attn.v_proj.weight"] = w(NKV * D, H)
        t[la + "self_attn.o_proj.weight"] = w(H, NH * D)
        if (i + 1) % f == 0:  # MoE layer
            t[la + "block_sparse_moe.gate.weight"] = w(E, H)
            for e in range(E):
                ep = la + f"block_sparse_moe.experts.{e}."
                t[ep + "w1.weight"] = w(F, H)
                t[ep + "w3.weight"] = w(F, H)
                t[ep + "w2.weight"] = w(H, F)
            if cfg["use_residual"]:
                t[la + "residual_layernorm.weight"] = np.ones(
                    (H,), np.float32)
                t[la + "residual_mlp.w1.weight"] = w(H, H)
                t[la + "residual_mlp.w3.weight"] = w(H, H)
                t[la + "residual_mlp.w2.weight"] = w(H, H)
        else:  # dense layer
            mp = la + "block_sparse_moe.mlp."
            t[mp + "w1.weight"] = w(F, H)
            t[mp + "w3.weight"] = w(F, H)
            t[mp + "w2.weight"] = w(H, F)
    os.makedirs(save_dir, exist_ok=True)
    save_file(t, os.path.join(save_dir, "model.safetensors"))
    with open(os.path.join(save_dir, "config.json"), "w") as fh:
        json.dump({"architectures": ["ArcticForCausalLM"],
                   "model_type": "arctic", **cfg}, fh)
    make_tiny_tokenizer(save_dir, vocab_size=V)
    return t


def _oracle_forward(t, cfg, ids):
    """Numpy forward per reference arctic.py semantics; returns final
    logits row."""
    H = cfg["hidden_size"]
    NH, NKV = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    D = H // NH
    eps, f = cfg["rms_norm_eps"], cfg["moe_layer_frequency"]
    k = cfg["num_experts_per_tok"]
    T = len(ids)

    def rms(x, wname):
        wv = t[wname]
        return (x / np.sqrt((x * x).mean(-1, keepdims=True) + eps)) * wv

    # NeoX rope tables.
    inv = 1.0 / cfg["rope_theta"] ** (np.arange(0, D, 2) / D)
    pos = np.arange(T)[:, None] * inv[None, :]
    cos, sin = np.cos(pos), np.sin(pos)

    def rope(x):  # [T, N, D]
        x1, x2 = x[..., :D // 2], x[..., D // 2:]
        return np.concatenate(
            [x1 * cos[:, None] - x2 * sin[:, None],
             x2 * cos[:, None] + x1 * sin[:, None]], axis=-1)

    def attention(x, la):
        h = rms(x, la + "input_layernorm.weight")
        q = (h @ t[la + "self_attn.q_proj.weight"].T).reshape(T, NH, D)
        kk = (h @ t[la + "self_attn.k_proj.weight"].T).reshape(T, NKV, D)
        v = (h @ t[la + "self_attn.v_proj.weight"].T).reshape(T, NKV, D)
        q, kk = rope(q), rope(kk)
        rep = NH // NKV
        kk = np.repeat(kk, rep, axis=1)
        v = np.repeat(v, rep, axis=1)
        scores = np.einsum("tnd,snd->nts", q, kk) / np.sqrt(D)
        mask = np.tril(np.ones((T, T), bool))
        scores = np.where(mask[None], scores, -1e30)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        attn = np.einsum("nts,snd->tnd", p, v).reshape(T, NH * D)
        return x + attn @ t[la + "self_attn.o_proj.weight"].T

    def silu(z):
        return z / (1.0 + np.exp(-z))

    def swiglu(h, prefix):
        return (silu(h @ t[prefix + "w1.weight"].T)
                * (h @ t[prefix + "w3.weight"].T)) \
            @ t[prefix + "w2.weight"].T

    def moe(h, la):
        logits = h @ t[la + "block_sparse_moe.gate.weight"].T
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        topk = np.argsort(-p, axis=-1)[:, :k]
        wgt = np.take_along_axis(p, topk, axis=-1)
        if k > 1:
            wgt = wgt / wgt.sum(-1, keepdims=True)
        out = np.zeros_like(h)
        for row in range(h.shape[0]):
            for j in range(k):
                e = topk[row, j]
                ep = la + f"block_sparse_moe.experts.{e}."
                out[row] += wgt[row, j] * swiglu(h[row:row + 1], ep)[0]
        return out

    x = t["model.embed_tokens.weight"][ids]
    for i in range(cfg["num_hidden_layers"]):
        la = f"model.layers.{i}."
        is_moe = (i + 1) % f == 0
        x_in = x
        x = attention(x, la)
        if is_moe and cfg["use_residual"]:
            res = swiglu(rms(x, la + "residual_layernorm.weight"),
                         la + "residual_mlp.")
            m = moe(rms(x_in, la + "post_attention_layernorm.weight"),
                    la)
            x = x + res + m
        elif is_moe:
            x = x + moe(rms(x, la + "post_attention_layernorm.weight"),
                        la)
        else:
            x = x + swiglu(
                rms(x, la + "post_attention_layernorm.weight"),
                la + "block_sparse_moe.mlp.")
    x = rms(x, "model.norm.weight")
    return x[-1] @ t["lm_head.weight"].T


def test_arctic_interleaved_residual_matches_numpy_oracle(tmp_path):
    path = str(tmp_path / "arctic_full")
    t = _make_arctic_checkpoint(path, CFG)
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out_req in zip(PROMPTS, outs):
        ids = list(tok.encode(prompt))
        expect = []
        cur = list(ids)
        for _ in range(10):
            nxt = int(np.argmax(_oracle_forward(t, CFG, cur)))
            expect.append(nxt)
            cur.append(nxt)
        assert out_req.outputs[0].token_ids == expect, prompt


def test_arctic_ep2_matches_ep1(tmp_path):
    path = str(tmp_path / "arctic_tp")
    _make_arctic_checkpoint(path, CFG)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    one = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    base = [o.outputs[0].token_ids for o in one.generate(PROMPTS, sp)]
    two = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8,
              tensor_parallel_size=2)
    got = [o.outputs[0].token_ids for o in two.generate(PROMPTS, sp)]
    assert got == base
