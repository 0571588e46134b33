"""Remote-code architectures, batch 2: QWen v1, ChatGLM2/3, JAIS,
DeciLM. Same strategy as test_model_zoo_remote.py: build a tiny
checkpoint with an equivalent-math oracle (a native HF class or a
hand-written reference), rewrite it into the remote arch's tensor/config
scheme, and require exact greedy parity.
"""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.test_model_zoo_remote import (_hf_greedy_with_class,
                                         _load_tensors, _ours_greedy,
                                         _save_renamed)
from tests.utils import make_tiny_checkpoint, make_tiny_tokenizer

PROMPTS = ["the quick brown fox", "hello world"]


def test_qwen_v1_matches_qwen2_oracle(tmp_path):
    import transformers as tf

    cfg = tf.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4,  # QWen v1 is MHA
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_theta=10000.0, use_sliding_window=False)
    base = str(tmp_path / "qwen2_base")
    make_tiny_checkpoint(base, cfg)

    def transform(tensors):
        out = dict(tensors)
        for i in range(2):
            p = f"model.layers.{i}.self_attn"
            qw = out.pop(f"{p}.q_proj.weight")
            kw = out.pop(f"{p}.k_proj.weight")
            vw = out.pop(f"{p}.v_proj.weight")
            out[f"transformer.h.{i}.attn.c_attn.weight"] = \
                np.concatenate([qw, kw, vw], axis=0)
            qb = out.pop(f"{p}.q_proj.bias")
            kb = out.pop(f"{p}.k_proj.bias")
            vb = out.pop(f"{p}.v_proj.bias")
            out[f"transformer.h.{i}.attn.c_attn.bias"] = \
                np.concatenate([qb, kb, vb], axis=0)
        return out

    def rename(n):
        n = n.replace("model.embed_tokens.weight",
                      "transformer.wte.weight")
        n = n.replace("model.norm.weight", "transformer.ln_f.weight")
        n = n.replace("model.layers.", "transformer.h.")
        n = n.replace(".input_layernorm.weight", ".ln_1.weight")
        n = n.replace(".post_attention_layernorm.weight", ".ln_2.weight")
        n = n.replace(".self_attn.o_proj.", ".attn.c_proj.")
        n = n.replace(".mlp.gate_proj.", ".mlp.w2.")
        n = n.replace(".mlp.up_proj.", ".mlp.w1.")
        n = n.replace(".mlp.down_proj.", ".mlp.c_proj.")
        return n

    qw = str(tmp_path / "qwen_v1")
    _save_renamed(base, qw, rename, {
        "architectures": ["QWenLMHeadModel"],
        "intermediate_size": 256,  # declared at 2x actual
        "layer_norm_epsilon": 1e-6,
        "rotary_emb_base": 10000.0,
        "seq_length": 128,
    }, tensor_transform=transform)
    outs, ids = _ours_greedy(qw, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "Qwen2ForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_chatglm_matches_glm_oracle(tmp_path):
    import transformers as tf

    cfg = tf.GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_theta=10000.0, pad_token_id=2, eos_token_id=2,
        bos_token_id=1)
    base = str(tmp_path / "glm_base")
    make_tiny_checkpoint(base, cfg)

    def transform(tensors):
        out = dict(tensors)
        for i in range(2):
            p = f"model.layers.{i}.self_attn"
            qw = out.pop(f"{p}.q_proj.weight")
            kw = out.pop(f"{p}.k_proj.weight")
            vw = out.pop(f"{p}.v_proj.weight")
            out[f"transformer.encoder.layers.{i}.self_attention."
                f"query_key_value.weight"] = \
                np.concatenate([qw, kw, vw], axis=0)
            qb = out.pop(f"{p}.q_proj.bias")
            kb = out.pop(f"{p}.k_proj.bias")
            vb = out.pop(f"{p}.v_proj.bias")
            out[f"transformer.encoder.layers.{i}.self_attention."
                f"query_key_value.bias"] = \
                np.concatenate([qb, kb, vb], axis=0)
        return out

    def rename(n):
        n = n.replace("model.embed_tokens.weight",
                      "transformer.embedding.word_embeddings.weight")
        n = n.replace("model.norm.weight",
                      "transformer.encoder.final_layernorm.weight")
        n = n.replace("lm_head.weight", "transformer.output_layer.weight")
        n = n.replace("model.layers.", "transformer.encoder.layers.")
        n = n.replace(".self_attn.o_proj.", ".self_attention.dense.")
        n = n.replace(".mlp.gate_up_proj.", ".mlp.dense_h_to_4h.")
        n = n.replace(".mlp.down_proj.", ".mlp.dense_4h_to_h.")
        return n

    glm = str(tmp_path / "chatglm")
    _save_renamed(base, glm, rename, {
        "architectures": ["ChatGLMModel"],
        "num_layers": 2,
        "ffn_hidden_size": 128,
        "padded_vocab_size": 256,
        "layernorm_epsilon": 1e-6,
        "rmsnorm": True,
        "multi_query_attention": True,
        "multi_query_group_num": 2,
        "add_qkv_bias": True,
        "add_bias_linear": False,
        "kv_channels": 16,
        "seq_length": 128,
        "apply_residual_connection_post_layernorm": False,
    }, tensor_transform=transform)
    outs, ids = _ours_greedy(glm, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "GlmForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def test_decilm_variable_gqa_matches_llama_oracle(tmp_path):
    import transformers as tf

    from safetensors.numpy import save_file

    cfg = tf.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False)
    base = str(tmp_path / "llama_base")
    make_tiny_checkpoint(base, cfg)
    D = 16  # head_dim

    # Make layer 1's two kv heads identical so a 1-head degrouped copy
    # is mathematically equivalent.
    tensors = _load_tensors(base)
    for w in ("k_proj", "v_proj"):
        t = tensors[f"model.layers.1.self_attn.{w}.weight"]
        t[D:2 * D] = t[:D]
    save_file(tensors, os.path.join(base, "model.safetensors"))

    def transform(tensors):
        out = dict(tensors)
        for w in ("k_proj", "v_proj"):
            t = out[f"model.layers.1.self_attn.{w}.weight"]
            out[f"model.layers.1.self_attn.{w}.weight"] = \
                np.ascontiguousarray(t[:D])  # keep only head 0
        return out

    deci = str(tmp_path / "decilm")
    _save_renamed(base, deci, lambda n: n, {
        "architectures": ["DeciLMForCausalLM"],
        "num_key_value_heads_per_layer": [2, 1],
    }, tensor_transform=transform)
    outs, ids = _ours_greedy(deci, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(base, "LlamaForCausalLM",
                                       prompt_ids, 8)
        assert got == expect


def _jais_reference_greedy(t, cfg, prompt_ids, n):
    """Independent numpy implementation of the JAIS forward."""
    H, NH = cfg["n_embd"], cfg["n_head"]
    D = H // NH
    ids = list(prompt_ids)
    from aphrodite_tpu.models.bloom import get_alibi_slopes

    slopes = get_alibi_slopes(NH)

    def ln(x, w, b, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    for _ in range(n):
        T = len(ids)
        x = t["transformer.wte.weight"][ids] * cfg["embeddings_scale"]
        for i in range(cfg["n_layer"]):
            p = f"transformer.h.{i}."
            hn = ln(x, t[p + "ln_1.weight"], t[p + "ln_1.bias"])
            qkv = hn @ t[p + "attn.c_attn.weight"] + \
                t[p + "attn.c_attn.bias"]
            q, k, v = np.split(qkv, 3, axis=-1)
            q = q.reshape(T, NH, D)
            k = k.reshape(T, NH, D)
            v = v.reshape(T, NH, D)
            scale = (1.0 / D if cfg.get("scale_qk_dot_by_d")
                     else D ** -0.5)
            scores = np.einsum("ihd,jhd->hij", q, k) * scale
            pos = np.arange(T)
            dist = pos[None, :] - pos[:, None]  # j - i
            scores = scores + slopes[:, None, None] * dist[None]
            scores = np.where(dist[None] > 0, -1e30, scores)
            attn = np.exp(scores - scores.max(-1, keepdims=True))
            attn /= attn.sum(-1, keepdims=True)
            out = np.einsum("hij,jhd->ihd", attn, v).reshape(T, H)
            x = x + out @ t[p + "attn.c_proj.weight"] + \
                t[p + "attn.c_proj.bias"]
            hn = ln(x, t[p + "ln_2.weight"], t[p + "ln_2.bias"])
            g = hn @ t[p + "mlp.c_fc.weight"] + t[p + "mlp.c_fc.bias"]
            u = hn @ t[p + "mlp.c_fc2.weight"] + t[p + "mlp.c_fc2.bias"]
            silu = g / (1.0 + np.exp(-g))
            x = x + (silu * u) @ t[p + "mlp.c_proj.weight"] + \
                t[p + "mlp.c_proj.bias"]
        x = ln(x, t["transformer.ln_f.weight"],
               t["transformer.ln_f.bias"])
        logits = x[-1] @ t["transformer.wte.weight"].T
        logits = logits * cfg["width_scale"]
        ids.append(int(np.argmax(logits)))
    return ids[len(prompt_ids):]


def test_jais_matches_reference_impl(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    cfg = dict(n_embd=64, n_head=4, n_layer=2, n_inner=96,
               vocab_size=256, embeddings_scale=3.0, width_scale=0.5,
               scale_qk_dot_by_d=True,
               position_embedding_type="alibi",
               activation_function="swiglu",
               layer_norm_epsilon=1e-5, n_positions=128)
    H, F, V = 64, 96, 256
    t = {"transformer.wte.weight":
         (rng.standard_normal((V, H)) * 0.1).astype(np.float32),
         "transformer.ln_f.weight": np.ones(H, np.float32),
         "transformer.ln_f.bias": np.zeros(H, np.float32)}
    for i in range(2):
        p = f"transformer.h.{i}."
        s = 0.1

        def r(*shape):
            return (rng.standard_normal(shape) * s).astype(np.float32)

        t[p + "ln_1.weight"] = np.ones(H, np.float32)
        t[p + "ln_1.bias"] = np.zeros(H, np.float32)
        t[p + "ln_2.weight"] = np.ones(H, np.float32)
        t[p + "ln_2.bias"] = np.zeros(H, np.float32)
        t[p + "attn.c_attn.weight"] = r(H, 3 * H)
        t[p + "attn.c_attn.bias"] = r(3 * H)
        t[p + "attn.c_proj.weight"] = r(H, H)
        t[p + "attn.c_proj.bias"] = r(H)
        t[p + "mlp.c_fc.weight"] = r(H, F)
        t[p + "mlp.c_fc.bias"] = r(F)
        t[p + "mlp.c_fc2.weight"] = r(H, F)
        t[p + "mlp.c_fc2.bias"] = r(F)
        t[p + "mlp.c_proj.weight"] = r(F, H)
        t[p + "mlp.c_proj.bias"] = r(H)

    d = str(tmp_path / "jais")
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"architectures": ["JAISLMHeadModel"],
                   "tie_word_embeddings": True, **cfg}, f)
    make_tiny_tokenizer(d, vocab_size=256)

    outs, ids = _ours_greedy(d, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _jais_reference_greedy(t, cfg, prompt_ids, 8)
        assert got == expect


def test_phimoe_matches_hf(tmp_path):
    import transformers as tf

    cfg = tf.PhimoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, attention_bias=True, lm_head_bias=True,
        rope_theta=10000.0, max_position_embeddings=128,
        tie_word_embeddings=False, router_jitter_noise=0.01,
        input_jitter_noise=0.0, sliding_window=None)
    d = str(tmp_path / "phimoe")
    make_tiny_checkpoint(d, cfg)
    outs, ids = _ours_greedy(d, PROMPTS, 8)
    for prompt_ids, got in zip(ids, outs):
        expect = _hf_greedy_with_class(d, "PhimoeForCausalLM",
                                       prompt_ids, 8)
        assert got == expect
