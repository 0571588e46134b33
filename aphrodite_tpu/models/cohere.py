"""Cohere Command-R / Command-R+: GPT-J interleaved rotary, bias-free
LayerNorm, single-norm parallel residual (attn + gated-SiLU MLP both
read ln1), tied embeddings with a logit_scale multiplier. Command-R+
adds use_qk_norm: bias-free PER-HEAD LayerNorm on q and k before
rotary (reference commandr.py:146-187 — weight shape (num_heads,
head_dim), normalized over head_dim).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


class CohereForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
    norm_bias = False
    parallel_residual = True
    single_norm = True
    rope_style = "gptj"
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_eps", 1e-5))
        self.use_qk_norm = bool(hf.get("use_qk_norm", False))
        super().__init__(model_config, parallel_config)
        self.logit_scale = float(hf.get("logit_scale", 1.0))

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        if self.use_qk_norm:
            L, D = self.num_layers, self.head_dim
            shapes["layers"]["q_norm"] = (L, self.num_heads, D)
            shapes["layers"]["k_norm"] = (L, self.num_kv_heads_padded, D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        if self.use_qk_norm:
            specs["layers"]["q_norm"] = P(None, "model", None)
            specs["layers"]["k_norm"] = P(None, "model", None)
        return specs

    def hf_param_mappings(self):
        # Same HF names as llama minus post_attention_layernorm (the
        # single norm feeds both branches) and minus all biases.
        maps = super().hf_param_mappings()
        maps = [(t, p, tr) for t, p, tr in maps
                if "post_attention_layernorm" not in t]
        if self.use_qk_norm:
            maps += [
                ("model.layers.{i}.self_attn.q_norm.weight",
                 "layers.q_norm", False),
                ("model.layers.{i}.self_attn.k_norm.weight",
                 "layers.k_norm", False),
            ]
        return maps

    def maybe_pad_kv_weight(self, our_path: str,
                            arr: np.ndarray) -> np.ndarray:
        if (our_path == "layers.k_norm"
                and self.num_kv_heads_padded != self.num_kv_heads):
            reps = self.num_kv_heads_padded // self.num_kv_heads
            # Repeat in place like wk/wv so shard i's k-norm weights
            # match its replicated kv heads.
            return np.repeat(arr, reps, axis=0)
        return super().maybe_pad_kv_weight(our_path, arr)

    def qk_norm(self, q: jax.Array, k: jax.Array, lp: Dict[str, Any]):
        if not self.use_qk_norm:
            return q, k
        eps = self.rms_eps  # layer_norm_eps (mapped in __init__)

        def ln(x, w):  # per-head bias-free LayerNorm over head_dim
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + eps) *
                    w.astype(jnp.float32)).astype(x.dtype)

        return ln(q, lp["q_norm"]), ln(k, lp["k_norm"])
