"""Phi-1.5/Phi-2: partial rotary (partial_rotary_factor), single-norm
parallel residual (attn and MLP both read ln1's output), biased LM head,
optional qk_layernorm (shared LayerNorm over head_dim on q and k before
rotary, HF modeling_phi PhiAttention).

Reference: aphrodite/modeling/models/phi.py (PhiForCausalLM).
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


class PhiForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "gelu_tanh"  # HF "gelu_new"
    parallel_residual = True
    single_norm = True
    lm_head_bias = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_eps", 1e-5))
        hf.setdefault("partial_rotary_factor", 0.5)
        self.qk_layernorm = bool(hf.get("qk_layernorm", False))
        super().__init__(model_config, parallel_config)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        if self.qk_layernorm:
            L, D = self.num_layers, self.head_dim
            for k in ("q_norm", "q_norm_b", "k_norm", "k_norm_b"):
                shapes["layers"][k] = (L, D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        if self.qk_layernorm:
            for k in ("q_norm", "q_norm_b", "k_norm", "k_norm_b"):
                specs["layers"][k] = P()
        return specs

    def qk_norm(self, q: jax.Array, k: jax.Array, lp: Dict[str, Any]):
        if not self.qk_layernorm:
            return q, k
        eps = self.rms_eps  # layer_norm_eps (mapped in __init__)

        def ln(x, w, b):  # shared LayerNorm over head_dim
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + eps) *
                    w.astype(jnp.float32) +
                    b.astype(jnp.float32)).astype(x.dtype)

        return (ln(q, lp["q_norm"], lp["q_norm_b"]),
                ln(k, lp["k_norm"], lp["k_norm_b"]))

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        la = "model.layers.{i}."
        extra = []
        if self.qk_layernorm:
            extra = [
                (la + "self_attn.q_layernorm.weight", "layers.q_norm",
                 False),
                (la + "self_attn.q_layernorm.bias", "layers.q_norm_b",
                 False),
                (la + "self_attn.k_layernorm.weight", "layers.k_norm",
                 False),
                (la + "self_attn.k_layernorm.bias", "layers.k_norm_b",
                 False),
            ]
        return extra + [
            (la + "input_layernorm.weight", "layers.input_norm", False),
            (la + "input_layernorm.bias", "layers.input_norm_b", False),
            (la + "self_attn.q_proj.weight", "layers.wq", True),
            (la + "self_attn.q_proj.bias", "layers.bq", False),
            (la + "self_attn.k_proj.weight", "layers.wk", True),
            (la + "self_attn.k_proj.bias", "layers.bk", False),
            (la + "self_attn.v_proj.weight", "layers.wv", True),
            (la + "self_attn.v_proj.bias", "layers.bv", False),
            (la + "self_attn.dense.weight", "layers.wo", True),
            (la + "self_attn.dense.bias", "layers.bo", False),
            (la + "mlp.fc1.weight", "layers.fc1", True),
            (la + "mlp.fc1.bias", "layers.fc1_b", False),
            (la + "mlp.fc2.weight", "layers.fc2", True),
            (la + "mlp.fc2.bias", "layers.fc2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("model.embed_tokens.weight", "embed", False),
            ("model.final_layernorm.weight", "final_norm", False),
            ("model.final_layernorm.bias", "final_norm_b", False),
            ("lm_head.weight", "lm_head", True),
            ("lm_head.bias", "lm_head_b", False),
        ]
