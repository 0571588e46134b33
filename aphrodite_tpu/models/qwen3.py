"""Qwen3 decoder: Llama/Qwen2 topology + per-head-dim RMS QK-norm.

Reference lineage: aphrodite models registry (qwen2.py) extended with
the Qwen3 architecture's q_norm/k_norm (RMSNorm over head_dim applied
before RoPE, no attention bias).
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.models.layers import rms_norm


class Qwen3ForCausalLM(LlamaForCausalLM):
    attention_bias = False

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, D = self.num_layers, self.head_dim
        shapes["layers"]["q_norm"] = (L, D)
        shapes["layers"]["k_norm"] = (L, D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        maps += [
            ("model.layers.{i}.self_attn.q_norm.weight", "layers.q_norm",
             False),
            ("model.layers.{i}.self_attn.k_norm.weight", "layers.k_norm",
             False),
        ]
        return maps

    def qk_norm(self, q: jax.Array, k: jax.Array,
                lp: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        qn, _ = rms_norm(q, lp["q_norm"], self.rms_eps)
        kn, _ = rms_norm(k, lp["k_norm"], self.rms_eps)
        return qn, kn
