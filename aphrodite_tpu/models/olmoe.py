"""OLMoE: sparse-MoE Llama topology with FULL-WIDTH RMS QK-norm applied
before the head reshape (unlike Qwen3's per-head norm).

Reference: aphrodite models registry (olmoe). Expert machinery shared
with Mixtral (grouped matmuls, EP sharding); router takes softmax over
all experts without top-k renormalization unless norm_topk_prob.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.models.layers import rms_norm
from aphrodite_tpu.models.mixtral import MixtralForCausalLM
from aphrodite_tpu.ops.moe import moe_mlp


class OlmoeForCausalLM(MixtralForCausalLM):
    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("num_local_experts", hf.get("num_experts", 64))
        super().__init__(model_config, parallel_config)
        self.renormalize = bool(hf.get("norm_topk_prob", False))

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, NH, NKV, D = (self.num_layers, self.num_heads,
                         self.num_kv_heads_padded, self.head_dim)
        shapes["layers"]["q_norm"] = (L, NH * D)
        shapes["layers"]["k_norm"] = (L, NKV * D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        maps = [("model.layers.{i}.mlp.gate.weight"
                 if path == "layers.router" else template, path, transpose)
                for template, path, transpose in maps]
        return maps + [
            ("model.layers.{i}.self_attn.q_norm.weight", "layers.q_norm",
             False),
            ("model.layers.{i}.self_attn.k_norm.weight", "layers.k_norm",
             False),
        ]

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "model.layers.{i}.mlp.experts.{e}"
        return [
            (f"{p}.gate_proj.weight", "layers.w1", True),
            (f"{p}.up_proj.weight", "layers.w3", True),
            (f"{p}.down_proj.weight", "layers.w2", True),
        ]

    def maybe_pad_kv_weight(self, our_path: str,
                            arr: np.ndarray) -> np.ndarray:
        if our_path == "layers.k_norm" and \
                self.num_kv_heads_padded != self.num_kv_heads:
            reps = self.num_kv_heads_padded // self.num_kv_heads
            arr = arr.reshape(self.num_kv_heads, self.head_dim)
            return np.repeat(arr, reps, axis=0).reshape(-1)
        return super().maybe_pad_kv_weight(our_path, arr)

    def qk_norm(self, q: jax.Array, k: jax.Array,
                lp: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        # Full-width RMS over the flattened head dims (HF applies the
        # norm on the projection output before the view into heads).
        T = q.shape[0]
        qn, _ = rms_norm(q.reshape(T, -1), lp["q_norm"], self.rms_eps)
        kn, _ = rms_norm(k.reshape(T, -1), lp["k_norm"], self.rms_eps)
        return (qn.reshape(q.shape).astype(q.dtype),
                kn.reshape(k.shape).astype(k.dtype))

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh: Optional[Mesh] = None, lora=None,
            lora_add=None) -> jax.Array:
        return moe_mlp(h, lp["router"], lp["w1"], lp["w3"], lp["w2"],
                       self.top_k, mesh=mesh,
                       renormalize=self.renormalize)
