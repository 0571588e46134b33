"""Qwen3-MoE: Qwen3's per-head QK RMSNorm + sparse expert MLP.

Reference: aphrodite/modeling/models registry (qwen3_moe). Composes the
existing Qwen3 attention (q_norm/k_norm) with Mixtral's grouped-matmul
expert machinery; Qwen3-MoE's router takes softmax-over-all-experts
WITHOUT top-k renormalization unless norm_topk_prob is set.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh

from aphrodite_tpu.models.mixtral import MixtralForCausalLM
from aphrodite_tpu.models.qwen3 import Qwen3ForCausalLM
from aphrodite_tpu.ops.moe import moe_mlp


class Qwen3MoeForCausalLM(Qwen3ForCausalLM, MixtralForCausalLM):
    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        if hf.get("mlp_only_layers") or \
                int(hf.get("decoder_sparse_step", 1) or 1) != 1:
            raise NotImplementedError(
                "qwen3-moe dense/sparse layer mixing not supported yet")
        hf["intermediate_size"] = int(
            hf.get("moe_intermediate_size") or hf["intermediate_size"])
        hf.setdefault("num_local_experts", hf.get("num_experts", 8))
        MixtralForCausalLM.__init__(self, model_config, parallel_config)
        self.renormalize = bool(hf.get("norm_topk_prob", False))

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()  # Qwen3 -> Mixtral -> Llama
        return [("model.layers.{i}.mlp.gate.weight"
                 if path == "layers.router" else template, path, transpose)
                for template, path, transpose in maps]

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "model.layers.{i}.mlp.experts.{e}"
        return [
            (f"{p}.gate_proj.weight", "layers.w1", True),
            (f"{p}.up_proj.weight", "layers.w3", True),
            (f"{p}.down_proj.weight", "layers.w2", True),
        ]

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh: Optional[Mesh] = None, lora=None,
            lora_add=None) -> jax.Array:
        return moe_mlp(h, lp["router"], lp["w1"], lp["w3"], lp["w2"],
                       self.top_k, mesh=mesh,
                       renormalize=self.renormalize)
