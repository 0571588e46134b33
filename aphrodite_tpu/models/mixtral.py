"""Mixtral (sparse MoE decoder).

Reference: aphrodite/modeling/models/mixtral.py (MixtralForCausalLM with
FusedMoE layer). Attention is identical to Llama; the MLP is a top-2
routed mixture of SwiGLU experts executed as grouped matmuls
(ops/moe.py — the TPU analog of the reference's fused_moe Triton kernel
and its megablox gmm TPU path, modeling/layers/fused_moe/moe_pallas.py).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.ops.moe import moe_mlp


class MixtralForCausalLM(LlamaForCausalLM):
    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.num_experts = int(hf.get("num_local_experts", 8))
        self.top_k = int(hf.get("num_experts_per_tok", 2))

    # ---- params ----------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, H, F, E = (self.num_layers, self.hidden_size,
                      self.intermediate_size, self.num_experts)
        layers = shapes["layers"]
        for k in ("gate", "up", "down"):
            layers.pop(k)
        layers["router"] = (L, H, E)
        layers["w1"] = (L, E, H, F)
        layers["w3"] = (L, E, H, F)
        layers["w2"] = (L, E, F, H)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("gate", "up", "down"):
            layers.pop(k)
        # Experts sharded over "model" (EP); router replicated.
        layers["router"] = P()
        layers["w1"] = P(None, "model", None, None)
        layers["w3"] = P(None, "model", None, None)
        layers["w2"] = P(None, "model", None, None)
        return specs

    def quantizable_weights(self) -> List[str]:
        return ["layers.wq", "layers.wk", "layers.wv", "layers.wo"]

    def expert_weights(self) -> List[str]:
        """MoE expert stacks (experts_int8 load-time quantization)."""
        return ["layers.w1", "layers.w3", "layers.w2"]

    # ---- loading ---------------------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [m for m in super().hf_param_mappings()
                if not m[1].startswith("layers.gate")
                and not m[1].startswith("layers.up")
                and not m[1].startswith("layers.down")]
        maps.append(("model.layers.{i}.block_sparse_moe.gate.weight",
                     "layers.router", True))
        return maps

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "model.layers.{i}.block_sparse_moe.experts.{e}"
        return [
            (f"{p}.w1.weight", "layers.w1", True),
            (f"{p}.w3.weight", "layers.w3", True),
            (f"{p}.w2.weight", "layers.w2", True),
        ]

    # ---- forward ---------------------------------------------------------

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh: Optional[Mesh] = None, lora=None,
            lora_add=None) -> jax.Array:
        # LoRA on expert weights is not supported (reference likewise
        # restricts LoRA targets on MoE layers).
        return moe_mlp(h, lp["router"], lp["w1"], lp["w3"], lp["w2"],
                       self.top_k, mesh=mesh)
