"""MiniCPM (OpenBMB 1.2B/2.4B, incl. the MoE variant): Llama naming plus
muP-style multipliers — embeddings x scale_emb, residual branches x
scale_depth/sqrt(L), logits / (hidden_size / dim_model_base).

Reference: aphrodite/modeling/models/minicpm.py (residual scaling
minicpm.py:332-339, embedding scale :379, scale_width logits :467-496,
MoE block :60-110 with mixtral-style softmax-topk-renormalize routing).
"""

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.models.deepseek import DeepseekV3ForCausalLM
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.ops.moe import moe_mlp


class MiniCPMForCausalLM(LlamaForCausalLM):
    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.embedding_multiplier = float(hf.get("scale_emb", 1.0))
        depth = float(hf.get("scale_depth", 1.0))
        self.residual_multiplier = depth / math.sqrt(self.num_layers)
        base = float(hf.get("dim_model_base") or self.hidden_size)
        self.logit_scale = base / self.hidden_size
        self.num_experts = int(hf.get("num_experts") or 0)
        self.top_k = int(hf.get("num_experts_per_tok") or 0)

    # ---- MoE variant (num_experts > 0) --------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        if not self.num_experts:
            return shapes
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
        if not self.num_experts:
            return specs
        layers = specs["layers"]
        for k in ("gate", "up", "down"):
            layers.pop(k)
        layers["router"] = P()
        layers["w1"] = P(None, "model", None, None)
        layers["w3"] = P(None, "model", None, None)
        layers["w2"] = P(None, "model", None, None)
        return specs

    def quantizable_weights(self) -> List[str]:
        if not self.num_experts:
            return super().quantizable_weights()
        return ["layers.wq", "layers.wk", "layers.wv", "layers.wo"]

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        if not self.num_experts:
            return maps
        maps = [m for m in maps
                if m[1] not in ("layers.gate", "layers.up", "layers.down")]
        maps.append(("model.layers.{i}.mlp.gate.weight", "layers.router",
                     True))
        return maps

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        if not self.num_experts:
            return []
        p = "model.layers.{i}.mlp.experts.{e}"
        return [
            (f"{p}.w1.weight", "layers.w1", True),
            (f"{p}.w3.weight", "layers.w3", True),
            (f"{p}.w2.weight", "layers.w2", True),
        ]

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh: Optional[Mesh] = None, lora=None,
            lora_add=None) -> jax.Array:
        if not self.num_experts:
            return super().mlp(lp, h, mesh=mesh, lora=lora,
                               lora_add=lora_add)
        return moe_mlp(h, lp["router"], lp["w1"], lp["w3"], lp["w2"],
                       self.top_k, mesh=mesh)


class MiniCPM3ForCausalLM(DeepseekV3ForCausalLM):
    """MiniCPM3 (4B): DeepSeek-V2-style MLA attention (low-rank q AND
    kv projections) on the MiniCPM muP stack — embeddings x scale_emb,
    residual branches x scale_depth/sqrt(L), logits x dim_model_base/H.
    Dense SwiGLU MLPs (no n_routed_experts key -> the MLA stack runs
    all-dense). Unlike DeepSeek, the rotary on the rope dims is
    NeoX-style (reference minicpm3.py:109 get_rope default vs
    deepseek_v2.py:236 is_neox_style=False).

    Reference: aphrodite/modeling/models/minicpm3.py.
    """

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        if "rope_interleave" not in hf:
            self.rope_interleave = False
        self.embedding_multiplier = float(hf.get("scale_emb", 1.0))
        depth = float(hf.get("scale_depth", 1.0))
        self.residual_multiplier = depth / math.sqrt(self.num_layers)
        base = float(hf.get("dim_model_base") or self.hidden_size)
        self.logit_scale = base / self.hidden_size
