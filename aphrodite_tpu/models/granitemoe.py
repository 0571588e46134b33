"""IBM GraniteMoe: Granite's muP multipliers + MoE with fused per-expert
input_linear ([E, 2F, H] gate|up) and top-k-then-softmax routing.

Reference: aphrodite/modeling/models/granitemoe.py
(GraniteMoeForCausalLM).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from aphrodite_tpu.models.mixtral import MixtralForCausalLM
from aphrodite_tpu.ops.moe import moe_mlp


class GraniteMoeForCausalLM(MixtralForCausalLM):
    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.embedding_multiplier = float(
            hf.get("embedding_multiplier", 1.0))
        self.residual_multiplier = float(
            hf.get("residual_multiplier", 1.0))
        am = hf.get("attention_multiplier")
        if am:
            self.sm_scale = float(am)
        ls = hf.get("logits_scaling")
        if ls:
            self.logit_scale = 1.0 / float(ls)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        moe = "model.layers.{i}.block_sparse_moe."
        maps = [(moe + "router.layer.weight"
                 if path == "layers.router" else template, path, transpose)
                for template, path, transpose in maps]
        return maps + [
            (moe + "input_linear.weight", "layers.moe_in", False),
            (moe + "output_linear.weight", "layers.moe_out", False),
        ]

    def hf_expert_mappings(self):
        return []  # experts arrive fused; see finalize_params

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """input_linear [L, E, 2F, H] -> w1/w3 [L, E, H, F];
        output_linear [L, E, H, F] -> w2 [L, E, F, H]."""
        lay = params["layers"]
        if "moe_in" not in lay:
            return
        F = self.intermediate_size
        w_in = lay.pop("moe_in").transpose(0, 1, 3, 2)  # [L, E, H, 2F]
        lay["w1"] = np.ascontiguousarray(w_in[..., :F])
        lay["w3"] = np.ascontiguousarray(w_in[..., F:])
        lay["w2"] = np.ascontiguousarray(
            lay.pop("moe_out").transpose(0, 1, 3, 2))  # [L, E, F, H]

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh: Optional[Mesh] = None, lora=None,
            lora_add=None) -> jax.Array:
        return moe_mlp(h, lp["router"], lp["w1"], lp["w3"], lp["w2"],
                       self.top_k, mesh=mesh, pre_softmax=False)
