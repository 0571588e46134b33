"""PhiMoE (Phi-3.5-MoE, PhimoeForCausalLM): Mixtral layout with
LayerNorm (not RMSNorm), biased attention/o/lm_head, longrope scaling,
and sparsemixer top-2 routing (unnormalized thresholded-softmax
weights).

Reference: aphrodite/modeling/models/phimoe.py (phimoe_routing_function
:76; the HF sparsemixer is the numerical oracle).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aphrodite_tpu.models.mixtral import MixtralForCausalLM
from aphrodite_tpu.ops.moe import apply_experts, sparsemixer_routing


class PhiMoEForCausalLM(MixtralForCausalLM):
    norm_type = "layernorm"
    attention_bias = True
    o_proj_bias = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        # Phimoe declares these in config (defaults off in the HF
        # config class, on in the released checkpoints).
        self.attention_bias = bool(hf.get("attention_bias", True))
        self.o_proj_bias = self.attention_bias
        super().__init__(model_config, parallel_config)
        self.lm_head_bias = bool(hf.get("lm_head_bias", False))
        self.router_jitter = float(hf.get("router_jitter_noise", 0.01))

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_global_mappings()
        if self.lm_head_bias:
            maps.append(("lm_head.bias", "lm_head_b", False))
        return maps

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh: Optional[Mesh] = None, lora=None,
            lora_add=None) -> jax.Array:
        logits = jnp.dot(h, lp["router"],
                         preferred_element_type=jnp.float32)
        weights, ids = sparsemixer_routing(logits, self.router_jitter)
        return apply_experts(h, lp["w1"], lp["w3"], lp["w2"], weights,
                             ids, mesh=mesh)
