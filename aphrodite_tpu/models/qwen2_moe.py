"""Qwen2-MoE (Qwen1.5-MoE-A2.7B, Qwen2-57B-A14B): sparse experts PLUS an
always-on shared expert blended through a sigmoid gate.

Reference: aphrodite/modeling/models/qwen2_moe.py (Qwen2MoeForCausalLM).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.models.layers import silu_and_mul
from aphrodite_tpu.models.mixtral import MixtralForCausalLM
from aphrodite_tpu.ops.moe import moe_mlp
from aphrodite_tpu.quantization.qlinear import qmatmul


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    attention_bias = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        if hf.get("mlp_only_layers") or \
                int(hf.get("decoder_sparse_step", 1) or 1) != 1:
            raise NotImplementedError(
                "qwen2-moe dense/sparse layer mixing not supported yet")
        hf["intermediate_size"] = int(
            hf.get("moe_intermediate_size") or hf["intermediate_size"])
        hf.setdefault("num_local_experts", hf.get("num_experts", 60))
        super().__init__(model_config, parallel_config)
        self.shared_intermediate = int(
            hf.get("shared_expert_intermediate_size", 0))
        self.renormalize = bool(hf.get("norm_topk_prob", False))

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, H, Fs = (self.num_layers, self.hidden_size,
                    self.shared_intermediate)
        shapes["layers"]["shared_gate"] = (L, H, Fs)
        shapes["layers"]["shared_up"] = (L, H, Fs)
        shapes["layers"]["shared_down"] = (L, Fs, H)
        shapes["layers"]["shared_expert_gate"] = (L, H, 1)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["shared_gate"] = P(None, None, "model")
        specs["layers"]["shared_up"] = P(None, None, "model")
        specs["layers"]["shared_down"] = P(None, "model", None)
        specs["layers"]["shared_expert_gate"] = P()
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        maps = [("model.layers.{i}.mlp.gate.weight"
                 if path == "layers.router" else template, path, transpose)
                for template, path, transpose in maps]
        se = "model.layers.{i}.mlp.shared_expert"
        return maps + [
            (se + ".gate_proj.weight", "layers.shared_gate", True),
            (se + ".up_proj.weight", "layers.shared_up", True),
            (se + ".down_proj.weight", "layers.shared_down", True),
            ("model.layers.{i}.mlp.shared_expert_gate.weight",
             "layers.shared_expert_gate", True),
        ]

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
        sparse = moe_mlp(h, lp["router"], lp["w1"], lp["w3"], lp["w2"],
                         self.top_k, mesh=mesh,
                         renormalize=self.renormalize)
        gate = qmatmul(h, lp["shared_gate"])
        up = qmatmul(h, lp["shared_up"])
        act = silu_and_mul(gate.astype(self.dtype), up.astype(self.dtype))
        shared = qmatmul(act, lp["shared_down"]).astype(jnp.float32)
        blend = jax.nn.sigmoid(
            qmatmul(h, lp["shared_expert_gate"]).astype(jnp.float32))
        return sparse + (blend * shared).astype(sparse.dtype)
