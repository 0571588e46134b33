"""Persimmon-8B: squared-ReLU MLP, per-head QK LayerNorm (with bias),
partial rotary 0.5, head-interleaved fused QKV, biases everywhere.

Reference: aphrodite/modeling/models/persimmon.py
(PersimmonForCausalLM).
"""

from typing import Any, Dict, List, Tuple

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.layers import layer_norm
from aphrodite_tpu.models.llama import LlamaForCausalLM


class PersimmonForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "relu2"

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_eps", 1e-5))
        super().__init__(model_config, parallel_config)
        self.qk_layernorm = bool(hf.get("qk_layernorm", True))

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, D = self.num_layers, self.head_dim
        if self.qk_layernorm:
            for n in ("q_ln", "q_ln_b", "k_ln", "k_ln_b"):
                shapes["layers"][n] = (L, D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        if self.qk_layernorm:
            for n in ("q_ln", "q_ln_b", "k_ln", "k_ln_b"):
                specs["layers"][n] = P()
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        la = "model.layers.{i}."
        maps = [
            (la + "input_layernorm.weight", "layers.input_norm", False),
            (la + "input_layernorm.bias", "layers.input_norm_b", False),
            (la + "post_attention_layernorm.weight", "layers.post_norm",
             False),
            (la + "post_attention_layernorm.bias", "layers.post_norm_b",
             False),
            (la + "self_attn.dense.weight", "layers.wo", True),
            (la + "self_attn.dense.bias", "layers.bo", False),
            (la + "mlp.dense_h_to_4h.weight", "layers.fc1", True),
            (la + "mlp.dense_h_to_4h.bias", "layers.fc1_b", False),
            (la + "mlp.dense_4h_to_h.weight", "layers.fc2", True),
            (la + "mlp.dense_4h_to_h.bias", "layers.fc2_b", False),
        ]
        if self.qk_layernorm:
            maps += [
                (la + "self_attn.q_layernorm.weight", "layers.q_ln",
                 False),
                (la + "self_attn.q_layernorm.bias", "layers.q_ln_b",
                 False),
                (la + "self_attn.k_layernorm.weight", "layers.k_ln",
                 False),
                (la + "self_attn.k_layernorm.bias", "layers.k_ln_b",
                 False),
            ]
        return maps

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("model.embed_tokens.weight", "embed", False),
            ("model.final_layernorm.weight", "final_norm", False),
            ("model.final_layernorm.bias", "final_norm_b", False),
            ("lm_head.weight", "lm_head", True),
        ]

    def hf_split_mappings(self):
        H = self.hidden_size
        return [
            ("model.layers.{i}.self_attn.query_key_value.weight",
             [("layers.qkv_fused", 0, 3 * H)], True),
            ("model.layers.{i}.self_attn.query_key_value.bias",
             [("layers.qkv_fused_b", 0, 3 * H)], False),
        ]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """De-interleave the head-major fused QKV (same layout as
        GPT-NeoX/Bloom: [NH, (q|k|v), D] on the output dim)."""
        lay = params["layers"]
        if "qkv_fused" not in lay:
            return
        NH, D = self.num_heads, self.head_dim
        w = lay.pop("qkv_fused")
        L, H = w.shape[0], w.shape[1]
        w = w.reshape(L, H, NH, 3, D)
        for j, name in enumerate(("wq", "wk", "wv")):
            lay[name] = np.ascontiguousarray(
                w[:, :, :, j, :].reshape(L, H, NH * D))
        b = lay.pop("qkv_fused_b").reshape(L, NH, 3, D)
        for j, name in enumerate(("bq", "bk", "bv")):
            lay[name] = np.ascontiguousarray(
                b[:, :, j, :].reshape(L, NH * D))

    def qk_norm(self, q: jax.Array, k: jax.Array,
                lp: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        if not self.qk_layernorm:
            return q, k
        qn = layer_norm(q, lp["q_ln"], lp["q_ln_b"], self.rms_eps)
        kn = layer_norm(k, lp["k_ln"], lp["k_ln_b"], self.rms_eps)
        return qn.astype(q.dtype), kn.astype(k.dtype)
