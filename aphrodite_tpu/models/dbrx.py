"""DBRX: 16-expert top-4 MoE with fused flat expert blobs (w1/v1/w2
stored [E*F, H]), clipped fused Wqkv, bias-free LayerNorm sandwich.

Reference: aphrodite/modeling/models/dbrx.py (DbrxForCausalLM).
"""

from typing import Any, Dict, List, Tuple

import numpy as np

from aphrodite_tpu.models.mixtral import MixtralForCausalLM


class DbrxForCausalLM(MixtralForCausalLM):
    norm_type = "layernorm"
    norm_bias = False

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        attn_cfg = dict(hf.get("attn_config") or {})
        ffn_cfg = dict(hf.get("ffn_config") or {})
        hf.setdefault("num_key_value_heads",
                      int(attn_cfg.get("kv_n_heads", 1)))
        hf.setdefault("rope_theta",
                      float(attn_cfg.get("rope_theta", 10000.0)))
        hf.setdefault("intermediate_size",
                      int(ffn_cfg.get("ffn_hidden_size", 4 * 64)))
        hf.setdefault("num_local_experts",
                      int(ffn_cfg.get("moe_num_experts", 16)))
        hf.setdefault("num_experts_per_tok",
                      int(ffn_cfg.get("moe_top_k", 4)))
        hf.setdefault("rms_norm_eps", 1e-5)
        super().__init__(model_config, parallel_config)
        self.qkv_clip = float(attn_cfg.get("clip_qkv") or 0.0)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        b = "transformer.blocks.{i}."
        return [
            (b + "norm_attn_norm.norm_1.weight", "layers.input_norm",
             False),
            (b + "norm_attn_norm.attn.out_proj.weight", "layers.wo",
             True),
            (b + "norm_attn_norm.norm_2.weight", "layers.post_norm",
             False),
            (b + "ffn.router.layer.weight", "layers.router", True),
            # Fused flat expert blobs [E*F, H]: reshaped/transposed in
            # finalize_params.
            (b + "ffn.experts.mlp.w1", "layers.w1_flat", False),
            (b + "ffn.experts.mlp.v1", "layers.w3_flat", False),
            (b + "ffn.experts.mlp.w2", "layers.w2_flat", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("transformer.wte.weight", "embed", False),
            ("transformer.norm_f.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps

    def hf_expert_mappings(self):
        return []  # experts arrive fused; see finalize_params

    def hf_split_mappings(self):
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        q_end = NH * D
        k_end = q_end + KV * D
        v_end = k_end + KV * D
        return [
            ("transformer.blocks.{i}.norm_attn_norm.attn.Wqkv.weight",
             [("layers.wq", 0, q_end), ("layers.wk", q_end, k_end),
              ("layers.wv", k_end, v_end)], True),
        ]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """Un-flatten the fused expert blobs: w1/v1 [L, E*F, H] ->
        [L, E, H, F] (transposed for x@W); w2 [L, E*F, H] stays
        [L, E, F, H] (applied as act@W)."""
        lay = params["layers"]
        if "w1_flat" not in lay:
            return
        E, F = self.num_experts, self.intermediate_size
        for src, dst, transpose in (("w1_flat", "w1", True),
                                    ("w3_flat", "w3", True),
                                    ("w2_flat", "w2", False)):
            w = lay.pop(src)  # [L, E*F, H]
            L, _, H = w.shape
            w = w.reshape(L, E, F, H)
            if transpose:
                w = w.transpose(0, 1, 3, 2)
            lay[dst] = np.ascontiguousarray(w)
