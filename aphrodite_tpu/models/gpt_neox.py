"""GPT-NeoX / Pythia: partial rotary (rotary_pct), parallel residual,
head-interleaved fused QKV, LayerNorm, untied embed_out head.

Reference: aphrodite/modeling/models/gpt_neox.py (GPTNeoXForCausalLM).
"""

from typing import Any, Dict, List, Tuple

import numpy as np

from aphrodite_tpu.models.llama import LlamaForCausalLM


class GPTNeoXForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "gelu"

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_eps", 1e-5))
        super().__init__(model_config, parallel_config)
        self.parallel_residual = bool(
            hf.get("use_parallel_residual", True))

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        la = "gpt_neox.layers.{i}."
        return [
            (la + "input_layernorm.weight", "layers.input_norm", False),
            (la + "input_layernorm.bias", "layers.input_norm_b", False),
            (la + "post_attention_layernorm.weight", "layers.post_norm",
             False),
            (la + "post_attention_layernorm.bias", "layers.post_norm_b",
             False),
            (la + "attention.dense.weight", "layers.wo", True),
            (la + "attention.dense.bias", "layers.bo", False),
            (la + "mlp.dense_h_to_4h.weight", "layers.fc1", True),
            (la + "mlp.dense_h_to_4h.bias", "layers.fc1_b", False),
            (la + "mlp.dense_4h_to_h.weight", "layers.fc2", True),
            (la + "mlp.dense_4h_to_h.bias", "layers.fc2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("gpt_neox.embed_in.weight", "embed", False),
            ("gpt_neox.final_layer_norm.weight", "final_norm", False),
            ("gpt_neox.final_layer_norm.bias", "final_norm_b", False),
            ("embed_out.weight", "lm_head", True),
        ]

    def hf_split_mappings(self):
        H = self.hidden_size
        return [
            ("gpt_neox.layers.{i}.attention.query_key_value.weight",
             [("layers.qkv_fused", 0, 3 * H)], True),
            ("gpt_neox.layers.{i}.attention.query_key_value.bias",
             [("layers.qkv_fused_b", 0, 3 * H)], False),
        ]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """De-interleave the head-major fused QKV ([NH, (q|k|v), D] on the
        output dim — same layout as Bloom, modeling_gpt_neox.py)."""
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
