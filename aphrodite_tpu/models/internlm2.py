"""InternLM2 / InternLM2.5: Llama math with its own checkpoint scheme —
grouped fused `attention.wqkv` ([kv_group, q_per_kv + 2, head_dim]
interleave), feed_forward.w1/w3/w2, attention_norm/ffn_norm,
tok_embeddings/output.

Reference: aphrodite/modeling/models/internlm2.py (split_qkv
internlm2.py:132-153 reshapes to [kv_heads, q_per_kv + 2, head_dim]).
"""

from typing import Any, Dict, List, Tuple

import numpy as np

from aphrodite_tpu.models.llama import LlamaForCausalLM


class InternLM2ForCausalLM(LlamaForCausalLM):
    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "model.layers.{i}"
        return [
            (f"{p}.attention_norm.weight", "layers.input_norm", False),
            (f"{p}.attention.wo.weight", "layers.wo", True),
            (f"{p}.ffn_norm.weight", "layers.post_norm", False),
            (f"{p}.feed_forward.w1.weight", "layers.gate", True),
            (f"{p}.feed_forward.w3.weight", "layers.up", True),
            (f"{p}.feed_forward.w2.weight", "layers.down", True),
        ]

    def hf_split_mappings(self):
        # Map the fused grouped wqkv whole; finalize_params de-interleaves.
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        width = (NH + 2 * KV) * D
        return [
            ("model.layers.{i}.attention.wqkv.weight",
             [("layers.qkv_fused", 0, width)], True),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("model.tok_embeddings.weight", "embed", False),
            ("model.norm.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("output.weight", "lm_head", True))
        return maps

    def finalize_params(self, params: Dict[str, Any]) -> None:
        lay = params["layers"]
        if "qkv_fused" not in lay:
            return
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        g = NH // KV
        w = lay.pop("qkv_fused")  # [L, H, (NH + 2*KV) * D]
        L, H = w.shape[0], w.shape[1]
        w = w.reshape(L, H, KV, g + 2, D)
        wq = w[:, :, :, :g, :].reshape(L, H, NH * D)
        wk = w[:, :, :, g, :].reshape(L, H, KV * D)
        wv = w[:, :, :, g + 1, :].reshape(L, H, KV * D)
        reps = self.num_kv_heads_padded // KV
        if reps > 1:
            wk = np.repeat(wk.reshape(L, H, KV, D), reps,
                           axis=2).reshape(L, H, -1)
            wv = np.repeat(wv.reshape(L, H, KV, D), reps,
                           axis=2).reshape(L, H, -1)
        lay["wq"] = np.ascontiguousarray(wq)
        lay["wk"] = np.ascontiguousarray(wk)
        lay["wv"] = np.ascontiguousarray(wv)
