"""Phi-3 (mini/medium) decoder.

Reference: aphrodite/modeling/models/phi3.py (alias of llama.py with
fused weights) + Phi3LongRoPE (modeling/layers/rotary_embedding.py:433).
Llama topology with fused qkv_proj / gate_up_proj checkpoint tensors
(split at load via hf_split_mappings) and longrope scaling with separate
short/long frequency factors.
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        fused = {"layers.wq", "layers.wk", "layers.wv", "layers.gate",
                 "layers.up"}
        return [m for m in super().hf_param_mappings()
                if m[1] not in fused]

    def hf_split_mappings(self):
        NH, NKV, D = (self.num_heads, self.num_kv_heads,
                      self.head_dim)
        F = self.intermediate_size
        q_end = NH * D
        k_end = q_end + NKV * D
        v_end = k_end + NKV * D
        return [
            ("model.layers.{i}.self_attn.qkv_proj.weight",
             [("layers.wq", 0, q_end), ("layers.wk", q_end, k_end),
              ("layers.wv", k_end, v_end)], True),
            ("model.layers.{i}.mlp.gate_up_proj.weight",
             [("layers.gate", 0, F), ("layers.up", F, 2 * F)], True),
        ]
