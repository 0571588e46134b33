"""GLM-4 (glm-4-9b etc.): interleaved partial rotary (0.5), QKV bias,
fused gate_up_proj, RMSNorm, untied head.

Reference: aphrodite/modeling/models/glm.py / chatglm.py lineage.
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class GlmForCausalLM(LlamaForCausalLM):
    attention_bias = True
    rope_style = "gptj"

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        fused = {"layers.gate", "layers.up"}
        return [m for m in super().hf_param_mappings()
                if m[1] not in fused]

    def hf_split_mappings(self):
        F = self.intermediate_size
        return [
            ("model.layers.{i}.mlp.gate_up_proj.weight",
             [("layers.gate", 0, F), ("layers.up", F, 2 * F)], True),
        ]
