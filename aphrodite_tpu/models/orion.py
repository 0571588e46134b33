"""Orion (OrionStarAI Orion-14B): Llama topology and checkpoint naming,
but LayerNorm (with bias) in place of RMSNorm.

Reference: aphrodite/modeling/models/orion.py (nn.LayerNorm with
eps=config.rms_norm_eps, orion.py:172-175).
"""

from aphrodite_tpu.models.llama import LlamaForCausalLM


class OrionForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
