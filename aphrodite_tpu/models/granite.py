"""IBM Granite: Llama topology + muP-style multipliers on embeddings,
residual branches, attention scores, and logits.

Reference: aphrodite/modeling/models/granite.py (GraniteForCausalLM).
"""

from aphrodite_tpu.models.llama import LlamaForCausalLM


class GraniteForCausalLM(LlamaForCausalLM):
    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.embedding_multiplier = float(
            hf.get("embedding_multiplier", 1.0))
        self.residual_multiplier = float(
            hf.get("residual_multiplier", 1.0))
        am = hf.get("attention_multiplier")
        if am:
            # Direct score multiplier (NOT an inverse square root).
            self.sm_scale = float(am)
        ls = hf.get("logits_scaling")
        if ls:
            self.logit_scale = 1.0 / float(ls)
