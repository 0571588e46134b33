"""Cohere Command-R: GPT-J interleaved rotary, bias-free LayerNorm,
single-norm parallel residual (attn + gated-SiLU MLP both read ln1),
tied embeddings with a logit_scale multiplier.

Reference: aphrodite/modeling/models/commandr.py (CohereForCausalLM).
use_qk_norm variants (Command-R+) not supported yet.
"""

from aphrodite_tpu.models.llama import LlamaForCausalLM


class CohereForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
    norm_bias = False
    parallel_residual = True
    single_norm = True
    rope_style = "gptj"
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_eps", 1e-5))
        if hf.get("use_qk_norm"):
            raise NotImplementedError(
                "cohere use_qk_norm not supported yet")
        super().__init__(model_config, parallel_config)
        self.logit_scale = float(hf.get("logit_scale", 1.0))

    def hf_param_mappings(self):
        # Same HF names as llama minus post_attention_layernorm (the
        # single norm feeds both branches) and minus all biases.
        maps = super().hf_param_mappings()
        return [(t, p, tr) for t, p, tr in maps
                if "post_attention_layernorm" not in t]
