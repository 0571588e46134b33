"""OLMo v1 (OLMo-1B/7B): NON-parametric LayerNorm (no weights/biases
anywhere), clip_qkv, SwiGLU, untied head.

Reference: aphrodite/modeling/models/olmo.py (OlmoForCausalLM).
"""

from aphrodite_tpu.models.llama import LlamaForCausalLM


class OlmoForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
    norm_parametric = False

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", 1e-5)
        super().__init__(model_config, parallel_config)
        self.qkv_clip = float(hf.get("clip_qkv") or 0.0)
