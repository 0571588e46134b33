"""StableLM (stablelm-3b/zephyr/stablelm-2): partial rotary, LayerNorm
with bias, gated SiLU MLP, optional QKV bias.

Reference: aphrodite/modeling/models/stablelm.py (StablelmForCausalLM).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class StableLmForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        # StableLM-Epoch (stablelm-3b-4e1t era) configs use norm_eps /
        # rope_pct instead of layer_norm_eps / partial_rotary_factor.
        hf.setdefault("rms_norm_eps",
                      hf.get("layer_norm_eps", hf.get("norm_eps", 1e-5)))
        if hf.get("rope_pct") and not hf.get("partial_rotary_factor"):
            hf["partial_rotary_factor"] = hf["rope_pct"]
        # StableLM uses use_qkv_bias rather than attention_bias.
        hf.setdefault("attention_bias", bool(hf.get("use_qkv_bias")))
        if hf.get("use_parallel_residual"):
            self.parallel_residual = True
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        # Llama names, but the norms carry biases (norm_type layernorm).
        return super().hf_param_mappings()
