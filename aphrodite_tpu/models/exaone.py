"""EXAONE (LG AI, exaone-3.0): Llama math with GPT-style checkpoint
naming (transformer.h.{i}.attn.attention.*, mlp.c_fc_0/c_fc_1/c_proj)
and RMSNorms called ln_1/ln_2.

Reference: aphrodite/modeling/models/exaone.py (ExaoneForCausalLM;
c_fc_0 = gate, c_fc_1 = up, activation_function silu, eps from
layer_norm_epsilon).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class ExaoneForCausalLM(LlamaForCausalLM):
    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_epsilon", 1e-5))
        if hf.get("num_layers") and not hf.get("num_hidden_layers"):
            hf["num_hidden_layers"] = hf["num_layers"]
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "transformer.h.{i}"
        return [
            (f"{p}.ln_1.weight", "layers.input_norm", False),
            (f"{p}.attn.attention.q_proj.weight", "layers.wq", True),
            (f"{p}.attn.attention.k_proj.weight", "layers.wk", True),
            (f"{p}.attn.attention.v_proj.weight", "layers.wv", True),
            (f"{p}.attn.attention.out_proj.weight", "layers.wo", True),
            (f"{p}.ln_2.weight", "layers.post_norm", False),
            (f"{p}.mlp.c_fc_0.weight", "layers.gate", True),
            (f"{p}.mlp.c_fc_1.weight", "layers.up", True),
            (f"{p}.mlp.c_proj.weight", "layers.down", True),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("transformer.wte.weight", "embed", False),
            ("transformer.ln_f.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps
