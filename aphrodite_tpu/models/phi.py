"""Phi-1.5/Phi-2: partial rotary (partial_rotary_factor), single-norm
parallel residual (attn and MLP both read ln1's output), biased LM head.

Reference: aphrodite/modeling/models/phi.py (PhiForCausalLM).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class PhiForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "gelu_tanh"  # HF "gelu_new"
    parallel_residual = True
    single_norm = True
    lm_head_bias = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_eps", 1e-5))
        hf.setdefault("partial_rotary_factor", 0.5)
        if hf.get("qk_layernorm"):
            raise NotImplementedError("phi qk_layernorm not supported yet")
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        la = "model.layers.{i}."
        return [
            (la + "input_layernorm.weight", "layers.input_norm", False),
            (la + "input_layernorm.bias", "layers.input_norm_b", False),
            (la + "self_attn.q_proj.weight", "layers.wq", True),
            (la + "self_attn.q_proj.bias", "layers.bq", False),
            (la + "self_attn.k_proj.weight", "layers.wk", True),
            (la + "self_attn.k_proj.bias", "layers.bk", False),
            (la + "self_attn.v_proj.weight", "layers.wv", True),
            (la + "self_attn.v_proj.bias", "layers.bv", False),
            (la + "self_attn.dense.weight", "layers.wo", True),
            (la + "self_attn.dense.bias", "layers.bo", False),
            (la + "mlp.fc1.weight", "layers.fc1", True),
            (la + "mlp.fc1.bias", "layers.fc1_b", False),
            (la + "mlp.fc2.weight", "layers.fc2", True),
            (la + "mlp.fc2.bias", "layers.fc2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("model.embed_tokens.weight", "embed", False),
            ("model.final_layernorm.weight", "final_norm", False),
            ("model.final_layernorm.bias", "final_norm_b", False),
            ("lm_head.weight", "lm_head", True),
            ("lm_head.bias", "lm_head_b", False),
        ]
