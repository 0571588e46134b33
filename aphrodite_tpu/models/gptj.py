"""GPT-J: interleaved partial rotary (absolute rotary_dim), single-norm
parallel residual, bias-free attention projections, biased MLP + LM head.

Reference: aphrodite/modeling/models/gpt_j.py (GPTJForCausalLM).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class GPTJForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "gelu_tanh"  # HF "gelu_new"
    parallel_residual = True
    single_norm = True
    rope_style = "gptj"
    lm_head_bias = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("hidden_size", hf.get("n_embd"))
        hf.setdefault("intermediate_size",
                      hf.get("n_inner") or 4 * int(hf["hidden_size"]))
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_epsilon", 1e-5))
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        h = "transformer.h.{i}."
        return [
            (h + "ln_1.weight", "layers.input_norm", False),
            (h + "ln_1.bias", "layers.input_norm_b", False),
            (h + "attn.q_proj.weight", "layers.wq", True),
            (h + "attn.k_proj.weight", "layers.wk", True),
            (h + "attn.v_proj.weight", "layers.wv", True),
            (h + "attn.out_proj.weight", "layers.wo", True),
            (h + "mlp.fc_in.weight", "layers.fc1", True),
            (h + "mlp.fc_in.bias", "layers.fc1_b", False),
            (h + "mlp.fc_out.weight", "layers.fc2", True),
            (h + "mlp.fc_out.bias", "layers.fc2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("transformer.wte.weight", "embed", False),
            ("transformer.ln_f.weight", "final_norm", False),
            ("transformer.ln_f.bias", "final_norm_b", False),
            ("lm_head.weight", "lm_head", True),
            ("lm_head.bias", "lm_head_b", False),
        ]
