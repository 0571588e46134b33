"""GPT-2: learned positions, fused Conv1D c_attn (stored [in, out] — no
transpose), gelu_new MLP, LayerNorm, tied embeddings.

Reference: aphrodite/modeling/models/gpt2.py (GPT2LMHeadModel).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class GPT2LMHeadModel(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "gelu_tanh"  # HF "gelu_new"
    use_rope = False
    learned_positions = True
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("hidden_size", hf.get("n_embd"))
        hf.setdefault("intermediate_size",
                      hf.get("n_inner") or 4 * int(hf["hidden_size"]))
        hf.setdefault("rms_norm_eps",
                      hf.get("layer_norm_epsilon", 1e-5))
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        # GPT-2 Conv1D stores weights [in, out]: transpose=False.
        h = "transformer.h.{i}."
        return [
            (h + "ln_1.weight", "layers.input_norm", False),
            (h + "ln_1.bias", "layers.input_norm_b", False),
            (h + "attn.c_proj.weight", "layers.wo", False),
            (h + "attn.c_proj.bias", "layers.bo", False),
            (h + "ln_2.weight", "layers.post_norm", False),
            (h + "ln_2.bias", "layers.post_norm_b", False),
            (h + "mlp.c_fc.weight", "layers.fc1", False),
            (h + "mlp.c_fc.bias", "layers.fc1_b", False),
            (h + "mlp.c_proj.weight", "layers.fc2", False),
            (h + "mlp.c_proj.bias", "layers.fc2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("transformer.wte.weight", "embed", False),
            ("transformer.wpe.weight", "embed_pos", False),
            ("transformer.ln_f.weight", "final_norm", False),
            ("transformer.ln_f.bias", "final_norm_b", False),
        ]

    def hf_split_mappings(self):
        # c_attn: [in, 3H] contiguous [Q; K; V] on the output dim.
        H = self.hidden_size
        return [
            ("transformer.h.{i}.attn.c_attn.weight",
             [("layers.wq", 0, H), ("layers.wk", H, 2 * H),
              ("layers.wv", 2 * H, 3 * H)], False),
            ("transformer.h.{i}.attn.c_attn.bias",
             [("layers.bq", 0, H), ("layers.bk", H, 2 * H),
              ("layers.bv", 2 * H, 3 * H)], False),
        ]
