"""GPTBigCode (StarCoder/SantaCoder): multi-query attention, learned
positions, tanh-GELU MLP, fused c_attn [Q(all) | K | V].

Reference: aphrodite/modeling/models/gpt_bigcode.py
(GPTBigCodeForCausalLM).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class GPTBigCodeForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "gelu_tanh"  # HF "gelu_pytorch_tanh"
    use_rope = False
    learned_positions = True
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("hidden_size", hf.get("n_embd"))
        hf.setdefault("num_key_value_heads",
                      1 if hf.get("multi_query", True)
                      else int(hf.get("num_attention_heads")
                               or hf.get("n_head")))
        hf.setdefault("intermediate_size",
                      hf.get("n_inner") or 4 * int(hf["hidden_size"]))
        hf.setdefault("rms_norm_eps",
                      hf.get("layer_norm_epsilon", 1e-5))
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        h = "transformer.h.{i}."
        return [
            (h + "ln_1.weight", "layers.input_norm", False),
            (h + "ln_1.bias", "layers.input_norm_b", False),
            (h + "attn.c_proj.weight", "layers.wo", True),
            (h + "attn.c_proj.bias", "layers.bo", False),
            (h + "ln_2.weight", "layers.post_norm", False),
            (h + "ln_2.bias", "layers.post_norm_b", False),
            (h + "mlp.c_fc.weight", "layers.fc1", True),
            (h + "mlp.c_fc.bias", "layers.fc1_b", False),
            (h + "mlp.c_proj.weight", "layers.fc2", True),
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
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        q_end = NH * D
        k_end = q_end + KV * D
        v_end = k_end + KV * D
        return [
            ("transformer.h.{i}.attn.c_attn.weight",
             [("layers.wq", 0, q_end), ("layers.wk", q_end, k_end),
              ("layers.wv", k_end, v_end)], True),
            ("transformer.h.{i}.attn.c_attn.bias",
             [("layers.bq", 0, q_end), ("layers.bk", q_end, k_end),
              ("layers.bv", k_end, v_end)], False),
        ]
