"""ChatGLM2/ChatGLM3 (ChatGLMForConditionalGeneration): GLM block with
fused biased query_key_value, MQA group kv heads, half-dim interleaved
rotary, fused dense_h_to_4h SwiGLU, its own config vocabulary.

Reference: aphrodite/modeling/models/chatglm.py (GLMAttention
rotary_dim=head_dim//2 is_neox_style=False chatglm.py:84-87; GLMMLP
merged dense_h_to_4h + silu_and_mul :135-158).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class ChatGLMForConditionalGeneration(LlamaForCausalLM):
    rope_style = "gptj"  # interleaved pairs
    tie_word_embeddings_default = False

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("num_hidden_layers", hf.get("num_layers"))
        hf.setdefault("intermediate_size", hf.get("ffn_hidden_size"))
        hf.setdefault("rms_norm_eps", hf.get("layernorm_epsilon", 1e-5))
        hf.setdefault("vocab_size", hf.get("padded_vocab_size"))
        if hf.get("multi_query_attention"):
            hf.setdefault("num_key_value_heads",
                          hf["multi_query_group_num"])
        hf.setdefault("max_position_embeddings",
                      hf.get("seq_length", 2048))
        # Rotary over HALF the head dims, interleaved; rope_ratio scales
        # the base frequency (chatglm3 long-context variants).
        hf.setdefault("partial_rotary_factor", 0.5)
        hf.setdefault("rope_theta",
                      10000.0 * float(hf.get("rope_ratio", 1.0)))
        hf.setdefault(
            "attention_bias",
            bool(hf.get("add_qkv_bias", False)
                 or hf.get("add_bias_linear", False)))
        if hf.get("apply_residual_connection_post_layernorm"):
            raise NotImplementedError(
                "chatglm apply_residual_connection_post_layernorm")
        if not hf.get("rmsnorm", True):
            self.norm_type = "layernorm"
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        e = "transformer.encoder.layers.{i}."
        return [
            (e + "input_layernorm.weight", "layers.input_norm", False),
            (e + "self_attention.dense.weight", "layers.wo", True),
            (e + "post_attention_layernorm.weight", "layers.post_norm",
             False),
            (e + "mlp.dense_4h_to_h.weight", "layers.down", True),
        ]

    def hf_split_mappings(self):
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        F = self.intermediate_size
        q_w = NH * D
        kv_w = KV * D
        maps = [
            ("transformer.encoder.layers.{i}.self_attention."
             "query_key_value.weight",
             [("layers.wq", 0, q_w), ("layers.wk", q_w, q_w + kv_w),
              ("layers.wv", q_w + kv_w, q_w + 2 * kv_w)], True),
            # dense_h_to_4h packs [gate; up] on the output dim.
            ("transformer.encoder.layers.{i}.mlp.dense_h_to_4h.weight",
             [("layers.gate", 0, F), ("layers.up", F, 2 * F)], True),
        ]
        if self.attention_bias:
            maps.append(
                ("transformer.encoder.layers.{i}.self_attention."
                 "query_key_value.bias",
                 [("layers.bq", 0, q_w), ("layers.bk", q_w, q_w + kv_w),
                  ("layers.bv", q_w + kv_w, q_w + 2 * kv_w)], False))
        return maps

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("transformer.embedding.word_embeddings.weight", "embed",
             False),
            ("transformer.encoder.final_layernorm.weight", "final_norm",
             False),
            ("transformer.output_layer.weight", "lm_head", True),
        ]


# Registry alias used by some checkpoints.
ChatGLMModel = ChatGLMForConditionalGeneration
