"""OPT: learned absolute position embeddings (with the historical +2
offset), ReLU MLP, pre-LN LayerNorm decoder, tied embeddings.

Reference: aphrodite/modeling/models/opt.py (OPTForCausalLM;
OPTLearnedPositionalEmbedding's offset=2 at opt.py:49). The 350m
variant's post-LN + word_embed projection is not supported yet.
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class OPTForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    ungated_act = "relu"
    use_rope = False
    learned_positions = True
    pos_offset = 2
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("intermediate_size", hf.get("ffn_dim"))
        hf.setdefault("rms_norm_eps", 1e-5)
        if not hf.get("do_layer_norm_before", True):
            raise NotImplementedError(
                "OPT-350m style post-layernorm is not supported yet")
        if hf.get("word_embed_proj_dim",
                  hf["hidden_size"]) != hf["hidden_size"]:
            raise NotImplementedError(
                "OPT word_embed_proj_dim != hidden_size not supported yet")
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        d = "model.decoder.layers.{i}."
        return [
            (d + "self_attn_layer_norm.weight", "layers.input_norm",
             False),
            (d + "self_attn_layer_norm.bias", "layers.input_norm_b",
             False),
            (d + "self_attn.q_proj.weight", "layers.wq", True),
            (d + "self_attn.q_proj.bias", "layers.bq", False),
            (d + "self_attn.k_proj.weight", "layers.wk", True),
            (d + "self_attn.k_proj.bias", "layers.bk", False),
            (d + "self_attn.v_proj.weight", "layers.wv", True),
            (d + "self_attn.v_proj.bias", "layers.bv", False),
            (d + "self_attn.out_proj.weight", "layers.wo", True),
            (d + "self_attn.out_proj.bias", "layers.bo", False),
            (d + "final_layer_norm.weight", "layers.post_norm", False),
            (d + "final_layer_norm.bias", "layers.post_norm_b", False),
            (d + "fc1.weight", "layers.fc1", True),
            (d + "fc1.bias", "layers.fc1_b", False),
            (d + "fc2.weight", "layers.fc2", True),
            (d + "fc2.bias", "layers.fc2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("model.decoder.embed_tokens.weight", "embed", False),
            ("model.decoder.embed_positions.weight", "embed_pos", False),
            ("model.decoder.final_layer_norm.weight", "final_norm", False),
            ("model.decoder.final_layer_norm.bias", "final_norm_b", False),
        ]
