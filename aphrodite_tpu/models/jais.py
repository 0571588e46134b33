"""JAIS (jais-13b/30b, JAISLMHeadModel): GPT-2 lineage with ALiBi
positions, SwiGLU MLP (c_fc gate + c_fc2 up), and muP scaling knobs
(embeddings scale, 1/d attention scale, logits width scale).

Reference: aphrodite/modeling/models/jais.py (alibi slopes :52-64, attn
scale power :83-86, swiglu :137-164, embeddings_scale :229-252,
output_logits_scale :276-280; Conv1D transpose on load :330-338).
"""

from typing import List, Tuple

import jax.numpy as jnp

from aphrodite_tpu.models.bloom import get_alibi_slopes
from aphrodite_tpu.models.llama import LlamaForCausalLM


class JAISLMHeadModel(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = True
    mlp_bias = True
    use_rope = False
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("hidden_size", hf.get("n_embd"))
        hf.setdefault("intermediate_size",
                      hf.get("n_inner") or 4 * int(hf["hidden_size"]))
        hf.setdefault("rms_norm_eps",
                      hf.get("layer_norm_epsilon", 1e-5))
        if hf.get("position_embedding_type", "alibi") != "alibi":
            raise NotImplementedError("JAIS without ALiBi positions")
        if hf.get("activation_function", "swiglu") != "swiglu":
            raise NotImplementedError("JAIS without swiglu")
        super().__init__(model_config, parallel_config)
        self.alibi_slopes = jnp.asarray(get_alibi_slopes(self.num_heads))
        # muP: embeddings scaled up, logits scaled down, and (optionally)
        # qk dot scaled by 1/d instead of 1/sqrt(d).
        self.embedding_multiplier = float(
            hf.get("embeddings_scale")
            or hf.get("mup_embeddings_scale", 1.0))
        ws = hf.get("width_scale")
        if ws is None:
            ws = (float(hf.get("mup_output_alpha", 1.0)) *
                  float(hf.get("mup_width_scale", 1.0)))
        self.logit_scale = float(ws)
        if hf.get("scale_qk_dot_by_d",
                  hf.get("mup_scale_qk_dot_by_d", False)):
            self.sm_scale = 1.0 / self.head_dim

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        # Conv1D stores [in, out]: no transpose anywhere.
        h = "transformer.h.{i}."
        return [
            (h + "ln_1.weight", "layers.input_norm", False),
            (h + "ln_1.bias", "layers.input_norm_b", False),
            (h + "attn.c_proj.weight", "layers.wo", False),
            (h + "attn.c_proj.bias", "layers.bo", False),
            (h + "ln_2.weight", "layers.post_norm", False),
            (h + "ln_2.bias", "layers.post_norm_b", False),
            (h + "mlp.c_fc.weight", "layers.gate", False),
            (h + "mlp.c_fc.bias", "layers.gate_b", False),
            (h + "mlp.c_fc2.weight", "layers.up", False),
            (h + "mlp.c_fc2.bias", "layers.up_b", False),
            (h + "mlp.c_proj.weight", "layers.down", False),
            (h + "mlp.c_proj.bias", "layers.down_b", False),
        ]

    def hf_split_mappings(self):
        H = self.hidden_size
        return [
            ("transformer.h.{i}.attn.c_attn.weight",
             [("layers.wq", 0, H), ("layers.wk", H, 2 * H),
              ("layers.wv", 2 * H, 3 * H)], False),
            ("transformer.h.{i}.attn.c_attn.bias",
             [("layers.bq", 0, H), ("layers.bk", H, 2 * H),
              ("layers.bv", 2 * H, 3 * H)], False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("transformer.wte.weight", "embed", False),
            ("transformer.ln_f.weight", "final_norm", False),
            ("transformer.ln_f.bias", "final_norm_b", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps
