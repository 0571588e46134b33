"""OPT: learned absolute position embeddings (with the historical +2
offset), ReLU MLP, LayerNorm decoder, tied embeddings.

Reference: aphrodite/modeling/models/opt.py (OPTForCausalLM;
OPTLearnedPositionalEmbedding's offset=2 at opt.py:49). OPT-350m's
quirks are handled too: do_layer_norm_before=False puts the LayerNorm
AFTER each residual sum (and drops the final decoder norm), and
word_embed_proj_dim != hidden folds project_in/project_out into the
embedding table and tied head at load (exact: they are plain matmuls).
"""

from typing import Any, Dict, List, Tuple

import numpy as np

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
        self.postnorm_residual = not hf.get("do_layer_norm_before", True)
        self.skip_final_norm = self.postnorm_residual
        self.word_dim = int(hf.get("word_embed_proj_dim",
                                   hf["hidden_size"]))
        self.has_word_proj = self.word_dim != int(hf["hidden_size"])
        super().__init__(model_config, parallel_config)
        if self.has_word_proj:
            # project_in/out fold into embed/lm_head at load; the head
            # is no longer a raw tie.
            self.tie_word_embeddings = False

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        if self.skip_final_norm:
            shapes.pop("final_norm", None)
            shapes.pop("final_norm_b", None)
        if self.has_word_proj:
            V, H, Wd = self.vocab_size, self.hidden_size, self.word_dim
            shapes["embed"] = (V, H)  # post-fold
            shapes["lm_head"] = (H, V)
            shapes["embed_raw"] = (V, Wd)
            shapes["proj_in"] = (Wd, H)
            shapes["proj_out"] = (H, Wd)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        from jax.sharding import PartitionSpec as P

        specs = super().param_shardings()
        if self.skip_final_norm:
            specs.pop("final_norm", None)
            specs.pop("final_norm_b", None)
        if self.has_word_proj:
            specs["lm_head"] = P(None, "model")
            specs["embed_raw"] = P()
            specs["proj_in"] = P()
            specs["proj_out"] = P()
        return specs

    def finalize_params(self, params: Dict[str, Any]) -> None:
        if not self.has_word_proj or "embed_raw" not in params:
            return
        # The raw tensors stay in params (the shape check runs against
        # param_shapes after finalize); they are tiny next to the stack.
        raw = np.asarray(params["embed_raw"], np.float32)
        w_in = np.asarray(params["proj_in"], np.float32)
        w_out = np.asarray(params["proj_out"], np.float32)
        params["embed"] = np.ascontiguousarray(raw @ w_in)
        params["lm_head"] = np.ascontiguousarray(w_out @ raw.T)

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
        maps = [
            ("model.decoder.embed_positions.weight", "embed_pos", False),
        ]
        if self.has_word_proj:
            maps += [
                ("model.decoder.embed_tokens.weight", "embed_raw",
                 False),
                ("model.decoder.project_in.weight", "proj_in", True),
                ("model.decoder.project_out.weight", "proj_out", True),
            ]
        else:
            maps.append(
                ("model.decoder.embed_tokens.weight", "embed", False))
        if not self.skip_final_norm:
            maps += [
                ("model.decoder.final_layer_norm.weight", "final_norm",
                 False),
                ("model.decoder.final_layer_norm.bias", "final_norm_b",
                 False),
            ]
        return maps
