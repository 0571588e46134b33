"""LLaVA-1.5-style multimodal model: CLIP ViT vision tower + 2-layer MLP
projector + Llama language model.

Reference: aphrodite/modeling/models/llava.py (LlavaForConditionalGeneration)
and aphrodite/modeling/models/clip.py (CLIPVisionModel). TPU-native design:
the vision tower runs ONCE per image at request-add time (a small jitted
program — patch "conv" expressed as a reshape+matmul so it lands on the
MXU), and the projected features are spliced into the token-embedding
stream at prefill via ForwardBatch.embeds_override. Decode steps never
touch vision weights.

HF weight naming: both the pre-4.52 layout (``language_model.model.*``,
``vision_tower.*``, ``multi_modal_projector.*``) and the post-4.52 layout
(``model.language_model.*``, ``model.vision_tower.*``,
``model.multi_modal_projector.*``, top-level ``lm_head.weight``) are
accepted.
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


def _layernorm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


class LlavaForConditionalGeneration(LlamaForCausalLM):
    """Composite model; the LlamaForCausalLM base serves the text side."""

    is_multimodal = True

    def __init__(self, model_config, parallel_config) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        v = dict(hf["vision_config"])
        self.v_hidden = int(v.get("hidden_size", 768))
        self.v_layers = int(v.get("num_hidden_layers", 12))
        self.v_heads = int(v.get("num_attention_heads", 12))
        self.v_intermediate = int(v.get("intermediate_size", 3072))
        self.v_image_size = int(v.get("image_size", 224))
        self.v_patch = int(v.get("patch_size", 32))
        self.v_eps = float(v.get("layer_norm_eps", 1e-5))
        feature_layer = int(hf.get("vision_feature_layer", -2))
        # hidden_states[k] indexing: entry 0 is the embedding output, entry
        # i the output of layer i; -2 therefore runs all but the last layer.
        self.v_used_layers = feature_layer % (self.v_layers + 1)
        self.feature_strategy = str(
            hf.get("vision_feature_select_strategy", "default"))
        self.image_token_index = int(hf.get("image_token_index", 32000))
        grid = self.v_image_size // self.v_patch
        n = grid * grid
        # "default" drops the CLS token; "full" keeps it.
        self.num_image_tokens = n if self.feature_strategy == "default" \
            else n + 1

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        vH, Lv, I = self.v_hidden, self.v_used_layers, self.v_intermediate
        p = self.v_patch
        n_pos = (self.v_image_size // p) ** 2 + 1
        shapes["vision"] = {
            "cls": (vH,),
            "patch_w": (3 * p * p, vH),
            "pos": (n_pos, vH),
            "pre_ln": (vH,),
            "pre_ln_b": (vH,),
            "layers": {
                "ln1": (Lv, vH), "ln1_b": (Lv, vH),
                "wq": (Lv, vH, vH), "bq": (Lv, vH),
                "wk": (Lv, vH, vH), "bk": (Lv, vH),
                "wv": (Lv, vH, vH), "bv": (Lv, vH),
                "wo": (Lv, vH, vH), "bo": (Lv, vH),
                "ln2": (Lv, vH), "ln2_b": (Lv, vH),
                "fc1": (Lv, vH, I), "fc1_b": (Lv, I),
                "fc2": (Lv, I, vH), "fc2_b": (Lv, vH),
            },
        }
        tH = self.hidden_size
        shapes["projector"] = {
            "w1": (vH, tH), "b1": (tH,),
            "w2": (tH, tH), "b2": (tH,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        # Vision weights are tiny relative to the LM: replicate.
        specs["vision"] = {
            "cls": P(), "patch_w": P(), "pos": P(),
            "pre_ln": P(), "pre_ln_b": P(),
            "layers": {k: P() for k in
                       ("ln1", "ln1_b", "wq", "bq", "wk", "bk", "wv",
                        "bv", "wo", "bo", "ln2", "ln2_b", "fc1", "fc1_b",
                        "fc2", "fc2_b")},
        }
        specs["projector"] = {"w1": P(), "b1": P(), "w2": P(), "b2": P()}
        return specs

    # ---- HF weight mappings ------------------------------------------

    def _with_lm_prefixes(self, maps):
        """Duplicate each text-side mapping under both HF layouts."""
        out = []
        for hf_name, our_path, transpose in maps:
            if hf_name.startswith("lm_head."):
                out.append((hf_name, our_path, transpose))
                out.append(("language_model." + hf_name, our_path,
                            transpose))
            else:
                out.append(("language_model." + hf_name, our_path,
                            transpose))
                out.append((hf_name.replace("model.", "model.language_model.",
                                            1), our_path, transpose))
        return out

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefixes(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefixes(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List[Tuple[str, str, bool, int]]:
        """Vision-encoder per-layer weights (own layer count)."""
        vt = "vision_tower.vision_model.encoder.layers.{i}."
        pairs = [
            (vt + "layer_norm1.weight", "vision.layers.ln1", False),
            (vt + "layer_norm1.bias", "vision.layers.ln1_b", False),
            (vt + "self_attn.q_proj.weight", "vision.layers.wq", True),
            (vt + "self_attn.q_proj.bias", "vision.layers.bq", False),
            (vt + "self_attn.k_proj.weight", "vision.layers.wk", True),
            (vt + "self_attn.k_proj.bias", "vision.layers.bk", False),
            (vt + "self_attn.v_proj.weight", "vision.layers.wv", True),
            (vt + "self_attn.v_proj.bias", "vision.layers.bv", False),
            (vt + "self_attn.out_proj.weight", "vision.layers.wo", True),
            (vt + "self_attn.out_proj.bias", "vision.layers.bo", False),
            (vt + "layer_norm2.weight", "vision.layers.ln2", False),
            (vt + "layer_norm2.bias", "vision.layers.ln2_b", False),
            (vt + "mlp.fc1.weight", "vision.layers.fc1", True),
            (vt + "mlp.fc1.bias", "vision.layers.fc1_b", False),
            (vt + "mlp.fc2.weight", "vision.layers.fc2", True),
            (vt + "mlp.fc2.bias", "vision.layers.fc2_b", False),
        ]
        out = []
        for template, path, transpose in pairs:
            out.append((template, path, transpose, self.v_used_layers))
            out.append(("model." + template, path, transpose,
                        self.v_used_layers))
        emb = "vision_tower.vision_model.embeddings."
        mmp = "multi_modal_projector."
        globals_ = [
            (emb + "class_embedding", "vision.cls", False),
            (emb + "patch_embedding.weight", "vision.patch_w", False),
            (emb + "position_embedding.weight", "vision.pos", False),
            # HF's (sic) "pre_layrnorm" spelling.
            ("vision_tower.vision_model.pre_layrnorm.weight",
             "vision.pre_ln", False),
            ("vision_tower.vision_model.pre_layrnorm.bias",
             "vision.pre_ln_b", False),
            (mmp + "linear_1.weight", "projector.w1", True),
            (mmp + "linear_1.bias", "projector.b1", False),
            (mmp + "linear_2.weight", "projector.w2", True),
            (mmp + "linear_2.bias", "projector.b2", False),
        ]
        for hf_name, path, transpose in globals_:
            out.append((hf_name, path, transpose, 1))
            out.append(("model." + hf_name, path, transpose, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """Reshape the patch-embedding conv kernel [vH,3,p,p] into the
        matmul form [3*p*p, vH] (stride==kernel conv == reshape+matmul)."""
        w = params["vision"]["patch_w"]
        if w.ndim == 4:
            params["vision"]["patch_w"] = np.ascontiguousarray(
                w.reshape(w.shape[0], -1).T)

    # ---- vision forward ----------------------------------------------

    def encode_images(self, params: Dict[str, Any],
                      pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, 3, S, S] float -> [B, num_image_tokens, tH].

        Numerics follow HF CLIPVisionModel exactly (fp32): patch embed,
        CLS + learned position embeddings, pre-LN, (L-1) encoder layers
        for vision_feature_layer=-2, feature select, then the projector.
        """
        from aphrodite_tpu.models.clip_vision import clip_tower

        x = clip_tower(params["vision"], pixel_values,
                       patch=self.v_patch, image_size=self.v_image_size,
                       hidden=self.v_hidden, heads=self.v_heads,
                       eps=self.v_eps)
        if self.feature_strategy == "default":
            x = x[:, 1:]
        pj = params["projector"]
        x = x @ pj["w1"].astype(jnp.float32) + pj["b1"].astype(jnp.float32)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ pj["w2"].astype(jnp.float32) + pj["b2"].astype(jnp.float32)
        return x.astype(self.dtype)
