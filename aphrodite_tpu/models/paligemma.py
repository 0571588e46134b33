"""PaliGemma: SigLIP vision tower + single-linear projector + Gemma LM.

Reference: aphrodite/modeling/models/paligemma.py
(PaliGemmaForConditionalGeneration) + siglip.py (SiglipVisionModel).
SigLIP differs from CLIP: patch conv HAS a bias, there is NO class
token and NO pre-layernorm, position embeddings cover exactly the
patch grid, the MLP uses tanh-approximated GELU, and a post_layernorm
closes the tower; features are the full post-LN sequence (no CLS
drop).

Scaling: the reference multiplies projected features by H**-0.5 and
the Gemma stack then multiplies ALL merged embeddings by H**0.5
(gemma.py:284) — net, image features enter the stream unscaled while
text embeddings carry Gemma's sqrt(H). Our llama base applies
scale_embeddings BEFORE the embeds_override splice, so the raw
projector output is spliced verbatim — same net arithmetic.

Vision runs ONCE per image at request-add (engine.py multimodal hook);
decode never touches the tower.
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.gemma import GemmaForCausalLM


def _layernorm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


class PaliGemmaForConditionalGeneration(GemmaForCausalLM):
    """Composite model; GemmaForCausalLM serves the text side (the
    hoisted text_config drives the base class)."""

    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        v = dict(hf["vision_config"])
        self.v_hidden = int(v.get("hidden_size", 1152))
        self.v_layers = int(v.get("num_hidden_layers", 27))
        self.v_heads = int(v.get("num_attention_heads", 16))
        self.v_intermediate = int(v.get("intermediate_size", 4304))
        self.v_image_size = int(v.get("image_size", 224))
        self.v_patch = int(v.get("patch_size", 14))
        self.v_eps = float(v.get("layer_norm_eps", 1e-6))
        self.image_token_index = int(hf.get("image_token_index", 257152))
        grid = self.v_image_size // self.v_patch
        self.num_image_tokens = grid * grid

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        vH, Lv, I = self.v_hidden, self.v_layers, self.v_intermediate
        p = self.v_patch
        shapes["vision"] = {
            "patch_w": (3 * p * p, vH),
            "patch_b": (vH,),
            "pos": (self.num_image_tokens, vH),
            "post_ln": (vH,),
            "post_ln_b": (vH,),
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
        shapes["projector"] = {
            "w": (vH, self.hidden_size),
            "b": (self.hidden_size,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["vision"] = {
            "patch_w": P(), "patch_b": P(), "pos": P(),
            "post_ln": P(), "post_ln_b": P(),
            "layers": {k: P() for k in
                       ("ln1", "ln1_b", "wq", "bq", "wk", "bk", "wv",
                        "bv", "wo", "bo", "ln2", "ln2_b", "fc1", "fc1_b",
                        "fc2", "fc2_b")},
        }
        specs["projector"] = {"w": P(), "b": P()}
        return specs

    # ---- HF weight mappings ------------------------------------------

    def _with_lm_prefixes(self, maps):
        """Text-side names under both pre/post-4.52 HF layouts."""
        out = []
        for hf_name, our_path, transpose in maps:
            out.append(("language_model." + hf_name, our_path,
                        transpose))
            out.append((hf_name.replace("model.",
                                        "model.language_model.", 1),
                        our_path, transpose))
        return out

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefixes(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefixes(super().hf_global_mappings())

    def hf_aux_mappings(self):
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
            out.append((template, path, transpose, self.v_layers))
            out.append(("model." + template, path, transpose,
                        self.v_layers))
        emb = "vision_tower.vision_model.embeddings."
        globals_ = [
            (emb + "patch_embedding.weight", "vision.patch_w", False),
            (emb + "patch_embedding.bias", "vision.patch_b", False),
            (emb + "position_embedding.weight", "vision.pos", False),
            ("vision_tower.vision_model.post_layernorm.weight",
             "vision.post_ln", False),
            ("vision_tower.vision_model.post_layernorm.bias",
             "vision.post_ln_b", False),
            ("multi_modal_projector.linear.weight", "projector.w", True),
            ("multi_modal_projector.linear.bias", "projector.b", False),
        ]
        for hf_name, path, transpose in globals_:
            out.append((hf_name, path, transpose, 1))
            out.append(("model." + hf_name, path, transpose, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """Patch-conv kernel [vH, 3, p, p] -> matmul form [3*p*p, vH]."""
        w = params["vision"]["patch_w"]
        if w.ndim == 4:
            params["vision"]["patch_w"] = np.ascontiguousarray(
                w.reshape(w.shape[0], -1).T)

    # ---- vision forward ----------------------------------------------

    def encode_images(self, params: Dict[str, Any],
                      pixel_values: jax.Array) -> jax.Array:
        """pixel_values [B, 3, S, S] -> [B, num_image_tokens, tH].

        Numerics follow HF SiglipVisionModel in fp32: patch embed
        (+bias), learned position embeddings over the patch grid, L
        encoder layers, post-LN, then the linear projector. The
        reference's H**-0.5 feature scale cancels against Gemma's
        embedding normalizer (see module docstring) so it is omitted.
        """
        v = params["vision"]
        p, vH = self.v_patch, self.v_hidden
        nh = self.v_image_size // p
        B = pixel_values.shape[0]
        x = pixel_values.astype(jnp.float32)
        x = x.reshape(B, 3, nh, p, nh, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, nh * nh, 3 * p * p)
        x = x @ v["patch_w"].astype(jnp.float32) + v["patch_b"].astype(
            jnp.float32)
        x = x + v["pos"].astype(jnp.float32)[None]

        heads = self.v_heads
        dh = vH // heads
        scale = dh ** -0.5

        def layer(x, lp):
            h = _layernorm(x, lp["ln1"], lp["ln1_b"], self.v_eps)
            q = (h @ lp["wq"] + lp["bq"]) * scale
            k = h @ lp["wk"] + lp["bk"]
            vv = h @ lp["wv"] + lp["bv"]
            N = h.shape[1]
            q = q.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)
            vv = vv.reshape(B, N, heads, dh).transpose(0, 2, 1, 3)
            attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2), axis=-1)
            o = (attn @ vv).transpose(0, 2, 1, 3).reshape(B, N, vH)
            x = x + (o @ lp["wo"] + lp["bo"])
            h = _layernorm(x, lp["ln2"], lp["ln2_b"], self.v_eps)
            h = h @ lp["fc1"] + lp["fc1_b"]
            h = jax.nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
            x = x + (h @ lp["fc2"] + lp["fc2_b"])
            return x, None

        vl = jax.tree.map(lambda a: a.astype(jnp.float32), v["layers"])
        x, _ = jax.lax.scan(layer, x, vl)
        x = _layernorm(x, v["post_ln"], v["post_ln_b"], self.v_eps)
        pj = params["projector"]
        x = x @ pj["w"].astype(jnp.float32) + pj["b"].astype(jnp.float32)
        return x.astype(self.dtype)
