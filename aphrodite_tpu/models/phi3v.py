"""Phi-3-Vision: CLIP-L tower + HD transform (2x2 patch merge with
learnable separators) on the Phi-3 text stack.

Reference: aphrodite/modeling/models/phi3v.py (Phi3VForCausalLM,
Phi3HDImageEmbedding, phi3v.py:143-290). The image processor pads the
image to 336-multiples and cuts it into a grid of 336px crops; the
tower input is [1 + h_crop*w_crop, 3, 336, 336] with the GLOBAL
(downscaled) image at index 0. Per crop, the 24x24 patch features are
2x2-merged into 12x12 at 4x channel width; the sub-crop grid is laid
out spatially with a sub_GN separator appended to each row, then
[sub features, glb_GN, global features] ("sub_glb") run through a
2-layer GELU MLP projection into the text hidden size.

TPU-native split: (h_crop, w_crop) is static per jitted variant (tiny
grid of combinations), so the WHOLE pipeline — tower over the crop
batch, merges (pure reshapes), separators, projection — is one XLA
program; the host only picks the variant.

Input item per image: {"pixel_values": f32[1 + hc*wc, 3, 336, 336],
"image_size": (padded_h, padded_w)} (the HF processor's outputs), or a
plain [3, 336, 336] global-only image.
"""

import functools
from typing import Any, Dict, List, Tuple

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.phi3 import Phi3ForCausalLM

_IMAGE_TOKEN_ID = 32044  # reference phi3v.py:56


class Phi3VForCausalLM(Phi3ForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        ip = dict(hf.get("img_processor") or {})
        # CLIP-L/14-336 geometry (reference phi3v.py:62-71), overridable
        # through img_processor for reduced-size configs.
        self.v_hidden = int(ip.get("image_dim_out", 1024))
        self.v_heads = int(ip.get("num_attention_heads", 16))
        self.v_intermediate = int(ip.get("intermediate_size", 4096))
        self.v_image_size = int(ip.get("image_size", 336))
        self.v_patch = int(ip.get("patch_size", 14))
        self.v_eps = float(ip.get("layer_norm_eps", 1e-5))
        total_layers = int(ip.get("num_hidden_layers", 24))
        layer_idx = int(ip.get("layer_idx", -2))
        self.v_used_layers = (total_layers + layer_idx + 1
                              if layer_idx < 0 else layer_idx + 1)
        self.image_token_index = int(hf.get("image_token_id",
                                            _IMAGE_TOKEN_ID))
        self._grid = self.v_image_size // self.v_patch  # 24

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        vH, Lv, I = self.v_hidden, self.v_used_layers, self.v_intermediate
        p = self.v_patch
        n_pos = self._grid * self._grid + 1
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
        shapes["glb_GN"] = (4 * vH,)
        shapes["sub_GN"] = (4 * vH,)
        shapes["projector"] = {
            "w1": (4 * vH, tH), "b1": (tH,),
            "w2": (tH, tH), "b2": (tH,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["vision"] = {
            "cls": P(), "patch_w": P(), "pos": P(),
            "pre_ln": P(), "pre_ln_b": P(),
            "layers": {k: P() for k in
                       ("ln1", "ln1_b", "wq", "bq", "wk", "bk", "wv",
                        "bv", "wo", "bo", "ln2", "ln2_b", "fc1", "fc1_b",
                        "fc2", "fc2_b")},
        }
        specs["glb_GN"] = P()
        specs["sub_GN"] = P()
        specs["projector"] = {"w1": P(), "b1": P(), "w2": P(), "b2": P()}
        return specs

    def hf_aux_mappings(self):
        out = []
        vt = ("model.vision_embed_tokens.img_processor.vision_model."
              "encoder.layers.{i}.")
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
        for template, path, transpose in pairs:
            out.append((template, path, transpose, self.v_used_layers))
        emb = "model.vision_embed_tokens.img_processor.vision_model."
        globals_ = [
            (emb + "embeddings.class_embedding", "vision.cls", False),
            (emb + "embeddings.patch_embedding.weight", "vision.patch_w",
             False),
            (emb + "embeddings.position_embedding.weight", "vision.pos",
             False),
            (emb + "pre_layrnorm.weight", "vision.pre_ln", False),
            (emb + "pre_layrnorm.bias", "vision.pre_ln_b", False),
            ("model.vision_embed_tokens.glb_GN", "glb_GN", False),
            ("model.vision_embed_tokens.sub_GN", "sub_GN", False),
            ("model.vision_embed_tokens.img_projection.0.weight",
             "projector.w1", True),
            ("model.vision_embed_tokens.img_projection.0.bias",
             "projector.b1", False),
            ("model.vision_embed_tokens.img_projection.2.weight",
             "projector.w2", True),
            ("model.vision_embed_tokens.img_projection.2.bias",
             "projector.b2", False),
        ]
        for hf_name, path, transpose in globals_:
            out.append((hf_name, path, transpose, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        w = params["vision"]["patch_w"]
        if w.ndim == 4:
            params["vision"]["patch_w"] = np.ascontiguousarray(
                w.reshape(w.shape[0], -1).T)
        for k in ("glb_GN", "sub_GN"):  # stored [1,1,(1,)4C]
            params[k] = np.asarray(params[k]).reshape(-1)

    # ---- vision ------------------------------------------------------

    def _hd_program(self, params, crops, h_crop: int, w_crop: int):
        """crops [1 + hc*wc, 3, S, S] -> [n_img_tokens, tH]. One XLA
        program: tower + 2x2 merge + separators + projection."""
        import jax.numpy as jnp

        from aphrodite_tpu.models.clip_vision import clip_tower

        feats = clip_tower(params["vision"], crops, patch=self.v_patch,
                           image_size=self.v_image_size,
                           hidden=self.v_hidden, heads=self.v_heads,
                           eps=self.v_eps)[:, 1:]  # drop CLS ("patch")
        C = self.v_hidden
        G = self._grid
        Hh = G // 2

        def merge_2x2(x, hc, wc):
            # [hc*wc, G*G, C] -> [hc*Hh, wc*Hh, 4C]
            # (reference reshape_hd_patches_2x2merge, phi3v.py:255-275).
            N = hc * wc
            x = x.reshape(N, G, G, C)
            x = x.reshape(N, Hh, 2, Hh, 2, C).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(N, Hh * Hh, 4 * C)
            x = x.reshape(hc, wc, Hh, Hh, 4 * C)
            x = x.transpose(0, 2, 1, 3, 4)
            return x.reshape(hc * Hh, wc * Hh, 4 * C)

        sub_gn = params["sub_GN"].astype(jnp.float32)
        glb_gn = params["glb_GN"].astype(jnp.float32)

        def add_newline(x):  # [h, w, 4C] -> [h*(w+1), 4C]
            h = x.shape[0]
            nl = jnp.broadcast_to(sub_gn[None, None], (h, 1, 4 * C))
            return jnp.concatenate([x, nl], axis=1).reshape(-1, 4 * C)

        glb = add_newline(merge_2x2(feats[:1], 1, 1))
        sub = add_newline(merge_2x2(feats[1:1 + h_crop * w_crop],
                                    h_crop, w_crop))
        x = jnp.concatenate([sub, glb_gn[None], glb], axis=0)  # sub_glb
        pj = params["projector"]
        x = x @ pj["w1"].astype(jnp.float32) + pj["b1"].astype(
            jnp.float32)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ pj["w2"].astype(jnp.float32) + pj["b2"].astype(
            jnp.float32)
        return x.astype(self.dtype)

    @functools.lru_cache(maxsize=32)
    def _hd_fn(self, h_crop: int, w_crop: int):
        return jax.jit(functools.partial(self._hd_program,
                                         h_crop=h_crop, w_crop=w_crop))

    def encode_image_item(self, params, item, tower_fn) -> np.ndarray:
        import jax.numpy as jnp
        del tower_fn  # crop count is static per (hc, wc) variant

        if isinstance(item, dict):
            crops = np.asarray(item["pixel_values"], np.float32)
            h, w = (int(v) for v in item["image_size"])
            hc, wc = h // self.v_image_size, w // self.v_image_size
        else:
            px = np.asarray(item, np.float32)
            crops = np.stack([px, px])  # global + 1x1 crop grid
            hc = wc = 1
        crops = crops[:1 + hc * wc]
        fn = self._hd_fn(hc, wc)
        return np.asarray(fn(params, jnp.asarray(crops)), np.float32)

