"""Pixtral (HF-format LLaVA composite: PixtralVisionModel tower +
Mistral text stack).

Reference: aphrodite/modeling/models/pixtral.py (mistral-format) and
llava.py (the HF-format composite this serves). TPU design mirrors the
other towers: the encoder runs ONCE per image at request-add as one
jitted program — native-resolution patches padded to a bucket with key
masking, 2D rope frequencies computed host-side per (h, w) grid
(reference precompute_freqs_cis_2d, pixtral.py:314), all-layer scan,
no final norm (the tower output feeds the projector directly,
vision_feature_layer == -1 / strategy "full").

Prompt layout: the engine expands ONE image placeholder token to the
image's h*w patch features. HF's PixtralProcessor additionally inserts
[IMG_BREAK] rows / [IMG_END] markers when it AUTHORS prompts; those are
ordinary text tokens to the model, so callers who want them include
them in the prompt themselves.
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.layers import apply_rope
from aphrodite_tpu.models.llama import LlamaForCausalLM


def _rms(x, w, eps=1e-5):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


class PixtralForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        v = dict(hf["vision_config"])
        self.v_hidden = int(v.get("hidden_size", 1024))
        self.v_layers = int(v.get("num_hidden_layers", 24))
        self.v_heads = int(v.get("num_attention_heads", 16))
        self.v_head_dim = int(
            v.get("head_dim", self.v_hidden // self.v_heads))
        self.v_intermediate = int(v.get("intermediate_size", 4096))
        self.v_patch = int(v.get("patch_size", 16))
        self.v_image_size = int(v.get("image_size", 1024))
        self.v_theta = float(v.get("rope_theta", 10000.0))
        self.image_token_index = int(
            hf.get("image_token_index", v.get("image_token_id", 10)))
        self.projector_bias = bool(
            hf.get("multimodal_projector_bias", True))
        self._vision_jit = None

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        E, Lv, I = self.v_hidden, self.v_layers, self.v_intermediate
        HD = self.v_head_dim * self.v_heads
        p = self.v_patch
        shapes["vision"] = {
            "patch_w": (3 * p * p, E),
            "pre_ln": (E,),
            "layers": {
                "ln1": (Lv, E),
                "wq": (Lv, E, HD), "wk": (Lv, E, HD),
                "wv": (Lv, E, HD), "wo": (Lv, HD, E),
                "ln2": (Lv, E),
                "gate": (Lv, E, I), "up": (Lv, E, I),
                "down": (Lv, I, E),
            },
        }
        tH = self.hidden_size
        shapes["projector"] = {"w1": (E, tH), "w2": (tH, tH)}
        if self.projector_bias:
            shapes["projector"]["b1"] = (tH,)
            shapes["projector"]["b2"] = (tH,)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["vision"] = {
            "patch_w": P(), "pre_ln": P(),
            "layers": {k: P() for k in
                       ("ln1", "wq", "wk", "wv", "wo", "ln2", "gate",
                        "up", "down")},
        }
        specs["projector"] = {k: P() for k in
                              self.param_shapes()["projector"]}
        return specs

    # ---- HF weight mappings (old "vision_tower.*"/"language_model.
    # model.*" and new "model.vision_tower.*"/"model.language_model.*"
    # layouts) -----------------------------------------------------------

    def _with_lm_prefixes(self, maps):
        out = []
        for hf_name, our_path, transpose in maps:
            if hf_name.startswith("lm_head."):
                out.append((hf_name, our_path, transpose))
                out.append(("language_model." + hf_name, our_path,
                            transpose))
            else:
                out.append(("language_model." + hf_name, our_path,
                            transpose))
                out.append((hf_name.replace(
                    "model.", "model.language_model.", 1), our_path,
                    transpose))
        return out

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefixes(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefixes(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List[Tuple[str, str, bool, int]]:
        vt = "vision_tower.transformer.layers.{i}."
        pairs = [
            (vt + "attention_norm.weight", "vision.layers.ln1", False),
            (vt + "attention.q_proj.weight", "vision.layers.wq", True),
            (vt + "attention.k_proj.weight", "vision.layers.wk", True),
            (vt + "attention.v_proj.weight", "vision.layers.wv", True),
            (vt + "attention.o_proj.weight", "vision.layers.wo", True),
            (vt + "ffn_norm.weight", "vision.layers.ln2", False),
            (vt + "feed_forward.gate_proj.weight", "vision.layers.gate",
             True),
            (vt + "feed_forward.up_proj.weight", "vision.layers.up",
             True),
            (vt + "feed_forward.down_proj.weight", "vision.layers.down",
             True),
        ]
        out = []
        for template, path, transpose in pairs:
            out.append((template, path, transpose, self.v_layers))
            out.append(("model." + template, path, transpose,
                        self.v_layers))
        globals_ = [
            ("vision_tower.patch_conv.weight", "vision.patch_w", False),
            ("vision_tower.ln_pre.weight", "vision.pre_ln", False),
            ("multi_modal_projector.linear_1.weight", "projector.w1",
             True),
            ("multi_modal_projector.linear_2.weight", "projector.w2",
             True),
        ]
        if self.projector_bias:
            globals_ += [
                ("multi_modal_projector.linear_1.bias", "projector.b1",
                 False),
                ("multi_modal_projector.linear_2.bias", "projector.b2",
                 False),
            ]
        for hf_name, path, transpose in globals_:
            out.append((hf_name, path, transpose, 1))
            out.append(("model." + hf_name, path, transpose, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """Conv2d kernel [E, 3, p, p] -> matmul form [3*p*p, E]."""
        w = params["vision"]["patch_w"]
        if w.ndim == 4:
            params["vision"]["patch_w"] = np.ascontiguousarray(
                w.reshape(w.shape[0], -1).T)

    # ---- vision tower ---------------------------------------------------

    def _vision_freqs(self, h: int, w: int) -> np.ndarray:
        """Per-patch 2D rope frequencies [h*w, head_dim/2]: the first
        D/4 bands index the row, the next D/4 the column (reference HF
        PixtralRotaryEmbedding: freqs_h uses inv_freq[::2], freqs_w
        inv_freq[1::2])."""
        D = self.v_head_dim
        inv = 1.0 / (self.v_theta ** (
            np.arange(0, D, 2, dtype=np.float64) / D))
        fh = np.outer(np.arange(h, dtype=np.float64), inv[::2])
        fw = np.outer(np.arange(w, dtype=np.float64), inv[1::2])
        fr = np.concatenate([
            np.broadcast_to(fh[:, None, :], (h, w, fh.shape[1])),
            np.broadcast_to(fw[None, :, :], (h, w, fw.shape[1])),
        ], axis=-1)
        return fr.reshape(h * w, -1).astype(np.float32)

    def _vision_forward(self, params, patches, freqs, n_real):
        """[Npad, 3*p*p] patches -> [Npad, text_H] projected features
        (fp32, HF-exact); padding patches masked out of attention."""
        vp = params["vision"]
        E, heads, D = self.v_hidden, self.v_heads, self.v_head_dim
        f32 = jnp.float32
        x = patches.astype(f32) @ vp["patch_w"].astype(f32)
        x = _rms(x, vp["pre_ln"].astype(f32))
        N = x.shape[0]
        cos = jnp.cos(freqs)
        sin = jnp.sin(freqs)
        key_ok = jnp.arange(N) < n_real[0]
        neg = jnp.asarray(np.finfo(np.float32).min, f32)
        scale = 1.0 / math.sqrt(D)

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _rms(x, lp["ln1"])
            q = apply_rope((h @ lp["wq"]).reshape(N, heads, D), cos, sin)
            k = apply_rope((h @ lp["wk"]).reshape(N, heads, D), cos, sin)
            v = (h @ lp["wv"]).reshape(N, heads, D)
            scores = jnp.einsum("qhd,khd->hqk", q, k) * scale
            scores = jnp.where(key_ok[None, None, :], scores, neg)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(N, -1)
            x = x + o @ lp["wo"]
            h = _rms(x, lp["ln2"])
            h = jax.nn.silu(h @ lp["gate"]) * (h @ lp["up"])
            return x + h @ lp["down"], None

        x, _ = jax.lax.scan(block, x, vp["layers"])
        pj = params["projector"]
        x = x @ pj["w1"].astype(f32)
        if "b1" in pj:
            x = x + pj["b1"].astype(f32)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ pj["w2"].astype(f32)
        if "b2" in pj:
            x = x + pj["b2"].astype(f32)
        return x

    # ---- server-side preprocessing (HF PixtralImageProcessor port) ----

    def prepare_server_image(self, img) -> np.ndarray:
        """PIL image -> pixel_values [3, H, W]: scale so the longest
        edge fits image_size, round patch counts up, normalize with the
        CLIP mean/std (HF image_processing_pixtral)."""
        from PIL import Image

        p = self.v_patch
        w, h = img.size
        ratio = max(h / self.v_image_size, w / self.v_image_size)
        if ratio > 1:
            h = math.ceil(h / ratio)
            w = math.ceil(w / ratio)
        hb = max(p, math.ceil(h / p) * p)
        wb = max(p, math.ceil(w / p) * p)
        img = img.resize((wb, hb), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        return ((arr - mean) / std).transpose(2, 0, 1).astype(np.float32)

    def num_item_tokens(self, item) -> int:
        px = np.asarray(item)
        return (px.shape[1] // self.v_patch) * (px.shape[2] // self.v_patch)

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        px = np.asarray(item, np.float32)
        if px.ndim != 3 or px.shape[0] != 3:
            raise ValueError(
                "Pixtral images must be pixel_values [3, H, W] with "
                f"H, W multiples of {self.v_patch}; got {px.shape}")
        p = self.v_patch
        H, W = px.shape[1], px.shape[2]
        if H % p or W % p:
            raise ValueError(
                f"image size {H}x{W} not a multiple of patch {p}")
        h, w = H // p, W // p
        n = h * w
        # [3, h, p, w, p] -> [h*w, 3*p*p] (channel-major patch flatten
        # matches the conv kernel reshape).
        patches = px.reshape(3, h, p, w, p).transpose(
            1, 3, 0, 2, 4).reshape(n, 3 * p * p)
        freqs = self._vision_freqs(h, w)
        bucket = 256
        npad = -n % bucket + n
        if npad > n:
            patches = np.pad(patches, ((0, npad - n), (0, 0)))
            freqs = np.pad(freqs, ((0, npad - n), (0, 0)))
        if self._vision_jit is None:
            self._vision_jit = jax.jit(self._vision_forward)
        out = self._vision_jit(params, jnp.asarray(patches),
                               jnp.asarray(freqs),
                               jnp.asarray([n], np.int32))
        return np.asarray(out)[:n].astype(np.float32)
