"""MiniCPM-V 2.0/2.5/2.6: vision tower + perceiver resampler onto a
MiniCPM (2.0), Llama (2.5) or Qwen2 (2.6) text stack. 2.5/2.6 use the
navit-style variable-resolution ViT (Idefics2/SigLIP layout); 2.0 uses
a timm SigLIP-SO400M ViT + the fixed-grid Resampler2 (MiniCPMV2_0
below).

Reference: aphrodite/modeling/models/minicpmv.py +
modeling/layers/resampler.py. TPU design: each image SLICE encodes as
one jitted program per patch bucket — conv patch embed with
host-computed bucketized position ids (the Idefics2 fractional-coord
scheme), masked full attention, then the resampler's single
cross-attention block whose keys add host-computed 2D sincos
embeddings for the slice's (h, w) grid. Each slice contributes exactly
query_num features, spliced at its own placeholder token (the slice
layout — how many slices and the surrounding <image>/<slice> text —
is prompt authoring, as in the reference's input processor).

Image items: {"pixel_values": [3, H, W]} per slice (H, W multiples of
patch_size).
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.models.minicpm import MiniCPMForCausalLM as \
    _MiniCPMBase


def _ln(x, w, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _sincos_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """[h*w, embed_dim] 2D sincos table, version-(2,5) layout
    (reference resampler.py:103-155: H/W halves, sin||cos per half)."""

    def one(dim, pos):  # pos [h, w]
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("hw,d->hwd", pos.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    emb = np.concatenate(
        [one(embed_dim // 2, gh), one(embed_dim // 2, gw)], axis=-1)
    return emb.reshape(h * w, embed_dim).astype(np.float32)


class MiniCPMV(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        ver = hf.get("version", 2.5)
        self.version = float(ver)
        if self.version >= 2.6:  # Qwen2 text stack carries qkv bias
            hf.setdefault("attention_bias", True)
        if self.version < 2.5:
            raise ValueError(
                "MiniCPM-V 2.0 is served by MiniCPMV2_0 (the registry "
                "routes on config.version)")
        super().__init__(model_config, parallel_config)
        v = dict(hf["vision_config"])
        self.v_hidden = int(v.get("hidden_size", 1152))
        depth = int(v.get("num_hidden_layers", 27))
        self.v_used_layers = depth - 1 if hf.get(
            "drop_vision_last_layer", True) else depth
        self.v_heads = int(v.get("num_attention_heads", 16))
        self.v_intermediate = int(v.get("intermediate_size", 4304))
        self.v_patch = int(v.get("patch_size", 14))
        self.v_image_size = int(v.get("image_size", 980))
        self.v_eps = float(v.get("layer_norm_eps", 1e-6))
        self.patches_per_side = self.v_image_size // self.v_patch
        self.query_num = int(hf.get("query_num", 96))
        self.num_image_tokens = self.query_num
        self.r_heads = max(1, self.hidden_size // 128)
        self.image_token_index = int(hf.get("image_token_index", 0))
        self._vision_jit = None

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        E, Lv, I = self.v_hidden, self.v_used_layers, self.v_intermediate
        p = self.v_patch
        D = self.hidden_size
        shapes["vision"] = {
            "patch_w": (3 * p * p, E), "patch_b": (E,),
            "pos": (self.patches_per_side**2, E),
            "layers": {
                "ln1": (Lv, E), "ln1_b": (Lv, E),
                "wq": (Lv, E, E), "bq": (Lv, E),
                "wk": (Lv, E, E), "bk": (Lv, E),
                "wv": (Lv, E, E), "bv": (Lv, E),
                "wo": (Lv, E, E), "bo": (Lv, E),
                "ln2": (Lv, E), "ln2_b": (Lv, E),
                "fc1": (Lv, E, I), "fc1_b": (Lv, I),
                "fc2": (Lv, I, E), "fc2_b": (Lv, E),
            },
            "post_ln": (E,), "post_ln_b": (E,),
        }
        shapes["resampler"] = {
            "query": (self.query_num, D),
            "kv_w": (E, D),
            "ln_q": (D,), "ln_q_b": (D,),
            "ln_kv": (D,), "ln_kv_b": (D,),
            "ln_post": (D,), "ln_post_b": (D,),
            "proj": (D, D),
            "in_w": (D, 3 * D), "in_b": (3 * D,),
            "out_w": (D, D), "out_b": (D,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()

        def rep(node):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in node.items()}

        mine = self.param_shapes()
        specs["vision"] = rep(mine["vision"])
        specs["resampler"] = rep(mine["resampler"])
        return specs

    def _with_llm(self, maps):
        return [("llm." + n, p, t) for n, p, t in maps]

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_llm(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_llm(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List:
        lay = "vpm.encoder.layers.{i}."
        pairs = [
            (lay + "layer_norm1.weight", "vision.layers.ln1", False),
            (lay + "layer_norm1.bias", "vision.layers.ln1_b", False),
            (lay + "self_attn.q_proj.weight", "vision.layers.wq", True),
            (lay + "self_attn.q_proj.bias", "vision.layers.bq", False),
            (lay + "self_attn.k_proj.weight", "vision.layers.wk", True),
            (lay + "self_attn.k_proj.bias", "vision.layers.bk", False),
            (lay + "self_attn.v_proj.weight", "vision.layers.wv", True),
            (lay + "self_attn.v_proj.bias", "vision.layers.bv", False),
            (lay + "self_attn.out_proj.weight", "vision.layers.wo", True),
            (lay + "self_attn.out_proj.bias", "vision.layers.bo", False),
            (lay + "layer_norm2.weight", "vision.layers.ln2", False),
            (lay + "layer_norm2.bias", "vision.layers.ln2_b", False),
            (lay + "mlp.fc1.weight", "vision.layers.fc1", True),
            (lay + "mlp.fc1.bias", "vision.layers.fc1_b", False),
            (lay + "mlp.fc2.weight", "vision.layers.fc2", True),
            (lay + "mlp.fc2.bias", "vision.layers.fc2_b", False),
        ]
        out = [(t, p, tr, self.v_used_layers) for t, p, tr in pairs]
        for name, path, tr in [
            ("vpm.embeddings.patch_embedding.weight", "vision.patch_w",
             False),
            ("vpm.embeddings.patch_embedding.bias", "vision.patch_b",
             False),
            ("vpm.embeddings.position_embedding.weight", "vision.pos",
             False),
            ("vpm.post_layernorm.weight", "vision.post_ln", False),
            ("vpm.post_layernorm.bias", "vision.post_ln_b", False),
            ("resampler.query", "resampler.query", False),
            ("resampler.kv_proj.weight", "resampler.kv_w", True),
            ("resampler.ln_q.weight", "resampler.ln_q", False),
            ("resampler.ln_q.bias", "resampler.ln_q_b", False),
            ("resampler.ln_kv.weight", "resampler.ln_kv", False),
            ("resampler.ln_kv.bias", "resampler.ln_kv_b", False),
            ("resampler.ln_post.weight", "resampler.ln_post", False),
            ("resampler.ln_post.bias", "resampler.ln_post_b", False),
            ("resampler.proj", "resampler.proj", False),
            ("resampler.attn.in_proj_weight", "resampler.in_w", True),
            ("resampler.attn.in_proj_bias", "resampler.in_b", False),
            ("resampler.attn.out_proj.weight", "resampler.out_w", True),
            ("resampler.attn.out_proj.bias", "resampler.out_b", False),
        ]:
            out.append((name, path, tr, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        v = params["vision"]
        if v["patch_w"].ndim == 4:  # [E, 3, p, p] conv kernel
            v["patch_w"] = np.ascontiguousarray(
                v["patch_w"].reshape(v["patch_w"].shape[0], -1).T)

    # ---- vision tower + resampler ----------------------------------------

    def _pos_ids(self, h: int, w: int) -> np.ndarray:
        """Bucketized fractional-coordinate position ids (HF
        Idefics2VisionEmbeddings.forward)."""
        S = self.patches_per_side
        boundaries = np.arange(1 / S, 1.0, 1 / S)
        fh = np.arange(h, dtype=np.float64) / h * (1 - 1e-6)
        fw = np.arange(w, dtype=np.float64) / w * (1 - 1e-6)
        bh = np.searchsorted(boundaries, fh, side="right")
        bw = np.searchsorted(boundaries, fw, side="right")
        return (bh[:, None] * S + bw[None, :]).reshape(-1).astype(
            np.int32)

    def _vision_forward(self, params, patches, pos_ids, sincos, n_real):
        """[Npad, 3*p*p] slice patches -> [query_num, text_H]."""
        f32 = jnp.float32
        vp = params["vision"]
        E, heads = self.v_hidden, self.v_heads
        Dh = E // heads
        x = patches.astype(f32) @ vp["patch_w"].astype(f32) + \
            vp["patch_b"].astype(f32)
        x = x + vp["pos"].astype(f32)[pos_ids]
        N = x.shape[0]
        key_ok = jnp.arange(N) < n_real[0]
        scale = 1.0 / math.sqrt(Dh)

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _ln(x, lp["ln1"], lp["ln1_b"], self.v_eps)
            q = ((h @ lp["wq"] + lp["bq"]) * scale).reshape(N, heads, Dh)
            k = (h @ lp["wk"] + lp["bk"]).reshape(N, heads, Dh)
            v = (h @ lp["wv"] + lp["bv"]).reshape(N, heads, Dh)
            scores = jnp.einsum("qhd,khd->hqk", q, k)
            scores = jnp.where(key_ok[None, None, :], scores, -1e30)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(N, E)
            x = x + o @ lp["wo"] + lp["bo"]
            h = _ln(x, lp["ln2"], lp["ln2_b"], self.v_eps)
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=True)  # gelu_pytorch_tanh
            return x + h @ lp["fc2"] + lp["fc2_b"], None

        x, _ = jax.lax.scan(block, x, vp["layers"])
        x = _ln(x, vp["post_ln"].astype(f32),
                vp["post_ln_b"].astype(f32), self.v_eps)

        # Perceiver resampler: one cross-attention block, 2D sincos on
        # the KEYS only (reference Resampler2_5.forward).
        rp = jax.tree.map(lambda a: a.astype(f32), params["resampler"])
        D = self.hidden_size
        rh = self.r_heads
        rd = D // rh
        kv = _ln(x @ rp["kv_w"], rp["ln_kv"], rp["ln_kv_b"], 1e-6)
        q_in = _ln(rp["query"], rp["ln_q"], rp["ln_q_b"], 1e-6)
        wq, wk, wv = jnp.split(rp["in_w"], 3, axis=1)
        bq, bk, bv = jnp.split(rp["in_b"], 3)
        q = ((q_in @ wq + bq) / math.sqrt(rd)).reshape(-1, rh, rd)
        k = ((kv + sincos.astype(f32)) @ wk + bk).reshape(N, rh, rd)
        v = (kv @ wv + bv).reshape(N, rh, rd)
        scores = jnp.einsum("qhd,khd->hqk", q, k)
        scores = jnp.where(key_ok[None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(-1, D)
        o = o @ rp["out_w"] + rp["out_b"]
        o = _ln(o, rp["ln_post"], rp["ln_post_b"], 1e-6)
        return o @ rp["proj"]

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        px = np.asarray(item["pixel_values"] if isinstance(item, dict)
                        else item, np.float32)
        p = self.v_patch
        if px.ndim != 3 or px.shape[0] != 3 or px.shape[1] % p or \
                px.shape[2] % p:
            raise ValueError(
                "MiniCPM-V slices must be pixel_values [3, H, W] with "
                f"H, W multiples of {p}; got {px.shape}")
        h, w = px.shape[1] // p, px.shape[2] // p
        n = h * w
        patches = px.reshape(3, h, p, w, p).transpose(
            1, 3, 0, 2, 4).reshape(n, 3 * p * p)
        pos_ids = self._pos_ids(h, w)
        sincos = _sincos_2d(self.hidden_size, h, w)
        bucket = 256
        npad = -n % bucket + n
        if npad > n:
            patches = np.pad(patches, ((0, npad - n), (0, 0)))
            pos_ids = np.pad(pos_ids, (0, npad - n))
            sincos = np.pad(sincos, ((0, npad - n), (0, 0)))
        if self._vision_jit is None:
            self._vision_jit = jax.jit(self._vision_forward)
        out = self._vision_jit(params, jnp.asarray(patches),
                               jnp.asarray(pos_ids), jnp.asarray(sincos),
                               jnp.asarray([n], np.int32))
        return np.asarray(out).astype(np.float32)


def _sincos_2d_v20(embed_dim: int, h: int, w: int) -> np.ndarray:
    """[h*w, embed_dim] 2D sincos, version-(2,0) layout (reference
    resampler.py:89-94,114-115,146-148: flat positions, sin||cos per
    half; the FIRST half encodes the W coordinate — meshgrid(w, h))."""

    def one(dim, pos):  # pos flat [h*w]
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return np.concatenate(
        [one(embed_dim // 2, gw), one(embed_dim // 2, gh)],
        axis=1).astype(np.float32)


def _interp_grid(table: np.ndarray, h: int, w: int,
                 antialias: bool) -> np.ndarray:
    """[S*S, C] square position table -> [h*w, C] by bicubic
    interpolation (torch semantics on host: timm
    resample_abs_pos_embed uses antialias=True, the resampler's
    get_abs_pos antialias=False; reference resampler.py:48-75)."""
    import torch
    import torch.nn.functional as F

    s = int(math.isqrt(table.shape[0]))
    if (h, w) == (s, s):
        return np.asarray(table, np.float32)
    t = torch.tensor(np.asarray(table, np.float32)).reshape(
        1, s, s, -1).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(h, w), mode="bicubic",
                      align_corners=False, antialias=antialias)
    return t.permute(0, 2, 3, 1).reshape(h * w, -1).numpy()


class MiniCPMV2_0(_MiniCPMBase):
    """MiniCPM-V 2.0: timm SigLIP-SO400M ViT + Resampler2 onto a
    MiniCPM (muP) text stack (reference minicpmv.py:588-661
    MiniCPMV2_0 + layers/resampler.py:213-280 Resampler2).

    The timm tower is a plain pre-norm ViT (fused qkv, exact GELU, no
    class token, learned absolute positions resampled bicubically for
    dynamic slice sizes); the resampler queries add a FIXED 8x8 sincos
    grid while the keys add the same grid interpolated to the slice's
    patch grid. Checkpoint config carries no vision hyperparams beyond
    the timm model name, so SO400M numbers are the defaults
    (overridable via a vision_config dict)."""

    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        super().__init__(model_config, parallel_config)
        v = dict(hf.get("vision_config") or {})
        self.v_hidden = int(v.get("hidden_size", 1152))
        depth = int(v.get("num_hidden_layers", 27))
        self.v_used_layers = depth - 1 if hf.get(
            "drop_vision_last_layer", True) else depth
        self.v_heads = int(v.get("num_attention_heads", 16))
        self.v_intermediate = int(v.get("intermediate_size", 4304))
        self.v_patch = int(v.get("patch_size", hf.get("patch_size", 14)))
        self.v_image_size = int(v.get("image_size", 384))
        self.v_eps = float(v.get("layer_norm_eps", 1e-6))
        self.patches_per_side = self.v_image_size // self.v_patch
        self.query_num = int(hf.get("query_num", 64))
        self.r_grid = int(math.isqrt(self.query_num))
        self.num_image_tokens = self.query_num
        self.r_heads = max(1, self.hidden_size // 128)
        self.image_token_index = int(hf.get("image_token_index", 0))
        self._vision_jit = None

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        E, Lv, I = self.v_hidden, self.v_used_layers, self.v_intermediate
        p = self.v_patch
        D = self.hidden_size
        shapes["vision"] = {
            "patch_w": (3 * p * p, E), "patch_b": (E,),
            "pos": (self.patches_per_side**2, E),
            "layers": {
                "ln1": (Lv, E), "ln1_b": (Lv, E),
                "qkv_w": (Lv, E, 3 * E), "qkv_b": (Lv, 3 * E),
                "proj_w": (Lv, E, E), "proj_b": (Lv, E),
                "ln2": (Lv, E), "ln2_b": (Lv, E),
                "fc1": (Lv, E, I), "fc1_b": (Lv, I),
                "fc2": (Lv, I, E), "fc2_b": (Lv, E),
            },
            "final_ln": (E,), "final_ln_b": (E,),
        }
        shapes["resampler"] = {
            "query": (self.query_num, D),
            "pos": (self.query_num, D),
            "kv_w": (E, D),
            "ln_q": (D,), "ln_q_b": (D,),
            "ln_kv": (D,), "ln_kv_b": (D,),
            "ln_post": (D,), "ln_post_b": (D,),
            "proj": (D, D),
            "in_w": (D, 3 * D), "in_b": (3 * D,),
            "out_w": (D, D), "out_b": (D,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()

        def rep(node):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in node.items()}

        mine = self.param_shapes()
        specs["vision"] = rep(mine["vision"])
        specs["resampler"] = rep(mine["resampler"])
        return specs

    def _with_llm(self, maps):
        return [("llm." + n, p, t) for n, p, t in maps]

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_llm(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_llm(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List:
        lay = "vpm.blocks.{i}."
        pairs = [
            (lay + "norm1.weight", "vision.layers.ln1", False),
            (lay + "norm1.bias", "vision.layers.ln1_b", False),
            (lay + "attn.qkv.weight", "vision.layers.qkv_w", True),
            (lay + "attn.qkv.bias", "vision.layers.qkv_b", False),
            (lay + "attn.proj.weight", "vision.layers.proj_w", True),
            (lay + "attn.proj.bias", "vision.layers.proj_b", False),
            (lay + "norm2.weight", "vision.layers.ln2", False),
            (lay + "norm2.bias", "vision.layers.ln2_b", False),
            (lay + "mlp.fc1.weight", "vision.layers.fc1", True),
            (lay + "mlp.fc1.bias", "vision.layers.fc1_b", False),
            (lay + "mlp.fc2.weight", "vision.layers.fc2", True),
            (lay + "mlp.fc2.bias", "vision.layers.fc2_b", False),
        ]
        out = [(t, p, tr, self.v_used_layers) for t, p, tr in pairs]
        for name, path, tr in [
            ("vpm.patch_embed.proj.weight", "vision.patch_w", False),
            ("vpm.patch_embed.proj.bias", "vision.patch_b", False),
            ("vpm.pos_embed", "vision.pos", False),
            ("vpm.norm.weight", "vision.final_ln", False),
            ("vpm.norm.bias", "vision.final_ln_b", False),
            ("resampler.query", "resampler.query", False),
            ("resampler.pos_embed", "resampler.pos", False),
            ("resampler.kv_proj.weight", "resampler.kv_w", True),
            ("resampler.ln_q.weight", "resampler.ln_q", False),
            ("resampler.ln_q.bias", "resampler.ln_q_b", False),
            ("resampler.ln_kv.weight", "resampler.ln_kv", False),
            ("resampler.ln_kv.bias", "resampler.ln_kv_b", False),
            ("resampler.ln_post.weight", "resampler.ln_post", False),
            ("resampler.ln_post.bias", "resampler.ln_post_b", False),
            ("resampler.proj", "resampler.proj", False),
            ("resampler.attn.in_proj_weight", "resampler.in_w", True),
            ("resampler.attn.in_proj_bias", "resampler.in_b", False),
            ("resampler.attn.out_proj.weight", "resampler.out_w", True),
            ("resampler.attn.out_proj.bias", "resampler.out_b", False),
        ]:
            out.append((name, path, tr, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        v = params["vision"]
        if v["patch_w"].ndim == 4:  # [E, 3, p, p] conv kernel
            v["patch_w"] = np.ascontiguousarray(
                v["patch_w"].reshape(v["patch_w"].shape[0], -1).T)
        if v["pos"].ndim == 3:  # timm stores [1, S*S, E]
            v["pos"] = np.ascontiguousarray(v["pos"][0])

    def _vision_forward(self, params, patches, vit_pos, k_pos, n_real):
        """[Npad, 3*p*p] patches + host-interpolated position tables ->
        [query_num, text_H]."""
        f32 = jnp.float32
        vp = params["vision"]
        E, heads = self.v_hidden, self.v_heads
        Dh = E // heads
        x = patches.astype(f32) @ vp["patch_w"].astype(f32) + \
            vp["patch_b"].astype(f32)
        x = x + vit_pos.astype(f32)
        N = x.shape[0]
        key_ok = jnp.arange(N) < n_real[0]
        scale = 1.0 / math.sqrt(Dh)

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _ln(x, lp["ln1"], lp["ln1_b"], self.v_eps)
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = (q * scale).reshape(N, heads, Dh)
            k = k.reshape(N, heads, Dh)
            v = v.reshape(N, heads, Dh)
            scores = jnp.einsum("qhd,khd->hqk", q, k)
            scores = jnp.where(key_ok[None, None, :], scores, -1e30)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(N, E)
            x = x + o @ lp["proj_w"] + lp["proj_b"]
            h = _ln(x, lp["ln2"], lp["ln2_b"], self.v_eps)
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)  # timm nn.GELU
            return x + h @ lp["fc2"] + lp["fc2_b"], None

        x, _ = jax.lax.scan(block, x, vp["layers"])
        x = _ln(x, vp["final_ln"].astype(f32),
                vp["final_ln_b"].astype(f32), self.v_eps)

        # Resampler2: queries add the FIXED sincos grid, keys the
        # interpolated one (reference resampler.py:248-280).
        rp = jax.tree.map(lambda a: a.astype(f32), params["resampler"])
        D = self.hidden_size
        rh = self.r_heads
        rd = D // rh
        kv = _ln(x @ rp["kv_w"], rp["ln_kv"], rp["ln_kv_b"], 1e-6)
        q_in = _ln(rp["query"], rp["ln_q"], rp["ln_q_b"], 1e-6) + \
            rp["pos"]
        wq, wk, wv = jnp.split(rp["in_w"], 3, axis=1)
        bq, bk, bv = jnp.split(rp["in_b"], 3)
        q = ((q_in @ wq + bq) / math.sqrt(rd)).reshape(-1, rh, rd)
        k = ((kv + k_pos.astype(f32)) @ wk + bk).reshape(N, rh, rd)
        v = (kv @ wv + bv).reshape(N, rh, rd)
        scores = jnp.einsum("qhd,khd->hqk", q, k)
        scores = jnp.where(key_ok[None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(-1, D)
        o = o @ rp["out_w"] + rp["out_b"]
        o = _ln(o, rp["ln_post"], rp["ln_post_b"], 1e-6)
        return o @ rp["proj"]

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        px = np.asarray(item["pixel_values"] if isinstance(item, dict)
                        else item, np.float32)
        p = self.v_patch
        if px.ndim != 3 or px.shape[0] != 3:
            raise ValueError(
                "MiniCPM-V 2.0 slices must be pixel_values [3, H, W]; "
                f"got {px.shape}")
        # timm dynamic_img_pad: zero-pad right/bottom to patch multiples.
        ph, pw = -px.shape[1] % p, -px.shape[2] % p
        if ph or pw:
            px = np.pad(px, ((0, 0), (0, ph), (0, pw)))
        h, w = px.shape[1] // p, px.shape[2] // p
        n = h * w
        patches = px.reshape(3, h, p, w, p).transpose(
            1, 3, 0, 2, 4).reshape(n, 3 * p * p)
        vp = params["vision"]
        vit_pos = _interp_grid(np.asarray(vp["pos"], np.float32), h, w,
                               antialias=True)
        k_pos = _interp_grid(
            np.asarray(params["resampler"]["pos"], np.float32), h, w,
            antialias=False)
        bucket = 256
        npad = -n % bucket + n
        if npad > n:
            patches = np.pad(patches, ((0, npad - n), (0, 0)))
            vit_pos = np.pad(vit_pos, ((0, npad - n), (0, 0)))
            k_pos = np.pad(k_pos, ((0, npad - n), (0, 0)))
        if self._vision_jit is None:
            self._vision_jit = jax.jit(self._vision_forward)
        out = self._vision_jit(params, jnp.asarray(patches),
                               jnp.asarray(vit_pos), jnp.asarray(k_pos),
                               jnp.asarray([n], np.int32))
        return np.asarray(out).astype(np.float32)
