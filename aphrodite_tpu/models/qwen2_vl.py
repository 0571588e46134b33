"""Qwen2-VL: Qwen2 text stack + windowless ViT vision tower + M-RoPE.

Reference: aphrodite/modeling/models/qwen2_vl.py. TPU design:
- The vision tower runs ONCE per image at request-add time as one jitted
  program (patch projection, `depth` blocks under a lax.scan, the 2x2
  patch merger), padded to a patch bucket so arbitrary image sizes share
  compiled programs. The HF image processor already orders patches in
  spatial-merge blocks, so the merger is a plain reshape.
- 2D vision rope frequencies are computed host-side per grid
  (reference rot_pos_emb, qwen2_vl.py:507) and fed as an array — no
  in-graph gathers, and the (h, w) -> merge-block permutation stays in
  numpy.
- M-RoPE in the language model rides ForwardBatch.mrope_positions
  (models/llama.py); this class derives the per-prompt [3, L] position
  table + decode delta (reference MRotaryEmbedding.get_input_positions,
  rotary_embedding.py:807).

Multimodal input items are dicts {"pixel_values": [t*h*w, C*tps*p*p]
flattened patches, "image_grid_thw": [3]} as produced by the HF
Qwen2VLImageProcessor; videos arrive under the "video" modality key as
the same layout (pixel_values_videos / video_grid_thw spellings also
accepted) with grid_t > 1 — the tower attends within each frame
(cu_seqlens per t) and M-RoPE advances the temporal stream per frame.
"""

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.layers import apply_rope
from aphrodite_tpu.models.llama import LlamaForCausalLM


def _layernorm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


class Qwen2VLForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True
    attention_bias = True  # Qwen2 text stack

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        v = dict(hf["vision_config"])
        self.v_embed = int(v.get("embed_dim", 1280))
        self.v_depth = int(v.get("depth", 32))
        self.v_heads = int(v.get("num_heads", 16))
        self.v_mlp = int(self.v_embed * float(v.get("mlp_ratio", 4.0)))
        self.v_patch = int(v.get("patch_size", 14))
        self.v_tps = int(v.get("temporal_patch_size", 2))
        self.v_merge = int(v.get("spatial_merge_size", 2))
        self.v_chans = int(v.get("in_channels", v.get("in_chans", 3)))
        self.v_out = int(v.get("hidden_size", self.hidden_size))
        self.v_eps = 1e-6  # reference partial(nn.LayerNorm, eps=1e-6)
        self.image_token_index = int(hf.get("image_token_id", 151655))
        self.video_token_index = int(hf.get("video_token_id", 151656))
        # Image AND video ride the same tower; videos are patch grids
        # with grid_t > 1 (HF Qwen2VLImageProcessor folds
        # temporal_patch_size frames into the channel dim, so the item
        # layout is identical).
        self.modality_token_ids = {
            "image": self.image_token_index,
            "video": self.video_token_index,
        }
        if self.mrope_section is None:
            raise ValueError(
                "Qwen2-VL config must carry rope_scaling.mrope_section")
        self._vision_jit = None

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        E, Lv, I = self.v_embed, self.v_depth, self.v_mlp
        pdim = self.v_chans * self.v_tps * self.v_patch * self.v_patch
        m2 = self.v_merge**2
        shapes["vision"] = {
            "patch_w": (pdim, E),
            "layers": {
                "ln1": (Lv, E), "ln1_b": (Lv, E),
                "qkv_w": (Lv, E, 3 * E), "qkv_b": (Lv, 3 * E),
                "proj_w": (Lv, E, E), "proj_b": (Lv, E),
                "ln2": (Lv, E), "ln2_b": (Lv, E),
                "fc1": (Lv, E, I), "fc1_b": (Lv, I),
                "fc2": (Lv, I, E), "fc2_b": (Lv, E),
            },
            "merger": {
                "ln_q": (E,), "ln_q_b": (E,),
                "w1": (m2 * E, m2 * E), "b1": (m2 * E,),
                "w2": (m2 * E, self.v_out), "b2": (self.v_out,),
            },
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["vision"] = {
            "patch_w": P(),
            "layers": {k: P() for k in
                       ("ln1", "ln1_b", "qkv_w", "qkv_b", "proj_w",
                        "proj_b", "ln2", "ln2_b", "fc1", "fc1_b", "fc2",
                        "fc2_b")},
            "merger": {k: P() for k in
                       ("ln_q", "ln_q_b", "w1", "b1", "w2", "b2")},
        }
        return specs

    # ---- HF weight mappings (old "visual.*"/"model.layers.*" and new
    # "model.visual.*"/"model.language_model.layers.*" layouts) ---------

    def _both_lm(self, maps):
        out = []
        for hf_name, our_path, transpose in maps:
            out.append((hf_name, our_path, transpose))
            if hf_name.startswith("model."):
                out.append((hf_name.replace(
                    "model.", "model.language_model.", 1), our_path,
                    transpose))
        return out

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._both_lm(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._both_lm(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List[Tuple[str, str, bool, int]]:
        blk = "visual.blocks.{i}."
        pairs = [
            (blk + "norm1.weight", "vision.layers.ln1", False),
            (blk + "norm1.bias", "vision.layers.ln1_b", False),
            (blk + "attn.qkv.weight", "vision.layers.qkv_w", True),
            (blk + "attn.qkv.bias", "vision.layers.qkv_b", False),
            (blk + "attn.proj.weight", "vision.layers.proj_w", True),
            (blk + "attn.proj.bias", "vision.layers.proj_b", False),
            (blk + "norm2.weight", "vision.layers.ln2", False),
            (blk + "norm2.bias", "vision.layers.ln2_b", False),
            (blk + "mlp.fc1.weight", "vision.layers.fc1", True),
            (blk + "mlp.fc1.bias", "vision.layers.fc1_b", False),
            (blk + "mlp.fc2.weight", "vision.layers.fc2", True),
            (blk + "mlp.fc2.bias", "vision.layers.fc2_b", False),
        ]
        out = []
        for template, path, transpose in pairs:
            out.append((template, path, transpose, self.v_depth))
            out.append(("model." + template, path, transpose,
                        self.v_depth))
        globals_ = [
            ("visual.patch_embed.proj.weight", "vision.patch_w", False),
            ("visual.merger.ln_q.weight", "vision.merger.ln_q", False),
            ("visual.merger.ln_q.bias", "vision.merger.ln_q_b", False),
            ("visual.merger.mlp.0.weight", "vision.merger.w1", True),
            ("visual.merger.mlp.0.bias", "vision.merger.b1", False),
            ("visual.merger.mlp.2.weight", "vision.merger.w2", True),
            ("visual.merger.mlp.2.bias", "vision.merger.b2", False),
        ]
        for hf_name, path, transpose in globals_:
            out.append((hf_name, path, transpose, 1))
            out.append(("model." + hf_name, path, transpose, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """Conv3d kernel [E, C, tps, p, p] -> matmul form
        [C*tps*p*p, E] (stride==kernel conv == reshape + matmul)."""
        w = params["vision"]["patch_w"]
        if w.ndim == 5:
            params["vision"]["patch_w"] = np.ascontiguousarray(
                w.reshape(w.shape[0], -1).T)

    # ---- M-RoPE positions (reference rotary_embedding.py:807) ---------

    def mrope_input_positions(
            self, token_ids: List[int],
            items: List[Any]) -> Tuple[np.ndarray, int]:
        """[3, L] T/H/W rope positions for the EXPANDED prompt + the
        decode position delta. Image token runs take a 3D grid layout;
        text segments advance all three streams together from the
        running max."""
        grids = []
        for it in items:
            _, g = self._item_arrays(it)
            grids.append((int(g[0]), int(g[1]), int(g[2])))
        ids = np.asarray(token_ids, np.int64)
        m = self.v_merge
        is_img = (ids == self.image_token_index) | \
            (ids == self.video_token_index)
        pos_list = []
        st_idx = 0
        i = 0
        img = 0
        L = len(ids)
        while i < L:
            if is_img[i]:
                t, h, w = grids[img]
                img += 1
                lt, lh, lw = t, h // m, w // m
                n = lt * lh * lw
                t_idx = np.repeat(np.arange(lt), lh * lw)
                h_idx = np.tile(np.repeat(np.arange(lh), lw), lt)
                w_idx = np.tile(np.arange(lw), lt * lh)
                pos_list.append(
                    np.stack([t_idx, h_idx, w_idx]) + st_idx)
                st_idx += max(lt, lh, lw)
                i += n
            else:
                j = i
                while j < L and not is_img[j]:
                    j += 1
                ln = j - i
                pos_list.append(np.broadcast_to(
                    np.arange(ln) + st_idx, (3, ln)))
                st_idx += ln
                i = j
        table = np.ascontiguousarray(
            np.concatenate(pos_list, axis=1).astype(np.int32))
        delta = int(table.max()) + 1 - L
        return table, delta

    # ---- vision tower --------------------------------------------------

    def _vision_freqs(self, t: int, h: int, w: int) -> np.ndarray:
        """Per-patch 2D rope frequencies [t*h*w, head_dim/2] in the
        merge-block patch order (reference rot_pos_emb)."""
        m = self.v_merge
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def rearr(a):
            return a.reshape(h // m, m, w // m, m).transpose(
                0, 2, 1, 3).reshape(-1)

        pos = np.stack([rearr(hpos), rearr(wpos)], axis=-1)  # [h*w, 2]
        pos = np.tile(pos, (t, 1))
        dim = (self.v_embed // self.v_heads) // 2
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) /
                                 dim))
        fr = pos[:, :, None].astype(np.float64) * inv[None, None, :]
        return fr.reshape(pos.shape[0], -1).astype(np.float32)

    def _vision_forward(self, params, patches, freqs, n_real):
        """[Npad, C*tps*p*p] patches -> [Npad/merge^2, v_out] features
        (fp32, HF-exact). Padding patches are masked out of attention;
        video grids (grid_t > 1) attend WITHIN each frame only (HF
        Qwen2VisionTransformer cu_seqlens = h*w per t)."""
        vp = params["vision"]
        E, heads = self.v_embed, self.v_heads
        D = E // heads
        f32 = jnp.float32
        x = patches.astype(f32) @ vp["patch_w"].astype(f32)  # [N, E]
        N = x.shape[0]
        cos = jnp.cos(freqs)
        sin = jnp.sin(freqs)
        frame = jnp.arange(N) // n_real[1]  # n_real[1] = h*w
        key_ok = (jnp.arange(N) < n_real[0])[None, :] & \
            (frame[:, None] == frame[None, :])  # [q, k]
        neg = jnp.asarray(np.finfo(np.float32).min, f32)
        scale = 1.0 / math.sqrt(D)

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _layernorm(x, lp["ln1"], lp["ln1_b"], self.v_eps)
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]  # [N, 3E]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = apply_rope(q.reshape(N, heads, D), cos, sin)
            k = apply_rope(k.reshape(N, heads, D), cos, sin)
            v = v.reshape(N, heads, D)
            scores = jnp.einsum("qhd,khd->hqk", q, k) * scale
            scores = jnp.where(key_ok[None], scores, neg)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(N, E)
            x = x + o @ lp["proj_w"] + lp["proj_b"]
            h = _layernorm(x, lp["ln2"], lp["ln2_b"], self.v_eps)
            h = h @ lp["fc1"] + lp["fc1_b"]
            h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
            return x + h @ lp["fc2"] + lp["fc2_b"], None

        x, _ = jax.lax.scan(block, x, vp["layers"])
        mg = vp["merger"]
        x = _layernorm(x, mg["ln_q"].astype(f32), mg["ln_q_b"].astype(f32),
                       self.v_eps)
        x = x.reshape(N // self.v_merge**2, -1)
        x = x @ mg["w1"].astype(f32) + mg["b1"].astype(f32)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ mg["w2"].astype(f32) + mg["b2"].astype(f32)
        return x

    # ---- server-side preprocessing (HF Qwen2VLImageProcessor port) ----

    def prepare_server_image(self, img) -> Dict[str, np.ndarray]:
        """PIL image -> {"pixel_values": [t*h*w, C*tps*p*p],
        "image_grid_thw": [3]} (HF image_processing_qwen2_vl smart_resize
        + merge-ordered patchify, OPENAI_CLIP mean/std)."""
        from PIL import Image

        p, m, tps = self.v_patch, self.v_merge, self.v_tps
        factor = p * m
        min_pixels, max_pixels = 56 * 56, 14 * 14 * 4 * 1280
        w, h = img.size
        hb = max(factor, round(h / factor) * factor)
        wb = max(factor, round(w / factor) * factor)
        if hb * wb > max_pixels:
            beta = math.sqrt(h * w / max_pixels)
            hb = math.floor(h / beta / factor) * factor
            wb = math.floor(w / beta / factor) * factor
        elif hb * wb < min_pixels:
            beta = math.sqrt(min_pixels / (h * w))
            hb = math.ceil(h * beta / factor) * factor
            wb = math.ceil(w * beta / factor) * factor
        img = img.resize((wb, hb), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        arr = ((arr - mean) / std).transpose(2, 0, 1)  # [C, H, W]
        C = arr.shape[0]
        gh, gw = hb // p, wb // p
        patches = np.tile(arr[None], (tps, 1, 1, 1)).reshape(
            1, tps, C, gh // m, m, p, gw // m, m, p)
        patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        flat = patches.reshape(gh * gw, C * tps * p * p)
        return {"pixel_values": flat.astype(np.float32),
                "image_grid_thw": np.asarray([1, gh, gw], np.int64)}

    @staticmethod
    def _item_arrays(item):
        """(patches, grid_thw) from an image OR video item — the HF
        processor spells video outputs pixel_values_videos /
        video_grid_thw, same layout."""
        px = item.get("pixel_values", item.get("pixel_values_videos"))
        g = item.get("image_grid_thw", item.get("video_grid_thw"))
        if px is None or g is None:
            raise ValueError(
                "Qwen2-VL items must be dicts with 'pixel_values' "
                "(flattened patches) and 'image_grid_thw' (or the "
                "_videos/video_ spellings)")
        return px, np.asarray(g).reshape(-1)[-3:]

    def num_item_tokens(self, item) -> int:
        _, g = self._item_arrays(item)
        return int(g[0] * g[1] * g[2]) // (self.v_merge**2)

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        if not isinstance(item, dict):
            raise ValueError(
                "Qwen2-VL image items must be dicts with 'pixel_values' "
                "(flattened patches) and 'image_grid_thw'")
        px, g = self._item_arrays(item)
        px = np.asarray(px, np.float32)
        t, h, w = int(g[0]), int(g[1]), int(g[2])
        n = t * h * w
        if px.shape[0] != n:
            raise ValueError(
                f"pixel_values rows ({px.shape[0]}) != t*h*w ({n})")
        freqs = self._vision_freqs(t, h, w)
        # Pad to a patch bucket (multiple of merge^2) so image sizes
        # share compiled programs.
        m2 = self.v_merge**2
        bucket = max(m2, 256)
        npad = -n % bucket + n
        if npad > n:
            px = np.pad(px, ((0, npad - n), (0, 0)))
            freqs = np.pad(freqs, ((0, npad - n), (0, 0)))
        if self._vision_jit is None:
            self._vision_jit = jax.jit(self._vision_forward)
        out = self._vision_jit(params, jnp.asarray(px),
                               jnp.asarray(freqs),
                               jnp.asarray([n, h * w], np.int32))
        return np.asarray(out)[:n // m2]
