"""Molmo (allenai): CLIP-style ViT backbone with two-layer feature
concat + 2x2 attention pooling onto a Qwen2/OLMo-shaped text stack.

Reference: aphrodite/modeling/models/molmo.py. TPU design: the whole
per-crop image path (linear patch embed, pre-LN resblocks, the
[-2, -9]-layer feature concat, pad-embed adjustment, 2x2 window
attention pooling, SwiGLU projector) is ONE jitted program over the
crop batch. Image items are the Molmo processor's crop tensors
{"images": [n_crops, 576, 588], "image_masks": [n_crops, 576]}; each
crop contributes 144 pooled features, all crops spliced contiguously
at the placeholder (the <im_col>/<im_start> text layout around them is
prompt authoring).

Text stack: fused att_proj/ff_proj split at load ([up; gate] order),
optional qkv bias, optional full-width RMS qk-norm
(attention_layer_norm), embedding carries 128 extra input-only rows
(wte.new_embedding) beyond the logit vocabulary; norm_after
checkpoints (OLMo-style post-norm) ride the shared llama knob.
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.layers import rms_norm
from aphrodite_tpu.models.llama import LlamaForCausalLM

ADDITIONAL_VOCAB_SIZE = 128
VIT_LAYERS = (-2, -9)


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


class MolmoForCausalLM(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_eps", 1e-6))
        hf.setdefault("attention_bias", bool(hf.get("qkv_bias", False)))
        if not hf.get("_molmo_ffn_halved"):
            hf["intermediate_size"] = int(hf["intermediate_size"]) // 2
            hf["_molmo_ffn_halved"] = True
        super().__init__(model_config, parallel_config)
        # OLMo-style post-norm residual order (Molmo-7B-O / 72B).
        self.norm_after = bool(hf.get("norm_after", False))
        # Logit vocabulary = embedding_size; the embedding table carries
        # 128 extra input-only rows (reference molmo.py:753-758, 1058).
        self.vocab_size = int(hf.get("embedding_size")
                              or hf.get("vocab_size"))
        self.qk_norm_on = bool(hf.get("attention_layer_norm", False))
        self.tie_word_embeddings = bool(hf.get("weight_tying", False))
        v = hf.get("vision_config") or {}
        self.v_hidden = int(v.get("image_emb_dim", 1024))
        self.v_layers = int(v.get("image_num_layers", 23))
        self.v_heads = int(v.get("image_num_heads", 16))
        self.v_mlp = int(v.get("image_mlp_dim", 4096))
        self.v_patch = int(v.get("image_patch_size", 14))
        self.v_num_pos = int(v.get("image_num_pos", 577))
        self.v_eps = float(v.get("image_norm_eps", 1e-5))
        size = v.get("image_default_input_size", (336, 336))
        self.v_grid = int(size[0]) // self.v_patch  # 24
        self.pooled_per_crop = ((self.v_grid + 1) // 2) ** 2  # 144
        self.num_image_tokens = self.pooled_per_crop
        self.image_token_index = int(hf.get("image_token_index",
                                            hf.get("image_patch_id", 0)))
        self._vision_jit = None

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        H = self.hidden_size
        shapes["embed"] = (self.vocab_size + ADDITIONAL_VOCAB_SIZE, H)
        if not self.tie_word_embeddings:
            shapes["lm_head"] = (H, self.vocab_size)
        E, Lv, I = self.v_hidden, self.v_layers, self.v_mlp
        pdim = 3 * self.v_patch * self.v_patch
        shapes["vision"] = {
            "cls": (E,), "pos": (self.v_num_pos, E),
            "patch_w": (pdim, E),
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
            "pre_ln": (E,), "pre_ln_b": (E,),
            "pad_embed": (2, 2 * E),
            "pool": {
                "wq": (2 * E, E), "bq": (E,),
                "wk": (2 * E, E), "bk": (E,),
                "wv": (2 * E, E), "bv": (E,),
                "wo": (E, E), "bo": (E,),
            },
            "proj": {
                "gate": (E, self.intermediate_size),
                "up": (E, self.intermediate_size),
                "down": (self.intermediate_size, H),
            },
        }
        if self.qk_norm_on:
            NH, NKV, D = (self.num_heads, self.num_kv_heads_padded,
                          self.head_dim)
            shapes["layers"]["q_norm"] = (self.num_layers, NH * D)
            shapes["layers"]["k_norm"] = (self.num_layers, NKV * D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()

        def rep(node):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in node.items()}

        specs["vision"] = rep(self.param_shapes()["vision"])
        if self.qk_norm_on:
            specs["layers"]["q_norm"] = P(None, "model")
            specs["layers"]["k_norm"] = P(None, "model")
        return specs

    def qk_norm(self, q: jax.Array, k: jax.Array,
                lp: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        if not self.qk_norm_on:
            return q, k
        T = q.shape[0]
        qn, _ = rms_norm(q.reshape(T, -1), lp["q_norm"], self.rms_eps)
        kn, _ = rms_norm(k.reshape(T, -1), lp["k_norm"], self.rms_eps)
        return qn.reshape(q.shape), kn.reshape(k.shape)

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        from aphrodite_tpu.quantization.qlinear import qmatmul

        h32 = hidden.astype(jnp.float32)
        if self.tie_word_embeddings:
            w = params["embed"][:self.vocab_size]
            return h32 @ w.astype(jnp.float32).T
        return qmatmul(h32, params["lm_head"]).astype(jnp.float32)

    # ---- HF weight mappings ----------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        b = "model.transformer.blocks.{i}."
        maps = [
            (b + "attn_out.weight", "layers.wo", True),
            (b + "attn_norm.weight", "layers.input_norm", False),
            (b + "ff_norm.weight", "layers.post_norm", False),
            (b + "ff_out.weight", "layers.down", True),
        ]
        if self.qk_norm_on:
            maps += [
                (b + "q_norm.weight", "layers.q_norm", False),
                (b + "k_norm.weight", "layers.k_norm", False),
            ]
        return maps

    def hf_split_mappings(self):
        H = self.hidden_size
        KVD = self.num_kv_heads * self.head_dim
        I = self.intermediate_size
        b = "model.transformer.blocks.{i}."
        maps = [
            (b + "att_proj.weight",
             [("layers.wq", 0, H), ("layers.wk", H, H + KVD),
              ("layers.wv", H + KVD, H + 2 * KVD)], True),
            # ff_proj packs [up; gate] (reference load_weights chunks
            # then swaps, molmo.py:1246-1249).
            (b + "ff_proj.weight",
             [("layers.up", 0, I), ("layers.gate", I, 2 * I)], True),
        ]
        if self.attention_bias:
            maps.append(
                (b + "att_proj.bias",
                 [("layers.bq", 0, H), ("layers.bk", H, H + KVD),
                  ("layers.bv", H + KVD, H + 2 * KVD)], False))
        return maps

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("model.transformer.ln_f.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("model.transformer.ff_out.weight", "lm_head",
                         True))
        return maps

    def hf_aux_mappings(self) -> List:
        out = []
        for pre in ("", "model."):
            lay = pre + "vision_backbone.image_vit.transformer." \
                "resblocks.{i}."
            pairs = [
                (lay + "attention_norm.weight", "vision.layers.ln1",
                 False),
                (lay + "attention_norm.bias", "vision.layers.ln1_b",
                 False),
                (lay + "attention.wq.weight", "vision.layers.wq", True),
                (lay + "attention.wq.bias", "vision.layers.bq", False),
                (lay + "attention.wk.weight", "vision.layers.wk", True),
                (lay + "attention.wk.bias", "vision.layers.bk", False),
                (lay + "attention.wv.weight", "vision.layers.wv", True),
                (lay + "attention.wv.bias", "vision.layers.bv", False),
                (lay + "attention.wo.weight", "vision.layers.wo", True),
                (lay + "attention.wo.bias", "vision.layers.bo", False),
                (lay + "ffn_norm.weight", "vision.layers.ln2", False),
                (lay + "ffn_norm.bias", "vision.layers.ln2_b", False),
                (lay + "feed_forward.w1.weight", "vision.layers.fc1",
                 True),
                (lay + "feed_forward.w1.bias", "vision.layers.fc1_b",
                 False),
                (lay + "feed_forward.w2.weight", "vision.layers.fc2",
                 True),
                (lay + "feed_forward.w2.bias", "vision.layers.fc2_b",
                 False),
            ]
            out += [(t, p, tr, self.v_layers) for t, p, tr in pairs]
            vb = pre + "vision_backbone."
            for name, path, tr in [
                (vb + "image_vit.class_embedding", "vision.cls", False),
                (vb + "image_vit.positional_embedding", "vision.pos",
                 False),
                (vb + "image_vit.patch_embedding.weight",
                 "vision.patch_w", True),
                (vb + "image_vit.pre_ln.weight", "vision.pre_ln", False),
                (vb + "image_vit.pre_ln.bias", "vision.pre_ln_b", False),
                (vb + "pad_embed", "vision.pad_embed", False),
                (vb + "image_pooling_2d.wq.weight", "vision.pool.wq",
                 True),
                (vb + "image_pooling_2d.wq.bias", "vision.pool.bq",
                 False),
                (vb + "image_pooling_2d.wk.weight", "vision.pool.wk",
                 True),
                (vb + "image_pooling_2d.wk.bias", "vision.pool.bk",
                 False),
                (vb + "image_pooling_2d.wv.weight", "vision.pool.wv",
                 True),
                (vb + "image_pooling_2d.wv.bias", "vision.pool.bv",
                 False),
                (vb + "image_pooling_2d.wo.weight", "vision.pool.wo",
                 True),
                (vb + "image_pooling_2d.wo.bias", "vision.pool.bo",
                 False),
                (vb + "image_projector.w1.weight", "vision.proj.gate",
                 True),
                (vb + "image_projector.w3.weight", "vision.proj.up",
                 True),
                (vb + "image_projector.w2.weight", "vision.proj.down",
                 True),
            ]:
                out.append((name, path, tr, 1))
        # The split embedding table: concatenated in finalize_params.
        out.append(("model.transformer.wte.embedding", "embed_base",
                    False, 1))
        out.append(("model.transformer.wte.new_embedding", "embed_new",
                    False, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        if "embed_base" in params:
            params["embed"] = np.concatenate(
                [params.pop("embed_base"), params.pop("embed_new")],
                axis=0)

    # ---- vision path -------------------------------------------------------

    def _vision_forward(self, params, crops, masks):
        """[B, 576, 588] crops + [B, 576] fractional masks ->
        [B, 144, text_H] pooled projected features (fp32)."""
        f32 = jnp.float32
        vp = params["vision"]
        E, heads = self.v_hidden, self.v_heads
        D = E // heads
        B, N = crops.shape[0], crops.shape[1]
        x = crops.astype(f32) @ vp["patch_w"].astype(f32)
        cls = jnp.broadcast_to(vp["cls"].astype(f32)[None, None], (B, 1, E))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vp["pos"].astype(f32)[None, :N + 1]
        x = _ln(x, vp["pre_ln"].astype(f32), vp["pre_ln_b"].astype(f32),
                self.v_eps)
        scale = 1.0 / math.sqrt(D)
        Lv = self.v_layers
        # Feature concat order follows VIT_LAYERS = [-2, -9]
        # (reference encode_image: features appended in that order).
        keep = [i % Lv for i in VIT_LAYERS]

        def block(carry, lp):
            x, idx, f1, f2 = carry
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _ln(x, lp["ln1"], lp["ln1_b"], self.v_eps)
            q = ((h @ lp["wq"] + lp["bq"]) * scale).reshape(
                B, -1, heads, D)
            k = (h @ lp["wk"] + lp["bk"]).reshape(B, -1, heads, D)
            v = (h @ lp["wv"] + lp["bv"]).reshape(B, -1, heads, D)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(
                B, -1, E)
            x = x + o @ lp["wo"] + lp["bo"]
            h = _ln(x, lp["ln2"], lp["ln2_b"], self.v_eps)
            h = h @ lp["fc1"] + lp["fc1_b"]
            h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
            x = x + h @ lp["fc2"] + lp["fc2_b"]
            f1 = jnp.where(idx == keep[0], x, f1)
            f2 = jnp.where(idx == keep[1], x, f2)
            return (x, idx + 1, f1, f2), None

        z = jnp.zeros_like(x)
        (_, _, f1, f2), _ = jax.lax.scan(
            block, (x, jnp.asarray(0, jnp.int32), z, z), vp["layers"])
        feats = jnp.concatenate([f1, f2], axis=-1)[:, 1:]  # drop CLS
        # Pad-embed adjustment from fractional crop masks
        # (reference MolmoVisionBackbone.forward).
        pad = vp["pad_embed"].astype(f32)
        m = masks.astype(f32)
        all_pad = (m == 0).astype(f32)
        partial = jnp.logical_and(m < 1, m > 0).astype(f32)
        feats = feats + pad[0][None, None] * all_pad[..., None]
        feats = feats + pad[1][None, None] * partial[..., None]
        # 2x2 window pooling with a mean query.
        g = self.v_grid
        E2 = 2 * E
        feats = feats.reshape(B, g // 2, 2, g // 2, 2, E2)
        win = jnp.transpose(feats, (0, 1, 3, 2, 4, 5)).reshape(
            B * (g // 2) ** 2, 4, E2)
        pp = jax.tree.map(lambda a: a.astype(f32), vp["pool"])
        q_in = jnp.mean(win, axis=1, keepdims=True)
        q = ((q_in @ pp["wq"] + pp["bq"]) * scale).reshape(
            -1, 1, heads, D)
        k = (win @ pp["wk"] + pp["bk"]).reshape(-1, 4, heads, D)
        v = (win @ pp["wv"] + pp["bv"]).reshape(-1, 4, heads, D)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k), axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, E)
        o = o @ pp["wo"] + pp["bo"]
        o = o.reshape(B, self.pooled_per_crop, E)
        pj = jax.tree.map(lambda a: a.astype(f32), vp["proj"])
        h = jax.nn.silu(o @ pj["gate"]) * (o @ pj["up"])
        return h @ pj["down"]

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        if not isinstance(item, dict) or "images" not in item:
            raise ValueError(
                "Molmo image items must be dicts with 'images' "
                "[n_crops, 576, 588] and 'image_masks' [n_crops, 576]")
        crops = np.asarray(item["images"], np.float32)
        masks = np.asarray(
            item.get("image_masks",
                     np.ones(crops.shape[:2], np.float32)), np.float32)
        n = self.v_grid * self.v_grid
        if crops.ndim != 3 or crops.shape[1] != n:
            raise ValueError(
                f"expected crops [n_crops, {n}, n_pixels]; got "
                f"{crops.shape}")
        if self._vision_jit is None:
            self._vision_jit = jax.jit(self._vision_forward)
        out = np.asarray(self._vision_jit(params, jnp.asarray(crops),
                                          jnp.asarray(masks)))
        return out.reshape(-1, out.shape[-1]).astype(np.float32)
