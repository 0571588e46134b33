"""Chameleon: early-fusion multimodal llama — images become DISCRETE
vocab tokens through a VQ-VAE encoder, then one plain decoder serves
text and image tokens alike.

Reference: aphrodite/modeling/models/chameleon.py. TPU design: the
whole VQ path (conv encoder, vector quantizer, img->bpe vocabulary
remap) runs ONCE per image at request-add as one jitted program, and
the engine's placeholder expansion splices plain TOKEN IDS (the
expand_image_item hook returns no feature spans), so the decode path is
identical to a text-only llama. The text stack adds Chameleon's
per-head LayerNorm qk-norm (stats over head_dim, per-head affine) and
the always-on image-token logit mask (HF masks image tokens to dtype
min on every forward, modeling_chameleon.py ~1190). swin_norm (30b)
checkpoints ride the shared llama norm_after knob.
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


def _group_norm(x, w, b, groups=32, eps=1e-6):
    """GroupNorm over NCHW (fp32)."""
    B, C, H, W = x.shape
    xg = x.reshape(B, groups, C // groups, H, W)
    mu = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(B, C, H, W)
    return x * w[None, :, None, None] + b[None, :, None, None]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv(x, w, b, stride=1, pad=1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


class ChameleonForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        super().__init__(model_config, parallel_config)
        # 30b checkpoints use the swin (post-norm) residual order.
        self.norm_after = bool(hf.get("swin_norm", False))
        self.vq = dict(hf["vq_config"])
        vocab_map = hf["vocabulary_map"]
        self.image_token_index = int(vocab_map["<image>"])
        # IMGIMG<digits-as-letters><suffix> names map bpe ids to VQ
        # codebook indices (reference ChameleonImageVocabularyMapping).
        chr_map = {chr(ord("A") + i): str(i) for i in range(10)}
        bpe2img = {}
        for name, val in vocab_map.items():
            if name.startswith("IMGIMG"):
                body = "".join(chr_map.get(c, c) for c in name[6:-1])
                bpe2img[int(val)] = int(body)
        self.image_token_ids = np.asarray(sorted(bpe2img), np.int32)
        img2bpe = np.zeros((max(bpe2img.values()) + 1,), np.int32)
        for bpe, img in bpe2img.items():
            img2bpe[img] = bpe
        self._img2bpe = img2bpe
        # Always-on logit mask: plain image tokens can never be sampled
        # (text generation only; boi/eoi stay legal).
        mask = np.zeros((self.vocab_size,), bool)
        mask[self.image_token_ids] = True
        self._image_logit_mask = jnp.asarray(mask)
        self._vq_jit = None

    # ---- text-stack knobs: per-head LayerNorm qk-norm -----------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, NH, NKV, D = (self.num_layers, self.num_heads,
                         self.num_kv_heads_padded, self.head_dim)
        shapes["layers"]["q_norm"] = (L, NH, D)
        shapes["layers"]["q_norm_b"] = (L, NH, D)
        shapes["layers"]["k_norm"] = (L, NKV, D)
        shapes["layers"]["k_norm_b"] = (L, NKV, D)
        shapes["vq"] = self._vq_shapes()
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm"] = P(None, "model", None)
        specs["layers"]["q_norm_b"] = P(None, "model", None)
        specs["layers"]["k_norm"] = P(None, "model", None)
        specs["layers"]["k_norm_b"] = P(None, "model", None)

        def rep(node):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in node.items()}

        specs["vq"] = rep(self._vq_shapes())
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        pre = "model.layers.{i}.self_attn."
        maps += [
            (pre + "q_norm.weight", "layers.q_norm", False),
            (pre + "q_norm.bias", "layers.q_norm_b", False),
            (pre + "k_norm.weight", "layers.k_norm", False),
            (pre + "k_norm.bias", "layers.k_norm_b", False),
        ]
        return maps

    def maybe_pad_kv_weight(self, our_path: str,
                            arr: np.ndarray) -> np.ndarray:
        if (self.num_kv_heads_padded != self.num_kv_heads
                and our_path in ("layers.k_norm", "layers.k_norm_b")):
            reps = self.num_kv_heads_padded // self.num_kv_heads
            return np.repeat(arr.reshape(self.num_kv_heads,
                                         self.head_dim), reps, axis=0)
        return super().maybe_pad_kv_weight(our_path, arr)

    def qk_norm(self, q: jax.Array, k: jax.Array,
                lp: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        """Chameleon qk-norm: LayerNorm stats over head_dim WITHOUT
        affine, then per-head gamma/beta (HF ChameleonLayerNorm)."""

        def ln(x, w, b):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
            return (xf * w[None] + b[None]).astype(x.dtype)

        return (ln(q, lp["q_norm"], lp["q_norm_b"]),
                ln(k, lp["k_norm"], lp["k_norm_b"]))

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        logits = super().compute_logits(params, hidden)
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        return jnp.where(self._image_logit_mask[None, :], neg, logits)

    # ---- VQ-VAE param tree ----------------------------------------------

    def _vq_levels(self):
        mult = list(self.vq.get("channel_multiplier", [1, 1, 2, 2, 4]))
        base = int(self.vq.get("base_channels", 128))
        res = int(self.vq.get("resolution", 512))
        attn_res = list(self.vq.get("attn_resolutions") or [])
        nrb = int(self.vq.get("num_res_blocks", 2))
        levels = []
        curr = res
        block_in = base
        for i, m in enumerate(mult):
            block_out = base * m
            blocks = []
            for b in range(nrb):
                blocks.append((block_in, block_out, curr in attn_res))
                block_in = block_out
            levels.append((blocks, i != len(mult) - 1, block_in))
            if i != len(mult) - 1:
                curr //= 2
        return levels, block_in

    @staticmethod
    def _resnet_shapes(cin, cout):
        d = {
            "norm1": (cin,), "norm1_b": (cin,),
            "conv1": (cout, cin, 3, 3), "conv1_b": (cout,),
            "norm2": (cout,), "norm2_b": (cout,),
            "conv2": (cout, cout, 3, 3), "conv2_b": (cout,),
        }
        if cin != cout:
            d["nin"] = (cout, cin, 1, 1)
            d["nin_b"] = (cout,)
        return d

    @staticmethod
    def _attn_shapes(c):
        return {
            "norm": (c,), "norm_b": (c,),
            "q": (c, c, 1, 1), "q_b": (c,),
            "k": (c, c, 1, 1), "k_b": (c,),
            "v": (c, c, 1, 1), "v_b": (c,),
            "proj": (c, c, 1, 1), "proj_b": (c,),
        }

    def _vq_shapes(self) -> Dict[str, Any]:
        base = int(self.vq.get("base_channels", 128))
        zc = int(self.vq.get("latent_channels", 256))
        ed = int(self.vq.get("embed_dim", 256))
        ne = int(self.vq.get("num_embeddings", 8192))
        levels, mid_c = self._vq_levels()
        d: Dict[str, Any] = {
            "conv_in": (base, int(self.vq.get("in_channels", 3)), 3, 3),
            "conv_in_b": (base,),
        }
        for i, (blocks, has_down, out_c) in enumerate(levels):
            lv: Dict[str, Any] = {}
            for b, (cin, cout, has_attn) in enumerate(blocks):
                lv[f"block{b}"] = self._resnet_shapes(cin, cout)
                if has_attn:
                    lv[f"attn{b}"] = self._attn_shapes(cout)
            if has_down:
                lv["down"] = (out_c, out_c, 3, 3)
                lv["down_b"] = (out_c,)
            d[f"level{i}"] = lv
        d["mid1"] = self._resnet_shapes(mid_c, mid_c)
        d["mid_attn"] = self._attn_shapes(mid_c)
        d["mid2"] = self._resnet_shapes(mid_c, mid_c)
        d["norm_out"] = (mid_c,)
        d["norm_out_b"] = (mid_c,)
        d["conv_out"] = (zc, mid_c, 3, 3)
        d["conv_out_b"] = (zc,)
        d["quant_conv"] = (ed, zc, 1, 1)
        d["quant_conv_b"] = (ed,)
        d["codebook"] = (ne, ed)
        return d

    def hf_aux_mappings(self) -> List:
        out = []
        enc = "model.vqmodel.encoder."

        def emit(hf_prefix, our_prefix, shapes):
            ren = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
                   "conv2": "conv2", "nin": "nin_shortcut",
                   "norm": "norm", "q": "q", "k": "k", "v": "v",
                   "proj": "proj_out"}
            for key in shapes:
                if key.endswith("_b"):
                    hf_name = ren[key[:-2]] + ".bias"
                else:
                    hf_name = ren[key] + ".weight"
                out.append((hf_prefix + hf_name,
                            our_prefix + "." + key, False, 1))

        out.append((enc + "conv_in.weight", "vq.conv_in", False, 1))
        out.append((enc + "conv_in.bias", "vq.conv_in_b", False, 1))
        levels, _ = self._vq_levels()
        for i, (blocks, has_down, _) in enumerate(levels):
            for b, (cin, cout, has_attn) in enumerate(blocks):
                emit(f"{enc}down.{i}.block.{b}.", f"vq.level{i}.block{b}",
                     self._resnet_shapes(cin, cout))
                if has_attn:
                    emit(f"{enc}down.{i}.attn.{b}.", f"vq.level{i}.attn{b}",
                         self._attn_shapes(cout))
            if has_down:
                out.append((f"{enc}down.{i}.downsample.conv.weight",
                            f"vq.level{i}.down", False, 1))
                out.append((f"{enc}down.{i}.downsample.conv.bias",
                            f"vq.level{i}.down_b", False, 1))
        _, mid_c = self._vq_levels()
        emit(enc + "mid.block_1.", "vq.mid1",
             self._resnet_shapes(mid_c, mid_c))
        emit(enc + "mid.attn_1.", "vq.mid_attn", self._attn_shapes(mid_c))
        emit(enc + "mid.block_2.", "vq.mid2",
             self._resnet_shapes(mid_c, mid_c))
        out.append((enc + "norm_out.weight", "vq.norm_out", False, 1))
        out.append((enc + "norm_out.bias", "vq.norm_out_b", False, 1))
        out.append((enc + "conv_out.weight", "vq.conv_out", False, 1))
        out.append((enc + "conv_out.bias", "vq.conv_out_b", False, 1))
        out.append(("model.vqmodel.quant_conv.weight", "vq.quant_conv",
                    False, 1))
        out.append(("model.vqmodel.quant_conv.bias", "vq.quant_conv_b",
                    False, 1))
        out.append(("model.vqmodel.quantize.embedding.weight",
                    "vq.codebook", False, 1))
        return out

    # ---- VQ forward ------------------------------------------------------

    @staticmethod
    def _resnet(x, bp):
        h = _swish(_group_norm(x, bp["norm1"], bp["norm1_b"]))
        h = _conv(h, bp["conv1"], bp["conv1_b"])
        h = _swish(_group_norm(h, bp["norm2"], bp["norm2_b"]))
        h = _conv(h, bp["conv2"], bp["conv2_b"])
        if "nin" in bp:
            x = _conv(x, bp["nin"], bp["nin_b"], pad=0)
        return x + h

    @staticmethod
    def _spatial_attn(x, ap):
        B, C, H, W = x.shape
        h = _group_norm(x, ap["norm"], ap["norm_b"])
        q = _conv(h, ap["q"], ap["q_b"], pad=0).reshape(B, C, H * W)
        k = _conv(h, ap["k"], ap["k_b"], pad=0).reshape(B, C, H * W)
        v = _conv(h, ap["v"], ap["v_b"], pad=0).reshape(B, C, H * W)
        attn = jax.nn.softmax(
            jnp.einsum("bcq,bck->bqk", q, k) * (C ** -0.5), axis=-1)
        o = jnp.einsum("bck,bqk->bcq", v, attn).reshape(B, C, H, W)
        return x + _conv(o, ap["proj"], ap["proj_b"], pad=0)

    def _vq_encode(self, params, px):
        """[1, 3, R, R] fp32 -> [latent_h*latent_w] codebook indices."""
        vp = jax.tree.map(lambda a: a.astype(jnp.float32), params["vq"])
        x = _conv(px, vp["conv_in"], vp["conv_in_b"])
        levels, _ = self._vq_levels()
        for i, (blocks, has_down, _) in enumerate(levels):
            lv = vp[f"level{i}"]
            for b, (cin, cout, has_attn) in enumerate(blocks):
                x = self._resnet(x, lv[f"block{b}"])
                if has_attn:
                    x = self._spatial_attn(x, lv[f"attn{b}"])
            if has_down:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
                x = jax.lax.conv_general_dilated(
                    x, lv["down"], (2, 2), [(0, 0), (0, 0)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                x = x + lv["down_b"][None, :, None, None]
        x = self._resnet(x, vp["mid1"])
        x = self._spatial_attn(x, vp["mid_attn"])
        x = self._resnet(x, vp["mid2"])
        x = _swish(_group_norm(x, vp["norm_out"], vp["norm_out_b"]))
        x = _conv(x, vp["conv_out"], vp["conv_out_b"])
        x = _conv(x, vp["quant_conv"], vp["quant_conv_b"], pad=0)
        # Quantize: nearest codebook row per spatial position (row-major).
        z = x[0].transpose(1, 2, 0).reshape(-1, x.shape[1])  # [hw, ed]
        cb = vp["codebook"]  # [ne, ed]
        d = (jnp.sum(z * z, axis=1, keepdims=True)
             + jnp.sum(cb * cb, axis=1)[None, :]
             - 2.0 * z @ cb.T)
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    # ---- engine hooks ----------------------------------------------------

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        px = np.asarray(item, np.float32)
        res = int(self.vq.get("resolution", 512))
        if px.shape != (3, res, res):
            raise ValueError(
                f"Chameleon images must be pixel_values [3, {res}, "
                f"{res}]; got {px.shape}")
        if self._vq_jit is None:
            self._vq_jit = jax.jit(self._vq_encode)
        idx = np.asarray(self._vq_jit(params, jnp.asarray(px[None])))
        return self._img2bpe[idx].astype(np.float32)

    def expand_image_item(self, image, feats):
        """Image placeholders expand to the VQ bpe TOKEN IDS — no
        embedding splice (they are ordinary vocab tokens)."""
        return [int(t) for t in feats], []
