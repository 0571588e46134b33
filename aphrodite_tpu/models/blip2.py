"""BLIP-2: BLIP ViT tower + Q-Former (32 learned queries) + OPT text.

Reference: aphrodite/modeling/models/blip2.py + blip.py. TPU design:
the whole image path (ViT, Q-Former query/cross attention, language
projection) is ONE jitted program that runs once per image at
request-add; each image contributes exactly num_query_tokens features,
spliced at the image-placeholder positions like every other composite
(ForwardBatch.embeds_override). The Q-Former's per-layer heterogeneity
(cross-attention only every cross_attention_frequency layers) loads as
a separate aux stack with explicit layer indices and runs as an
unrolled loop — it is tiny and offline, so scan-ability buys nothing.

T5-based BLIP-2 checkpoints ride the encoder-decoder runner: the
query features splice into the T5 ENCODER stream (encoder-side
multimodal splice).
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.opt import OPTForCausalLM
from aphrodite_tpu.models.t5 import T5ForConditionalGeneration


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _attend(q, k, v, heads):
    """Plain multi-head attention over full sequences (fp32)."""
    Nq, E = q.shape
    D = E // heads
    q = q.reshape(Nq, heads, D)
    k = k.reshape(k.shape[0], heads, D)
    v = v.reshape(v.shape[0], heads, D)
    scores = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(D)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hqk,khd->qhd", attn, v).reshape(Nq, E)


class _Blip2Tower:
    """BLIP ViT + Q-Former + projection, shared by the OPT and T5
    variants. Methods only read self.v_*/q_* attrs and
    self.hidden_size."""

    is_multimodal = True

    def _init_blip2_tower(self, hf) -> None:
        v = dict(hf["vision_config"])
        self.v_hidden = int(v.get("hidden_size", 1408))
        self.v_layers = int(v.get("num_hidden_layers", 39))
        self.v_heads = int(v.get("num_attention_heads", 16))
        self.v_intermediate = int(v.get("intermediate_size", 6144))
        self.v_image_size = int(v.get("image_size", 224))
        self.v_patch = int(v.get("patch_size", 14))
        self.v_eps = float(v.get("layer_norm_eps", 1e-5))
        q = dict(hf["qformer_config"])
        self.q_hidden = int(q.get("hidden_size", 768))
        self.q_layers = int(q.get("num_hidden_layers", 12))
        self.q_heads = int(q.get("num_attention_heads", 12))
        self.q_intermediate = int(q.get("intermediate_size", 3072))
        self.q_eps = float(q.get("layer_norm_eps", 1e-12))
        self.cross_freq = int(q.get("cross_attention_frequency", 2))
        self.cross_indices = [i for i in range(self.q_layers)
                              if i % self.cross_freq == 0]
        self.num_query_tokens = int(hf.get("num_query_tokens", 32))
        self.num_image_tokens = self.num_query_tokens
        self.image_token_index = int(hf.get("image_token_index", 0))

    # ---- params ------------------------------------------------------

    def _blip2_tower_shapes(self) -> Dict[str, Any]:
        shapes = {}
        E, Lv, I = self.v_hidden, self.v_layers, self.v_intermediate
        p = self.v_patch
        n_pos = (self.v_image_size // p) ** 2 + 1
        shapes["vision"] = {
            "patch_w": (3 * p * p, E), "patch_b": (E,),
            "cls": (E,), "pos": (n_pos, E),
            "layers": {
                "ln1": (Lv, E), "ln1_b": (Lv, E),
                "qkv_w": (Lv, E, 3 * E), "qkv_b": (Lv, 3 * E),
                "proj_w": (Lv, E, E), "proj_b": (Lv, E),
                "ln2": (Lv, E), "ln2_b": (Lv, E),
                "fc1": (Lv, E, I), "fc1_b": (Lv, I),
                "fc2": (Lv, I, E), "fc2_b": (Lv, E),
            },
            "post_ln": (E,), "post_ln_b": (E,),
        }
        Q, Lq, Iq = self.q_hidden, self.q_layers, self.q_intermediate
        Lc = len(self.cross_indices)
        shapes["qformer"] = {
            "query": (self.num_query_tokens, Q),
            "ln": (Q,), "ln_b": (Q,),
            "layers": {
                "q_w": (Lq, Q, Q), "q_b": (Lq, Q),
                "k_w": (Lq, Q, Q), "k_b": (Lq, Q),
                "v_w": (Lq, Q, Q), "v_b": (Lq, Q),
                "o_w": (Lq, Q, Q), "o_b": (Lq, Q),
                "ln_attn": (Lq, Q), "ln_attn_b": (Lq, Q),
                "fc1": (Lq, Q, Iq), "fc1_b": (Lq, Iq),
                "fc2": (Lq, Iq, Q), "fc2_b": (Lq, Q),
                "ln_out": (Lq, Q), "ln_out_b": (Lq, Q),
            },
            "cross": {
                "q_w": (Lc, Q, Q), "q_b": (Lc, Q),
                "k_w": (Lc, E, Q), "k_b": (Lc, Q),
                "v_w": (Lc, E, Q), "v_b": (Lc, Q),
                "o_w": (Lc, Q, Q), "o_b": (Lc, Q),
                "ln": (Lc, Q), "ln_b": (Lc, Q),
            },
        }
        shapes["projector"] = {"w": (Q, self.hidden_size),
                               "b": (self.hidden_size,)}
        return shapes

    def _blip2_tower_shardings(self, specs) -> Dict[str, Any]:
        def rep(shapes):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in shapes.items()}

        for part, sub in self._blip2_tower_shapes().items():
            specs[part] = rep(sub)
        return specs

    def _blip2_tower_aux(self) -> List:
        out = []
        ve = "vision_model.encoder.layers.{i}."
        for tmpl, path, tr in [
            (ve + "layer_norm1.weight", "vision.layers.ln1", False),
            (ve + "layer_norm1.bias", "vision.layers.ln1_b", False),
            (ve + "self_attn.qkv.weight", "vision.layers.qkv_w", True),
            (ve + "self_attn.qkv.bias", "vision.layers.qkv_b", False),
            (ve + "self_attn.projection.weight", "vision.layers.proj_w",
             True),
            (ve + "self_attn.projection.bias", "vision.layers.proj_b",
             False),
            (ve + "layer_norm2.weight", "vision.layers.ln2", False),
            (ve + "layer_norm2.bias", "vision.layers.ln2_b", False),
            (ve + "mlp.fc1.weight", "vision.layers.fc1", True),
            (ve + "mlp.fc1.bias", "vision.layers.fc1_b", False),
            (ve + "mlp.fc2.weight", "vision.layers.fc2", True),
            (ve + "mlp.fc2.bias", "vision.layers.fc2_b", False),
        ]:
            out.append((tmpl, path, tr, self.v_layers))
        qe = "qformer.encoder.layer.{i}."
        for tmpl, path, tr in [
            (qe + "attention.attention.query.weight",
             "qformer.layers.q_w", True),
            (qe + "attention.attention.query.bias",
             "qformer.layers.q_b", False),
            (qe + "attention.attention.key.weight",
             "qformer.layers.k_w", True),
            (qe + "attention.attention.key.bias",
             "qformer.layers.k_b", False),
            (qe + "attention.attention.value.weight",
             "qformer.layers.v_w", True),
            (qe + "attention.attention.value.bias",
             "qformer.layers.v_b", False),
            (qe + "attention.output.dense.weight",
             "qformer.layers.o_w", True),
            (qe + "attention.output.dense.bias",
             "qformer.layers.o_b", False),
            (qe + "attention.output.LayerNorm.weight",
             "qformer.layers.ln_attn", False),
            (qe + "attention.output.LayerNorm.bias",
             "qformer.layers.ln_attn_b", False),
            (qe + "intermediate_query.dense.weight",
             "qformer.layers.fc1", True),
            (qe + "intermediate_query.dense.bias",
             "qformer.layers.fc1_b", False),
            (qe + "output_query.dense.weight",
             "qformer.layers.fc2", True),
            (qe + "output_query.dense.bias",
             "qformer.layers.fc2_b", False),
            (qe + "output_query.LayerNorm.weight",
             "qformer.layers.ln_out", False),
            (qe + "output_query.LayerNorm.bias",
             "qformer.layers.ln_out_b", False),
        ]:
            out.append((tmpl, path, tr, self.q_layers))
        # Cross-attention sub-stack: explicit (interleaved) indices.
        for tmpl, path, tr in [
            (qe + "crossattention.attention.query.weight",
             "qformer.cross.q_w", True),
            (qe + "crossattention.attention.query.bias",
             "qformer.cross.q_b", False),
            (qe + "crossattention.attention.key.weight",
             "qformer.cross.k_w", True),
            (qe + "crossattention.attention.key.bias",
             "qformer.cross.k_b", False),
            (qe + "crossattention.attention.value.weight",
             "qformer.cross.v_w", True),
            (qe + "crossattention.attention.value.bias",
             "qformer.cross.v_b", False),
            (qe + "crossattention.output.dense.weight",
             "qformer.cross.o_w", True),
            (qe + "crossattention.output.dense.bias",
             "qformer.cross.o_b", False),
            (qe + "crossattention.output.LayerNorm.weight",
             "qformer.cross.ln", False),
            (qe + "crossattention.output.LayerNorm.bias",
             "qformer.cross.ln_b", False),
        ]:
            out.append((tmpl, path, tr, len(self.cross_indices),
                        self.cross_indices))
        for name, path, tr in [
            ("vision_model.embeddings.class_embedding", "vision.cls",
             False),
            ("vision_model.embeddings.patch_embedding.weight",
             "vision.patch_w", False),
            ("vision_model.embeddings.patch_embedding.bias",
             "vision.patch_b", False),
            ("vision_model.embeddings.position_embedding", "vision.pos",
             False),
            ("vision_model.post_layernorm.weight", "vision.post_ln",
             False),
            ("vision_model.post_layernorm.bias", "vision.post_ln_b",
             False),
            ("qformer.layernorm.weight", "qformer.ln", False),
            ("qformer.layernorm.bias", "qformer.ln_b", False),
            ("query_tokens", "qformer.query", False),
            ("language_projection.weight", "projector.w", True),
            ("language_projection.bias", "projector.b", False),
        ]:
            out.append((name, path, tr, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        v = params["vision"]
        if v["patch_w"].ndim == 4:  # [E, 3, p, p] conv kernel
            v["patch_w"] = np.ascontiguousarray(
                v["patch_w"].reshape(v["patch_w"].shape[0], -1).T)
        if v["cls"].ndim == 3:  # [1, 1, E]
            v["cls"] = v["cls"].reshape(-1)
        if v["pos"].ndim == 3:  # [1, n_pos, E]
            v["pos"] = v["pos"][0]
        q = params["qformer"]
        if q["query"].ndim == 3:  # [1, nq, Q]
            q["query"] = q["query"][0]

    # ---- vision + Q-Former forward --------------------------------------

    def encode_images(self, params: Dict[str, Any],
                      pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, S] -> [B, num_query_tokens, text_H] (fp32,
        HF-exact: BLIP ViT all layers + post-LN, Q-Former query path
        with cross-attention every cross_attention_frequency layers,
        language projection)."""
        return jax.vmap(lambda px: self._encode_one(params, px))(
            pixel_values)

    def _encode_one(self, params, px):
        f32 = jnp.float32
        vp = params["vision"]
        p = self.v_patch
        S = self.v_image_size
        g = S // p
        patches = px.astype(f32).reshape(3, g, p, g, p).transpose(
            1, 3, 0, 2, 4).reshape(g * g, 3 * p * p)
        x = patches @ vp["patch_w"].astype(f32) + vp["patch_b"].astype(f32)
        x = jnp.concatenate([vp["cls"].astype(f32)[None, :], x], axis=0)
        x = x + vp["pos"].astype(f32)[:x.shape[0]]

        def vblock(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _ln(x, lp["ln1"], lp["ln1_b"], self.v_eps)
            qkv = h @ lp["qkv_w"] + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            o = _attend(q, k, v, self.v_heads)
            x = x + o @ lp["proj_w"] + lp["proj_b"]
            h = _ln(x, lp["ln2"], lp["ln2_b"], self.v_eps)
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            return x + h @ lp["fc2"] + lp["fc2_b"], None

        x, _ = jax.lax.scan(vblock, x, vp["layers"])
        img = _ln(x, vp["post_ln"].astype(f32),
                  vp["post_ln_b"].astype(f32), self.v_eps)

        qf = params["qformer"]
        h = _ln(qf["query"].astype(f32), qf["ln"].astype(f32),
                qf["ln_b"].astype(f32), self.q_eps)
        layers = jax.tree.map(lambda a: a.astype(f32), qf["layers"])
        cross = jax.tree.map(lambda a: a.astype(f32), qf["cross"])
        ci = 0
        for i in range(self.q_layers):
            lp = jax.tree.map(lambda a: a[i], layers)
            o = _attend(h @ lp["q_w"] + lp["q_b"],
                        h @ lp["k_w"] + lp["k_b"],
                        h @ lp["v_w"] + lp["v_b"], self.q_heads)
            h = _ln(o @ lp["o_w"] + lp["o_b"] + h, lp["ln_attn"],
                    lp["ln_attn_b"], self.q_eps)
            if i in self.cross_indices:
                cp = jax.tree.map(lambda a: a[ci], cross)
                ci += 1
                o = _attend(h @ cp["q_w"] + cp["q_b"],
                            img @ cp["k_w"] + cp["k_b"],
                            img @ cp["v_w"] + cp["v_b"], self.q_heads)
                h = _ln(o @ cp["o_w"] + cp["o_b"] + h, cp["ln"],
                        cp["ln_b"], self.q_eps)
            f = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            h = _ln(f @ lp["fc2"] + lp["fc2_b"] + h, lp["ln_out"],
                    lp["ln_out_b"], self.q_eps)

        pj = params["projector"]
        return h @ pj["w"].astype(f32) + pj["b"].astype(f32)


class Blip2ForConditionalGeneration(_Blip2Tower, OPTForCausalLM):
    """OPT-decoder BLIP-2. T5-decoder checkpoints dispatch to
    Blip2T5ForConditionalGeneration (registry sniffs the text
    model_type)."""

    def __init__(self, model_config, parallel_config=None) -> None:
        OPTForCausalLM.__init__(self, model_config, parallel_config)
        self._init_blip2_tower(model_config.hf_config)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = OPTForCausalLM.param_shapes(self)
        shapes.update(self._blip2_tower_shapes())
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        return self._blip2_tower_shardings(
            OPTForCausalLM.param_shardings(self))

    def _with_lm_prefix(self, maps):
        return [("language_model." + n, path, t) for n, path, t in maps]

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefix(OPTForCausalLM.hf_param_mappings(self))

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefix(
            OPTForCausalLM.hf_global_mappings(self))

    def hf_aux_mappings(self) -> List:
        return self._blip2_tower_aux()


class Blip2T5ForConditionalGeneration(_Blip2Tower,
                                      T5ForConditionalGeneration):
    """Flan-T5-decoder BLIP-2: the query features splice into the T5
    ENCODER stream (reference blip2.py T5 path); rides the enc-dec
    runner's encoder-side multimodal splice."""

    def __init__(self, model_config, parallel_config=None) -> None:
        T5ForConditionalGeneration.__init__(self, model_config,
                                            parallel_config)
        self._init_blip2_tower(model_config.hf_config)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = T5ForConditionalGeneration.param_shapes(self)
        shapes.update(self._blip2_tower_shapes())
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        return self._blip2_tower_shardings(
            T5ForConditionalGeneration.param_shardings(self))

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return [("language_model." + n, p, t) for n, p, t in
                T5ForConditionalGeneration.hf_param_mappings(self)]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [("language_model." + n, p, t) for n, p, t in
                T5ForConditionalGeneration.hf_global_mappings(self)]

    def hf_aux_mappings(self) -> List:
        out = list(self._blip2_tower_aux())
        # T5's encoder stack maps via aux; prefix with language_model.
        for t, p, tr, cnt in T5ForConditionalGeneration.hf_aux_mappings(
                self):
            out.append(("language_model." + t, p, tr, cnt))
        return out
