"""InternVL (HF-format InternVLForConditionalGeneration): InternViT
tower + pixel-shuffle 2x2 downsample + LN-MLP projector onto a
Qwen2/Llama text stack.

Reference: aphrodite/modeling/models/internvl.py + intern_vit.py. TPU
design follows the other towers: encode runs ONCE per image at
request-add as one jitted program per tile-batch shape; dynamic
high-resolution inputs arrive as a stack of fixed-size tiles (the HF
processor's dynamic_preprocess), each contributing
(size/patch/2)^2 tokens in tile order. InternViT specifics: CLS token +
absolute position embeddings, layer-scale (lambda_1/lambda_2)
residuals, optional full-width qk-norm, layer_norm or rms_norm blocks.

Remote-code InternVLChatModel checkpoints (the OpenGVLab layout the
reference serves, internvl.py:340-527 + intern_vit.py) load through the
same class: llm_config hoists as the text config, the vision knobs read
both spellings (qkv_bias/qk_normalization/select_layer vs
attention_bias/use_qk_norm/vision_feature_layer), the fused attn.qkv
splits at load, mlp1.{0,1,3} map onto the projector, ps_version "v1"
skips the second pixel-shuffle transpose, and the <IMG_CONTEXT>
placeholder id resolves from the tokenizer at engine setup (the remote
config carries no image_token_id; reference internvl.py:282).
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


class InternVLForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        # Qwen2 text stacks carry attention bias but their config omits
        # the knob; the composite keeps the text model_type post-hoist.
        if str(hf.get("model_type")) == "qwen2":
            hf.setdefault("attention_bias", True)
        super().__init__(model_config, parallel_config)
        v = dict(hf["vision_config"])
        self.v_hidden = int(v.get("hidden_size", 1024))
        self.v_layers = int(v.get("num_hidden_layers", 24))
        self.v_heads = int(v.get("num_attention_heads", 16))
        self.v_intermediate = int(v.get("intermediate_size", 4096))
        img = v.get("image_size", 448)
        self.v_image_size = int(img[0] if isinstance(img, (list, tuple))
                                else img)
        pch = v.get("patch_size", 14)
        self.v_patch = int(pch[0] if isinstance(pch, (list, tuple))
                           else pch)
        self.v_eps = float(v.get("layer_norm_eps", 1e-6))
        self.v_rms = str(v.get("norm_type", "layer_norm")) == "rms_norm"
        self.v_qk_norm = bool(v.get("use_qk_norm",
                                    v.get("qk_normalization", False)))
        self.v_attn_bias = bool(v.get("attention_bias",
                                      v.get("qkv_bias", False)))
        self.downsample = float(hf.get("downsample_ratio", 0.5))
        self.feature_layer = int(hf.get("vision_feature_layer",
                                        hf.get("select_layer", -1)))
        self.feature_strategy = str(
            hf.get("vision_feature_select_strategy", "default"))
        self.v_used_layers = self.feature_layer % (self.v_layers + 1) \
            if self.feature_layer != -1 else self.v_layers
        self.ps_version = str(hf.get("ps_version", "v2"))
        if "image_token_id" in hf:
            self.image_token_index = int(hf["image_token_id"])
        else:
            # Remote-code checkpoints: resolve <IMG_CONTEXT> from the
            # tokenizer at engine setup (reference internvl.py:282).
            self.image_token_index = 151667
            self.image_token_str = "<IMG_CONTEXT>"
        self.projector_act = str(hf.get("projector_hidden_act", "gelu"))
        self._vision_jit = None
        grid = self.v_image_size // self.v_patch
        self.tokens_per_tile = int((grid * self.downsample) ** 2)
        self.num_image_tokens = self.tokens_per_tile  # single tile

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        E, Lv, I = self.v_hidden, self.v_used_layers, self.v_intermediate
        p = self.v_patch
        n_pos = (self.v_image_size // p) ** 2 + 1
        layers = {
            "ln1": (Lv, E),
            "lambda1": (Lv, E), "lambda2": (Lv, E),
            "wq": (Lv, E, E), "wk": (Lv, E, E), "wv": (Lv, E, E),
            "wo": (Lv, E, E), "bo": (Lv, E),
            "ln2": (Lv, E),
            "fc1": (Lv, E, I), "fc1_b": (Lv, I),
            "fc2": (Lv, I, E), "fc2_b": (Lv, E),
        }
        if not self.v_rms:
            layers["ln1_b"] = (Lv, E)
            layers["ln2_b"] = (Lv, E)
        if self.v_attn_bias:
            layers["bq"] = (Lv, E)
            layers["bk"] = (Lv, E)
            layers["bv"] = (Lv, E)
        if self.v_qk_norm:
            layers["q_norm"] = (Lv, E)
            layers["k_norm"] = (Lv, E)
            if not self.v_rms:
                layers["q_norm_b"] = (Lv, E)
                layers["k_norm_b"] = (Lv, E)
        shapes["vision"] = {
            "cls": (E,), "pos": (n_pos, E),
            "patch_w": (3 * p * p, E), "patch_b": (E,),
            "layers": layers,
        }
        ds2 = int(1 / self.downsample) ** 2
        tH = self.hidden_size
        shapes["projector"] = {
            "ln": (E * ds2,), "ln_b": (E * ds2,),
            "w1": (E * ds2, tH), "b1": (tH,),
            "w2": (tH, tH), "b2": (tH,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()

        def rep(node):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in node.items()}

        mine = self.param_shapes()
        specs["vision"] = rep(mine["vision"])
        specs["projector"] = rep(mine["projector"])
        return specs

    def _both_lm(self, maps):
        out = []
        for hf_name, our_path, transpose in maps:
            # Old layout: language_model.model.* / language_model.
            # lm_head.*; new layout: model.language_model.* / lm_head.*.
            out.append(("language_model." + hf_name, our_path,
                        transpose))
            if hf_name.startswith("model."):
                out.append((hf_name.replace(
                    "model.", "model.language_model.", 1), our_path,
                    transpose))
            else:
                out.append((hf_name, our_path, transpose))
        return out

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._both_lm(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._both_lm(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List:
        lay = "vision_tower.encoder.layer.{i}."
        pairs = [
            (lay + "layernorm_before.weight", "vision.layers.ln1", False),
            (lay + "lambda_1", "vision.layers.lambda1", False),
            (lay + "lambda_2", "vision.layers.lambda2", False),
            (lay + "attention.q_proj.weight", "vision.layers.wq", True),
            (lay + "attention.k_proj.weight", "vision.layers.wk", True),
            (lay + "attention.v_proj.weight", "vision.layers.wv", True),
            (lay + "attention.projection_layer.weight",
             "vision.layers.wo", True),
            (lay + "attention.projection_layer.bias",
             "vision.layers.bo", False),
            (lay + "layernorm_after.weight", "vision.layers.ln2", False),
            (lay + "mlp.fc1.weight", "vision.layers.fc1", True),
            (lay + "mlp.fc1.bias", "vision.layers.fc1_b", False),
            (lay + "mlp.fc2.weight", "vision.layers.fc2", True),
            (lay + "mlp.fc2.bias", "vision.layers.fc2_b", False),
        ]
        if not self.v_rms:
            pairs += [
                (lay + "layernorm_before.bias", "vision.layers.ln1_b",
                 False),
                (lay + "layernorm_after.bias", "vision.layers.ln2_b",
                 False),
            ]
        if self.v_attn_bias:
            pairs += [
                (lay + "attention.q_proj.bias", "vision.layers.bq",
                 False),
                (lay + "attention.k_proj.bias", "vision.layers.bk",
                 False),
                (lay + "attention.v_proj.bias", "vision.layers.bv",
                 False),
            ]
        if self.v_qk_norm:
            pairs += [
                (lay + "attention.q_norm.weight", "vision.layers.q_norm",
                 False),
                (lay + "attention.k_norm.weight", "vision.layers.k_norm",
                 False),
            ]
            if not self.v_rms:
                pairs += [
                    (lay + "attention.q_norm.bias",
                     "vision.layers.q_norm_b", False),
                    (lay + "attention.k_norm.bias",
                     "vision.layers.k_norm_b", False),
                ]
        out = []
        for template, path, transpose in pairs:
            out.append((template, path, transpose, self.v_used_layers))
            out.append(("model." + template, path, transpose,
                        self.v_used_layers))
        globals_ = [
            ("vision_tower.embeddings.cls_token", "vision.cls", False),
            ("vision_tower.embeddings.position_embeddings", "vision.pos",
             False),
            ("vision_tower.embeddings.patch_embeddings.projection.weight",
             "vision.patch_w", False),
            ("vision_tower.embeddings.patch_embeddings.projection.bias",
             "vision.patch_b", False),
            ("multi_modal_projector.layer_norm.weight", "projector.ln",
             False),
            ("multi_modal_projector.layer_norm.bias", "projector.ln_b",
             False),
            ("multi_modal_projector.linear_1.weight", "projector.w1",
             True),
            ("multi_modal_projector.linear_1.bias", "projector.b1",
             False),
            ("multi_modal_projector.linear_2.weight", "projector.w2",
             True),
            ("multi_modal_projector.linear_2.bias", "projector.b2",
             False),
        ]
        for hf_name, path, transpose in globals_:
            out.append((hf_name, path, transpose, 1))
            out.append(("model." + hf_name, path, transpose, 1))
        return out + self._remote_aux_mappings()

    def _remote_aux_mappings(self) -> List:
        """OpenGVLab InternVLChatModel serialization (reference
        intern_vit.py module names + internvl.py:367-373 mlp1)."""
        E = self.v_hidden
        lay = "vision_model.encoder.layers.{i}."
        Lv = self.v_used_layers
        pairs = [
            (lay + "norm1.weight", "vision.layers.ln1", False),
            (lay + "ls1", "vision.layers.lambda1", False),
            (lay + "ls2", "vision.layers.lambda2", False),
            (lay + "attn.proj.weight", "vision.layers.wo", True),
            (lay + "attn.proj.bias", "vision.layers.bo", False),
            (lay + "norm2.weight", "vision.layers.ln2", False),
            (lay + "mlp.fc1.weight", "vision.layers.fc1", True),
            (lay + "mlp.fc1.bias", "vision.layers.fc1_b", False),
            (lay + "mlp.fc2.weight", "vision.layers.fc2", True),
            (lay + "mlp.fc2.bias", "vision.layers.fc2_b", False),
        ]
        if not self.v_rms:
            pairs += [
                (lay + "norm1.bias", "vision.layers.ln1_b", False),
                (lay + "norm2.bias", "vision.layers.ln2_b", False),
            ]
        if self.v_qk_norm:
            pairs += [
                (lay + "attn.q_norm.weight", "vision.layers.q_norm",
                 False),
                (lay + "attn.k_norm.weight", "vision.layers.k_norm",
                 False),
            ]
            if not self.v_rms:
                pairs += [
                    (lay + "attn.q_norm.bias", "vision.layers.q_norm_b",
                     False),
                    (lay + "attn.k_norm.bias", "vision.layers.k_norm_b",
                     False),
                ]
        out = [(t, p, tr, Lv) for t, p, tr in pairs]
        qkv_slices = [("vision.layers.wq", 0, E),
                      ("vision.layers.wk", E, 2 * E),
                      ("vision.layers.wv", 2 * E, 3 * E)]
        out.append((lay + "attn.qkv.weight", qkv_slices, True, Lv))
        if self.v_attn_bias:
            out.append((lay + "attn.qkv.bias",
                        [("vision.layers.bq", 0, E),
                         ("vision.layers.bk", E, 2 * E),
                         ("vision.layers.bv", 2 * E, 3 * E)], False, Lv))
        for name, path, tr in [
            ("vision_model.embeddings.class_embedding", "vision.cls",
             False),
            ("vision_model.embeddings.position_embedding", "vision.pos",
             False),
            ("vision_model.embeddings.patch_embedding.weight",
             "vision.patch_w", False),
            ("vision_model.embeddings.patch_embedding.bias",
             "vision.patch_b", False),
            ("mlp1.0.weight", "projector.ln", False),
            ("mlp1.0.bias", "projector.ln_b", False),
            ("mlp1.1.weight", "projector.w1", True),
            ("mlp1.1.bias", "projector.b1", False),
            ("mlp1.3.weight", "projector.w2", True),
            ("mlp1.3.bias", "projector.b2", False),
        ]:
            out.append((name, path, tr, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        v = params["vision"]
        if v["patch_w"].ndim == 4:
            v["patch_w"] = np.ascontiguousarray(
                v["patch_w"].reshape(v["patch_w"].shape[0], -1).T)
        if v["cls"].ndim == 3:
            v["cls"] = v["cls"].reshape(-1)
        if v["pos"].ndim == 3:
            v["pos"] = v["pos"][0]

    # ---- vision tower ---------------------------------------------------

    def _norm_v(self, x, w, b):
        if self.v_rms:
            return _rms(x, w, self.v_eps)
        return _ln(x, w, b, self.v_eps)

    def _vision_forward(self, params, tiles):
        """[B, n_patches, 3*p*p] tile patches -> [B, tokens_per_tile,
        text_H] projected features (fp32, HF-exact)."""
        f32 = jnp.float32
        vp = params["vision"]
        E, heads = self.v_hidden, self.v_heads
        D = E // heads
        x = tiles.astype(f32) @ vp["patch_w"].astype(f32) + \
            vp["patch_b"].astype(f32)
        B, N = x.shape[0], x.shape[1] + 1
        cls = jnp.broadcast_to(vp["cls"].astype(f32)[None, None, :],
                               (B, 1, E))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vp["pos"].astype(f32)[None, :N]
        scale = 1.0 / math.sqrt(D)

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = self._norm_v(x, lp["ln1"], lp.get("ln1_b"))
            q = h @ lp["wq"] + lp.get("bq", 0.0)
            k = h @ lp["wk"] + lp.get("bk", 0.0)
            v = h @ lp["wv"] + lp.get("bv", 0.0)
            if self.v_qk_norm:
                q = self._norm_v(q, lp["q_norm"], lp.get("q_norm_b"))
                k = self._norm_v(k, lp["k_norm"], lp.get("k_norm_b"))
            q = q.reshape(B, N, heads, D)
            k = k.reshape(B, N, heads, D)
            v = v.reshape(B, N, heads, D)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, E)
            o = o @ lp["wo"] + lp["bo"]
            x = x + o * lp["lambda1"]
            h = self._norm_v(x, lp["ln2"], lp.get("ln2_b"))
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            h = h @ lp["fc2"] + lp["fc2_b"]
            return x + h * lp["lambda2"], None

        x, _ = jax.lax.scan(block, x, vp["layers"])
        if self.feature_strategy == "default":
            x = x[:, 1:]
        # Pixel shuffle 2x2 channel fold (reference InternVLModel.
        # pixel_shuffle): [B, g, g, E] -> [B, g/2, g/2, 4E].
        g = int(math.isqrt(x.shape[1]))
        sf = self.downsample
        x = x.reshape(B, g, g, -1)
        x = x.reshape(B, g, int(g * sf), int(x.shape[-1] / sf))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(B, int(g * sf), int(g * sf),
                      int(E / (sf * sf)))
        if self.ps_version != "v1":  # v1 checkpoints skip the
            x = jnp.transpose(x, (0, 2, 1, 3))  # W/H swap-back
        x = x.reshape(B, -1, x.shape[-1])
        pj = params["projector"]
        x = _ln(x, pj["ln"].astype(f32), pj["ln_b"].astype(f32), 1e-5)
        x = x @ pj["w1"].astype(f32) + pj["b1"].astype(f32)
        x = jax.nn.gelu(x, approximate=False)
        return x @ pj["w2"].astype(f32) + pj["b2"].astype(f32)

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        px = np.asarray(item, np.float32)
        if px.ndim == 3:
            px = px[None]  # single tile
        S, p = self.v_image_size, self.v_patch
        if px.ndim != 4 or px.shape[1:] != (3, S, S):
            raise ValueError(
                "InternVL images must be pixel_values [n_tiles, 3, "
                f"{S}, {S}] (dynamic-resolution tiles); got {px.shape}")
        g = S // p
        B = px.shape[0]
        patches = px.reshape(B, 3, g, p, g, p).transpose(
            0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * p * p)
        if self._vision_jit is None:
            self._vision_jit = jax.jit(self._vision_forward)
        out = np.asarray(self._vision_jit(params, jnp.asarray(patches)))
        return out.reshape(-1, out.shape[-1]).astype(np.float32)
