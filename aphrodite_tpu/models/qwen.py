"""Qwen v1 (Qwen-7B/14B, QWenLMHeadModel): Llama math with fused biased
c_attn, w1/w2 swapped gate naming, and intermediate_size declared at 2x.

Reference: aphrodite/modeling/models/qwen.py (QWenMLP uses
config.intermediate_size // 2; gate_up packs [w2; w1], qwen.py:960-961).
"""

from typing import List, Tuple

from aphrodite_tpu.models.llama import LlamaForCausalLM


class QWenLMHeadModel(LlamaForCausalLM):
    attention_bias = True  # fused c_attn carries bias

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_epsilon", 1e-6))
        hf.setdefault("rope_theta", hf.get("rotary_emb_base", 10000.0))
        hf.setdefault("max_position_embeddings",
                      hf.get("seq_length", 2048))
        if not hf.get("_qwen_ffn_halved"):
            # QWen configs declare intermediate_size at 2x the actual FFN
            # width (the checkpoint's w1/w2 are each half).
            hf["intermediate_size"] = int(hf["intermediate_size"]) // 2
            hf["_qwen_ffn_halved"] = True
        super().__init__(model_config, parallel_config)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        h = "transformer.h.{i}."
        return [
            (h + "ln_1.weight", "layers.input_norm", False),
            (h + "attn.c_proj.weight", "layers.wo", True),
            (h + "ln_2.weight", "layers.post_norm", False),
            # w2 is the gate, w1 the up projection (reference mapping).
            (h + "mlp.w2.weight", "layers.gate", True),
            (h + "mlp.w1.weight", "layers.up", True),
            (h + "mlp.c_proj.weight", "layers.down", True),
        ]

    def hf_split_mappings(self):
        H = self.hidden_size
        return [
            ("transformer.h.{i}.attn.c_attn.weight",
             [("layers.wq", 0, H), ("layers.wk", H, 2 * H),
              ("layers.wv", 2 * H, 3 * H)], True),
            ("transformer.h.{i}.attn.c_attn.bias",
             [("layers.bq", 0, H), ("layers.bk", H, 2 * H),
              ("layers.bv", 2 * H, 3 * H)], False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("transformer.wte.weight", "embed", False),
            ("transformer.ln_f.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps


class QWenVL(QWenLMHeadModel):
    """Qwen-VL: the QWen text stack + OpenCLIP-style visual transformer
    with a 256-query attention pool (reference qwen.py:92-392 +
    layers/resampler.py Resampler2).

    TPU design: one jitted program per image (fixed 448x448 -> 1024
    patches): conv patch embed, interpolated absolute positions
    (host-side exact torch-bicubic, done once at load), pre-LN
    resblocks, then the pooler whose 2D sincos table rides the
    checkpoint (attn_pool.pos_embed) and is added to BOTH queries and
    keys. Each image contributes 256 features at the <imgpad>
    placeholder (id image_start_id + 2)."""

    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        v = dict(model_config.hf_config["visual"])
        self.v_width = int(v.get("width", 1664))
        self.v_layers = int(v.get("layers", 48))
        self.v_heads = int(v.get("heads", 16))
        self.v_mlp = int(self.v_width * float(v.get("mlp_ratio", 4.0)))
        self.v_patch = int(v.get("patch_size", 14))
        self.v_image_size = int(v.get("image_size", 448))
        self.v_out = int(v.get("output_dim", self.hidden_size))
        self.n_queries = int(v.get("n_queries", 256))
        self.num_image_tokens = self.n_queries
        self.r_heads = max(1, self.v_out // 128)
        start = int(v.get("image_start_id", 151857))
        self.image_token_index = start + 2  # <imgpad>
        self._vision_jit = None

    def param_shapes(self):
        shapes = super().param_shapes()
        import numpy as _np  # noqa: F401
        W, Lv, I, O = (self.v_width, self.v_layers, self.v_mlp,
                       self.v_out)
        p = self.v_patch
        grid = self.v_image_size // p
        shapes["vision"] = {
            "patch_w": (3 * p * p, W),
            "pos": (grid * grid, W),  # interpolated at load
            "ln_pre": (W,), "ln_pre_b": (W,),
            "layers": {
                "ln1": (Lv, W), "ln1_b": (Lv, W),
                "in_w": (Lv, W, 3 * W), "in_b": (Lv, 3 * W),
                "out_w": (Lv, W, W), "out_b": (Lv, W),
                "ln2": (Lv, W), "ln2_b": (Lv, W),
                "fc1": (Lv, W, I), "fc1_b": (Lv, I),
                "fc2": (Lv, I, W), "fc2_b": (Lv, W),
            },
            "pool": {
                "query": (self.n_queries, O),
                "pos": (self.n_queries, O),
                "kv_w": (W, O),
                "ln_q": (O,), "ln_q_b": (O,),
                "ln_kv": (O,), "ln_kv_b": (O,),
                "in_w": (O, 3 * O), "in_b": (3 * O,),
                "out_w": (O, O), "out_b": (O,),
            },
            "ln_post": (O,), "ln_post_b": (O,),
            "proj": (O, O),
        }
        return shapes

    def param_shardings(self):
        from jax.sharding import PartitionSpec as P

        specs = super().param_shardings()

        def rep(node):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in node.items()}

        specs["vision"] = rep(self.param_shapes()["vision"])
        return specs

    def hf_aux_mappings(self):
        lay = "transformer.visual.transformer.resblocks.{i}."
        pairs = [
            (lay + "ln_1.weight", "vision.layers.ln1", False),
            (lay + "ln_1.bias", "vision.layers.ln1_b", False),
            (lay + "attn.in_proj.weight", "vision.layers.in_w", True),
            (lay + "attn.in_proj.bias", "vision.layers.in_b", False),
            (lay + "attn.out_proj.weight", "vision.layers.out_w", True),
            (lay + "attn.out_proj.bias", "vision.layers.out_b", False),
            (lay + "ln_2.weight", "vision.layers.ln2", False),
            (lay + "ln_2.bias", "vision.layers.ln2_b", False),
            (lay + "mlp.c_fc.weight", "vision.layers.fc1", True),
            (lay + "mlp.c_fc.bias", "vision.layers.fc1_b", False),
            (lay + "mlp.c_proj.weight", "vision.layers.fc2", True),
            (lay + "mlp.c_proj.bias", "vision.layers.fc2_b", False),
        ]
        out = [(t, p, tr, self.v_layers) for t, p, tr in pairs]
        vt = "transformer.visual."
        for name, path, tr in [
            (vt + "conv1.weight", "vision.patch_w", False),
            (vt + "positional_embedding", "vision.pos", False),
            (vt + "ln_pre.weight", "vision.ln_pre", False),
            (vt + "ln_pre.bias", "vision.ln_pre_b", False),
            (vt + "attn_pool.query", "vision.pool.query", False),
            (vt + "attn_pool.pos_embed", "vision.pool.pos", False),
            (vt + "attn_pool.kv_proj.weight", "vision.pool.kv_w", True),
            (vt + "attn_pool.ln_q.weight", "vision.pool.ln_q", False),
            (vt + "attn_pool.ln_q.bias", "vision.pool.ln_q_b", False),
            (vt + "attn_pool.ln_kv.weight", "vision.pool.ln_kv", False),
            (vt + "attn_pool.ln_kv.bias", "vision.pool.ln_kv_b", False),
            (vt + "attn_pool.attn.in_proj_weight", "vision.pool.in_w",
             True),
            (vt + "attn_pool.attn.in_proj_bias", "vision.pool.in_b",
             False),
            (vt + "attn_pool.attn.out_proj.weight", "vision.pool.out_w",
             True),
            (vt + "attn_pool.attn.out_proj.bias", "vision.pool.out_b",
             False),
            (vt + "ln_post.weight", "vision.ln_post", False),
            (vt + "ln_post.bias", "vision.ln_post_b", False),
            (vt + "proj", "vision.proj", False),
        ]:
            out.append((name, path, tr, 1))
        return out

    def finalize_params(self, params):
        import numpy as np

        v = params["vision"]
        if v["patch_w"].ndim == 4:  # conv kernel [W, 3, p, p]
            v["patch_w"] = np.ascontiguousarray(
                v["patch_w"].reshape(v["patch_w"].shape[0], -1).T)
        grid = self.v_image_size // self.v_patch
        if v["pos"].shape[0] != grid * grid:
            # Interpolate the absolute position table to the patch grid
            # with torch's exact bicubic (reference get_abs_pos,
            # resampler.py:48-72) — one-time host work.
            import torch

            src = int(np.sqrt(v["pos"].shape[0]))
            t = torch.tensor(np.asarray(v["pos"], np.float32)).reshape(
                1, src, src, -1).permute(0, 3, 1, 2)
            t = torch.nn.functional.interpolate(
                t, size=(grid, grid), mode="bicubic",
                align_corners=False)
            v["pos"] = np.ascontiguousarray(
                t.permute(0, 2, 3, 1).reshape(grid * grid, -1).numpy())
        # VisualAttention packs in_proj per-head interleaved
        # ([q_h|k_h|v_h] blocks, qwen.py:139-146); de-interleave to
        # plain [Q|K|V] columns.
        W, Hh = self.v_width, self.v_heads
        D = W // Hh
        iw = v["layers"]["in_w"]  # [Lv, W, 3W] (already transposed)
        iw = iw.reshape(iw.shape[0], W, Hh, 3, D)
        v["layers"]["in_w"] = np.ascontiguousarray(
            iw.transpose(0, 1, 3, 2, 4).reshape(-1, W, 3 * W))
        ib = v["layers"]["in_b"].reshape(-1, Hh, 3, D)
        v["layers"]["in_b"] = np.ascontiguousarray(
            ib.transpose(0, 2, 1, 3).reshape(-1, 3 * W))

    def _vision_forward(self, params, patches, key_pos):
        import math as _math

        import jax
        import jax.numpy as jnp

        f32 = jnp.float32
        vp = params["vision"]
        W, heads = self.v_width, self.v_heads
        D = W // heads
        x = patches.astype(f32) @ vp["patch_w"].astype(f32)
        x = x + vp["pos"].astype(f32)

        def _ln(t, w, b):
            mu = jnp.mean(t, axis=-1, keepdims=True)
            var = jnp.var(t, axis=-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-6) * w + b

        x = _ln(x, vp["ln_pre"].astype(f32), vp["ln_pre_b"].astype(f32))
        N = x.shape[0]

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _ln(x, lp["ln1"], lp["ln1_b"])
            qkv = h @ lp["in_w"] + lp["in_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = (q / _math.sqrt(D)).reshape(N, heads, D)
            k = k.reshape(N, heads, D)
            v = v.reshape(N, heads, D)
            attn = jax.nn.softmax(
                jnp.einsum("qhd,khd->hqk", q, k), axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(N, W)
            x = x + o @ lp["out_w"] + lp["out_b"]
            h = _ln(x, lp["ln2"], lp["ln2_b"])
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            return x + h @ lp["fc2"] + lp["fc2_b"], None

        x, _ = jax.lax.scan(block, x, vp["layers"])

        # Attention pool: 2D sincos on queries AND keys (Resampler2).
        pp = jax.tree.map(lambda a: a.astype(f32), vp["pool"])
        O = self.v_out
        rh = self.r_heads
        rd = O // rh
        kv = _ln(x @ pp["kv_w"], pp["ln_kv"], pp["ln_kv_b"])
        q_in = _ln(pp["query"], pp["ln_q"], pp["ln_q_b"]) + pp["pos"]
        wq, wk, wv = jnp.split(pp["in_w"], 3, axis=1)
        bq, bk, bv = jnp.split(pp["in_b"], 3)
        q = ((q_in @ wq + bq) / _math.sqrt(rd)).reshape(-1, rh, rd)
        k = ((kv + key_pos.astype(f32)) @ wk + bk).reshape(N, rh, rd)
        v = (kv @ wv + bv).reshape(N, rh, rd)
        attn = jax.nn.softmax(jnp.einsum("qhd,khd->hqk", q, k), axis=-1)
        o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(-1, O)
        o = o @ pp["out_w"] + pp["out_b"]
        o = _ln(o, vp["ln_post"].astype(f32), vp["ln_post_b"].astype(f32))
        return o @ vp["proj"].astype(f32)

    def encode_image_item(self, params, item, fn=None):
        import jax
        import jax.numpy as jnp
        import numpy as np

        px = np.asarray(item, np.float32)
        S, p = self.v_image_size, self.v_patch
        if px.shape != (3, S, S):
            raise ValueError(
                f"Qwen-VL images must be pixel_values [3, {S}, {S}]; "
                f"got {px.shape}")
        g = S // p
        patches = px.reshape(3, g, p, g, p).transpose(
            1, 3, 0, 2, 4).reshape(g * g, 3 * p * p)
        if not hasattr(self, "_key_pos_np"):
            # Interpolate the pool's sincos table to the patch grid
            # (torch-exact bicubic, once).
            import torch

            pos = np.asarray(params["vision"]["pool"]["pos"], np.float32)
            src = int(np.sqrt(pos.shape[0]))
            if src == g:
                self._key_pos_np = pos
            else:
                t = torch.tensor(pos).reshape(1, src, src, -1).permute(
                    0, 3, 1, 2)
                t = torch.nn.functional.interpolate(
                    t, size=(g, g), mode="bicubic", align_corners=False)
                self._key_pos_np = t.permute(0, 2, 3, 1).reshape(
                    g * g, -1).numpy()
        if self._vision_jit is None:
            self._vision_jit = jax.jit(self._vision_forward)
        out = self._vision_jit(params, jnp.asarray(patches),
                               jnp.asarray(self._key_pos_np))
        return np.asarray(out).astype(np.float32)
