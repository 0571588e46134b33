"""Shared CLIP ViT vision tower (fp32, jnp).

Used by LLaVA (models/llava.py) and Phi-3-Vision (models/phi3v.py).
Reference: aphrodite/modeling/models/clip.py (CLIPVisionModel). The
params dict layout is the one llava established: cls, patch_w (conv
kernel pre-reshaped to [3*p*p, vH]), pos, pre_ln(_b), layers{ln1(_b),
wq/bq, wk/bk, wv/bv, wo/bo, ln2(_b), fc1(_b), fc2(_b)}.
"""

import jax
import jax.numpy as jnp


def layernorm_fp32(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def clip_tower(v, pixel_values, *, patch, image_size, hidden, heads,
               eps):
    """pixel_values [B, 3, S, S] -> hidden states [B, 1+n_patch, vH]
    (CLS first; caller selects/drops). Runs ALL layers present in
    v["layers"] — truncate the stack at load for feature_layer < -1."""
    p, vH = patch, hidden
    nh = image_size // p
    B = pixel_values.shape[0]
    x = pixel_values.astype(jnp.float32)
    # Non-overlapping patch conv as reshape+matmul (kernel flattened in
    # (c, ph, pw) order to match the HF conv weight layout).
    x = x.reshape(B, 3, nh, p, nh, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, nh * nh, 3 * p * p)
    x = x @ v["patch_w"].astype(jnp.float32)
    cls = jnp.broadcast_to(v["cls"].astype(jnp.float32), (B, 1, vH))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos"].astype(jnp.float32)[None]
    x = layernorm_fp32(x, v["pre_ln"], v["pre_ln_b"], eps)

    dh = vH // heads
    scale = dh ** -0.5

    def layer(x, lp):
        h = layernorm_fp32(x, lp["ln1"], lp["ln1_b"], eps)
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
        h = layernorm_fp32(x, lp["ln2"], lp["ln2_b"], eps)
        h = h @ lp["fc1"] + lp["fc1_b"]
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        x = x + (h @ lp["fc2"] + lp["fc2_b"])
        return x, None

    vl = jax.tree.map(lambda a: a.astype(jnp.float32), v["layers"])
    x, _ = jax.lax.scan(layer, x, vl)
    return x
