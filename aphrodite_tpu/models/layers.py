"""Functional model layers.

The reference implements these as CUDA custom ops (RMSNorm fused residual:
kernels/layernorm_kernels.cu; SiLU-and-mul: kernels/activation_kernels.cu;
RoPE: kernels/pos_encoding_kernels.cu). On TPU they are written as plain
jnp — XLA fuses the elementwise chains into the surrounding matmuls
(SURVEY.md §2 checklist item 4: "custom Pallas only if profiled hot").

The RoPE zoo mirrors aphrodite/modeling/layers/rotary_embedding.py:205-726
(base / linear / dynamic-NTK / YaRN / Llama-3).
"""

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6,
             residual: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """RMSNorm with optional fused residual-add (reference
    layers/layernorm.py semantics: residual is updated in place)."""
    if residual is not None:
        x = x + residual
        residual = x
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = (normed * weight.astype(jnp.float32)).astype(x.dtype)
    return out, residual


def layer_norm(x: jax.Array, weight: jax.Array,
               bias: Optional[jax.Array] = None,
               eps: float = 1e-5) -> jax.Array:
    """Standard LayerNorm (mean-centered; starcoder2/opt-family)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean)**2, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def silu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


def gelu_and_mul(gate: jax.Array, up: jax.Array,
                 approximate: str = "tanh") -> jax.Array:
    return jax.nn.gelu(gate.astype(jnp.float32),
                       approximate=(approximate == "tanh")).astype(
                           gate.dtype) * up


# ---------------------------------------------------------------------------
# RoPE zoo
# ---------------------------------------------------------------------------


def _yarn_find_correction_dim(num_rotations: float, dim: int, base: float,
                              max_pos: int) -> float:
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (
        2 * math.log(base))


def _yarn_find_correction_range(low_rot: float, high_rot: float, dim: int,
                                base: float, max_pos: int
                                ) -> Tuple[int, int]:
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp(low: float, high: float, dim: int) -> np.ndarray:
    if low == high:
        high += 0.001
    ramp = (np.arange(dim, dtype=np.float32) - low) / (high - low)
    return np.clip(ramp, 0, 1)


def compute_rope_tables(
    head_dim: int,
    max_position: int,
    base: float = 10000.0,
    rope_scaling: Optional[Dict[str, Any]] = None,
    rotary_percent: float = 1.0,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape [max_position, rotary_dim//2].

    Handles the reference's scaling zoo (rotary_embedding.py):
      - none / "default"
      - "linear" (position interpolation)
      - "dynamic" (NTK-aware, computed at the static max length)
      - "yarn" / "deepseek_yarn"
      - "llama3" (frequency-band rescaling)
    """
    rotary_dim = int(head_dim * rotary_percent)
    inv_freq = 1.0 / (base**(
        np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim))
    positions = np.arange(max_position, dtype=np.float64)
    attn_factor = 1.0

    if rope_scaling:
        rope_type = rope_scaling.get("rope_type",
                                     rope_scaling.get("type", "default"))
        factor = float(rope_scaling.get("factor", 1.0))
        if rope_type in ("default", "mrope", None):
            # "mrope" (Qwen2-VL) uses the plain table; the multimodal
            # sections only select which T/H/W position indexes each
            # frequency band (models/llama.py mrope path).
            pass
        elif rope_type == "linear":
            positions = positions / factor
        elif rope_type == "dynamic":
            # NTK-aware: adjust the base for the static max length
            # (reference DynamicNTKScalingRotaryEmbedding:291, evaluated at
            # max_model_len since XLA shapes are static).
            orig_max = int(
                rope_scaling.get("original_max_position_embeddings",
                                 max_position / factor))
            scale = max_position / orig_max
            if scale > 1.0:
                adjusted_base = base * (
                    (factor * scale - (factor - 1)))**(rotary_dim /
                                                       (rotary_dim - 2))
                inv_freq = 1.0 / (adjusted_base**(
                    np.arange(0, rotary_dim, 2, dtype=np.float64) /
                    rotary_dim))
        elif rope_type in ("yarn", "deepseek_yarn"):
            orig_max = int(
                rope_scaling.get("original_max_position_embeddings", 4096))
            beta_fast = float(rope_scaling.get("beta_fast", 32))
            beta_slow = float(rope_scaling.get("beta_slow", 1))
            extrap = inv_freq
            interp = inv_freq / factor
            low, high = _yarn_find_correction_range(beta_slow, beta_fast,
                                                    rotary_dim, base,
                                                    orig_max)
            mask = 1.0 - _yarn_linear_ramp(low, high, rotary_dim // 2)
            inv_freq = interp * (1 - mask) + extrap * mask
            # YaRN attention temperature (mscale).
            mscale = float(rope_scaling.get("mscale", 1.0))
            if rope_type == "yarn":
                attn_factor = 0.1 * math.log(factor) + 1.0 if factor > 1 \
                    else 1.0
            else:
                mscale_all_dim = float(
                    rope_scaling.get("mscale_all_dim", 0.0))

                def yarn_get_mscale(scale, m):
                    if scale <= 1:
                        return 1.0
                    return 0.1 * m * math.log(scale) + 1.0

                attn_factor = (yarn_get_mscale(factor, mscale) /
                               yarn_get_mscale(factor, mscale_all_dim))
        elif rope_type in ("longrope", "su"):
            # Phi-3 LongRoPE (reference Phi3LongRoPEScaledRotaryEmbedding,
            # rotary_embedding.py:433): per-dim frequency factors, chosen
            # by whether we serve beyond the original training length.
            orig_max = int(
                rope_scaling.get("original_max_position_embeddings",
                                 max_position))
            factors = (rope_scaling.get("long_factor")
                       if max_position > orig_max else
                       rope_scaling.get("short_factor"))
            if factors:
                inv_freq = inv_freq / np.asarray(factors, dtype=np.float64)
            scale = max_position / orig_max
            if scale > 1.0:
                attn_factor = math.sqrt(
                    1.0 + math.log(scale) / math.log(orig_max))
        elif rope_type == "llama3":
            low_freq_factor = float(rope_scaling.get("low_freq_factor", 1.0))
            high_freq_factor = float(
                rope_scaling.get("high_freq_factor", 4.0))
            orig_max = int(
                rope_scaling.get("original_max_position_embeddings", 8192))
            low_freq_wavelen = orig_max / low_freq_factor
            high_freq_wavelen = orig_max / high_freq_factor
            wavelen = 2 * math.pi / inv_freq
            new_freq = np.where(
                wavelen < high_freq_wavelen,
                inv_freq,
                np.where(
                    wavelen > low_freq_wavelen,
                    inv_freq / factor,
                    (1 - (orig_max / wavelen - low_freq_factor) /
                     (high_freq_factor - low_freq_factor)) *
                    (inv_freq / factor) +
                    ((orig_max / wavelen - low_freq_factor) /
                     (high_freq_factor - low_freq_factor)) * inv_freq,
                ))
            inv_freq = new_freq
        else:
            raise ValueError(f"unsupported rope scaling type {rope_type!r}")

    freqs = np.einsum("p,f->pf", positions, inv_freq)
    cos = np.cos(freqs) * attn_factor
    sin = np.sin(freqs) * attn_factor
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def apply_rope(
    x: jax.Array,  # [T, num_heads, head_dim]
    cos: jax.Array,  # [T, rotary_dim//2]
    sin: jax.Array,  # [T, rotary_dim//2]
    is_neox_style: bool = True,
) -> jax.Array:
    """Rotary position embedding (NeoX rotate-half style by default, as in
    Llama/Qwen/Mistral; GPT-J interleaved style optional)."""
    head_dim = x.shape[-1]
    rotary_dim = cos.shape[-1] * 2
    xf = x.astype(jnp.float32)
    x_rot = xf[..., :rotary_dim]
    x_pass = xf[..., rotary_dim:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    if is_neox_style:
        x1 = x_rot[..., :rotary_dim // 2]
        x2 = x_rot[..., rotary_dim // 2:]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        rotated = jnp.concatenate([o1, o2], axis=-1)
    else:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        rotated = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
    if rotary_dim < head_dim:
        rotated = jnp.concatenate([rotated, x_pass], axis=-1)
    return rotated.astype(x.dtype)


def flatten_kv_pages(kv_pages: jax.Array):
    """Fold the layer axis of the paged KV cache into the page axis.

    [L, P, page, 2K, D] -> [L*P, page, 2K, D] (a bitcast). Layer l's
    region starts at page l*P; its trash page stays at the end of that
    region, so the runner's slot bookkeeping is unchanged.

    Why: when the cache is threaded through a lax.scan over layers as
    stacked xs/ys, every step rewrites ALL cache bytes into the fresh ys
    buffer (~full-cache HBM traffic per decode step — measured 10x off
    the weight-streaming roofline at 1.4B). Holding ONE flat array as
    the scan *carry* and scattering at layer-offset slots keeps the
    update in-place (XLA aliases while-loop carries; the scatter only
    touches the new tokens' slots). This replaces the reference's
    per-layer `kv_caches: List[torch.Tensor]` in-place
    `reshape_and_cache` writes (cache_kernels.cu) with the XLA-native
    equivalent.
    """
    L, P = kv_pages.shape[0], kv_pages.shape[1]
    flat = kv_pages.reshape((L * P,) + kv_pages.shape[2:])
    return flat, L, P


def scan_layers_paged(layer_fn, x, kv_pages: jax.Array, xs, batch,
                      *, layer_ids: Optional[jax.Array] = None):
    """Scan `layer_fn` over [L]-stacked xs with the paged KV cache held
    flat as the scan carry (in-place per-layer scatters — see
    flatten_kv_pages).

    layer_fn(x, pages_flat, slots, page_indices, sc) -> (x, pages_flat)
    receives slot_mapping/page_indices already offset into its layer's
    page region.  Returns (x, new_kv_pages) with the cache back in
    [L, P, ...] shape.
    """
    flat, L, P = flatten_kv_pages(kv_pages)
    page_size = kv_pages.shape[2]
    if layer_ids is None:
        layer_ids = jnp.arange(L, dtype=jnp.int32)

    def body(carry, sc):
        x, flat = carry
        lidx, inner = sc
        slots = batch.slot_mapping + lidx * (P * page_size)
        pidx = batch.page_indices + lidx * P
        x, flat = layer_fn(x, flat, slots, pidx, inner)
        return (x, flat), None

    (x, flat), _ = jax.lax.scan(body, (x, flat), (layer_ids, xs))
    return x, flat.reshape(kv_pages.shape)
