"""Quantized-linear core: weight containers + the matmul dispatch.

The reference expresses quantization as per-layer `LinearMethodBase`
objects attached to nn.Modules (quantization/base_config.py:54,119,
modeling/layers/linear.py:91). Our models are pure functions over a params
pytree, so a quantized weight is simply a *dict leaf group* in the pytree:

    {"q": int8[L, in, out], "scale": f32[L, 1, out], ...}

and every matmul in model code goes through `qmatmul(x, w)`, which
dispatches on the container shape. Plain jnp arrays pass through to a
dense MXU matmul, so dense and quantized checkpoints share model code —
and `lax.scan` over stacked layers works unchanged because the container
is itself a pytree.

Kinds (the "kind" is implied by which keys are present):
- dense:              jnp.ndarray
- int8 per-channel:   {q: int8[.., K, N], scale: f32[.., 1, N]}
- fp8 w8a8:           {q: f8e4m3[.., K, N], scale: f32[.., 1, N], act: "fp8"}
- int4 grouped:       {q4: int8[.., K, N] (values in [0, 15]),
                       scale: f32[.., K/G, N], zero: f32[.., K/G, N]}
                      (group size G derives from shapes: K // scale rows,
                      keeping the container free of non-array leaves)
"""

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp

WeightLike = Union[jax.Array, Dict[str, Any]]


def is_quantized(w: WeightLike) -> bool:
    return isinstance(w, dict)


def qmatmul(x: jax.Array, w: WeightLike) -> jax.Array:
    """x[T, K] @ w -> [T, N] in f32 accumulation.

    Dispatch is trace-time (the pytree structure is static under jit).
    """
    if not isinstance(w, dict):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "q4p" in w:
        return _int4p_matmul(x, w)
    if "q4" in w:
        return _int4_matmul(x, w)
    if w["q"].dtype == jnp.float8_e4m3fn:
        return _fp8_w8a8_matmul(x, w)
    return _int8_matmul(x, w)


def _int8_matmul(x: jax.Array, w: Dict[str, Any]) -> jax.Array:
    """Weight-only int8 per-channel (reference tpu_int8.py:115
    quantized_matmul): dequant folded into the output scale.

    The int8 operand is converted to the activation dtype IN the dot
    (int8 -> bf16 is exact; XLA fuses the convert into the operand read
    so HBM traffic stays the int8 bytes). A mixed bf16 x s8 dot_general
    lowers to a catastrophically slow emulation on TPU (measured ~1000x
    at bench shapes), so never hand XLA the raw s8 operand."""
    q = w["q"].astype(x.dtype)
    out = jax.lax.dot_general(
        x, q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out * w["scale"]


def _fp8_w8a8_matmul(x: jax.Array, w: Dict[str, Any]) -> jax.Array:
    """FP8 W8A8 with dynamic per-token activation quantization
    (reference CUTLASS w8a8 path, kernels/quantization/fp8/common.cu).

    The activation is quantized to e4m3 with a per-token scale; the MXU
    multiplies fp8 x fp8 accumulating in f32; output is rescaled by
    (act_scale x weight_scale).
    """
    e4m3_max = float(jnp.finfo(jnp.float8_e4m3fn).max)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    act_scale = (absmax.astype(jnp.float32) / e4m3_max)
    act_scale = jnp.maximum(act_scale, 1e-12)
    xq = (x / act_scale).astype(jnp.float8_e4m3fn)
    out = jax.lax.dot_general(
        xq, w["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out * act_scale * w["scale"]


def _int4_matmul(x: jax.Array, w: Dict[str, Any]) -> jax.Array:
    """Group-quantized int4 weight-only (GPTQ/AWQ family).

    Reference: Marlin/Machete fused dequant GEMMs
    (kernels/quantization/gptq_marlin/*, machete/*). XLA fallback:
    dequantize in-graph (the compiler fuses the dequant chain into the
    matmul's operand read) — the Pallas fused kernel in
    ops/quant_matmul.py takes over on TPU for supported shapes.
    """
    from aphrodite_tpu.ops.quant_matmul import (
        int4_matmul_dispatch, int4_matmul_stacked_dispatch)

    group = w["q4"].shape[-2] // w["scale"].shape[-2]
    if "_idx" in w:
        # Layer-stacked view (q4 [L, K, N] + traced index): read the
        # stacked weights in place instead of a materialized slice.
        return int4_matmul_stacked_dispatch(
            x, w["q4"], w["scale"], w["zero"], group, w["_idx"])
    return int4_matmul_dispatch(x, w["q4"], w["scale"], w["zero"], group)


def _int4p_matmul(x: jax.Array, w: Dict[str, Any]) -> jax.Array:
    """Packed (2 nibbles/byte, half-split rows) int4 weight-only — the
    HBM-optimal storage the Marlin W4A16 GEMM achieves in the reference
    (kernels/quantization/marlin/dense/).

    A container holding "_idx" is a LAYER-STACKED VIEW (q4p [L, K/2, N]
    + traced layer index), produced by the scan plumbing in model
    forwards so the pallas kernel reads the stacked weights in place
    instead of through a materialized per-layer slice."""
    from aphrodite_tpu.ops.quant_matmul import (
        int4p_matmul_dispatch, int4p_matmul_stacked_dispatch)

    K = 2 * w["q4p"].shape[-2]
    group = K // w["scale"].shape[-2]
    if "_idx" in w:
        return int4p_matmul_stacked_dispatch(
            x, w["q4p"], w["scale"], w["zero"], group, w["_idx"])
    return int4p_matmul_dispatch(x, w["q4p"], w["scale"], w["zero"], group)


def dequantize(w: WeightLike, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the full-precision weight (tests / fallback)."""
    if not isinstance(w, dict):
        return w.astype(dtype)
    if "q4p" in w:
        from aphrodite_tpu.ops.quant_matmul import unpack_int4_rows

        return dequantize({"q4": unpack_int4_rows(w["q4p"]),
                           "scale": w["scale"], "zero": w["zero"]}, dtype)
    if "q4" in w:
        q = w["q4"].astype(jnp.float32)
        G = w["q4"].shape[-2] // w["scale"].shape[-2]
        K = q.shape[-2]
        scale = jnp.repeat(w["scale"], G, axis=-2)[..., :K, :]
        zero = jnp.repeat(w["zero"], G, axis=-2)[..., :K, :]
        return ((q - zero) * scale).astype(dtype)
    return (w["q"].astype(jnp.float32) * w["scale"]).astype(dtype)
