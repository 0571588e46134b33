"""Fused dequant-matmul for group-quantized int4 weights (GPTQ/AWQ).

TPU-native answer to the reference's Marlin / Machete / GPTQ CUDA GEMMs
(kernels/quantization/{marlin,machete,gptq_marlin}/*, ~10k LoC C++):
weights are stored int4-in-int8 [K, N] with per-group scales/zeros
[K/G, N]; the kernel dequantizes tiles in VMEM and feeds the MXU, so HBM
traffic is the *quantized* bytes (the whole point of weight-only quant:
decode is HBM-bandwidth-bound).

Two implementations:
- `int4_matmul_ref`: jnp reference (dequant-then-matmul; XLA fuses the
  dequant into the operand read). Used on CPU and as the numerics oracle.
- `int4_matmul_pallas`: tiled Pallas kernel (grid over [T/bt, N/bn],
  K-loop in VMEM with per-group scaling).

Layout notes (MXU/VPU tiling, pallas_guide.md):
- N tiles are multiples of 128 (lane dim), K tiles multiples of the
  group size; int8 sublane tile is 32 so K tiles are >= 32.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def int4_matmul_ref(x, q4, scale, zero, group: int):
    """[T, K] @ dequant(q4[K, N]) via XLA. q4 int8 values, zero-point
    form: w = (q - zero) * scale with per-group scale/zero."""
    K, N = q4.shape[-2], q4.shape[-1]
    qf = q4.astype(jnp.float32)
    s = jnp.repeat(scale, group, axis=-2)[..., :K, :]
    z = jnp.repeat(zero, group, axis=-2)[..., :K, :]
    w = ((qf - z) * s).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _kernel(x_ref, q_ref, s_ref, z_ref, o_ref, acc_ref, *, group: int,
            block_k: int, total_rows: int):
    """One [bt, bk] x [bk, bn] tile: dequant q in VMEM, matmul on MXU.

    Grid: (T/bt, N/bn, K/bk); K is the innermost (sequential) axis and
    accumulates into acc_ref (f32 VMEM scratch). s_ref/z_ref hold the
    FULL K-range of group scales for this n-tile (Mosaic requires
    sublane-divisible or full-dim blocks; a (bk/group, bn) block with
    bk == group would be a single row) — the k-tile's rows are sliced
    in-kernel.
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].astype(jnp.float32)  # [bk, bn]
    rows_per_blk = block_k // group
    if rows_per_blk == total_rows:  # single k step: whole scale block
        s = s_ref[:]
        z = z_ref[:]
    elif rows_per_blk % 8 == 0:  # sublane-aligned multi-row slice
        row0 = pl.multiple_of(k_idx * rows_per_blk, 8)
        s = s_ref[pl.ds(row0, rows_per_blk), :]  # [bk/group, bn]
        z = z_ref[pl.ds(row0, rows_per_blk), :]
    else:  # scalar-row reads (always lowerable)
        row0 = k_idx * rows_per_blk
        s = jnp.stack([s_ref[row0 + g, :] for g in range(rows_per_blk)])
        z = jnp.stack([z_ref[row0 + g, :] for g in range(rows_per_blk)])
    s = jnp.repeat(s, group, axis=0)  # [bk, bn]
    z = jnp.repeat(z, group, axis=0)
    w = ((q - z) * s).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def int4_matmul_pallas(x, q4, scale, zero, group: int,
                       block_t: int = 256, block_n: int = 1024,
                       block_k: Optional[int] = None):
    """Tiled fused dequant-matmul. x[T, K] f32/bf16, q4[K, N] int8.

    Tiles sized for few large grid steps (VMEM: q bk*bn int8 + x bt*bk
    + acc bt*bn f32 within ~8MB) — many tiny steps leave the MXU idle
    between pallas pipeline stages.
    """
    T, K = x.shape
    N = q4.shape[-1]
    if block_k is None:
        # Largest multiple of `group` that divides K, capped at 2048
        # (VMEM budget for the double-buffered q tile).
        block_k = group
        for cand in range(2048, group - 1, -group):
            if K % cand == 0:
                block_k = cand
                break
    assert K % block_k == 0 and block_k % group == 0, (K, block_k, group)
    block_t = min(block_t, T)
    block_n = min(block_n, N)
    grid = (pl.cdiv(T, block_t), pl.cdiv(N, block_n), K // block_k)

    out = pl.pallas_call(
        functools.partial(_kernel, group=group, block_k=block_k,
                          total_rows=K // group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, block_k), lambda t, n, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda t, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group, block_n),
                         lambda t, n, k: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group, block_n),
                         lambda t, n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda t, n, k: (t, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=T * K * 2 + K * N // 2 + T * N * 4,
            transcendentals=0,
        ),
    )(x, q4, scale, zero)
    return out


def _kernel_groupwise(x_ref, q_ref, s_ref, z_ref, o_ref, acc_ref, *,
                      group: int, block_k: int):
    """Decode-optimized tile: run the MXU on RAW int4 values and apply
    group scales to the [bt, bn] partials instead of dequantizing the
    whole [bk, bn] weight tile on the VPU.

        out = sum_g s_g * (x_g @ q_g) - s_g z_g * rowsum(x_g)

    VPU work per tile drops from O(bk*bn) to O(groups*bt*bn) — the
    winning trade at decode batch sizes (bt << bk).
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rows_per_blk = block_k // group
    row0 = k_idx * rows_per_blk  # row reads below are per-scalar-row
    x = x_ref[:]  # [bt, bk]
    q = q_ref[:]  # [bk, bn] int8 values 0..15
    acc = acc_ref[:]
    for g in range(rows_per_blk):
        xg = x[:, g * group:(g + 1) * group]
        qg = q[g * group:(g + 1) * group, :].astype(x.dtype)
        part = jnp.dot(xg, qg, preferred_element_type=jnp.float32)
        s = s_ref[row0 + g, :][None, :]  # [1, bn]
        z = z_ref[row0 + g, :][None, :]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + s * part - (s * z) * xsum
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def int4_matmul_pallas_groupwise(x, q4, scale, zero, group: int,
                                 block_t: int = 128, block_n: int = 1024,
                                 block_k: Optional[int] = None):
    """Group-wise MXU formulation (see _kernel_groupwise)."""
    T, K = x.shape
    N = q4.shape[-1]
    if block_k is None:
        # Largest multiple of `group` that divides K, capped at 2048
        # (VMEM budget for the double-buffered q tile).
        block_k = group
        for cand in range(2048, group - 1, -group):
            if K % cand == 0:
                block_k = cand
                break
    assert K % block_k == 0 and block_k % group == 0
    block_t = min(block_t, T)
    block_n = min(block_n, N)
    grid = (pl.cdiv(T, block_t), pl.cdiv(N, block_n), K // block_k)
    return pl.pallas_call(
        functools.partial(_kernel_groupwise, group=group,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, block_k), lambda t, n, k: (t, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda t, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group, block_n), lambda t, n, k: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group, block_n), lambda t, n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, block_n), lambda t, n, k: (t, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=T * K * 2 + K * N + T * N * 4,
            transcendentals=0,
        ),
    )(x, q4, scale, zero)


def int4_matmul_dispatch(x, q4, scale, zero, group: int):
    """Trace-time dispatch: Pallas on TPU for aligned shapes, ref else.

    Handles stacked-layer leading dims by flattening x's leading axes.
    """
    if x.ndim > 2:
        lead = x.shape[:-1]
        out = int4_matmul_dispatch(x.reshape(-1, x.shape[-1]), q4, scale,
                                   zero, group)
        return out.reshape(*lead, -1)
    import os

    impl = os.environ.get("APHRODITE_TPU_INT4_IMPL", "pallas")
    use_kernel = (jax.default_backend() in ("tpu", "axon")
                  and impl == "pallas")
    T, K = x.shape
    N = q4.shape[-1]
    if use_kernel and N % 128 == 0 and K % group == 0 and T >= 16:
        if T <= 128:
            # Decode shapes: VPU dequant of full weight tiles dominates;
            # use the group-wise MXU formulation.
            return int4_matmul_pallas_groupwise(x, q4, scale, zero, group)
        return int4_matmul_pallas(x, q4, scale, zero, group)
    return int4_matmul_ref(x, q4, scale, zero, group)
