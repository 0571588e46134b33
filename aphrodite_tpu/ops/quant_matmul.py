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
            # Large-model tiles (8B: bt=256/bn=1024 f32 out blocks +
            # dequantized bf16 planes) exceed the 16M default scoped-
            # vmem cap; v5e has 128M physical.
            vmem_limit_bytes=100 * 1024 * 1024,
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
            # Large-model tiles (8B: bt=256/bn=1024 f32 out blocks +
            # dequantized bf16 planes) exceed the 16M default scoped-
            # vmem cap; v5e has 128M physical.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=T * K * 2 + K * N + T * N * 4,
            transcendentals=0,
        ),
    )(x, q4, scale, zero)


# ---------------------------------------------------------------------------
# Packed (2 nibbles per byte) int4: the HBM-traffic-optimal format.
#
# Half-split layout: packed row i of [K/2, N] holds original row i in the
# low nibble and row i + K/2 in the high nibble. Unlike adjacent-pair
# packing this needs NO sublane interleave to restore natural order —
# each packed tile covers two group-aligned original-row ranges, so the
# kernel runs two group matmuls per packed group. Requires (K/2) % G == 0.
# ---------------------------------------------------------------------------


def pack_int4_rows(q4):
    """int8[.., K, N] values 0..15 -> packed int8[.., K/2, N]
    (numpy or jnp; half-split layout)."""
    import numpy as _np

    xp = _np if isinstance(q4, _np.ndarray) else jnp
    K = q4.shape[-2]
    assert K % 2 == 0, K
    lo = q4[..., : K // 2, :].astype(xp.uint8)
    hi = q4[..., K // 2:, :].astype(xp.uint8)
    return (lo | (hi << 4)).astype(xp.int8)


def unpack_int4_rows(q4p):
    """Inverse of pack_int4_rows (numpy or jnp)."""
    import numpy as _np

    xp = _np if isinstance(q4p, _np.ndarray) else jnp
    p = q4p.astype(xp.uint8)
    lo = (p & 0xF).astype(xp.int8)
    hi = (p >> 4).astype(xp.int8)
    return xp.concatenate([lo, hi], axis=-2)


def int4p_matmul_ref(x, q4p, scale, zero, group: int):
    return int4_matmul_ref(x, unpack_int4_rows(q4p), scale, zero, group)


def _kernel_packed_groupwise(idx_sref, xl_ref, xh_ref, q_ref, s_ref,
                             z_ref, o_ref, acc_ref, *, group: int,
                             block_kp: int, half_groups: int):
    """Packed-weight decode tile: raw-nibble MXU matmuls with group
    scales applied to the [bt, bn] partials (see _kernel_groupwise), two
    matmuls per packed group (low-half rows + high-half rows).

        out = sum_g s_g * (x_g @ q_g) - s_g z_g * rowsum(x_g)

    HBM weight traffic is K*N/2 bytes — the true int4 byte count (the
    reference's Marlin W4A16 GEMM property,
    kernels/quantization/marlin/dense/marlin_cuda_kernel.cu).

    Weight blocks carry a leading layer dim selected by the prefetched
    layer index (see int4p_matmul_pallas).
    """
    del idx_sref
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rpb = block_kp // group
    row0 = k_idx * rpb
    xl = xl_ref[:]  # [bt, bkp] columns K[k-tile] (low half)
    xh = xh_ref[:]  # [bt, bkp] columns K/2 + k-tile (high half)
    p = q_ref[0].astype(jnp.int32) & 255  # [bkp, bn] unsigned bytes
    acc = acc_ref[:]
    for g in range(rpb):
        sl = slice(g * group, (g + 1) * group)
        pg = p[sl, :]
        qlo = (pg & 15).astype(xl.dtype)
        qhi = (pg >> 4).astype(xl.dtype)
        xlg = xl[:, sl]
        xhg = xh[:, sl]
        part_lo = jnp.dot(xlg, qlo, preferred_element_type=jnp.float32)
        part_hi = jnp.dot(xhg, qhi, preferred_element_type=jnp.float32)
        s_lo = s_ref[0, row0 + g, :][None, :]
        z_lo = z_ref[0, row0 + g, :][None, :]
        s_hi = s_ref[0, half_groups + row0 + g, :][None, :]
        z_hi = z_ref[0, half_groups + row0 + g, :][None, :]
        xsum_lo = jnp.sum(xlg.astype(jnp.float32), axis=1, keepdims=True)
        xsum_hi = jnp.sum(xhg.astype(jnp.float32), axis=1, keepdims=True)
        acc = (acc + s_lo * part_lo - (s_lo * z_lo) * xsum_lo
               + s_hi * part_hi - (s_hi * z_hi) * xsum_hi)
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kernel_packed_dense(idx_sref, xl_ref, xh_ref, q_ref, s_ref, z_ref,
                         o_ref, acc_ref, *, group: int, block_kp: int,
                         half_groups: int):
    """Packed-weight prefill tile: dequantize both nibble planes in VMEM
    and run two [bt, bkp] x [bkp, bn] matmuls (VPU dequant cost amortizes
    over large bt)."""
    del idx_sref
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rpb = block_kp // group
    row0 = k_idx * rpb
    p = q_ref[0].astype(jnp.int32) & 255
    qlo = (p & 15).astype(jnp.float32)  # [bkp, bn]
    qhi = (p >> 4).astype(jnp.float32)

    def gather_rows(ref, base):
        if rpb == 1:
            return ref[0, base, :][None, :]
        return jnp.stack([ref[0, base + g, :] for g in range(rpb)])

    s_lo = jnp.repeat(gather_rows(s_ref, row0), group, axis=0)
    z_lo = jnp.repeat(gather_rows(z_ref, row0), group, axis=0)
    s_hi = jnp.repeat(gather_rows(s_ref, half_groups + row0), group, axis=0)
    z_hi = jnp.repeat(gather_rows(z_ref, half_groups + row0), group, axis=0)
    wlo = ((qlo - z_lo) * s_lo).astype(xl_ref.dtype)
    whi = ((qhi - z_hi) * s_hi).astype(xl_ref.dtype)
    acc_ref[:] += (
        jnp.dot(xl_ref[:], wlo, preferred_element_type=jnp.float32)
        + jnp.dot(xh_ref[:], whi, preferred_element_type=jnp.float32))

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kernel_packed_w4a8(idx_sref, xq_l_ref, xq_h_ref, q_ref, s_ref,
                        z_ref, o_ref, acc_ref, *, group: int,
                        block_kp: int, half_groups: int):
    """W4A8 tile: nibbles stay in the INT8 domain end-to-end — int8
    nibble extract (no width-changing repack), int8 x int8 MXU dot
    (2x the bf16 MXU rate on v5e), per-group f32 rank-1 fixups:

        out = sum_g s_g * (xq_g @ q_g) - s_g z_g * rowsum(xq_g)

    then the caller multiplies by the per-token activation scale.
    This attacks the w4a16 'VPU nibble-dequant bound' (roadmap r4): the
    dense body pays ~10 VPU passes per packed byte for dequant; here
    the per-element work is two int8 logicals and the scaling moves to
    [bt, bn]-sized per-group fixups (VERDICT r4 weak-3 / next-3)."""
    del idx_sref
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rpb = block_kp // group
    row0 = k_idx * rpb
    p = q_ref[0]  # int8 [bkp, bn]
    acc = acc_ref[:]
    for g in range(rpb):
        sl = slice(g * group, (g + 1) * group)
        pg = p[sl, :]
        # Nibble planes WITHOUT leaving the 8-bit domain: Mosaic lacks
        # an int8 shift, so view 4 sublane-adjacent bytes as one u32,
        # shift/mask there (0.5 VPU ops per byte), and view back —
        # per-byte semantics hold because the 0x0F0F0F0F mask discards
        # the bits a 4-bit shift drags across byte boundaries.
        pu = pltpu.bitcast(pg, jnp.uint32)  # [group/4, bn]
        qlo = pltpu.bitcast(pu & jnp.uint32(0x0F0F0F0F), jnp.int8)
        qhi = pltpu.bitcast((pu >> 4) & jnp.uint32(0x0F0F0F0F),
                            jnp.int8)
        xlg = xq_l_ref[:, sl]  # int8 [bt, group]
        xhg = xq_h_ref[:, sl]
        part_lo = jax.lax.dot_general(
            xlg, qlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        part_hi = jax.lax.dot_general(
            xhg, qhi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        s_lo = s_ref[0, row0 + g, :][None, :]
        z_lo = z_ref[0, row0 + g, :][None, :]
        s_hi = s_ref[0, half_groups + row0 + g, :][None, :]
        z_hi = z_ref[0, half_groups + row0 + g, :][None, :]
        xsum_lo = jnp.sum(xlg.astype(jnp.int32), axis=1,
                          keepdims=True).astype(jnp.float32)
        xsum_hi = jnp.sum(xhg.astype(jnp.int32), axis=1,
                          keepdims=True).astype(jnp.float32)
        acc = (acc + s_lo * part_lo.astype(jnp.float32)
               - (s_lo * z_lo) * xsum_lo
               + s_hi * part_hi.astype(jnp.float32)
               - (s_hi * z_hi) * xsum_hi)
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def quantize_activations_int8(x):
    """Per-token symmetric int8: (xq int8[T, K], sx f32[T, 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    return xq, sx


def int4p_matmul_w4a8_pallas(x, q4p, scale, zero, group: int,
                             layer_idx=None,
                             block_t: Optional[int] = None,
                             block_n: Optional[int] = None,
                             block_kp: Optional[int] = None,
                             interpret: bool = False):
    """Packed-int4 weights x dynamically-int8-quantized activations.

    Same packed half-split weight layout as int4p_matmul_pallas; the
    activation quantization (and the final per-token scale) live
    OUTSIDE the kernel where XLA fuses them into neighbors. Numerics:
    w4a8 (per-token symmetric a8) — measured in the accuracy tier as
    its own config row."""
    T, K = x.shape
    if q4p.ndim == 2:
        q4p, scale, zero = q4p[None], scale[None], zero[None]
        layer_idx = 0
    Kh, N = q4p.shape[-2], q4p.shape[-1]
    assert Kh * 2 == K and Kh % group == 0, (K, Kh, group)
    half_groups = Kh // group
    xq, sx = quantize_activations_int8(x)
    if block_t is None:
        block_t = 128 if T <= 128 else 256
    if block_n is None:
        block_n = 1024
    if block_kp is None:
        block_kp = group
        for cand in range(1024, group - 1, -group):
            if Kh % cand == 0:
                block_kp = cand
                break
    block_t = min(block_t, T)
    block_n = min(block_n, N)
    grid = (pl.cdiv(T, block_t), pl.cdiv(N, block_n), Kh // block_kp)
    xl = xq[:, :Kh]
    xh = xq[:, Kh:]
    idx = jnp.asarray(layer_idx, jnp.int32).reshape((1,))
    out = pl.pallas_call(
        functools.partial(_kernel_packed_w4a8, group=group,
                          block_kp=block_kp, half_groups=half_groups),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # layer index
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_t, block_kp),
                             lambda t, n, k, i: (t, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_t, block_kp),
                             lambda t, n, k, i: (t, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_kp, block_n),
                             lambda t, n, k, i: (i[0], k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // group, block_n),
                             lambda t, n, k, i: (i[0], 0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // group, block_n),
                             lambda t, n, k, i: (i[0], 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_t, block_n),
                                   lambda t, n, k, i: (t, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Large-model tiles (8B: bt=256/bn=1024 f32 out blocks +
            # dequantized bf16 planes) exceed the 16M default scoped-
            # vmem cap; v5e has 128M physical.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=T * K + Kh * N + T * N * 4,
            transcendentals=0,
        ),
        name="int4p_matmul_w4a8",
        interpret=interpret,
    )(idx, xl, xh, q4p, scale, zero)
    return out * sx


def int4p_matmul_w4a8_ref(x, q4p, scale, zero, group: int):
    """Numerics oracle: same a8 quantization, exact dequant matmul."""
    xq, sx = quantize_activations_int8(x)
    w = unpack_int4_rows(q4p).astype(jnp.float32)
    K = w.shape[-2]
    s = jnp.repeat(scale, group, axis=-2)[..., :K, :]
    z = jnp.repeat(zero, group, axis=-2)[..., :K, :]
    return (xq.astype(jnp.float32) @ ((w - z) * s)) * sx


def int4p_matmul_pallas(x, q4p, scale, zero, group: int,
                        layer_idx=None,
                        block_t: Optional[int] = None,
                        block_n: Optional[int] = None,
                        block_kp: Optional[int] = None,
                        interpret: bool = False,
                        body: Optional[str] = None):
    """Fused packed-int4 matmul. x[T, K] bf16/f32, q4p int8[K/2, N] or
    LAYER-STACKED int8[L, K/2, N] with `layer_idx` selecting the layer.

    The stacked form exists for lax.scan'd model layers: passing the
    scan's per-layer slice to a pallas custom-call forces XLA to
    materialize the slice (a full extra read+write of the quantized
    bytes per layer, measured ~20% of the int4 decode step). With the
    stacked array + a scalar-prefetched layer index, the kernel's block
    pipeline reads HBM directly at the right layer offset.

    Dispatches the group-wise (decode, small T) or dense-dequant
    (prefill, large T) tile body; both read the packed bytes once.
    """
    T, K = x.shape
    if q4p.ndim == 2:
        q4p, scale, zero = q4p[None], scale[None], zero[None]
        layer_idx = 0
    Kh, N = q4p.shape[-2], q4p.shape[-1]
    assert Kh * 2 == K and Kh % group == 0, (K, Kh, group)
    half_groups = Kh // group
    import os as _os
    body = body or _os.environ.get("APHRODITE_INT4_BODY") or None
    # Body choice (device-swept, tools/quant_tile_sweep.py QTS_BODY=1):
    # at T >= 64 the dense-dequant body beats group-wise at every model
    # site (w2 by 23% — the groupwise fixup work scales with K/group
    # while dense dequant amortizes over bt rows); groupwise only wins
    # when bt is well below the group size (tiny spec-draft batches).
    decode = (T < 64) if body is None else (body == "groupwise")
    if block_t is None:
        block_t = 128 if T <= 128 else 256
    if block_n is None:
        # bn=1024 for the dense body (its dequantized bf16 planes live
        # in VMEM: bkp x bn x 2 x 2B — bn=2048 with a deep k-tile
        # overflows); the swept dense-body numbers all used 1024.
        block_n = 1024
    if block_kp is None:
        # Largest multiple of `group` dividing Kh, capped for VMEM.
        cap = 1024 if decode else 2048
        block_kp = group
        for cand in range(cap, group - 1, -group):
            if Kh % cand == 0:
                block_kp = cand
                break
    block_t = min(block_t, T)
    block_n = min(block_n, N)
    grid = (pl.cdiv(T, block_t), pl.cdiv(N, block_n), Kh // block_kp)
    body = _kernel_packed_groupwise if decode else _kernel_packed_dense
    xl = x[:, :Kh]
    xh = x[:, Kh:]
    idx = jnp.asarray(layer_idx, jnp.int32).reshape((1,))
    return pl.pallas_call(
        functools.partial(body, group=group, block_kp=block_kp,
                          half_groups=half_groups),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # layer index
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_t, block_kp),
                             lambda t, n, k, i: (t, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_t, block_kp),
                             lambda t, n, k, i: (t, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_kp, block_n),
                             lambda t, n, k, i: (i[0], k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // group, block_n),
                             lambda t, n, k, i: (i[0], 0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // group, block_n),
                             lambda t, n, k, i: (i[0], 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_t, block_n),
                                   lambda t, n, k, i: (t, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Large-model tiles (8B: bt=256/bn=1024 f32 out blocks +
            # dequantized bf16 planes) exceed the 16M default scoped-
            # vmem cap; v5e has 128M physical.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=T * K * 2 + Kh * N + T * N * 4,
            transcendentals=0,
        ),
        name="int4p_matmul",
        interpret=interpret,
    )(idx, xl, xh, q4p, scale, zero)


def _kernel_stacked_dense(idx_sref, x_ref, q_ref, s_ref, z_ref, o_ref,
                          acc_ref, *, group: int, block_k: int):
    """Unpacked layer-stacked tile (dense dequant body): weight blocks
    carry a leading layer dim selected by the prefetched index."""
    del idx_sref
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rpb = block_k // group
    row0 = k_idx * rpb
    q = q_ref[0].astype(jnp.float32)  # [bk, bn]

    def rows(ref):
        if rpb == 1:
            return ref[0, row0, :][None, :]
        return jnp.stack([ref[0, row0 + g, :] for g in range(rpb)])

    s = jnp.repeat(rows(s_ref), group, axis=0)
    z = jnp.repeat(rows(z_ref), group, axis=0)
    w = ((q - z) * s).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w,
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _kernel_stacked_groupwise(idx_sref, x_ref, q_ref, s_ref, z_ref,
                              o_ref, acc_ref, *, group: int,
                              block_k: int):
    """Unpacked layer-stacked tile (group-wise MXU body): raw integer
    matmuls with per-group output fixups (see _kernel_groupwise)."""
    del idx_sref
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rpb = block_k // group
    row0 = k_idx * rpb
    x = x_ref[:]
    q = q_ref[0]
    acc = acc_ref[:]
    for g in range(rpb):
        xg = x[:, g * group:(g + 1) * group]
        qg = q[g * group:(g + 1) * group, :].astype(x.dtype)
        part = jnp.dot(xg, qg, preferred_element_type=jnp.float32)
        s = s_ref[0, row0 + g, :][None, :]
        z = z_ref[0, row0 + g, :][None, :]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + s * part - (s * z) * xsum
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def int4_matmul_pallas_stacked(x, q4, scale, zero, group: int,
                               layer_idx, interpret: bool = False):
    """UNPACKED grouped container with a LAYER-STACKED weight
    (q4 int8[L, K, N] — any value range incl. signed gguf q5/q6/q8/iq
    levels) and a traced layer index. Same reason the packed form
    exists: handing the scan's per-layer slice to a pallas custom-call
    materializes the slice (a full extra read+write of the quantized
    bytes per layer); the scalar-prefetched index reads HBM in place."""
    T, K = x.shape
    N = q4.shape[-1]
    decode = T < 64  # dense body wins at bt >= 64 (see packed kernel)
    block_t = min(128 if T <= 128 else 256, T)
    block_n = min(1024, N)
    cap = 1024 if decode else 2048
    block_k = group
    for cand in range(cap, group - 1, -group):
        if K % cand == 0:
            block_k = cand
            break
    grid = (pl.cdiv(T, block_t), pl.cdiv(N, block_n), K // block_k)
    body = (_kernel_stacked_groupwise if decode
            else _kernel_stacked_dense)
    idx = jnp.asarray(layer_idx, jnp.int32).reshape((1,))
    return pl.pallas_call(
        functools.partial(body, group=group, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_t, block_k),
                             lambda t, n, k, i: (t, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, block_n),
                             lambda t, n, k, i: (i[0], k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // group, block_n),
                             lambda t, n, k, i: (i[0], 0, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // group, block_n),
                             lambda t, n, k, i: (i[0], 0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_t, block_n),
                                   lambda t, n, k, i: (t, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_t, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Large-model tiles (8B: bt=256/bn=1024 f32 out blocks +
            # dequantized bf16 planes) exceed the 16M default scoped-
            # vmem cap; v5e has 128M physical.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * N * K,
            bytes_accessed=T * K * 2 + K * N + T * N * 4,
            transcendentals=0,
        ),
        name="int4_matmul_stacked",
        interpret=interpret,
    )(idx, x, q4, scale, zero)


def int4_matmul_stacked_dispatch(x, q4, scale, zero, group: int,
                                 layer_idx):
    """Layer-stacked UNPACKED grouped matmul dispatch (gguf q5/q6/q8/iq
    containers in lax.scan'd models)."""
    if x.ndim > 2:
        lead = x.shape[:-1]
        out = int4_matmul_stacked_dispatch(
            x.reshape(-1, x.shape[-1]), q4, scale, zero, group,
            layer_idx)
        return out.reshape(*lead, -1)
    import os

    impl = os.environ.get("APHRODITE_TPU_INT4_IMPL", "pallas")
    use_kernel = (jax.default_backend() in ("tpu", "axon")
                  and impl == "pallas")
    T, K = x.shape
    N = q4.shape[-1]
    if (use_kernel and N % 128 == 0 and group > 1 and K % group == 0
            and T >= 16):
        return int4_matmul_pallas_stacked(x, q4, scale, zero, group,
                                          layer_idx=layer_idx)
    return int4_matmul_ref(x, q4[layer_idx], scale[layer_idx],
                           zero[layer_idx], group)


def int4p_matmul_stacked_dispatch(x, q4p, scale, zero, group: int,
                                  layer_idx):
    """Layer-stacked packed-int4 matmul: q4p [L, K/2, N] plus a traced
    layer index. Exists so lax.scan'd models can hand the kernel the
    WHOLE weight stack — passing the scan's per-layer slice to a pallas
    custom-call makes XLA materialize the slice (an extra read+write of
    the quantized bytes every layer); with the stacked array + scalar-
    prefetched index the kernel block pipeline reads HBM in place."""
    if x.ndim > 2:
        lead = x.shape[:-1]
        out = int4p_matmul_stacked_dispatch(
            x.reshape(-1, x.shape[-1]), q4p, scale, zero, group,
            layer_idx)
        return out.reshape(*lead, -1)
    import os

    impl = os.environ.get("APHRODITE_TPU_INT4_IMPL", "pallas")
    use_kernel = (jax.default_backend() in ("tpu", "axon")
                  and impl == "pallas")
    T, K = x.shape
    Kh, N = q4p.shape[-2], q4p.shape[-1]
    if (use_kernel and N % 128 == 0 and group > 1 and Kh % group == 0
            and T >= 16):
        if os.environ.get("APHRODITE_W4_A8", "0") == "1":
            # int8-activation path: int8 x int8 MXU dots + rank-1
            # group fixups (see _kernel_packed_w4a8).
            return int4p_matmul_w4a8_pallas(x, q4p, scale, zero, group,
                                            layer_idx=layer_idx)
        return int4p_matmul_pallas(x, q4p, scale, zero, group,
                                   layer_idx=layer_idx)
    return int4p_matmul_ref(x, q4p[layer_idx], scale[layer_idx],
                            zero[layer_idx], group)


def int4p_matmul_dispatch(x, q4p, scale, zero, group: int):
    """Trace-time dispatch for the packed container: Pallas on TPU for
    aligned shapes, unpack+ref elsewhere."""
    if x.ndim > 2:
        lead = x.shape[:-1]
        out = int4p_matmul_dispatch(x.reshape(-1, x.shape[-1]), q4p,
                                    scale, zero, group)
        return out.reshape(*lead, -1)
    import os

    impl = os.environ.get("APHRODITE_TPU_INT4_IMPL", "pallas")
    use_kernel = (jax.default_backend() in ("tpu", "axon")
                  and impl == "pallas")
    T, K = x.shape
    Kh, N = q4p.shape[-2], q4p.shape[-1]
    if (use_kernel and N % 128 == 0 and group > 1 and Kh % group == 0
            and T >= 16):
        return int4p_matmul_pallas(x, q4p, scale, zero, group)
    return int4p_matmul_ref(x, q4p, scale, zero, group)


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
        if T < 64:
            # Tiny batches (spec drafts): group-wise MXU formulation —
            # dense dequant only amortizes over bt >= 64 rows (swept).
            return int4_matmul_pallas_groupwise(x, q4, scale, zero, group)
        return int4_matmul_pallas(x, q4, scale, zero, group)
    return int4_matmul_ref(x, q4, scale, zero, group)
