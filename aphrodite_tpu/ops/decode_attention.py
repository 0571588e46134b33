"""Grouped paged-attention decode kernel (Pallas TPU).

Decode steps (q_len == 1 per sequence) dominate serving time, and the
general ragged kernel's cost there is per-sequence bookkeeping, not
flops or bandwidth: it walks sequences serially in a scalar while-loop,
runs an unrolled flash body per kv head with masked l/m/acc stores, and
always DMAs its full kv block even past kv_len (measured ~1.4us fixed
per sequence per layer-call on v5e — ~180us/call at batch 128 against a
~120us HBM floor).

This kernel restructures decode as a *grouped block-diagonal flash*:

- Grid over groups of G sequences. Per group and per KV-page wave, the
  G sequences' pages are DMA'd together (validity-gated: no copies past
  kv_len) into a double-buffered VMEM scratch.
- ONE matmul per wave computes scores for the whole group across ALL kv
  heads: q rows are the G*QH query heads, columns are the G*T_w*KV
  (token, kv-head) pairs in the buffer's natural flat layout. Products
  crossing sequences or kv heads are masked to -inf by an iota-built
  block-diagonal mask BEFORE the softmax, so the math is exactly
  per-sequence per-head attention; the wasted MXU flops are free
  relative to the HBM-bound floor, while a per-head loop of tiny
  matmuls is dispatch-bound (measured 0.22 ms/call vs 0.15 for the
  ragged kernel at batch 128 on v5e).
- Online-softmax state (m, l, acc) is carried as loop values in
  registers across waves — no masked scratch stores, no per-sequence
  scalar loop.

ALiBi, sliding window, and logit soft-cap are folded into the same mask
arithmetic (reference: attention/ops/paged_attn.py decode path + ALiBi
bias; the bundled jax kernel lacks an ALiBi input).

Capability reference: aphrodite/attention/backends/pallas.py (TPU
decode attention) and paged_attention v1/v2 kernels (csrc/attention/).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# Sequences per grid step. The S buckets are powers of two >= 8, so any
# power of two <= 8 divides the padded batch. Elementwise score work per
# layer scales LINEARLY with the group size (the [M, N] block-diagonal
# score matrix wastes a G*KV fraction on masked cross-seq/cross-head
# products), while DMA batching improves with it — tunable for probes.
import os as _os

GROUP = int(_os.environ.get("APHRODITE_DECODE_GROUP", "8"))
# KV pages per sequence per DMA wave (wave token width = C * page_size).
PAGES_PER_CHUNK = 8
# VMEM budget for one kv double-buffer slot.
_SLOT_BYTES_LIMIT = 4 * 1024 * 1024


# Narrow KV-cache dtypes handled natively: 8-bit pages are DMA'd raw
# (half the HBM traffic of bf16) and converted to bf16 in-register
# inside the wave loop. Scales never enter the kernel: the models fold
# k_scale into q and v_scale into the attention output (see
# models/llama.py layer_fn), the TPU equivalent of the reference's
# in-kernel scale multiplies (kernels/attention/attention_kernels.cu
# fp8/int8 variants + dtype_fp8.cuh).
_QUANT_KV_DTYPES = (jnp.int8, jnp.float8_e4m3fn, jnp.float8_e5m2)


def supports(q, kv_pages, page_indices) -> bool:
    """Static gate: shapes/dtypes this kernel handles."""
    S, num_q_heads, head_dim = q.shape
    _, page_size, num_combined, hd2 = kv_pages.shape
    num_kv = num_combined // 2
    return (
        (kv_pages.dtype == jnp.bfloat16
         or kv_pages.dtype in _QUANT_KV_DTYPES)
        and q.dtype == jnp.bfloat16
        and head_dim == 128
        and hd2 == head_dim
        and page_size % 8 == 0
        and num_combined % 2 == 0
        and num_q_heads % num_kv == 0
        and S % GROUP == 0
        and S == page_indices.shape[0]
    )


def paged_decode_attention(
    q: jax.Array,  # [S, QH, D] (row i = the single new token of seq i)
    kv_pages: jax.Array,  # [P, page_size, 2*KV, D]
    kv_lens: jax.Array,  # i32[S] post-write kv length per seq
    page_indices: jax.Array,  # i32[S, pages_per_seq]
    num_seqs: jax.Array,  # i32[1] (unused: kv_lens==0 marks dead rows)
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # f32[QH]
    interpret: bool = False,
) -> jax.Array:
    del num_seqs
    S, QH, D = q.shape
    P, ps, CKV, _ = kv_pages.shape
    KV = CKV // 2
    QG = QH // KV
    pages_per_seq = page_indices.shape[1]
    G = GROUP

    # Wave sizing under the VMEM budget (8-bit KV packs twice the pages
    # per wave for the same VMEM, halving wave count AND HBM traffic).
    slot_page_bytes = G * ps * CKV * D * jnp.dtype(kv_pages.dtype).itemsize
    C = max(1, min(PAGES_PER_CHUNK, pages_per_seq,
                   _SLOT_BYTES_LIMIT // slot_page_bytes))
    Tw = C * ps  # tokens per seq per wave
    max_waves = pl.cdiv(pages_per_seq, C)

    slopes_in = (jnp.zeros((1, QH), jnp.float32) if alibi_slopes is None
                 else alibi_slopes.astype(jnp.float32).reshape(1, QH))

    kernel = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            G=G, C=C, KV=KV, QG=QG, ps=ps,
            sm_scale=sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            use_alibi=alibi_slopes is not None,
            max_waves=max_waves,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # kv_lens, page_indices
            in_specs=[
                pl.BlockSpec((G, QH, D), lambda i, *_: (i, 0, 0)),  # q
                pl.BlockSpec((1, QH), lambda i, *_: (0, 0)),  # slopes
                pl.BlockSpec(memory_space=pltpu.ANY),  # kv_pages (HBM)
            ],
            out_specs=pl.BlockSpec((G, QH, D), lambda i, *_: (i, 0, 0)),
            grid=(S // G,),
            scratch_shapes=[
                pltpu.VMEM((2, G, C, ps, CKV, D), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The double-buffered KV scratch plus the [M, N] f32 score
            # intermediates exceed the default 16M scoped-vmem cap at
            # production head counts; v5e has 128M physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((S, QH, D), q.dtype),
        name="paged_decode_attention",
        interpret=interpret,
    )
    return kernel(kv_lens, page_indices, q, slopes_in, kv_pages)


def _decode_kernel(
    # scalar prefetch
    kv_lens_sref,  # i32[S]
    page_idx_sref,  # i32[S, pages_per_seq]
    # inputs
    q_ref,  # [G, QH, D]
    slopes_ref,  # f32[1, QH]
    kv_hbm_ref,  # [P, ps, CKV, D]
    # output
    o_ref,  # [G, QH, D]
    # scratch
    kv_bufs,  # [2, G, C, ps, CKV, D]
    sems,  # DMA[2]
    *,
    G, C, KV, QG, ps, sm_scale, sliding_window, soft_cap, use_alibi,
    max_waves,
):
    blk = pl.program_id(0)
    seq0 = blk * G
    D = q_ref.shape[-1]
    CKV = 2 * KV
    QH = KV * QG
    Tw = C * ps
    # Score-matrix geometry: rows m = g*QH + qh (all query heads of the
    # group), columns n = (g*Tw + tok)*KV + h (the packed K/V buffer's
    # natural flat row order — no strided slicing).
    N = G * Tw * KV
    M = G * QH

    def issue_wave(wave, slot):
        """Start validity-gated page copies for one wave (G*C pages)."""
        for g in range(G):
            for c in range(C):
                pidx = wave * C + c

                @pl.when(pidx * ps < kv_lens_sref[seq0 + g])
                def _():
                    page = page_idx_sref[seq0 + g, pidx]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[page],
                        kv_bufs.at[slot, g, c],
                        sems.at[slot],
                    ).start()

    def wait_wave(wave, slot):
        for g in range(G):
            for c in range(C):
                pidx = wave * C + c

                @pl.when(pidx * ps < kv_lens_sref[seq0 + g])
                def _():
                    page = page_idx_sref[seq0 + g, pidx]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[page],
                        kv_bufs.at[slot, g, c],
                        sems.at[slot],
                    ).wait()

    # Group-max kv length bounds the wave loop.
    max_kv = lax.fori_loop(
        0, G, lambda g, m: jnp.maximum(m, kv_lens_sref[seq0 + g]), 0)
    num_waves = lax.div(max_kv + Tw - 1, Tw)

    issue_wave(0, 0)

    # K/V extraction lanes. bf16 pages pack the adjacent (K, V) rows of
    # one head into one uint32 lane (one lane covering all N columns);
    # 8-bit pages (int8 / fp8 KV cache) pack FOUR adjacent rows
    # (K_a, V_a, K_b, V_b) per uint32, yielding two half-width lanes
    # whose logical column index is n = 2*m + h for lane h. Each lane
    # carries its own column metadata; the online softmax runs over the
    # union of lanes, so the math is lane-count invariant.
    kv_dtype = kv_bufs.dtype
    quant8 = kv_dtype != jnp.bfloat16
    # fp8 lanes re-interleave to the natural column order at the bit
    # level (see extract_lanes), so only int8 needs the two-lane layout.
    num_lanes = 2 if kv_dtype == jnp.int8 else 1
    NL = N // num_lanes  # columns per lane

    # Wave-invariant score-mask metadata per lane. Column n owns (seq,
    # token, kv-head) = (n // (Tw*KV), (n // KV) % Tw, n % KV); row m
    # owns (seq, kv-head) = (m // QH, (m % QH) // QG). Per-column kv
    # length is assembled from the SMEM prefetch scalars with G selects.
    row_m = lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    row_seq = row_m // QH
    row_head = (row_m % QH) // QG

    def lane_meta(h):
        col_n = (num_lanes * lax.broadcasted_iota(jnp.int32, (1, NL), 1)
                 + h)
        col_seq = col_n // (Tw * KV)
        col_tok_local = (col_n // KV) % Tw
        col_head = col_n % KV
        same_block = jnp.logical_and(row_seq == col_seq,
                                     row_head == col_head)
        kv_len_cols = jnp.zeros((1, NL), jnp.int32)
        for g in range(G):
            kv_len_cols = jnp.where(col_seq == g, kv_lens_sref[seq0 + g],
                                    kv_len_cols)
        # Same metadata in [NL, 1] orientation for the K/V zeroing mask
        # (Mosaic cannot reshape an i1 vector across dims).
        col_n1 = (num_lanes * lax.broadcasted_iota(jnp.int32, (NL, 1), 0)
                  + h)
        col_tok_local_n = (col_n1 // KV) % Tw
        col_seq_n = col_n1 // (Tw * KV)
        kv_len_n = jnp.zeros((NL, 1), jnp.int32)
        for g in range(G):
            kv_len_n = jnp.where(col_seq_n == g, kv_lens_sref[seq0 + g],
                                 kv_len_n)
        return (same_block, kv_len_cols, col_tok_local, col_tok_local_n,
                kv_len_n)

    lanes_meta = [lane_meta(h) for h in range(num_lanes)]

    if use_alibi:
        # Per-row slope in [M, 1] orientation (Mosaic cannot shape-cast
        # [G, QH] -> [M, 1]): QH unrolled selects on m % QH.
        row_qh = row_m % QH
        slope_rows = jnp.zeros((M, 1), jnp.float32)
        for qh in range(QH):
            slope_rows = jnp.where(row_qh == qh, slopes_ref[0, qh],
                                   slope_rows)

    # Fold sm_scale into q up front: saves one [M, N] f32 multiply per
    # wave (one bf16 rounding of q instead; well inside kernel tolerance).
    q_all = (q_ref[...].reshape(M, D).astype(jnp.float32)
             * sm_scale).astype(jnp.bfloat16)  # [G, QH, D] -> [M, D]

    def extract_lanes(slot):
        """Unpack the wave buffer into per-lane (k, v) bf16 matrices.

        Flat uint32 view: adjacent bf16 (K, V) rows of one head pack into
        one uint32 lane; 8-bit rows pack four-deep (K_a, V_a, K_b, V_b) —
        same trick as the bundled ragged kernel's strided_load_kv.
        """
        flat = kv_bufs.at[slot].reshape(2 * N, D)  # K/V rows
        b = flat.bitcast(jnp.uint32)[...]
        if not quant8:
            k = pltpu.bitcast(b << 16, jnp.float32).astype(jnp.bfloat16)
            v = pltpu.bitcast(b & jnp.uint32(0xFFFF0000),
                              jnp.float32).astype(jnp.bfloat16)
            return [(k, v)]

        if kv_dtype == jnp.int8:
            def to_bf16(byte):  # byte value in the low 8 bits (garbage above)
                i8 = pltpu.bitcast(byte.astype(jnp.uint8), jnp.int8)
                return i8.astype(jnp.bfloat16)

            return [(to_bf16(b >> (16 * h)), to_bf16(b >> (16 * h + 8)))
                    for h in range(2)]

        # fp8 -> bf16 without convert_element_type: v5e has no native fp8
        # conversion, so XLA emulates astype with a long scalar sequence
        # (measured 2.5x total kernel cost). Instead place sign/exponent/
        # mantissa straight into bf16 bit positions and fix the
        # exponent-bias difference with ONE multiply:
        #   e4m3fn (bias 7):  bits = s<<15 | (em7 << 4), scale 2^120
        #   e5m2   (bias 15): bits = s<<15 | (em7 << 5), scale 2^112
        # Denormal fp8 inputs come out exactly right through the same
        # multiply (the bf16 intermediate is denormal); fp8 NaN maps to a
        # large finite value, which a KV cache never holds. (Reference
        # folds the equivalent conversion into its CUDA kernels via
        # dtype_fp8.cuh.)
        #
        # Both bytes of a lane pair are converted INSIDE one uint32 (low
        # half = row 2m, high half = row 2m+1) and bitcast to bf16 once:
        # no 16-bit repacking relayouts, and the result lands in the
        # natural flat column order, so fp8 uses the same single-lane
        # score pass as bf16.
        mshift = 4 if kv_dtype == jnp.float8_e4m3fn else 5
        scale = jnp.bfloat16(2.0 ** (120 if mshift == 4 else 112))

        def pair_to_bf16(lo_byte, hi_byte):
            lo = (((lo_byte & 0x80) << 8) | ((lo_byte & 0x7F) << mshift))
            hi = (((hi_byte & 0x80) << 24)
                  | ((hi_byte & 0x7F) << (16 + mshift)))
            return pltpu.bitcast(lo | hi, jnp.bfloat16) * scale  # [2r, D]

        k = pair_to_bf16(b, b >> 16)
        v = pair_to_bf16(b >> 8, b >> 24)
        return [(k, v)]

    def wave_body(wave, carry):
        m_prev, l_prev, acc_prev = carry
        slot = lax.rem(wave, 2)

        @pl.when(wave + 1 < num_waves)
        def _():
            issue_wave(wave + 1, 1 - slot)

        wait_wave(wave, slot)

        kv_lanes = extract_lanes(slot)

        # Per-lane masked scores; online softmax over the lane union.
        scores = []
        for (k, v), meta in zip(kv_lanes, lanes_meta):
            (same_block, kv_len_cols, col_tok_local, col_tok_local_n,
             kv_len_n) = meta
            col_pos = wave * Tw + col_tok_local  # absolute kv position
            # Tokens past kv_len were never DMA'd: zero their K/V before
            # the matmuls so buffer garbage (possibly NaN) can't poison
            # scores through 0 * NaN (same guard as the bundled kernel).
            tok_valid = (wave * Tw + col_tok_local_n) < kv_len_n
            valid = jnp.logical_and(same_block, col_pos < kv_len_cols)
            if sliding_window is not None:
                valid = jnp.logical_and(
                    valid, col_pos >= kv_len_cols - sliding_window)
            neg = jnp.where(valid, 0.0, MASK_VALUE)  # [M, NL] f32

            k = jnp.where(tok_valid, k, jnp.bfloat16(0))
            v = jnp.where(tok_valid, v, jnp.bfloat16(0))

            s = jax.lax.dot_general(
                q_all, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [M, NL]
            if soft_cap is not None:
                s = soft_cap * jnp.tanh(s / soft_cap)
            if use_alibi:
                # bias = slope_h * (pos - (kv_len - 1)); masked cols
                # don't care (MASK_VALUE dominates).
                dist = (col_pos.astype(jnp.float32)
                        - (kv_len_cols.astype(jnp.float32) - 1.0))
                s += slope_rows * dist
            s += neg
            scores.append((s, v))

        m_cur = scores[0][0].max(axis=1, keepdims=True)
        for s, _ in scores[1:]:
            m_cur = jnp.maximum(m_cur, s.max(axis=1, keepdims=True))
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [M, 1]
        l_new = alpha * l_prev
        pv = jnp.zeros_like(acc_prev)
        for s, v in scores:
            p = jnp.exp(s - m_new)  # [M, NL]
            l_new = l_new + jnp.sum(p, axis=1, keepdims=True)
            pv = pv + jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [M, D]
        acc_new = alpha * acc_prev + pv
        return m_new, l_new, acc_new

    init = (jnp.full((M, 1), -jnp.inf, jnp.float32),
            jnp.zeros((M, 1), jnp.float32),
            jnp.zeros((M, D), jnp.float32))
    ms, ls, accs = lax.fori_loop(0, num_waves, wave_body, init)

    l_safe = jnp.where(ls == 0.0, 1.0, ls)
    out = (accs / l_safe).astype(o_ref.dtype)  # [M, D]
    o_ref[...] = out.reshape(G, QH, D)
