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
import math
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
# Smaller waves waste less DMA on the ragged tail past kv_len (the last
# wave always fetches C full pages per live seq); larger waves amortize
# issue overhead. Swept on-chip via tools/probe_attn_device.py.
PAGES_PER_CHUNK = int(_os.environ.get("APHRODITE_DECODE_CHUNK", "4"))
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
        and head_dim in (64, 128)
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
    blocksparse: Optional[tuple] = None,  # (block_size, local, vert)
    bs_head_offsets: Optional[jax.Array] = None,  # i32[QH]
    bs_on: Optional[jax.Array] = None,  # scalar bool (per-layer gate)
    rel_bias: Optional[jax.Array] = None,  # f32[QH, NB] bucket bias (T5)
    rel_bias_meta: Optional[tuple] = None,  # (num_buckets, max_distance)
    return_stats: bool = False,
    interpret: bool = False,
):
    """return_stats=True (context-parallel sharded-KV decode): page
    index -1 marks a REMOTE page (DMA skipped AND its score columns
    masked), and the kernel returns (acc_unnormalized f32[S, QH, D],
    stats f32[S, QH, 128]) with stats[..., 0] = running max m and
    stats[..., 1] = softmax denominator l — the per-shard flash
    partials that merge across shards (paged_decode_attention_sharded).
    """
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

    # T5-style relative-position bias: a per-(head, bucket) table; the
    # kernel computes each column's bucket from its distance and adds
    # table[qh, bucket] to the scores (reference T5 decode adds the same
    # bias through its dense attention path; the jnp fallback gathered
    # every page per layer per step to do it).
    if rel_bias is not None:
        assert rel_bias_meta is not None
        bias_in = rel_bias.astype(jnp.float32).reshape(QH, -1)
    else:
        bias_in = jnp.zeros((QH, 8), jnp.float32)

    # Blocksparse scalars ride the prefetch stream so the DMA gates can
    # read them (per-head vertical phases + the per-layer on/off gate).
    if blocksparse is not None:
        assert bs_head_offsets is not None
        bs_off_in = bs_head_offsets.astype(jnp.int32).reshape(QH)
        bs_on_in = (jnp.ones((1,), jnp.int32) if bs_on is None else
                    bs_on.astype(jnp.int32).reshape(1))
    else:
        bs_off_in = jnp.zeros((QH,), jnp.int32)
        bs_on_in = jnp.zeros((1,), jnp.int32)

    out_specs = pl.BlockSpec((G, QH, D), lambda i, *_: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((S, QH, D), q.dtype)
    if return_stats:
        out_specs = [
            out_specs,
            pl.BlockSpec((G, QH, 128), lambda i, *_: (i, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((S, QH, D), jnp.float32),
            jax.ShapeDtypeStruct((S, QH, 128), jnp.float32),
        ]

    kernel = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            G=G, C=C, KV=KV, QG=QG, ps=ps,
            sm_scale=sm_scale,
            sliding_window=sliding_window,
            soft_cap=soft_cap,
            use_alibi=alibi_slopes is not None,
            blocksparse=blocksparse,
            rel_bias_meta=rel_bias_meta if rel_bias is not None else None,
            max_waves=max_waves,
            return_stats=return_stats,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # kv_lens, page_indices, bs_off, bs_on
            in_specs=[
                pl.BlockSpec((G, QH, D), lambda i, *_: (i, 0, 0)),  # q
                pl.BlockSpec((1, QH), lambda i, *_: (0, 0)),  # slopes
                pl.BlockSpec(bias_in.shape,
                             lambda i, *_: (0, 0)),  # rel-bias table
                pl.BlockSpec(memory_space=pltpu.ANY),  # kv_pages (HBM)
            ],
            out_specs=out_specs,
            grid=(S // G,),
            scratch_shapes=[
                pltpu.VMEM((2, G, C, ps, CKV, D), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),  # cross-block slot parity
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The double-buffered KV scratch plus the [M, N] f32 score
            # intermediates exceed the default 16M scoped-vmem cap at
            # production head counts; v5e has 128M physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        out_shape=out_shape,
        name="paged_decode_attention",
        interpret=interpret,
    )
    return kernel(kv_lens, page_indices, bs_off_in, bs_on_in, q,
                  slopes_in, bias_in, kv_pages)


def _decode_kernel(
    # scalar prefetch
    kv_lens_sref,  # i32[S]
    page_idx_sref,  # i32[S, pages_per_seq]
    bs_off_sref,  # i32[QH] per-q-head vertical phase (blocksparse)
    bs_on_sref,  # i32[1] per-layer blocksparse gate
    # inputs
    q_ref,  # [G, QH, D]
    slopes_ref,  # f32[1, QH]
    bias_ref,  # f32[QH, NB] relative-bucket bias table (zeros if unused)
    kv_hbm_ref,  # [P, ps, CKV, D]
    # output(s)
    o_ref,  # [G, QH, D]
    *rest,  # [stats_ref [G, QH, 128] if return_stats,] then scratch
    G, C, KV, QG, ps, sm_scale, sliding_window, soft_cap, use_alibi,
    blocksparse, rel_bias_meta, max_waves, return_stats=False,
):
    if return_stats:
        stats_ref, kv_bufs, sems, start_slot_ref = rest
    else:
        stats_ref = None
        kv_bufs, sems, start_slot_ref = rest
    blk = pl.program_id(0)
    seq0 = blk * G
    D = q_ref.shape[-1]
    CKV = 2 * KV
    QH = KV * QG
    Tw = C * ps

    # Blocksparse page-skip (Phi-3-Small; reference
    # attention/ops/blocksparse_attention/): token kv_pos is attendable
    # by head qh iff  bq - bk < local_blocks  OR
    # (bk + off[qh] + 1) % vert_stride == 0, with b* = pos // bsz. The
    # sparsity is block-aligned, so when bsz is a multiple of the page
    # size a page whose block no head's phase hits AND that is outside
    # the local window is DEAD for the whole kernel — its DMA is
    # skipped entirely (the reference's Triton kernel gets the same
    # bandwidth saving from its block-sparse loop structure). A static
    # residue bitmask over bk % vert covers "any head hits":
    # (bk + off + 1) % vert == 0  <=>  bk % vert == (vert-1-off) % vert.
    bs_skip_pages = (blocksparse is not None
                     and blocksparse[0] % ps == 0)
    if bs_skip_pages:
        bs_bsz, bs_local, bs_vert = blocksparse
        vert_bits = lax.fori_loop(
            0, QH,
            lambda h, m: m | (1 << lax.rem(
                bs_vert - 1 - lax.rem(bs_off_sref[h], bs_vert) + bs_vert,
                bs_vert)),
            jnp.int32(0))
        bs_gate_on = bs_on_sref[0] != 0

        def page_live(pidx, kv_len):
            bk = (pidx * ps) // bs_bsz
            bq = (kv_len - 1) // bs_bsz
            local = (bq - bk) < bs_local
            vert = ((vert_bits >> lax.rem(bk, bs_vert)) & 1) != 0
            return jnp.logical_or(
                jnp.logical_not(bs_gate_on),
                jnp.logical_or(local, vert))
    else:
        def page_live(pidx, kv_len):
            return True

    def issue_wave(wave, slot, base):
        """Start validity-gated page copies for one wave (G*C pages) of
        the sequence group starting at `base`.

        Slots whose page is past kv_len are ZERO-FILLED instead of
        copied: the scratch otherwise holds stale bits from earlier grid
        steps (arbitrary at program start — possibly NaN patterns),
        which would poison the masked softmax through 0 * NaN. A 64KB
        vector store per skipped slot is far cheaper than the full
        [2N, D] jnp.where sanitization pass this replaces (measured
        ~40% of kernel time at bench shapes).
        """
        npg = page_idx_sref.shape[1]
        for g in range(G):
            for c in range(C):
                pidx = wave * C + c
                kvl = kv_lens_sref[base + g]
                valid = jnp.logical_and(pidx * ps < kvl,
                                        page_live(pidx, kvl))
                if return_stats:
                    # CP sharded-KV mode: -1 marks a REMOTE page (its
                    # KV lives on another shard) — skip the DMA; its
                    # score columns are masked in the wave body.
                    valid = jnp.logical_and(
                        valid,
                        page_idx_sref[base + g, jnp.minimum(pidx, npg - 1)] >= 0)

                @pl.when(valid)
                def _():
                    page = page_idx_sref[base + g, pidx]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[page],
                        kv_bufs.at[slot, g, c],
                        sems.at[slot],
                    ).start()

                @pl.when(jnp.logical_not(valid))
                def _():
                    kv_bufs[slot, g, c] = jnp.zeros_like(kv_bufs[slot, g, c])

    def wait_wave(wave, slot):
        npg = page_idx_sref.shape[1]
        for g in range(G):
            for c in range(C):
                pidx = wave * C + c
                kvl = kv_lens_sref[seq0 + g]
                valid = jnp.logical_and(pidx * ps < kvl,
                                        page_live(pidx, kvl))
                if return_stats:
                    valid = jnp.logical_and(
                        valid,
                        page_idx_sref[seq0 + g, jnp.minimum(pidx, npg - 1)] >= 0)

                @pl.when(valid)
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

    # Cross-block wave-0 prefetch: each block issues the NEXT block's
    # first wave during its own last wave, so the DMA engine never
    # drains between grid steps (removed a ~20% per-call bubble at
    # bench shapes). The double-buffer slot parity therefore carries
    # across blocks through SMEM: block b+1 starts on the slot opposite
    # the one block b last consumed.
    num_blocks = pl.num_programs(0)

    @pl.when(blk == 0)
    def _():
        start_slot_ref[0] = 0
        issue_wave(0, 0, seq0)

    start_slot = start_slot_ref[0]
    next_start = lax.rem(start_slot + num_waves, 2)
    start_slot_ref[0] = next_start

    @pl.when(jnp.logical_and(num_waves == 0, blk + 1 < num_blocks))
    def _():
        # Fully-dead group: no wave loop runs, so hand the prefetch on
        # here (into this block's own start slot — nothing consumed it).
        issue_wave(0, start_slot, seq0 + G)

    # ----------------------------------------------------------------
    # Per-SEQUENCE score matmuls over the wave buffer.
    #
    # Each sequence's pages sit in a CONTIGUOUS [C, ps, CKV, D] block of
    # the scratch, so per-seq K/V extraction is a plain uint32
    # deinterleave of that block (no strided sublane gathers — a
    # per-kv-head decomposition was measured 2x SLOWER than the merged
    # [M, N] form because slicing head h out of the CKV-interleaved
    # buffer costs a 16-way relayout per head). Scores per seq are
    # [QH, Tw*KV]: the cross-SEQUENCE masked waste of the merged
    # formulation (a G-fold factor of pure -inf exp/mask work) is gone;
    # only the cross-kv-head KV-fold waste remains, which is what keeps
    # the matmul wide enough to stay MXU-shaped. Net: softmax/mask VPU
    # work drops G-fold (8x at bench shapes) for identical MXU tile
    # counts, pushing the kernel to the measured pure-DMA gather floor.
    # ----------------------------------------------------------------
    kv_dtype = kv_bufs.dtype
    quant8 = kv_dtype != jnp.bfloat16
    # 8-bit pages pack four adjacent rows (K_a, V_a, K_b, V_b) per
    # uint32, yielding two half-width lanes with logical column
    # n = 2*m + lane; bf16 and fp8 extract in natural order (1 lane).
    num_lanes = 2 if kv_dtype == jnp.int8 else 1
    Nc = Tw * KV  # columns per seq: n = tok * KV + head
    NL = Nc // num_lanes

    # Wave-invariant column metadata per lane: col n owns
    # (token, kv-head) = (n // KV, n % KV); row qh owns head qh // QG.
    row_qh = lax.broadcasted_iota(jnp.int32, (QH, 1), 0)
    row_head = row_qh // QG

    def lane_meta(h):
        col_n = (num_lanes * lax.broadcasted_iota(jnp.int32, (1, NL), 1)
                 + h)
        col_tok = col_n // KV
        same_head = row_head == (col_n % KV)  # [QH, NL]
        return same_head, col_tok

    lanes_meta = [lane_meta(h) for h in range(num_lanes)]

    if use_alibi:
        # Per-row slope in [QH, 1] orientation (Mosaic cannot shape-cast
        # the [1, QH] input): QH unrolled selects.
        slope_rows = jnp.zeros((QH, 1), jnp.float32)
        for qh in range(QH):
            slope_rows = jnp.where(row_qh == qh, slopes_ref[0, qh],
                                   slope_rows)

    if blocksparse is not None:
        bsp_bsz, bsp_local, bsp_vert = blocksparse
        bs_rows = jnp.zeros((QH, 1), jnp.int32)
        for qh in range(QH):
            bs_rows = jnp.where(row_qh == qh, bs_off_sref[qh], bs_rows)
        bs_enabled = bs_on_sref[0] != 0

    if rel_bias_meta is not None:
        rb_nb, rb_maxdist = rel_bias_meta
        rb_max_exact = rb_nb // 2
        rb_log_denom = math.log(rb_maxdist / rb_max_exact)

        def rel_bias_cols(col_pos, len_g):
            """T5 causal relative-position bucket bias per column
            (HF T5Attention._relative_position_bucket, causal branch),
            expanded against the [QH, NB] table with NB unrolled
            selects — no gathers."""
            n = jnp.maximum(len_g - 1 - col_pos, 0)  # [1, NL]
            logv = jnp.log(jnp.maximum(n, 1).astype(jnp.float32)
                           / rb_max_exact)
            val_large = rb_max_exact + (
                logv / rb_log_denom
                * (rb_nb - rb_max_exact)).astype(jnp.int32)
            val_large = jnp.minimum(val_large, rb_nb - 1)
            bucket = jnp.where(n < rb_max_exact, n, val_large)
            out = jnp.zeros((QH, bucket.shape[1]), jnp.float32)
            for b in range(rb_nb):
                out = jnp.where(bucket == b, bias_ref[:, b][:, None], out)
            return out

    # Fold sm_scale into q up front: saves one [QH, N] f32 multiply per
    # wave (one bf16 rounding of q instead; well inside kernel tolerance).
    q_all = (q_ref[...].astype(jnp.float32)
             * sm_scale).astype(jnp.bfloat16)  # [G, QH, D]

    def extract_seq(slot, g):
        """Per-lane (k, v) bf16 matrices for sequence g's wave block.

        Flat uint32 view of the contiguous [C, ps, CKV, D] block:
        adjacent bf16 (K, V) rows of one head pack into one uint32;
        8-bit rows pack four-deep — same trick as the bundled ragged
        kernel's strided_load_kv.
        """
        flat = kv_bufs.at[slot, g].reshape(Tw * CKV, D)
        b = flat.bitcast(jnp.uint32)[...]
        if not quant8:
            k = pltpu.bitcast(b << 16, jnp.float32).astype(jnp.bfloat16)
            v = pltpu.bitcast(b & jnp.uint32(0xFFFF0000),
                              jnp.float32).astype(jnp.bfloat16)
            return [(k, v)]

        if kv_dtype == jnp.int8:
            # int8 -> bf16 without width-changing astypes (each costs a
            # sublane repack): bias the byte to unsigned, drop it into
            # the mantissa of 2^23, and subtract (2^23 + 128) — all ops
            # stay 32-bit wide; the only repack is the final f32->bf16
            # round (exact: |int8| < 2^8 fits bf16's 8-bit significand).
            def to_bf16(byte):  # byte value in the low 8 bits
                u = (byte & 0xFF) ^ 0x80  # biased to [0, 255]
                f = pltpu.bitcast(u | jnp.uint32(0x4B000000), jnp.float32)
                return (f - jnp.float32(8388736.0)).astype(jnp.bfloat16)

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
        # large finite value, which the score mask removes. (Reference
        # folds the equivalent conversion into its CUDA kernels via
        # dtype_fp8.cuh.)
        mshift = 4 if kv_dtype == jnp.float8_e4m3fn else 5
        scale = jnp.bfloat16(2.0 ** (120 if mshift == 4 else 112))

        def pair_to_bf16(dw):
            # Convert bytes 0 and 2 of each uint32 in one masked pass
            # (signs and magnitudes of both bytes share an AND+shift),
            # landing them in the u32's two bf16 halves.
            sgn = (dw & jnp.uint32(0x00800080)) << 8
            mag = (dw & jnp.uint32(0x007F007F)) << mshift
            return pltpu.bitcast(sgn | mag, jnp.bfloat16) * scale

        k = pair_to_bf16(b)
        v = pair_to_bf16(b >> 8)
        return [(k, v)]

    def wave_body(wave, carry):
        ms, ls, accs = carry
        slot = lax.rem(start_slot + wave, 2)

        @pl.when(wave + 1 < num_waves)
        def _():
            issue_wave(wave + 1, 1 - slot, seq0)

        @pl.when(jnp.logical_and(wave + 1 == num_waves,
                                 blk + 1 < num_blocks))
        def _():
            issue_wave(0, 1 - slot, seq0 + G)

        wait_wave(wave, slot)

        new_ms, new_ls, new_accs = [], [], []
        for g in range(G):
            kv_lanes = extract_seq(slot, g)
            len_g = kv_lens_sref[seq0 + g]
            q_g = q_all[g]  # [QH, D]

            # Per-lane masked scores; online softmax over the lane union.
            scores = []
            for (k, v), (same_head, col_tok) in zip(kv_lanes, lanes_meta):
                col_pos = wave * Tw + col_tok  # [1, NL]
                valid = jnp.logical_and(same_head, col_pos < len_g)
                if return_stats:
                    # Mask columns of remote (-1 sentinel) pages: their
                    # buffer slots are zero-filled, and a 0 score must
                    # not leak into this shard's softmax partial.
                    npg = page_idx_sref.shape[1]
                    for c in range(C):
                        live_c = page_idx_sref[
                            seq0 + g, jnp.minimum(wave * C + c, npg - 1)] >= 0
                        in_c = (col_tok // ps) == c
                        valid = jnp.logical_and(
                            valid, jnp.logical_or(
                                jnp.logical_not(in_c), live_c))
                if sliding_window is not None:
                    valid = jnp.logical_and(
                        valid, col_pos >= len_g - sliding_window)
                if blocksparse is not None:
                    bk = col_pos // bsp_bsz  # [1, NL]
                    bq = (len_g - 1) // bsp_bsz
                    bs_ok = jnp.logical_or(
                        (bq - bk) < bsp_local,
                        lax.rem(bk + bs_rows + 1, bsp_vert) == 0)
                    valid = jnp.logical_and(
                        valid,
                        jnp.logical_or(bs_ok,
                                       jnp.logical_not(bs_enabled)))
                neg = jnp.where(valid, 0.0, MASK_VALUE)  # [QH, NL]

                s = jax.lax.dot_general(
                    q_g, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [QH, NL]
                if soft_cap is not None:
                    s = soft_cap * jnp.tanh(s / soft_cap)
                if use_alibi:
                    # bias = slope_h * (pos - (kv_len - 1)); masked cols
                    # don't care (MASK_VALUE dominates).
                    dist = (col_pos.astype(jnp.float32)
                            - (len_g.astype(jnp.float32) - 1.0))
                    s += slope_rows * dist
                if rel_bias_meta is not None:
                    s += rel_bias_cols(col_pos, len_g)
                s += neg
                scores.append((s, v))

            m_prev, l_prev, acc_prev = ms[g], ls[g], accs[g]
            m_cur = scores[0][0].max(axis=1, keepdims=True)
            for s, _ in scores[1:]:
                m_cur = jnp.maximum(m_cur, s.max(axis=1, keepdims=True))
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)  # [QH, 1]
            l_new = alpha * l_prev
            pv = jnp.zeros_like(acc_prev)
            for s, v in scores:
                p = jnp.exp(s - m_new)  # [QH, NL]
                l_new = l_new + jnp.sum(p, axis=1, keepdims=True)
                pv = pv + jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [QH, D]
            new_ms.append(m_new)
            new_ls.append(l_new)
            new_accs.append(alpha * acc_prev + pv)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    init = (
        tuple(jnp.full((QH, 1), -jnp.inf, jnp.float32) for _ in range(G)),
        tuple(jnp.zeros((QH, 1), jnp.float32) for _ in range(G)),
        tuple(jnp.zeros((QH, D), jnp.float32) for _ in range(G)),
    )
    ms, ls, accs = lax.fori_loop(0, num_waves, wave_body, init)

    for g in range(G):
        if return_stats:
            # Flash partials for the cross-shard merge: unnormalized
            # accumulator + (m, l) packed into stats cols 0/1.
            o_ref[g] = accs[g].astype(o_ref.dtype)
            col = lax.broadcasted_iota(jnp.int32, (QH, 128), 1)
            m_safe = jnp.where(jnp.isfinite(ms[g]), ms[g], -3.0e38)
            stats_ref[g] = jnp.where(
                col == 0, m_safe,
                jnp.where(col == 1, ls[g], 0.0)).astype(stats_ref.dtype)
        else:
            l_safe = jnp.where(ls[g] == 0.0, 1.0, ls[g])
            o_ref[g] = (accs[g] / l_safe).astype(o_ref.dtype)  # [QH, D]


# ---------------------------------------------------------------------------
# Context-parallel decode over SHARDED KV pages (beyond the reference:
# contexts larger than one chip's HBM). Each shard owns a contiguous
# range of pages; global page id p lives on shard p // pages_per_shard.
# Per-shard flash partials merge with ONE all-gather of
# (acc [S, QH, D], m, l) — for decode (q = one token/seq) a map-reduce
# merge strictly dominates a literal ring: there is no per-hop compute
# to overlap with cp ppermute steps, and the gathered stats are tiny
# next to the KV traffic each shard already reads locally.
# ---------------------------------------------------------------------------


def _partial_decode_ref(q, kv_pages, kv_lens, page_indices, *,
                        sm_scale: float):
    """jnp reference of the kernel's return_stats mode: flash partials
    over the LOCAL pages only (-1 page index = remote, masked)."""
    S, QH, D = q.shape
    P, ps, CKV, _ = kv_pages.shape
    KV = CKV // 2
    QG = QH // KV
    pps = page_indices.shape[1]
    live = page_indices >= 0  # [S, pps]
    g = kv_pages[jnp.clip(page_indices, 0, P - 1)]  # [S, pps, ps, CKV, D]
    k = g[..., 0::2, :].astype(jnp.float32)  # [S, pps, ps, KV, D]
    v = g[..., 1::2, :].astype(jnp.float32)
    qf = q.astype(jnp.float32) * sm_scale
    # Query head h attends kv head h // QG: expand K/V to q heads.
    kq = jnp.repeat(k, QG, axis=3)  # [S, pps, ps, QH, D]
    scores = jnp.einsum("shd,sjthd->shjt", qf, kq)  # [S, QH, pps, ps]
    pos = (jnp.arange(pps)[:, None] * ps
           + jnp.arange(ps)[None, :])  # [pps, ps]
    valid = ((pos[None] < kv_lens[:, None, None])
             & live[:, :, None])  # [S, pps, ps]
    scores = jnp.where(valid[:, None], scores, -jnp.inf)
    flat = scores.reshape(S, QH, pps * ps)
    m = flat.max(axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, -3.0e38)
    p = jnp.where(jnp.isfinite(flat), jnp.exp(flat - m), 0.0)
    l = p.sum(axis=-1, keepdims=True)
    vq = jnp.repeat(v, QG, axis=3).reshape(S, pps * ps, QH, D)
    acc = jnp.einsum("shn,snhd->shd", p, vq)
    return acc, m, l


def paged_decode_attention_sharded(
    q: jax.Array,  # [S, QH, D]
    kv_pages_local: jax.Array,  # this shard's [P_local, ps, CKV, D]
    kv_lens: jax.Array,  # i32[S] GLOBAL kv length
    page_indices: jax.Array,  # i32[S, pps] GLOBAL page ids
    num_seqs: jax.Array,
    *,
    axis_name: str,
    pages_per_shard: int,
    sm_scale: float = 1.0,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Runs INSIDE shard_map over `axis_name`. Returns the full
    (merged) attention output, replicated across the cp axis."""
    if use_kernel is None:
        use_kernel = jax.default_backend() in ("tpu", "axon")
    rank = lax.axis_index(axis_name)
    lo = rank * pages_per_shard
    in_range = jnp.logical_and(page_indices >= lo,
                               page_indices < lo + pages_per_shard)
    local_idx = jnp.where(in_range, page_indices - lo, -1)
    if use_kernel:
        acc, stats = paged_decode_attention(
            q, kv_pages_local, kv_lens, local_idx, num_seqs,
            sm_scale=sm_scale, return_stats=True, interpret=interpret)
        m = stats[..., 0:1]
        l = stats[..., 1:2]
    else:
        acc, m, l = _partial_decode_ref(q, kv_pages_local, kv_lens,
                                        local_idx, sm_scale=sm_scale)
    accs = lax.all_gather(acc.astype(jnp.float32), axis_name)
    ms = lax.all_gather(m, axis_name)  # [cp, S, QH, 1]
    ls = lax.all_gather(l, axis_name)
    m_star = ms.max(axis=0)
    w = jnp.exp(ms - m_star)  # dead shards: exp(-3e38 - m*) -> 0
    l_tot = (w * ls).sum(axis=0)
    num = (w * accs).sum(axis=0)  # [S, QH, D] (w broadcasts over D)
    out = num / jnp.where(l_tot == 0.0, 1.0, l_tot)
    return out.astype(q.dtype)


def _partial_ragged_ref(q, kv_pages, kv_lens, page_indices, cu_q_lens,
                        *, sm_scale: float):
    """Flash partials of RAGGED (prefill) attention over LOCAL pages
    (-1 = remote): row i of sequence s attends positions
    < kv_len_s - q_len_s + i + 1 (the ragged kernel's causal rule).
    Returns (acc [T, QH, D], m [T, QH, 1], l [T, QH, 1]) — the prefill
    half of sharded-KV context parallelism; merge is identical to the
    decode case (merge_attention_partials)."""
    T, QH, D = q.shape
    P, ps, CKV, _ = kv_pages.shape
    KV = CKV // 2
    QG = QH // KV
    S, pps = page_indices.shape
    live = page_indices >= 0  # [S, pps]
    g = kv_pages[jnp.clip(page_indices, 0, P - 1)]  # [S, pps, ps, CKV, D]
    k = jnp.repeat(g[..., 0::2, :].astype(jnp.float32), QG, axis=3)
    v = jnp.repeat(g[..., 1::2, :].astype(jnp.float32), QG, axis=3)
    #

    # Row metadata: seq id + in-seq row index per flat token.
    tok = jnp.arange(T)
    seq_of = jnp.searchsorted(cu_q_lens, tok, side="right") - 1
    seq_of = jnp.clip(seq_of, 0, S - 1)
    row_in_seq = tok - cu_q_lens[seq_of]
    q_len = cu_q_lens[seq_of + 1] - cu_q_lens[seq_of]
    limit = kv_lens[seq_of] - q_len + row_in_seq + 1  # [T]

    qf = q.astype(jnp.float32) * sm_scale
    kq = k[seq_of]  # [T, pps, ps, QH, D]
    scores = jnp.einsum("thd,tjshd->thjs", qf, kq)  # [T, QH, pps, ps]
    pos = (jnp.arange(pps)[:, None] * ps + jnp.arange(ps)[None, :])
    valid = ((pos[None] < limit[:, None, None])
             & live[seq_of][:, :, None])  # [T, pps, ps]
    scores = jnp.where(valid[:, None], scores, -jnp.inf)
    flat = scores.reshape(T, QH, pps * ps)
    m = flat.max(axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, -3.0e38)
    p = jnp.where(jnp.isfinite(flat), jnp.exp(flat - m), 0.0)
    l = p.sum(axis=-1, keepdims=True)
    vq = v[seq_of].reshape(T, pps * ps, QH, D)
    acc = jnp.einsum("thn,tnhd->thd", p, vq)
    return acc, m, l


def merge_attention_partials(accs, ms, ls, out_dtype):
    """Merge flash partials gathered over shards: accs [R, ..., D],
    ms/ls [R, ..., 1] -> normalized output [..., D]."""
    m_star = ms.max(axis=0)
    w = jnp.exp(ms - m_star)
    l_tot = (w * ls).sum(axis=0)
    num = (w * accs).sum(axis=0)
    return (num / jnp.where(l_tot == 0.0, 1.0, l_tot)).astype(out_dtype)


def ragged_paged_attention_sharded(
    q: jax.Array,  # [T, QH, D] flat prefill token stream
    kv_pages_local: jax.Array,
    kv_lens: jax.Array,  # i32[S] GLOBAL post-chunk kv length
    page_indices: jax.Array,  # i32[S, pps] GLOBAL page ids
    cu_q_lens: jax.Array,  # i32[S+1]
    num_seqs: jax.Array,
    *,
    axis_name: str,
    pages_per_shard: int,
    sm_scale: float = 1.0,
) -> jax.Array:
    """Prefill attention over cp-SHARDED KV pages (inside shard_map).

    Same map-reduce merge as the decode op; the gathered partials are
    [cp, T, QH, D + 2] — for prefill chunks this is small next to the
    per-shard KV reads each shard already performs locally. The Pallas
    partial-stats kernel for the ragged case is round-6 work; this jnp
    path defines the semantics and serves the virtual-mesh tests."""
    del num_seqs
    rank = lax.axis_index(axis_name)
    lo = rank * pages_per_shard
    in_range = jnp.logical_and(page_indices >= lo,
                               page_indices < lo + pages_per_shard)
    local_idx = jnp.where(in_range, page_indices - lo, -1)
    acc, m, l = _partial_ragged_ref(q, kv_pages_local, kv_lens,
                                    local_idx, cu_q_lens,
                                    sm_scale=sm_scale)
    accs = lax.all_gather(acc, axis_name)
    ms = lax.all_gather(m, axis_name)
    ls = lax.all_gather(l, axis_name)
    return merge_attention_partials(accs, ms, ls, q.dtype)
