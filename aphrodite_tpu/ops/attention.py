"""Ragged paged attention.

The unified attention op behind every model: one flat stream of query tokens
(mixed prefill chunks + decode tokens), paged KV cache with per-sequence
block tables. This single op replaces the reference's split world of
`flash_attention` (prefill) + `paged_attention` (decode) + the Triton
`prefix_prefill` chunked-context kernel (aphrodite/attention/ops/
prefix_prefill.py, backends/pallas.py:124-237) — and lifts the reference
TPU backend's all-prefill-or-all-decode restriction (pallas.py:62-63).

Two implementations:
  - ``ref_ragged_paged_attention``: pure-jnp, obviously-correct oracle; used
    on CPU (tests, virtual meshes) and as the numerics reference.
  - TPU: the Pallas ragged-paged-attention kernel (dispatched in
    ``ragged_paged_attention``), run per-model-shard under ``shard_map``
    (attention is embarrassingly parallel over heads).

KV cache layout (shared with the kernel):
  kv_pages: [num_pages, page_size, 2 * num_kv_heads, head_dim]
  with K at even and V at odd combined-head indices.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.ops.decode_attention import (
    paged_decode_attention, supports as decode_supports)

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _smap_mesh(mesh):
    """Mesh to hand a nested partial-manual shard_map: inside an
    enclosing manual region (the pp stage body) JAX requires the
    CONTEXT abstract mesh (with "pipe" already Manual) instead of the
    concrete mesh."""
    am = jax.sharding.get_abstract_mesh()
    if not am.empty and am._any_axis_manual:
        return am
    return mesh



def ref_ragged_paged_attention(
    q: jax.Array,  # [T, num_q_heads, head_dim]
    kv_pages: jax.Array,  # [num_pages, page_size, 2*num_kv_heads, head_dim]
    kv_lens: jax.Array,  # i32[S]
    page_indices: jax.Array,  # i32[S, pages_per_seq]
    cu_q_lens: jax.Array,  # i32[S+1]
    num_seqs: jax.Array,  # i32[1]
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,  # f32[num_q_heads]
    blocksparse: Optional[tuple] = None,  # (block_size, local, vert)
    bs_head_offsets: Optional[jax.Array] = None,  # i32[num_q_heads]
    bs_on: Optional[jax.Array] = None,  # scalar bool (per-layer gate)
) -> jax.Array:
    """Pure-jnp ragged paged attention (static shapes, jit-friendly).

    Memory cost is O(T * max_kv_len) — fine for tests/CPU, not the serving
    path. Rows belonging to padding (beyond cu_q_lens[num_seqs]) produce
    garbage that callers must ignore.

    blocksparse: Phi-3-Small local+vertical-strided block sparsity
    (reference attention/ops/blocksparse_attention/utils.py:117-120):
    with block indices bq = q_pos // block_size, bk = kv_pos //
    block_size, a position is attended iff causal AND
    (bq - bk < local_blocks OR (bk + head_offset + 1) % vert_stride
    == 0). bs_head_offsets carries the per-GLOBAL-q-head vertical
    phase (0 for homo_head); bs_on gates the mask per layer (False =
    this layer is dense).
    """
    T, num_q_heads, head_dim = q.shape
    S, pages_per_seq = page_indices.shape
    num_pages, page_size, num_combined, _ = kv_pages.shape
    num_kv_heads = num_combined // 2
    assert num_q_heads % num_kv_heads == 0
    q_per_kv = num_q_heads // num_kv_heads
    max_kv_len = pages_per_seq * page_size

    # Token -> sequence mapping. searchsorted over the cumulative query
    # lens: token t belongs to seq i iff cu_q_lens[i] <= t < cu_q_lens[i+1].
    tok = jnp.arange(T, dtype=jnp.int32)
    tok_seq = jnp.searchsorted(cu_q_lens[1:], tok, side="right")
    tok_seq = jnp.minimum(tok_seq, S - 1).astype(jnp.int32)
    q_start = cu_q_lens[tok_seq]
    q_len = cu_q_lens[tok_seq + 1] - q_start
    kv_len_t = kv_lens[tok_seq]
    # Absolute position of each query token within its sequence.
    q_abs = kv_len_t - q_len + (tok - q_start)

    # Gather each sequence's full (padded) KV: [S, max_kv_len, K, D].
    pages = kv_pages[page_indices]  # [S, pages_per_seq, page_size, 2K, D]
    k_cache = pages[:, :, :, 0::2, :]
    v_cache = pages[:, :, :, 1::2, :]
    k = k_cache.reshape(S, max_kv_len, num_kv_heads, head_dim)
    v = v_cache.reshape(S, max_kv_len, num_kv_heads, head_dim)
    if k_scale is not None:
        k = (k.astype(jnp.float32) * k_scale).astype(q.dtype)
    else:
        k = k.astype(q.dtype)
    if v_scale is not None:
        v = (v.astype(jnp.float32) * v_scale).astype(q.dtype)
    else:
        v = v.astype(q.dtype)

    # Per-token KV: [T, max_kv_len, K, D].
    k_t = k[tok_seq]
    v_t = v[tok_seq]

    # Scores: [T, Hq, max_kv_len].
    qf = q.astype(jnp.float32) * sm_scale
    kf = k_t.astype(jnp.float32)
    # GQA: repeat kv heads across query head groups.
    kf = jnp.repeat(kf, q_per_kv, axis=2)  # [T, L, Hq, D]
    scores = jnp.einsum("thd,tlhd->thl", qf, kf)
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)

    kv_pos = jnp.arange(max_kv_len, dtype=jnp.int32)[None, None, :]
    if alibi_slopes is not None:
        # ALiBi: per-head linear distance bias slope*(j - i), j <= i
        # (reference attention/ops/paged_attn.py alibi path; shift-
        # equivalent to HF Bloom's slope*j form under softmax).
        rel = (kv_pos - q_abs[:, None, None]).astype(jnp.float32)
        scores = scores + alibi_slopes[None, :, None] * rel
    mask = kv_pos <= q_abs[:, None, None]
    mask &= kv_pos < kv_len_t[:, None, None]
    if sliding_window is not None:
        mask &= kv_pos > (q_abs[:, None, None] - sliding_window)
    if blocksparse is not None:
        bsz, local_blocks, vert_stride = blocksparse
        bq_blk = q_abs // bsz  # [T]
        bk_blk = jnp.arange(max_kv_len, dtype=jnp.int32) // bsz
        local_ok = (bq_blk[:, None, None]
                    - bk_blk[None, None, :]) < local_blocks
        vert_ok = ((bk_blk[None, :] + bs_head_offsets[:, None] + 1)
                   % vert_stride) == 0  # [Hq, max_kv]
        sparse_ok = local_ok | vert_ok[None]
        if bs_on is not None:
            sparse_ok = sparse_ok | jnp.logical_not(bs_on)
        mask = mask & sparse_ok
    scores = jnp.where(mask, scores, DEFAULT_MASK_VALUE)

    probs = jax.nn.softmax(scores, axis=-1)
    vf = jnp.repeat(v_t.astype(jnp.float32), q_per_kv, axis=2)
    out = jnp.einsum("thl,tlhd->thd", probs, vf)
    return out.astype(q.dtype)


def ragged_paged_attention(
    q: jax.Array,
    kv_pages: jax.Array,
    kv_lens: jax.Array,
    page_indices: jax.Array,
    cu_q_lens: jax.Array,
    num_seqs: jax.Array,
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    blocksparse: Optional[tuple] = None,
    bs_head_offsets: Optional[jax.Array] = None,
    bs_on: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    use_kernel: Optional[bool] = None,
    kv_replicated: bool = False,
) -> jax.Array:
    """Dispatching wrapper: Pallas kernel on TPU, jnp reference elsewhere.

    Dispatch is a *trace-time* decision (this op is called from inside a
    jitted step program): `use_kernel=None` selects the Pallas kernel iff
    the default backend is a TPU.

    When a mesh is provided, the op runs under shard_map with q/kv sharded
    over the "model" axis on the head dimensions (no collectives needed:
    attention is head-parallel).
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() in ("tpu", "axon")

    # cu_q_lens=None marks a pure-decode batch (q_len == 1 per row, set
    # by the fused multi-step runner): route to the grouped decode
    # kernel, which amortizes per-sequence overhead across sequence
    # groups and supports ALiBi natively (ops/decode_attention.py).
    decode_mode = cu_q_lens is None
    if decode_mode:
        cu_q_lens = jnp.arange(q.shape[0] + 1, dtype=jnp.int32)
    import os
    # Blocksparse (Phi-3-Small): the grouped decode kernel takes the
    # local+vertical mask natively and SKIPS the DMA of dead pages
    # (page-aligned sparsity -> ~vert_stride-fold less KV traffic past
    # the local window). The mask math is lane-layout-independent, so
    # int8/fp8 pages get it too (tests/test_decode_kernel_quant.py
    # blocksparse_quant oracle). Needs block_size % page_size == 0.
    # Prefill blocksparse runs through the vendored ragged kernel's
    # mask input (ops/rpa_alibi_kernel.py fork; mask-only — dead-page
    # DMA skipping is a decode-kernel property).
    bs_decode_ok = (blocksparse is None or (
        decode_mode and bs_head_offsets is not None
        and blocksparse[0] % kv_pages.shape[1] == 0))
    use_decode_kernel = (
        use_kernel and decode_mode and k_scale is None and v_scale is None
        and bs_decode_ok
        and decode_supports(q, kv_pages, page_indices)
        and os.environ.get("APHRODITE_DECODE_KERNEL", "1") != "0")
    if (blocksparse is not None and not use_decode_kernel
            and bs_head_offsets is None):
        use_kernel = False  # no head phases: only the jnp path masks

    if use_kernel and not use_decode_kernel and alibi_slopes is not None \
            and os.environ.get("APHRODITE_ALIBI_KERNEL", "1") == "0":
        # Escape hatch: force ALiBi prefill onto the jnp path instead of
        # the vendored biased kernel (ops/rpa_alibi_kernel.py).
        use_kernel = False
    if use_kernel and not _kernel_supports(q, kv_pages):
        # The Pallas kernel has alignment requirements (e.g. head_dim
        # tiling); tiny test models fall back to the jnp reference.
        use_kernel = False

    if use_decode_kernel:
        def impl(q_, kv_, kl_, pi_, cq_, ns_, *, sm_scale, sliding_window,
                 soft_cap, k_scale, v_scale, alibi_slopes=None,
                 blocksparse=None, bs_head_offsets=None, bs_on=None):
            del cq_, k_scale, v_scale
            return paged_decode_attention(
                q_, kv_, kl_, pi_, ns_, sm_scale=sm_scale,
                sliding_window=sliding_window, soft_cap=soft_cap,
                alibi_slopes=alibi_slopes, blocksparse=blocksparse,
                bs_head_offsets=bs_head_offsets, bs_on=bs_on)
    else:
        impl = (_kernel_attention if use_kernel
                else ref_ragged_paged_attention)

    kwargs = dict(sm_scale=sm_scale, sliding_window=sliding_window,
                  soft_cap=soft_cap, k_scale=k_scale, v_scale=v_scale)
    if alibi_slopes is not None:
        kwargs["alibi_slopes"] = alibi_slopes
    if blocksparse is not None:
        kwargs.update(blocksparse=blocksparse, bs_on=bs_on)

    if mesh is None:
        if blocksparse is not None:
            kwargs["bs_head_offsets"] = bs_head_offsets
        return impl(q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
                    **kwargs)

    if blocksparse is not None:
        # The head-phase offsets shard with the query heads (global
        # head indices stay correct because each shard receives its own
        # slice of the precomputed per-head offsets); the per-layer
        # gate is replicated.
        base_kwargs = {k: v for k, v in kwargs.items() if k != "bs_on"}
        if bs_on is None:
            bs_on = jnp.asarray(True)
        bs_impl = impl
        fn = jax.shard_map(
            lambda q_, kv_, kl_, pi_, cq_, ns_, off_, on_:
            bs_impl(
                q_, kv_, kl_, pi_, cq_, ns_,
                **{**base_kwargs, "bs_head_offsets": off_, "bs_on": on_}),
            mesh=_smap_mesh(mesh),
            in_specs=(
                P(None, "model", None),
                P(None, None, "model", None),
                P(), P(), P(), P(),
                P("model"), P(),
            ),
            out_specs=P(None, "model", None),
            axis_names={"model"},
            check_vma=False,
        )
        return fn(q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
                  bs_head_offsets, bs_on)

    if alibi_slopes is not None:
        # Slopes shard with the query heads.
        alibi_impl = impl
        fn = jax.shard_map(
            lambda q_, kv_, kl_, pi_, cq_, ns_, sl_: alibi_impl(
                q_, kv_, kl_, pi_, cq_, ns_, **{**kwargs,
                                                "alibi_slopes": sl_}),
            mesh=_smap_mesh(mesh),
            in_specs=(
                P(None, "model", None),
                P(None, None, "model", None),
                P(), P(), P(), P(),
                P("model"),
            ),
            out_specs=P(None, "model", None),
            axis_names={"model"},
            check_vma=False,
        )
        return fn(q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
                  alibi_slopes)

    fn = jax.shard_map(
        functools.partial(impl, **kwargs),
        mesh=_smap_mesh(mesh),
        in_specs=(
            P(None, "model", None),  # q: heads sharded
            # kv_pages: kv heads sharded, or replicated for MQA-style
            # caches with fewer kv heads than shards (MLA latent mode:
            # ONE shared latent "head" serves all query heads).
            P(None, None, "model", None) if not kv_replicated else P(),
            P(), P(), P(), P(),
        ),
        out_specs=P(None, "model", None),
        axis_names={"model"},
        check_vma=False,
    )
    return fn(q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs)


def _kernel_supports(q, kv_pages) -> bool:
    """Static shape gate for the Pallas kernel (alignment constraints)."""
    head_dim = q.shape[-1]
    page_size = kv_pages.shape[1]
    # MXU/VPU lane alignment: head_dim and page-size tiles must fit the
    # (sublane, 128)-lane layout; small test shapes use the reference impl.
    return head_dim % 128 == 0 or (head_dim in (64, 96, 128, 256)
                                   and page_size % 8 == 0)


def _kernel_attention(q, kv_pages, kv_lens, page_indices, cu_q_lens,
                      num_seqs, *, sm_scale, sliding_window, soft_cap,
                      k_scale, v_scale, alibi_slopes=None,
                      blocksparse=None, bs_head_offsets=None, bs_on=None):
    """TPU Pallas path (the JAX-bundled ragged paged attention kernel).

    Block sizes must be chosen explicitly: the kernel's internal default
    takes the whole token batch as one q block, which blows the 16 MB
    VMEM budget on v5e for T >= 2k (observed: bf16[2048,16,128] q block
    = 16.8 MB). Use the kernel's own tuned-table lookup, which caps
    blocks at VMEM-safe sizes.
    """
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        get_tuned_block_sizes, ragged_paged_attention as rpa_kernel)

    T, num_q_heads, head_dim = q.shape
    num_pages, page_size, num_combined, _ = kv_pages.shape
    pages_per_seq = page_indices.shape[1]
    if T <= 128:
        # Decode buckets (q_len=1 per seq): the kernel's cost is
        # dominated by per-(seq, kv-block) grid-iteration overhead
        # (~1.4us + ~0.07us/page DMA issue, measured on v5e via
        # tools/probe_attn_in_scan.py), not by flops. Small q blocks
        # and a moderate kv block more than halve the per-call cost vs
        # the tuned table's prefill-oriented (128, 32):
        # 0.39 -> 0.145 ms/call at S=64, kv~160, 16 combined heads.
        bkv, bq = min(pages_per_seq, 16), min(T, 8)
    else:
        try:
            bkv, bq = get_tuned_block_sizes(
                q.dtype, kv_pages.dtype, num_q_heads, num_combined // 2,
                head_dim, page_size, T, pages_per_seq)
        except Exception:
            bkv, bq = min(pages_per_seq, 128), min(T, 32)
    # Clamp the KV block so the kernel's double-buffered KV scratch
    # (2 x bkv x page_size x combined_heads x head_dim) stays within
    # ~8 MB of the 16 MB v5e VMEM (the tuned table assumes fewer
    # combined heads per block than small-GQA models have; observed
    # 16.79 MB scoped-vmem OOM at bkv=128 with 16 combined heads).
    kv_item = jnp.dtype(kv_pages.dtype).itemsize
    per_page_bytes = 2 * page_size * num_combined * head_dim * kv_item
    max_bkv = max(1, (8 * 1024 * 1024) // per_page_bytes)
    bkv = max(1, min(bkv, max_bkv))
    bq = min(bq, T)

    fp8_kv = kv_pages.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)
    if (alibi_slopes is not None or blocksparse is not None
            or (fp8_kv and q.dtype == jnp.bfloat16)):
        # Our vendored fork. Two reasons to take it over the bundled
        # kernel: (a) the in-loop ALiBi distance bias (the bundled kernel
        # has no bias input; numerics match the jnp oracle to 1e-7,
        # tests/test_alibi_kernel.py), and (b) fast bit-placement
        # fp8->bf16 conversion — the bundled kernel leaves fp8 K/V for
        # implicit convert_element_type, which v5e emulates with a long
        # scalar sequence (measured 1.5-2x on whole prefill steps).
        from aphrodite_tpu.ops.rpa_alibi_kernel import (
            ragged_paged_attention_alibi)

        return ragged_paged_attention_alibi(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            alibi_slopes,
            sm_scale=sm_scale, sliding_window=sliding_window,
            soft_cap=soft_cap, k_scale=k_scale, v_scale=v_scale,
            num_kv_pages_per_block=bkv, num_queries_per_block=bq,
            blocksparse=blocksparse, bs_head_offsets=bs_head_offsets,
            bs_on=bs_on,
            # The default 16M scoped-vmem cap overflows at production
            # head counts (observed: bf16[2048, 32, 128] q/out block =
            # 16.8M at the 8B shape); v5e has 128M physical VMEM.
            vmem_limit_bytes=64 * 1024 * 1024)
    return rpa_kernel(
        q,
        kv_pages,
        kv_lens,
        page_indices,
        cu_q_lens,
        num_seqs,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        num_kv_pages_per_block=bkv,
        num_queries_per_block=bq,
        vmem_limit_bytes=64 * 1024 * 1024,
    )
