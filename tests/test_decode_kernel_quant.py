"""Grouped decode kernel over quantized KV pages (interpret mode).

Round-1 verdict item: int8/fp8 KV decode used to fall back to the slower
bundled ragged kernel (ops/decode_attention.py gated on bf16 pages). The
grouped kernel now DMAs 8-bit pages raw (half the HBM traffic) and
converts in-register. Scales never enter the kernel — models fold
k_scale into q and v_scale into the output (models/llama.py layer_fn) —
so numerics here compare raw quantized pages against the jnp oracle.

Reference capability: kernels/attention/attention_kernels.cu fp8/int8
variants + kernels/quantization/int8_kvcache/quant_utils.cuh.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphrodite_tpu.ops.attention import ref_ragged_paged_attention
from aphrodite_tpu.ops.decode_attention import (paged_decode_attention,
                                                supports)


def _mk_batch(rng, S, pages_per_seq, page_size, KVH, QH, D):
    num_pages = S * pages_per_seq + 1
    kv = jnp.asarray(
        rng.standard_normal((num_pages, page_size, 2 * KVH, D)) * 0.3,
        jnp.bfloat16)
    kv_lens = np.zeros((S,), np.int32)
    pi = np.zeros((S, pages_per_seq), np.int32)
    perm = rng.permutation(num_pages - 1) + 1
    j = 0
    for i in range(S):
        kv_lens[i] = int(rng.integers(1, pages_per_seq * page_size))
        npg = -(-int(kv_lens[i]) // page_size)
        pi[i, :npg] = perm[(j + np.arange(npg)) % len(perm)]
        j += npg
    q = jnp.asarray(rng.standard_normal((S, QH, D)) * 0.3, jnp.bfloat16)
    return (q, kv, jnp.asarray(kv_lens), jnp.asarray(pi),
            jnp.arange(S + 1, dtype=jnp.int32), jnp.asarray([S], jnp.int32))


def _cast_pages(kv, dtype):
    if dtype == jnp.int8:
        return jnp.clip(jnp.round(kv.astype(jnp.float32) * 80), -128,
                        127).astype(jnp.int8)
    return kv.astype(dtype)


@pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8,
                                      jnp.float8_e4m3fn, jnp.float8_e5m2])
def test_decode_kernel_quant_kv_matches_oracle(kv_dtype):
    rng = np.random.default_rng(7)
    q, kv, kvl, pij, cu, ns = _mk_batch(rng, 16, 8, 16, 2, 8, 128)
    kvq = _cast_pages(kv, kv_dtype)
    assert supports(q, kvq, pij)
    got = paged_decode_attention(q, kvq, kvl, pij, ns, sm_scale=0.125,
                                 interpret=True)
    want = ref_ragged_paged_attention(q, kvq, kvl, pij, cu, ns,
                                      sm_scale=0.125)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=0.01 * float(
                                   np.abs(np.asarray(want,
                                                     np.float32)).max()))


@pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8])
@pytest.mark.parametrize("feature", ["window", "softcap", "alibi"])
def test_decode_kernel_int8_kv_features(feature, kv_dtype):
    rng = np.random.default_rng(11)
    # KVH=1 exercises the odd-head lane split of the packed layout (and
    # the QG=4 per-head path for bf16).
    q, kv, kvl, pij, cu, ns = _mk_batch(rng, 8, 8, 16, 1, 4, 128)
    kvq = _cast_pages(kv, kv_dtype)
    kw = dict(window=dict(sliding_window=30),
              softcap=dict(soft_cap=30.0),
              alibi=dict(alibi_slopes=jnp.asarray(
                  rng.uniform(0.01, 0.5, 4), jnp.float32)))[feature]
    got = paged_decode_attention(q, kvq, kvl, pij, ns, sm_scale=0.125,
                                 interpret=True, **kw)
    want = ref_ragged_paged_attention(q, kvq, kvl, pij, cu, ns,
                                      sm_scale=0.125, **kw)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=0.01 * float(
                                   np.abs(np.asarray(want,
                                                     np.float32)).max()))


@pytest.mark.parametrize("homo", [True, False])
def test_decode_kernel_blocksparse_matches_oracle(homo):
    """Blocksparse (Phi-3-Small local+vertical) in the grouped decode
    kernel: the mask must match the jnp oracle exactly, and the skipped
    pages (dead blocks) must not poison anything (their DMAs never
    happen; slots are zero-filled)."""
    rng = np.random.default_rng(13)
    # page 16, sparse block 32 (page-aligned), 1 local block, stride 4.
    q, kv, kvl, pij, cu, ns = _mk_batch(rng, 8, 16, 16, 2, 8, 128)
    # long-ish seqs so the vertical pattern actually skips pages
    kvl = jnp.asarray(np.full(8, 200, np.int32))
    bs = (32, 1, 4)
    offs = (np.zeros(8, np.int64) if homo else
            rng.integers(0, 4, size=8))
    offs = jnp.asarray(offs, jnp.int32)
    got = paged_decode_attention(q, kv, kvl, pij, ns, sm_scale=0.125,
                                 blocksparse=bs, bs_head_offsets=offs,
                                 bs_on=jnp.asarray(True),
                                 interpret=True)
    want = ref_ragged_paged_attention(q, kv, kvl, pij, cu, ns,
                                      sm_scale=0.125, blocksparse=bs,
                                      bs_head_offsets=offs,
                                      bs_on=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=0.01 * float(
                                   np.abs(np.asarray(want,
                                                     np.float32)).max()))

    # Gate off: must equal the dense kernel result.
    got_off = paged_decode_attention(q, kv, kvl, pij, ns, sm_scale=0.125,
                                     blocksparse=bs, bs_head_offsets=offs,
                                     bs_on=jnp.asarray(False),
                                     interpret=True)
    want_dense = paged_decode_attention(q, kv, kvl, pij, ns,
                                        sm_scale=0.125, interpret=True)
    np.testing.assert_allclose(np.asarray(got_off, np.float32),
                               np.asarray(want_dense, np.float32),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("kv_dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_decode_kernel_blocksparse_quant_kv(kv_dtype):
    """Blocksparse x 8-bit KV (VERDICT r3 item 9): the mask math is
    lane-layout-independent (col_pos derives from each lane's logical
    column), so quantized pages get the same page-skip + mask as bf16.
    Phi-3-Small with int8/fp8 KV must not silently lose the sparsity."""
    rng = np.random.default_rng(17)
    q, kv, kvl, pij, cu, ns = _mk_batch(rng, 8, 16, 16, 2, 8, 128)
    kvl = jnp.asarray(np.full(8, 200, np.int32))
    kvq = _cast_pages(kv, kv_dtype)
    bs = (32, 1, 4)
    offs = jnp.asarray(rng.integers(0, 4, size=8), jnp.int32)
    got = paged_decode_attention(q, kvq, kvl, pij, ns, sm_scale=0.125,
                                 blocksparse=bs, bs_head_offsets=offs,
                                 bs_on=jnp.asarray(True),
                                 interpret=True)
    want = ref_ragged_paged_attention(q, kvq, kvl, pij, cu, ns,
                                      sm_scale=0.125, blocksparse=bs,
                                      bs_head_offsets=offs,
                                      bs_on=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=0.01 * float(
                                   np.abs(np.asarray(want,
                                                     np.float32)).max()))


def test_decode_kernel_t5_rel_bias_matches_oracle():
    """T5 relative-bucket bias input (models/t5.py decode fast path):
    kernel scores must equal dense attention + table[bucket] bias."""
    import math as _math

    rng = np.random.default_rng(17)
    S, KVH, QH, D, page, pps = 8, 2, 4, 64, 16, 8
    NB, MAXD = 32, 128
    q, kv, kvl, pij, cu, ns = _mk_batch(rng, S, pps, page, KVH, QH, D)
    bias_table = jnp.asarray(rng.standard_normal((QH, NB)) * 0.5,
                             jnp.float32)

    got = paged_decode_attention(q, kv, kvl, pij, ns, sm_scale=1.0,
                                 rel_bias=bias_table,
                                 rel_bias_meta=(NB, MAXD),
                                 interpret=True)

    # jnp oracle: dense per-seq attention with the same bucket bias.
    def bucket_of(n):
        max_exact = NB // 2
        val = max_exact + (np.log(np.maximum(n, 1) / max_exact)
                           / _math.log(MAXD / max_exact)
                           * (NB - max_exact)).astype(np.int64)
        val = np.minimum(val, NB - 1)
        return np.where(n < max_exact, n, val)

    kvn = np.asarray(kv, np.float32)
    qn = np.asarray(q, np.float32)
    out = np.zeros((S, QH, D), np.float32)
    for i in range(S):
        L = int(kvl[i])
        toks = []
        for t in range(L):
            pg, off = divmod(t, page)
            toks.append(kvn[int(pij[i, pg]), off])
        toks = np.stack(toks)  # [L, 2*KVH, D]
        for h in range(QH):
            kvh = h // (QH // KVH)
            k = toks[:, 2 * kvh]
            v = toks[:, 2 * kvh + 1]
            n = (L - 1) - np.arange(L)
            b = bucket_of(n)
            scores = qn[i, h] @ k.T + np.asarray(bias_table)[h][b]
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[i, h] = p @ v
    np.testing.assert_allclose(np.asarray(got, np.float32), out,
                               rtol=0, atol=0.02 * np.abs(out).max())
