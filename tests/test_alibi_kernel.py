"""ALiBi ragged-kernel fork vs the jnp oracle (interpret mode).

The vendored kernel (ops/rpa_alibi_kernel.py) runs under the Pallas
interpreter on CPU so the distance-bias math, the per-heads-block
slopes BlockSpec, and the GQA slope layout are validated without a
chip; tools/tpu_kernel_smoke.py re-validates compiled on hardware."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    import aphrodite_tpu.ops.rpa_alibi_kernel as K

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(K.pl, "pallas_call", patched)


def _run(seed, T, Hq, Hkv, D, kv_lens, cu, slopes, window=None,
         cap=None):
    import jax.numpy as jnp

    from aphrodite_tpu.ops.attention import ref_ragged_paged_attention
    from aphrodite_tpu.ops.rpa_alibi_kernel import (
        ragged_paged_attention_alibi)

    rng = np.random.default_rng(seed)
    S = len(kv_lens)
    PS = 16
    pages_per_seq = 6
    P = S * pages_per_seq + 2
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.float32) * 0.3
    kv = jnp.asarray(
        rng.standard_normal((P, PS, 2 * Hkv, D)), jnp.float32) * 0.3
    kvl = jnp.asarray(kv_lens, jnp.int32)
    pi = jnp.arange(S * pages_per_seq,
                    dtype=jnp.int32).reshape(S, pages_per_seq)
    cu = jnp.asarray(cu, jnp.int32)
    ns = jnp.asarray([S], jnp.int32)
    sl = jnp.asarray(slopes, jnp.float32)
    out = ragged_paged_attention_alibi(
        q, kv, kvl, pi, cu, ns, sl, sm_scale=0.25,
        sliding_window=window, soft_cap=cap,
        num_kv_pages_per_block=2, num_queries_per_block=8)
    ref = ref_ragged_paged_attention(
        q, kv, kvl, pi, cu, ns, sm_scale=0.25, sliding_window=window,
        soft_cap=cap, alibi_slopes=sl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_alibi_kernel_mixed_prefill_decode():
    # 3 seqs: decode (q=1), chunked prefill (q=15), full prefill (q=8).
    _run(0, T=24, Hq=4, Hkv=2, D=128,
         kv_lens=[10, 37, 8], cu=[0, 1, 16, 24],
         slopes=[0.5, 0.25, 0.125, 0.0625])


@pytest.mark.skip(reason="the BUNDLED kernel (unmodified) already "
                  "miscomputes multi-heads-block grids under the "
                  "Pallas interpreter (verified: identical per-head "
                  "errors with no ALiBi at all); the case runs "
                  "compiled on hardware via tools/tpu_kernel_smoke.py")
def test_alibi_kernel_multiple_head_blocks():
    # 16 q heads over 8 kv heads splits into 2 heads blocks (f32
    # min-tiling) — exercises the per-block slopes BlockSpec.
    _run(1, T=16, Hq=16, Hkv=8, D=128,
         kv_lens=[20, 33], cu=[0, 8, 16],
         slopes=(0.5 ** np.arange(1, 17)).tolist())


def test_alibi_kernel_with_window_and_cap():
    _run(2, T=16, Hq=4, Hkv=2, D=128,
         kv_lens=[30, 25], cu=[0, 8, 16],
         slopes=[0.9, 0.5, 0.3, 0.1], window=16, cap=30.0)


@pytest.mark.parametrize("fp8_dtype", ["float8_e4m3fn", "float8_e5m2"])
def test_fork_fp8_kv_no_alibi(fp8_dtype):
    """The fork also serves as the fast-fp8 prefill kernel (bit-placement
    fp8->bf16 with optional fused dequant scale; alibi_slopes=None skips
    all bias arithmetic)."""
    import jax.numpy as jnp

    from aphrodite_tpu.ops.attention import ref_ragged_paged_attention
    from aphrodite_tpu.ops.rpa_alibi_kernel import (
        ragged_paged_attention_alibi)

    rng = np.random.default_rng(5)
    T, Hq, Hkv, D, PS, pages_per_seq, S = 24, 4, 2, 128, 16, 6, 3
    P = S * pages_per_seq + 2
    dt = jnp.dtype(fp8_dtype)
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.bfloat16) * 0.3
    kv = (jnp.asarray(rng.standard_normal((P, PS, 2 * Hkv, D)),
                      jnp.float32) * 0.3).astype(dt)
    kvl = jnp.asarray([10, 37, 8], jnp.int32)
    pi = jnp.arange(S * pages_per_seq,
                    dtype=jnp.int32).reshape(S, pages_per_seq)
    cu = jnp.asarray([0, 1, 16, 24], jnp.int32)
    ns = jnp.asarray([S], jnp.int32)
    for scale in (None, 1.5):
        out = ragged_paged_attention_alibi(
            q, kv, kvl, pi, cu, ns, None, sm_scale=0.25,
            k_scale=scale, v_scale=scale,
            num_kv_pages_per_block=2, num_queries_per_block=8)
        ref = ref_ragged_paged_attention(
            q, kv, kvl, pi, cu, ns, sm_scale=0.25,
            k_scale=scale, v_scale=scale)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=3e-2, atol=3e-2)


def test_blocksparse_prefill_kernel_matches_oracle():
    """Blocksparse mask in the vendored ragged PREFILL kernel (fork):
    local+vertical pattern with per-head phases must match the jnp
    oracle on a mixed prefill/decode batch, and the gate-off path must
    equal dense."""
    import jax.numpy as jnp

    from aphrodite_tpu.ops.attention import ref_ragged_paged_attention
    from aphrodite_tpu.ops.rpa_alibi_kernel import (
        ragged_paged_attention_alibi)

    rng = np.random.default_rng(3)
    S, PS, pages_per_seq, Hq, Hkv, D = 3, 16, 16, 4, 2, 128
    P = S * pages_per_seq + 2
    kv_lens = [200, 37, 150]
    cu = [0, 1, 16, 24]  # decode + chunked prefill + prefill
    T = cu[-1]
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.float32) * 0.3
    kv = jnp.asarray(
        rng.standard_normal((P, PS, 2 * Hkv, D)), jnp.float32) * 0.3
    kvl = jnp.asarray(kv_lens, jnp.int32)
    pi = jnp.arange(S * pages_per_seq,
                    dtype=jnp.int32).reshape(S, pages_per_seq)
    cu_j = jnp.asarray(cu, jnp.int32)
    ns = jnp.asarray([S], jnp.int32)
    bs = (32, 1, 4)
    offs = jnp.asarray(rng.integers(0, 4, size=Hq), jnp.int32)
    out = ragged_paged_attention_alibi(
        q, kv, kvl, pi, cu_j, ns, None, sm_scale=0.25,
        num_kv_pages_per_block=2, num_queries_per_block=8,
        blocksparse=bs, bs_head_offsets=offs, bs_on=jnp.asarray(True))
    ref = ref_ragged_paged_attention(
        q, kv, kvl, pi, cu_j, ns, sm_scale=0.25, blocksparse=bs,
        bs_head_offsets=offs, bs_on=jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # Gate off == dense.
    out_off = ragged_paged_attention_alibi(
        q, kv, kvl, pi, cu_j, ns, None, sm_scale=0.25,
        num_kv_pages_per_block=2, num_queries_per_block=8,
        blocksparse=bs, bs_head_offsets=offs, bs_on=jnp.asarray(False))
    dense = ragged_paged_attention_alibi(
        q, kv, kvl, pi, cu_j, ns, None, sm_scale=0.25,
        num_kv_pages_per_block=2, num_queries_per_block=8)
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(dense),
                               rtol=1e-6, atol=1e-6)
