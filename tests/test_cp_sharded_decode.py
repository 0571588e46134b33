"""Context-parallel decode over SHARDED KV pages (beyond-reference:
contexts larger than one chip's HBM). Validates the flash-partial
merge math, the kernel's return_stats/-1-sentinel mode (interpret),
and cp=2 == cp=1 token-level equality on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphrodite_tpu.ops import decode_attention as da

RNG = np.random.default_rng(3)

S, QH, KV, D, PS = 8, 8, 4, 128, 16
SCALE = D ** -0.5


def _mk(num_pages=64, pps=8, kv_max=100):
    q = jnp.asarray(RNG.standard_normal((S, QH, D)), jnp.bfloat16)
    pages = jnp.asarray(RNG.standard_normal(
        (num_pages, PS, 2 * KV, D)) * 0.3, jnp.bfloat16)
    kv_lens = jnp.asarray(
        RNG.integers(1, kv_max, size=(S,)), jnp.int32)
    pi = np.zeros((S, pps), np.int32)
    for i in range(S):
        used = -(-int(kv_lens[i]) // PS)
        pi[i, :used] = RNG.choice(num_pages - 1, size=used,
                                  replace=False)
    return q, pages, kv_lens, jnp.asarray(pi)


def _full_ref(q, pages, kv_lens, pi):
    acc, m, l = da._partial_decode_ref(q, pages, kv_lens, pi,
                                       sm_scale=SCALE)
    l_safe = jnp.where(l == 0, 1.0, l)
    return (acc / l_safe).astype(jnp.float32)


def test_partial_merge_identity_single_shard():
    """All pages local -> merged output equals plain normalization."""
    q, pages, kv_lens, pi = _mk()
    acc, m, l = da._partial_decode_ref(q, pages, kv_lens, pi,
                                       sm_scale=SCALE)
    w = jnp.exp(m - m)
    out = (w * acc) / jnp.where(l == 0, 1.0, w * l)
    np.testing.assert_allclose(out, _full_ref(q, pages, kv_lens, pi),
                               rtol=1e-5, atol=1e-5)


def test_two_way_split_merge_equals_full():
    """Hand-split pages into two halves, merge partials -> full."""
    q, pages, kv_lens, pi = _mk()
    npg = pages.shape[0]
    half = npg // 2
    lo_idx = jnp.where(pi < half, pi, -1)
    hi_idx = jnp.where(pi >= half, pi - half, -1)
    a0, m0, l0 = da._partial_decode_ref(q, pages[:half], kv_lens,
                                        lo_idx, sm_scale=SCALE)
    a1, m1, l1 = da._partial_decode_ref(q, pages[half:], kv_lens,
                                        hi_idx, sm_scale=SCALE)
    m_star = jnp.maximum(m0, m1)
    w0 = jnp.exp(m0 - m_star)
    w1 = jnp.exp(m1 - m_star)
    l_tot = w0 * l0 + w1 * l1
    out = (w0 * a0 + w1 * a1) / jnp.where(l_tot == 0, 1.0, l_tot)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_full_ref(q, pages, kv_lens,
                                                    pi)),
                               rtol=1e-4, atol=1e-4)


def test_kernel_stats_mode_matches_ref_interpret():
    """The Pallas return_stats/-1-sentinel path (interpret mode on CPU)
    reproduces the jnp partial reference."""
    q, pages, kv_lens, pi = _mk()
    half = pages.shape[0] // 2
    lo_idx = jnp.where(pi < half, pi, -1)
    acc, stats = da.paged_decode_attention(
        q, pages[:half], kv_lens, lo_idx,
        jnp.asarray([S], jnp.int32), sm_scale=SCALE,
        return_stats=True, interpret=True)
    ra, rm, rl = da._partial_decode_ref(q, pages[:half], kv_lens,
                                        lo_idx, sm_scale=SCALE)
    # Live rows (some local pages): kernel partials match the jnp ref
    # to bf16 score precision (the kernel pre-rounds q*sm_scale to
    # bf16). Dead rows differ in REPRESENTATION (kernel m is the
    # finite MASK_VALUE, ref clamps -inf to -3e38) but both merge to
    # weight 0 — checked via the merged output below.
    live = np.asarray(rl)[:, :, 0] > 0
    m_k = np.asarray(stats[..., 0:1])
    l_k = np.asarray(stats[..., 1:2])
    np.testing.assert_allclose(m_k[live], np.asarray(rm)[live],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(l_k[live], np.asarray(rl)[live],
                               rtol=5e-2, atol=5e-2)
    # Single-shard normalized output: acc / l == the kernel's own
    # normal-mode semantics.
    l_safe = np.where(l_k == 0, 1.0, l_k)
    out_k = np.asarray(acc) / l_safe
    rl_safe = np.where(np.asarray(rl) == 0, 1.0, np.asarray(rl))
    out_r = np.asarray(ra) / rl_safe
    np.testing.assert_allclose(out_k[live], out_r[live],
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("cp", [2, 4])
def test_sharded_cp_matches_full_on_virtual_mesh(cp):
    """shard_map over a cp-axis mesh with pages SHARDED on the page
    dim: merged output equals the single-device full computation."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:cp]
    if len(devs) < cp:
        pytest.skip(f"needs {cp} devices")
    num_pages = 64
    assert num_pages % cp == 0
    per_shard = num_pages // cp
    q, pages, kv_lens, pi = _mk(num_pages=num_pages)
    mesh = Mesh(np.array(devs), ("cp",))

    def shard_fn(q, pages_local, kv_lens, pi):
        return da.paged_decode_attention_sharded(
            q, pages_local, kv_lens, pi,
            jnp.asarray([S], jnp.int32), axis_name="cp",
            pages_per_shard=per_shard, sm_scale=SCALE,
            use_kernel=False)

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("cp"), P(), P()),
        out_specs=P(),
        check_vma=False,
    ))
    pages_sh = jax.device_put(pages, NamedSharding(mesh, P("cp")))
    out = np.asarray(fn(q, pages_sh, kv_lens, pi), np.float32)
    want = np.asarray(_full_ref(q, pages, kv_lens, pi))
    np.testing.assert_allclose(out, want, rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# Prefill (ragged) over sharded KV: partials + merge == full causal
# attention; cp=2 on the virtual mesh.
# ---------------------------------------------------------------------------


def _full_ragged_ref(q, pages, kv_lens, pi, cu):
    acc, m, l = da._partial_ragged_ref(q, pages, kv_lens, pi, cu,
                                       sm_scale=SCALE)
    return (acc / jnp.where(l == 0, 1.0, l)).astype(jnp.float32)


def _mk_ragged(num_pages=64, pps=8):
    # Two sequences with q_len 10/22, prefixes 30/5 (kv spans pages).
    q_lens = [10, 22]
    prefixes = [30, 5]
    T = sum(q_lens)
    q = jnp.asarray(RNG.standard_normal((T, QH, D)), jnp.bfloat16)
    pages = jnp.asarray(RNG.standard_normal(
        (num_pages, PS, 2 * KV, D)) * 0.3, jnp.bfloat16)
    kv_lens = jnp.asarray([p + ql for p, ql in zip(prefixes, q_lens)],
                          jnp.int32)
    pi = np.zeros((2, pps), np.int32)
    for i in range(2):
        used = -(-int(kv_lens[i]) // PS)
        pi[i, :used] = RNG.choice(num_pages - 1, size=used,
                                  replace=False)
    cu = jnp.asarray([0, q_lens[0], T], jnp.int32)
    return q, pages, kv_lens, jnp.asarray(pi), cu


def test_ragged_two_way_split_merge_equals_full():
    q, pages, kv_lens, pi, cu = _mk_ragged()
    npg = pages.shape[0]
    half = npg // 2
    lo_idx = jnp.where(pi < half, pi, -1)
    hi_idx = jnp.where(pi >= half, pi - half, -1)
    a0, m0, l0 = da._partial_ragged_ref(q, pages[:half], kv_lens,
                                        lo_idx, cu, sm_scale=SCALE)
    a1, m1, l1 = da._partial_ragged_ref(q, pages[half:], kv_lens,
                                        hi_idx, cu, sm_scale=SCALE)
    out = da.merge_attention_partials(
        jnp.stack([a0, a1]), jnp.stack([m0, m1]), jnp.stack([l0, l1]),
        jnp.float32)
    want = _full_ragged_ref(q, pages, kv_lens, pi, cu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ragged_causality():
    """Row i must not see positions >= kv_len - q_len + i + 1: zeroing
    the 'future' KV slots must not change the output."""
    q, pages, kv_lens, pi, cu = _mk_ragged()
    out1 = _full_ragged_ref(q, pages, kv_lens, pi, cu)
    # Clobber the KV of the LAST position of seq 0 (only its own last
    # query row may attend it).
    last_page = int(pi[0, (int(kv_lens[0]) - 1) // PS])
    slot = (int(kv_lens[0]) - 1) % PS
    pages2 = pages.at[last_page, slot].set(99.0)
    out2 = _full_ragged_ref(q, pages2, kv_lens, pi, cu)
    r0_end = int(cu[1])
    # All rows of seq 0 except the last are unchanged.
    np.testing.assert_allclose(np.asarray(out1[:r0_end - 1]),
                               np.asarray(out2[:r0_end - 1]),
                               rtol=1e-5, atol=1e-5)
    # The last row IS affected (it attends the clobbered position).
    assert np.abs(np.asarray(out1[r0_end - 1])
                  - np.asarray(out2[r0_end - 1])).max() > 1e-3


@pytest.mark.parametrize("cp", [2])
def test_ragged_sharded_cp_matches_full_on_virtual_mesh(cp):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:cp]
    if len(devs) < cp:
        pytest.skip(f"needs {cp} devices")
    num_pages = 64
    per_shard = num_pages // cp
    q, pages, kv_lens, pi, cu = _mk_ragged(num_pages=num_pages)
    mesh = Mesh(np.array(devs), ("cp",))

    def shard_fn(q, pages_local, kv_lens, pi, cu):
        return da.ragged_paged_attention_sharded(
            q, pages_local, kv_lens, pi, cu,
            jnp.asarray([2], jnp.int32), axis_name="cp",
            pages_per_shard=per_shard, sm_scale=SCALE)

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("cp"), P(), P(), P()),
        out_specs=P(), check_vma=False))
    pages_sh = jax.device_put(pages, NamedSharding(mesh, P("cp")))
    out = np.asarray(fn(q, pages_sh, kv_lens, pi, cu), np.float32)
    want = np.asarray(_full_ragged_ref(q, pages, kv_lens, pi, cu))
    np.testing.assert_allclose(out, want, rtol=1e-2, atol=1e-2)
