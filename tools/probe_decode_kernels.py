"""In-context A/B probe: ragged kernel vs grouped decode kernel.

Replicates the runner's fused-decode context (nested scans, flat [L*P]
carried+donated cache, write_kv then kernel read per layer) and times
one decode step for each attention implementation across page sizes.

Env knobs: PROBE_S (batch, default 128), PROBE_PAGE (page size list,
default "16 32 64"), PROBE_KV (kv len, default 192), PROBE_IMPL
(comma list: ragged,grouped; default both).

Usage: timeout 590 python tools/probe_decode_kernels.py
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

NH, NKV, D = 16, 8, 128
L = 24
S = int(os.environ.get("PROBE_S", "128"))
KV_LEN = int(os.environ.get("PROBE_KV", "192"))
STEPS = 8


def run(tag, impl, page):
    from aphrodite_tpu.ops.kv_cache import write_kv

    pps = 2048 // page
    P = 2048 * 16 // page + 1

    rng = np.random.default_rng(0)
    kv = jnp.zeros((L * P, page, 2 * NKV, D), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((S, NH, D)), jnp.bfloat16)
    kv_lens = jnp.full((S,), KV_LEN, jnp.int32)
    pi = np.zeros((S, pps), np.int32)
    used = KV_LEN // page + 1
    for i in range(S):
        pi[i, :used] = (i * used + np.arange(used)) % (P - 1)
    page_indices = jnp.asarray(pi)
    cu = jnp.arange(S + 1, dtype=jnp.int32)
    ns = jnp.asarray([S], jnp.int32)
    slot_base = jnp.asarray(pi[:, used - 1] * page + KV_LEN % page,
                            jnp.int32)
    new_k = jnp.zeros((S, NKV, D), jnp.bfloat16)
    new_v = jnp.zeros((S, NKV, D), jnp.bfloat16)

    if impl == "ragged":
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention as rpa)

        # The runner's decode-tuned config: 256-token kv blocks, bq=8
        # (attention.py: bkv = min(pages_per_seq, 16) at page 16).
        kernel = functools.partial(rpa, sm_scale=D ** -0.5,
                                   num_kv_pages_per_block=max(
                                       1, 256 // page),
                                   num_queries_per_block=8)

        def attn(q, kv, pidx):
            return kernel(q, kv, kv_lens, pidx, cu, ns)
    else:
        from aphrodite_tpu.ops.decode_attention import paged_decode_attention

        def attn(q, kv, pidx):
            return paged_decode_attention(q, kv, kv_lens, pidx, ns,
                                          sm_scale=D ** -0.5)

    def prog(q, kv):
        def step(carry, _):
            acc, kv = carry

            def layer(carry2, lidx):
                acc, kv = carry2
                pidx = page_indices + lidx * P
                kv = write_kv(kv, new_k, new_v,
                              slot_base + lidx * P * page)
                out = attn(q, kv, pidx)
                return (acc + out.astype(jnp.float32), kv), None

            (acc, kv), _ = jax.lax.scan(
                layer, (acc, kv), jnp.arange(L, dtype=jnp.int32))
            return (acc, kv), acc[0, 0, 0]

        (acc, kv), outs = jax.lax.scan(
            step, (jnp.zeros((S, NH, D), jnp.float32), kv), None,
            length=STEPS)
        return acc, kv, outs

    fn = jax.jit(prog, donate_argnums=(1,))
    acc, kv, outs = fn(q, kv)
    jax.block_until_ready(outs)
    iters = 10
    t0 = time.monotonic()
    for _ in range(iters):
        acc, kv, outs = fn(q, kv)
    jax.block_until_ready(outs)
    dt = (time.monotonic() - t0) / iters / STEPS
    print(f"{tag:40s} {dt*1e3:8.3f} ms/step ({dt/L*1e3:6.4f} ms/call)",
          flush=True)


def main():
    pages = [int(x) for x in os.environ.get("PROBE_PAGE",
                                            "16 32 64").split()]
    impls = os.environ.get("PROBE_IMPL", "ragged,grouped").split(",")
    for page in pages:
        for impl in impls:
            run(f"S={S} kv={KV_LEN} page={page} {impl}", impl, page)


if __name__ == "__main__":
    main()
