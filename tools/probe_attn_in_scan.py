"""Reproduce the fused-program attention slowdown standalone.

Replicates the runner's context: nested scans (outer decode steps,
inner 24 layers), flat [L*P,...] cache carried and donated, write_kv
then kernel read per layer. Sweeps kernel block sizes in this context.

Usage: timeout 590 python tools/probe_attn_in_scan.py
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

import os
PAGE = int(os.environ.get("PROBE_PAGE", "16"))
NH, NKV, D, PPS = 16, 8, 128, 2048 // PAGE
L = 24
KV_LEN = 160
S = 64
STEPS = 8


def run(tag, P, bkv, bq):
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention as rpa)
    from aphrodite_tpu.ops.kv_cache import write_kv

    rng = np.random.default_rng(0)
    kv = jnp.zeros((L * P, PAGE, 2 * NKV, D), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((S, NH, D)), jnp.bfloat16)
    kv_lens = jnp.full((S,), KV_LEN, jnp.int32)
    pi = np.zeros((S, PPS), np.int32)
    used = KV_LEN // PAGE + 1
    for i in range(S):
        pi[i, :used] = (i * used + np.arange(used)) % (P - 1)
    page_indices = jnp.asarray(pi)
    cu = jnp.arange(S + 1, dtype=jnp.int32)
    ns = jnp.asarray([S], jnp.int32)
    slot_base = jnp.asarray(pi[:, used - 1] * PAGE + KV_LEN % PAGE,
                            jnp.int32)
    new_k = jnp.zeros((S, NKV, D), jnp.bfloat16)
    new_v = jnp.zeros((S, NKV, D), jnp.bfloat16)

    kernel = functools.partial(rpa, sm_scale=D ** -0.5,
                               num_kv_pages_per_block=bkv,
                               num_queries_per_block=bq)

    def prog(q, kv):
        def step(carry, _):
            acc, kv = carry

            def layer(carry2, lidx):
                acc, kv = carry2
                pidx = page_indices + lidx * P
                if ORDER == "write_first":
                    kv = write_kv(kv, new_k, new_v,
                                  slot_base + lidx * P * PAGE)
                    out = kernel(q, kv, kv_lens, pidx, cu, ns)
                else:  # stale read: attention before the write
                    out = kernel(q, kv, kv_lens, pidx, cu, ns)
                    kv = write_kv(kv, new_k, new_v,
                                  slot_base + lidx * P * PAGE)
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
    print(f"{tag:40s} {dt*1e3:8.3f} ms/step ({dt/L*1e3:6.4f} ms/call)")


ORDER = "write_first"


def main():
    P = 2048 * 16 // PAGE + 1
    for bkv, bq in [(int(x) for x in c.split(","))
                    for c in os.environ.get(
                        "PROBE_CFGS", "16,32 8,32 4,32 2,32 8,8").split()]:
        run(f"page={PAGE} bkv={bkv:2d} bq={bq:2d}", P, bkv, bq)


if __name__ == "__main__":
    main()
