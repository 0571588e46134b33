"""Sweep ragged-paged-attention kernel block sizes at decode shapes.

Bench config: S=64 decode tokens, kv_len~256, 16 q heads / 8 kv heads,
head_dim 128, page 16, pages_per_seq 128.

Usage: timeout 590 python tools/sweep_attn_blocks.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

NH, NKV, D, PAGE, PPS = 16, 8, 128, 16, 128
NUM_PAGES = 4096
KV_LEN = 256


def main():
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention as rpa)

    rng = np.random.default_rng(0)
    for S in (64, 128):
        q = jnp.asarray(rng.standard_normal((S, NH, D)), jnp.bfloat16)
        kv_pages = jnp.asarray(
            rng.standard_normal((NUM_PAGES, PAGE, 2 * NKV, D)) * 0.1,
            jnp.bfloat16)
        kv_lens = jnp.full((S,), KV_LEN, jnp.int32)
        pi = np.zeros((S, PPS), np.int32)
        used = KV_LEN // PAGE
        for i in range(S):
            pi[i, :used] = rng.choice(NUM_PAGES - 1, size=used,
                                      replace=False)
        page_indices = jnp.asarray(pi)
        cu = jnp.arange(S + 1, dtype=jnp.int32)
        ns = jnp.asarray([S], jnp.int32)

        for bkv in (4, 8, 16, 32, 64):
            for bq in (8, 32, 64):
                if bq > S:
                    continue
                try:
                    fn = jax.jit(lambda q, kv, kl, pi, cu, ns,
                                 bkv=bkv, bq=bq: rpa(
                                     q, kv, kl, pi, cu, ns,
                                     sm_scale=D ** -0.5,
                                     num_kv_pages_per_block=bkv,
                                     num_queries_per_block=bq))
                    out = fn(q, kv_pages, kv_lens, page_indices, cu, ns)
                    jax.block_until_ready(out)
                    iters = 50
                    t0 = time.monotonic()
                    for _ in range(iters):
                        out = fn(q, kv_pages, kv_lens, page_indices,
                                 cu, ns)
                    jax.block_until_ready(out)
                    dt = (time.monotonic() - t0) / iters
                    print(f"S={S:4d} bkv={bkv:3d} bq={bq:3d}: "
                          f"{dt*1e3:7.3f} ms/call  "
                          f"-> {dt*1e3*24:7.2f} ms/step")
                except Exception as e:
                    print(f"S={S:4d} bkv={bkv:3d} bq={bq:3d}: FAIL "
                          f"{type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
