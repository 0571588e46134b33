"""Sweep the grouped decode kernel's (G, C) tiling at bench shapes.

G = sequences per grid block (GROUP), C = pages per DMA wave
(PAGES_PER_CHUNK). Times paged_decode_attention directly on-device at
the continuous-batching bench shape (S=128, 16q/8kv heads, D=128,
page 16) for several kv lengths, device-traced.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
    python tools/sweep_decode_group.py
"""

import itertools
import os

import numpy as np

import jax
import jax.numpy as jnp

NH, NKV, D, PAGE = 16, 8, 128, 16
NUM_PAGES = 4096
S = int(os.environ.get("SWEEP_S", "128"))
PPS = int(os.environ.get("SWEEP_PPS", "32"))


def bench_once(mod, q, kv_pages, kv_lens, pi, ns, iters=24):
    """DEVICE-traced per-call time (wall clock through the remote relay
    overlaps dispatch and is meaningless; tools/trace_util.py)."""
    from tools.trace_util import trace_device_ms

    def many(q0, kv_pages, kv_lens, pi, ns):
        def body(_, out):
            # Data dependence serializes the calls (q + 0*out keeps the
            # same shapes without changing the math).
            qq = (q0 + 0.0 * out).astype(q0.dtype)
            return mod.paged_decode_attention(qq, kv_pages, kv_lens, pi,
                                              ns, sm_scale=0.0883)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(q0))

    fn = jax.jit(many)
    agg, _ = trace_device_ms(fn, (q, kv_pages, kv_lens, pi, ns),
                             n_calls=1)
    total_ms = sum(v for k, v in agg.items()
                   if "paged_decode_attention" in k)
    return total_ms / iters / 1e3


def main():
    from aphrodite_tpu.worker.model_runner import _enable_compilation_cache

    _enable_compilation_cache()
    from aphrodite_tpu.ops import decode_attention as da

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, NH, D)), jnp.bfloat16)
    kv_pages = jnp.asarray(
        rng.standard_normal((NUM_PAGES, PAGE, 2 * NKV, D)) * 0.1,
        jnp.bfloat16)
    ns = jnp.asarray([S], jnp.int32)

    for kv_len in (128, 192, 256, 448):
        used = -(-kv_len // PAGE)
        pi = np.zeros((S, PPS), np.int32)
        for i in range(S):
            pi[i, :used] = rng.choice(NUM_PAGES - 1, size=used,
                                      replace=False) + 1
        pi_j = jnp.asarray(pi)
        kv_lens = jnp.full((S,), kv_len, jnp.int32)
        bytes_read = S * kv_len * 2 * NKV * D * 2
        print(f"--- kv_len {kv_len} ({bytes_read/1e6:.0f} MB/call)")
        for G, C in itertools.product((4, 8, 16), (2, 4, 8)):
            if S % G:
                continue
            da.GROUP = G
            da.PAGES_PER_CHUNK = C
            try:
                dt = bench_once(da, q, kv_pages, kv_lens, pi_j, ns)
            except Exception as e:  # noqa: BLE001
                print(f"  G={G:2d} C={C}: FAIL {type(e).__name__}: {e}")
                continue
            print(f"  G={G:2d} C={C}: {dt*1e6:7.1f} us/call "
                  f"({bytes_read/dt/1e9:6.0f} GB/s)")


if __name__ == "__main__":
    main()
