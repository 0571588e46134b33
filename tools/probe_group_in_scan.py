"""Locate the grouped decode kernel's IN-PROGRAM overhead.

Standalone (tools/sweep_decode_group.py) the kernel runs at ~726 GB/s
(~139 us at kv=192, bench shape), but the bench trace attributes
~195 us/call inside the fused decode program. This probe rebuilds the
runner's context incrementally to find where the extra time comes from:

  A  attention alone, sequential calls in one jit (the sweep's shape)
  B  + inner lax.scan over 24 layers (flat [L*P] donated cache,
       per-layer page-index offset)
  C  + write_kv before each attention (the runner's order)
  D  + a bf16 matmul between layers (weight-stream HBM contention,
       emulating the transformer block's 95 MB/layer weight reads)

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 \
    python tools/probe_group_in_scan.py
Env: PROBE_S (128), PROBE_KV_LEN (192), PROBE_G, PROBE_C.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

S = int(os.environ.get("PROBE_S", "128"))
KV_LEN = int(os.environ.get("PROBE_KV_LEN", "192"))
NH, NKV, D, PAGE = 16, 8, 128, 16
L = 24
P = 1024  # pages per layer
PPS = 32
MM_N = 2816  # emulated per-layer weight matmul [2048, 2816] bf16


def main():
    from aphrodite_tpu.worker.model_runner import _enable_compilation_cache

    _enable_compilation_cache()
    from aphrodite_tpu.ops import decode_attention as da
    from aphrodite_tpu.ops.kv_cache import write_kv
    from tools.trace_util import trace_device_ms

    if os.environ.get("PROBE_G"):
        da.GROUP = int(os.environ["PROBE_G"])
    if os.environ.get("PROBE_C"):
        da.PAGES_PER_CHUNK = int(os.environ["PROBE_C"])

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, NH, D)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((L * P, PAGE, 2 * NKV, D)) * .1,
                     jnp.bfloat16)
    kv_lens = jnp.full((S,), KV_LEN, jnp.int32)
    used = -(-KV_LEN // PAGE)
    pi = np.zeros((S, PPS), np.int32)
    for i in range(S):
        pi[i, :used] = rng.choice(P - 1, size=used, replace=False) + 1
    page_indices = jnp.asarray(pi)
    ns = jnp.asarray([S], jnp.int32)
    slot_base = jnp.asarray(pi[:, used - 1] * PAGE + (KV_LEN - 1) % PAGE,
                            jnp.int32)
    new_k = jnp.asarray(rng.standard_normal((S, NKV, D)) * .1, jnp.bfloat16)
    new_v = jnp.asarray(rng.standard_normal((S, NKV, D)) * .1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((S, 2048)) * .1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((L, 2048, MM_N)) * .02,
                    jnp.bfloat16)

    attn = functools.partial(da.paged_decode_attention, sm_scale=0.0883)

    def report(tag, fn, args, donate=(), kv_pos=None, n_calls=2):
        """Per-op device times; donated caches thread through calls
        (the returned updated cache becomes the next call's input)."""
        import glob
        import tempfile
        from collections import defaultdict

        f = jax.jit(fn, donate_argnums=donate)
        args = list(args)
        if kv_pos is not None:
            # Fresh cache: the previous report's donated calls deleted
            # the shared one.
            args[kv_pos] = jnp.asarray(
                rng.standard_normal((L * P, PAGE, 2 * NKV, D)) * .1,
                jnp.bfloat16)

        def call():
            out = f(*args)
            jax.block_until_ready(out)
            if kv_pos is not None:
                args[kv_pos] = out[1]  # fns return (acc, kv, ...)
            return out

        call()  # compile
        tmp = tempfile.mkdtemp()
        with jax.profiler.trace(tmp):
            for _ in range(n_calls):
                call()
        agg = defaultdict(float)
        paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                          recursive=True)
        if paths:
            pd = jax.profiler.ProfileData.from_serialized_xspace(
                open(paths[0], "rb").read())
            for plane in pd.planes:
                if "TPU" not in plane.name and "tpu" not in plane.name:
                    continue
                for line in plane.lines:
                    for ev in line.events:
                        agg[ev.name] += ev.duration_ns / 1e6
        at = sum(v for k, v in agg.items() if "paged_decode" in k)
        other = sum(v for k, v in agg.items() if "paged_decode" not in k)
        print(f"{tag}: attn {at / (L * n_calls) * 1e3:7.1f} us/call "
              f"(total attn {at:6.2f} ms, other ops {other:6.2f} ms "
              f"over {n_calls} calls)", flush=True)

    # A: L sequential calls, no scan, shared cache.
    def prog_a(q, kv):
        acc = jnp.zeros((S, NH, D), jnp.float32)
        for i in range(L):
            o = attn(q + jnp.bfloat16(acc[0, 0, 0] * 0), kv, kv_lens,
                     page_indices, ns)
            acc = acc + o.astype(jnp.float32)
        return acc

    report("A seq-calls      ", prog_a, (q, kv))

    # B: inner scan over layers, per-layer page offset, donated cache.
    def prog_b(q, kv):
        def layer(carry, lidx):
            acc, kv = carry
            o = attn(q + jnp.bfloat16(acc[0, 0, 0] * 0), kv, kv_lens,
                     page_indices + lidx * P, ns)
            return (acc + o.astype(jnp.float32), kv), None

        (acc, kv), _ = jax.lax.scan(
            layer, (jnp.zeros((S, NH, D), jnp.float32), kv),
            jnp.arange(L, dtype=jnp.int32))
        return acc, kv

    report("B layer-scan     ", prog_b, (q, kv), donate=(1,), kv_pos=1)

    # C: + write_kv before attention (runner order).
    def prog_c(q, kv):
        def layer(carry, lidx):
            acc, kv = carry
            kv = write_kv(kv, new_k, new_v, slot_base + lidx * P * PAGE)
            o = attn(q + jnp.bfloat16(acc[0, 0, 0] * 0), kv, kv_lens,
                     page_indices + lidx * P, ns)
            return (acc + o.astype(jnp.float32), kv), None

        (acc, kv), _ = jax.lax.scan(
            layer, (jnp.zeros((S, NH, D), jnp.float32), kv),
            jnp.arange(L, dtype=jnp.int32))
        return acc, kv

    report("C +write_kv      ", prog_c, (q, kv), donate=(1,), kv_pos=1)

    # D: + per-layer weight matmul (HBM weight stream alongside).
    def prog_d(q, kv, x, w):
        def layer(carry, lidx):
            acc, kv, x = carry
            kv = write_kv(kv, new_k, new_v, slot_base + lidx * P * PAGE)
            o = attn(q + jnp.bfloat16(acc[0, 0, 0] * 0), kv, kv_lens,
                     page_indices + lidx * P, ns)
            y = jnp.dot(x, w[lidx], preferred_element_type=jnp.float32)
            x = x + y[:, :2048].astype(jnp.bfloat16) * 0
            return (acc + o.astype(jnp.float32), kv, x), None

        (acc, kv, x), _ = jax.lax.scan(
            layer, (jnp.zeros((S, NH, D), jnp.float32), kv, x),
            jnp.arange(L, dtype=jnp.int32))
        return acc, kv, x

    report("D +weight matmul ", prog_d, (q, kv, x, w), donate=(1,), kv_pos=1)


if __name__ == "__main__":
    main()
