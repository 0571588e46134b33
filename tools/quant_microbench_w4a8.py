"""W4A16 vs W4A8 per-site device times at the bench model's shapes.

Adversarial test of the r4 'VPU nibble-dequant structural ceiling'
claim (VERDICT r4 weak-3): the w4a8 body keeps nibbles int8 end-to-end
(int8 x int8 MXU dots + per-group rank-1 fixups), so if the ceiling is
really the per-element dequant, this should run well past 310 GB/s of
packed bytes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python tools/quant_microbench_w4a8.py
Env: MB_T (128) decode batch width.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

T = int(os.environ.get("MB_T", "128"))
GROUP = 128
L = 24
# The remote-compile relay rejects very large constant uploads (HTTP
# 413); cap the stacked-layer count per site to keep the weight stack
# under the limit (time is reported per layer-call, so L only affects
# averaging).
MAX_STACK_MB = 160

# The fused bench-model sites: (name, K, N).
SITES = [
    ("qkv", 2048, 4096),
    ("o", 2048, 2048),
    ("gate_up", 2048, 11264),
    ("down", 5632, 2048),
]


def main():
    from aphrodite_tpu.worker.model_runner import _enable_compilation_cache

    _enable_compilation_cache()
    from aphrodite_tpu.ops import quant_matmul as qm
    from tools.trace_util import trace_device_ms

    rng = np.random.default_rng(0)
    for name, K, N in SITES:
        x = jnp.asarray(rng.standard_normal((T, K)) * 0.3, jnp.bfloat16)
        layer_mb = K * N / 2 / 1e6
        Ls = max(2, min(L, int(MAX_STACK_MB / layer_mb)))
        q4 = rng.integers(0, 16, size=(Ls, K, N), dtype=np.int8)
        q4p = qm.pack_int4_rows(q4)
        scale = (rng.random((Ls, K // GROUP, N)) * 0.02 + 0.001).astype(
            np.float32)
        zero = rng.integers(0, 16, size=(Ls, K // GROUP, N)).astype(
            np.float32)
        q4p_j = jnp.asarray(q4p)
        s_j = jnp.asarray(scale)
        z_j = jnp.asarray(zero)
        pkb = K * N // 2 * Ls  # packed bytes per full stack pass

        def many(fn, x0, iters=8):
            def body(i, acc):
                def layer(carry, l):
                    out = fn(carry, l)
                    # scalar data-dependence keeps layers serialized
                    # regardless of the site's N vs K shape
                    nxt = (x0 + out[0, 0].astype(jnp.bfloat16) * 0
                           ).astype(jnp.bfloat16)
                    return nxt, None

                carry, _ = jax.lax.scan(
                    layer, x0 + acc * 0,
                    jnp.arange(Ls, dtype=jnp.int32))
                return carry

            return jax.lax.fori_loop(0, iters,
                                     lambda i, a: body(i, a), x0)

        variants = {
            "dense   (a16)": lambda xx, l: qm.int4p_matmul_pallas(
                xx, q4p_j, s_j, z_j, GROUP, layer_idx=l, body="dense"),
            "groupwise(a16)": lambda xx, l: qm.int4p_matmul_pallas(
                xx, q4p_j, s_j, z_j, GROUP, layer_idx=l,
                body="groupwise"),
            "w4a8    (int8)": lambda xx, l: qm.int4p_matmul_w4a8_pallas(
                xx, q4p_j, s_j, z_j, GROUP, layer_idx=l),
        }
        print(f"--- {name}: K={K} N={N} T={T} "
              f"({K * N // 2 / 1e6:.1f} MB packed/layer)")
        for vname, fn in variants.items():
            try:
                f = jax.jit(functools.partial(many, fn))
                agg, _ = trace_device_ms(f, (x,), n_calls=1)
                ms = sum(v for k, v in agg.items()
                         if "int4p" in k or "fusion" in k.lower()
                         or "matmul" in k)
                per_layer_us = ms / (8 * Ls) * 1e3
                gbs = pkb * 8 / (ms / 1e3) / 1e9
                print(f"  {vname}: {per_layer_us:7.1f} us/layer "
                      f"({gbs:6.0f} GB/s packed)")
            except Exception as e:  # noqa: BLE001
                print(f"  {vname}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
