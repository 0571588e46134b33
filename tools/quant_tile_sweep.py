"""Per-site tile sweep for the packed-int4 fused dequant-matmul.

Sweeps (block_t, block_n, block_kp) for each fused-model matmul site
(qkv, wo, w13, w2 shapes at the bench geometry) at decode (T=128) and
prefill (T=1024) token counts, device-traced. Winners get pinned in
ops/quant_matmul.py's per-site tile table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python tools/quant_tile_sweep.py
Env: QTS_T (comma list, default "128,1024"), QTS_ITERS (16)
"""

import itertools
import os

import numpy as np

import jax
import jax.numpy as jnp

G = 128
SITES = [
    ("qkv", 2048, 4096),
    ("wo", 2048, 2048),
    ("w13", 2048, 11264),
    ("w2", 5632, 2048),
]
ITERS = int(os.environ.get("QTS_ITERS", "16"))


def bench(fn_call, args, q):
    from tools.trace_util import trace_device_ms

    def many(x, *rest):
        def body(_, out):
            xx = (x + 0.0 * out[:, :1]).astype(x.dtype)
            return fn_call(xx, *rest)

        return jax.lax.fori_loop(
            0, ITERS, body,
            jnp.zeros((x.shape[0], q.shape[-1]), jnp.float32))

    agg, _ = trace_device_ms(jax.jit(many), args, n_calls=1)
    total_ms = sum(v for k, v in agg.items() if "int4p_matmul" in k)
    return total_ms / ITERS / 1e3


def main():
    from aphrodite_tpu.worker.model_runner import _enable_compilation_cache

    _enable_compilation_cache()
    from aphrodite_tpu.ops import quant_matmul as qm

    rng = np.random.default_rng(0)
    ts = [int(t) for t in os.environ.get("QTS_T", "128,1024").split(",")]
    for T in ts:
        print(f"=== T={T}")
        for name, K, N in SITES:
            q4 = rng.integers(0, 16, size=(K, N), dtype=np.int64).astype(
                np.int8)
            q4p = jnp.asarray(qm.pack_int4_rows(q4))[None]
            sc = jnp.asarray((rng.standard_normal((1, K // G, N)) * 0.01
                              + 0.02).astype(np.float32))
            z = jnp.asarray(rng.integers(0, 16, size=(1, K // G, N))
                            .astype(np.float32))
            x = jnp.asarray(rng.standard_normal((T, K)) * 0.3,
                            jnp.bfloat16)
            wbytes = K * N // 2
            print(f"--- {name} K={K} N={N} ({wbytes/1e6:.1f} MB)")
            best = None
            for bt, bn, bkp in itertools.product(
                    (64, 128, 256), (512, 1024, 2048), (256, 512, 1024)):
                if bt > T or bn > N or bkp > K // 2 or (K // 2) % bkp:
                    continue
                try:
                    dt = bench(
                        lambda xx, qq, ss, zz, _bt=bt, _bn=bn, _bkp=bkp:
                        qm.int4p_matmul_pallas(
                            xx, qq, ss, zz, G, layer_idx=0, block_t=_bt,
                            block_n=_bn, block_kp=_bkp),
                        (x, q4p, sc, z), q4p)
                except Exception as e:  # noqa: BLE001
                    print(f"  bt={bt:3d} bn={bn:4d} bkp={bkp:4d}: "
                          f"FAIL {type(e).__name__}")
                    continue
                gbs = wbytes / dt / 1e9
                mark = ""
                if best is None or dt < best[0]:
                    best = (dt, bt, bn, bkp)
                    mark = "  <-- best"
                print(f"  bt={bt:3d} bn={bn:4d} bkp={bkp:4d}: "
                      f"{dt*1e6:7.1f} us ({gbs:5.0f} GB/s){mark}")
            if best:
                print(f"  BEST {name} T={T}: bt={best[1]} bn={best[2]} "
                      f"bkp={best[3]} {best[0]*1e6:.1f} us")




def body_compare():
    """Compare groupwise vs dense kernel bodies at decode T."""
    from aphrodite_tpu.worker.model_runner import _enable_compilation_cache

    _enable_compilation_cache()
    from aphrodite_tpu.ops import quant_matmul as qm

    rng = np.random.default_rng(0)
    T = 128
    for name, K, N in SITES:
        q4 = rng.integers(0, 16, size=(K, N), dtype=np.int64).astype(
            np.int8)
        q4p = jnp.asarray(qm.pack_int4_rows(q4))[None]
        sc = jnp.asarray((rng.standard_normal((1, K // G, N)) * 0.01
                          + 0.02).astype(np.float32))
        z = jnp.asarray(rng.integers(0, 16, size=(1, K // G, N))
                        .astype(np.float32))
        x = jnp.asarray(rng.standard_normal((T, K)) * 0.3, jnp.bfloat16)
        for body in ("groupwise", "dense"):
            dt = bench(
                lambda xx, qq, ss, zz, _b=body: qm.int4p_matmul_pallas(
                    xx, qq, ss, zz, G, layer_idx=0, body=_b),
            (x, q4p, sc, z), q4p)
            print(f"{name:5s} body={body:9s}: {dt*1e6:7.1f} us")


if __name__ == "__main__" and os.environ.get("QTS_BODY") == "1":
    body_compare()
    raise SystemExit(0)


if __name__ == "__main__" and os.environ.get("QTS_BODY") != "1":
    main()
