"""Full-model-shaped quant matmul benchmark: 24-layer scan in ONE jit,
timed from the DEVICE trace (wall clock through the relay is unusable —
see tools/trace_util.py). Times what the model actually runs: a
lax.scan over L=24 layers of the four linear sites (qkv, wo, gateup,
down) with stacked [L, ...] weights, per weight format:

  bf16        dense bf16 weights
  int4p-ref   packed int4, XLA in-graph unpack+dequant
  int4-ref    unpacked int4 (int8 nibbles), XLA dequant
  int4p-ker   packed int4, pallas kernel (current dispatch)
  int4-ker    unpacked int4, pallas groupwise kernel
  int8-deq    int8 per-channel, XLA dequant-then-dot
  int8-dot    int8 per-channel, mixed bf16 x int8 dot_general (qlinear)

Fused vs split: qkv as one [K,4096] weight vs wq/wk/wv; gate+up as one
[K,11264] vs two.

Usage: timeout 590 python tools/quant_microbench.py
Env: QMB_T (128), QMB_ITERS (20), QMB_FORMATS (comma list),
     QMB_SPLIT=1 (also run split-weight variants).
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

T = int(os.environ.get("QMB_T", "128"))
ITERS = int(os.environ.get("QMB_ITERS", "20"))
GROUP = 128
L, H, F = 24, 2048, 5632
NQKV = 4096  # 16*128 + 2*8*128


def timeit(fn, *args, iters=ITERS, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / iters


def make_int4_stack(K, N, rng):
    q4 = rng.integers(0, 16, size=(L, K, N), dtype=np.int64).astype(np.int8)
    scale = (rng.standard_normal((L, K // GROUP, N)) * 0.01 + 0.02).astype(
        np.float32)
    zero = rng.integers(0, 16, size=(L, K // GROUP, N)).astype(np.float32)
    return q4, scale, zero


def build_params(fmt, rng, fused=True):
    from aphrodite_tpu.ops import quant_matmul as qm

    sites = ([("wqkv", H, NQKV), ("wo", H, H), ("w13", H, 2 * F),
              ("w2", F, H)] if fused else
             [("wq", H, 2048), ("wk", H, 1024), ("wv", H, 1024),
              ("wo", H, H), ("w1", H, F), ("w3", H, F), ("w2", F, H)])
    params = {}
    for name, K, N in sites:
        if fmt == "bf16":
            params[name] = jnp.asarray(
                rng.standard_normal((L, K, N)) * 0.02, jnp.bfloat16)
        elif fmt in ("int8-deq", "int8-dot"):
            params[name] = {
                "q": jnp.asarray(rng.integers(-127, 127, (L, K, N)),
                                 jnp.int8),
                "scale": jnp.asarray(
                    np.abs(rng.standard_normal((L, 1, N))) * 0.01 + 1e-3,
                    jnp.float32),
            }
        else:
            q4, s, z = make_int4_stack(K, N, rng)
            if fmt.startswith("int4p"):
                params[name] = {"q4p": jnp.asarray(qm.pack_int4_rows(q4)),
                                "scale": jnp.asarray(s),
                                "zero": jnp.asarray(z)}
            else:
                params[name] = {"q4": jnp.asarray(q4),
                                "scale": jnp.asarray(s),
                                "zero": jnp.asarray(z)}
    return params


def matmul_for(fmt):
    from aphrodite_tpu.ops import quant_matmul as qm

    def mm(x, w):
        if fmt == "bf16":
            return jnp.dot(x, w, preferred_element_type=jnp.float32)
        if fmt == "int8-deq":
            wd = (w["q"].astype(jnp.bfloat16)
                  * w["scale"].astype(jnp.bfloat16))
            return jnp.dot(x, wd, preferred_element_type=jnp.float32)
        if fmt == "int8-dot":
            out = jax.lax.dot_general(
                x, w["q"], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return out * w["scale"]
        g = (w["q4"].shape[-2] if "q4" in w else
             2 * w["q4p"].shape[-2]) // w["scale"].shape[-2]
        if fmt == "int4p-ref":
            return qm.int4p_matmul_ref(x, w["q4p"], w["scale"], w["zero"],
                                       g)
        if fmt == "int4-ref":
            return qm.int4_matmul_ref(x, w["q4"], w["scale"], w["zero"], g)
        if fmt == "int4p-ker":
            return qm.int4p_matmul_dispatch(x, w["q4p"], w["scale"],
                                            w["zero"], g)
        if fmt == "int4p-stk":
            # THE MODEL PATH: stacked [L, ...] weights closed over, layer
            # index rides the scan (quantization/qlinear.py "_idx").
            return qm.int4p_matmul_stacked_dispatch(
                x, w["q4p"], w["scale"], w["zero"], g, w["_idx"])
        if fmt == "int4-ker":
            return qm.int4_matmul_dispatch(x, w["q4"], w["scale"],
                                           w["zero"], g)
        raise ValueError(fmt)

    return mm


def weight_bytes(fmt, fused):
    per_layer = H * NQKV + H * H + H * 2 * F + F * H
    total = L * per_layer
    if fmt == "bf16":
        return total * 2
    if fmt.startswith("int8"):
        return total
    if fmt.startswith("int4p"):
        return total // 2
    return total  # unpacked int4 stored as int8


def run(fmt, fused, rng):
    from tools.trace_util import trace_device_ms, top_ops

    mm = matmul_for(fmt)
    params = build_params(fmt, rng, fused=fused)

    def step(x, p):
        if fused:
            a = mm(x, p["wqkv"])[:, :2048].astype(jnp.bfloat16)
        else:
            a = (mm(x, p["wq"]) + 0.01 * mm(x, p["wk"]).sum()
                 + 0.01 * mm(x, p["wv"]).sum()).astype(jnp.bfloat16)
        x = x + mm(a, p["wo"]).astype(jnp.bfloat16)
        if fused:
            g = mm(x, p["w13"])
            h = jax.nn.silu(g[:, :F]) * g[:, F:]
        else:
            h = jax.nn.silu(mm(x, p["w1"])) * mm(x, p["w3"])
        x = x + mm(h.astype(jnp.bfloat16), p["w2"]).astype(jnp.bfloat16)
        # keep magnitudes bounded across layers
        x = x / jnp.maximum(
            1.0, jnp.max(jnp.abs(x)) / 4.0).astype(jnp.bfloat16)
        return x, None

    if fmt == "int4p-stk":
        # Close the stacked weights over the scan; xs is just the layer
        # index — exactly models/llama.py's quant_stacked bypass.
        def fwd(x, params):
            def step_idx(x, lidx):
                p = {name: {**w, "_idx": lidx}
                     for name, w in params.items()}
                return step(x, p)

            x, _ = jax.lax.scan(step_idx, x,
                                jnp.arange(L, dtype=jnp.int32))
            return x
    else:
        def fwd(x, params):
            x, _ = jax.lax.scan(step, x, params)
            return x

    x = jnp.asarray(rng.standard_normal((T, H)), jnp.bfloat16)
    fn = jax.jit(fwd)
    agg, cnt = trace_device_ms(fn, (x, params), n_calls=3)
    total = sum(v for k, v in agg.items() if k.startswith("jit_")) / 3
    wb = weight_bytes(fmt, fused)
    tag = fmt + ("" if fused else " (split)")
    print(f"  {tag:22s}: {total:8.3f} ms/step   "
          f"({wb/1e6:6.0f} MB wts -> {wb/(total/1e3)/1e9:6.0f} GB/s)")
    if os.environ.get("QMB_TOPOPS", "0") == "1":
        for k, v, c in top_ops(agg, cnt, 6):
            print(f"      {v/3*1e3:9.1f} us/call-set x{c:4d}  {k[:64]}")
    return total


def main():
    # Persistent XLA cache: re-runs while iterating on ONE kernel body
    # shouldn't pay every other variant's compile again.
    from aphrodite_tpu.worker.model_runner import _enable_compilation_cache

    _enable_compilation_cache()
    print(f"backend: {jax.default_backend()}  T={T}  L={L}")
    rng = np.random.default_rng(0)
    formats = os.environ.get(
        "QMB_FORMATS",
        "bf16,int4p-ref,int4-ref,int4p-ker,int4-ker,int8-deq").split(",")
    print("fused-weight scans:")
    for fmt in formats:
        try:
            run(fmt, True, rng)
        except Exception as e:  # noqa: BLE001
            print(f"  {fmt}: FAIL {type(e).__name__}: {e}")
    if os.environ.get("QMB_SPLIT", "0") == "1":
        print("split-weight scans:")
        for fmt in formats:
            try:
                run(fmt, False, rng)
            except Exception as e:  # noqa: BLE001
                print(f"  {fmt}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
