"""Device-time probe of decode attention kernels (trace-based).

Wall-clock through the device relay is unreliable (deferred execution,
memoized dispatch), so this times kernels from a jax.profiler trace:
each variant runs L=24 chained attention calls inside one jit'd scan
(the model's shape), and we report per-call device time of the hot ops.

Usage: timeout 590 python tools/probe_attn_device.py
Env: PROBE_S (128), PROBE_KV_LEN (192), PROBE_GROUPS ("2,4,8"),
     PROBE_KV_DTYPE (bf16|fp8|int8), PROBE_RAGGED=1 (also ragged kernel)
"""

import functools
import glob
import os
import tempfile
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

S = int(os.environ.get("PROBE_S", "128"))
KV_LEN = int(os.environ.get("PROBE_KV_LEN", "192"))
NH, NKV, D, PAGE = 16, 8, 128, 16
PPS = 128  # pages per seq (2048 ctx / 16)
NUM_PAGES = 4096
L = 24


def trace_device_ms(fn, args, n_calls=3):
    """Run fn(args) n times under trace; return {op: ms_total}."""
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))  # real sync
    tmp = tempfile.mkdtemp()
    with jax.profiler.trace(tmp):
        o = args[0]
        for i in range(n_calls):
            out = fn(o + jnp.bfloat16(i * 1e-3), *args[1:])
            o = out[0]
        _ = float(jnp.sum(out[0].astype(jnp.float32)))
    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                      recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    if not paths:
        return agg, cnt
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += (ev.end_ns - ev.start_ns) / 1e6
                cnt[ev.name] += 1
    return agg, cnt


def make_inputs(kv_dtype):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, NH, D)), jnp.bfloat16)
    kv = rng.standard_normal((NUM_PAGES, PAGE, 2 * NKV, D)) * 0.1
    if kv_dtype == "bf16":
        kv_pages = jnp.asarray(kv, jnp.bfloat16)
    elif kv_dtype == "fp8":
        kv_pages = jnp.asarray(kv, jnp.float8_e4m3fn)
    else:
        kv_pages = jnp.asarray(np.clip(kv * 64, -127, 127), jnp.int8)
    kv_lens = jnp.full((S,), KV_LEN, jnp.int32)
    pi = np.zeros((S, PPS), np.int32)
    used = (KV_LEN + PAGE - 1) // PAGE
    for i in range(S):
        pi[i, :used] = rng.choice(NUM_PAGES - 1, size=used, replace=False)
    page_indices = jnp.asarray(pi)
    ns = jnp.asarray([S], jnp.int32)
    return q, kv_pages, kv_lens, page_indices, ns


def run_grouped(group, kv_dtype, chunk=None):
    from aphrodite_tpu.ops import decode_attention as da

    old = da.GROUP
    oldc = da.PAGES_PER_CHUNK
    da.GROUP = group
    if chunk:
        da.PAGES_PER_CHUNK = chunk
    try:
        q, kv_pages, kv_lens, page_indices, ns = make_inputs(kv_dtype)

        def step(q, kv_pages, kv_lens, page_indices, ns):
            def layer(carry, _):
                o = da.paged_decode_attention(
                    carry, kv_pages, kv_lens, page_indices, ns,
                    sm_scale=D ** -0.5)
                return (carry + o * jnp.bfloat16(1e-3)), None

            q2, _ = jax.lax.scan(layer, q, None, length=L)
            return (q2,)

        fn = jax.jit(step)
        agg, cnt = trace_device_ms(
            fn, (q, kv_pages, kv_lens, page_indices, ns))
        report(f"grouped G={group} C={chunk or oldc} kv={kv_dtype}",
               agg, cnt)
    finally:
        da.GROUP = old
        da.PAGES_PER_CHUNK = oldc


def run_ragged(kv_dtype):
    from aphrodite_tpu.ops.attention import ragged_paged_attention

    q, kv_pages, kv_lens, page_indices, ns = make_inputs(kv_dtype)

    os.environ["APHRODITE_DECODE_KERNEL"] = "0"
    try:
        def step(q, kv_pages, kv_lens, page_indices, ns):
            def layer(carry, _):
                o = ragged_paged_attention(
                    carry, kv_pages, kv_lens, page_indices, None, ns,
                    sm_scale=D ** -0.5)
                return (carry + o * jnp.bfloat16(1e-3)), None

            q2, _ = jax.lax.scan(layer, q, None, length=L)
            return (q2,)

        fn = jax.jit(step)
        agg, cnt = trace_device_ms(
            fn, (q, kv_pages, kv_lens, page_indices, ns))
        report(f"ragged kv={kv_dtype}", agg, cnt)
    finally:
        os.environ.pop("APHRODITE_DECODE_KERNEL", None)


def report(tag, agg, cnt):
    total = sum(v for k, v in agg.items()
                if "while" not in k and "jit_" not in k
                and "copy-start" not in k and "copy-done" not in k)
    # the attention op itself
    att = [(k, v, cnt[k]) for k, v in agg.items()
           if "attention" in k or "fusion" in k]
    att.sort(key=lambda x: -x[1])
    print(f"== {tag}: non-loop device total {total:.2f} ms "
          f"(3 calls x {L} layers)")
    for k, v, c in att[:4]:
        print(f"   {v:8.2f} ms x{c:5d} ({v/max(c,1)*1e3:7.1f} us/call)  "
              f"{k[:70]}")


def main():
    print(f"backend: {jax.default_backend()}  S={S} KV_LEN={KV_LEN}")
    kv_dtype = os.environ.get("PROBE_KV_DTYPE", "bf16")
    for spec in [x for x in
                 os.environ.get("PROBE_GROUPS", "8,4,2").split(",") if x]:
        if ":" in spec:
            g, c = spec.split(":")
            run_grouped(int(g), kv_dtype, int(c))
        else:
            run_grouped(int(spec), kv_dtype)
    if os.environ.get("PROBE_RAGGED", "0") == "1":
        run_ragged(kv_dtype)


if __name__ == "__main__":
    main()
