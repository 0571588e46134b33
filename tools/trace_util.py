"""Device-time measurement via jax.profiler traces.

Wall-clock timing through the device relay is unreliable (deferred
execution, memoized identical dispatches), so perf tools trace a few
calls and aggregate per-op device time from the xplane.
"""

import glob
import os
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp


def trace_device_ms(fn, args, n_calls=3, perturb=None):
    """Run fn(*args) n_calls times under a trace; return ({op: ms},
    {op: count}). Each call's first arg is perturbed (default: + i*1e-3)
    so the relay cannot memoize identical executions; a real D2H fetch
    bounds the traced region.
    """
    if perturb is None:
        def perturb(x, i):
            return x + jnp.asarray(i * 1e-3, x.dtype)
    out = fn(*args)
    jax.block_until_ready(out)
    first = out[0] if isinstance(out, (tuple, list)) else out
    _ = float(jnp.sum(first.astype(jnp.float32)))  # true sync via D2H
    tmp = tempfile.mkdtemp()
    with jax.profiler.trace(tmp):
        o = args[0]
        for i in range(n_calls):
            out = fn(perturb(o, i), *args[1:])
            o = out[0] if isinstance(out, (tuple, list)) else out
        _ = float(jnp.sum(o.astype(jnp.float32)))
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


def top_ops(agg, cnt, n=10, exclude=("while", "jit_", "copy-start",
                                     "copy-done")):
    items = [(k, v, cnt[k]) for k, v in agg.items()
             if not any(e in k for e in exclude)]
    items.sort(key=lambda x: -x[1])
    return items[:n]


def loop_total_ms(agg):
    """Total device time of the outermost jit program(s)."""
    return sum(v for k, v in agg.items() if k.startswith("jit_"))
