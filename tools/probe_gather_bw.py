"""Pure page-gather bandwidth probe: what can scattered 64KB page DMAs
actually achieve on this chip?  Isolates the DMA side of the decode
attention kernel (no matmuls/softmax): gathers the same pages the
kernel would and reduces them to one number.

Usage: timeout 590 python tools/probe_gather_bw.py
Env: PROBE_S, PROBE_KV_LEN, PROBE_SEQ=1 (sequential page ids)
"""

import functools
import glob
import os
import tempfile
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = int(os.environ.get("PROBE_S", "128"))
KV_LEN = int(os.environ.get("PROBE_KV_LEN", "192"))
NKV, D, PAGE = 8, 128, 16
PPS = 128
NUM_PAGES = 4096
L = 24
G, C = 8, 8


def _gather_kernel(kv_lens_sref, page_idx_sref, kv_hbm_ref, o_ref,
                   kv_bufs, sems, *, G, C, ps):
    blk = pl.program_id(0)
    seq0 = blk * G
    Tw = C * ps

    def issue(wave, slot):
        for g in range(G):
            for c in range(C):
                pidx = wave * C + c

                @pl.when(pidx * ps < kv_lens_sref[seq0 + g])
                def _():
                    page = page_idx_sref[seq0 + g, pidx]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[page], kv_bufs.at[slot, g, c],
                        sems.at[slot]).start()

    def wait(wave, slot):
        for g in range(G):
            for c in range(C):
                pidx = wave * C + c

                @pl.when(pidx * ps < kv_lens_sref[seq0 + g])
                def _():
                    page = page_idx_sref[seq0 + g, pidx]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[page], kv_bufs.at[slot, g, c],
                        sems.at[slot]).wait()

    max_kv = lax.fori_loop(
        0, G, lambda g, m: jnp.maximum(m, kv_lens_sref[seq0 + g]), 0)
    num_waves = lax.div(max_kv + Tw - 1, Tw)
    issue(0, 0)

    def body(wave, acc):
        slot = lax.rem(wave, 2)

        @pl.when(wave + 1 < num_waves)
        def _():
            issue(wave + 1, 1 - slot)

        wait(wave, slot)
        # touch one lane per page so the DMA can't be elided
        row = kv_bufs[slot, 0, 0, 0, 0, :].astype(jnp.float32)
        return acc + jnp.sum(row)

    acc = lax.fori_loop(0, num_waves, body, jnp.float32(0))
    o_ref[0, :, :] = jnp.full((8, 128), acc, jnp.float32)


def gather(kv_lens, page_indices, kv_pages):
    ps = kv_pages.shape[1]
    out = pl.pallas_call(
        functools.partial(_gather_kernel, G=G, C=C, ps=ps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0)),
            grid=(S // G,),
            scratch_shapes=[
                pltpu.VMEM((2, G, C, ps, 2 * NKV, D), kv_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((S // G, 8, 128), jnp.float32),
        name="gather_probe",
    )(kv_lens, page_indices, kv_pages)
    return out


def main():
    rng = np.random.default_rng(0)
    kv_pages = jnp.asarray(
        rng.standard_normal((NUM_PAGES, PAGE, 2 * NKV, D)) * 0.1,
        jnp.bfloat16)
    kv_lens = jnp.full((S,), KV_LEN, jnp.int32)
    pi = np.zeros((S, PPS), np.int32)
    used = (KV_LEN + PAGE - 1) // PAGE
    seq = os.environ.get("PROBE_SEQ", "0") == "1"
    for i in range(S):
        if seq:
            pi[i, :used] = (np.arange(used) + i * used) % (NUM_PAGES - 1)
        else:
            pi[i, :used] = rng.choice(NUM_PAGES - 1, size=used,
                                      replace=False)
    page_indices = jnp.asarray(pi)

    def step(x, kv_lens, page_indices, kv_pages):
        def layer(carry, _):
            o = gather(kv_lens, page_indices, kv_pages)
            return carry + jnp.sum(o) * 1e-6, None

        x2, _ = jax.lax.scan(layer, x, None, length=L)
        return (x2,)

    fn = jax.jit(step)
    out = fn(jnp.float32(0), kv_lens, page_indices, kv_pages)
    _ = float(out[0])
    tmp = tempfile.mkdtemp()
    with jax.profiler.trace(tmp):
        o = jnp.float32(0)
        for i in range(3):
            out = fn(o + i * 1e-3, kv_lens, page_indices, kv_pages)
            o = out[0]
        _ = float(out[0])
    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                      recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += (ev.end_ns - ev.start_ns) / 1e6
                cnt[ev.name] += 1
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:6]:
        bytes_call = S * used * PAGE * 2 * NKV * D * 2
        if "gather_probe" in k:
            us = v / cnt[k] * 1e3
            print(f"gather_probe: {us:8.1f} us/call "
                  f"({bytes_call/ (us*1e-6) /1e9:6.0f} GB/s) "
                  f"[{bytes_call/1e6:.0f} MB, seq={seq}]")
        else:
            print(f"{v:9.2f} ms x{cnt[k]:4d}  {k[:70]}")


if __name__ == "__main__":
    main()
