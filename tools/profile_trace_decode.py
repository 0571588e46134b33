"""Op-level profile of the fused multi-step decode window (TPU).

Runs the runner's real 32-step window under jax.profiler.trace and
prints the top device ops by total duration via jax.profiler.ProfileData.

Usage: timeout 590 python tools/profile_trace_decode.py
"""

import glob
import os
import tempfile
import time
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from tools.profile_step_ablation import build_llm


def main():
    llm = build_llm()
    runner = llm.engine.runner

    from aphrodite_tpu.common.sampling_params import SamplingParams
    from aphrodite_tpu.sampling.metadata import (SamplerInputRow,
                                                 build_sampling_tensors)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        detokenize=False)
    rows = [SamplerInputRow(params=sp, token_ids=[1] * 8, prompt_len=8,
                            generated_len=0, seed=1, eos_token_id=2)
            for _ in range(int(os.environ.get("PROF_S", "64")))]
    tensors, flags, _, _ = build_sampling_tensors(rows, len(rows), 32000,
                                                  history_pad=8)
    tensors_dev = jax.tree.map(jnp.asarray, tensors)

    S = len(rows)
    from tools.profile_step_ablation import make_window_inputs
    carry, sched = make_window_inputs(runner, S)

    fn = runner._get_multi_step_fn(flags, 32)

    def call(kv, carry):
        return fn(runner.params, kv, carry, sched, tensors_dev)

    out = call(runner.kv_pages, carry)
    jax.block_until_ready(out)
    kv, carry = out[0], out[1]

    tmp = tempfile.mkdtemp()
    with jax.profiler.trace(tmp):
        for _ in range(3):
            out = call(kv, carry)
            kv, carry = out[0], out[1]
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplanes:", paths)
    if not paths:
        return
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                d = (ev.end_ns - ev.start_ns) / 1e6
                agg[ev.name] += d
                cnt[ev.name] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    total = sum(agg.values())
    print(f"total device op time (3 windows, may double-count lines): "
          f"{total:.1f} ms")
    for name, ms in top:
        print(f"{ms:9.2f} ms  x{cnt[name]:5d}  {name[:90]}")


if __name__ == "__main__":
    main()
