"""Time the host-side phases of one multi-step decode window (TPU).

Phases: batch assembly (numpy + H2D), device program (dispatch +
block_until_ready), output fetch (np.asarray per field).

Usage: timeout 590 python tools/profile_window_host.py
"""

import time

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
            for _ in range(64)]

    S = 64
    from tools.profile_step_ablation import make_window_inputs
    for it in range(6):
        t0 = time.monotonic()
        tensors, flags, _, _ = build_sampling_tensors(rows, S, 32000,
                                                      history_pad=8)
        tensors_dev = jax.tree.map(jnp.asarray, tensors)
        carry, sched = make_window_inputs(runner, S)
        jax.block_until_ready(sched)
        t1 = time.monotonic()

        fn = runner._get_multi_step_fn(flags, 32)
        out = fn(runner.params, runner.kv_pages, carry, sched,
                 tensors_dev)
        runner.kv_pages = out[0]
        jax.block_until_ready(out[1:])
        t2 = time.monotonic()

        raw = np.asarray(out[2])  # single packed window buffer
        t3 = time.monotonic()
        from aphrodite_tpu.worker.model_runner import _unpack_step_outputs
        _ = _unpack_step_outputs(raw, 32, S, flags.max_logprobs, S)
        t4 = time.monotonic()
        print(f"iter {it}: assemble+h2d={1e3*(t1-t0):7.1f}ms  "
              f"device={1e3*(t2-t1):7.1f}ms  "
              f"fetch1={1e3*(t3-t2):7.1f}ms  unpack={1e3*(t4-t3):7.1f}ms")


if __name__ == "__main__":
    main()
