"""Batch-decode latency benchmark (reference tests/benchmarks/engine/
latency.py): time per engine iteration at a fixed batch, with
percentiles.

Usage: python benchmarks/latency.py --model <dir> [--batch 8]
       [--input-len 128] [--output-len 64] [--num-iters 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--num-iters", type=int, default=5)
    p.add_argument("--num-scheduler-steps", type=int, default=8)
    p.add_argument("--quantization", default=None)
    p.add_argument("--kv-cache-dtype", default="auto")
    p.add_argument("--dtype", default="auto")
    args = p.parse_args()

    from aphrodite_tpu import LLM, SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              quantization=args.quantization,
              kv_cache_dtype=args.kv_cache_dtype,
              skip_tokenizer_init=True,
              max_num_seqs=args.batch,
              num_scheduler_steps=args.num_scheduler_steps)
    vocab = llm.engine.model_config.get_vocab_size()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, vocab, size=args.input_len).tolist()
               for _ in range(args.batch)]
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True, detokenize=False)

    # Warmup/compile.
    llm.generate(prompt_token_ids=prompts, sampling_params=SamplingParams(
        temperature=0.0, max_tokens=2, ignore_eos=True, detokenize=False))

    latencies = []
    for _ in range(args.num_iters):
        t0 = time.monotonic()
        llm.generate(prompt_token_ids=prompts, sampling_params=sp)
        latencies.append(time.monotonic() - t0)
    lat = np.array(latencies)
    print(json.dumps({
        "avg_latency_s": float(lat.mean()),
        "p50_latency_s": float(np.percentile(lat, 50)),
        "p90_latency_s": float(np.percentile(lat, 90)),
        "p99_latency_s": float(np.percentile(lat, 99)),
        "batch": args.batch,
        "input_len": args.input_len,
        "output_len": args.output_len,
    }))


if __name__ == "__main__":
    main()
