"""Offline throughput benchmark (reference tests/benchmarks/engine/
throughput.py): requests/s and tokens/s over a synthetic or JSONL
workload.

Usage: python benchmarks/throughput.py --model <dir> [--num-prompts 128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Runnable as `python benchmarks/throughput.py` without PYTHONPATH.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--num-prompts", type=int, default=128)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--num-scheduler-steps", type=int, default=8)
    p.add_argument("--max-num-batched-tokens", type=int, default=2048)
    p.add_argument("--scheduler-delay-factor", type=float, default=0.0,
                   help="prefill admission hold-off; >0 lets fused "
                        "decode windows run between prompt batches "
                        "when the waiting queue is deep")
    p.add_argument("--quantization", default=None)
    p.add_argument("--kv-cache-dtype", default="auto")
    p.add_argument("--dtype", default="auto")
    p.add_argument("--dataset", default=None,
                   help="JSONL with {'prompt': ...} lines (else synthetic)")
    args = p.parse_args()

    from aphrodite_tpu import LLM, SamplingParams

    llm = LLM(model=args.model, dtype=args.dtype,
              quantization=args.quantization,
              kv_cache_dtype=args.kv_cache_dtype,
              skip_tokenizer_init=args.dataset is None,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              scheduler_delay_factor=args.scheduler_delay_factor,
              num_scheduler_steps=args.num_scheduler_steps)
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True, detokenize=False)
    if args.dataset:
        prompts = [json.loads(l)["prompt"]
                   for l in open(args.dataset)][:args.num_prompts]
        t0 = time.monotonic()
        outs = llm.generate(prompts, sp)
        elapsed = time.monotonic() - t0
        total_in = sum(len(o.prompt_token_ids) for o in outs)
    else:
        vocab = llm.engine.model_config.get_vocab_size()
        rng = np.random.default_rng(0)
        token_prompts = [
            rng.integers(0, vocab, size=args.input_len).tolist()
            for _ in range(args.num_prompts)
        ]
        t0 = time.monotonic()
        outs = llm.generate(prompt_token_ids=token_prompts,
                            sampling_params=sp)
        elapsed = time.monotonic() - t0
        total_in = args.num_prompts * args.input_len
    total_out = sum(len(o.outputs[0].token_ids) for o in outs)
    pt = llm.engine.get_phase_timings()
    print(json.dumps({
        "requests_per_s": args.num_prompts / elapsed,
        "total_tokens_per_s": (total_in + total_out) / elapsed,
        "output_tokens_per_s": total_out / elapsed,
        "elapsed_s": elapsed,
        "iterations": pt["iterations"],
        "pure_decode_iterations": pt["decode_iterations"],
        "decode_s": round(pt["decode_s"], 2),
        "decode_tokens": pt["decode_tokens"],
        "execute_s": round(pt["execute_s"], 2),
        "chained_hits": int(getattr(llm.engine.runner,
                                    "chained_window_hits", 0)),
    }))


if __name__ == "__main__":
    main()
