"""Online serving benchmark (reference tests/benchmarks/engine/
serving.py `BenchmarkMetrics`): drives a running OpenAI server with a
Poisson arrival process and reports request/input/output throughput and
TTFT/TPOT/ITL mean/median/p99.

Usage: python benchmarks/serving.py --url http://localhost:2242
       [--num-prompts 64] [--request-rate 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import asyncio
import json
import time

import numpy as np


async def one_request(session, url, prompt_len, output_len, vocab, rng,
                      metrics):
    import aiohttp

    token_ids = rng.integers(0, vocab, size=prompt_len).tolist()
    body = {
        "prompt": token_ids,
        "max_tokens": output_len,
        "temperature": 0,
        "ignore_eos": True,
        "stream": True,
    }
    t0 = time.monotonic()
    first_token_t = None
    inter_token = []
    last_t = None
    async with session.post(f"{url}/v1/completions", json=body) as resp:
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            now = time.monotonic()
            if first_token_t is None:
                first_token_t = now
            elif last_t is not None:
                inter_token.append(now - last_t)
            last_t = now
    end = time.monotonic()
    metrics["ttft"].append(first_token_t - t0 if first_token_t else 0.0)
    metrics["itl"].extend(inter_token)
    metrics["e2e"].append(end - t0)
    metrics["output_tokens"] += output_len
    metrics["input_tokens"] += prompt_len


async def run(args):
    import aiohttp

    rng = np.random.default_rng(0)
    metrics = {"ttft": [], "itl": [], "e2e": [], "output_tokens": 0,
               "input_tokens": 0}
    async with aiohttp.ClientSession() as session:
        tasks = []
        t0 = time.monotonic()
        for _ in range(args.num_prompts):
            tasks.append(asyncio.create_task(
                one_request(session, args.url, args.input_len,
                            args.output_len, args.vocab_size, rng,
                            metrics)))
            if args.request_rate > 0:
                await asyncio.sleep(rng.exponential(
                    1.0 / args.request_rate))
        await asyncio.gather(*tasks)
        elapsed = time.monotonic() - t0

    def stats(xs):
        if not xs:
            return {}
        a = np.array(xs)
        return {"mean": float(a.mean()),
                "median": float(np.percentile(a, 50)),
                "p99": float(np.percentile(a, 99))}

    print(json.dumps({
        "request_throughput": args.num_prompts / elapsed,
        "input_token_throughput": metrics["input_tokens"] / elapsed,
        "output_token_throughput": metrics["output_tokens"] / elapsed,
        "ttft_s": stats(metrics["ttft"]),
        "itl_s": stats(metrics["itl"]),
        "e2e_s": stats(metrics["e2e"]),
    }, indent=1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://localhost:2242")
    p.add_argument("--num-prompts", type=int, default=64)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--request-rate", type=float, default=8.0,
                   help="Poisson arrivals/s (0 = all at once)")
    p.add_argument("--vocab-size", type=int, default=32000)
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
