"""Standalone TPU timings for the fused-decode components at bench shapes.

Answers: where do the ~37ms/step (b=64) go, and what becomes superlinear
at b=128?  Components timed in one process (ONE TPU chip — run alone):

  1. ragged paged attention kernel, decode shapes (per layer-step call)
  2. greedy sample() on [S, 32000] logits
  3. the bare 1.4B matmul stack (qkv/o/gate-up/down + lm_head) per step
  4. the full fused multi-step window program via the runner path shapes

Usage: timeout 590 python tools/profile_decode_components.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

L, H, F, NH, NKV, D, V = 24, 2048, 5632, 16, 8, 128, 32000
PAGE = 16
PAGES_PER_SEQ = 128  # max_model_len 2048 / 16
NUM_PAGES = 4096
KV_LEN = 200


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / iters


def bench_attention(S):
    from aphrodite_tpu.ops.attention import ragged_paged_attention

    q = jnp.zeros((S, NH, D), jnp.bfloat16)
    kv_pages = jnp.zeros((NUM_PAGES, PAGE, 2 * NKV, D), jnp.bfloat16)
    kv_lens = jnp.full((S,), KV_LEN, jnp.int32)
    rng = np.random.default_rng(0)
    pi = np.zeros((S, PAGES_PER_SEQ), np.int32)
    used = KV_LEN // PAGE + 1
    for i in range(S):
        pi[i, :used] = rng.choice(NUM_PAGES - 1, size=used, replace=False)
    page_indices = jnp.asarray(pi)
    cu = jnp.arange(S + 1, dtype=jnp.int32)
    ns = jnp.asarray([S], jnp.int32)

    fn = jax.jit(functools.partial(ragged_paged_attention,
                                   sm_scale=D ** -0.5))
    t = timeit(fn, q, kv_pages, kv_lens, page_indices, cu, ns)
    print(f"attention  S={S:4d}: {t*1e3:8.3f} ms/call "
          f"-> {t*1e3*L:8.2f} ms/step(x{L} layers)")
    return t


def bench_sampler(S):
    from aphrodite_tpu.sampling.sampler import sample
    from aphrodite_tpu.sampling.metadata import (SamplerInputRow,
                                                 build_sampling_tensors)
    from aphrodite_tpu.common.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True,
                        detokenize=False)
    rows = [SamplerInputRow(params=sp, token_ids=[1] * 8, prompt_len=8,
                            generated_len=0, seed=123, eos_token_id=2)
            for _ in range(S)]
    tensors, flags, _, _ = build_sampling_tensors(rows, S, V, history_pad=8)
    tensors = jax.tree.map(jnp.asarray, tensors)
    logits = jnp.zeros((S, V), jnp.float32)
    fn = jax.jit(functools.partial(sample, flags=flags))
    t = timeit(fn, logits, tensors)
    print(f"sampler    S={S:4d}: {t*1e3:8.3f} ms/step   flags={flags}")
    return t


def bench_matmul_stack(S):
    """The per-step weight-streaming cost with NO attention/sampling."""
    key = jax.random.PRNGKey(0)
    params = {
        "wqkv": jnp.zeros((L, H, (NH + 2 * NKV) * D), jnp.bfloat16),
        "wo": jnp.zeros((L, NH * D, H), jnp.bfloat16),
        "w13": jnp.zeros((L, H, 2 * F), jnp.bfloat16),
        "w2": jnp.zeros((L, F, H), jnp.bfloat16),
        "lm": jnp.zeros((H, V), jnp.bfloat16),
    }

    def step(params, x):
        layers = {k: params[k] for k in ("wqkv", "wo", "w13", "w2")}

        def layer(x, p):
            a = x @ p["wqkv"]
            x = x + a[:, :NH * D] @ p["wo"]
            g = x @ p["w13"]
            x = x + (jax.nn.silu(g[:, :F]) * g[:, F:]) @ p["w2"]
            return x, None
        x, _ = jax.lax.scan(layer, x, layers)
        return x @ params["lm"]

    def multi(params, x):
        def it(x, _):
            o = step(params, x)
            return x, o[:, 0]
        return jax.lax.scan(it, x, None, length=8)

    x = jnp.zeros((S, H), jnp.bfloat16)
    fn = jax.jit(multi)
    t = timeit(fn, params, x, iters=5) / 8
    gb = (L * (H * (NH + 2 * NKV) * D + NH * D * H + 2 * H * F + F * H)
          + H * V) * 2 / 1e9
    print(f"matmuls    S={S:4d}: {t*1e3:8.3f} ms/step   "
          f"(weights {gb:.2f} GB -> {gb/t:6.0f} GB/s streamed)")
    return t


def main():
    print(f"backend: {jax.default_backend()}  dev: {jax.devices()[0]}")
    for S in (64, 128, 256):
        bench_attention(S)
    for S in (64, 128):
        bench_sampler(S)
    for S in (64, 128):
        bench_matmul_stack(S)


if __name__ == "__main__":
    main()
