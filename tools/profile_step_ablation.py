"""Ablate components inside the fused multi-step decode program (TPU).

Builds the bench-config 1.4B dummy model, then times the runner's real
multi-step window with ops selectively no-op'd (monkeypatched before
trace; distinct num_steps values keep the program-cache keys separate).

Usage: timeout 590 python tools/profile_step_ablation.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def build_llm():
    import json
    import tempfile

    from aphrodite_tpu import LLM

    td = tempfile.mkdtemp()
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": 2048, "intermediate_size": 5632,
        "num_hidden_layers": 24, "num_attention_heads": 16,
        "num_key_value_heads": 8, "head_dim": 128, "vocab_size": 32000,
        "max_position_embeddings": 2048, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "tie_word_embeddings": False,
        "torch_dtype": "bfloat16",
    }
    with open(f"{td}/config.json", "w") as f:
        json.dump(cfg, f)
    import os
    S = int(os.environ.get("PROF_S", "64"))
    return LLM(model=td, dtype="bfloat16", load_format="dummy",
               quantization=os.environ.get("PROF_QUANT") or None,
               kv_cache_dtype=os.environ.get("PROF_KV", "auto"),
               skip_tokenizer_init=True, max_num_seqs=S,
               max_num_batched_tokens=2048, block_size=16,
               num_scheduler_steps=32)


def make_window_inputs(runner, S, pages_per_seq: int = 16,
                       pos: int = 150):
    """Host (carry, sched) bundles for the multi-step window signature:
    carry = [token_ids | positions | step_offset], sched = [page_indices
    | kv_capacity | num_seqs]."""
    pps = runner.pages_per_seq
    carry = np.zeros((2 * S + 1,), np.int32)
    carry[:S] = 1
    carry[S:2 * S] = pos
    sched = np.zeros((S * pps + S + 1,), np.int32)
    pages = sched[:S * pps].reshape(S, pps)
    for i in range(S):
        pages[i, :pages_per_seq] = np.arange(i * pages_per_seq,
                                             (i + 1) * pages_per_seq)
    sched[S * pps:S * pps + S] = pages_per_seq * runner.block_size
    sched[S * pps + S] = S
    return jnp.asarray(carry), jnp.asarray(sched)


def time_window(runner, flags, tensors_dev, num_steps, label):
    import os
    S = int(os.environ.get("PROF_S", "64"))
    carry, sched = make_window_inputs(runner, S)

    fn = runner._get_multi_step_fn(flags, num_steps)
    kv = runner.kv_pages
    out = fn(runner.params, kv, carry, sched, tensors_dev)
    jax.block_until_ready(out)
    kv, carry = out[0], out[1]
    iters = 5
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(runner.params, kv, carry, sched, tensors_dev)
        kv, carry = out[0], out[1]
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / iters / num_steps
    runner.kv_pages = kv
    print(f"{label:28s} {dt*1e3:8.3f} ms/step  "
          f"({num_steps} steps/window)")
    return dt


def main():
    llm = build_llm()
    runner = llm.engine.runner

    from aphrodite_tpu.common.sampling_params import SamplingParams
    from aphrodite_tpu.sampling.metadata import (SamplerInputRow,
                                                 build_sampling_tensors)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        detokenize=False)
    import os
    S = int(os.environ.get("PROF_S", "64"))
    rows = [SamplerInputRow(params=sp, token_ids=[1] * 8, prompt_len=8,
                            generated_len=0, seed=1, eos_token_id=2)
            for _ in range(S)]
    tensors, flags, _, _ = build_sampling_tensors(rows, S, 32000,
                                                  history_pad=8)
    tensors_dev = jax.tree.map(jnp.asarray, tensors)

    import aphrodite_tpu.models.llama as llama_mod
    import aphrodite_tpu.worker.model_runner as mr_mod

    # 1. Full program.
    time_window(runner, flags, tensors_dev, 32, "full")

    # 2. write_kv -> no-op (returns cache unchanged).
    orig_write = llama_mod.write_kv
    llama_mod.write_kv = lambda pages, k, v, slots, **kw: pages
    time_window(runner, flags, tensors_dev, 31, "no write_kv")
    llama_mod.write_kv = orig_write

    # 3. attention -> trivial (q passthrough).
    orig_attn = llama_mod.ragged_paged_attention
    llama_mod.ragged_paged_attention = \
        lambda q, pages, *a, **kw: q
    time_window(runner, flags, tensors_dev, 30, "no attention")
    llama_mod.ragged_paged_attention = orig_attn

    # 4. neither.
    llama_mod.write_kv = lambda pages, k, v, slots, **kw: pages
    llama_mod.ragged_paged_attention = \
        lambda q, pages, *a, **kw: q
    time_window(runner, flags, tensors_dev, 29, "no write, no attention")
    llama_mod.write_kv = orig_write
    llama_mod.ragged_paged_attention = orig_attn

    # 5. sampler -> argmax only.
    orig_sample = mr_mod.sample
    def cheap_sample(logits, tensors, flags):
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        z = jnp.zeros_like(ids, jnp.float32)
        return orig_sample.__wrapped__(logits, tensors, flags) if False \
            else mr_mod.SamplerOutput(
                sampled=ids, sampled_logprob=z,
                sampled_rank=jnp.zeros_like(ids),
                topk_ids=jnp.zeros((ids.shape[0], 0), jnp.int32),
                topk_logprobs=jnp.zeros((ids.shape[0], 0), jnp.float32))
    mr_mod.sample = cheap_sample
    time_window(runner, flags, tensors_dev, 28, "argmax-only sampler")
    mr_mod.sample = orig_sample

    # 6. no lm_head/logits (forward only): patch compute_logits to a
    # tiny slice so the scan body skips the [2048,32000] matmul.
    model = runner.model
    orig_logits = type(model).compute_logits
    type(model).compute_logits = \
        lambda self, params, hidden: jnp.tile(hidden[:, :1], (1, 32000))
    time_window(runner, flags, tensors_dev, 27, "no lm_head")
    type(model).compute_logits = orig_logits


if __name__ == "__main__":
    main()
