"""Context-parallel prefill (beyond the reference: SURVEY §2.5 notes
the reference has no SP/CP at all).

Long-prompt prefill chunks shard their query tokens across the cp mesh
(weights/KV replicated; per-layer K/V all-gather), so prefill latency
scales ~cp-ways while decode runs replicated. Correctness bar:
token-exact agreement with the cp=1 engine on the 8-device virtual CPU
mesh, including chunk boundaries that don't align with shard counts.
"""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_cp"))
    make_tiny_llama_checkpoint(path, max_position_embeddings=512)
    return path


def _generate(tiny_dir, cp, prompt_ids, max_tokens=8):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=256, block_size=8,
              max_model_len=512, max_num_batched_tokens=64,
              context_parallel_size=cp)
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)
    out = llm.generate(prompt_token_ids=[list(prompt_ids)],
                       sampling_params=sp)[0].outputs[0]
    return list(out.token_ids)


@pytest.mark.parametrize("cp", [2, 4])
def test_cp_prefill_token_exact(tiny_dir, cp):
    rng = np.random.default_rng(0)
    # 200 tokens with a 64-token budget -> 3 full CP chunks + a final
    # sampling chunk on the replicated path.
    prompt = rng.integers(4, 250, size=200).tolist()
    expect = _generate(tiny_dir, 1, prompt)
    got = _generate(tiny_dir, cp, prompt)
    assert got == expect


def test_cp_prefill_odd_chunk_sizes(tiny_dir):
    """Chunk lengths that don't divide the shard count exercise the
    padded-tail path (trash-slot KV, clamped positions)."""
    rng = np.random.default_rng(3)
    prompt = rng.integers(4, 250, size=147).tolist()
    expect = _generate(tiny_dir, 1, prompt, max_tokens=6)
    got = _generate(tiny_dir, 4, prompt, max_tokens=6)
    assert got == expect


def test_cp_decode_still_batches(tiny_dir):
    """Decode (and the final sampling chunk) run the standard replicated
    path: multiple concurrent requests still work under cp."""
    rng = np.random.default_rng(7)
    prompts = [rng.integers(4, 250, size=n).tolist() for n in (90, 130)]
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=256, block_size=8,
              max_model_len=512, max_num_batched_tokens=64,
              context_parallel_size=2)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    base = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=256, block_size=8,
               max_model_len=512, max_num_batched_tokens=64)
    base_outs = base.generate(prompt_token_ids=prompts,
                              sampling_params=sp)
    for o, b in zip(outs, base_outs):
        assert list(o.outputs[0].token_ids) == \
            list(b.outputs[0].token_ids)


def test_cp_with_ngram_spec(tiny_dir):
    """ngram speculation needs only the TARGET cache, which CP prefill
    fully writes — the combination must stay lossless. (Model-draft
    spec configs bypass CP: the draft cache is only advanced by the
    standard prefill program.)"""
    rng = np.random.default_rng(11)
    base_seg = rng.integers(4, 250, size=40).tolist()
    prompt = base_seg * 3  # repetitive -> real ngram hits
    kw = dict(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=256, block_size=8,
              max_model_len=512, max_num_batched_tokens=64,
              speculative_model="[ngram]", num_speculative_tokens=4)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    base = LLM(**kw)
    expect = base.generate(prompt_token_ids=[prompt],
                           sampling_params=sp)[0].outputs[0].token_ids
    del base
    cp = LLM(**kw, context_parallel_size=2)
    got = cp.generate(prompt_token_ids=[prompt],
                      sampling_params=sp)[0].outputs[0].token_ids
    assert list(got) == list(expect)


def test_cp_with_prefix_cache_and_fp8_kv(tiny_dir):
    """CP chunks starting mid-sequence (prefix-cache hits shift
    first_token_idx) and quantize-on-write KV must stay lossless."""
    rng = np.random.default_rng(13)
    prompt = rng.integers(4, 250, size=160).tolist()
    ext = prompt + rng.integers(4, 250, size=40).tolist()

    def run(cp):
        llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
                  num_device_blocks_override=256, block_size=8,
                  max_model_len=512, max_num_batched_tokens=64,
                  enable_prefix_caching=True, kv_cache_dtype="fp8",
                  context_parallel_size=cp)
        sp = SamplingParams(temperature=0.0, max_tokens=6,
                            ignore_eos=True)
        # Two passes: the second hits the prefix cache, so its CP
        # chunks start at a nonzero first_token_idx.
        llm.generate(prompt_token_ids=[prompt], sampling_params=sp)
        out = llm.generate(prompt_token_ids=[ext],
                           sampling_params=sp)[0].outputs[0]
        return list(out.token_ids)

    assert run(2) == run(1)


def test_cp_prompt_logprobs_fall_back_to_standard_path(tiny_dir):
    """prompt_logprobs needs every chunk's full logit stream, which the
    CP program doesn't compute — such requests must take the standard
    path and return logprobs for the WHOLE prompt."""
    rng = np.random.default_rng(17)
    prompt = rng.integers(4, 250, size=150).tolist()
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=256, block_size=8,
              max_model_len=512, max_num_batched_tokens=64,
              context_parallel_size=2)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        prompt_logprobs=1)
    out = llm.generate(prompt_token_ids=[prompt], sampling_params=sp)[0]
    # One entry per prompt token (first is None by convention).
    assert out.prompt_logprobs is not None
    assert len(out.prompt_logprobs) == len(prompt)
