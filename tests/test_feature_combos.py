"""Cross-feature greedy-equality torture tests.

Every combination must produce token-for-token the same greedy outputs
as a plain engine on the same checkpoint: speculative decoding is
exact by construction, prefix caching and preemption-recompute are
pure memory management, chunked prefill only re-schedules, and fused
multi-step windows only batch device work. Any divergence is a real
correctness bug in the interaction."""

import pytest

from aphrodite_tpu import LLM, SamplingParams

PROMPTS = [
    "a b a b a b a b",                  # ngram-friendly
    "the quick brown fox jumps over",   # plain
    "the quick brown fox sat down",     # shared prefix with above
    "one two three one two three one",  # ngram + shared nothing
]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    d = str(tmp_path_factory.mktemp("tiny_combo"))
    make_tiny_llama_checkpoint(d)
    return d


@pytest.fixture(scope="module")
def baseline(tiny_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
              num_device_blocks_override=256, block_size=8)
    out = [list(o.outputs[0].token_ids)
           for o in llm.generate(PROMPTS, sp)]
    del llm
    return out


def _run(tiny_dir, **kwargs):
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
              block_size=8, **kwargs)
    out = [list(o.outputs[0].token_ids)
           for o in llm.generate(PROMPTS, sp)]
    del llm
    return out


def test_spec_plus_prefix_caching_plus_preemption(tiny_dir, baseline):
    # 40 pages of 8 tokens is tight enough to preempt at 4 seqs x
    # (prompt + 24 tokens + lookahead) while spec verify is in flight.
    got = _run(tiny_dir, speculative_model="[ngram]",
               num_speculative_tokens=4, enable_prefix_caching=True,
               num_device_blocks_override=40)
    assert got == baseline


def test_spec_plus_chunked_prefill(tiny_dir, baseline):
    got = _run(tiny_dir, speculative_model="[ngram]",
               num_speculative_tokens=4, enable_chunked_prefill=True,
               max_num_batched_tokens=16,
               num_device_blocks_override=256)
    assert got == baseline


def test_multistep_plus_preemption(tiny_dir, baseline):
    got = _run(tiny_dir, num_scheduler_steps=4,
               num_device_blocks_override=40)
    assert got == baseline


def test_multistep_plus_prefix_caching(tiny_dir, baseline):
    got = _run(tiny_dir, num_scheduler_steps=4,
               enable_prefix_caching=True,
               num_device_blocks_override=256)
    assert got == baseline


def test_spec_with_mixed_stopping(tiny_dir):
    """Spec decode with per-request stop conditions + token bans: the
    accepted-token suffix must respect stops exactly like plain
    decode."""
    plain = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
                num_device_blocks_override=256, block_size=8)
    sps = [
        SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True,
                       custom_token_bans=[7]),
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        SamplingParams(temperature=0.0, max_tokens=24,
                       stop_token_ids=[9], ignore_eos=True),
    ]
    prompts = PROMPTS[:3]
    expect = [list(o.outputs[0].token_ids)
              for o in plain.generate(prompts, sps)]
    del plain
    spec = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
               num_device_blocks_override=256, block_size=8,
               speculative_model="[ngram]", num_speculative_tokens=4)
    got = [list(o.outputs[0].token_ids)
           for o in spec.generate(prompts, sps)]
    assert got == expect
