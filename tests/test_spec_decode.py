"""Speculative decoding (n-gram) tests.

Reference analog: tests/spec_decode/e2e/test_ngram_correctness.py —
speculation must be lossless: greedy outputs with spec enabled equal the
non-spec engine (and therefore HF).
"""

import pytest

from aphrodite_tpu import LLM, SamplingParams
from aphrodite_tpu.spec_decode.ngram import propose_ngram


def test_propose_ngram_basic():
    # ... 5 6 7 8 ... 5 6 -> next tokens after earlier "5 6" are 7 8.
    hist = [1, 5, 6, 7, 8, 2, 5, 6]
    assert propose_ngram(hist, 2) == [7, 8]
    assert propose_ngram(hist, 4) == [7, 8, 2, 5]


def test_propose_ngram_prefers_longest_match():
    # "9 5 6" occurs earlier followed by 3; shorter "5 6" followed by 4.
    hist = [9, 5, 6, 3, 0, 5, 6, 4, 1, 9, 5, 6]
    assert propose_ngram(hist, 1, ngram_max=3) == [3]


def test_propose_ngram_no_match():
    assert propose_ngram([1, 2, 3, 4], 2) == []
    assert propose_ngram([1], 2) == []


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_spec")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


def test_ngram_spec_is_lossless_greedy(tiny_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    # A repetitive prompt gives the n-gram proposer real hits.
    prompts = ["one two three one two three one two",
               "the quick brown fox the quick brown"]
    base = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]

    spec = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               speculative_model="[ngram]", num_speculative_tokens=4)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    assert got == expect


def test_spec_with_sampling_falls_back(tiny_dir):
    """Non-greedy requests must still work (spec path is bypassed)."""
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              speculative_model="[ngram]", num_speculative_tokens=4)
    sp = SamplingParams(temperature=1.0, seed=7, max_tokens=8,
                        ignore_eos=True)
    out = llm.generate(["one two three one two three"], sp)[0].outputs[0]
    assert len(out.token_ids) == 8


def test_spec_multi_step_conflict_rejected(tiny_dir):
    with pytest.raises(ValueError, match="mutually exclusive"):
        LLM(model=tiny_dir, dtype="float32",
            num_device_blocks_override=64,
            speculative_model="[ngram]", num_scheduler_steps=4)
