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


def test_spec_acceptance_metrics_move(tiny_dir):
    """Acceptance observability (reference spec_decode/metrics.py:51):
    running ngram spec must advance the proposed/accepted/emitted
    counters, with accepted <= proposed and emitted = accepted + rows."""
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              speculative_model="[ngram]", num_speculative_tokens=4)
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    llm.generate(["one two three one two three one two"], sp)
    pt = llm.engine.get_phase_timings()
    assert pt["spec_proposed_tokens"] > 0
    assert 0 <= pt["spec_accepted_tokens"] <= pt["spec_proposed_tokens"]
    rows = pt["spec_emitted_tokens"] - pt["spec_accepted_tokens"]
    assert rows > 0  # one bonus token per scheduled spec row
    # The repetitive prompt must give the ngram proposer real accepts.
    assert pt["spec_accepted_tokens"] > 0


def test_spec_with_sampling_works(tiny_dir):
    """Stochastic requests run through the rejection-sampling verifier."""
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              speculative_model="[ngram]", num_speculative_tokens=4)
    sp = SamplingParams(temperature=1.0, seed=7, max_tokens=8,
                        ignore_eos=True)
    out = llm.generate(["one two three one two three"], sp)[0].outputs[0]
    assert len(out.token_ids) == 8
    vocab = llm.engine.model_config.get_vocab_size()
    assert all(0 <= t < vocab for t in out.token_ids)


def test_rejection_sampling_preserves_distribution():
    """Spec verification with a delta draft must sample from the target
    distribution exactly (empirical check over many keys)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aphrodite_tpu.common.sampling_params import SamplingParams
    from aphrodite_tpu.sampling.metadata import (SamplerInputRow,
                                                 build_sampling_tensors)
    from aphrodite_tpu.sampling.spec_verify import verify_proposals

    V = 8
    base_logits = np.array([2.0, 1.0, 0.5, 0.0, -1.0, -2.0, -3.0, -4.0],
                           np.float32)
    target = np.exp(base_logits) / np.exp(base_logits).sum()
    N = 2048
    logits = jnp.asarray(np.tile(base_logits, (N, 1, 1)))  # [N, 1, V]
    proposals = jnp.full((N, 0), -1, jnp.int32)  # k=0: bonus-only path
    rows = [SamplerInputRow(params=SamplingParams(temperature=1.0, seed=s),
                            token_ids=[1], prompt_len=1, generated_len=0,
                            seed=s) for s in range(N)]
    t, flags, _, _ = build_sampling_tensors(rows, N, V)
    t = jax.tree.map(jnp.asarray, t)
    out = jax.jit(lambda lg, tt: verify_proposals(lg, proposals, tt,
                                                  flags))(logits, t)
    tokens = np.asarray(out.tokens)[:, 0]
    freq = np.bincount(tokens, minlength=V) / N
    np.testing.assert_allclose(freq, target, atol=0.05)

    # With k=1 and a fixed proposal: overall output distribution of the
    # FIRST emitted token must still equal the target.
    k_logits = jnp.asarray(np.tile(base_logits, (N, 2, 1)))
    props = jnp.full((N, 1), 1, jnp.int32)  # always propose token 1
    out2 = jax.jit(lambda lg, tt: verify_proposals(lg, props, tt,
                                                   flags))(k_logits, t)
    first = np.asarray(out2.tokens)[:, 0]
    freq2 = np.bincount(first, minlength=V) / N
    np.testing.assert_allclose(freq2, target, atol=0.05)


def test_spec_multi_step_conflict_rejected(tiny_dir):
    with pytest.raises(ValueError, match="mutually exclusive"):
        LLM(model=tiny_dir, dtype="float32",
            num_device_blocks_override=64,
            speculative_model="[ngram]", num_scheduler_steps=4)


def test_ngram_spec_at_max_model_len(tmp_path):
    """Proposals clamp to the scheduler's slot reservation near
    max_model_len — verification must not write KV past the block
    table (regression: IndexError in _build_spec_verify_batch)."""
    from tests.utils import make_tiny_llama_checkpoint

    from aphrodite_tpu import LLM, SamplingParams

    d = str(tmp_path / "m")
    make_tiny_llama_checkpoint(d)
    llm = LLM(model=d, dtype="float32", speculative_model="[ngram]",
              num_speculative_tokens=4, max_model_len=64,
              num_device_blocks_override=128, block_size=8)
    sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
    # Repetitive prompt maximizes ngram hits right up to the ceiling.
    out = llm.generate(["a b a b a b a b"], sp)[0].outputs[0]
    assert len(out.token_ids) > 0
    total = len(llm.get_tokenizer().encode("a b a b a b a b")) + \
        len(out.token_ids)
    assert total <= 64
