"""Draft-model speculative decoding tests.

Reference analog: tests/spec_decode/e2e/test_multistep_correctness.py —
draft-model speculation must be lossless for greedy requests (outputs
equal the non-spec engine) and distribution-preserving for stochastic
ones.
"""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_target")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_draft")
    # Same vocab/tokenizer; smaller and differently-initialized, so
    # proposals genuinely disagree with the target sometimes.
    make_tiny_llama_checkpoint(str(path), seed=3, num_hidden_layers=1,
                               hidden_size=32, intermediate_size=64,
                               num_attention_heads=2,
                               num_key_value_heads=2, head_dim=16)
    return str(path)


def test_draft_spec_is_lossless_greedy(target_dir, draft_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompts = ["one two three one two three one two",
               "the quick brown fox jumps over"]
    base = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]

    spec = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               speculative_model=draft_dir, num_speculative_tokens=3)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    assert got == expect


def test_draft_spec_stochastic_runs(target_dir, draft_dir):
    llm = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              speculative_model=draft_dir, num_speculative_tokens=3)
    sp = SamplingParams(temperature=1.0, seed=7, max_tokens=12,
                        ignore_eos=True)
    outs = llm.generate(["one two three four", "hello world"], sp)
    vocab = llm.engine.model_config.get_vocab_size()
    for o in outs:
        toks = o.outputs[0].token_ids
        assert len(toks) == 12
        assert all(0 <= t < vocab for t in toks)
    # Seeded: regeneration reproduces exactly.
    outs2 = llm.generate(["one two three four", "hello world"], sp)
    assert [o.outputs[0].token_ids for o in outs] == \
        [o.outputs[0].token_ids for o in outs2]


def test_draft_spec_mixed_greedy_stochastic_batch(target_dir, draft_dir):
    llm = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              speculative_model=draft_dir, num_speculative_tokens=3)
    greedy_sp = SamplingParams(temperature=0.0, max_tokens=16,
                               ignore_eos=True)
    rand_sp = SamplingParams(temperature=1.0, seed=5, max_tokens=16,
                             ignore_eos=True)
    outs = llm.generate(["one two three one two three"] * 2,
                        [greedy_sp, rand_sp])
    base = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = base.generate(["one two three one two three"], greedy_sp)
    assert outs[0].outputs[0].token_ids == \
        expect[0].outputs[0].token_ids


def test_draft_vocab_mismatch_rejected(target_dir, tmp_path):
    from tests.utils import make_tiny_llama_checkpoint

    bad = tmp_path / "bad_draft"
    make_tiny_llama_checkpoint(str(bad), vocab_size=128)
    with pytest.raises(ValueError, match="vocab"):
        LLM(model=target_dir, dtype="float32",
            num_device_blocks_override=64, speculative_model=str(bad))


def test_rejection_sampling_with_draft_q_preserves_distribution():
    """verify_proposals with a real draft distribution q must still
    sample the first emitted token from the target distribution."""
    import jax
    import jax.numpy as jnp

    from aphrodite_tpu.common.sampling_params import SamplingParams
    from aphrodite_tpu.sampling.metadata import (SamplerInputRow,
                                                 build_sampling_tensors)
    from aphrodite_tpu.sampling.spec_verify import verify_proposals

    V = 8
    base_logits = np.array([2.0, 1.0, 0.5, 0.0, -1.0, -2.0, -3.0, -4.0],
                           np.float32)
    target = np.exp(base_logits) / np.exp(base_logits).sum()
    # A draft distribution that disagrees with the target.
    q_logits = np.array([0.0, 2.0, -1.0, 1.0, 0.5, -2.0, 0.0, -1.0],
                        np.float32)
    q_lp = q_logits - np.log(np.exp(q_logits).sum())
    N = 4096
    rng = np.random.default_rng(0)
    k = 1
    logits = jnp.asarray(np.tile(base_logits, (N, k + 1, 1)))
    # Proposals drawn FROM q (as the draft would).
    props_np = rng.choice(V, size=(N, k), p=np.exp(q_lp))
    proposals = jnp.asarray(props_np.astype(np.int32))
    draft_lp = jnp.asarray(np.tile(q_lp, (N, k, 1)).astype(np.float32))
    rows = [SamplerInputRow(params=SamplingParams(temperature=1.0, seed=s),
                            token_ids=[1], prompt_len=1, generated_len=0,
                            seed=s) for s in range(N)]
    t, flags, _, _ = build_sampling_tensors(rows, N, V)
    t = jax.tree.map(jnp.asarray, t)
    out = jax.jit(lambda lg, pp, tt, dl: verify_proposals(
        lg, pp, tt, flags, draft_lp=dl))(logits, proposals, t, draft_lp)
    first = np.asarray(out.tokens)[:, 0]
    freq = np.bincount(first, minlength=V) / N
    np.testing.assert_allclose(freq, target, atol=0.04)
    # Acceptance should be substantial (q overlaps p).
    assert np.asarray(out.valid_len).mean() > 1.05


def test_draft_smaller_tp_replicated(target_dir, draft_dir):
    """VERDICT r2 item 10 (reference smaller_tp_proposer_worker): the
    draft's 2 heads can't shard to the target's tp=4, so it must build
    replicated (draft_tp=1) — and stay lossless for greedy."""
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    prompts = ["one two three one two three one two",
               "the quick brown fox jumps over"]
    base = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    del base

    spec = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               tensor_parallel_size=4,
               speculative_model=draft_dir, num_speculative_tokens=3)
    runner = spec.engine.runner
    assert runner.draft_parallel_config.tensor_parallel_size == 1
    assert runner.draft_mesh is None and runner.mesh is not None
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    assert got == expect
