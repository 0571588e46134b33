"""Per-request host `logits_processors` callables (reference
sampler.py `_apply_logits_processors`): 2-arg (out_ids, logits) and
3-arg (prompt_ids, out_ids, logits) conventions, applied to RAW logits
before the shaping pipeline."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_lp"))
    make_tiny_llama_checkpoint(path)
    return path


@pytest.fixture(scope="module")
def llm(tiny_dir):
    return LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               max_model_len=128)


def force_token(tid):
    def proc(out_ids, logits):
        out = np.full_like(logits, -1e9)
        out[tid] = 0.0
        return out
    return proc


def test_processor_forces_token(llm):
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        logits_processors=[force_token(7)])
    out = llm.generate(["hello world"], sp)[0].outputs[0]
    assert out.token_ids == [7] * 6


def test_three_arg_processor_sees_prompt_and_history(llm):
    seen = []

    def proc(prompt_ids, out_ids, logits):
        seen.append((list(prompt_ids), list(out_ids)))
        out = np.full_like(logits, -1e9)
        out[len(out_ids) + 3] = 0.0  # token id depends on history length
        return out

    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        logits_processors=[proc])
    out = llm.generate(["hello world"], sp)[0].outputs[0]
    assert out.token_ids == [3, 4, 5, 6]
    # Prompt ids constant across steps; out_ids grow by one each step.
    prompts = {tuple(p) for p, _ in seen}
    assert len(prompts) == 1
    assert [o for _, o in seen] == [[], [3], [3, 4], [3, 4, 5]]


def test_processor_only_applies_to_its_request(llm):
    sp_forced = SamplingParams(temperature=0.0, max_tokens=5,
                               ignore_eos=True,
                               logits_processors=[force_token(9)])
    sp_plain = SamplingParams(temperature=0.0, max_tokens=5,
                              ignore_eos=True)
    outs = llm.generate(["hello world", "hello world"],
                        [sp_forced, sp_plain])
    assert outs[0].outputs[0].token_ids == [9] * 5
    baseline = llm.generate(["hello world"], sp_plain)[0].outputs[0]
    assert outs[1].outputs[0].token_ids == baseline.token_ids


def test_processor_composes_with_sampler_stages(llm):
    # Processor restricts to {5, 6}; greedy then picks the higher one —
    # deterministic regardless of model weights.
    def allow_two(out_ids, logits):
        out = np.full_like(logits, -1e9)
        out[5] = 1.0
        out[6] = 0.5
        return out

    sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                        logits_processors=[allow_two])
    out = llm.generate(["abc"], sp)[0].outputs[0]
    assert out.token_ids == [5, 5, 5]
