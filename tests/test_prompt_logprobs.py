"""Prompt logprobs vs HF full-pass logits (reference prompt_logprobs —
unsupported on the reference's TPU backend, tpu_model_runner.py:603-606).
"""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_full_logits


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_plp"))
    make_tiny_llama_checkpoint(path)
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    return path, llm


def test_prompt_logprobs_match_hf(tiny):
    path, llm = tiny
    tok = llm.get_tokenizer()
    prompt = "the quick brown fox"
    ids = tok.encode(prompt)
    sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                        prompt_logprobs=3)
    out = llm.generate([prompt], sp)[0]
    plp = out.prompt_logprobs
    assert plp is not None
    assert len(plp) == len(ids)
    assert plp[0] is None

    logits = hf_full_logits(path, ids)  # [L, V]
    ref_lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for pos in range(1, len(ids)):
        entry = plp[pos]
        assert ids[pos] in entry
        np.testing.assert_allclose(entry[ids[pos]].logprob,
                                   ref_lp[pos - 1, ids[pos]], atol=5e-3)
        assert len(entry) >= 3


def test_prompt_logprobs_chunked_prefill(tiny):
    path, llm2 = tiny
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              max_num_batched_tokens=16)
    tok = llm.get_tokenizer()
    prompt = "one two three four five six seven"
    ids = tok.encode(prompt)
    assert len(ids) > 16  # forces multiple prefill chunks
    sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                        prompt_logprobs=2)
    out = llm.generate([prompt], sp)[0]
    plp = out.prompt_logprobs
    assert len(plp) == len(ids)
    assert plp[0] is None
    assert all(plp[p] is not None for p in range(1, len(ids)))
