"""Perplexity harness: must match HF teacher-forced NLL exactly, and
quantization deltas must be sane (int8 close, int4 bounded)."""

import math

import numpy as np
import pytest

from aphrodite_tpu import LLM
from aphrodite_tpu.tools.perplexity import evaluate_perplexity

TEXTS = ["the quick brown fox jumps over the lazy dog",
         "hello world, this is a tiny tokenizer"]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_ppl"))
    make_tiny_llama_checkpoint(path)
    return path


def hf_perplexity(model_dir, texts):
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    nll, count = 0.0, 0
    for text in texts:
        ids = tok.encode(text)
        input_ids = torch.tensor([ids])
        with torch.no_grad():
            logits = model(input_ids).logits[0]
        logprobs = torch.log_softmax(logits, dim=-1)
        for pos in range(1, len(ids)):
            nll -= float(logprobs[pos - 1, ids[pos]])
            count += 1
    return math.exp(nll / count)


def test_perplexity_matches_hf(tiny_dir):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    ours = evaluate_perplexity(llm, TEXTS)
    ref = hf_perplexity(tiny_dir, TEXTS)
    np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_perplexity_quantization_delta(tiny_dir):
    base = evaluate_perplexity(
        LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
            num_device_blocks_override=128, block_size=8), TEXTS)
    int8 = evaluate_perplexity(
        LLM(model=tiny_dir, dtype="float32", quantization="int8",
            max_num_seqs=4, num_device_blocks_override=128, block_size=8),
        TEXTS)
    # Random tiny model: int8 per-channel should stay within a few
    # percent of fp32 perplexity.
    assert abs(int8 - base) / base < 0.05, (base, int8)
