"""BLOOM (ALiBi, fused interleaved QKV, embedding LayerNorm) vs HF."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

PROMPTS = ["the quick brown fox", "hello world, this is"]


@pytest.fixture(scope="module")
def bloom_dir(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.BloomConfig(
        vocab_size=256,
        hidden_size=80,
        n_layer=2,
        n_head=5,  # non-power-of-2: exercises the slope correction
    )
    path = str(tmp_path_factory.mktemp("tiny_bloom"))
    make_tiny_checkpoint(path, cfg)
    return path


def test_bloom_greedy_matches_hf(bloom_dir):
    llm = LLM(model=bloom_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(bloom_dir, tok.encode(prompt), 10)
        assert out.outputs[0].token_ids == expect, prompt


def test_bloom_long_decode_alibi_extrapolates(bloom_dir):
    """ALiBi decode far past the prompt must still match HF (the bias
    grows with absolute distance; any positional bookkeeping error in
    the paged path shows up here)."""
    llm = LLM(model=bloom_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    prompt = "a b"
    out = llm.generate([prompt], sp)[0].outputs[0]
    expect = hf_greedy_generate(bloom_dir, tok.encode(prompt), 40)
    assert out.token_ids == expect


def test_bloom_multi_step_decode(bloom_dir):
    llm = LLM(model=bloom_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128, num_scheduler_steps=4)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    out = llm.generate([PROMPTS[0]], sp)[0].outputs[0]
    expect = hf_greedy_generate(bloom_dir, tok.encode(PROMPTS[0]), 12)
    assert out.token_ids == expect


def test_bloom_tp2_matches_tp1(tmp_path_factory):
    """ALiBi slopes shard with the query heads under TP."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.BloomConfig(vocab_size=256, hidden_size=64, n_layer=2,
                         n_head=4)
    path = str(tmp_path_factory.mktemp("tiny_bloom_tp"))
    make_tiny_checkpoint(path, cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out1 = LLM(model=path, dtype="float32", max_num_seqs=2,
               max_model_len=64).generate(PROMPTS, sp)
    out2 = LLM(model=path, dtype="float32", max_num_seqs=2,
               max_model_len=64, tensor_parallel_size=2).generate(
                   PROMPTS, sp)
    assert [o.outputs[0].token_ids for o in out1] == \
        [o.outputs[0].token_ids for o in out2]
