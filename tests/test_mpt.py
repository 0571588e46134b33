"""MPT (ALiBi with MPT slope schedule, bias-free, fused Wqkv) vs HF."""

import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

PROMPTS = ["the quick brown fox", "hello world, this is"]


@pytest.fixture(scope="module")
def mpt_dir(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.MptConfig(
        d_model=60,
        n_heads=5,  # non-power-of-2: exercises the interleaved remainder
        n_layers=2,
        vocab_size=256,
        expansion_ratio=4,
        max_seq_len=128,
    )
    path = str(tmp_path_factory.mktemp("tiny_mpt"))
    make_tiny_checkpoint(path, cfg)
    return path


def test_mpt_greedy_matches_hf(mpt_dir):
    llm = LLM(model=mpt_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(mpt_dir, tok.encode(prompt), 10)
        assert out.outputs[0].token_ids == expect, prompt


def test_mpt_long_decode(mpt_dir):
    llm = LLM(model=mpt_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True)
    out = llm.generate([PROMPTS[0]], sp)[0].outputs[0]
    expect = hf_greedy_generate(mpt_dir, tok.encode(PROMPTS[0]), 30)
    assert out.token_ids == expect
