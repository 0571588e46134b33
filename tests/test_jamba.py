"""Jamba (hybrid Mamba/attention + MoE) engine tests vs HF transformers.

Reference analog: tests/models/test_jamba.py (greedy parity vs HF).
"""

import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

PROMPTS = ["the quick brown fox", "hello world, this is"]


@pytest.fixture(scope="module")
def jamba_dir(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    # 4 layers: l0 mamba+dense, l1 mamba+MoE, l2 attn+dense, l3
    # mamba+MoE — covers every layer-type combination.
    cfg = tf.JambaConfig(
        vocab_size=256,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        attn_layer_period=4,
        attn_layer_offset=2,
        expert_layer_period=2,
        expert_layer_offset=1,
        num_experts=4,
        num_experts_per_tok=2,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        use_mamba_kernels=False,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    path = str(tmp_path_factory.mktemp("tiny_jamba"))
    make_tiny_checkpoint(path, cfg)
    return path


def test_jamba_greedy_matches_hf(jamba_dir):
    llm = LLM(model=jamba_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(jamba_dir, tok.encode(prompt), 10)
        # HF generate stops at EOS; ours runs ignore_eos — compare the
        # overlapping prefix (>= 3 tokens of signal).
        assert len(expect) >= 3
        assert out.outputs[0].token_ids[:len(expect)] == expect, prompt


def test_jamba_chunked_prefill_matches(jamba_dir):
    """Both SSM state AND per-slot KV must hand off exactly between
    prefill chunks."""
    llm = LLM(model=jamba_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, max_num_batched_tokens=16)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = "one two three four five six seven eight"
    assert len(tok.encode(prompt)) > 16
    out = llm.generate([prompt], sp)[0].outputs[0]
    expect = hf_greedy_generate(jamba_dir, tok.encode(prompt), 8)
    assert len(expect) >= 3
    assert out.token_ids[:len(expect)] == expect


def test_jamba_slot_recycling(jamba_dir):
    """A recycled state slot (and its stale KV) must not leak into a
    fresh sequence."""
    llm = LLM(model=jamba_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    first = llm.generate(["a b c d e f g h i j"], sp)
    out = llm.generate([PROMPTS[0]], sp)[0].outputs[0]
    expect = hf_greedy_generate(jamba_dir, tok.encode(PROMPTS[0]), 6)
    assert len(expect) >= 3
    assert out.token_ids[:len(expect)] == expect
    del first


def test_jamba_tp2_matches_tp1(jamba_dir):
    """Hybrid TP: attention heads, SSM channels, FFN columns and MoE
    experts all shard; all three caches shard with them."""
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    o1 = LLM(model=jamba_dir, dtype="float32",
             max_num_seqs=2).generate(PROMPTS, sp)
    o2 = LLM(model=jamba_dir, dtype="float32", max_num_seqs=2,
             tensor_parallel_size=2).generate(PROMPTS, sp)
    assert [o.outputs[0].token_ids for o in o1] == \
        [o.outputs[0].token_ids for o in o2]
