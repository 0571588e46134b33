"""Falcon's three decoder styles vs HF."""

import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

PROMPTS = ["the quick brown fox", "hello world, this is"]


def _make(tmp_path_factory, name, **kw):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.FalconConfig(vocab_size=256, hidden_size=64,
                          num_attention_heads=4, num_hidden_layers=2,
                          bias=False, **kw)
    path = str(tmp_path_factory.mktemp(name))
    make_tiny_checkpoint(path, cfg)
    return path


def _check(model_dir):
    llm = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(model_dir, tok.encode(prompt), 10)
        n = min(len(out.outputs[0].token_ids), len(expect))
        assert out.outputs[0].token_ids[:n] == expect[:n], prompt


def test_falcon_7b_style_mqa_parallel(tmp_path_factory):
    _check(_make(tmp_path_factory, "tiny_falcon7", multi_query=True,
                 parallel_attn=True, new_decoder_architecture=False,
                 alibi=False))


def test_falcon_40b_style_gqa_two_norms(tmp_path_factory):
    _check(_make(tmp_path_factory, "tiny_falcon40", num_kv_heads=2,
                 new_decoder_architecture=True, alibi=False))


def test_falcon_rw_style_alibi_sequential(tmp_path_factory):
    _check(_make(tmp_path_factory, "tiny_falconrw", multi_query=False,
                 parallel_attn=False, new_decoder_architecture=False,
                 alibi=True))


def test_gpt_bigcode_mqa_learned_positions(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.GPTBigCodeConfig(vocab_size=256, n_embd=64, n_head=4,
                              n_layer=2, n_positions=128,
                              multi_query=True)
    path = str(tmp_path_factory.mktemp("tiny_bigcode"))
    make_tiny_checkpoint(path, cfg)
    _check(path)
