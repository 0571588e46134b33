"""OPT + GPT-2 (learned positional embeddings) vs HF."""

import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

PROMPTS = ["the quick brown fox", "hello world, this is"]


@pytest.fixture(scope="module")
def opt_dir(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.OPTConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, ffn_dim=256, max_position_embeddings=128,
        word_embed_proj_dim=64)
    path = str(tmp_path_factory.mktemp("tiny_opt"))
    make_tiny_checkpoint(path, cfg)
    return path


@pytest.fixture(scope="module")
def gpt2_dir(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.GPT2Config(vocab_size=256, n_embd=64, n_head=4, n_layer=2,
                        n_positions=128)
    path = str(tmp_path_factory.mktemp("tiny_gpt2"))
    make_tiny_checkpoint(path, cfg)
    return path


def _check(model_dir, max_model_len=128):
    llm = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
              max_model_len=max_model_len, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(model_dir, tok.encode(prompt), 10)
        assert out.outputs[0].token_ids == expect, prompt


def test_opt_greedy_matches_hf(opt_dir):
    _check(opt_dir)


def test_gpt2_greedy_matches_hf(gpt2_dir):
    _check(gpt2_dir)


def test_opt_lowered_max_model_len_keeps_position_table(opt_dir):
    """User-lowered max_model_len must still load the full HF position
    table (the +2-offset rows live in the checkpoint)."""
    _check(opt_dir, max_model_len=64)


def test_gpt2_decode_past_block_boundary(gpt2_dir):
    llm = LLM(model=gpt2_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True)
    out = llm.generate([PROMPTS[0]], sp)[0].outputs[0]
    expect = hf_greedy_generate(gpt2_dir, tok.encode(PROMPTS[0]), 30)
    assert out.token_ids == expect


def test_opt_350m_style_postnorm_word_proj(tmp_path_factory):
    """OPT-350m quirks: do_layer_norm_before=False (LayerNorm AFTER
    each residual sum, no final decoder norm) + word_embed_proj_dim !=
    hidden (project_in/out folded into embed/head at load)."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128,
        num_attention_heads=4, num_hidden_layers=2,
        max_position_embeddings=128, word_embed_proj_dim=32,
        do_layer_norm_before=False)
    path = str(tmp_path_factory.mktemp("tiny_opt350"))
    make_tiny_checkpoint(path, cfg)
    _check(path)
