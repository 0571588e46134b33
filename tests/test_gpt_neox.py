"""GPT-NeoX/Pythia (partial rotary, parallel residual) vs HF."""

import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

PROMPTS = ["the quick brown fox", "hello world, this is"]


def _make(tmp_path_factory, name, **overrides):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    kwargs = dict(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=256,
        max_position_embeddings=128, rotary_pct=0.25)
    kwargs.update(overrides)
    cfg = tf.GPTNeoXConfig(**kwargs)
    path = str(tmp_path_factory.mktemp(name))
    make_tiny_checkpoint(path, cfg)
    return path


def _check(model_dir, n=10):
    llm = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(model_dir, tok.encode(prompt), n)
        assert out.outputs[0].token_ids == expect, prompt


def test_neox_parallel_residual_partial_rotary(tmp_path_factory):
    _check(_make(tmp_path_factory, "tiny_neox"))


def test_neox_sequential_residual(tmp_path_factory):
    # use_parallel_residual=False variants exist (e.g. some fine-tunes).
    _check(_make(tmp_path_factory, "tiny_neox_seq",
                 use_parallel_residual=False))


def test_neox_full_rotary(tmp_path_factory):
    _check(_make(tmp_path_factory, "tiny_neox_full", rotary_pct=1.0))


def test_phi_single_norm_parallel_residual(tmp_path_factory):
    """Phi-1.5/2: one layernorm feeds both attn and MLP; biased lm_head;
    partial rotary 0.5."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.PhiConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=256,
        max_position_embeddings=128, partial_rotary_factor=0.5)
    path = str(tmp_path_factory.mktemp("tiny_phi"))
    make_tiny_checkpoint(path, cfg)
    _check(path)


def test_cohere_interleaved_rope_logit_scale(tmp_path_factory):
    """Command-R: GPT-J interleaved rotary, single bias-free layernorm,
    parallel residual with gated MLP, logit_scale on tied head."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.CohereConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128,
        logit_scale=0.25)
    path = str(tmp_path_factory.mktemp("tiny_cohere"))
    make_tiny_checkpoint(path, cfg)
    _check(path)


def test_gptj_interleaved_partial_rotary(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.GPTJConfig(vocab_size=256, n_embd=64, n_head=4, n_layer=2,
                        n_positions=128, rotary_dim=8)
    path = str(tmp_path_factory.mktemp("tiny_gptj"))
    make_tiny_checkpoint(path, cfg)
    _check(path)


def test_stablelm(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.StableLmConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128,
        partial_rotary_factor=0.25, use_qkv_bias=True)
    path = str(tmp_path_factory.mktemp("tiny_stablelm"))
    make_tiny_checkpoint(path, cfg)
    _check(path)


def test_cohere_plus_qk_norm(tmp_path_factory):
    """Command-R+ use_qk_norm: bias-free per-head LayerNorm on q/k
    before rotary (reference commandr.py:146-187)."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.CohereConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128,
        logit_scale=0.25, use_qk_norm=True)
    path = str(tmp_path_factory.mktemp("tiny_cohere_plus"))
    make_tiny_checkpoint(path, cfg)
    _check(path)


def test_phi_qk_layernorm(tmp_path_factory):
    """phi qk_layernorm: shared LayerNorm over head_dim on q/k before
    the partial rotary (HF PhiAttention)."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.PhiConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=256,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        qk_layernorm=True)
    path = str(tmp_path_factory.mktemp("tiny_phi_qkln"))
    make_tiny_checkpoint(path, cfg)
    _check(path)
