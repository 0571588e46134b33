"""Per-architecture engine-vs-HF greedy equality (reference tests/models/*).

Each architecture gets a tiny random checkpoint built with transformers;
our engine's greedy continuation must exactly match HF `generate`.
"""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate, make_tiny_checkpoint

COMMON = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    tie_word_embeddings=False,
)


def _config(arch):
    import transformers as tf

    if arch == "qwen2":
        return tf.Qwen2Config(**COMMON)
    if arch == "mistral":
        kw = dict(COMMON)
        kw["sliding_window"] = 32
        return tf.MistralConfig(**kw)
    if arch == "mixtral":
        kw = dict(COMMON)
        kw.update(num_local_experts=4, num_experts_per_tok=2)
        return tf.MixtralConfig(**kw)
    if arch == "gemma":
        kw = dict(COMMON)
        kw.update(head_dim=16, hidden_act="gelu_pytorch_tanh",
                  tie_word_embeddings=True)
        return tf.GemmaConfig(**kw)
    if arch == "gemma2":
        kw = dict(COMMON)
        kw.update(head_dim=16, hidden_act="gelu_pytorch_tanh",
                  tie_word_embeddings=True, attn_logit_softcapping=50.0,
                  final_logit_softcapping=30.0, query_pre_attn_scalar=16,
                  sliding_window=16)
        return tf.Gemma2Config(**kw)
    if arch == "phi3":
        return tf.Phi3Config(pad_token_id=0, bos_token_id=1,
                             eos_token_id=2, **COMMON)
    if arch == "qwen3":
        kw = dict(COMMON)
        kw["head_dim"] = 16
        return tf.Qwen3Config(**kw)
    if arch == "starcoder2":
        kw = dict(COMMON)
        kw.pop("tie_word_embeddings")
        return tf.Starcoder2Config(tie_word_embeddings=True,
                                   sliding_window=32, **kw)
    if arch == "olmo2":
        return tf.Olmo2Config(**COMMON)
    raise ValueError(arch)


@pytest.mark.parametrize("arch",
                         ["qwen2", "mistral", "mixtral", "gemma", "gemma2",
                          "phi3", "qwen3", "starcoder2", "olmo2"])
def test_arch_greedy_matches_hf(arch, tmp_path):
    model_dir = str(tmp_path / arch)
    make_tiny_checkpoint(model_dir, _config(arch))
    llm = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    tok = llm.get_tokenizer()
    prompts = ["the quick brown fox", "hello world"]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, sp)
    for prompt, out in zip(prompts, outs):
        expect = hf_greedy_generate(model_dir, tok.encode(prompt), 8)
        assert out.outputs[0].token_ids == expect, (arch, prompt)


def test_qwen3_moe_matches_hf(tmp_path_factory):
    """Qwen3-MoE: per-head QK-norm + sparse experts, no top-k renorm."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, moe_intermediate_size=64,
        num_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, head_dim=16)
    path = str(tmp_path_factory.mktemp("tiny_qwen3moe"))
    make_tiny_checkpoint(path, cfg)
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    for prompt in ("the quick brown fox", "hello world"):
        out = llm.generate([prompt], sp)[0].outputs[0]
        expect = hf_greedy_generate(path, tok.encode(prompt), 10)
        n = min(len(out.token_ids), len(expect))
        assert out.token_ids[:n] == expect[:n], prompt


def test_gemma3_matches_hf(tmp_path_factory):
    """Gemma3: 5:1 sliding/global pattern, dual rope bases, QK-norm."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=7,
        intermediate_size=128, head_dim=16,
        max_position_embeddings=128, sliding_window=16)
    path = str(tmp_path_factory.mktemp("tiny_gemma3"))
    make_tiny_checkpoint(path, cfg)
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    # Decode far enough that sliding windows (16) actually clip context.
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    for prompt in ("the quick brown fox jumps over the lazy dog and",
                   "hello"):
        out = llm.generate([prompt], sp)[0].outputs[0]
        expect = hf_greedy_generate(path, tok.encode(prompt), 24)
        n = min(len(out.token_ids), len(expect))
        assert out.token_ids[:n] == expect[:n], prompt


def test_granite_matches_hf(tmp_path_factory):
    """Granite: muP multipliers on embeddings/residuals/scores/logits."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.GraniteConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128,
        embedding_multiplier=6.0, residual_multiplier=0.22,
        attention_multiplier=0.0078125, logits_scaling=8.0,
        tie_word_embeddings=True)
    path = str(tmp_path_factory.mktemp("tiny_granite"))
    make_tiny_checkpoint(path, cfg)
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    for prompt in ("the quick brown fox", "hello world"):
        out = llm.generate([prompt], sp)[0].outputs[0]
        expect = hf_greedy_generate(path, tok.encode(prompt), 12)
        n = min(len(out.token_ids), len(expect))
        assert out.token_ids[:n] == expect[:n], prompt


def test_olmoe_matches_hf(tmp_path_factory):
    """OLMoE: full-width QK-norm + sparse experts."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.OlmoeConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=64, num_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128)
    path = str(tmp_path_factory.mktemp("tiny_olmoe"))
    make_tiny_checkpoint(path, cfg)
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    for prompt in ("the quick brown fox", "hello world"):
        out = llm.generate([prompt], sp)[0].outputs[0]
        expect = hf_greedy_generate(path, tok.encode(prompt), 12)
        n = min(len(out.token_ids), len(expect))
        assert out.token_ids[:n] == expect[:n], prompt


def _zoo_check(path, n=12, prompts=("the quick brown fox", "hello world")):
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import hf_greedy_generate

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    for prompt in prompts:
        out = llm.generate([prompt], sp)[0].outputs[0]
        expect = hf_greedy_generate(path, tok.encode(prompt), n)
        m = min(len(out.token_ids), len(expect))
        assert out.token_ids[:m] == expect[:m], prompt


def test_qwen2_moe_shared_expert_matches_hf(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, moe_intermediate_size=32,
        shared_expert_intermediate_size=64, num_experts=4,
        num_experts_per_tok=2, max_position_embeddings=128,
        decoder_sparse_step=1)
    path = str(tmp_path_factory.mktemp("tiny_qwen2moe"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_nemotron_matches_hf(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.NemotronConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128)
    path = str(tmp_path_factory.mktemp("tiny_nemotron"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_dbrx_matches_hf(tmp_path_factory):
    """DBRX: fused flat expert blobs, clip_qkv, bias-free norms."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=128,
        vocab_size=256,
        attn_config=dict(kv_n_heads=2, clip_qkv=8.0, rope_theta=10000),
        ffn_config=dict(ffn_hidden_size=32, moe_num_experts=4,
                        moe_top_k=2))
    path = str(tmp_path_factory.mktemp("tiny_dbrx"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_glm4_matches_hf(tmp_path_factory):
    """GLM-4: interleaved partial rotary, QKV bias, fused gate_up."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.GlmConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128,
        head_dim=16, pad_token_id=0)
    path = str(tmp_path_factory.mktemp("tiny_glm"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_persimmon_matches_hf(tmp_path_factory):
    """Persimmon: per-head QK LayerNorm, relu^2 MLP, interleaved QKV."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.PersimmonConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=128,
        max_position_embeddings=128)
    path = str(tmp_path_factory.mktemp("tiny_persimmon"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_olmo_v1_matches_hf(tmp_path_factory):
    """OLMo v1: non-parametric LayerNorm, clip_qkv."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.OlmoConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=128, max_position_embeddings=128,
        clip_qkv=8.0)
    path = str(tmp_path_factory.mktemp("tiny_olmo1"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_granitemoe_matches_hf(tmp_path_factory):
    """GraniteMoe: fused expert input_linear, topk-then-softmax routing,
    muP multipliers."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.GraniteMoeConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        intermediate_size=32, num_local_experts=4,
        num_experts_per_tok=2, max_position_embeddings=128,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0)
    path = str(tmp_path_factory.mktemp("tiny_granitemoe"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_smollm3_nope_layers_match_hf(tmp_path_factory):
    """SmolLM3: every 4th layer skips rope (NoPE)."""
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.SmolLM3Config(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4,
        intermediate_size=128, max_position_embeddings=128,
        pad_token_id=0)
    path = str(tmp_path_factory.mktemp("tiny_smollm3"))
    make_tiny_checkpoint(path, cfg)
    _zoo_check(path)


def test_gemma2_runtime_gptq_close_to_fp32(tmp_path):
    """Gemma2's custom layer loop must honor the fused wqkv + stacked
    quant-container routing (supports_projection_fusion): runtime-gptq
    generation tracks the fp32 engine closely."""
    model_dir = str(tmp_path / "gemma2q")
    make_tiny_checkpoint(model_dir, _config("gemma2"))
    base = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    expect = base.generate(["the quick brown fox"], sp)[0].outputs[0]
    del base
    q = LLM(model=model_dir, dtype="float32", quantization="gptq",
            max_num_seqs=4, num_device_blocks_override=128, block_size=8)
    lw = q.engine.runner.params["layers"]
    assert any(isinstance(v, dict) and ("q4p" in v or "q4" in v)
               for v in lw.values()), list(lw)
    assert "wqkv" in lw, "projection fusion must apply to gemma2"
    out = q.generate(["the quick brown fox"], sp)[0].outputs[0]
    # Random tiny weights amplify 4-bit rounding: require prefix
    # agreement with fp32, and EXACT equality with the unfused
    # quantized engine (fusion must be numerically transparent —
    # concatenation happens after per-weight group quantization).
    agree = sum(a == b for a, b in zip(out.token_ids, expect.token_ids))
    assert agree >= 3, (out.token_ids, expect.token_ids)
    del q
    import os

    os.environ["APHRODITE_FUSE_PROJ"] = "0"
    try:
        q0 = LLM(model=model_dir, dtype="float32", quantization="gptq",
                 max_num_seqs=4, num_device_blocks_override=128,
                 block_size=8)
        plain = q0.generate(["the quick brown fox"], sp)[0].outputs[0]
    finally:
        os.environ.pop("APHRODITE_FUSE_PROJ", None)
    assert out.token_ids == plain.token_ids
