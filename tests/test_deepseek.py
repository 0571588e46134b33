"""DeepSeek-V3 (MLA + sigmoid group-limited MoE) vs HF."""

import pytest

from aphrodite_tpu import LLM, SamplingParams
from tests.utils import hf_greedy_generate

PROMPTS = ["the quick brown fox", "hello world, this is"]


@pytest.fixture(scope="module")
def ds_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.DeepseekV3Config(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=4, num_hidden_layers=3,
        intermediate_size=128, moe_intermediate_size=32,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, first_k_dense_replace=1,
        q_lora_rank=16, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, max_position_embeddings=128)
    torch.manual_seed(0)
    model = tf.DeepseekV3ForCausalLM(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_deepseek"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def test_deepseek_v3_greedy_matches_hf(ds_dir):
    llm = LLM(model=ds_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(ds_dir, tok.encode(prompt), 12)
        n = min(len(out.outputs[0].token_ids), len(expect))
        assert out.outputs[0].token_ids[:n] == expect[:n], prompt


def test_deepseek_v3_long_decode(ds_dir):
    """Decode across page boundaries with the padded-V MLA cache."""
    llm = LLM(model=ds_dir, dtype="float32", max_num_seqs=2,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True)
    out = llm.generate([PROMPTS[0]], sp)[0].outputs[0]
    expect = hf_greedy_generate(ds_dir, tok.encode(PROMPTS[0]), 30)
    n = min(len(out.token_ids), len(expect))
    assert out.token_ids[:n] == expect[:n]


def test_deepseek_v3_tp2_matches_tp1(ds_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    o1 = LLM(model=ds_dir, dtype="float32", max_num_seqs=2,
             max_model_len=128, block_size=8).generate(
                 PROMPTS, sp)
    o2 = LLM(model=ds_dir, dtype="float32", max_num_seqs=2,
             max_model_len=128, block_size=8,
             tensor_parallel_size=2).generate(PROMPTS, sp)
    assert [o.outputs[0].token_ids for o in o1] == \
        [o.outputs[0].token_ids for o in o2]
