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


@pytest.fixture(scope="module")
def ds_v2_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.DeepseekV2Config(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=4, num_hidden_layers=3,
        intermediate_size=128, moe_intermediate_size=32,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, topk_method="group_limited_greedy",
        routed_scaling_factor=1.5, first_k_dense_replace=1,
        q_lora_rank=16, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, head_dim=8,
        max_position_embeddings=128)
    torch.manual_seed(0)
    model = tf.DeepseekV2ForCausalLM(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_deepseek_v2"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def test_deepseek_v2_greedy_matches_hf(ds_v2_dir):
    """V2: softmax gate, group-max limiting, x1.5 routed scaling."""
    llm = LLM(model=ds_v2_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out in zip(PROMPTS, outs):
        expect = hf_greedy_generate(ds_v2_dir, tok.encode(prompt), 12)
        n = min(len(out.outputs[0].token_ids), len(expect))
        assert out.outputs[0].token_ids[:n] == expect[:n], prompt


def test_deepseek_v1_matches_patched_qwen2moe(tmp_path_factory):
    """DeepSeek V1 (standard attention + softmax MoE + always-on shared
    experts) has no transformers class; the oracle is HF Qwen2-MoE with
    the sigmoid shared-expert gate patched to 1.0 (then V1 math ==
    Qwen2-MoE math) and tensors renamed to the V1 scheme."""
    import json
    import os
    import shutil

    import torch
    import transformers as tf
    from safetensors.numpy import load_file, save_file

    from tests.utils import make_tiny_checkpoint

    cfg = tf.Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=3,
        intermediate_size=128, moe_intermediate_size=32,
        shared_expert_intermediate_size=64, num_experts=4,
        num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[0],
        max_position_embeddings=128, tie_word_embeddings=False)
    base = str(tmp_path_factory.mktemp("qwen2moe_base"))
    make_tiny_checkpoint(base, cfg)

    v1 = str(tmp_path_factory.mktemp("deepseek_v1"))
    tensors = load_file(os.path.join(base, "model.safetensors"))
    out = {}
    for name, arr in tensors.items():
        if name.endswith("shared_expert_gate.weight"):
            continue
        out[name.replace(".mlp.shared_expert.", ".mlp.shared_experts.")] \
            = arr
    save_file(out, os.path.join(v1, "model.safetensors"))
    with open(os.path.join(base, "config.json")) as f:
        c = json.load(f)
    c.update({
        "architectures": ["DeepseekForCausalLM"],
        "n_routed_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 32, "n_shared_experts": 2,
        "first_k_dense_replace": 1, "norm_topk_prob": False,
        "attention_bias": True,
    })
    with open(os.path.join(v1, "config.json"), "w") as f:
        json.dump(c, f)
    for fn in os.listdir(base):
        if fn != "config.json" and not fn.endswith(".safetensors"):
            shutil.copy(os.path.join(base, fn), os.path.join(v1, fn))

    oracle = tf.Qwen2MoeForCausalLM.from_pretrained(
        base, torch_dtype=torch.float32)
    oracle.eval()
    for layer in oracle.model.layers:
        blk = layer.mlp
        if hasattr(blk, "shared_expert_gate"):
            blk.shared_expert_gate.forward = (
                lambda x: torch.full(x.shape[:-1] + (1,), 1e4))

    llm = LLM(model=v1, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out_req in zip(PROMPTS, outs):
        ids = tok.encode(prompt)
        with torch.no_grad():
            gen = oracle.generate(
                torch.tensor([ids]), max_new_tokens=12, do_sample=False,
                num_beams=1, pad_token_id=2)
        expect = gen[0, len(ids):].tolist()
        n = min(len(out_req.outputs[0].token_ids), len(expect))
        assert out_req.outputs[0].token_ids[:n] == expect[:n], prompt


def test_minicpm3_matches_mup_scaled_deepseek_v2(tmp_path_factory):
    """MiniCPM3 = DeepSeek-V2 MLA attention (all layers dense) + the
    MiniCPM muP scales. Oracle: HF DeepseekV2 with forward hooks
    applying scale_emb and scale_depth/sqrt(L) exactly where the
    remote-code MiniCPM3 does (the dim_model_base logit scale is
    greedy-invariant and covered by the MiniCPM test's granite oracle).
    rope_interleave is pinned true so both sides run the deepseek
    rotary; the MiniCPM3 default (neox) only flips an independently
    tested apply_rope flag."""
    import json
    import os

    import numpy as np
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    scale_emb, scale_depth, dim_model_base = 12.0, 1.4, 32
    L, H = 3, 64
    cfg = tf.DeepseekV2Config(
        vocab_size=256, hidden_size=H, num_attention_heads=4,
        num_key_value_heads=4, num_hidden_layers=L,
        intermediate_size=128, first_k_dense_replace=L,
        n_routed_experts=4, num_experts_per_tok=2,  # unused: all dense
        q_lora_rank=16, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, head_dim=8,
        max_position_embeddings=128)
    torch.manual_seed(2)
    oracle = tf.DeepseekV2ForCausalLM(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_minicpm3"))
    oracle.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)

    cpath = os.path.join(path, "config.json")
    with open(cpath) as f:
        c = json.load(f)
    c["architectures"] = ["MiniCPM3ForCausalLM"]
    c["model_type"] = "minicpm3"
    for k in ("n_routed_experts", "num_experts_per_tok",
              "moe_intermediate_size", "n_shared_experts",
              "first_k_dense_replace"):
        c.pop(k, None)
    c.update({"scale_emb": scale_emb, "scale_depth": scale_depth,
              "dim_model_base": dim_model_base, "rope_interleave": True})
    with open(cpath, "w") as f:
        json.dump(c, f)

    oracle.eval()
    rm = scale_depth / np.sqrt(L)
    oracle.model.embed_tokens.register_forward_hook(
        lambda m, i, o: o * scale_emb)
    for layer in oracle.model.layers:
        layer.self_attn.o_proj.register_forward_hook(
            lambda m, i, o: o * rm)
        layer.mlp.down_proj.register_forward_hook(
            lambda m, i, o: o * rm)

    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              max_model_len=128, block_size=8)
    tok = llm.get_tokenizer()
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    for prompt, out_req in zip(PROMPTS, outs):
        ids = tok.encode(prompt)
        with torch.no_grad():
            gen = oracle.generate(
                torch.tensor([ids]), max_new_tokens=12, do_sample=False,
                num_beams=1, pad_token_id=2)
        expect = gen[0, len(ids):].tolist()
        n = min(len(out_req.outputs[0].token_ids), len(expect))
        assert out_req.outputs[0].token_ids[:n] == expect[:n], prompt


def test_mla_latent_vs_materialized(ds_dir, monkeypatch):
    """Latent-KV (absorbed) MLA == materialized MLA token-for-token,
    with the ~NH-fold smaller cache suffix."""
    from aphrodite_tpu.common.config import ModelConfig
    from aphrodite_tpu.models.deepseek import DeepseekV3ForCausalLM

    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)

    llm = LLM(model=ds_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    model = llm.engine.runner.model
    assert model.mla_latent
    assert model.kv_cache_shape_suffix == (2, model.head_eff)
    latent = [list(o.outputs[0].token_ids)
              for o in llm.generate(PROMPTS, sp)]
    del llm

    monkeypatch.setenv("APHRODITE_MLA_LATENT", "0")
    llm = LLM(model=ds_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    model = llm.engine.runner.model
    assert not model.mla_latent
    assert model.kv_cache_shape_suffix[0] == 2 * model.num_heads
    mat = [list(o.outputs[0].token_ids)
           for o in llm.generate(PROMPTS, sp)]
    assert latent == mat
