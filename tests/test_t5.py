"""T5 / Flan-T5 encoder-decoder tests vs HF transformers.

Exactness bar: greedy generation matches T5ForConditionalGeneration
token-for-token in fp32 — relative-position bucket biases (encoder
bidirectional, decoder causal), gated-gelu FFNs, tied-head scaling —
across batched requests with different encoder lengths."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams


def _tiny_cfg(gated=True, tie=True):
    import transformers as tf

    return tf.T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_decoder_layers=2, num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=1)


def _make(tmp, cfg, seed=0):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(seed)
    model = tf.T5ForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp)
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def hf_generate(model_dir, enc_ids, n):
    import torch
    import transformers as tf

    model = tf.T5ForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([enc_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, attention_mask=torch.ones_like(ids),
            max_new_tokens=n, do_sample=False, suppress_tokens=[1],
            pad_token_id=0)
    return out[0, 1:].tolist()


@pytest.mark.parametrize("gated,tie", [(True, True), (False, False)])
def test_t5_greedy_matches_hf(tmp_path, gated, tie):
    path = _make(tmp_path / "t5", _tiny_cfg(gated, tie), seed=1)
    llm = LLM(model=path, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    enc_prompts = [[10, 11, 12, 13, 14, 15, 16, 17, 18],
                   [30, 31, 32, 33]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[1])
    outs = llm.generate(
        [{"prompt_token_ids": ids} for ids in enc_prompts], sp)
    for ids, out in zip(enc_prompts, outs):
        expect = hf_generate(path, ids, 8)
        assert list(out.outputs[0].token_ids) == expect


def test_t5_tp2_matches_tp1(tmp_path):
    """Enc-dec TP on the T5 stack: heads/FFN columns + relative-bias
    head axis shard; both KV caches shard on the combined-head axis."""
    d = _make(tmp_path, _tiny_cfg())
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = ["summarize: the quick brown fox", "translate: hello"]
    o1 = LLM(model=d, dtype="float32",
             max_num_seqs=2).generate(prompts, sp)
    o2 = LLM(model=d, dtype="float32", max_num_seqs=2,
             tensor_parallel_size=2).generate(prompts, sp)
    assert [o.outputs[0].token_ids for o in o1] == \
        [o.outputs[0].token_ids for o in o2]
