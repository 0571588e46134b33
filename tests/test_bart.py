"""BART encoder-decoder engine tests vs HF transformers.

Exactness bar: greedy generation from an encoder prompt matches HF's
BartForConditionalGeneration token-for-token in fp32 — including the
encoder pass -> cross-KV pages write, paged decoder self-attention,
cross-attention reads, and explicit decoder prompts (forced-BOS
convention)."""

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams


def _tiny_cfg(forced_bos=None):
    import transformers as tf

    return tf.BartConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_position_embeddings=128, scale_embedding=False,
        activation_function="gelu", bos_token_id=0, pad_token_id=1,
        eos_token_id=2, decoder_start_token_id=2,
        forced_bos_token_id=forced_bos, forced_eos_token_id=None,
    )


@pytest.fixture(scope="module")
def bart_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    torch.manual_seed(0)
    model = tf.BartForConditionalGeneration(_tiny_cfg()).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_bart"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def hf_generate(model_dir, enc_ids, max_new_tokens, decoder_ids=None,
                forced_bos=None):
    import torch
    import transformers as tf

    model = tf.BartForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([enc_ids], dtype=torch.long)
    kwargs = {}
    if decoder_ids is not None:
        kwargs["decoder_input_ids"] = torch.tensor([decoder_ids],
                                                   dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids=ids, attention_mask=torch.ones_like(ids),
            max_new_tokens=max_new_tokens, do_sample=False,
            suppress_tokens=[2], forced_bos_token_id=forced_bos,
            pad_token_id=1, **kwargs)
    skip = len(decoder_ids) if decoder_ids is not None else 1
    return out[0, skip:].tolist()


def test_bart_greedy_matches_hf(bart_dir):
    llm = LLM(model=bart_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    enc_prompts = [[10, 11, 12, 13, 14, 15, 16],
                   [30, 31, 32, 33]]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True,
                        custom_token_bans=[2])
    outs = llm.generate(
        [{"prompt_token_ids": ids} for ids in enc_prompts], sp)
    for ids, out in zip(enc_prompts, outs):
        expect = hf_generate(bart_dir, ids, 10)
        assert list(out.outputs[0].token_ids) == expect


def test_bart_explicit_decoder_prompt_forced_bos(bart_dir):
    """decoder_prompt_token_ids=[start, bos] reproduces HF's forced-BOS
    generation convention."""
    llm = LLM(model=bart_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    enc_ids = [40, 41, 42, 43, 44]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": enc_ids,
          "decoder_prompt_token_ids": [2, 0]}], sp)[0].outputs[0]
    expect = hf_generate(bart_dir, enc_ids, 8, decoder_ids=[2, 0])
    assert list(out.token_ids) == expect


def test_bart_mixed_batch_and_long_encoder(bart_dir):
    """Batched requests with different encoder lengths (cross pages per
    sequence) stay exact; one request crosses a page boundary."""
    llm = LLM(model=bart_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    rng = np.random.default_rng(0)
    enc_prompts = [
        [int(t) for t in rng.integers(5, 250, size=21)],  # 3 pages
        [int(t) for t in rng.integers(5, 250, size=4)],
        [int(t) for t in rng.integers(5, 250, size=13)],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                        custom_token_bans=[2])
    outs = llm.generate(
        [{"prompt_token_ids": ids} for ids in enc_prompts], sp)
    for ids, out in zip(enc_prompts, outs):
        expect = hf_generate(bart_dir, ids, 6)
        assert list(out.outputs[0].token_ids) == expect


@pytest.fixture(scope="module")
def mbart_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.MBartConfig(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_position_embeddings=128, scale_embedding=False,
        activation_function="gelu", bos_token_id=0, pad_token_id=1,
        eos_token_id=2, decoder_start_token_id=2,
        forced_bos_token_id=None, forced_eos_token_id=None)
    torch.manual_seed(1)
    model = tf.MBartForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_mbart"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=256)
    return path


def test_mbart_greedy_matches_hf(mbart_dir):
    """mBART pre-norm + final layer_norm variant stays exact."""
    import torch
    import transformers as tf

    llm = LLM(model=mbart_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    enc_ids = [10, 11, 12, 13, 14]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate([{"prompt_token_ids": enc_ids}], sp)[0].outputs[0]

    model = tf.MBartForConditionalGeneration.from_pretrained(
        mbart_dir, torch_dtype=torch.float32)
    model.eval()
    ids = torch.tensor([enc_ids], dtype=torch.long)
    with torch.no_grad():
        exp = model.generate(
            input_ids=ids, attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False, suppress_tokens=[2],
            forced_bos_token_id=None, pad_token_id=1)
    assert list(out.token_ids) == exp[0, 1:].tolist()


def test_bart_decoder_logits_match_hf(bart_dir):
    """Full-logits comparison (greedy-token checks can argmax-mask
    layout errors in the cross-KV gather)."""
    import torch
    import transformers as tf

    import jax.numpy as jnp

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.bart import BartForConditionalGeneration
    from aphrodite_tpu.models.interface import ForwardBatch

    mc = ModelConfig(model=bart_dir, dtype="float32")
    m = BartForConditionalGeneration(mc)
    params = load_model_params(m, mc, LoadConfig(), mesh=None)

    enc_ids = [10, 11, 12, 13, 14]
    dec_ids = [2, 0, 7, 9]
    E, T = len(enc_ids), len(dec_ids)
    page = 8
    cross = jnp.zeros((m.num_layers, 9, page) +
                      m.cross_kv_cache_shape_suffix, jnp.float32)
    toks = np.zeros(16, np.int32); toks[:E] = enc_ids
    pos = np.zeros(16, np.int32); pos[:E] = np.arange(E)
    slots = np.full(16, 8 * page, np.int32)
    slots[:E] = 1 * page + np.arange(E)
    cross = m.encode_and_write_cross(
        params, cross, jnp.asarray(toks), jnp.asarray(pos),
        jnp.asarray(slots), jnp.asarray([E], np.int32))

    kv = jnp.zeros((m.num_layers, 9, page) + m.kv_cache_shape_suffix,
                   jnp.float32)
    pi = np.zeros((2, 4), np.int32); pi[0, 0] = 2
    ci = np.zeros((2, 4), np.int32); ci[0, 0] = 1
    Tp = 8
    tok = np.zeros(Tp, np.int32); tok[:T] = dec_ids
    dpos = np.zeros(Tp, np.int32); dpos[:T] = np.arange(T)
    dslots = np.full(Tp, 8 * page, np.int32)
    dslots[:T] = 2 * page + np.arange(T)
    b = ForwardBatch(
        token_ids=jnp.asarray(tok), positions=jnp.asarray(dpos),
        slot_mapping=jnp.asarray(dslots),
        kv_lens=jnp.asarray([T, 0], jnp.int32),
        page_indices=jnp.asarray(pi),
        cu_q_lens=jnp.asarray([0, T, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        logits_indices=jnp.asarray([T - 1, 0], jnp.int32),
        cross_page_indices=jnp.asarray(ci),
        cross_kv_lens=jnp.asarray([E, 0], jnp.int32))
    kv, h = m.forward(params, kv, b, cross_kv=cross)
    got = np.asarray(m.compute_logits(params, h))[:T]

    hf = tf.BartForConditionalGeneration.from_pretrained(
        bart_dir, torch_dtype=torch.float32)
    hf.eval()
    with torch.no_grad():
        expect = hf(input_ids=torch.tensor([enc_ids]),
                    decoder_input_ids=torch.tensor([dec_ids])
                    ).logits[0].numpy()
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_bart_tp2_matches_tp1(bart_dir):
    """Enc-dec tensor parallelism: heads + FFN columns shard, both KV
    caches shard on the interleaved combined-head axis."""
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = ["the quick brown fox", "hello world, this is"]
    o1 = LLM(model=bart_dir, dtype="float32",
             max_num_seqs=2).generate(prompts, sp)
    o2 = LLM(model=bart_dir, dtype="float32", max_num_seqs=2,
             tensor_parallel_size=2).generate(prompts, sp)
    assert [o.outputs[0].token_ids for o in o1] == \
        [o.outputs[0].token_ids for o in o2]
