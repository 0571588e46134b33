"""Model forward correctness vs HuggingFace transformers (float32, CPU).

Reference test strategy: tests/models/* compare engine logits vs HF
(SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aphrodite_tpu.common.config import LoadConfig, ModelConfig
from aphrodite_tpu.loader.weights import load_model_params
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.llama import LlamaForCausalLM

from tests.utils import hf_full_logits

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.smoke

PAGE_SIZE = 4
NUM_PAGES = 64
PAGES_PER_SEQ = 32  # 128 tokens max


def build_model(model_dir):
    mc = ModelConfig(model=model_dir, dtype="float32")
    model = LlamaForCausalLM(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)
    return model, params


def empty_kv(model, dtype=jnp.float32):
    return jnp.zeros(
        (model.num_layers, NUM_PAGES, PAGE_SIZE) +
        model.kv_cache_shape_suffix,
        dtype=dtype,
    )


def prefill_batch(token_ids, pages):
    """Single-sequence prefill batch using pages [p0, p1, ...]."""
    T = len(token_ids)
    S = 2  # padded seqs
    page_indices = np.zeros((S, PAGES_PER_SEQ), np.int32)
    page_indices[0, :len(pages)] = pages
    slot_mapping = np.array(
        [pages[i // PAGE_SIZE] * PAGE_SIZE + i % PAGE_SIZE
         for i in range(T)],
        np.int32)
    return ForwardBatch(
        token_ids=jnp.asarray(token_ids, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.asarray(slot_mapping),
        kv_lens=jnp.asarray([T, 0], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, T, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        logits_indices=jnp.asarray([T - 1, 0], jnp.int32),
    )


def test_prefill_logits_match_hf(tiny_llama_dir):
    model, params = build_model(tiny_llama_dir)
    kv = empty_kv(model)
    rng = np.random.default_rng(0)
    token_ids = rng.integers(3, 250, size=17).tolist()

    batch = prefill_batch(token_ids, pages=[1, 2, 3, 4, 5])
    kv, hidden = model.forward(params, kv, batch)
    ours = np.asarray(model.compute_logits(params, hidden))  # [T, V]

    ref = hf_full_logits(tiny_llama_dir, token_ids)
    np.testing.assert_allclose(ours[:len(token_ids)], ref, atol=5e-3,
                               rtol=5e-3)


def test_decode_matches_prefill(tiny_llama_dir):
    """KV-cache decode must produce the same logits as full prefill."""
    model, params = build_model(tiny_llama_dir)
    rng = np.random.default_rng(1)
    token_ids = rng.integers(3, 250, size=12).tolist()

    # Full prefill of all 12 tokens.
    kv_a = empty_kv(model)
    batch = prefill_batch(token_ids, pages=[1, 2, 3])
    kv_a, hidden_a = model.forward(params, kv_a, batch)
    full_logits = np.asarray(model.compute_logits(params, hidden_a))

    # Prefill 11 tokens, then decode token 12 using the paged cache.
    kv_b = empty_kv(model)
    batch_pre = prefill_batch(token_ids[:11], pages=[1, 2, 3])
    kv_b, _ = model.forward(params, kv_b, batch_pre)

    t = token_ids[11]
    page_indices = np.zeros((2, PAGES_PER_SEQ), np.int32)
    page_indices[0, :3] = [1, 2, 3]
    decode_batch = ForwardBatch(
        token_ids=jnp.asarray([t], jnp.int32),
        positions=jnp.asarray([11], jnp.int32),
        # Token index 11 -> logical page 2 (= physical page 3), offset 3.
        slot_mapping=jnp.asarray([3 * PAGE_SIZE + 3], jnp.int32),
        kv_lens=jnp.asarray([12, 0], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, 1, 1], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        logits_indices=jnp.asarray([0, 0], jnp.int32),
    )
    kv_b, hidden_b = model.forward(params, kv_b, decode_batch)
    decode_logits = np.asarray(model.compute_logits(params, hidden_b))

    np.testing.assert_allclose(decode_logits[0], full_logits[11], atol=5e-3,
                               rtol=5e-3)


def test_two_sequence_ragged_batch(tiny_llama_dir):
    """Mixed batch: two sequences prefilled in one ragged step must match
    independent prefills."""
    model, params = build_model(tiny_llama_dir)
    rng = np.random.default_rng(2)
    seq1 = rng.integers(3, 250, size=7).tolist()
    seq2 = rng.integers(3, 250, size=5).tolist()

    # Independent references.
    ref1 = hf_full_logits(tiny_llama_dir, seq1)
    ref2 = hf_full_logits(tiny_llama_dir, seq2)

    kv = empty_kv(model)
    T = len(seq1) + len(seq2)
    page_indices = np.zeros((2, PAGES_PER_SEQ), np.int32)
    page_indices[0, :2] = [1, 2]
    page_indices[1, :2] = [3, 4]
    slots = ([1 * PAGE_SIZE + i % PAGE_SIZE if i < PAGE_SIZE else
              2 * PAGE_SIZE + (i - PAGE_SIZE) for i in range(len(seq1))] +
             [3 * PAGE_SIZE + i if i < PAGE_SIZE else
              4 * PAGE_SIZE + (i - PAGE_SIZE) for i in range(len(seq2))])
    batch = ForwardBatch(
        token_ids=jnp.asarray(seq1 + seq2, jnp.int32),
        positions=jnp.asarray(
            list(range(len(seq1))) + list(range(len(seq2))), jnp.int32),
        slot_mapping=jnp.asarray(slots, jnp.int32),
        kv_lens=jnp.asarray([len(seq1), len(seq2)], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, len(seq1), T], jnp.int32),
        num_seqs=jnp.asarray([2], jnp.int32),
        logits_indices=jnp.asarray([len(seq1) - 1, T - 1], jnp.int32),
    )
    kv, hidden = model.forward(params, kv, batch)
    logits = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(logits[:len(seq1)], ref1, atol=5e-3,
                               rtol=5e-3)
    np.testing.assert_allclose(logits[len(seq1):T], ref2, atol=5e-3,
                               rtol=5e-3)
