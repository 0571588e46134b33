"""Model <-> runner interface types."""

from typing import NamedTuple, Optional

import jax


class ForwardBatch(NamedTuple):
    """Flat, static-shape inputs for one step (T padded tokens, S padded
    sequences). This is the TPU-native analog of the reference's
    ModelInput + AttentionMetadata pair (worker/model_runner.py:179,
    attention/backends/abstract.py)."""

    # [T] token ids (padding: 0).
    token_ids: jax.Array
    # [T] absolute position of each token in its sequence (padding: 0).
    positions: jax.Array
    # [T] flat KV slot (= page * page_size + offset); padding rows point
    # into the reserved trash page.
    slot_mapping: jax.Array
    # [S] post-step KV length per sequence (padding: 0).
    kv_lens: jax.Array
    # [S, pages_per_seq] physical page ids per sequence (padding: 0).
    page_indices: jax.Array
    # [S+1] cumulative query lengths (padding: repeated last value).
    cu_q_lens: jax.Array
    # [1] actual number of sequences.
    num_seqs: jax.Array
    # [S] index into [T] of the last token of each sequence (for logits
    # extraction; padding: 0).
    logits_indices: jax.Array
    # Multi-LoRA routing (None when no adapters are active): tokens
    # sorted by adapter slot for grouped matmuls (ops/lora.py).
    lora_sorted_idx: Optional[jax.Array] = None  # i32[T]
    lora_unsort_idx: Optional[jax.Array] = None  # i32[T]
    lora_group_sizes: Optional[jax.Array] = None  # i32[n_slots]
    # Multimodal: precomputed input embeddings that REPLACE the token
    # embedding at masked positions (image placeholder tokens). This is
    # the TPU-native analog of the reference's inputs_embeds merge
    # (models/llava.py merge_multimodal_embeddings): vision encoding runs
    # once at request-add time, prefill consumes the cached features.
    embeds_override: Optional[jax.Array] = None  # [T, H] model dtype
    embeds_mask: Optional[jax.Array] = None  # bool[T]
    # Encoder-decoder (BART): per-sequence CROSS-attention page table +
    # encoder lengths. Cross KV is written once by the encoder program
    # and read-only afterwards (worker/model_runner.py enc-dec path).
    cross_page_indices: Optional[jax.Array] = None  # i32[S, enc_pages]
    cross_kv_lens: Optional[jax.Array] = None  # i32[S]
    # M-RoPE (Qwen2-VL): absolute [3, T] temporal/height/width rope
    # positions (per-sequence position delta already applied). When set,
    # models with an mrope_section use it for the rotary lookup instead
    # of `positions`; `positions` stays the true sequence index (slot
    # mapping / KV bookkeeping are unaffected). Reference:
    # modeling/layers/rotary_embedding.py MRotaryEmbedding.
    mrope_positions: Optional[jax.Array] = None  # i32[3, T]
    # Long-context LoRA (reference LinearScalingRotaryEmbeddingWithLora):
    # per-token offset into the model's appended per-factor rope-table
    # regions. rope lookup uses positions + rope_offsets; slot mapping /
    # KV bookkeeping keep the true positions. None = no offsets.
    rope_offsets: Optional[jax.Array] = None  # i32[T]
