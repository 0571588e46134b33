"""Grouped LoRA application: the TPU answer to Punica SGMV.

Reference: aphrodite/lora/ops/*.py (Triton SGMV/BGMV) + kernels/punica/
punica_ops.cu. Per-token adapter routing is a grouped matmul: tokens are
pre-sorted by adapter slot (host-side, ForwardBatch.lora_*) and both
low-rank projections run through jax.lax.ragged_dot, which XLA lowers to
the TPU grouped-matmul path (same as MoE experts).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp


def lora_delta(
    x: jax.Array,  # [T, in]
    A: jax.Array,  # [n_slots, in, r]
    B: jax.Array,  # [n_slots, r, out]
    sorted_idx: jax.Array,  # i32[T]
    unsort_idx: jax.Array,  # i32[T]
    group_sizes: jax.Array,  # i32[n_slots]
) -> jax.Array:
    """Returns the LoRA contribution [T, out] = (x @ A_slot) @ B_slot.

    Slot 0 rows go through zero matrices, so no masking is needed.
    """
    xs = x[sorted_idx]
    low = jax.lax.ragged_dot(xs, A, group_sizes,
                             preferred_element_type=jnp.float32)
    low = low.astype(x.dtype)
    out = jax.lax.ragged_dot(low, B, group_sizes,
                             preferred_element_type=jnp.float32)
    return out[unsort_idx]
