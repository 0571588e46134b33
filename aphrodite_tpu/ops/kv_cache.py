"""Paged KV cache write (and, later, quantize-on-write).

TPU-native equivalent of the reference's ``reshape_and_cache(_flash)`` CUDA
kernel (kernels/cache_kernels.cu, bindings torch_bindings.cpp:454-491) and
of the TPU backend's ``write_to_kv_cache`` index_copy
(attention/backends/pallas.py:243-258): new K/V for every token in the step
are scattered into the paged cache at flat slot positions. XLA lowers the
scatter to an efficient dynamic-update; donation makes it in-place.

Cache layout (see ops/attention.py):
  kv_pages: [num_pages, page_size, 2*num_kv_heads, head_dim]
  flat slot = page_id * page_size + offset_in_page.

Padding tokens are given slots inside a reserved trash page (the runner
reserves the last physical page) so scatter stays branch-free.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def write_kv(
    kv_pages: jax.Array,  # [num_pages, page_size, 2*K, D]
    new_k: jax.Array,  # [T, K, D]
    new_v: jax.Array,  # [T, K, D]
    slot_mapping: jax.Array,  # i32[T] flat slots; padding -> trash slots
    *,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
) -> jax.Array:
    """Scatter new K/V into the paged cache; returns the updated cache.

    With `k_scale`/`v_scale` and a narrow cache dtype the write quantizes
    on the fly (value/scale layout matches the attention op's dequant).
    """
    num_pages, page_size, num_combined, head_dim = kv_pages.shape
    T, num_kv_heads, _ = new_k.shape
    assert num_combined == 2 * num_kv_heads, (num_combined, num_kv_heads)

    cache_dtype = kv_pages.dtype
    if k_scale is not None:
        new_k = (new_k.astype(jnp.float32) / k_scale)
    if v_scale is not None:
        new_v = (new_v.astype(jnp.float32) / v_scale)
    if cache_dtype == jnp.int8:
        new_k = jnp.clip(jnp.round(new_k), -128, 127)
        new_v = jnp.clip(jnp.round(new_v), -128, 127)
    new_k = new_k.astype(cache_dtype)
    new_v = new_v.astype(cache_dtype)

    # Interleave K/V on the combined-head axis: [T, 2K, D].
    kv = jnp.stack([new_k, new_v], axis=2)  # [T, K, 2, D]
    kv = kv.reshape(T, num_combined, head_dim)

    flat = kv_pages.reshape(num_pages * page_size, num_combined, head_dim)
    flat = flat.at[slot_mapping].set(kv, mode="drop",
                                     unique_indices=False)
    return flat.reshape(kv_pages.shape)


def copy_blocks(
    kv_pages: jax.Array,
    src_dst: jax.Array,  # i32[N, 2] (src_block, dst_block); -1 rows = no-op
) -> jax.Array:
    """Block-granularity copies for copy-on-write after a fork
    (reference `copy_blocks`, kernels/cache_kernels.cu).

    Padded rows must point both src and dst at the trash page (or use
    src == dst) so the op stays shape-static.
    """
    src = src_dst[:, 0]
    dst = src_dst[:, 1]
    data = kv_pages[src]
    return kv_pages.at[dst].set(data, mode="drop")
