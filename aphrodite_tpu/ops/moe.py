"""Mixture-of-Experts: top-k routing + grouped expert matmuls.

TPU-native answer to the reference's fused-MoE stack
(modeling/layers/fused_moe/fused_moe.py Triton GEMM + layer.py, and its
TPU megablox path moe_pallas.py:gmm): tokens are sorted by expert and run
through `jax.lax.ragged_dot` (XLA's grouped matmul, which lowers to the
same megacore gmm on TPU), so each expert's tile work is contiguous on
the MXU instead of masked-dense.

Expert parallelism: experts are sharded over the "model" mesh axis
(leading E dim of w1/w2/w3); under shard_map each shard routes only to
its local experts and psums partial token outputs (EP in the reference is
TP-sharding inside FusedMoE — same math, SURVEY.md §2.5).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aphrodite_tpu.ops.attention import _smap_mesh
from jax.sharding import Mesh, PartitionSpec as P


def topk_routing(
    router_logits: jax.Array,  # [T, E]
    top_k: int,
    renormalize: bool = True,
    pre_softmax: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (weights f32[T, k], expert_ids i32[T, k]).

    pre_softmax=True is Mixtral-style: softmax over all experts, take
    top-k, optionally renormalize (reference fused_moe.py fused_topk).
    pre_softmax=False is GraniteMoe-style: take top-k LOGITS, softmax
    over just the selected k.
    """
    logits = router_logits.astype(jnp.float32)
    if not pre_softmax:
        top, ids = jax.lax.top_k(logits, top_k)
        return jax.nn.softmax(top, axis=-1), ids.astype(jnp.int32)
    probs = jax.nn.softmax(logits, axis=-1)
    weights, ids = jax.lax.top_k(probs, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def sparsemixer_routing(
    router_logits: jax.Array,  # [T, E]
    jitter_eps: float = 0.01,
) -> Tuple[jax.Array, jax.Array]:
    """PhiMoE inference-mode sparsemixer (reference phimoe sparsemixer;
    HF modeling_phimoe.sparsemixer with training=False): iterated
    masked-argmax top-2 where each expert's weight is its softmax
    probability over the 2*eps-thresholded gate set — weights are NOT
    renormalized over the selected pair."""
    s = router_logits.astype(jnp.float32)
    T = s.shape[0]

    def pick(scores_masked):
        m = jnp.max(scores_masked, axis=-1, keepdims=True)
        # scores.abs().clamp(min=m): threshold relative to the current
        # max, in units of the original score magnitudes.
        factor = jnp.maximum(jnp.abs(s), m)
        drop = ((m - s) / factor) > (2 * jitter_eps)
        gates = jnp.where(drop, -jnp.inf, scores_masked)
        sel = jnp.argmax(scores_masked, axis=-1).astype(jnp.int32)
        p = jax.nn.softmax(gates, axis=-1)
        w = jnp.take_along_axis(p, sel[:, None], axis=-1)[:, 0]
        return w, sel

    w1, e1 = pick(s)
    s2 = s.at[jnp.arange(T), e1].set(-jnp.inf)
    w2, e2 = pick(s2)
    return (jnp.stack([w1, w2], axis=-1),
            jnp.stack([e1, e2], axis=-1))


def materialize_experts(w, dtype):
    """Dense expert stack from an experts_int8 container ({q, scale})
    or a dense array (pass-through). Dequant happens per LAYER inside
    the model's lax.scan, so HBM holds the int8 form and only one
    layer's experts materialize at a time (the capacity win of the
    reference's experts_int8.py)."""
    if isinstance(w, dict):
        return (w["q"].astype(jnp.float32) * w["scale"]).astype(dtype)
    return w


def grouped_expert_mlp(
    x: jax.Array,  # [T, H]
    w1: jax.Array,  # [E, H, F]  (gate proj)
    w3: jax.Array,  # [E, H, F]  (up proj)
    w2: jax.Array,  # [E, F, H]  (down proj)
    weights: jax.Array,  # f32[T, k] routing weights
    expert_ids: jax.Array,  # i32[T, k]
) -> jax.Array:
    """SwiGLU expert MLP over top-k routed tokens via grouped matmul."""
    T, H = x.shape
    E = w1.shape[0]
    k = expert_ids.shape[1]
    TK = T * k

    flat_expert = expert_ids.reshape(TK)
    flat_weight = weights.reshape(TK)
    token_idx = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)

    # Sort the (token, expert) pairs by expert so each expert's rows are
    # contiguous (ragged_dot group layout).
    order = jnp.argsort(flat_expert)
    sorted_expert = flat_expert[order]
    sorted_token = token_idx[order]
    sorted_weight = flat_weight[order]
    group_sizes = jnp.bincount(sorted_expert, length=E).astype(jnp.int32)

    xs = x[sorted_token]  # [TK, H]
    gate = jax.lax.ragged_dot(xs, w1, group_sizes,
                              preferred_element_type=jnp.float32)
    up = jax.lax.ragged_dot(xs, w3, group_sizes,
                            preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = jax.lax.ragged_dot(act, w2, group_sizes,
                             preferred_element_type=jnp.float32)
    out = out * sorted_weight[:, None]

    # Un-sort and reduce the k expert contributions per token.
    result = jnp.zeros((T, out.shape[-1]), jnp.float32)
    result = result.at[sorted_token].add(out)
    return result.astype(x.dtype)


def moe_mlp(
    x: jax.Array,  # [T, H]
    router: jax.Array,  # [H, E]
    w1: jax.Array,
    w3: jax.Array,
    w2: jax.Array,
    top_k: int,
    *,
    renormalize: bool = True,
    pre_softmax: bool = True,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Full MoE block: route + grouped expert MLP (+ EP over the mesh).

    With a mesh, experts are sharded over "model": every shard computes
    routing for all tokens, masks non-local expert assignments to weight
    0 (tokens still flow through a local expert slot but contribute
    nothing), and a psum combines shards.
    """
    router_logits = jnp.dot(x, router, preferred_element_type=jnp.float32)
    weights, expert_ids = topk_routing(router_logits, top_k, renormalize,
                                       pre_softmax)
    return apply_experts(x, w1, w3, w2, weights, expert_ids, mesh=mesh)


def apply_experts(
    x: jax.Array,
    w1: jax.Array,
    w3: jax.Array,
    w2: jax.Array,
    weights: jax.Array,  # f32[T, k]
    expert_ids: jax.Array,  # i32[T, k]
    *,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Grouped expert application with optional EP over the mesh (the
    routing-agnostic half of moe_mlp; deepseek's sigmoid/group router
    computes its own weights and reuses this)."""
    w1 = materialize_experts(w1, x.dtype)
    w3 = materialize_experts(w3, x.dtype)
    w2 = materialize_experts(w2, x.dtype)
    if mesh is None:
        return grouped_expert_mlp(x, w1, w3, w2, weights, expert_ids)

    E = w1.shape[0]
    ep = mesh.shape["model"]
    e_local = E // ep

    def shard_fn(x, w1, w3, w2, weights, expert_ids):
        shard_idx = jax.lax.axis_index("model")
        lo = shard_idx * e_local
        local = (expert_ids >= lo) & (expert_ids < lo + e_local)
        local_ids = jnp.where(local, expert_ids - lo, 0)
        local_w = jnp.where(local, weights, 0.0)
        out = grouped_expert_mlp(x, w1, w3, w2, local_w, local_ids)
        return jax.lax.psum(out, "model")

    fn = jax.shard_map(
        shard_fn,
        mesh=_smap_mesh(mesh),
        in_specs=(P(), P("model"), P("model"), P("model"), P(), P()),
        out_specs=P(),
        axis_names={"model"},
        check_vma=False,
    )
    return fn(x, w1, w3, w2, weights, expert_ids)
