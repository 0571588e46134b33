"""In-graph verification of speculative proposals.

Reference: aphrodite/modeling/layers/rejection_sampler.py (:303).

Acceptance rules:
- greedy (lossless by construction): accept proposal t_j while
  argmax(p_target at j) == t_j; emit the argmax at the first mismatch.
- stochastic rejection sampling for delta-distribution drafts (n-gram
  proposals put probability 1 on their token): accept t_j with
  probability min(1, p(t_j)); on the first rejection resample from
  norm(relu(p - q)) = p with t_j zeroed, renormalized — which a
  Gumbel-argmax with t_j masked to -inf draws exactly. This preserves
  the target distribution (the standard speculative-sampling theorem).
  The target distribution is the *shaped* one (full sampler pipeline
  applied per position), matching non-speculative sampling.
- stochastic rejection sampling for model drafts (draft_lp given, the
  draft's full shaped log-distribution q per position): accept t_j
  with probability min(1, p(t_j)/q(t_j)); on the first rejection
  resample from norm(relu(p - q)) via Gumbel-argmax on log(p - q)+
  (positions where p <= q masked to -inf).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from aphrodite_tpu.sampling.metadata import SamplingFlags, SamplingTensors
from aphrodite_tpu.sampling.sampler import (NEG_INF, _keys_from_data,
                                            shaped_logprobs)


class SpecVerifyResult(NamedTuple):
    tokens: jax.Array  # i32[S, k+1] (accepted prefix + 1 target token)
    valid_len: jax.Array  # i32[S] in [1, k+1]
    tokens_logprob: jax.Array  # f32[S, k+1]


def verify_proposals_greedy(
    logits: jax.Array,  # f32[S, k+1, V]
    proposals: jax.Array,  # i32[S, k] (padding -1 = no proposal)
) -> SpecVerifyResult:
    S, kp1, V = logits.shape
    k = kp1 - 1
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    target = jnp.argmax(lp, axis=-1).astype(jnp.int32)  # [S, k+1]
    target_lp = jnp.take_along_axis(lp, target[..., None],
                                    axis=-1)[..., 0]

    if k > 0:
        has_prop = proposals >= 0
        match = (target[:, :k] == proposals) & has_prop  # [S, k]
        prefix_ok = jnp.cumprod(match.astype(jnp.int32), axis=1)
        a = prefix_ok.sum(axis=1)  # accepted count in [0, k]
    else:
        a = jnp.zeros((S,), jnp.int32)

    # Accepted proposals ARE the target argmaxes at those positions, so
    # the emitted tokens are simply target[:, :a+1] — token j for j <= a.
    return SpecVerifyResult(tokens=target, valid_len=a + 1,
                            tokens_logprob=target_lp)


def verify_proposals(
    logits: jax.Array,  # f32[S, k+1, V]
    proposals: jax.Array,  # i32[S, k]
    t: SamplingTensors,
    flags: SamplingFlags,
    draft_lp: Optional[jax.Array] = None,  # f32[S, k, V] shaped draft q
) -> SpecVerifyResult:
    """Mixed greedy/stochastic verification under the shaped target
    distribution. draft_lp=None means delta-distribution drafts
    (n-gram); otherwise full rejection sampling against the draft's
    distribution."""
    S, kp1, V = logits.shape
    k = kp1 - 1

    # Shape every position's distribution with the full pipeline: tile
    # the per-row tensors over positions ([S, k+1] -> [S*(k+1)]).
    flat = logits.reshape(S * kp1, V)
    t_flat = jax.tree.map(lambda x: jnp.repeat(x, kp1, axis=0), t)
    pos_fold = jnp.tile(jnp.arange(kp1, dtype=jnp.uint32), S)
    kd = t_flat.key_data
    kd = kd.at[:, 1].set(kd[:, 1] ^ (pos_fold * jnp.uint32(0x9E3779B9)))
    t_flat = t_flat._replace(key_data=kd)
    lp = shaped_logprobs(flat, t_flat, flags).reshape(S, kp1, V)

    target = jnp.argmax(lp, axis=-1).astype(jnp.int32)  # greedy path
    has_prop = proposals >= 0 if k > 0 else jnp.zeros((S, 0), bool)
    props_c = jnp.maximum(proposals, 0) if k > 0 else proposals

    keys = _keys_from_data(t.key_data)
    if k > 0:
        # Acceptance draws.
        u_keys = jax.vmap(lambda kk: jax.random.fold_in(kk, 0xAC))(keys)
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (k,)))(u_keys)
        prop_lp = jnp.take_along_axis(lp[:, :k, :], props_c[..., None],
                                      axis=-1)[..., 0]
        if draft_lp is None:
            accept_rand = u < jnp.exp(prop_lp)
        else:
            q_lp = jnp.take_along_axis(draft_lp, props_c[..., None],
                                       axis=-1)[..., 0]
            accept_rand = u < jnp.exp(
                jnp.minimum(prop_lp - q_lp, 0.0))
        greedy_match = target[:, :k] == props_c
        accepted = jnp.where(t.greedy_mask[:, None], greedy_match,
                             accept_rand) & has_prop
        prefix_ok = jnp.cumprod(accepted.astype(jnp.int32), axis=1)
        a = prefix_ok.sum(axis=1)
    else:
        a = jnp.zeros((S,), jnp.int32)

    # Resample distribution at each position: norm(relu(p - q)). For
    # delta drafts that is p with the proposal token masked out; for
    # model drafts it is log(p - q) where positive. At the bonus
    # position (j == k, no proposal) nothing is masked.
    j_idx = jnp.arange(kp1, dtype=jnp.int32)[None, :]
    if k > 0:
        mask_tok = jnp.concatenate(
            [jnp.where(has_prop, props_c, V), jnp.full((S, 1), V,
                                                       jnp.int32)],
            axis=1)  # [S, k+1]; V = out of range -> no mask
    else:
        mask_tok = jnp.full((S, 1), V, jnp.int32)
    vocab_ids = jnp.arange(V, dtype=jnp.int32)[None, None, :]
    lp_masked = jnp.where(vocab_ids == mask_tok[:, :, None], NEG_INF, lp)
    if draft_lp is not None and k > 0:
        diff = jnp.exp(lp[:, :k, :]) - jnp.exp(draft_lp)  # [S, k, V]
        resid_lp = jnp.where(diff > 0.0,
                             jnp.log(jnp.maximum(diff, 1e-38)), NEG_INF)
        # Rows where p <= q everywhere (p == q numerically) have no
        # residual mass; the delta-style masked p is the safe fallback
        # (rejection there has probability ~0 anyway).
        has_mass = jnp.any(diff > 0.0, axis=-1, keepdims=True)
        lp_masked = lp_masked.at[:, :k, :].set(
            jnp.where(has_mass, resid_lp, lp_masked[:, :k, :]))

    g_keys = jax.vmap(lambda kk: jax.random.fold_in(kk, 0x5B))(keys)
    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (kp1, V), dtype=jnp.float32))(
            g_keys)
    noised = jnp.where(jnp.isfinite(lp_masked), lp_masked + gumbel,
                       NEG_INF)
    resample = jnp.argmax(noised, axis=-1).astype(jnp.int32)  # [S, k+1]

    # Emitted token at output position j: the proposal for j < a; at
    # j == a greedy rows take the target argmax, stochastic rows take
    # the masked resample.
    props_full = jnp.concatenate(
        [props_c, jnp.zeros((S, 1), jnp.int32)], axis=1) if k > 0 else \
        jnp.zeros((S, 1), jnp.int32)
    chosen_at_reject = jnp.where(t.greedy_mask[:, None], target, resample)
    tokens = jnp.where(j_idx < a[:, None], props_full, chosen_at_reject)
    tokens_lp = jnp.take_along_axis(lp, tokens[..., None], axis=-1)[..., 0]
    return SpecVerifyResult(tokens=tokens, valid_len=a + 1,
                            tokens_logprob=tokens_lp)
