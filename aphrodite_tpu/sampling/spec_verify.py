"""In-graph verification of speculative proposals.

Reference: aphrodite/modeling/layers/rejection_sampler.py (:303). This
round implements the **greedy** acceptance rule, which is exact and
lossless: accept proposal t_j while argmax(p_target at j) == t_j; emit
the target argmax at the first mismatch (or a bonus argmax when all k
match). The runner gates speculation to all-greedy batches; stochastic
rejection sampling (norm(relu(p-q)) resampling) extends this verify path
in a later round.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


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
