"""The in-graph sampler: the full Aphrodite sampling pipeline as one JAX
function over a padded batch of logits.

Re-design of the reference Sampler (aphrodite/modeling/layers/sampler.py:168,
pipeline :240): every stage — penalties, DRY, no-repeat-ngram, temperature +
dynatemp, top-nsigma, top-k/p, top-a, min-p, TFS, eta/epsilon cutoffs,
typical-p, quadratic, XTC, skew — is a vectorized [S, V] transform compiled
into the step program. The reference runs these as eager torch ops on GPU and
*skips them entirely on TPU* (tpu_model_runner.py:431-481); here they are
TPU-native: trace-time `SamplingFlags` select only the stages the batch needs,
so simple batches compile to plain (greedy|gumbel) sampling.

Semantics follow the reference formulas exactly, with two documented
divergences:
- `_apply_top_nsigma` computes std over finite logits only (the reference
  includes -inf rows, yielding NaN thresholds that silently disable the
  sampler when any token was banned).
- `_apply_dry` counts actual suffix matches (the reference's inner loop
  counts the first mismatching position as matched, over-penalizing by 1,
  sampler.py:826 `unwind + 1` after `break`).

Sampling itself is Gumbel-argmax over the final log-probs with per-row
threefry keys (seeded determinism, reference SamplingType.RANDOM_SEED) and
greedy rows taking pure argmax.
"""

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from aphrodite_tpu.sampling.metadata import SamplingFlags, SamplingTensors

NEG_INF = float("-inf")
# Static cap of the DRY suffix-match length (reference MAX_NGRAM=100,
# sampler.py:765).
DRY_MAX_NGRAM = 64
# Static cap of no_repeat_ngram_size (the [S,V] ban mask is built with a
# python loop of this many steps).
MAX_NGRAM_SIZE = 32
_TEMPERATURE_MINIMUM = 2e-5


class SamplerOutput(NamedTuple):
    """Device results of one sampling call (all [S]-leading)."""

    sampled: Any  # i32[S] sampled token ids
    sampled_logprob: Any  # f32[S] logprob of the sampled token
    sampled_rank: Any  # i32[S] 1-based rank of the sampled token
    topk_ids: Any  # i32[S, K] (K = flags.max_logprobs; [S, 0] if disabled)
    topk_logprobs: Any  # f32[S, K]


def _keys_from_data(key_data: jax.Array) -> jax.Array:
    """uint32[S, 2] -> typed threefry key array [S]."""
    return jax.random.wrap_key_data(key_data, impl="threefry2x32")


# ---------------------------------------------------------------------------
# History-dependent stages (penalties, DRY, no-repeat-ngram)
# ---------------------------------------------------------------------------


def _history_masks(history: jax.Array, history_lens: jax.Array,
                   prompt_lens: jax.Array, vocab_size: int):
    """Returns (prompt_mask[S,V], output_mask[S,V], output_counts[S,V])."""
    S, H = history.shape
    pos = jnp.arange(H, dtype=jnp.int32)[None, :]
    in_prompt = pos < prompt_lens[:, None]
    in_output = (pos >= prompt_lens[:, None]) & (pos < history_lens[:, None])
    # Scatter-add into V+1 bins; padding token id == vocab_size lands in the
    # extra bin (reference _get_bin_counts_and_mask, sampler.py:597).
    def count(mask):
        ones = mask.astype(jnp.int32)
        counts = jnp.zeros((S, vocab_size + 1), jnp.int32)
        counts = jax.vmap(lambda c, h, o: c.at[h].add(o))(counts, history,
                                                          ones)
        return counts[:, :vocab_size]

    prompt_counts = count(in_prompt)
    output_counts = count(in_output)
    return prompt_counts > 0, output_counts > 0, output_counts


def _apply_penalties(logits, t: SamplingTensors, prompt_mask, output_mask,
                     output_counts):
    """Repetition/presence/frequency penalties (reference sampler.py:634)."""
    seen = prompt_mask | output_mask
    rep = jnp.where(seen, t.repetition_penalty[:, None], 1.0)
    logits = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = logits - t.frequency_penalty[:, None] * output_counts
    logits = logits - t.presence_penalty[:, None] * output_mask
    return logits


def _apply_dry(logits, t: SamplingTensors, history, history_lens,
               vocab_size: int):
    """DRY repetition penalty (reference sampler.py:749), vectorized.

    For each candidate continuation token, find the longest suffix of the
    context that would be repeated if that token were emitted, and subtract
    multiplier * base^(match_len - allowed_length).
    """
    S, H = history.shape

    def row(logits_row, seq, n, mult, base, allowed, rng, breakers):
        pos = jnp.arange(H, dtype=jnp.int32)
        # Range limit: only the last `rng` tokens participate (0 = all).
        window_start = jnp.where(rng > 0, jnp.maximum(n - rng, 0), 0)
        valid = (pos >= window_start) & (pos < n)
        is_break = jnp.isin(seq, breakers) & valid
        last = seq[jnp.maximum(n - 1, 0)]
        last_is_break = jnp.isin(last, breakers).any()

        # max_ngram: length of the break-free tail (excluding breaks),
        # capped (reference sampler.py:776-781).
        tail_t = jnp.arange(1, DRY_MAX_NGRAM + 2, dtype=jnp.int32)
        tail_idx = jnp.maximum(n - 1 - tail_t, 0)
        tail_break = is_break[tail_idx] | (n - 1 - tail_t < window_start)
        # First t >= 1 whose position is a break bounds the match length.
        max_ngram = jnp.where(tail_break.any(),
                              jnp.argmax(tail_break) + 1,
                              DRY_MAX_NGRAM + 1)
        max_ngram = jnp.minimum(max_ngram, DRY_MAX_NGRAM)

        # cond[idx, t] (t = 1..DRY_MAX_NGRAM): seq[idx-t] matches the
        # context suffix seq[n-1-t] and is not a break.
        tvec = jnp.arange(1, DRY_MAX_NGRAM + 1, dtype=jnp.int32)
        idx = pos[:, None]  # [H, 1]
        tmat = tvec[None, :]  # [1, M]
        back = idx - tmat  # [H, M]
        back_ok = back >= window_start
        back_c = jnp.maximum(back, 0)
        suf = jnp.maximum(n - 1 - tmat, 0)  # [1, M]
        cond = (seq[back_c] == seq[suf]) & back_ok & (~is_break[back_c]) & (
            tmat < max_ngram)
        run = jnp.cumprod(cond.astype(jnp.int32), axis=1).sum(axis=1)  # [H]

        is_endpoint = (seq == last) & (pos < n - 1) & valid
        m = jnp.where(is_endpoint, run + 1, 0)  # [H] match lengths
        nxt = seq[jnp.minimum(pos + 1, H - 1)]
        ngram_lens = jnp.zeros((vocab_size + 1,), jnp.int32)
        ngram_lens = ngram_lens.at[nxt].max(m)
        ngram_lens = ngram_lens[:vocab_size]

        apply_row = (mult > 0) & (~last_is_break) & (max_ngram > allowed)
        penalty = jnp.where(
            (ngram_lens > 0) & apply_row,
            mult * base**(ngram_lens.astype(jnp.float32) -
                          allowed.astype(jnp.float32)),
            0.0,
        )
        return logits_row - penalty

    return jax.vmap(row)(logits, history, history_lens, t.dry_multiplier,
                         t.dry_base, t.dry_allowed_length, t.dry_range,
                         t.dry_breakers)


def _apply_no_repeat_ngram(logits, t: SamplingTensors, history,
                           history_lens, vocab_size: int):
    """Ban tokens that would complete an already-seen n-gram (reference
    sampler.py:832, HF-style no_repeat_ngram_size)."""
    S, H = history.shape
    pos = jnp.arange(H, dtype=jnp.int32)[None, :]  # [1, H]
    k = t.no_repeat_ngram_size[:, None]  # [S, 1]
    n = history_lens[:, None]

    # match[s, idx] = True iff history[idx : idx+k-1] equals the current
    # (k-1)-token tail history[n-k+1 : n].
    match = jnp.ones((S, H), dtype=bool)
    for tt in range(MAX_NGRAM_SIZE - 1):
        within = tt < (k - 1)
        a_idx = jnp.minimum(pos + tt, H - 1)
        b_idx = jnp.clip(n - (k - 1) + tt, 0, H - 1)
        a = jnp.take_along_axis(history, a_idx, axis=1)
        b = jnp.take_along_axis(history, b_idx, axis=1)
        match &= jnp.where(within, a == b, True)
    # idx must leave room for the banned token: idx + k - 1 <= n - 1.
    match &= (pos + k - 1) <= (n - 1)
    match &= (k > 0) & (n >= k)

    banned_idx = jnp.clip(pos + k - 1, 0, H - 1)
    banned_tok = jnp.take_along_axis(history, banned_idx, axis=1)  # [S, H]
    ban_mask = jnp.zeros((S, vocab_size + 1), dtype=bool)
    ban_mask = jax.vmap(lambda bm, tok, m: bm.at[tok].max(m))(ban_mask,
                                                              banned_tok,
                                                              match)
    return jnp.where(ban_mask[:, :vocab_size], NEG_INF, logits)


# ---------------------------------------------------------------------------
# Distribution-shaping stages
# ---------------------------------------------------------------------------


def _apply_temperatures(logits, t: SamplingTensors, flags: SamplingFlags):
    """Temperature + entropy-adaptive dynatemp (reference sampler.py:657)."""
    temps = t.temperature
    dyn_mask = (t.dynatemp_min != 0) | (t.dynatemp_max != 0)
    if True:  # dynatemp is cheap enough to compute unconditionally in-graph
        shifted = jax.nn.log_softmax(logits, axis=-1)
        probs = jnp.exp(shifted)
        ent = -jnp.sum(jnp.where(probs > 0, probs * shifted, 0.0), axis=-1)
        num_valid = jnp.sum(logits > NEG_INF, axis=-1).astype(jnp.float32)
        max_ent = jnp.log(jnp.maximum(num_valid, 2.0))
        norm_ent = ent / max_ent
        dyn_temp = (t.dynatemp_min + (t.dynatemp_max - t.dynatemp_min) *
                    norm_ent**t.dynatemp_exp)
        temps = jnp.where(dyn_mask, dyn_temp, temps)
    temps = jnp.where(jnp.isnan(temps), _TEMPERATURE_MINIMUM, temps)
    temps = jnp.maximum(temps, _TEMPERATURE_MINIMUM)
    # Low temperatures shift the max logit to 1 to avoid saturation
    # (reference sampler.py:684-688).
    low = temps < 0.1
    shift = jnp.max(logits, axis=-1, keepdims=True) - 1.0
    logits = jnp.where(low[:, None], logits - shift, logits)
    return logits / temps[:, None]


def _apply_top_k_top_p(logits, t: SamplingTensors):
    """Joint top-k + top-p in one sorted pass (reference sampler.py:865)."""
    S, V = logits.shape
    sort_idx = jnp.argsort(-logits, axis=-1)  # descending
    logits_sort = jnp.take_along_axis(logits, sort_idx, axis=-1)
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
    keep_k = ranks < t.top_k[:, None]
    probs_sort = jax.nn.softmax(logits_sort, axis=-1)
    cum = jnp.cumsum(probs_sort, axis=-1)
    # Keep tokens while the cumulative mass *before* them is < top_p
    # (reference keeps sorted-ascending mass <= 1-p; equivalent).
    keep_p = (cum - probs_sort) < t.top_p[:, None]
    keep_p = keep_p.at[:, 0].set(True)  # always keep the top token
    keep = keep_k & keep_p
    logits_sort = jnp.where(keep, logits_sort, NEG_INF)
    inv = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(logits_sort, inv, axis=-1)


def _apply_min_p(logits, t: SamplingTensors):
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < t.min_p[:, None] * top, NEG_INF, logits)


def _apply_top_a(logits, t: SamplingTensors):
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    threshold = top * top * t.top_a[:, None]
    return jnp.where(probs < threshold, NEG_INF, logits)


def _apply_tfs(logits, t: SamplingTensors):
    """Tail-free sampling via curvature CDF (reference sampler.py:924)."""
    S, V = logits.shape
    sort_idx = jnp.argsort(-logits, axis=-1)
    logits_sort = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(logits_sort, axis=-1)
    d2 = jnp.abs(jnp.diff(jnp.diff(probs, axis=-1), axis=-1))  # [S, V-2]
    denom = jnp.sum(d2, axis=-1, keepdims=True)
    norm_d2 = d2 / jnp.where(denom == 0, 1.0, denom)
    cdf = jnp.cumsum(norm_d2, axis=-1)
    mask_mid = cdf > t.tfs[:, None]  # [S, V-2]
    drop = jnp.concatenate(
        [
            jnp.zeros((S, 1), dtype=bool),
            mask_mid,
            jnp.ones((S, 1), dtype=bool),
        ],
        axis=-1,
    )
    logits_sort = jnp.where(drop, NEG_INF, logits_sort)
    inv = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(logits_sort, inv, axis=-1)


def _keep_argmax(mask_remove, probs):
    """Never remove the most likely token (reference guard in eta/eps)."""
    top_idx = jnp.argmax(probs, axis=-1)
    return mask_remove.at[jnp.arange(probs.shape[0]), top_idx].set(False)


def _apply_eta_cutoff(logits, t: SamplingTensors):
    shifted = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(shifted)
    neg_ent = jnp.sum(jnp.where(probs > 0, probs * shifted, 0.0), axis=-1)
    eps = jnp.minimum(t.eta_cutoff,
                      jnp.sqrt(t.eta_cutoff) * jnp.exp(neg_ent))[:, None]
    remove = (probs < eps) & (t.eta_cutoff[:, None] > 0)
    remove = _keep_argmax(remove, probs)
    return jnp.where(remove, NEG_INF, logits)


def _apply_epsilon_cutoff(logits, t: SamplingTensors):
    probs = jax.nn.softmax(logits, axis=-1)
    remove = (probs < t.epsilon_cutoff[:, None]) & (
        t.epsilon_cutoff[:, None] > 0)
    remove = _keep_argmax(remove, probs)
    return jnp.where(remove, NEG_INF, logits)


def _apply_typical(logits, t: SamplingTensors):
    """Locally typical sampling (reference sampler.py:992)."""
    shifted = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(shifted)
    neg_ent = jnp.sum(jnp.where(probs > 0, probs * shifted, 0.0),
                      axis=-1, keepdims=True)
    surprisal_dev = jnp.abs(neg_ent - shifted)
    order = jnp.argsort(surprisal_dev, axis=-1)  # ascending deviation
    reordered = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(reordered, axis=-1)
    remove_sorted = cum >= t.typical_p[:, None]
    remove_sorted = remove_sorted.at[:, 0].set(False)  # keep >= 1 token
    inv = jnp.argsort(order, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    remove &= t.typical_p[:, None] < 1.0
    return jnp.where(remove, NEG_INF, logits)


def _apply_quadratic(logits, t: SamplingTensors):
    """Quadratic/cubic smoothing (reference sampler.py:1016)."""
    k = t.smoothing_factor[:, None] * (3 - t.smoothing_curve[:, None]) / 2
    s = t.smoothing_factor[:, None] * (t.smoothing_curve[:, None] - 1) / 2
    mx = jnp.max(logits, axis=-1, keepdims=True)
    diff = logits - mx
    transformed = diff - (diff * diff) * (s * diff - k)
    transformed = jnp.where(jnp.isfinite(transformed), transformed, 0.0)
    out = logits - transformed
    return jnp.where(t.smoothing_factor[:, None] != 0, out, logits)


def _apply_xtc(logits, t: SamplingTensors, keys):
    """Exclude-top-choices (reference sampler.py:1058): with probability
    xtc_probability, drop every token whose prob clears the threshold
    except the *least* likely among them."""
    S, V = logits.shape
    coin_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0xC0))(keys)
    coin = jax.vmap(lambda k: jax.random.uniform(k))(coin_keys)
    apply_row = coin < t.xtc_probability  # [S]

    probs = jax.nn.softmax(logits, axis=-1)
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    # count = #{i >= 1 : p_sorted[i] >= threshold}; remove sorted ranks
    # [0, count) — the top choices minus the lowest qualifying one.
    above = sorted_probs[:, 1:] >= t.xtc_threshold[:, None]
    count = jnp.sum(above, axis=-1, keepdims=True)  # [S, 1]
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
    remove_sorted = ranks < count
    inv = jnp.argsort(sort_idx, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    remove &= apply_row[:, None]
    return jnp.where(remove, NEG_INF, logits)


def _apply_top_nsigma(logits, t: SamplingTensors):
    """Top-nsigma (arXiv:2411.07641; reference sampler.py:1102). Std is
    computed over finite logits only (divergence documented above)."""
    finite = jnp.isfinite(logits)
    cnt = jnp.sum(finite, axis=-1, keepdims=True).astype(jnp.float32)
    safe = jnp.where(finite, logits, 0.0)
    mean = jnp.sum(safe, axis=-1, keepdims=True) / jnp.maximum(cnt, 1.0)
    var = jnp.sum(jnp.where(finite, (logits - mean)**2, 0.0), axis=-1,
                  keepdims=True) / jnp.maximum(cnt - 1.0, 1.0)
    std = jnp.sqrt(var)
    mx = jnp.max(jnp.where(finite, logits, NEG_INF), axis=-1, keepdims=True)
    threshold = mx - t.nsigma[:, None] * std
    remove = (logits < threshold) & (t.nsigma[:, None] > 0)
    return jnp.where(remove, NEG_INF, logits)


def _apply_skew(probs, t: SamplingTensors):
    """Skew (exllamav2-style, reference sampler.py:529-541): raise the CDF
    to exp(skew) and re-difference."""
    cum = jnp.cumsum(probs, axis=-1)
    cum = cum**jnp.exp(t.skew)[:, None]
    shifted = jnp.concatenate(
        [jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=-1)
    return cum - shifted


def _apply_token_id_bans(logits, token_ids):
    """Scatter -inf at per-row banned token ids (padding = -1)."""
    S, V = logits.shape

    def row(lr, ids):
        ids_c = jnp.where(ids >= 0, ids, V)
        padded = jnp.concatenate([lr, jnp.zeros((1,), lr.dtype)])
        padded = padded.at[ids_c].set(NEG_INF)
        return padded[:V]

    return jax.vmap(row)(logits, token_ids)


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------


def apply_guided_mask(logits: jax.Array,
                      mask_words: jax.Array) -> jax.Array:
    """Apply a packed uint32 allow-bitmask [S, ceil(V/32)] to logits
    (guided decoding: tokens with a 0 bit are banned)."""
    S, V = logits.shape
    idx = jnp.arange(V, dtype=jnp.int32)
    words = jnp.take_along_axis(mask_words, (idx // 32)[None, :].repeat(
        S, axis=0), axis=1)
    bits = (words >> (idx % 32).astype(jnp.uint32)[None, :]) & jnp.uint32(1)
    return jnp.where(bits.astype(bool), logits, NEG_INF)


def shaped_logprobs(
    logits: jax.Array,  # f32[S, V]
    t: SamplingTensors,
    flags: SamplingFlags,
    history: Optional[jax.Array] = None,
    history_lens: Optional[jax.Array] = None,
    prompt_lens: Optional[jax.Array] = None,
    guided_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """The full post-pipeline log-distribution [S, V] (used by sample()
    and by speculative-decode verification, which needs the target
    distribution itself for rejection sampling)."""
    S, V = logits.shape
    logits = logits.astype(jnp.float32)
    keys = _keys_from_data(t.key_data)

    if flags.do_guided:
        logits = apply_guided_mask(logits, guided_mask)
    if flags.do_min_tokens:
        logits = _apply_token_id_bans(
            logits, jnp.where(t.min_tokens_mask[:, None], t.stop_tokens, -1))
    if flags.do_banned_tokens:
        logits = _apply_token_id_bans(logits, t.banned_tokens)

    # Stage dispatch honoring user-reordered sampler_priority (reference
    # sampler.py:297-338: SamplerID order; first request's priority wins;
    # with a custom order, temperature_last is ignored).
    from aphrodite_tpu.common.sampling_params import SamplerID

    def run_stage(sid: int, lg):
        if sid == SamplerID.DRY and flags.do_dry:
            return _apply_dry(lg, t, history, history_lens, V)
        if sid == SamplerID.PENALTIES and flags.do_penalties:
            pm, om, oc = _history_masks(history, history_lens,
                                        prompt_lens, V)
            return _apply_penalties(lg, t, pm, om, oc)
        if sid == SamplerID.NO_REPEAT_NGRAM and flags.do_no_repeat_ngram:
            return _apply_no_repeat_ngram(lg, t, history, history_lens, V)
        if sid == SamplerID.TEMPERATURE and flags.do_temperatures:
            return _apply_temperatures(lg, t, flags)
        if sid == SamplerID.TOP_NSIGMA and flags.do_nsigmas:
            return _apply_top_nsigma(lg, t)
        if sid == SamplerID.TOP_P_TOP_K and flags.do_top_p_top_k:
            return _apply_top_k_top_p(lg, t)
        if sid == SamplerID.TOP_A and flags.do_top_as:
            return _apply_top_a(lg, t)
        if sid == SamplerID.MIN_P and flags.do_min_p:
            return _apply_min_p(lg, t)
        if sid == SamplerID.TFS and flags.do_tfss:
            return _apply_tfs(lg, t)
        if sid == SamplerID.ETA_CUTOFF and flags.do_eta_cutoffs:
            return _apply_eta_cutoff(lg, t)
        if sid == SamplerID.EPSILON_CUTOFF and flags.do_epsilon_cutoffs:
            return _apply_epsilon_cutoff(lg, t)
        if sid == SamplerID.TYPICAL_P and flags.do_typical_ps:
            return _apply_typical(lg, t)
        if sid == SamplerID.QUADRATIC and flags.do_quadratic:
            return _apply_quadratic(lg, t)
        if sid == SamplerID.XTC and flags.do_xtc:
            return _apply_xtc(lg, t, keys)
        return lg

    if flags.priority_order is not None:
        order = list(flags.priority_order)
    else:
        order = [
            SamplerID.DRY, SamplerID.PENALTIES,
            SamplerID.NO_REPEAT_NGRAM, SamplerID.TEMPERATURE,
            SamplerID.TOP_NSIGMA, SamplerID.TOP_P_TOP_K, SamplerID.TOP_A,
            SamplerID.MIN_P, SamplerID.TFS, SamplerID.ETA_CUTOFF,
            SamplerID.EPSILON_CUTOFF, SamplerID.TYPICAL_P,
            SamplerID.QUADRATIC, SamplerID.XTC,
        ]
        if flags.do_temp_last:
            order.remove(SamplerID.TEMPERATURE)
            order.append(SamplerID.TEMPERATURE)
    for sid in order:
        logits = run_stage(int(sid), logits)

    if flags.do_skew:
        probs = jax.nn.softmax(logits, axis=-1)
        probs = _apply_skew(probs, t)
        logprobs = jnp.log(jnp.maximum(probs, 1e-38))
        logprobs = jnp.where(probs > 0, logprobs, NEG_INF)
    else:
        logprobs = jax.nn.log_softmax(logits, axis=-1)
    return logprobs


def sample(
    logits: jax.Array,  # f32[S, V]
    t: SamplingTensors,
    flags: SamplingFlags,
    history: Optional[jax.Array] = None,  # i32[S, H] padded with V
    history_lens: Optional[jax.Array] = None,  # i32[S]
    prompt_lens: Optional[jax.Array] = None,  # i32[S]
    guided_mask: Optional[jax.Array] = None,  # u32[S, ceil(V/32)]
) -> SamplerOutput:
    """Run the sampler pipeline and draw one token per row.

    Stage order matches the reference default (sampler.py:314-338):
    DRY -> penalties -> no-repeat-ngram -> temperature -> nsigma ->
    top-k/p -> top-a -> min-p -> tfs -> eta -> epsilon -> typical ->
    quadratic -> xtc [-> temperature if temp_last] -> skew -> sample.
    """
    S, V = logits.shape
    keys = _keys_from_data(t.key_data)
    logprobs = shaped_logprobs(logits, t, flags, history, history_lens,
                               prompt_lens, guided_mask)

    # Sample: greedy rows take argmax; random rows take Gumbel-argmax
    # (equivalent to multinomial over the final distribution).
    greedy_choice = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
    if flags.all_greedy:
        sampled = greedy_choice
    else:
        gumbel_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5A))(keys)
        gumbel = jax.vmap(
            lambda k: jax.random.gumbel(k, (V,), dtype=jnp.float32))(
                gumbel_keys)
        noised = jnp.where(jnp.isfinite(logprobs), logprobs + gumbel,
                           NEG_INF)
        random_choice = jnp.argmax(noised, axis=-1).astype(jnp.int32)
        sampled = jnp.where(t.greedy_mask, greedy_choice, random_choice)

    rows = jnp.arange(S)
    sampled_lp = logprobs[rows, sampled]
    sampled_rank = jnp.sum(logprobs > sampled_lp[:, None],
                           axis=-1).astype(jnp.int32) + 1

    if flags.max_logprobs > 0:
        topk_lp, topk_ids = jax.lax.top_k(logprobs, flags.max_logprobs)
    else:
        topk_lp = jnp.zeros((S, 0), jnp.float32)
        topk_ids = jnp.zeros((S, 0), jnp.int32)

    return SamplerOutput(
        sampled=sampled,
        sampled_logprob=sampled_lp,
        sampled_rank=sampled_rank,
        topk_ids=topk_ids,
        topk_logprobs=topk_lp,
    )
