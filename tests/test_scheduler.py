"""Scheduler unit tests (pure Python, no device) — mirrors the reference's
tests/core/test_scheduler.py style: fake sequence groups, assert policy."""

import pytest

from aphrodite_tpu.common.config import CacheConfig, SchedulerConfig
from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.common.sequence import (Sequence, SequenceGroup,
                                           SequenceStatus)
from aphrodite_tpu.processing.scheduler import Scheduler

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.smoke

BLOCK = 4


def make_scheduler(num_blocks=64, max_num_seqs=8, max_tokens=64,
                   chunked=True, prefix_caching=False):
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=max_tokens,
        max_num_seqs=max_num_seqs,
        max_model_len=128,
        enable_chunked_prefill=chunked,
    )
    cache_cfg = CacheConfig(block_size=BLOCK,
                            enable_prefix_caching=prefix_caching)
    cache_cfg.num_device_blocks = num_blocks
    return Scheduler(sched_cfg, cache_cfg)


_seq_counter = iter(range(10_000))


def make_group(request_id, prompt_len, **sp_kwargs):
    sp = SamplingParams(max_tokens=16, **sp_kwargs)
    seq = Sequence(seq_id=next(_seq_counter),
                   prompt_token_ids=list(range(prompt_len)),
                   block_size=BLOCK)
    return SequenceGroup(request_id=request_id, seqs=[seq],
                         sampling_params=sp)


def run_step(scheduler, sample_token=7):
    """Schedule one step and simulate its execution."""
    out = scheduler.schedule()
    scheduler.mark_step_computed(out)
    for ss in out.scheduled:
        if ss.do_sample:
            ss.seq.append_token_id(sample_token)
    return out


def test_simple_prefill_then_decode():
    s = make_scheduler()
    g = make_group("r0", prompt_len=10)
    s.add_seq_group(g)
    out = run_step(s)
    assert out.num_prefill_tokens == 10
    assert out.num_decode_tokens == 0
    assert out.scheduled[0].do_sample
    assert g.seqs[0].get_output_len() == 1
    # Next step is a decode of 1 token.
    out = run_step(s)
    assert out.num_prefill_tokens == 0
    assert out.num_decode_tokens == 1


def test_chunked_prefill_splits_long_prompt():
    s = make_scheduler(max_tokens=16)
    g = make_group("r0", prompt_len=40)
    s.add_seq_group(g)
    out = run_step(s)
    assert out.num_prefill_tokens == 16
    assert not out.scheduled[0].do_sample
    out = run_step(s)
    assert out.num_prefill_tokens == 16
    out = run_step(s)
    assert out.num_prefill_tokens == 8
    assert out.scheduled[0].do_sample
    assert g.seqs[0].get_output_len() == 1


def test_mixed_prefill_and_decode_in_one_step():
    s = make_scheduler(max_tokens=16)
    g1 = make_group("r1", prompt_len=8)
    s.add_seq_group(g1)
    run_step(s)  # g1 prefill done, 1 token sampled
    g2 = make_group("r2", prompt_len=12)
    s.add_seq_group(g2)
    out = run_step(s)
    # One decode token for g1 + 12 prefill tokens for g2, same step.
    assert out.num_decode_tokens == 1
    assert out.num_prefill_tokens == 12


def test_token_budget_caps_admission():
    s = make_scheduler(max_tokens=16, chunked=False)
    # Without chunked prefill the budget is raised to max_model_len by the
    # config; use chunked=True and small budget instead.
    s = make_scheduler(max_tokens=8, chunked=True)
    g1 = make_group("r1", prompt_len=8)
    g2 = make_group("r2", prompt_len=8)
    s.add_seq_group(g1)
    s.add_seq_group(g2)
    out = run_step(s)
    assert out.num_batched_tokens == 8  # only g1 fits
    assert len(out.scheduled) == 1


def test_max_num_seqs_cap():
    s = make_scheduler(max_num_seqs=2, max_tokens=64)
    for i in range(4):
        s.add_seq_group(make_group(f"r{i}", prompt_len=4))
    out = run_step(s)
    assert len(out.scheduled) == 2


def test_preemption_by_recompute_on_block_exhaustion():
    # 8 blocks of 4 = 32 token slots total.
    s = make_scheduler(num_blocks=8, max_tokens=64, max_num_seqs=4)
    g1 = make_group("r1", prompt_len=15)
    g2 = make_group("r2", prompt_len=13)
    s.add_seq_group(g1)
    s.add_seq_group(g2)
    run_step(s)  # both prefill: 15+13=28 tokens in 4+4 blocks — full
    # Decode steps force block growth; one group must be preempted.
    preempted_any = False
    for _ in range(8):
        out = run_step(s)
        if out.preempted:
            preempted_any = True
            break
    assert preempted_any
    # The preempted group is back in waiting, WAITING status, 0 computed.
    victim = out.preempted[0]
    assert victim.seqs[0].status == SequenceStatus.WAITING
    assert victim.seqs[0].num_computed_tokens == 0
    # Engine keeps making progress for the survivor.
    out2 = run_step(s)
    assert not out2.is_empty()


def test_ignored_too_long_prompt():
    s = make_scheduler()
    g = make_group("r0", prompt_len=500)  # > max_model_len 128
    s.add_seq_group(g)
    out = s.schedule()
    assert out.ignored and out.ignored[0] is g
    assert g.seqs[0].status == SequenceStatus.FINISHED_IGNORED
    assert not s.has_unfinished_seqs()


def test_abort():
    s = make_scheduler()
    g = make_group("r0", prompt_len=8)
    s.add_seq_group(g)
    run_step(s)
    s.abort_seq_group("r0")
    assert not s.has_unfinished_seqs()
    assert g.seqs[0].status == SequenceStatus.FINISHED_ABORTED
    # Blocks were freed.
    assert s.block_manager.get_num_free_blocks() == 64


def test_prefix_cache_skips_computed_prefix():
    s = make_scheduler(prefix_caching=True, max_tokens=64)
    g1 = make_group("r1", prompt_len=16)
    s.add_seq_group(g1)
    run_step(s)
    # Same prompt again: prefill should only need the uncached remainder.
    g2 = make_group("r2", prompt_len=16)
    g2.seqs[0].prompt_token_ids = list(range(16))  # identical
    s.add_seq_group(g2)
    out = run_step(s)
    sched_g2 = [ss for ss in out.scheduled if ss.group is g2]
    assert len(sched_g2) == 1
    # 16 tokens = 4 full blocks; cache serves 3 (last must recompute).
    assert sched_g2[0].num_tokens == 4
    assert sched_g2[0].first_token_idx == 12


def test_decode_priority_over_new_prefill():
    s = make_scheduler(max_tokens=8)
    g1 = make_group("r1", prompt_len=8)
    s.add_seq_group(g1)
    run_step(s)
    g2 = make_group("r2", prompt_len=8)
    s.add_seq_group(g2)
    out = run_step(s)
    # Budget 8: decode (1) + 7 of g2's prefill chunk.
    assert out.num_decode_tokens == 1
    assert out.num_prefill_tokens == 7


def _decode_table_len(nss, sp_kwargs, chain_env="1", monkey=None):
    import os

    old = os.environ.get("APHRODITE_CHAIN_WINDOWS")
    os.environ["APHRODITE_CHAIN_WINDOWS"] = chain_env
    try:
        sched_cfg = SchedulerConfig(
            max_num_batched_tokens=64, max_num_seqs=8, max_model_len=128,
            enable_chunked_prefill=True, num_scheduler_steps=nss)
        cache_cfg = CacheConfig(block_size=BLOCK)
        cache_cfg.num_device_blocks = 64
        s = Scheduler(sched_cfg, cache_cfg)
        g = make_group("r0", prompt_len=8, **sp_kwargs)
        s.add_seq_group(g)
        run_step(s)   # prefill
        run_step(s)   # decode: reserves lookahead
        seq = g.seqs[0]
        return len(s.block_manager.get_block_table(seq))
    finally:
        if old is None:
            os.environ.pop("APHRODITE_CHAIN_WINDOWS", None)
        else:
            os.environ["APHRODITE_CHAIN_WINDOWS"] = old


def test_chain_lookahead_reserved_only_for_eligible_sampling():
    """The 2x chain-window KV reservation is paid ONLY by requests whose
    sampling can actually be speculated (VERDICT r3 item 3): seeded
    stochastic / history-dependent sampling reserves just the plain
    multi-step lookahead, and chaining off reserves the same."""
    nss = 8  # window 8 => plain lookahead 7, chain lookahead +8
    greedy = _decode_table_len(nss, dict(temperature=0.0))
    seeded = _decode_table_len(nss, dict(temperature=1.0, seed=3))
    penal = _decode_table_len(nss, dict(temperature=0.0,
                                        repetition_penalty=1.2))
    off = _decode_table_len(nss, dict(temperature=0.0), chain_env="0")
    # Chain-eligible sampling reserves exactly one extra window
    # (nss=8 tokens = 2 BLOCK=4 pages) beyond the plain lookahead.
    assert seeded == penal == off
    assert greedy == seeded + nss // BLOCK


def test_unseeded_stochastic_is_chain_eligible():
    sp = SamplingParams(temperature=0.8, max_tokens=8)
    assert sp.chain_speculation_eligible
    assert not SamplingParams(temperature=0.8, seed=1,
                              max_tokens=8).chain_speculation_eligible
    assert SamplingParams(temperature=0.0, seed=1,
                          max_tokens=8).chain_speculation_eligible
    assert not SamplingParams(temperature=0.0, dry_multiplier=0.5,
                              max_tokens=8).chain_speculation_eligible


def test_prefill_delay_factor_holds_new_prompts():
    """Reference --scheduler-delay-factor semantics: after a prompt
    iteration, freshly-arrived prompts wait (decodes run pure, so the
    fused multi-step window can engage) until their age beats
    delay_factor x last prompt latency; delay_factor=0 admits at once."""
    import time

    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=64, max_num_seqs=8, max_model_len=128,
        enable_chunked_prefill=True, delay_factor=10_000.0)
    cache_cfg = CacheConfig(block_size=BLOCK)
    cache_cfg.num_device_blocks = 64
    s = Scheduler(sched_cfg, cache_cfg)
    g1 = make_group("r1", prompt_len=8)
    s.add_seq_group(g1)
    run_step(s)   # prompt iteration (records prev_prompt)
    time.sleep(0.01)
    run_step(s)   # decode-only; establishes last_prompt_latency
    g2 = make_group("r2", prompt_len=8)
    s.add_seq_group(g2)
    out = s.schedule()
    # g2 is fresh and g1 is running: admission is held.
    assert all(not ss.seq.is_prefill for ss in out.scheduled)
    assert out.num_prefill_tokens == 0
    s.mark_step_computed(out)
    for ss in out.scheduled:
        if ss.do_sample:
            ss.seq.append_token_id(7)

    # With no delay factor the same situation admits immediately.
    sched_cfg0 = SchedulerConfig(
        max_num_batched_tokens=64, max_num_seqs=8, max_model_len=128,
        enable_chunked_prefill=True, delay_factor=0.0)
    cache_cfg0 = CacheConfig(block_size=BLOCK)
    cache_cfg0.num_device_blocks = 64
    s0 = Scheduler(sched_cfg0, cache_cfg0)
    s0.add_seq_group(make_group("a", prompt_len=8))
    run_step(s0)
    s0.add_seq_group(make_group("b", prompt_len=8))
    out0 = s0.schedule()
    assert out0.num_prefill_tokens > 0
