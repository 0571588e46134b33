"""Unit tests for the paged block manager (prefix caching, CoW, eviction).

Mirrors the reference's pure-Python core tests (tests/core/block/*)."""

import pytest

from aphrodite_tpu.common.sequence import Sequence
from aphrodite_tpu.processing.block_manager import BlockManager

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.smoke


def make_seq(seq_id, tokens, block_size=4):
    return Sequence(seq_id=seq_id, prompt_token_ids=tokens,
                    block_size=block_size)


def test_allocate_and_free():
    bm = BlockManager(block_size=4, num_blocks=8)
    seq = make_seq(0, list(range(10)))
    assert bm.can_allocate(seq)
    cached = bm.allocate(seq)
    assert cached == 0
    assert len(bm.get_block_table(seq)) == 3  # ceil(10/4)
    assert bm.get_num_free_blocks() == 5
    bm.free(seq)
    assert bm.get_num_free_blocks() == 8


def test_out_of_blocks():
    bm = BlockManager(block_size=4, num_blocks=2)
    seq = make_seq(0, list(range(12)))
    assert not bm.can_allocate(seq)


def test_append_slots_growth():
    bm = BlockManager(block_size=4, num_blocks=8)
    seq = make_seq(0, list(range(4)))
    bm.allocate(seq)
    assert len(bm.get_block_table(seq)) == 1
    # Simulate decode: grow by one token at a time.
    seq.num_computed_tokens = 4
    for i in range(4):
        assert bm.can_append_slots(seq, 1)
        cow = bm.append_slots(seq, 1)
        assert cow == []
        seq.append_token_id(100 + i)
        seq.num_computed_tokens += 1
    assert len(bm.get_block_table(seq)) == 2


def test_prefix_cache_hit():
    bm = BlockManager(block_size=4, num_blocks=16, enable_prefix_caching=True)
    prompt = list(range(11))
    seq_a = make_seq(0, prompt)
    cached = bm.allocate(seq_a)
    assert cached == 0
    # Simulate the step computing all 11 tokens.
    seq_a.num_computed_tokens = 11
    bm.mark_computed(seq_a)
    # A second sequence with the same prompt hits both full blocks.
    seq_b = make_seq(1, prompt)
    cached = bm.allocate(seq_b)
    assert cached == 8  # two full blocks of 4
    # Shared blocks must be the same ids.
    assert bm.get_block_table(seq_b)[:2] == bm.get_block_table(seq_a)[:2]
    assert bm.get_prefix_cache_hit_rate() > 0
    bm.free(seq_a)
    bm.free(seq_b)


def test_full_prompt_hit_never_reports_everything_cached():
    bm = BlockManager(block_size=4, num_blocks=16, enable_prefix_caching=True)
    prompt = list(range(8))  # exactly 2 full blocks
    seq_a = make_seq(0, prompt)
    bm.allocate(seq_a)
    seq_a.num_computed_tokens = 8
    bm.mark_computed(seq_a)
    seq_b = make_seq(1, prompt)
    cached = bm.allocate(seq_b)
    # Must leave at least the last token to recompute for logits.
    assert cached < 8
    assert cached % 4 == 0


def test_eviction_reuses_lru():
    bm = BlockManager(block_size=4, num_blocks=4, enable_prefix_caching=True)
    seq_a = make_seq(0, list(range(8)))
    bm.allocate(seq_a)
    seq_a.num_computed_tokens = 8
    bm.mark_computed(seq_a)
    bm.free(seq_a)  # blocks parked in evictor, still reusable
    assert bm.get_num_free_blocks() == 4
    # New sequence with same prefix still hits the cache.
    seq_b = make_seq(1, list(range(8)) + [99])
    cached = bm.allocate(seq_b)
    assert cached == 8
    # Exhaust remaining blocks; evictor blocks get recycled.
    seq_c = make_seq(2, list(range(100, 112)))
    assert bm.can_allocate(seq_c) is False  # needs 3, only 1 free + 0 evictable
    bm.free(seq_b)


def test_fork_and_cow():
    bm = BlockManager(block_size=4, num_blocks=8)
    parent = make_seq(0, list(range(6)))
    bm.allocate(parent)
    parent.num_computed_tokens = 6
    child = parent.fork(new_seq_id=1)
    bm.fork(parent, child)
    assert bm.get_block_table(child) == bm.get_block_table(parent)
    # Parent appends a token: the shared partial last block must be copied.
    cow = bm.append_slots(parent, 1)
    assert len(cow) == 1
    src, dst = cow[0]
    assert bm.get_block_table(parent)[-1] == dst
    assert bm.get_block_table(child)[-1] == src
    # Child append also works (its block is now unshared).
    cow2 = bm.append_slots(child, 1)
    assert cow2 == []
    bm.free(parent)
    bm.free(child)
    assert bm.get_num_free_blocks() == 8


def test_double_free_is_noop():
    bm = BlockManager(block_size=4, num_blocks=8)
    seq = make_seq(0, list(range(4)))
    bm.allocate(seq)
    bm.free(seq)
    bm.free(seq)  # second free: no table entry, no-op
    assert bm.get_num_free_blocks() == 8
