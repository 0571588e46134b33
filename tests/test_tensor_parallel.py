"""Tensor/expert-parallel equivalence on the virtual 8-device CPU mesh.

Reference strategy (tests/utils.py compare_two_settings): a TP-sharded
engine must produce the same greedy tokens as the unsharded one.
The reference needs real multi-GPU hardware for this; we run it on
virtual devices (SURVEY.md §4 takeaway).
"""

import pytest

from aphrodite_tpu import LLM, SamplingParams

PROMPTS = ["the quick brown fox", "hello world, this is"]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_tp"))
    make_tiny_llama_checkpoint(path)
    return path


def test_tp2_matches_tp1(tiny_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    tp1 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in tp1.generate(PROMPTS, sp)]
    del tp1

    tp2 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              tensor_parallel_size=2)
    got = [o.outputs[0].token_ids for o in tp2.generate(PROMPTS, sp)]
    assert got == expect


def test_mixtral_ep2_matches_ep1(tmp_path):
    import transformers as tf

    from tests.utils import make_tiny_checkpoint

    cfg = tf.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False, num_local_experts=4,
        num_experts_per_tok=2)
    model_dir = str(tmp_path / "mixtral")
    make_tiny_checkpoint(model_dir, cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    base = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(PROMPTS, sp)]
    del base

    ep2 = LLM(model=model_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              tensor_parallel_size=2)
    got = [o.outputs[0].token_ids for o in ep2.generate(PROMPTS, sp)]
    assert got == expect


def test_pp2_matches_pp1(tiny_dir):
    """Pipeline-parallel stages (layers sharded over 'pipe', staged
    ppermute execution) must match the single-stage engine exactly."""
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    base = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(PROMPTS, sp)]
    del base

    pp2 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              pipeline_parallel_size=2)
    got = [o.outputs[0].token_ids for o in pp2.generate(PROMPTS, sp)]
    assert got == expect


def test_pp2_microbatched_prefill_matches_pp1(tiny_dir):
    """Microbatched PP: prefill batches above the size threshold run the
    wrap-around schedule (forward_pipelined) — pp token-stream cuts
    overlapping across stages in one program, cuts falling mid-sequence
    handled with chunked-prefill semantics. Tokens must be unchanged,
    and the pipelined program must actually have served the prefill
    step (step-level overlap, VERDICT item 8)."""
    # Long prompts so one scheduled step carries >= pp*4*block_size
    # prefill tokens (the pipelined-path threshold).
    long_prompts = [
        "the quick brown fox jumps over the lazy dog " * 6,
        "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 3,
        "one two three four five six seven eight nine ten " * 5,
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    base = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=256, block_size=8,
               max_model_len=512)
    expect = [o.outputs[0].token_ids
              for o in base.generate(long_prompts, sp)]
    del base

    pp2 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=256, block_size=8,
              max_model_len=512, pipeline_parallel_size=2)
    got = [o.outputs[0].token_ids for o in pp2.generate(long_prompts, sp)]
    assert pp2.engine.runner._pp_pipelined_steps > 0
    assert got == expect
    # Per-microbatch phase stats surface through the engine (r5): step
    # count, microbatch count (pp per step), wall time, token volume.
    pt = pp2.engine.get_phase_timings()
    assert pt["pp_steps"] == pp2.engine.runner._pp_pipelined_steps
    assert pt["pp_microbatches"] == 2 * pt["pp_steps"]
    assert pt["pp_step_s"] > 0 and pt["pp_tokens"] > 0


def test_pp2_tp2_matches_single(tiny_dir):
    """Combined pipeline x tensor parallelism: the pipe stage body is a
    partial-manual shard_map over {"pipe"} with the attention op's
    {"model"} shard_map nested inside; must match the unsharded engine
    exactly."""
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    base = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(PROMPTS, sp)]
    del base

    both = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               pipeline_parallel_size=2, tensor_parallel_size=2)
    got = [o.outputs[0].token_ids for o in both.generate(PROMPTS, sp)]
    assert got == expect


def test_tp4_kv_head_padding_matches_tp1(tiny_dir):
    """tp > num_kv_heads replicates KV heads onto shards; the replication
    must REPEAT groups in place ([g1,g1,g2,g2]) so each q-head shard
    pairs with its own group (regression: tiled [g1,g2,g1,g2] paired
    q1 with g2)."""
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    o1 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=2,
             max_model_len=64).generate(["pad check"],
                                        sp)[0].outputs[0].token_ids
    o4 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=2,
             max_model_len=64, tensor_parallel_size=4).generate(
                 ["pad check"], sp)[0].outputs[0].token_ids
    assert o1 == o4


def test_tp3_asymmetric_head_padding_matches_tp1(tiny_dir):
    """tp=3 does not divide 4 q heads / 2 kv heads: whole KV groups are
    zero-padded to 3 kv x 6 q heads (reference handles this with uneven
    rank partitions, parallel_state.py:1200; SPMD shards must be equal,
    so padded groups are exact no-ops instead)."""
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    o1 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
             num_device_blocks_override=128,
             block_size=8).generate(PROMPTS, sp)
    expect = [o.outputs[0].token_ids for o in o1]
    del o1

    tp3 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              tensor_parallel_size=3)
    got = [o.outputs[0].token_ids for o in tp3.generate(PROMPTS, sp)]
    assert got == expect


def test_tp3_asymmetric_with_runtime_int4(tmp_path):
    """Asymmetric head padding composes with runtime weight
    quantization (padded columns quantize to exact zeros).

    head_dim=64 so the o-projection's K axis is a multiple of the
    128-wide quant group both padded (384) and unpadded (256): K-axis
    padding must not change the group rounding of real rows (at the
    default tiny head_dim=16 the group-size fallback picks different
    groups, a tiny-shape artifact real models never hit)."""
    from tests.utils import make_tiny_llama_checkpoint

    tiny_dir = str(tmp_path / "tiny64")
    make_tiny_llama_checkpoint(tiny_dir, head_dim=64)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    base = LLM(model=tiny_dir, dtype="float32", max_num_seqs=2,
               num_device_blocks_override=128, block_size=8,
               quantization="gptq")
    expect = [o.outputs[0].token_ids for o in base.generate(PROMPTS, sp)]
    del base

    tp3 = LLM(model=tiny_dir, dtype="float32", max_num_seqs=2,
              num_device_blocks_override=128, block_size=8,
              quantization="gptq", tensor_parallel_size=3)
    got = [o.outputs[0].token_ids for o in tp3.generate(PROMPTS, sp)]
    assert got == expect
