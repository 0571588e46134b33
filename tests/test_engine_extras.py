"""Engine lifecycle extras: abort, n>1 with prefix caching, artificial
preemption hook, async engine stream error handling."""

import asyncio

import pytest

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_extras"))
    make_tiny_llama_checkpoint(path)
    return path


def test_abort_mid_generation(tiny_dir):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
    llm.engine.add_request("keep", prompt="hello world",
                           sampling_params=sp)
    llm.engine.add_request("drop", prompt="one two three",
                           sampling_params=sp)
    # Run a few steps, then abort one request.
    for _ in range(3):
        llm.engine.step()
    llm.engine.abort_request("drop")
    results = {}
    while llm.engine.has_unfinished_requests():
        for out in llm.engine.step():
            if out.finished:
                results[out.request_id] = out
    assert "keep" in results
    assert "drop" not in results
    # All blocks for the aborted request were freed.
    bm = llm.engine.scheduler.block_manager
    assert bm.num_referenced_blocks() == 0


def test_n_with_prefix_caching_shares_prompt_kv(tiny_dir):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
              enable_prefix_caching=True,
              num_device_blocks_override=128, block_size=8)
    sp = SamplingParams(temperature=1.0, n=4, seed=11, max_tokens=6,
                        ignore_eos=True)
    prompt = "the quick brown fox jumps over the lazy dog"
    out = llm.generate([prompt], sp)[0]
    assert len(out.outputs) == 4
    # Concurrent identical prefills can't hit the cache (blocks aren't
    # computed yet — same caveat as the reference); a SECOND request
    # must hit it.
    llm.generate([prompt], sp)
    assert llm.engine.scheduler.block_manager.metrics.hits > 0


def test_artificial_preemption_hook(tiny_dir, monkeypatch):
    import aphrodite_tpu.processing.scheduler as sched_mod

    monkeypatch.setattr(sched_mod, "ENABLE_ARTIFICIAL_PREEMPT", True)
    monkeypatch.setattr(sched_mod, "ARTIFICIAL_PREEMPTION_PROB", 0.5)
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    # Re-create the scheduler so the hook takes effect.
    from aphrodite_tpu.processing.scheduler import Scheduler

    llm.engine.scheduler = Scheduler(llm.engine.scheduler_config,
                                     llm.engine.config.cache_config)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(["hello world", "one two three"], sp)
    # Preemption-by-recompute must preserve greedy determinism.
    from tests.utils import hf_greedy_generate

    tok = llm.get_tokenizer()
    for prompt, out in zip(["hello world", "one two three"], outs):
        expect = hf_greedy_generate(tiny_dir, tok.encode(prompt), 12)
        assert out.outputs[0].token_ids == expect


def test_async_engine_bad_request_fails_stream_only(tiny_dir):
    from aphrodite_tpu.engine.args import EngineArgs
    from aphrodite_tpu.engine.async_engine import AsyncAphrodite

    async def run():
        engine = AsyncAphrodite.from_engine_args(
            EngineArgs(model=tiny_dir, dtype="float32", max_num_seqs=4,
                       num_device_blocks_override=64, block_size=8))
        # A bad request (LoRA on a non-LoRA engine) must fail only its
        # own stream, not the engine.
        from aphrodite_tpu.lora import LoRARequest

        with pytest.raises(ValueError):
            stream = await engine.add_request(
                "bad", prompt="x",
                sampling_params=SamplingParams(max_tokens=4),
                lora_request=LoRARequest("a", 1, "/nonexistent"))
            async for _ in stream:
                pass
        # Engine still healthy for good requests.
        stream = await engine.add_request(
            "good", prompt="hello",
            sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                           ignore_eos=True))
        final = None
        async for out in stream:
            final = out
        assert final is not None and final.finished

    asyncio.run(run())


def test_llm_chat_api(tiny_dir):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    outs = llm.chat([{"role": "user", "content": "hello"}], sp)
    assert len(outs) == 1 and len(outs[0].outputs[0].token_ids) == 5
    # Multiple conversations; template fallback is deterministic, so the
    # same conversation gives the same tokens.
    outs2 = llm.chat([[{"role": "user", "content": "hello"}],
                      [{"role": "user", "content": "different"}]], sp)
    assert outs2[0].outputs[0].token_ids == outs[0].outputs[0].token_ids
    assert outs2[1].outputs[0].token_ids != outs[0].outputs[0].token_ids


def test_seeded_n_gt_1_gives_distinct_reproducible_siblings(tiny_dir):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
              max_model_len=128)
    sp = SamplingParams(temperature=1.0, seed=7, n=3, best_of=3,
                        max_tokens=8, ignore_eos=True)
    out = llm.generate(["seed me"], sp)[0]
    seqs = [tuple(o.token_ids) for o in out.outputs]
    assert len(set(seqs)) == 3  # distinct streams per sibling
    again = [tuple(o.token_ids)
             for o in llm.generate(["seed me"], sp)[0].outputs]
    assert sorted(seqs) == sorted(again)  # reproducible


def test_engine_warmup_compiles_grid():
    """engine.warmup() runs synthetic waves over the seq buckets and
    leaves no unfinished requests behind."""
    from aphrodite_tpu.engine.args import EngineArgs
    from aphrodite_tpu.engine.engine import AphroditeEngine
    from tests.utils import make_tiny_llama_checkpoint
    import tempfile

    td = tempfile.mkdtemp()
    make_tiny_llama_checkpoint(td)
    eng = AphroditeEngine.from_engine_args(EngineArgs(
        model=td, dtype="float32", max_num_seqs=8,
        num_device_blocks_override=256, block_size=8,
        max_num_batched_tokens=64, num_scheduler_steps=2))
    eng.warmup()
    assert not eng.has_unfinished_requests()
    # Warmup traffic must NOT leak into the phase stats (/stats would
    # report compile time as steady-state throughput).
    assert eng.phase_timings["iterations"] == 0
    assert eng.phase_timings["decode_tokens"] == 0
    # Serving still works after warmup.
    from aphrodite_tpu.common.sampling_params import SamplingParams

    eng.add_request("r", prompt_token_ids=[1, 2, 3],
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=4, ignore_eos=True))
    outs = []
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
    assert any(o.finished for o in outs)
