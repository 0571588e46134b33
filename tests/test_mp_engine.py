"""Frontend/engine process isolation (engine/multiproc.py).

Mirrors the reference's MQAphroditeEngine behavior
(aphrodite/engine/multiprocessing/engine.py:35 + server/launch.py:17):
the engine runs in a child process; generation round-trips over the
socket protocol; killing the engine process fails in-flight and new
requests with errors while the HTTP frontend keeps serving.
"""

import asyncio
import os
import signal

import pytest

pytest_plugins = "aiohttp.pytest_plugin"

from aphrodite_tpu.common.sampling_params import SamplingParams
from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.async_engine import AsyncEngineDeadError
from aphrodite_tpu.engine.multiproc import MPAsyncEngine
from aphrodite_tpu.endpoints.openai.api_server import OpenAIServer


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_mp")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


def _engine_args(tiny_dir):
    return EngineArgs(
        model=tiny_dir,
        dtype="float32",
        max_num_seqs=4,
        num_device_blocks_override=64,
        block_size=8,
    )


@pytest.fixture(scope="module")
def mp_client(tiny_dir):
    # The child must come up on CPU like the parent test process does
    # (tests/conftest.py pins the backend for THIS process only).
    os.environ["JAX_PLATFORMS"] = "cpu"
    client = MPAsyncEngine(_engine_args(tiny_dir))
    yield client
    client.shutdown()


async def _generate(client, rid, n=6):
    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    outs = []
    async for out in client.generate(rid, prompt_token_ids=[1, 2, 3, 4],
                                     sampling_params=sp):
        outs.append(out)
    return outs[-1]


async def test_mp_generate_and_parity(mp_client, tiny_dir):
    final = await _generate(mp_client, "r1")
    assert final.finished
    assert len(final.outputs[0].token_ids) == 6

    # Token parity with the in-process engine.
    from aphrodite_tpu.engine.engine import AphroditeEngine

    eng = AphroditeEngine.from_engine_args(_engine_args(tiny_dir))
    eng.add_request("p1", prompt_token_ids=[1, 2, 3, 4],
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=6, ignore_eos=True))
    ref_final = None
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                ref_final = out
    assert ref_final is not None
    assert list(final.outputs[0].token_ids) == \
        list(ref_final.outputs[0].token_ids)


async def test_mp_utility_calls(mp_client):
    pt = await mp_client.utility("get_phase_timings")
    assert "iterations" in pt
    assert await mp_client.utility("list_loras") == []


async def test_mp_big_frame_while_busy_keeps_protocol_synced(mp_client):
    """A frame larger than the unix-socket buffer arriving while the
    engine is mid-step must not desync the length-prefixed protocol
    (regression: non-blocking drain abandoned half-read frames)."""
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    # Keep the child busy stepping so its drain() runs non-blocking.
    busy = await mp_client.add_request("busy", prompt_token_ids=[1, 2, 3],
                                       sampling_params=sp)
    # ~1.6MB pickle: far beyond the ~208KB socket buffer, so the child
    # sees a split frame. Admission rejects it (longer than
    # max_model_len) — the request_failed reply proves the frame was
    # decoded intact rather than desyncing the stream.
    big = list(range(200_000))
    try:
        async for _ in mp_client.generate(
                "big", prompt_token_ids=big, sampling_params=sp):
            pass  # over-long prompts finish ignored (reference semantics)
    except Exception:
        pass  # an admission error round-trip is equally fine
    async for _ in busy:
        pass
    # Protocol still synced: a normal request round-trips fine.
    final = await _generate(mp_client, "after_big")
    assert final.finished and len(final.outputs[0].token_ids) == 6


async def test_mp_warmup_utility(mp_client):
    """--warmup reaches a subprocess engine through the RPC utility."""
    assert await mp_client.utility("warmup") is None
    pt = await mp_client.utility("get_phase_timings")
    assert pt["iterations"] == 0  # warmup resets its own traffic
    final = await _generate(mp_client, "after_warmup")
    assert final.finished


async def test_mp_engine_death_fails_streams_not_server(
        mp_client, tiny_dir, aiohttp_client):
    server = OpenAIServer(mp_client, served_model_names=["tiny"])
    http = await aiohttp_client(server.build_app())

    resp = await http.post("/v1/completions", json={
        "model": "tiny", "prompt": "hello", "max_tokens": 4,
        "temperature": 0, "ignore_eos": True,
    })
    assert resp.status == 200, await resp.text()

    # Kill the engine process outright (simulates a poisoned XLA
    # runtime / OOM kill).
    os.kill(mp_client.proc.pid, signal.SIGKILL)
    deadline = asyncio.get_event_loop().time() + 10
    while not mp_client.errored:
        assert asyncio.get_event_loop().time() < deadline, \
            "engine death not detected"
        await asyncio.sleep(0.05)

    # New generation requests fail with an error response...
    resp = await http.post("/v1/completions", json={
        "model": "tiny", "prompt": "hello again", "max_tokens": 4,
        "temperature": 0, "ignore_eos": True,
    })
    assert resp.status >= 500

    # ...health reports dead...
    resp = await http.get("/health")
    assert resp.status in (500, 503)

    # ...but the HTTP server itself is alive and serving.
    resp = await http.get("/v1/models")
    assert resp.status == 200

    with pytest.raises(AsyncEngineDeadError):
        await mp_client.check_health()


@pytest.fixture(scope="module")
def dp_client(tiny_dir):
    from aphrodite_tpu.engine.multiproc import DPAsyncEngine

    os.environ["JAX_PLATFORMS"] = "cpu"
    client = DPAsyncEngine(_engine_args(tiny_dir), replicas=2)
    yield client
    client.shutdown()


async def test_dp_router_spreads_and_survives_replica_death(
        dp_client, aiohttp_client):
    # Warm both replicas with concurrent requests (least-loaded routing
    # must use both).
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    streams = [await dp_client.add_request(
        f"dp{i}", prompt_token_ids=[1, 2, 3, 4], sampling_params=sp)
        for i in range(4)]
    owners = {id(dp_client._owner[f"dp{i}"]) for i in range(4)}
    assert len(owners) == 2, "least-loaded routing must use both replicas"
    for st in streams:
        final = None
        async for out in st:
            final = out
        assert final is not None and final.finished

    # LoRA-less utility fan-out resolves.
    assert await dp_client.utility("list_loras") == []

    # Kill replica 0: serving continues on replica 1.
    server = OpenAIServer(dp_client, served_model_names=["tiny"])
    http = await aiohttp_client(server.build_app())
    os.kill(dp_client.replicas[0].proc.pid, signal.SIGKILL)
    deadline = asyncio.get_event_loop().time() + 10
    while not dp_client.replicas[0].errored:
        assert asyncio.get_event_loop().time() < deadline
        await asyncio.sleep(0.05)

    resp = await http.post("/v1/completions", json={
        "model": "tiny", "prompt": "hello", "max_tokens": 4,
        "temperature": 0, "ignore_eos": True,
    })
    assert resp.status == 200, await resp.text()
    resp = await http.get("/health")
    assert resp.status == 200  # one live replica = healthy

