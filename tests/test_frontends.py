"""KoboldAI frontend + batch runner + LoRA routes tests."""

import json

import pytest

pytest_plugins = "aiohttp.pytest_plugin"

from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.async_engine import AsyncAphrodite
from aphrodite_tpu.endpoints.openai.api_server import OpenAIServer


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_fe"))
    make_tiny_llama_checkpoint(path)
    return path


@pytest.fixture()
async def client(tiny_dir, aiohttp_client):
    engine_args = EngineArgs(model=tiny_dir, dtype="float32",
                             max_num_seqs=8,
                             num_device_blocks_override=128, block_size=8)
    async_engine = AsyncAphrodite.from_engine_args(engine_args)
    server = OpenAIServer(async_engine, served_model_names=["tiny"])
    return await aiohttp_client(server.build_app())


async def test_kobold_generate(client):
    resp = await client.post("/api/v1/generate", json={
        "prompt": "hello world",
        "max_length": 8,
        "temperature": 0,
        "use_default_badwordsids": True,
    })
    assert resp.status == 200, await resp.text()
    data = await resp.json()
    assert len(data["results"]) == 1
    assert isinstance(data["results"][0]["text"], str)


async def test_kobold_meta_routes(client):
    resp = await client.get("/api/v1/model")
    assert (await resp.json())["result"].startswith("aphrodite/")
    resp = await client.get("/api/v1/config/max_context_length")
    assert (await resp.json())["value"] == 128
    resp = await client.post("/api/extra/tokencount",
                             json={"prompt": "hello world"})
    assert (await resp.json())["value"] > 0


async def test_kobold_stream(client):
    resp = await client.post("/api/extra/generate/stream", json={
        "prompt": "one two",
        "max_length": 4,
        "temperature": 0,
        "use_default_badwordsids": True,
    })
    body = await resp.text()
    assert "event: message" in body


def test_run_batch(tiny_dir, tmp_path):
    import asyncio

    from aphrodite_tpu.endpoints.openai.run_batch import run_batch

    input_path = tmp_path / "batch_in.jsonl"
    lines = [
        {"custom_id": "a", "method": "POST", "url": "/v1/completions",
         "body": {"prompt": "hello", "max_tokens": 4, "temperature": 0,
                  "ignore_eos": True}},
        {"custom_id": "b", "method": "POST",
         "url": "/v1/chat/completions",
         "body": {"messages": [{"role": "user", "content": "hi"}],
                  "max_tokens": 4, "temperature": 0, "ignore_eos": True}},
    ]
    input_path.write_text("\n".join(json.dumps(l) for l in lines))
    out_path = tmp_path / "batch_out.jsonl"
    engine_args = EngineArgs(model=tiny_dir, dtype="float32",
                             max_num_seqs=8,
                             num_device_blocks_override=128, block_size=8)
    failures = asyncio.run(
        run_batch(engine_args, str(input_path), str(out_path)))
    assert failures == 0
    results = [json.loads(l) for l in out_path.read_text().splitlines()]
    assert len(results) == 2
    by_id = {r["custom_id"]: r for r in results}
    assert by_id["a"]["response"]["status_code"] == 200
    assert by_id["b"]["response"]["body"]["choices"][0]["message"][
        "content"] is not None


async def test_model_unload_and_load(tiny_dir, aiohttp_client):
    engine_args = EngineArgs(model=tiny_dir, dtype="float32",
                             max_num_seqs=4,
                             num_device_blocks_override=64, block_size=8)
    async_engine = AsyncAphrodite.from_engine_args(engine_args)
    server = OpenAIServer(async_engine, served_model_names=["tiny"],
                          engine_args=engine_args)
    client = await aiohttp_client(server.build_app())

    resp = await client.post("/v1/model/unload", json={})
    assert resp.status == 200
    resp = await client.get("/health")
    assert resp.status == 503
    resp = await client.post("/v1/completions", json={
        "prompt": "x", "max_tokens": 2})
    assert resp.status == 503

    resp = await client.post("/v1/model/load", json={})
    assert resp.status == 200, await resp.text()
    resp = await client.post("/v1/completions", json={
        "prompt": "hello", "max_tokens": 4, "temperature": 0,
        "ignore_eos": True})
    assert resp.status == 200, await resp.text()


def test_default_cli_serve_isolates_engine(tiny_dir, tmp_path):
    """`aphrodite run` with DEFAULT flags must put the engine in a child
    process (reference spawned-MQ-engine default, endpoints/openai/
    api_server.py:127-190): killing that child turns /health into 5xx
    while the HTTP frontend keeps serving /v1/models."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time
    import urllib.request
    import urllib.error

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "aphrodite_tpu", "run", tiny_dir,
         "--port", str(port), "--dtype", "float32",
         "--num-device-blocks-override", "64", "--block-size", "8"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    try:
        deadline = time.monotonic() + 120
        while True:
            try:
                assert urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health",
                    timeout=2).status == 200
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                assert time.monotonic() < deadline, "server never came up"
                assert proc.poll() is None, "server process died"
                time.sleep(1)

        # Default flags => an engine CHILD process exists under the
        # frontend. Find and kill it.
        out = subprocess.run(
            ["ps", "-o", "pid=", "--ppid", str(proc.pid)],
            capture_output=True, text=True)
        children = [int(p) for p in out.stdout.split()]
        assert children, "no engine subprocess under default flags"
        for pid in children:
            os.kill(pid, signal.SIGKILL)

        deadline = time.monotonic() + 15
        while True:
            try:
                status = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health",
                    timeout=2).status
            except urllib.error.HTTPError as e:
                status = e.code
            if status >= 500:
                break
            assert time.monotonic() < deadline, \
                "health never reported engine death"
            time.sleep(0.5)
        # The frontend itself is alive and serving.
        assert urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models", timeout=2).status == 200
        assert proc.poll() is None
    finally:
        proc.kill()
        proc.wait(timeout=10)
