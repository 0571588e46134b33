"""OpenAI API server tests (in-process aiohttp test client).

Mirrors the reference's endpoint tests (tests/endpoints/openai/*) without
spawning a subprocess: the aiohttp app is driven directly against a tiny
model.
"""

import json

import pytest

pytest_plugins = "aiohttp.pytest_plugin"

from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.engine.async_engine import AsyncAphrodite
from aphrodite_tpu.endpoints.openai.api_server import OpenAIServer


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_api")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


@pytest.fixture()
async def client(tiny_dir, aiohttp_client):
    engine_args = EngineArgs(
        model=tiny_dir,
        dtype="float32",
        max_num_seqs=8,
        num_device_blocks_override=128,
        block_size=8,
    )
    async_engine = AsyncAphrodite.from_engine_args(engine_args)
    server = OpenAIServer(async_engine, served_model_names=["tiny"])
    return await aiohttp_client(server.build_app())


async def test_health(client):
    resp = await client.get("/health")
    assert resp.status == 200


async def test_models(client):
    resp = await client.get("/v1/models")
    data = await resp.json()
    assert data["object"] == "list"
    assert data["data"][0]["id"] == "tiny"


async def test_completion(client):
    resp = await client.post("/v1/completions", json={
        "model": "tiny",
        "prompt": "hello world",
        "max_tokens": 8,
        "temperature": 0,
        "ignore_eos": True,
    })
    assert resp.status == 200, await resp.text()
    data = await resp.json()
    assert data["object"] == "text_completion"
    assert len(data["choices"]) == 1
    assert data["choices"][0]["finish_reason"] == "length"
    assert data["usage"]["completion_tokens"] == 8


async def test_completion_batch_and_tokens_prompt(client):
    resp = await client.post("/v1/completions", json={
        "prompt": ["hello", "world"],
        "max_tokens": 4,
        "temperature": 0,
        "ignore_eos": True,
    })
    data = await resp.json()
    assert len(data["choices"]) == 2
    resp = await client.post("/v1/completions", json={
        "prompt": [5, 6, 7],
        "max_tokens": 4,
        "temperature": 0,
        "ignore_eos": True,
    })
    data = await resp.json()
    assert len(data["choices"]) == 1


async def test_completion_stream(client):
    resp = await client.post("/v1/completions", json={
        "prompt": "hello world",
        "max_tokens": 6,
        "temperature": 0,
        "ignore_eos": True,
        "stream": True,
    })
    assert resp.status == 200
    body = await resp.text()
    chunks = [line[len("data: "):] for line in body.splitlines()
              if line.startswith("data: ")]
    assert chunks[-1] == "[DONE]"
    parsed = [json.loads(c) for c in chunks[:-1]]
    assert parsed
    assert parsed[-1]["choices"][0]["finish_reason"] == "length"


async def test_chat_completion(client):
    resp = await client.post("/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 8,
        "temperature": 0,
        "ignore_eos": True,
    })
    assert resp.status == 200, await resp.text()
    data = await resp.json()
    assert data["object"] == "chat.completion"
    assert data["choices"][0]["message"]["role"] == "assistant"
    assert data["choices"][0]["finish_reason"] == "length"


async def test_chat_stream(client):
    resp = await client.post("/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4,
        "temperature": 0,
        "ignore_eos": True,
        "stream": True,
    })
    body = await resp.text()
    lines = [l for l in body.splitlines() if l.startswith("data: ")]
    assert lines[-1] == "data: [DONE]"
    first = json.loads(lines[0][len("data: "):])
    assert first["choices"][0]["delta"]["role"] == "assistant"


async def test_tokenize_detokenize_roundtrip(client):
    resp = await client.post("/v1/tokenize", json={"prompt": "hello world"})
    data = await resp.json()
    assert data["count"] == len(data["tokens"]) > 0
    resp = await client.post("/v1/detokenize", json={
        "tokens": data["tokens"]})
    text = (await resp.json())["prompt"]
    assert "hello" in text


async def test_sampler_extensions_accepted(client):
    resp = await client.post("/v1/completions", json={
        "prompt": "hello world",
        "max_tokens": 4,
        "temperature": 0.8,
        "top_k": 5,
        "min_p": 0.05,
        "tfs": 0.95,
        "xtc_probability": 0.2,
        "dry_multiplier": 0.5,
        "nsigma": 1.5,
        "seed": 42,
        "ignore_eos": True,
    })
    assert resp.status == 200, await resp.text()
    data = await resp.json()
    assert len(data["choices"][0]["text"]) >= 0


async def test_invalid_request_rejected(client):
    resp = await client.post("/v1/completions", json={
        "prompt": "x", "temperature": -3})
    assert resp.status == 400


async def test_logprobs_in_response(client):
    resp = await client.post("/v1/completions", json={
        "prompt": "hello world",
        "max_tokens": 3,
        "temperature": 0,
        "logprobs": 2,
        "ignore_eos": True,
    })
    data = await resp.json()
    lp = data["choices"][0]["logprobs"]
    assert lp is not None
    assert len(lp["tokens"]) == 3
    assert len(lp["top_logprobs"]) == 3
