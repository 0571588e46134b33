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

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.smoke


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


# ---- multimodal chat (LLaVA) -------------------------------------------


@pytest.fixture(scope="module")
def llava_api_dir(tmp_path_factory):
    import torch
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=24, patch_size=8, projection_dim=32),
        text_config=dict(model_type="llama", hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         vocab_size=260, max_position_embeddings=256,
                         tie_word_embeddings=False),
        image_token_index=256,
    )
    torch.manual_seed(0)
    model = tf.LlavaForConditionalGeneration(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_llava_api"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


@pytest.fixture()
async def llava_client(llava_api_dir, aiohttp_client):
    engine_args = EngineArgs(
        model=llava_api_dir,
        dtype="float32",
        max_num_seqs=4,
        num_device_blocks_override=128,
        block_size=8,
    )
    async_engine = AsyncAphrodite.from_engine_args(engine_args)
    server = OpenAIServer(async_engine, served_model_names=["tiny-llava"])
    return await aiohttp_client(server.build_app())


def _png_data_url():
    import base64
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(7)
    img = Image.fromarray(
        rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    return f"data:image/png;base64,{b64}"


async def test_chat_with_image(llava_client):
    resp = await llava_client.post("/v1/chat/completions", json={
        "model": "tiny-llava",
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "what is in "},
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
            {"type": "text", "text": " this image?"},
        ]}],
        "max_tokens": 6,
        "temperature": 0,
        "ignore_eos": True,
    })
    assert resp.status == 200, await resp.text()
    data = await resp.json()
    assert data["choices"][0]["message"]["content"]
    # The single placeholder expands to 9 feature tokens in the engine.
    assert data["usage"]["prompt_tokens"] > 9


async def test_chat_image_changes_output(llava_client):
    async def ask(url):
        resp = await llava_client.post("/v1/chat/completions", json={
            "model": "tiny-llava",
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": url}},
            ]}],
            "max_tokens": 8, "temperature": 0, "ignore_eos": True,
        })
        assert resp.status == 200, await resp.text()
        return (await resp.json())["choices"][0]["message"]["content"]

    import base64
    import io

    import numpy as np
    from PIL import Image

    def url_for(value):
        img = Image.fromarray(
            np.full((24, 24, 3), value, dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return ("data:image/png;base64," +
                base64.b64encode(buf.getvalue()).decode())

    a = await ask(url_for(0))
    b = await ask(url_for(255))
    # Same text, very different pixels: outputs should differ (the image
    # actually conditions generation through the vision tower).
    assert a != b


async def test_chat_remote_image_rejected(llava_client):
    resp = await llava_client.post("/v1/chat/completions", json={
        "model": "tiny-llava",
        "messages": [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "https://example.com/cat.png"}},
        ]}],
        "max_tokens": 4,
    })
    assert resp.status == 400
    assert "data:" in (await resp.json())["error"]["message"]


async def test_chat_image_on_text_model_rejected(client):
    resp = await client.post("/v1/chat/completions", json={
        "model": "tiny",
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
        ]}],
        "max_tokens": 4,
    })
    assert resp.status == 400
    assert "image" in (await resp.json())["error"]["message"]


async def test_completion_logit_bias(client):
    # Strong negative bias on most tokens, +100 on token 7: greedy must
    # pick 7 every step.
    bias = {str(i): -100 for i in range(0, 256, 1) if i != 7}
    bias["7"] = 100
    resp = await client.post("/v1/completions", json={
        "model": "tiny", "prompt": [1, 2, 3], "max_tokens": 5,
        "temperature": 0, "ignore_eos": True, "logit_bias": bias,
    })
    assert resp.status == 200, await resp.text()
    data = await resp.json()
    # Detokenized text of token 7 repeated; verify via tokenize round trip
    # is tokenizer-dependent — assert the bias steered generation by
    # comparing with the unbiased output.
    resp2 = await client.post("/v1/completions", json={
        "model": "tiny", "prompt": [1, 2, 3], "max_tokens": 5,
        "temperature": 0, "ignore_eos": True,
    })
    assert data["choices"][0]["text"] != \
        (await resp2.json())["choices"][0]["text"]


async def test_completion_logit_bias_invalid(client):
    resp = await client.post("/v1/completions", json={
        "model": "tiny", "prompt": [1, 2, 3], "max_tokens": 4,
        "logit_bias": {"not_an_int": 5},
    })
    assert resp.status == 400


@pytest.fixture(scope="module")
def soft_prompt_setup(tmp_path_factory):
    import torch
    from peft import PromptTuningConfig, TaskType, get_peft_model
    from transformers import AutoModelForCausalLM

    from tests.utils import make_tiny_llama_checkpoint

    base_dir = str(tmp_path_factory.mktemp("pa_base_api"))
    make_tiny_llama_checkpoint(base_dir)
    torch.manual_seed(5)
    model = AutoModelForCausalLM.from_pretrained(
        base_dir, torch_dtype=torch.float32)
    cfg = PromptTuningConfig(task_type=TaskType.CAUSAL_LM,
                             num_virtual_tokens=8)
    adir = str(tmp_path_factory.mktemp("pa_adapter_api"))
    get_peft_model(model, cfg).save_pretrained(adir)
    return base_dir, adir


async def test_soft_prompt_http_load_and_route(soft_prompt_setup,
                                               aiohttp_client):
    """/v1/soft_prompt/load + per-request routing via model name ==
    the offline PromptAdapterRequest path (reference api_server.py:733
    + prompt adapters served as model names)."""
    from aphrodite_tpu import LLM, SamplingParams
    from aphrodite_tpu.prompt_adapter import PromptAdapterRequest

    base_dir, adir = soft_prompt_setup
    engine_args = EngineArgs(
        model=base_dir, dtype="float32", max_num_seqs=4,
        num_device_blocks_override=128, block_size=8,
        enable_prompt_adapter=True, max_prompt_adapters=2,
        max_prompt_adapter_token=16)
    async_engine = AsyncAphrodite.from_engine_args(engine_args)
    server = OpenAIServer(async_engine, served_model_names=["tiny"])
    client = await aiohttp_client(server.build_app())

    resp = await client.post("/v1/soft_prompt/load", json={
        "soft_prompt_name": "my-soft", "soft_prompt_path": adir})
    assert resp.status == 200, await resp.text()
    # serviceinfo + root while a server is handy
    assert (await client.get("/")).status == 200
    info = await (await client.get("/.well-known/serviceinfo")).json()
    assert info["api"]["openai"]["rel_url"] == "/v1"

    body = {"prompt": "the quick brown fox", "max_tokens": 6,
            "temperature": 0, "ignore_eos": True}
    plain = await (await client.post(
        "/v1/completions", json={**body, "model": "tiny"})).json()
    routed = await (await client.post(
        "/v1/completions", json={**body, "model": "my-soft"})).json()

    llm = LLM(model=base_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              enable_prompt_adapter=True, max_prompt_adapters=2,
              max_prompt_adapter_token=16)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    req = PromptAdapterRequest("my-soft", 1, adir)
    expect = llm.generate(["the quick brown fox"], sp,
                          prompt_adapter_request=req)[0].outputs[0].text
    assert routed["choices"][0]["text"] == expect
    assert routed["choices"][0]["text"] != plain["choices"][0]["text"]


# ---------------------------------------------------------------------------
# Auth: API keys must cover the KoboldAI surface; admin routes must be
# gated (advisor round-1 findings).
# ---------------------------------------------------------------------------


@pytest.fixture()
async def keyed_client(tiny_dir, aiohttp_client):
    engine_args = EngineArgs(
        model=tiny_dir,
        dtype="float32",
        max_num_seqs=8,
        num_device_blocks_override=128,
        block_size=8,
    )
    async_engine = AsyncAphrodite.from_engine_args(engine_args)
    server = OpenAIServer(async_engine, served_model_names=["tiny"],
                          api_keys=["sekrit"], admin_key="root-key")
    return await aiohttp_client(server.build_app())


async def test_api_key_gates_openai_and_kobold(keyed_client):
    # /v1 without key -> 401
    resp = await keyed_client.post("/v1/completions", json={
        "prompt": "hi", "max_tokens": 1})
    assert resp.status == 401
    # Kobold surface without key -> 401 (round-1 hole: only /v1 checked)
    resp = await keyed_client.post("/api/v1/generate", json={
        "prompt": "hi", "max_length": 1})
    assert resp.status == 401
    # health stays open
    assert (await keyed_client.get("/health")).status == 200
    # with key -> served
    hdr = {"Authorization": "Bearer sekrit"}
    resp = await keyed_client.post(
        "/v1/completions",
        json={"prompt": "hi", "max_tokens": 1, "ignore_eos": True},
        headers=hdr)
    assert resp.status == 200, await resp.text()


async def test_admin_routes_require_admin_key(keyed_client):
    hdr = {"Authorization": "Bearer sekrit"}  # valid API key, NOT admin
    for route, body in [
        ("/v1/lora/load", {"lora_name": "x", "lora_path": "/nope"}),
        ("/v1/lora/unload", {"lora_name": "x"}),
        ("/v1/soft_prompt/load", {"soft_prompt_name": "x",
                                  "soft_prompt_path": "/nope"}),
        ("/v1/model/unload", {}),
    ]:
        resp = await keyed_client.post(route, json=body, headers=hdr)
        assert resp.status == 401, (route, await resp.text())
    # Correct admin key passes the gate (fails later on the bogus path,
    # not on auth).
    resp = await keyed_client.post(
        "/v1/lora/load", json={"lora_name": "x", "lora_path": "/nope"},
        headers={"Authorization": "Bearer sekrit",
                 "x-admin-key": "root-key"})
    assert resp.status != 401


async def test_admin_disabled_when_keyed_without_admin_key(
        tiny_dir, aiohttp_client):
    engine_args = EngineArgs(
        model=tiny_dir, dtype="float32", max_num_seqs=8,
        num_device_blocks_override=128, block_size=8)
    async_engine = AsyncAphrodite.from_engine_args(engine_args)
    server = OpenAIServer(async_engine, served_model_names=["tiny"],
                          api_keys=["sekrit"])  # no admin_key
    client = await aiohttp_client(server.build_app())
    resp = await client.post(
        "/v1/model/unload", json={},
        headers={"Authorization": "Bearer sekrit"})
    assert resp.status == 401


async def test_engine_stats_route(client):
    # Drive one generation so phase timings are populated.
    resp = await client.post("/v1/completions", json={
        "prompt": "hi there", "max_tokens": 4, "temperature": 0,
        "ignore_eos": True})
    assert resp.status == 200
    resp = await client.get("/v1/internal/engine_stats")
    assert resp.status == 200
    data = await resp.json()
    assert data["iterations"] >= 1
    assert data["execute_s"] > 0
    assert "avg_postprocess_ms" in data


async def test_profile_routes_trace_cycle(client, tmp_path):
    d = str(tmp_path / "trace")
    resp = await client.post("/v1/profile/start", json={"dir": d})
    assert resp.status == 200, await resp.text()
    resp = await client.post("/v1/completions", json={
        "prompt": "trace me", "max_tokens": 2, "temperature": 0,
        "ignore_eos": True})
    assert resp.status == 200
    resp = await client.post("/v1/profile/stop", json={})
    assert resp.status == 200, await resp.text()
    import os
    # jax writes trace subdirs under the requested dir.
    assert os.path.isdir(d) and os.listdir(d)
    # A second stop without a running trace is a clean 409.
    resp = await client.post("/v1/profile/stop", json={})
    assert resp.status == 409
