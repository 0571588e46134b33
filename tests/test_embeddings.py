"""Embedding/pooling path tests (reference embedding_model_runner +
/v1/embeddings endpoint)."""

import numpy as np
import pytest

pytest_plugins = "aiohttp.pytest_plugin"

from aphrodite_tpu import LLM


@pytest.fixture(scope="module")
def tiny_llm(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_emb"))
    make_tiny_llama_checkpoint(path)
    return LLM(model=path, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               max_num_batched_tokens=64)


def test_encode_normalized_and_deterministic(tiny_llm):
    outs = tiny_llm.encode(["hello world", "the quick brown fox"])
    assert len(outs) == 2
    for o in outs:
        v = np.asarray(o.embedding)
        assert v.shape == (64,)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-4)
    again = tiny_llm.encode(["hello world"])
    np.testing.assert_allclose(np.asarray(outs[0].embedding),
                               np.asarray(again[0].embedding), atol=1e-5)


def test_encode_batch_packing_matches_single(tiny_llm):
    prompts = ["hello world", "one two three four", "the quick"]
    batched = tiny_llm.encode(prompts)
    singles = [tiny_llm.encode([p])[0] for p in prompts]
    for b, s in zip(batched, singles):
        np.testing.assert_allclose(np.asarray(b.embedding),
                                   np.asarray(s.embedding), atol=1e-4)


def test_encode_mean_pooling(tiny_llm):
    outs = tiny_llm.engine.encode(
        [[5, 6, 7, 8]], pooling="mean")
    v = np.asarray(outs[0])
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-4)


async def test_embeddings_endpoint(tiny_llm, aiohttp_client):
    from aphrodite_tpu.engine.async_engine import AsyncAphrodite
    from aphrodite_tpu.endpoints.openai.api_server import OpenAIServer

    server = OpenAIServer(AsyncAphrodite(tiny_llm.engine),
                          served_model_names=["tiny"])
    client = await aiohttp_client(server.build_app())
    resp = await client.post("/v1/embeddings", json={
        "input": ["hello world", "goodbye"]})
    assert resp.status == 200, await resp.text()
    data = await resp.json()
    assert data["object"] == "list"
    assert len(data["data"]) == 2
    assert len(data["data"][0]["embedding"]) == 64
    assert data["usage"]["prompt_tokens"] > 0
