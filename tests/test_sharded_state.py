"""Sharded-state loader: save the final param pytree, fast-reload it
(reference ShardedStateLoader; here a npz+manifest of the post-mapping
pytree including quantized containers)."""

import os

import pytest

from aphrodite_tpu import LLM, SamplingParams

PROMPTS = ["the quick brown fox", "hello"]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_ss"))
    make_tiny_llama_checkpoint(path)
    return path


def _greedy(llm):
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    return [o.outputs[0].token_ids for o in llm.generate(PROMPTS, sp)]


def test_sharded_state_roundtrip(tiny_dir, tmp_path):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    expect = _greedy(llm)
    out = str(tmp_path / "state")
    llm.save_sharded_state(out)
    del llm

    assert os.path.isfile(os.path.join(out, "aphrodite_tpu_state.npz"))
    # Self-contained: config + tokenizer copied, no safetensors needed.
    assert os.path.isfile(os.path.join(out, "config.json"))
    assert not any(f.endswith(".safetensors") for f in os.listdir(out))

    llm2 = LLM(model=out, dtype="float32", max_num_seqs=4,
               max_model_len=128)  # load_format auto-detects
    assert _greedy(llm2) == expect


def test_sharded_state_preserves_quantization(tiny_dir, tmp_path):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128, quantization="int8")
    expect = _greedy(llm)
    out = str(tmp_path / "state_q")
    llm.save_sharded_state(out)
    del llm

    # Reload WITHOUT re-specifying quantization: the saved containers
    # carry it (qmatmul dispatches on the container form).
    llm2 = LLM(model=out, dtype="float32", max_num_seqs=4,
               max_model_len=128)
    assert _greedy(llm2) == expect


def test_cli_save_sharded_state(tiny_dir, tmp_path):
    from aphrodite_tpu.endpoints.cli import main

    out = str(tmp_path / "cli_state")
    assert main(["save-sharded-state", tiny_dir, "--output", out,
                 "--dtype", "float32",
                 "--num-device-blocks-override", "64"]) == 0
    llm = LLM(model=out, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    assert _greedy(llm)  # loads and generates
