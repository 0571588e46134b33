"""EAGLE speculative decoding tests.

Reference analog: tests/spec_decode/e2e/test_eagle_correctness.py —
EAGLE speculation must be lossless for greedy requests (outputs equal
the non-spec engine); the draft model itself is checked against a
composed HF oracle (fc-fused inputs_embeds into a plain Llama).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_target")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


@pytest.fixture(scope="module")
def eagle_dir(tmp_path_factory):
    from tests.utils import make_tiny_eagle_checkpoint

    path = tmp_path_factory.mktemp("tiny_eagle_draft")
    make_tiny_eagle_checkpoint(str(path), include_norm=True)
    return str(path)


@pytest.fixture(scope="module")
def eagle_nonorm_dir(tmp_path_factory):
    from tests.utils import make_tiny_eagle_checkpoint

    path = tmp_path_factory.mktemp("tiny_eagle_nonorm")
    make_tiny_eagle_checkpoint(str(path), seed=9, include_norm=False)
    return str(path)


def test_eagle_forward_matches_hf_composition(eagle_dir):
    """EAGLEModel == HF Llama fed inputs_embeds = fc([emb, prev_hidden])
    with position-0 masking (reference eagle.py:83-88)."""
    import torch
    from safetensors.torch import load_file
    from transformers import LlamaConfig, LlamaForCausalLM

    from aphrodite_tpu.common.config import LoadConfig, ModelConfig
    from aphrodite_tpu.loader.weights import load_model_params
    from aphrodite_tpu.models.eagle import EAGLEModel
    from aphrodite_tpu.models.interface import ForwardBatch
    from tests.utils import TINY_LLAMA_KWARGS

    mc = ModelConfig(model=eagle_dir, dtype="float32")
    model = EAGLEModel(mc)
    params = load_model_params(model, mc, LoadConfig(), mesh=None)

    T, H = 9, TINY_LLAMA_KWARGS["hidden_size"]
    rng = np.random.RandomState(0)
    token_ids = rng.randint(3, 250, size=(T,)).astype(np.int32)
    prev_hidden = rng.randn(T, H).astype(np.float32) * 0.3

    page_size = 16
    kv = jnp.zeros((model.num_layers, 8, page_size) +
                   model.kv_cache_shape_suffix, jnp.float32)
    page_indices = np.zeros((2, 8), np.int32)
    page_indices[0, 0] = 1
    batch = ForwardBatch(
        token_ids=jnp.asarray(token_ids),
        positions=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.asarray(page_size + np.arange(T, dtype=np.int32)),
        kv_lens=jnp.asarray([T, 0], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, T, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        logits_indices=jnp.asarray([T - 1, 0], jnp.int32),
    )
    _, hidden = model.forward_with_hidden(params, kv, batch,
                                          jnp.asarray(prev_hidden))
    got = np.asarray(model.compute_logits(params, hidden))

    # Oracle: plain HF llama on the fused embeds.
    sd = load_file(f"{eagle_dir}/model.safetensors")
    kwargs = dict(TINY_LLAMA_KWARGS)
    kwargs["num_hidden_layers"] = 1
    hf = LlamaForCausalLM(LlamaConfig(**kwargs)).to(torch.float32)
    hf.load_state_dict({k: v for k, v in sd.items() if k != "fc.weight"},
                       strict=False)
    hf.eval()
    fc = sd["fc.weight"]
    with torch.no_grad():
        emb = hf.model.embed_tokens(torch.tensor(token_ids, dtype=torch.long))
        x = torch.cat([emb, torch.tensor(prev_hidden)], dim=-1) @ fc.T
        x[0] = 0  # position 0 mask
        out = hf.model(inputs_embeds=x[None],
                       position_ids=torch.arange(T)[None])
        expect = hf.lm_head(out.last_hidden_state)[0].numpy()
    np.testing.assert_allclose(got[:T], expect, rtol=2e-4, atol=2e-4)


def test_eagle_spec_is_lossless_greedy(target_dir, eagle_nonorm_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    prompts = ["one two three one two three one two",
               "the quick brown fox jumps over"]
    base = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]

    spec = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               speculative_model=eagle_nonorm_dir,
               num_speculative_tokens=3)
    assert spec.engine.config.speculative_config.method == "eagle"
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    assert got == expect


def test_eagle_token_map_lossless_greedy(target_dir, tmp_path_factory):
    """Truncated-vocab drafts (token_map) stay lossless: proposals are
    full-vocab ids, verification is exact regardless."""
    from tests.utils import make_tiny_eagle_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_eagle_tmap"))
    make_tiny_eagle_checkpoint(path, seed=11, truncated_vocab=128)
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    prompts = ["one two three one two three one two"]
    base = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    expect = [o.outputs[0].token_ids for o in base.generate(prompts, sp)]
    spec = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               speculative_model=path, num_speculative_tokens=3)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, sp)]
    assert got == expect


def test_eagle_spec_stochastic_runs(target_dir, eagle_dir):
    llm = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8,
              speculative_model=eagle_dir, num_speculative_tokens=3)
    sp = SamplingParams(temperature=1.0, seed=7, max_tokens=12,
                        ignore_eos=True)
    outs = llm.generate(["one two three four", "hello world"], sp)
    vocab = llm.engine.model_config.get_vocab_size()
    for o in outs:
        toks = o.outputs[0].token_ids
        assert len(toks) == 12
        assert all(0 <= t < vocab for t in toks)
