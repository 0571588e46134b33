"""Hidden-state speculative decoding (Medusa / MLPSpeculator) tests.

Reference analog: tests/spec_decode/e2e/test_medusa_correctness.py and
test_mlp_correctness.py — proposer-accelerated decoding must be
lossless for greedy requests (outputs equal the non-spec engine) and
reproducible for seeded stochastic ones, at any acceptance rate.
"""

import json
import os

import numpy as np
import pytest

from aphrodite_tpu import LLM, SamplingParams

PROMPTS = ["one two three one two three one two",
           "the quick brown fox jumps over"]


def _save(save_dir, tensors, config):
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    save_file(tensors, os.path.join(save_dir, "model.safetensors"))
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(config, f)


def make_medusa_checkpoint(save_dir, num_heads=3, num_layers=1,
                           hidden=64, vocab=256, seed=11, zero=False):
    rng = np.random.default_rng(seed)
    tensors = {}
    for h in range(num_heads):
        for l in range(num_layers):
            w = rng.standard_normal((hidden, hidden)).astype(
                np.float32) * 0.05
            tensors[f"medusa_heads.blocks.{h}.layers.{l}.weight"] = \
                np.zeros_like(w) if zero else w
        w = rng.standard_normal((vocab, hidden)).astype(np.float32) * 0.05
        tensors[f"medusa_heads.lm_heads.{h}.weight"] = \
            np.zeros_like(w) if zero else w
    _save(save_dir, tensors, {
        "architectures": ["MedusaModel"],
        "model_type": "medusa",
        "hidden_size": hidden,
        "vocab_size": vocab,
        "medusa_num_heads": num_heads,
        "medusa_num_layers": num_layers,
    })


def make_mlp_speculator_checkpoint(save_dir, n_predict=3, emb_dim=64,
                                   inner_dim=32, vocab=256, seed=12,
                                   tie_weights=False, scale_input=True):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    stages = 1 if tie_weights else n_predict
    tensors = {"proj.0.weight": w(inner_dim, emb_dim)}
    for s in range(stages):
        tensors[f"emb.{s}.weight"] = w(vocab, inner_dim)
        tensors[f"head.{s}.weight"] = w(vocab, inner_dim)
        tensors[f"ln.{s}.weight"] = np.ones((inner_dim,), np.float32)
        tensors[f"ln.{s}.bias"] = np.zeros((inner_dim,), np.float32)
    rest = 1 if tie_weights else n_predict - 1
    for r in range(rest):
        tensors[f"proj.{r + 1}.weight"] = w(inner_dim, inner_dim)
    _save(save_dir, tensors, {
        "architectures": ["MLPSpeculatorPreTrainedModel"],
        "model_type": "mlp_speculator",
        "vocab_size": vocab,
        "emb_dim": emb_dim,
        "inner_dim": inner_dim,
        "n_predict": n_predict,
        "num_lookahead_tokens": n_predict,
        "tie_weights": tie_weights,
        "scale_input": scale_input,
    })


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = tmp_path_factory.mktemp("tiny_llama_target")
    make_tiny_llama_checkpoint(str(path))
    return str(path)


@pytest.fixture(scope="module")
def base_outputs(target_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    base = LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)
    return [o.outputs[0].token_ids for o in base.generate(PROMPTS, sp)]


def _spec_llm(target_dir, draft_dir, k=3):
    return LLM(model=target_dir, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8,
               speculative_model=draft_dir, num_speculative_tokens=k)


def test_medusa_spec_is_lossless_greedy(target_dir, base_outputs,
                                        tmp_path):
    make_medusa_checkpoint(str(tmp_path))
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    llm = _spec_llm(target_dir, str(tmp_path))
    got = [o.outputs[0].token_ids for o in llm.generate(PROMPTS, sp)]
    assert got == base_outputs


def test_mlp_speculator_is_lossless_greedy(target_dir, base_outputs,
                                           tmp_path):
    make_mlp_speculator_checkpoint(str(tmp_path))
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    llm = _spec_llm(target_dir, str(tmp_path))
    got = [o.outputs[0].token_ids for o in llm.generate(PROMPTS, sp)]
    assert got == base_outputs


def test_mlp_speculator_tied_weights_loads(target_dir, tmp_path):
    make_mlp_speculator_checkpoint(str(tmp_path), tie_weights=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    llm = _spec_llm(target_dir, str(tmp_path))
    outs = llm.generate(["hello world"], sp)
    assert len(outs[0].outputs[0].token_ids) == 8


def test_medusa_full_acceptance_is_lossless(target_dir, tmp_path):
    """Zeroed target lm_head -> target greedily emits token 0 forever;
    zeroed medusa heads propose token 0 -> every proposal accepts
    (valid_len == k+1), exercising the carry gather at the far end."""
    from safetensors.numpy import load_file, save_file

    from tests.utils import make_tiny_llama_checkpoint

    tdir = tmp_path / "target0"
    make_tiny_llama_checkpoint(str(tdir))
    st = os.path.join(str(tdir), "model.safetensors")
    tensors = dict(load_file(st))
    tensors["lm_head.weight"] = np.zeros_like(tensors["lm_head.weight"])
    save_file(tensors, st)
    ddir = tmp_path / "medusa0"
    make_medusa_checkpoint(str(ddir), zero=True)

    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    llm = _spec_llm(str(tdir), str(ddir))
    outs = llm.generate(["one two three"], sp)
    assert outs[0].outputs[0].token_ids == [0] * 16


def test_spec_hidden_stochastic_seeded_reproducible(target_dir, tmp_path):
    make_medusa_checkpoint(str(tmp_path))
    llm = _spec_llm(target_dir, str(tmp_path))
    sp = SamplingParams(temperature=1.0, seed=7, max_tokens=12,
                        ignore_eos=True)
    outs = llm.generate(PROMPTS, sp)
    vocab = llm.engine.model_config.get_vocab_size()
    for o in outs:
        toks = o.outputs[0].token_ids
        assert len(toks) == 12
        assert all(0 <= t < vocab for t in toks)
    outs2 = llm.generate(PROMPTS, sp)
    assert [o.outputs[0].token_ids for o in outs] == \
        [o.outputs[0].token_ids for o in outs2]


def test_hidden_proposer_dim_mismatch_rejected(target_dir, tmp_path):
    make_medusa_checkpoint(str(tmp_path), hidden=32)
    with pytest.raises(ValueError, match="hidden size"):
        _spec_llm(target_dir, str(tmp_path))
