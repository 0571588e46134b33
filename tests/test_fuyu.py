"""Fuyu multimodal tests vs HF transformers.

Greedy generation with image patches must match HF's FuyuForCausalLM
token-for-token in fp32, including the per-row splice spans around
newline tokens and the patchify flatten order."""

import numpy as np
import pytest
import torch

from aphrodite_tpu import LLM, SamplingParams

IMG, NL = 250, 251


@pytest.fixture(scope="module")
def fuyu_dir(tmp_path_factory):
    import transformers as tf

    from tests.utils import make_tiny_tokenizer

    cfg = tf.FuyuConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, vocab_size=260, patch_size=8,
        max_position_embeddings=128, image_token_id=IMG,
        image_newline_id=NL,
        text_config=dict(model_type="persimmon", hidden_size=48,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=96, vocab_size=260,
                         max_position_embeddings=128),
    )
    torch.manual_seed(0)
    model = tf.FuyuForCausalLM(cfg).to(torch.float32)
    path = str(tmp_path_factory.mktemp("tiny_fuyu"))
    model.save_pretrained(path, safe_serialization=True)
    make_tiny_tokenizer(path, vocab_size=260)
    return path


def hf_patchify(px, p):
    """HF FuyuImageProcessor.patchify_image via torch unfold."""
    t = torch.tensor(px)[None]
    patches = t.unfold(2, p, p).unfold(3, p, p)
    patches = patches.reshape(1, 3, -1, p, p).permute(0, 2, 3, 4, 1)
    return patches.reshape(1, -1, p * p * 3)


def test_patchify_matches_torch_unfold():
    from aphrodite_tpu.models.fuyu import FuyuForCausalLM as M

    rng = np.random.default_rng(0)
    px = rng.standard_normal((3, 16, 24)).astype(np.float32)
    ours, nr, nc = M._patchify(px, 8)
    assert (nr, nc) == (2, 3)
    np.testing.assert_allclose(ours, hf_patchify(px, 8)[0].numpy())


def test_fuyu_greedy_matches_hf(fuyu_dir):
    import transformers as tf

    rng = np.random.default_rng(1)
    px = rng.standard_normal((3, 16, 24)).astype(np.float32)
    nr, nc = 2, 3

    llm = LLM(model=fuyu_dir, dtype="float32", max_num_seqs=4,
              max_model_len=128)
    prompt_ids = [1, IMG, 10, 11, 12]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        custom_token_bans=[2])
    out = llm.generate(
        [{"prompt_token_ids": prompt_ids,
          "multi_modal_data": {"image": px}}], sp)[0].outputs[0]

    model = tf.FuyuForCausalLM.from_pretrained(
        fuyu_dir, torch_dtype=torch.float32)
    model.eval()
    layout = ([IMG] * nc + [NL]) * nr
    expanded = []
    for t in prompt_ids:
        expanded.extend(layout if t == IMG else [t])
    ids = torch.tensor([expanded], dtype=torch.long)
    patches = hf_patchify(px, 8).to(torch.float32)
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=ids, image_patches=patches,
            image_patches_indices=None,
            attention_mask=torch.ones_like(ids),
            max_new_tokens=8, do_sample=False,
            suppress_tokens=[2], pad_token_id=0)
    expect = hf_out[0, ids.shape[1]:].tolist()
    assert out.token_ids == expect
