"""Beam search correctness vs HuggingFace `generate(num_beams=...)`.

Reference analog: tests/samplers beam tests — beam output must match HF's
beam search on the same checkpoint.
"""

import pytest

from aphrodite_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint

    path = str(tmp_path_factory.mktemp("tiny_llama_beam"))
    make_tiny_llama_checkpoint(path)
    return path


def hf_beam_generate(model_dir, prompt_ids, max_new_tokens, num_beams,
                     num_return):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir,
                                                 torch_dtype=torch.float32)
    model.eval()
    input_ids = torch.tensor([prompt_ids], dtype=torch.long)
    with torch.no_grad():
        out = model.generate(
            input_ids,
            max_new_tokens=max_new_tokens,
            num_beams=num_beams,
            num_return_sequences=num_return,
            do_sample=False,
            early_stopping=True,
            length_penalty=1.0,
            pad_token_id=2,
        )
    return [seq[len(prompt_ids):].tolist() for seq in out]


def test_beam_search_top1_matches_hf(tiny_dir):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
              num_device_blocks_override=256, block_size=8)
    tok = llm.get_tokenizer()
    prompt = "the quick brown"
    sp = SamplingParams(use_beam_search=True, best_of=4, n=1,
                        temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate([prompt], sp)[0]
    got = out.outputs[0].token_ids
    expect = hf_beam_generate(tiny_dir, tok.encode(prompt), 8, 4, 1)[0]
    assert got == expect


def test_beam_search_returns_n_hypotheses(tiny_dir):
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
              num_device_blocks_override=256, block_size=8)
    sp = SamplingParams(use_beam_search=True, best_of=4, n=3,
                        temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(["hello world"], sp)[0]
    assert len(out.outputs) == 3
    # Hypotheses are distinct and sorted by score.
    token_lists = [tuple(c.token_ids) for c in out.outputs]
    assert len(set(token_lists)) == 3
    scores = [c.cumulative_logprob / max(len(c.token_ids), 1)
              for c in out.outputs]
    assert scores == sorted(scores, reverse=True)


def test_beam_alongside_greedy_batch(tiny_dir):
    """Beam requests must coexist with plain requests in one batch."""
    llm = LLM(model=tiny_dir, dtype="float32", max_num_seqs=8,
              num_device_blocks_override=256, block_size=8)
    sp_beam = SamplingParams(use_beam_search=True, best_of=3, n=1,
                             temperature=0.0, max_tokens=6,
                             ignore_eos=True)
    sp_greedy = SamplingParams(temperature=0.0, max_tokens=6,
                               ignore_eos=True)
    outs = llm.generate(["one two three", "the quick brown"],
                        [sp_beam, sp_greedy])
    assert len(outs[0].outputs[0].token_ids) == 6
    assert len(outs[1].outputs[0].token_ids) == 6
