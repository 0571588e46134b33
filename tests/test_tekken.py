"""Native tekken (Mistral BPE) tokenizer: format parsing, BPE
encode/decode, special handling, incremental detokenization, and
get_tokenizer routing (reference tokenizers/mistral.py capability)."""

import base64
import json
import os

import numpy as np
import pytest

from aphrodite_tpu.transformers_utils.tekken import TekkenTokenizer


def _write_tekken(path, num_special=16):
    """Synthetic tekken.json: 256 byte tokens + merges learned for a
    few common words, GPT-4-style pattern."""
    vocab = []
    for b in range(256):
        vocab.append({"rank": b,
                      "token_bytes": base64.b64encode(
                          bytes([b])).decode(),
                      "token_str": None})
    for merge in [b"th", b"he", b"the", b" t", b" the", b"lo", b"el",
                  b"ll", b"hel", b"hello", b" w", b"wo", b"or",
                  b"wor", b"world", b" world", b"\xc3\xa9"]:
        vocab.append({"rank": len(vocab),
                      "token_bytes": base64.b64encode(merge).decode(),
                      "token_str": None})
    data = {
        "config": {
            "pattern": r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}"
                       r"\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|"
                       r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}"
                       r"\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}{1,3}|"
                       r" ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)"
                       r"|\s+",
            "num_vocab_tokens": len(vocab),
            "default_vocab_size": len(vocab) + num_special,
            "default_num_special_tokens": num_special,
            "version": "v3",
        },
        "vocab": vocab,
    }
    with open(path, "w") as f:
        json.dump(data, f)


@pytest.fixture()
def tok(tmp_path):
    p = str(tmp_path / "tekken.json")
    _write_tekken(p)
    return TekkenTokenizer(p)


def test_encode_decode_roundtrip(tok):
    text = "hello world, the héllo"
    ids = tok.encode(text)
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids) == text  # bos skipped by policy


def test_bpe_merges_apply(tok):
    ids = tok.encode("hello", add_special_tokens=False)
    # "hello" merged into one token (rank table contains it).
    assert len(ids) == 1
    assert tok.decode(ids) == "hello"


def test_special_tokens(tok):
    assert tok.bos_token_id == 1 and tok.eos_token_id == 2
    assert set(tok.all_special_ids) == set(range(16))
    assert "<s>" in tok.all_special_tokens
    # Specials never render into decoded text (IGNORE policy)...
    ids = [tok.bos_token_id] + tok.encode("the", add_special_tokens=False)
    assert tok.decode(ids) == "the"
    # ...unless explicitly requested.
    assert tok.decode(ids, skip_special_tokens=False).startswith("<s>")


def test_utf8_boundary_incremental_detok(tok):
    from aphrodite_tpu.transformers_utils.detokenizer import (
        detokenize_incrementally)

    text = "héllo héllo"
    ids = tok.encode(text, add_special_tokens=False)
    # Feed ids one at a time; concatenated deltas must equal the text
    # (no mojibake from the multi-byte é splitting across tokens).
    prev, prefix, read = None, 0, 0
    out = ""
    all_ids = []
    toks = []
    for tid in ids:
        all_ids.append(tid)
        new_toks, delta, prefix, read = detokenize_incrementally(
            tok, all_ids, prev, prefix, read)
        toks = (toks or []) + new_toks
        prev = toks
        out += delta
    assert out == text


def test_get_tokenizer_routes_tekken(tmp_path):
    from aphrodite_tpu.transformers_utils.tokenizer import get_tokenizer

    d = str(tmp_path / "mistral_ckpt")
    os.makedirs(d)
    _write_tekken(os.path.join(d, "tekken.json"))
    t = get_tokenizer(d)
    assert isinstance(t, TekkenTokenizer)
    assert t.eos_token_id == 2


def test_chat_template(tok):
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "more"}]
    s = tok.apply_chat_template(msgs)
    assert s == "[INST] be brief\n\nhi [/INST] hello</s>[INST] more [/INST]"


def test_vocab_surface(tok):
    assert len(tok) == tok.vocab_size
    v = tok.get_vocab()
    assert v["<s>"] == 1
    assert tok.get_added_vocab() == {}
    # convert/join path used by the detokenizer
    ids = tok.encode("the world", add_special_tokens=False)
    toks = tok.convert_ids_to_tokens(ids)
    assert tok.convert_tokens_to_string(toks) == "the world"
