"""Guided decoding tests: regex DFA engine, token FSM, schema->regex,
end-to-end constrained generation."""

import json

import numpy as np
import pytest

from aphrodite_tpu.guided.regex_fsm import compile_regex
from aphrodite_tpu.guided.json_schema import schema_to_regex

ALPHABET = set("abcdefghijklmnopqrstuvwxyz"
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
               " \t\n\"{}[]:,.-+_eE\\/")


def _dfa(pattern):
    return compile_regex(pattern, ALPHABET)


def test_regex_literals_and_classes():
    d = _dfa("ab[0-9]+c?")
    assert d.fullmatch("ab3")
    assert d.fullmatch("ab123c")
    assert not d.fullmatch("abc")
    assert not d.fullmatch("ab12cc")


def test_regex_alternation_and_groups():
    d = _dfa("(cat|dog)( (cat|dog))*")
    assert d.fullmatch("cat")
    assert d.fullmatch("dog cat dog")
    assert not d.fullmatch("catdog")


def test_regex_quantifier_ranges():
    d = _dfa("a{2,4}")
    assert not d.fullmatch("a")
    assert d.fullmatch("aa")
    assert d.fullmatch("aaaa")
    assert not d.fullmatch("aaaaa")


def test_regex_escapes_and_dot():
    d = _dfa(r"\d+\.\d{2}")
    assert d.fullmatch("3.14")
    assert not d.fullmatch("3.1")
    d2 = _dfa("a.c")
    assert d2.fullmatch("abc")
    assert not d2.fullmatch("a\nc")


def test_regex_negated_class():
    d = _dfa('"[^"]*"')
    assert d.fullmatch('"hello world"')
    assert not d.fullmatch('"he"llo"')


def test_schema_to_regex_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name", "age"],
    }
    pattern = schema_to_regex(schema)
    d = _dfa(pattern)
    assert d.fullmatch('{"name": "bob", "age": 42}')
    assert d.fullmatch('{"name":"x","age":0}')
    assert not d.fullmatch('{"age": 42}')
    assert not d.fullmatch('{"name": "bob", "age": "x"}')


def test_schema_enum_and_array():
    d = _dfa(schema_to_regex({"enum": ["red", "green"]}))
    assert d.fullmatch('"red"')
    assert not d.fullmatch('"blue"')
    d2 = _dfa(schema_to_regex({
        "type": "array", "items": {"type": "integer"},
        "minItems": 1, "maxItems": 3}))
    assert d2.fullmatch("[1, 2]")
    assert not d2.fullmatch("[]")
    assert not d2.fullmatch("[1, 2, 3, 4]")


@pytest.fixture(scope="module")
def tiny_llm(tmp_path_factory):
    from tests.utils import make_tiny_llama_checkpoint
    from aphrodite_tpu import LLM

    path = str(tmp_path_factory.mktemp("tiny_llama_guided"))
    make_tiny_llama_checkpoint(path)
    return LLM(model=path, dtype="float32", max_num_seqs=4,
               num_device_blocks_override=128, block_size=8)


def test_guided_choice_e2e(tiny_llm):
    from aphrodite_tpu import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=16,
                        guided_choice=["yes", "no"])
    out = tiny_llm.generate(["answer:"], sp)[0].outputs[0]
    assert out.text in ("yes", "no"), out.text


def test_guided_regex_e2e(tiny_llm):
    from aphrodite_tpu import SamplingParams

    import re

    sp = SamplingParams(temperature=0.0, max_tokens=24,
                        guided_regex=r"[0-9]{3}-[0-9]{4}")
    out = tiny_llm.generate(["phone:"], sp)[0].outputs[0]
    assert re.fullmatch(r"[0-9]{3}-[0-9]{4}", out.text), out.text


def test_guided_json_e2e(tiny_llm):
    from aphrodite_tpu import SamplingParams

    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"}},
              "required": ["ok"]}
    sp = SamplingParams(temperature=0.8, seed=3, max_tokens=32,
                        guided_json=schema)
    out = tiny_llm.generate(["result:"], sp)[0].outputs[0]
    parsed = json.loads(out.text)
    assert isinstance(parsed["ok"], bool)


# ---------------------------------------------------------------------------
# guided_grammar (Lark-subset EBNF -> incremental Earley)


def _walk(fsm, text):
    """Advance the grammar chart char-by-char; None if it dies."""
    chart = list(fsm._states[0])
    for c in text:
        if fsm._advance(chart, c) is None:
            return None
    return chart


ARITH = r"""
start: expr
expr: term | expr "+" term | expr "-" term
term: factor | term "*" factor
factor: NUMBER | "(" expr ")"
NUMBER: /[0-9]+/
%ignore / /
"""


def _make_grammar_fsm(grammar, tmpdir):
    from transformers import AutoTokenizer

    from aphrodite_tpu.guided.grammar_fsm import CFG, GrammarTokenFSM
    from tests.utils import make_tiny_tokenizer

    d = str(tmpdir)
    make_tiny_tokenizer(d, vocab_size=256)
    tok = AutoTokenizer.from_pretrained(d)
    alphabet = set()
    for tid in range(256):
        try:
            alphabet.update(tok.decode([tid]))
        except Exception:
            pass
    alphabet.discard("�")
    return GrammarTokenFSM(CFG(grammar, alphabet), tok, 256)


def test_grammar_recognizer_arith(tmp_path):
    fsm = _make_grammar_fsm(ARITH, tmp_path)
    good = ["1", "1+2", "12 * (3 + 4)", "(1)", "1 + 2 * 3 - 4"]
    bad = ["+", "1 +", "(1", "1 ++ 2", ")", "* 3"]
    for t in good:
        chart = _walk(fsm, t)
        assert chart is not None and fsm._accepts(chart), t
    for t in bad:
        chart = _walk(fsm, t)
        assert chart is None or not fsm._accepts(chart), t
    # Prefixes of valid strings stay alive even if not yet accepting.
    chart = _walk(fsm, "12 * (")
    assert chart is not None and not fsm._accepts(chart)


def test_grammar_nested_recursion_depth(tmp_path):
    fsm = _make_grammar_fsm(ARITH, tmp_path)
    deep = "(" * 12 + "7" + ")" * 12
    chart = _walk(fsm, deep)
    assert chart is not None and fsm._accepts(chart)
    assert _walk(fsm, "(" * 3 + "7" + ")" * 4) is None


def test_grammar_quantifiers_and_imports(tmp_path):
    g = r"""
start: "v" DIGIT+ ("." DIGIT+)*
%import common.DIGIT
"""
    fsm = _make_grammar_fsm(g, tmp_path)
    for t in ["v1", "v12.3", "v1.2.3"]:
        chart = _walk(fsm, t)
        assert chart is not None and fsm._accepts(chart), t
    for t in ["v", "v1.", "1.2", "v1..2"]:
        chart = _walk(fsm, t)
        assert chart is None or not fsm._accepts(chart), t


def test_guided_grammar_e2e(tiny_llm):
    import re

    from aphrodite_tpu import SamplingParams

    grammar = r"""
start: "(" NUM ("," NUM)* ")"
NUM: /[0-9]+/
"""
    sp = SamplingParams(temperature=0.9, seed=11, max_tokens=24,
                        guided_grammar=grammar)
    out = tiny_llm.generate(["list:"], sp)[0].outputs[0]
    assert re.fullmatch(r"\([0-9]+(,[0-9]+)*\)", out.text), out.text


# ---------------------------------------------------------------------------
# Async FSM compilation (r5): a slow guided-spec build must not stall the
# engine step loop, and build failures surface as request errors.
# ---------------------------------------------------------------------------


def test_async_fsm_slow_build_does_not_stall_other_requests(
        tiny_llm, monkeypatch):
    import time

    from aphrodite_tpu import SamplingParams
    from aphrodite_tpu.guided import token_fsm as tf

    real = tf.get_token_fsm

    def slow(*a, **k):
        time.sleep(1.2)
        return real(*a, **k)

    monkeypatch.setattr(tf, "get_token_fsm", slow)
    eng = tiny_llm.engine
    eng.add_request("plain-r5", prompt="hello",
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=4, ignore_eos=True))
    # Unique spec so the module FSM cache can't serve it instantly.
    eng.add_request("guided-r5", prompt="d:",
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=6,
                        guided_regex=r"[0-8]{2}-[0-8]{2}"))
    t0 = time.monotonic()
    done = {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                done[out.request_id] = time.monotonic() - t0
        assert time.monotonic() - t0 < 30.0
    assert "plain-r5" in done and "guided-r5" in done
    # The plain request finished while the FSM was still compiling
    # (slack below the 1.2s build sleep absorbs CI load jitter).
    assert done["plain-r5"] < 1.1, done
    assert done["guided-r5"] >= 1.2, done
    assert done["plain-r5"] < done["guided-r5"]


def test_async_fsm_build_failure_surfaces_as_request_error(
        tiny_llm, monkeypatch):
    from aphrodite_tpu import SamplingParams
    from aphrodite_tpu.guided import token_fsm as tf

    def boom(*a, **k):
        import time

        time.sleep(0.05)  # force the parked (async) path
        raise RuntimeError("synthetic FSM build failure")

    monkeypatch.setattr(tf, "get_token_fsm", boom)
    eng = tiny_llm.engine
    eng.add_request("bad-guided-r5", prompt="x:",
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=4,
                        guided_regex=r"[0-7]{9}"))
    finals = []
    while eng.has_unfinished_requests():
        finals.extend(o for o in eng.step() if o.finished)
    assert len(finals) == 1
    out = finals[0]
    assert out.request_id == "bad-guided-r5"
    assert out.error and "synthetic FSM build failure" in out.error
    assert not out.outputs or not out.outputs[0].token_ids


def test_async_fsm_abort_while_parked(tiny_llm, monkeypatch):
    import time

    from aphrodite_tpu import SamplingParams
    from aphrodite_tpu.guided import token_fsm as tf

    real = tf.get_token_fsm

    def slow(*a, **k):
        time.sleep(0.5)
        return real(*a, **k)

    monkeypatch.setattr(tf, "get_token_fsm", slow)
    eng = tiny_llm.engine
    eng.add_request("abort-guided-r5", prompt="x:",
                    sampling_params=SamplingParams(
                        temperature=0.0, max_tokens=4,
                        guided_regex=r"[1-5]{8}"))
    assert eng.has_unfinished_requests()
    eng.abort_request("abort-guided-r5")
    # Engine must drain cleanly: the parked entry is dropped once its
    # future resolves, without scheduling or crashing.
    t0 = time.monotonic()
    while eng.has_unfinished_requests():
        eng.step()
        assert time.monotonic() - t0 < 10.0
