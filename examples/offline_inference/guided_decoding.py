"""Structured output: JSON schema, regex, choices, and EBNF grammars."""

import sys

from aphrodite_tpu import LLM, SamplingParams

llm = LLM(model=sys.argv[1])

schema = {
    "type": "object",
    "properties": {"name": {"type": "string"},
                   "age": {"type": "integer"}},
    "required": ["name", "age"],
}
print(llm.generate(
    ["Give me a person:"],
    SamplingParams(max_tokens=64, guided_json=schema))[0].outputs[0].text)

print(llm.generate(
    ["A phone number:"],
    SamplingParams(max_tokens=24,
                   guided_regex=r"\d{3}-\d{4}"))[0].outputs[0].text)

print(llm.generate(
    ["Sentiment:"],
    SamplingParams(max_tokens=8, guided_choice=["positive", "negative"])
)[0].outputs[0].text)

grammar = r"""
start: "(" NUM ("," NUM)* ")"
NUM: /[0-9]+/
"""
print(llm.generate(
    ["A tuple:"],
    SamplingParams(max_tokens=24,
                   guided_grammar=grammar))[0].outputs[0].text)
