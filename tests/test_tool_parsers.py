"""Tool-call parser tests (reference tool_parsers/ behavior)."""

import json

from aphrodite_tpu.endpoints.openai.tool_parsers import (parse_hermes,
                                                         parse_mistral,
                                                         parse_tool_calls)


def test_hermes_single_call():
    text = ('I will check the weather.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
            '</tool_call>')
    content, calls = parse_hermes(text)
    assert content == "I will check the weather."
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "city": "Paris"}


def test_hermes_multiple_calls():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    content, calls = parse_hermes(text)
    assert content is None
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_hermes_no_call():
    content, calls = parse_hermes("just a normal reply")
    assert content == "just a normal reply"
    assert calls == []


def test_mistral_calls():
    text = ('[TOOL_CALLS] [{"name": "lookup", "arguments": '
            '{"q": "tpu"}}]')
    content, calls = parse_mistral(text)
    assert content is None
    assert calls[0]["function"]["name"] == "lookup"


def test_auto_parser():
    content, calls = parse_tool_calls(
        '[TOOL_CALLS] [{"name": "f", "arguments": {}}]')
    assert calls and calls[0]["function"]["name"] == "f"
    content, calls = parse_tool_calls(
        '<tool_call>{"name": "g", "arguments": {}}</tool_call>')
    assert calls and calls[0]["function"]["name"] == "g"


def test_malformed_json_ignored():
    content, calls = parse_hermes("<tool_call>{broken</tool_call>")
    assert calls == []
