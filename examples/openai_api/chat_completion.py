"""OpenAI-compatible chat client with streaming."""

import json
import urllib.request

req = urllib.request.Request(
    "http://localhost:2242/v1/chat/completions",
    data=json.dumps({
        "messages": [{"role": "user", "content": "Hello!"}],
        "max_tokens": 64,
        "stream": True,
    }).encode(),
    headers={"Content-Type": "application/json"})
with urllib.request.urlopen(req) as resp:
    for line in resp:
        line = line.decode().strip()
        if line.startswith("data: ") and line != "data: [DONE]":
            chunk = json.loads(line[6:])
            delta = chunk["choices"][0]["delta"].get("content") or ""
            print(delta, end="", flush=True)
print()
