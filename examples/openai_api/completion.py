"""OpenAI-compatible completion client (server: `aphrodite run <model>`
or `python -m aphrodite_tpu run <model> --port 2242`)."""

import json
import urllib.request

req = urllib.request.Request(
    "http://localhost:2242/v1/completions",
    data=json.dumps({
        "prompt": "The quick brown fox",
        "max_tokens": 32,
        "temperature": 0.7,
    }).encode(),
    headers={"Content-Type": "application/json"})
print(json.load(urllib.request.urlopen(req)))
