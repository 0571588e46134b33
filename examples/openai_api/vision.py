"""OpenAI-compatible vision request (image_url content parts; the
server runs the model's native preprocessing)."""

import base64
import json
import urllib.request

with open("image.jpg", "rb") as f:
    b64 = base64.b64encode(f.read()).decode()

req = urllib.request.Request(
    "http://localhost:2242/v1/chat/completions",
    data=json.dumps({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "What is in this image?"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/jpeg;base64,{b64}"}},
        ]}],
        "max_tokens": 64,
    }).encode(),
    headers={"Content-Type": "application/json"})
print(json.load(urllib.request.urlopen(req)))
