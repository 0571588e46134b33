"""Minimal offline generation (reference examples/offline_inference/
offline_inference.py). Pass a local model directory."""

import sys

from aphrodite_tpu import LLM, SamplingParams

model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.2-1B"

prompts = [
    "Hello, my name is",
    "The president of the United States is",
    "The capital of France is",
    "The future of AI is",
]
sampling = SamplingParams(temperature=0.8, top_p=0.95, max_tokens=64)

llm = LLM(model=model)
for out in llm.generate(prompts, sampling):
    print(f"Prompt: {out.prompt!r}")
    print(f"  -> {out.outputs[0].text!r}")
