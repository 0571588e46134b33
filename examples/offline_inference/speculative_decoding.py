"""Speculative decoding: n-gram, draft-model, EAGLE/Medusa/MLPSpeculator
(auto-detected from the draft checkpoint's architectures)."""

import sys

from aphrodite_tpu import LLM, SamplingParams

model = sys.argv[1]
draft = sys.argv[2] if len(sys.argv) > 2 else "[ngram]"

llm = LLM(model=model, speculative_model=draft,
          num_speculative_tokens=4)
sp = SamplingParams(temperature=0.0, max_tokens=128)
out = llm.generate(["Write a story about a robot:"], sp)[0]
print(out.outputs[0].text)
