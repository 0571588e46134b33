"""Vision-language generation (LLaVA-style; reference examples/vision).

Images are preprocessed pixel arrays; each model documents its item
layout in its module docstring (most take [3, H, W] pixel_values, the
HF processor's output)."""

import sys

import numpy as np

from aphrodite_tpu import LLM, SamplingParams

llm = LLM(model=sys.argv[1])
model = llm.engine.runner.model
image = np.random.rand(3, 336, 336).astype(np.float32)  # or a real one

prompt_ids = [1, 3148, model.image_token_index, 29901]
out = llm.generate(
    [{"prompt_token_ids": prompt_ids,
      "multi_modal_data": {"image": image}}],
    SamplingParams(max_tokens=64))
print(out[0].outputs[0].text)
