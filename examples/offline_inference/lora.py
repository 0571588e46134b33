"""Multi-LoRA serving (reference lora_aphrodite_engine.py): per-request
adapters over one base model."""

import sys

from aphrodite_tpu import LLM, SamplingParams
from aphrodite_tpu.lora.request import LoRARequest

llm = LLM(model=sys.argv[1], enable_lora=True, max_loras=4)
lora = LoRARequest("my-adapter", 1, sys.argv[2])
out = llm.generate(["Tell me a joke:"],
                   SamplingParams(max_tokens=48),
                   lora_request=lora)
print(out[0].outputs[0].text)
