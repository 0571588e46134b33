"""Automatic prefix caching (reference cached_prefix_inference.py):
shared prompt prefixes hit cached KV pages."""

import sys
import time

from aphrodite_tpu import LLM, SamplingParams

llm = LLM(model=sys.argv[1], enable_prefix_caching=True)
prefix = ("You are a helpful assistant. Answer concisely and "
          "accurately. ") * 8
sp = SamplingParams(temperature=0.0, max_tokens=32)

t0 = time.time()
llm.generate([prefix + "What is 2+2?"], sp)
print(f"cold: {time.time()-t0:.2f}s")
t0 = time.time()
llm.generate([prefix + "What is the capital of France?"], sp)
print(f"warm (prefix cached): {time.time()-t0:.2f}s")
