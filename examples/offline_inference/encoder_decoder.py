"""Encoder-decoder generation: BART/mBART/T5/Flan-T5 + Whisper ASR
(reference examples/offline_inference/encoder_decoder_inference.py)."""

import sys

from aphrodite_tpu import LLM, SamplingParams

llm = LLM(model=sys.argv[1])  # e.g. facebook/bart-large-cnn, t5-small
out = llm.generate(
    ["summarize: The quick brown fox jumps over the lazy dog."],
    SamplingParams(temperature=0.0, max_tokens=48))
print(out[0].outputs[0].text)
