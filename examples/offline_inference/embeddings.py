"""Embedding/pooling models (reference embedding_inference.py)."""

import sys

from aphrodite_tpu import LLM

llm = LLM(model=sys.argv[1])
outs = llm.encode(["The quick brown fox", "A lazy dog"],
                  pooling="last")  # or "mean"
for o in outs:
    print(len(o.embedding), o.embedding[:4])
