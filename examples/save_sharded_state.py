"""Pre-shard a checkpoint for fast reload (reference
save_sharded_state.py): later LLM() constructions from the output
directory skip HF weight mapping entirely."""

import sys

from aphrodite_tpu import LLM

llm = LLM(model=sys.argv[1])
llm.save_sharded_state(sys.argv[2])
print(f"saved sharded state to {sys.argv[2]}")
