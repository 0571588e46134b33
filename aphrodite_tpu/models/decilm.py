"""DeciLM (Deci/DeciLM-7b): Llama with variable GQA — a per-layer
num_key_value_heads_per_layer list. Normalized at load to uniform GQA at
the max kv-head count by replicating kv-head groups in place, which is
mathematically identical (each query group still attends to its own
head's K/V).

Reference: aphrodite/modeling/models/decilm.py (_degroup_weight
:107-120 does the same uniform-max normalization).
"""

from typing import List, Optional

import numpy as np

from aphrodite_tpu.models.llama import LlamaForCausalLM


class DeciLMForCausalLM(LlamaForCausalLM):
    # Per-layer GQA schedules replicate each layer's kv heads up to the
    # max; zero-padded asymmetric-TP groups would collide with that
    # replication layout.
    supports_asymmetric_tp = False

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        per_layer = hf.get("num_key_value_heads_per_layer")
        self.kv_per_layer: Optional[List[int]] = (
            [int(x) for x in per_layer] if per_layer else None)
        if self.kv_per_layer:
            hf["num_key_value_heads"] = max(self.kv_per_layer)
        super().__init__(model_config, parallel_config)

    def maybe_pad_kv_weight_layer(self, our_path: str, arr: np.ndarray,
                                  layer_idx: int) -> np.ndarray:
        if self.kv_per_layer and our_path in (
                "layers.wk", "layers.wv", "layers.bk", "layers.bv"):
            kvi = self.kv_per_layer[layer_idx]
            reps = self.num_kv_heads // kvi
            if reps > 1:
                D = self.head_dim
                if our_path.startswith("layers.w"):
                    in_dim = arr.shape[0]
                    arr = arr.reshape(in_dim, kvi, D)
                    arr = np.repeat(arr, reps, axis=1)
                    arr = arr.reshape(in_dim, self.num_kv_heads * D)
                else:
                    arr = np.repeat(arr.reshape(kvi, D), reps, axis=0)
                    arr = arr.reshape(self.num_kv_heads * D)
        return self.maybe_pad_kv_weight(our_path, arr)
