"""Baichuan / Baichuan2 (7B RoPE, 13B ALiBi): Llama topology with a
fused W_pack QKV projection; Baichuan2 additionally L2-normalizes the
LM head rows at load (NormHead).

Reference: aphrodite/modeling/models/baichuan.py —
`BaiChuanForCausalLM` (7B, ROPE) vs `BaichuanForCausalLM` (13B/2-13B,
ALIBI unless hidden_size==4096, baichuan.py:406-430); ALiBi slopes use
the Bloom closest-power-of-2 schedule (baichuan.py:49-72); Baichuan2
head normalization at baichuan.py:374-384.
"""

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.bloom import get_alibi_slopes
from aphrodite_tpu.models.llama import LlamaForCausalLM

# Baichuan2 checkpoints are distinguished by their 125,696-token vocab
# (Baichuan1 uses 64,000); reference keys normalization off the model
# generation the same way its docs describe.
_BAICHUAN2_VOCAB = 125696


class BaiChuanForCausalLM(LlamaForCausalLM):
    """Baichuan-7B (and Baichuan2-7B): rotary positions."""

    position_embedding = "ROPE"

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        if self.position_embedding == "ALIBI":
            self.use_rope = False
            self.alibi_slopes = jnp.asarray(
                get_alibi_slopes(self.num_heads))

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        skip = {"layers.wq", "layers.wk", "layers.wv"}
        return [m for m in super().hf_param_mappings()
                if m[1] not in skip]

    def hf_split_mappings(self):
        # W_pack is [Q all | K all | V all] contiguous (QKVParallelLinear
        # layout; MHA so NKV == NH).
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        q, k = NH * D, KV * D
        return [
            ("model.layers.{i}.self_attn.W_pack.weight",
             [("layers.wq", 0, q), ("layers.wk", q, q + k),
              ("layers.wv", q + k, q + 2 * k)], True),
        ]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        if self.vocab_size == _BAICHUAN2_VOCAB and "lm_head" in params:
            # Baichuan2 NormHead: L2-normalize each vocab row. Our head is
            # stored [H, V] (transposed), so normalize along axis 0.
            head = params["lm_head"].astype(np.float32)
            norm = np.linalg.norm(head, axis=0, keepdims=True)
            params["lm_head"] = head / np.maximum(norm, 1e-12)


class BaichuanForCausalLM(BaiChuanForCausalLM):
    """Baichuan-13B and Baichuan2-7B/13B: ALiBi unless hidden==4096."""

    def __init__(self, model_config, parallel_config=None) -> None:
        hidden = model_config.get_hidden_size()
        self.position_embedding = "ROPE" if hidden == 4096 else "ALIBI"
        super().__init__(model_config, parallel_config)
