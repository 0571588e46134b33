"""BLOOM: ALiBi attention (no RoPE), LayerNorm, fused interleaved QKV,
embedding LayerNorm, ungated tanh-GELU MLP, tied embeddings.

Reference: aphrodite/modeling/models/bloom.py (BloomForCausalLM,
_get_alibi_slopes at bloom.py:44). The decoder loop reuses the base
stacked-layer scan; Bloom-specific bits are config normalization
(BloomConfig uses n_head/n_layer/no intermediate_size), the per-head
ALiBi slopes fed to the attention op, and the de-interleave of the fused
query_key_value weight ([NH, 3, D] head-major, unlike the usual
[q; k; v] concatenation).
"""

import math
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.llama import LlamaForCausalLM


def get_alibi_slopes(num_heads: int) -> np.ndarray:
    """HF/reference ALiBi slope schedule (geometric, with the
    non-power-of-2 head-count correction)."""
    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** i for i in range(1, closest + 1)]
    if closest != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        n_extra = min(closest, num_heads - closest)
        slopes += [extra_base ** i for i in range(1, 2 * n_extra + 1, 2)]
    return np.asarray(slopes, dtype=np.float32)


class BloomForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    norm_type = "layernorm"
    gated_mlp = False
    mlp_bias = True
    use_rope = False
    embedding_norm = True
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("num_attention_heads", hf.get("n_head"))
        hf.setdefault("intermediate_size", 4 * int(hf["hidden_size"]))
        hf.setdefault("rms_norm_eps",
                      hf.get("layer_norm_epsilon", 1e-5))
        super().__init__(model_config, parallel_config)
        self.alibi_slopes = jnp.asarray(get_alibi_slopes(self.num_heads))

    # ---- HF weight mappings ------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        h = "transformer.h.{i}."
        return [
            (h + "input_layernorm.weight", "layers.input_norm", False),
            (h + "input_layernorm.bias", "layers.input_norm_b", False),
            (h + "self_attention.dense.weight", "layers.wo", True),
            (h + "self_attention.dense.bias", "layers.bo", False),
            (h + "post_attention_layernorm.weight", "layers.post_norm",
             False),
            (h + "post_attention_layernorm.bias", "layers.post_norm_b",
             False),
            (h + "mlp.dense_h_to_4h.weight", "layers.fc1", True),
            (h + "mlp.dense_h_to_4h.bias", "layers.fc1_b", False),
            (h + "mlp.dense_4h_to_h.weight", "layers.fc2", True),
            (h + "mlp.dense_4h_to_h.bias", "layers.fc2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("transformer.word_embeddings.weight", "embed", False),
            ("transformer.word_embeddings_layernorm.weight", "embed_norm",
             False),
            ("transformer.word_embeddings_layernorm.bias", "embed_norm_b",
             False),
            ("transformer.ln_f.weight", "final_norm", False),
            ("transformer.ln_f.bias", "final_norm_b", False),
        ]

    def hf_split_mappings(self):
        H = self.hidden_size
        return [
            ("transformer.h.{i}.self_attention.query_key_value.weight",
             [("layers.qkv_fused", 0, 3 * H)], True),
            ("transformer.h.{i}.self_attention.query_key_value.bias",
             [("layers.qkv_fused_b", 0, 3 * H)], False),
        ]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        """De-interleave the fused QKV: HF stores it head-major
        [NH, (q|k|v), D] on the output dim (modeling_bloom.py
        _split_heads), not as the usual [Q; K; V] concatenation."""
        lay = params["layers"]
        if "qkv_fused" not in lay:
            return
        NH, D = self.num_heads, self.head_dim
        w = lay.pop("qkv_fused")  # [L, H, NH*3*D] (transposed at load)
        L, H = w.shape[0], w.shape[1]
        w = w.reshape(L, H, NH, 3, D)
        lay["wq"] = np.ascontiguousarray(w[:, :, :, 0, :].reshape(
            L, H, NH * D))
        lay["wk"] = np.ascontiguousarray(w[:, :, :, 1, :].reshape(
            L, H, NH * D))
        lay["wv"] = np.ascontiguousarray(w[:, :, :, 2, :].reshape(
            L, H, NH * D))
        b = lay.pop("qkv_fused_b").reshape(L, NH, 3, D)
        lay["bq"] = np.ascontiguousarray(b[:, :, 0, :].reshape(L, NH * D))
        lay["bk"] = np.ascontiguousarray(b[:, :, 1, :].reshape(L, NH * D))
        lay["bv"] = np.ascontiguousarray(b[:, :, 2, :].reshape(L, NH * D))
