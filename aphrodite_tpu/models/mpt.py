"""MPT (MosaicML): ALiBi attention, bias-free LayerNorms and Linears,
contiguous fused Wqkv, ungated exact-GELU MLP, tied embeddings.

Reference: aphrodite/modeling/models/mpt.py (MPTForCausalLM; its
_get_alibi_slopes differs from Bloom's — MPT spaces exponents by
alibi_bias_max/ceil_pow2(heads) and interleaves the non-power-of-2
remainder). clip_qkv / qk_ln variants are not implemented yet (defaults
off in every released MPT checkpoint).
"""

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.llama import LlamaForCausalLM


def get_mpt_alibi_slopes(num_heads: int,
                         alibi_bias_max: int = 8) -> np.ndarray:
    n_p2 = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, n_p2 + 1, dtype=np.float64) * (
        alibi_bias_max / n_p2)
    slopes = 1.0 / np.power(2.0, base)
    if n_p2 != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
    return slopes.astype(np.float32)


class MPTForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
    norm_bias = False
    gated_mlp = False
    ungated_act = "gelu"
    use_rope = False
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        ratio = hf.get("expansion_ratio", 4)
        hf.setdefault("intermediate_size",
                      int(ratio * int(hf.get("d_model")
                                      or hf["hidden_size"])))
        hf.setdefault("rms_norm_eps",
                      hf.get("layer_norm_epsilon", 1e-5))
        super().__init__(model_config, parallel_config)
        attn_cfg = hf.get("attn_config") or {}
        if attn_cfg.get("alibi", True):
            self.alibi_slopes = jnp.asarray(get_mpt_alibi_slopes(
                self.num_heads, int(attn_cfg.get("alibi_bias_max", 8))))

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        b = "transformer.blocks.{i}."
        return [
            (b + "norm_1.weight", "layers.input_norm", False),
            (b + "attn.out_proj.weight", "layers.wo", True),
            (b + "norm_2.weight", "layers.post_norm", False),
            (b + "ffn.up_proj.weight", "layers.fc1", True),
            (b + "ffn.down_proj.weight", "layers.fc2", True),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("transformer.wte.weight", "embed", False),
            ("transformer.norm_f.weight", "final_norm", False),
        ]

    def hf_split_mappings(self):
        # Wqkv is the usual contiguous [Q; K; V] concatenation (unlike
        # Bloom's head-interleave).
        H = self.hidden_size
        return [
            ("transformer.blocks.{i}.attn.Wqkv.weight",
             [("layers.wq", 0, H), ("layers.wk", H, 2 * H),
              ("layers.wv", 2 * H, 3 * H)], True),
        ]
