"""Falcon (7b / 40b / rw): three decoder styles behind one class.

Reference: aphrodite/modeling/models/falcon.py (FalconForCausalLM).
- 7b: multi-query (kv=1), parallel residual from ONE input_layernorm,
  fused qkv stored [Q(all) | K | V] contiguously.
- 40b/180b (new_decoder_architecture): grouped-query, parallel residual
  with separate ln_attn / ln_mlp, fused qkv stored per-KV-group
  [q_1..q_g | k | v].
- rw (legacy): multi-head, sequential residual, NeoX-style head-
  interleaved fused qkv; optional ALiBi (Bloom slope schedule).
"""

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.llama import LlamaForCausalLM


class FalconForCausalLM(LlamaForCausalLM):
    norm_type = "layernorm"
    gated_mlp = False
    ungated_act = "gelu"
    tie_word_embeddings_default = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        heads = int(hf.get("num_attention_heads") or hf.get("n_head"))
        self.new_arch = bool(hf.get("new_decoder_architecture"))
        if self.new_arch:
            kv = int(hf.get("num_kv_heads") or heads)
        elif hf.get("multi_query", True):
            kv = 1
        else:
            kv = heads
        hf.setdefault("num_key_value_heads", kv)
        hf.setdefault("intermediate_size", 4 * int(hf["hidden_size"]))
        hf.setdefault("rms_norm_eps",
                      hf.get("layer_norm_epsilon", 1e-5))
        self.parallel_residual = self.new_arch or bool(
            hf.get("parallel_attn", True))
        self.single_norm = self.parallel_residual and not self.new_arch
        if hf.get("alibi"):
            self.use_rope = False
        super().__init__(model_config, parallel_config)
        if hf.get("alibi"):
            from aphrodite_tpu.models.bloom import get_alibi_slopes

            self.alibi_slopes = jnp.asarray(get_alibi_slopes(heads))

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        h = "transformer.h.{i}."
        ln_in = "ln_attn" if self.new_arch else "input_layernorm"
        maps = [
            (h + ln_in + ".weight", "layers.input_norm", False),
            (h + ln_in + ".bias", "layers.input_norm_b", False),
            (h + "self_attention.dense.weight", "layers.wo", True),
            (h + "mlp.dense_h_to_4h.weight", "layers.fc1", True),
            (h + "mlp.dense_4h_to_h.weight", "layers.fc2", True),
        ]
        if not self.single_norm:
            ln_post = "ln_mlp" if self.new_arch else \
                "post_attention_layernorm"
            maps += [
                (h + ln_post + ".weight", "layers.post_norm", False),
                (h + ln_post + ".bias", "layers.post_norm_b", False),
            ]
        return maps

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("transformer.word_embeddings.weight", "embed", False),
            ("transformer.ln_f.weight", "final_norm", False),
            ("transformer.ln_f.bias", "final_norm_b", False),
        ]

    def hf_split_mappings(self):
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        if self.new_arch:
            width = KV * (NH // KV + 2) * D
        else:
            width = (NH + 2) * D if KV == 1 else 3 * NH * D
        return [
            ("transformer.h.{i}.self_attention.query_key_value.weight",
             [("layers.qkv_fused", 0, width)], True),
        ]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        lay = params["layers"]
        if "qkv_fused" not in lay:
            return
        NH, KV, D = self.num_heads, self.num_kv_heads, self.head_dim
        w = lay.pop("qkv_fused")  # [L, H, width]
        L, H = w.shape[0], w.shape[1]
        if self.new_arch:
            g = NH // KV
            w = w.reshape(L, H, KV, g + 2, D)
            wq = w[:, :, :, :g, :].reshape(L, H, NH * D)
            wk = w[:, :, :, g, :].reshape(L, H, KV * D)
            wv = w[:, :, :, g + 1, :].reshape(L, H, KV * D)
        elif KV == 1:
            wq = w[..., :NH * D]
            wk = w[..., NH * D:(NH + 1) * D]
            wv = w[..., (NH + 1) * D:]
        else:  # legacy MHA: NeoX-style head interleave
            w = w.reshape(L, H, NH, 3, D)
            wq = w[:, :, :, 0, :].reshape(L, H, NH * D)
            wk = w[:, :, :, 1, :].reshape(L, H, NH * D)
            wv = w[:, :, :, 2, :].reshape(L, H, NH * D)
        reps = self.num_kv_heads_padded // KV
        if reps > 1:
            # Repeat-in-place (see llama maybe_pad_kv_weight): shard s's
            # q heads must see their own kv group.
            wk = np.repeat(wk.reshape(L, H, KV, D), reps,
                           axis=2).reshape(L, H, -1)
            wv = np.repeat(wv.reshape(L, H, KV, D), reps,
                           axis=2).reshape(L, H, -1)
        lay["wq"] = np.ascontiguousarray(wq)
        lay["wk"] = np.ascontiguousarray(wk)
        lay["wv"] = np.ascontiguousarray(wv)
