"""Phi-3-Small: blocksparse attention + gegelu MLP on a LayerNorm
decoder with muP scaling.

Reference: aphrodite/modeling/models/phi3_small.py
(Phi3SmallForCausalLM). Distinctives:
- Attention is blocksparse (local blocks + per-head vertical stride,
  attention/ops/blocksparse_attention/utils.py:117-120) except every
  dense_attention_every_n_layers-th layer, which is dense
  (phi3_small.py:196-198). Fused query_key_value is grouped head-major
  ([kv_head, q_per_kv + 2, head_dim], phi3_small.py:229-231).
- MLP activation is gegelu (phi3_small.py:58-69): the fused up_proj's
  output columns interleave the gelu and linear halves (even = gelu,
  odd = linear); out = quick_gelu(min(a_gelu, limit)) *
  (clip(a_linear, ±limit) + 1).
- muP: embeddings x mup_embedding_multiplier, attention scale
  mup_attn_multiplier / head_dim, logits / mup_width_multiplier
  (applied in sample(), phi3_small.py:437 — greedy-invariant, folded
  into our logit_scale).
- LayerNorm (with bias) everywhere; lm_head tied to the embedding
  (load_weights copies it, phi3_small.py:451); dummy_token_indices are
  masked to -inf in compute_logits.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.ops.attention import DEFAULT_MASK_VALUE
from aphrodite_tpu.quantization.qlinear import qmatmul


class Phi3SmallForCausalLM(LlamaForCausalLM):
    attention_bias = True
    o_proj_bias = True
    mlp_bias = True
    norm_type = "layernorm"
    tie_word_embeddings_default = True

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        hf = model_config.hf_config
        # Key aliases consumed by the llama base.
        hf.setdefault("rms_norm_eps", hf.get("layer_norm_epsilon", 1e-5))
        hf.setdefault("rope_theta", hf.get("rope_embedding_base", 1e6))
        pos_scale = float(hf.get("rope_position_scale") or 1.0)
        rs = hf.get("rope_scaling")
        if rs is None:
            if pos_scale != 1.0:
                hf["rope_scaling"] = {"type": "linear",
                                      "factor": pos_scale}
        elif "factor" not in rs:
            rs["factor"] = pos_scale
        super().__init__(model_config, parallel_config)

        if hf.get("mup_use_scaling"):
            self.sm_scale = (float(hf["mup_attn_multiplier"])
                             / self.head_dim)
        self.embedding_multiplier = float(
            hf.get("mup_embedding_multiplier") or 1.0)
        self.logit_scale = 1.0 / float(
            hf.get("mup_width_multiplier") or 1.0)
        self.gegelu_limit = hf.get("gegelu_limit")
        self.dummy_token_ids = np.asarray(
            hf.get("dummy_token_indices") or [], np.int32)

        bsz = int(hf.get("blocksparse_block_size", 64))
        local = int(hf.get("blocksparse_num_local_blocks", 16))
        vert = int(hf.get("blocksparse_vert_stride", 8))
        homo = bool(hf.get("blocksparse_homo_head_pattern", False))
        step = 0 if homo else max(1, vert // self.num_heads)
        self.blocksparse_params = (bsz, local, vert)
        self.bs_head_offsets = jnp.arange(
            self.num_heads, dtype=jnp.int32) * step
        dense_every = hf.get("dense_attention_every_n_layers")
        if dense_every:
            self.bs_layer_mask = jnp.asarray(
                [(i + 1) % int(dense_every) != 0
                 for i in range(self.num_layers)])

    # ---- loading ---------------------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        la = "model.layers.{i}."
        return [
            (la + "input_layernorm.weight", "layers.input_norm", False),
            (la + "input_layernorm.bias", "layers.input_norm_b", False),
            (la + "post_attention_layernorm.weight", "layers.post_norm",
             False),
            (la + "post_attention_layernorm.bias", "layers.post_norm_b",
             False),
            (la + "self_attn.query_key_value.weight",
             "layers.qkv_fused", True),
            (la + "self_attn.query_key_value.bias",
             "layers.qkv_fused_b", False),
            (la + "self_attn.dense.weight", "layers.wo", True),
            (la + "self_attn.dense.bias", "layers.bo", False),
            (la + "mlp.up_proj.weight", "layers.gate_up_fused", True),
            (la + "mlp.up_proj.bias", "layers.gate_up_fused_b", False),
            (la + "mlp.down_proj.weight", "layers.down", True),
            (la + "mlp.down_proj.bias", "layers.down_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("model.embed_tokens.weight", "embed", False),
            ("model.final_layernorm.weight", "final_norm", False),
            ("model.final_layernorm.bias", "final_norm_b", False),
        ]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        lay = params["layers"]
        if "qkv_fused" in lay:
            NH, KV, D = (self.num_heads, self.num_kv_heads,
                         self.head_dim)
            g = NH // KV
            w = lay.pop("qkv_fused")  # [L, H, KV*(g+2)*D] head-major
            L, H = w.shape[0], w.shape[1]
            w = w.reshape(L, H, KV, g + 2, D)
            lay["wq"] = np.ascontiguousarray(
                w[:, :, :, :g, :].reshape(L, H, NH * D))
            wk = w[:, :, :, g, :].reshape(L, H, KV, D)
            wv = w[:, :, :, g + 1, :].reshape(L, H, KV, D)
            b = lay.pop("qkv_fused_b").reshape(L, KV, g + 2, D)
            lay["bq"] = np.ascontiguousarray(
                b[:, :, :g, :].reshape(L, NH * D))
            bk = b[:, :, g, :].reshape(L, KV, D)
            bv = b[:, :, g + 1, :].reshape(L, KV, D)
            reps = self.num_kv_heads_padded // KV
            if reps > 1:  # kv replication for tp > num_kv_heads
                wk = np.repeat(wk, reps, axis=2)
                wv = np.repeat(wv, reps, axis=2)
                bk = np.repeat(bk, reps, axis=1)
                bv = np.repeat(bv, reps, axis=1)
            lay["wk"] = np.ascontiguousarray(wk.reshape(L, H, -1))
            lay["wv"] = np.ascontiguousarray(wv.reshape(L, H, -1))
            lay["bk"] = np.ascontiguousarray(bk.reshape(L, -1))
            lay["bv"] = np.ascontiguousarray(bv.reshape(L, -1))
        if "gate_up_fused" in lay:
            w = lay.pop("gate_up_fused")  # [L, H, 2F] interleaved
            lay["gate"] = np.ascontiguousarray(w[..., 0::2])
            lay["up"] = np.ascontiguousarray(w[..., 1::2])
            b = lay.pop("gate_up_fused_b")
            lay["gate_b"] = np.ascontiguousarray(b[..., 0::2])
            lay["up_b"] = np.ascontiguousarray(b[..., 1::2])

    # ---- forward pieces --------------------------------------------------

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh=None, lora=None, lora_add=None) -> jax.Array:
        gate = qmatmul(h, lp["gate"]) + lp["gate_b"]
        up = qmatmul(h, lp["up"]) + lp["up_b"]
        g = gate.astype(jnp.float32)
        u = up.astype(jnp.float32)
        if self.gegelu_limit is not None:
            lim = float(self.gegelu_limit)
            g = jnp.minimum(g, lim)
            u = jnp.clip(u, -lim, lim)
        act = (g * jax.nn.sigmoid(1.702 * g)) * (u + 1.0)
        return qmatmul(act.astype(self.dtype), lp["down"]) + lp["down_b"]

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        logits = super().compute_logits(params, hidden)
        if self.dummy_token_ids.size:
            logits = logits.at[:, self.dummy_token_ids].set(
                DEFAULT_MASK_VALUE)
        return logits
