"""Gemma / Gemma2 decoders.

Reference: aphrodite/modeling/models/gemma.py, gemma2.py. Differences
from Llama handled here: (1+w) RMSNorm weights, sqrt(H)-scaled token
embeddings, GeGLU MLP, always-tied LM head; Gemma2 adds sandwich norms
(post-attention + pre/post-feedforward), query scaling by
query_pre_attn_scalar, attention + final-logit soft-capping, and
alternating local(sliding)/global attention layers (handled with a
lax.cond inside the layer scan: both attention variants are compiled,
a scanned per-layer flag picks one).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.models.layers import (apply_rope,
                                         scan_layers_paged)
from aphrodite_tpu.ops.attention import ragged_paged_attention
from aphrodite_tpu.ops.kv_cache import write_kv
from aphrodite_tpu.quantization.qlinear import qmatmul


class GemmaForCausalLM(LlamaForCausalLM):
    tie_word_embeddings_default = True
    norm_weight_offset = 1.0
    scale_embeddings = True
    hidden_act = "gelu_tanh"


class Gemma2ForCausalLM(GemmaForCausalLM):
    # The custom layer loop understands the fused wqkv/w13 keys and
    # routes stacked quant containers (wrap_quant_stacked), so the
    # load-time projection fusion applies despite the custom forward.
    supports_projection_fusion = True

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.logit_softcap = float(hf.get("final_logit_softcapping") or 0.0)
        self.attn_softcap = float(hf.get("attn_logit_softcapping") or 0.0)
        qs = hf.get("query_pre_attn_scalar")
        if qs:
            self.sm_scale = float(qs)**-0.5
        # Even layers use sliding-window (local) attention, odd global
        # (HF Gemma2 convention: layer_types / sliding_window pattern).
        self.sliding_window_size = hf.get("sliding_window", 4096)
        self.sliding_window = None  # handled per-layer, not globally

    def _local_layer_mask(self) -> jnp.ndarray:
        layer_types = self.config.hf_config.get("layer_types")
        if layer_types:
            return jnp.asarray(
                [t == "sliding_attention" for t in layer_types])
        return jnp.arange(self.num_layers) % 2 == 0

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, H = self.num_layers, self.hidden_size
        shapes["layers"]["post_attn_norm"] = (L, H)
        shapes["layers"]["post_ff_norm"] = (L, H)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["post_attn_norm"] = P()
        specs["layers"]["post_ff_norm"] = P()
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        # HF Gemma2 names: post_attention_layernorm is the *post* norm of
        # the attention block; pre/post_feedforward_layernorm wrap the MLP.
        maps = [m for m in maps
                if m[0] != "model.layers.{i}.post_attention_layernorm.weight"]
        maps += [
            ("model.layers.{i}.post_attention_layernorm.weight",
             "layers.post_attn_norm", False),
            ("model.layers.{i}.pre_feedforward_layernorm.weight",
             "layers.post_norm", False),
            ("model.layers.{i}.post_feedforward_layernorm.weight",
             "layers.post_ff_norm", False),
        ]
        return maps

    def forward(
        self,
        params: Dict[str, Any],
        kv_pages: jax.Array,
        batch: ForwardBatch,
        *,
        mesh: Optional[Mesh] = None,
        use_attention_kernel: Optional[bool] = None,
        kv_scales=None,
        lora=None,  # LoRA not wired for gemma2's custom loop yet
    ) -> Tuple[jax.Array, jax.Array]:
        NH, NKV, D = (self.num_heads, self.num_kv_heads_padded,
                      self.head_dim)
        x = params["embed"][batch.token_ids].astype(self.dtype)
        x = x * jnp.asarray(self.hidden_size**0.5, self.dtype)
        cos_g = self._cos[batch.positions]
        sin_g = self._sin[batch.positions]
        # Gemma3: local (sliding) layers use their own rope base.
        if getattr(self, "_cos_local", None) is not None:
            cos_l = self._cos_local[batch.positions]
            sin_l = self._sin_local[batch.positions]
        else:
            cos_l, sin_l = cos_g, sin_g
        layer_params = params["layers"]
        is_local = self._local_layer_mask()

        def attention(q, pages, pidx, window):
            return ragged_paged_attention(
                q[0], pages, batch.kv_lens, pidx,
                batch.cu_q_lens, batch.num_seqs, sm_scale=self.sm_scale,
                sliding_window=window, soft_cap=self.attn_softcap or None,
                mesh=mesh, use_kernel=use_attention_kernel)

        def layer_fn(x, pages, slots, pidx, scanned):
            lp, local, k_scale, v_scale = scanned
            h = self._norm(x, lp["input_norm"])
            if "wqkv" in lp:
                # Load-time fused projection (fuse_projections).
                qkv = qmatmul(h, lp["wqkv"]).astype(self.dtype)
                q = qkv[:, :NH * D].reshape(-1, NH, D)
                k = qkv[:, NH * D:(NH + NKV) * D].reshape(-1, NKV, D)
                v = qkv[:, (NH + NKV) * D:].reshape(-1, NKV, D)
            else:
                q = qmatmul(h, lp["wq"]).astype(self.dtype).reshape(
                    -1, NH, D)
                k = qmatmul(h, lp["wk"]).astype(self.dtype).reshape(
                    -1, NKV, D)
                v = qmatmul(h, lp["wv"]).astype(self.dtype).reshape(
                    -1, NKV, D)
            q, k = self.qk_norm(q, k, lp)
            cos = jnp.where(local, cos_l, cos_g)
            sin = jnp.where(local, sin_l, sin_g)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            pages = write_kv(pages, k, v, slots,
                             k_scale=k_scale, v_scale=v_scale)
            if k_scale is not None:
                q = q * k_scale.astype(q.dtype)
            attn = jax.lax.cond(
                local,
                lambda operands: attention(operands[0], operands[1],
                                           operands[2],
                                           self.sliding_window_size),
                lambda operands: attention(operands[0], operands[1],
                                           operands[2], None),
                ((q[None], pages, pidx)),
            )
            if v_scale is not None:
                attn = attn * v_scale.astype(attn.dtype)
            attn = attn.reshape(-1, NH * D)
            o = qmatmul(attn, lp["wo"]).astype(self.dtype)
            x = x + self._norm(o, lp["post_attn_norm"])
            h = self._norm(x, lp["post_norm"])
            ff = self.mlp(lp, h, mesh=mesh).astype(self.dtype)
            x = x + self._norm(ff, lp["post_ff_norm"])
            return x, pages

        from aphrodite_tpu.models.llama import wrap_quant_stacked

        layer_params, layer_fn = wrap_quant_stacked(
            layer_params, layer_fn, self.num_layers)
        k_scales, v_scales = kv_scales if kv_scales is not None else (None,
                                                                      None)
        x, new_kv_pages = scan_layers_paged(
            layer_fn, x, kv_pages,
            (layer_params, is_local, k_scales, v_scales), batch)
        x = self._norm(x, params["final_norm"])
        return new_kv_pages, x


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    """Gemma3 text model: 5:1 sliding/global layer pattern with a
    SEPARATE rope base for local layers (rope_local_base_freq), per-head
    (1+w) RMS QK-norm, no soft-capping.

    Reference: aphrodite models registry (gemma3). The multimodal
    Gemma3 (vision) variant is not wired yet.
    """

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.logit_softcap = 0.0
        self.attn_softcap = 0.0
        from aphrodite_tpu.models.layers import compute_rope_tables

        # Local (sliding) layers use their own base and NO scaling; the
        # global rope keeps rope_theta (+ any rope_scaling), which the
        # base class already built into self._cos/_sin.
        self._cos_local, self._sin_local = compute_rope_tables(
            self.rotary_dim,
            self.max_position,
            base=float(hf.get("rope_local_base_freq", 10000.0)),
            rope_scaling=None,
            dtype=jnp.float32,
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, D = self.num_layers, self.head_dim
        shapes["layers"]["q_norm"] = (L, D)
        shapes["layers"]["k_norm"] = (L, D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return super().hf_param_mappings() + [
            ("model.layers.{i}.self_attn.q_norm.weight", "layers.q_norm",
             False),
            ("model.layers.{i}.self_attn.k_norm.weight", "layers.k_norm",
             False),
        ]

    def qk_norm(self, q: jax.Array, k: jax.Array,
                lp: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        from aphrodite_tpu.models.layers import rms_norm

        qn, _ = rms_norm(q, lp["q_norm"] + 1.0, self.rms_eps)
        kn, _ = rms_norm(k, lp["k_norm"] + 1.0, self.rms_eps)
        return qn.astype(q.dtype), kn.astype(k.dtype)
