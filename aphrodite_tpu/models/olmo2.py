"""OLMo2 decoder.

Reference: aphrodite models registry (olmo family). Differences from
Llama: NO pre-attention/pre-MLP norms — instead RMSNorm is applied to
the attention and MLP *outputs* before the residual add (post-norm), and
full-width RMS q_norm/k_norm on the q/k projections before head reshape.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.models.layers import (apply_rope, rms_norm,
                                         scan_layers_paged)
from aphrodite_tpu.ops.attention import ragged_paged_attention
from aphrodite_tpu.ops.kv_cache import write_kv
from aphrodite_tpu.quantization.qlinear import qmatmul


class Olmo2ForCausalLM(LlamaForCausalLM):
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L = self.num_layers
        NH, NKV, D = (self.num_heads, self.num_kv_heads_padded,
                      self.head_dim)
        layers = shapes["layers"]
        # input_norm is reused as the post-attention output norm and
        # post_norm as the post-MLP output norm (same shapes).
        layers["q_norm"] = (L, NH * D)
        layers["k_norm"] = (L, NKV * D)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
        return specs

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [m for m in super().hf_param_mappings()
                if m[0] not in (
                    "model.layers.{i}.input_layernorm.weight",
                    "model.layers.{i}.post_attention_layernorm.weight")]
        maps += [
            # HF OLMo2: post_attention_layernorm normalizes attn OUTPUT,
            # post_feedforward_layernorm the MLP output.
            ("model.layers.{i}.post_attention_layernorm.weight",
             "layers.input_norm", False),
            ("model.layers.{i}.post_feedforward_layernorm.weight",
             "layers.post_norm", False),
            ("model.layers.{i}.self_attn.q_norm.weight", "layers.q_norm",
             False),
            ("model.layers.{i}.self_attn.k_norm.weight", "layers.k_norm",
             False),
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
        lora=None,
    ) -> Tuple[jax.Array, jax.Array]:
        NH, NKV, D = (self.num_heads, self.num_kv_heads_padded,
                      self.head_dim)
        x = params["embed"][batch.token_ids].astype(self.dtype)
        cos = self._cos[batch.positions]
        sin = self._sin[batch.positions]
        layer_params = params["layers"]
        inner_mesh = mesh if \
            self.parallel_config.pipeline_parallel_size == 1 else None

        def layer_fn(x, pages, slots, pidx, scanned):
            lp, k_scale, v_scale = scanned[:3]
            q = qmatmul(x, lp["wq"])
            k = qmatmul(x, lp["wk"])
            v = qmatmul(x, lp["wv"])
            q, _ = rms_norm(q.astype(self.dtype), lp["q_norm"],
                            self.rms_eps)
            k, _ = rms_norm(k.astype(self.dtype), lp["k_norm"],
                            self.rms_eps)
            q = q.reshape(-1, NH, D)
            k = k.reshape(-1, NKV, D)
            v = v.astype(self.dtype).reshape(-1, NKV, D)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            pages = write_kv(pages, k, v, slots,
                             k_scale=k_scale, v_scale=v_scale)
            if k_scale is not None:
                q = q * k_scale.astype(q.dtype)
            attn = ragged_paged_attention(
                q, pages, batch.kv_lens, pidx,
                batch.cu_q_lens, batch.num_seqs, sm_scale=self.sm_scale,
                sliding_window=self.sliding_window, mesh=inner_mesh,
                use_kernel=use_attention_kernel)
            if v_scale is not None:
                attn = attn * v_scale.astype(attn.dtype)
            attn = attn.reshape(-1, NH * D)
            o = qmatmul(attn, lp["wo"]).astype(self.dtype)
            o, _ = rms_norm(o, lp["input_norm"], self.rms_eps)
            x = x + o
            ff = self.mlp(lp, x, mesh=inner_mesh).astype(self.dtype)
            ff, _ = rms_norm(ff, lp["post_norm"], self.rms_eps)
            x = x + ff
            return x, pages

        k_scales, v_scales = kv_scales if kv_scales is not None else (
            None, None)
        pp = self.parallel_config.pipeline_parallel_size
        if pp > 1 and mesh is not None:
            x, new_kv_pages = self._layers_pipeline(
                layer_fn, x, layer_params,
                kv_pages, k_scales, v_scales, None, batch, mesh, pp)
        else:
            x, new_kv_pages = scan_layers_paged(
                layer_fn, x, kv_pages,
                (layer_params, k_scales, v_scales), batch)
        x, _ = rms_norm(x, params["final_norm"], self.rms_eps)
        return new_kv_pages, x
