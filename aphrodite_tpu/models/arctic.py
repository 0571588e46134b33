"""Snowflake Arctic: dense/MoE-interleaved decoder with an optional
parallel residual MLP branch on MoE layers.

Reference: aphrodite/modeling/models/arctic.py (ArcticForCausalLM).
Layer pattern: layer i is MoE iff (i+1) % moe_layer_frequency == 0
(arctic.py:97); other layers use a dense SwiGLU stored under
block_sparse_moe.mlp. MoE routing is Mixtral-style softmax top-k with
renormalization iff top_k > 1 (fused_topk, arctic.py:168-171). When
use_residual, a MoE layer computes (arctic.py:330-349):

    h_attn = x + attn(ln_in(x))
    out    = h_attn + residual_mlp(res_ln(h_attn))
                    + moe(post_ln(x))          # post-LN of the layer INPUT

(the MoE branch reads the pre-attention input — an Arctic quirk);
without use_residual the layer is the standard
h_attn + block(post_ln(h_attn)).

TPU-native layout: the interleave pattern is static, so layers fold
into "groups" of (moe_layer_frequency - 1) dense layers plus one MoE
layer; ONE lax.scan runs over the [G]-stacked groups (dense sub-layers
unrolled inside the body — frequency is small), and any trailing dense
layers (L % frequency) run unrolled after the scan. The paged KV cache
stays flat as the scan carry with per-sub-layer slot offsets
(scan over groups == scan_layers_paged generalized to multi-layer
steps).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.layers import (apply_rope, flatten_kv_pages,
                                         rms_norm, silu_and_mul)
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.ops.attention import ragged_paged_attention
from aphrodite_tpu.ops.kv_cache import write_kv
from aphrodite_tpu.ops.moe import moe_mlp
from aphrodite_tpu.quantization.qlinear import qmatmul


class ArcticForCausalLM(LlamaForCausalLM):
    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.num_experts = int(hf.get("num_local_experts", 8))
        self.top_k = int(hf.get("num_experts_per_tok", 1))
        self.moe_freq = int(hf.get("moe_layer_frequency", 2))
        self.use_residual = bool(hf.get("use_residual", True))
        L = self.num_layers
        self.moe_idx = [i for i in range(L)
                        if (i + 1) % self.moe_freq == 0]
        self.dense_idx = [i for i in range(L)
                          if (i + 1) % self.moe_freq != 0]
        # Loader hook: expert stacks live at the MoE layers.
        self.expert_layer_indices = self.moe_idx

    # ---- params ----------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, H, F, E = (self.num_layers, self.hidden_size,
                      self.intermediate_size, self.num_experts)
        layers = shapes["layers"]
        for k in ("gate", "up", "down"):
            layers.pop(k)
        Nd, G = len(self.dense_idx), len(self.moe_idx)
        if Nd:
            shapes["dense_layers"] = {
                "gate": (Nd, H, F),
                "up": (Nd, H, F),
                "down": (Nd, F, H),
            }
        shapes["moe_layers"] = {
            "router": (G, H, E),
            "w1": (G, E, H, F),
            "w3": (G, E, H, F),
            "w2": (G, E, F, H),
        }
        if self.use_residual:
            # Residual MLP ffn_dim == hidden_size (arctic.py:50).
            shapes["res_layers"] = {
                "norm": (G, H),
                "gate": (G, H, H),
                "up": (G, H, H),
                "down": (G, H, H),
            }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("gate", "up", "down"):
            layers.pop(k)
        if self.dense_idx:
            specs["dense_layers"] = {
                "gate": P(None, None, "model"),
                "up": P(None, None, "model"),
                "down": P(None, "model", None),
            }
        specs["moe_layers"] = {
            "router": P(),
            "w1": P(None, "model", None, None),
            "w3": P(None, "model", None, None),
            "w2": P(None, "model", None, None),
        }
        if self.use_residual:
            specs["res_layers"] = {
                "norm": P(),
                "gate": P(None, None, "model"),
                "up": P(None, None, "model"),
                "down": P(None, "model", None),
            }
        return specs

    def quantizable_weights(self) -> List[str]:
        return ["layers.wq", "layers.wk", "layers.wv", "layers.wo"]

    # ---- loading ---------------------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return [m for m in super().hf_param_mappings()
                if m[1] not in ("layers.gate", "layers.up", "layers.down")]

    def hf_aux_mappings(self):
        la = "model.layers.{i}."
        Nd, G = len(self.dense_idx), len(self.moe_idx)
        out = []
        if Nd:
            out += [
                (la + "block_sparse_moe.mlp.w1.weight",
                 "dense_layers.gate", True, Nd, self.dense_idx),
                (la + "block_sparse_moe.mlp.w3.weight",
                 "dense_layers.up", True, Nd, self.dense_idx),
                (la + "block_sparse_moe.mlp.w2.weight",
                 "dense_layers.down", True, Nd, self.dense_idx),
            ]
        out.append((la + "block_sparse_moe.gate.weight",
                    "moe_layers.router", True, G, self.moe_idx))
        if self.use_residual:
            out += [
                (la + "residual_layernorm.weight", "res_layers.norm",
                 False, G, self.moe_idx),
                (la + "residual_mlp.w1.weight", "res_layers.gate", True,
                 G, self.moe_idx),
                (la + "residual_mlp.w3.weight", "res_layers.up", True,
                 G, self.moe_idx),
                (la + "residual_mlp.w2.weight", "res_layers.down", True,
                 G, self.moe_idx),
            ]
        return out

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "model.layers.{i}.block_sparse_moe.experts.{e}"
        return [
            (f"{p}.w1.weight", "moe_layers.w1", True),
            (f"{p}.w3.weight", "moe_layers.w3", True),
            (f"{p}.w2.weight", "moe_layers.w2", True),
        ]

    # ---- forward ---------------------------------------------------------

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

        flat, L, Pn = flatten_kv_pages(kv_pages)
        page_size = kv_pages.shape[2]

        def rms(v, w):
            out, _ = rms_norm(v, w, self.rms_eps)
            return out

        def attention(x, lp, pages, lidx):
            slots = batch.slot_mapping + lidx * (Pn * page_size)
            pidx = batch.page_indices + lidx * Pn
            h = rms(x, lp["input_norm"])
            q = qmatmul(h, lp["wq"]).astype(self.dtype).reshape(-1, NH, D)
            k = qmatmul(h, lp["wk"]).astype(self.dtype).reshape(-1, NKV,
                                                                D)
            v = qmatmul(h, lp["wv"]).astype(self.dtype).reshape(-1, NKV,
                                                                D)
            q = apply_rope(q, cos, sin, is_neox_style=True)
            k = apply_rope(k, cos, sin, is_neox_style=True)
            pages = write_kv(pages, k, v, slots)
            attn = ragged_paged_attention(
                q, pages, batch.kv_lens, pidx, batch.cu_q_lens,
                batch.num_seqs, sm_scale=self.sm_scale, mesh=mesh,
                use_kernel=use_attention_kernel)
            attn = attn.reshape(-1, NH * D)
            o = qmatmul(attn, lp["wo"]).astype(self.dtype)
            return x + o, pages

        def swiglu(h, gp):
            gate = qmatmul(h, gp["gate"])
            up = qmatmul(h, gp["up"])
            act = silu_and_mul(gate.astype(self.dtype),
                               up.astype(self.dtype))
            return qmatmul(act, gp["down"]).astype(self.dtype)

        def dense_layer(x, pages, lidx, lp, dp):
            x, pages = attention(x, lp, pages, lidx)
            x = x + swiglu(rms(x, lp["post_norm"]), dp)
            return x, pages

        def moe_layer(x, pages, lidx, lp, mp, rp):
            x_in = x
            x, pages = attention(x, lp, pages, lidx)
            moe_src = x_in if self.use_residual else x
            moe_out = moe_mlp(
                rms(moe_src, lp["post_norm"]), mp["router"], mp["w1"],
                mp["w3"], mp["w2"], self.top_k,
                renormalize=self.top_k > 1, mesh=mesh).astype(self.dtype)
            if self.use_residual:
                res = swiglu(rms(x, rp["norm"]), rp)
                x = x + res + moe_out
            else:
                x = x + moe_out
            return x, pages

        f = self.moe_freq
        G = len(self.moe_idx)
        R = self.num_layers - G * f  # trailing dense layers
        lp_all = params["layers"]
        dp_all = params.get("dense_layers")

        if G:
            # Group g covers layers [g*f, (g+1)*f): f-1 dense + 1 MoE.
            lp_groups = jax.tree.map(
                lambda a: a[:G * f].reshape((G, f) + a.shape[1:]), lp_all)
            dp_groups = None
            if f > 1:
                dp_groups = jax.tree.map(
                    lambda a: a[:G * (f - 1)].reshape(
                        (G, f - 1) + a.shape[1:]), dp_all)
            rp_groups = params.get("res_layers")
            lids = jnp.arange(G * f, dtype=jnp.int32).reshape(G, f)

            def group_body(carry, sc):
                x, flat = carry
                glids, glp, gdp, gmp, grp = sc
                for j in range(f - 1):
                    x, flat = dense_layer(
                        x, flat, glids[j],
                        jax.tree.map(lambda a: a[j], glp),
                        jax.tree.map(lambda a: a[j], gdp))
                x, flat = moe_layer(
                    x, flat, glids[f - 1],
                    jax.tree.map(lambda a: a[f - 1], glp), gmp, grp)
                return (x, flat), None

            (x, flat), _ = jax.lax.scan(
                group_body, (x, flat),
                (lids, lp_groups, dp_groups, params["moe_layers"],
                 rp_groups))

        for j in range(R):  # trailing dense layers, unrolled
            i = G * f + j
            x, flat = dense_layer(
                x, flat, jnp.int32(i),
                jax.tree.map(lambda a: a[i], lp_all),
                jax.tree.map(lambda a: a[G * (f - 1) + j], dp_all))

        x = rms(x, params["final_norm"])
        return flat.reshape(kv_pages.shape), x
