"""DeepSeek-V2/V3: multi-head latent attention (MLA) + sigmoid-routed
group-limited MoE with shared experts and leading dense layers.

Reference: aphrodite/modeling/models/deepseek_v2.py
(DeepseekV2ForCausalLM; the V3 MoE gate adds e_score_correction_bias and
sigmoid scoring).

Round-1 MLA strategy: the low-rank projections run exactly as in the
checkpoint (q_a/q_a_norm/q_b, kv_a/kv_a_norm/kv_b), but the ATTENTION
CACHE stores the materialized per-head K/V (V zero-padded to the qk head
dim) so the existing ragged-paged-attention op serves it unchanged.
This is numerically identical to HF; caching the compressed latent
instead (the MLA memory win) is a round-2 optimization.

Layer layout: the first `first_k_dense_replace` layers use a dense
SwiGLU; the rest are MoE. The stacked-layer scan splits into two scans
(dense stack + MoE stack) over the SAME attention parameter structure.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.layers import (apply_rope, compute_rope_tables,
                                         rms_norm, scan_layers_paged,
                                         silu_and_mul)
from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.ops.attention import ragged_paged_attention
from aphrodite_tpu.ops.kv_cache import write_kv
from aphrodite_tpu.ops.moe import apply_experts
from aphrodite_tpu.quantization.qlinear import qmatmul


class DeepseekV3ForCausalLM(LlamaForCausalLM):
    # Router flavor: "v3" = sigmoid + correction bias + group top-2 sums
    # (noaux_tc); "v2" = softmax + group max, no bias
    # (greedy/group_limited_greedy); "v1" = softmax top-k + optional
    # renorm.
    route_mode = "v3"
    # Multi-head latent attention (False = standard GQA, DeepSeek V1).
    mla = True

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        hf = model_config.hf_config
        super().__init__(model_config, parallel_config)
        if self.mla:
            self._init_mla(hf)
        self._init_moe(hf)

    def _init_mla(self, hf) -> None:
        self.q_rank = hf.get("q_lora_rank")  # None on V2-Lite
        self.kv_rank = int(hf["kv_lora_rank"])
        self.rope_dim = int(hf["qk_rope_head_dim"])
        self.nope_dim = int(hf["qk_nope_head_dim"])
        self.v_dim = int(hf["v_head_dim"])
        self.qk_dim = self.nope_dim + self.rope_dim
        self.sm_scale = self.qk_dim**-0.5
        rs = hf.get("rope_scaling") or {}
        if rs.get("type") == "yarn" and rs.get("mscale_all_dim"):
            import math

            factor = float(rs.get("factor", 1.0))
            m = float(rs["mscale_all_dim"])
            mscale = (0.1 * m * math.log(factor) + 1.0
                      if factor > 1 else 1.0)
            self.sm_scale = self.sm_scale * mscale * mscale
        self.rope_interleave = bool(hf.get("rope_interleave", True))
        import os

        from aphrodite_tpu.common.utils import cdiv as _cdiv

        # Latent-KV mode (beyond the reference snapshot, which
        # materializes per-head K/V): cache the 512-dim compressed
        # latent + shared rope key ONCE per token and absorb kv_b into
        # the query/output projections — scores are mathematically
        # identical, KV memory drops ~38-85x on V2/V3 geometry, and
        # decode becomes MQA over one wide head.
        self.mla_latent = os.environ.get("APHRODITE_MLA_LATENT",
                                         "1") != "0"
        lat = self.kv_rank + self.rope_dim
        # Pad the effective head so the TPU kernel's 128-lane tiling
        # applies on real geometry (576 -> 640); tiny test dims stay
        # unpadded and ride the jnp path.
        self.head_eff = _cdiv(lat, 128) * 128 if lat > 128 else lat
        self._cos, self._sin = compute_rope_tables(
            self.rope_dim, self.max_position,
            base=self.rope_theta, rope_scaling=self.rope_scaling,
            dtype=jnp.float32)

    def _init_moe(self, hf) -> None:
        self.num_experts = int(hf.get("n_routed_experts") or 0)
        if not self.num_experts:
            # Dense variant (MiniCPM3): every layer is a SwiGLU MLP.
            self.num_dense, self.num_moe = self.num_layers, 0
            self.top_k = 0
            self.n_group = self.topk_group = 1
            self.norm_topk_prob = False
            self.routed_scaling = 1.0
            self.moe_intermediate = self.n_shared = 0
            self.expert_layer_range = (0, 0)
            return
        self.num_dense = int(hf.get("first_k_dense_replace", 0))
        self.num_moe = self.num_layers - self.num_dense
        self.top_k = int(hf.get("num_experts_per_tok", 8))
        self.n_group = int(hf.get("n_group", 1) or 1)
        self.topk_group = int(hf.get("topk_group", 1) or 1)
        self.norm_topk_prob = bool(hf.get("norm_topk_prob", True))
        self.routed_scaling = float(hf.get("routed_scaling_factor", 1.0))
        self.moe_intermediate = int(hf.get("moe_intermediate_size"))
        self.n_shared = int(hf.get("n_shared_experts", 0) or 0)
        self.expert_layer_range = (self.num_dense, self.num_layers)

    # ---- cache geometry ----------------------------------------------

    @property
    def kv_cache_shape_suffix(self) -> Tuple[int, int]:
        if not self.mla:
            return super().kv_cache_shape_suffix
        if self.mla_latent:
            # ONE shared latent "head": K = [latent | roped k], V =
            # [latent] (both padded to head_eff).
            return (2, self.head_eff)
        # Materialized K/V per q-head at the qk dim (V zero-padded).
        return (2 * self.num_heads, self.qk_dim)

    def kv_cache_spec(self) -> P:
        if self.mla and self.mla_latent:
            return P()  # replicated: every shard reads the full latent
        return P(None, None, None, "model", None)

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        H, L, NH = self.hidden_size, self.num_layers, self.num_heads
        layers = {
            "input_norm": (L, H),
            "post_norm": (L, H),
        }
        if self.mla:
            layers.update({
                "kv_a": (L, H, self.kv_rank + self.rope_dim),
                "kv_a_norm": (L, self.kv_rank),
                "kv_b": (L, self.kv_rank,
                         NH * (self.nope_dim + self.v_dim)),
                "wo": (L, NH * self.v_dim, H),
            })
            if self.q_rank:
                layers["q_a"] = (L, H, self.q_rank)
                layers["q_a_norm"] = (L, self.q_rank)
                layers["q_b"] = (L, self.q_rank, NH * self.qk_dim)
            else:
                layers["wq"] = (L, H, NH * self.qk_dim)
        else:
            D, NKV = self.head_dim, self.num_kv_heads_padded
            layers.update({
                "wq": (L, H, NH * D),
                "wk": (L, H, NKV * D),
                "wv": (L, H, NKV * D),
                "wo": (L, NH * D, H),
            })
            if self.attention_bias:
                layers["bq"] = (L, NH * D)
                layers["bk"] = (L, NKV * D)
                layers["bv"] = (L, NKV * D)
        shapes: Dict[str, Any] = {
            "embed": (self.vocab_size, H),
            "final_norm": (H,),
            "layers": layers,
        }
        F = self.intermediate_size
        shapes["dense_layers"] = {
            "gate": (self.num_dense, H, F),
            "up": (self.num_dense, H, F),
            "down": (self.num_dense, F, H),
        }
        if self.num_moe:
            Fm, E, Lm = (self.moe_intermediate, self.num_experts,
                         self.num_moe)
            Fs = Fm * self.n_shared
            shapes["moe_layers"] = {
                "router": (Lm, H, E),
                "w1": (Lm, E, H, Fm),
                "w3": (Lm, E, H, Fm),
                "w2": (Lm, E, Fm, H),
                "shared_gate": (Lm, H, Fs),
                "shared_up": (Lm, H, Fs),
                "shared_down": (Lm, Fs, H),
            }
            if self.route_mode == "v3":
                shapes["moe_layers"]["router_bias"] = (Lm, E)
        if not self.tie_word_embeddings:
            shapes["lm_head"] = (H, self.vocab_size)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        layers = {
            "input_norm": P(), "post_norm": P(),
            "wo": P(None, "model", None),
        }
        if self.mla:
            layers.update({
                "kv_a": P(), "kv_a_norm": P(),
                "kv_b": P(None, None, "model"),
            })
            if self.q_rank:
                layers.update({"q_a": P(), "q_a_norm": P(),
                               "q_b": P(None, None, "model")})
            else:
                layers["wq"] = P(None, None, "model")
        else:
            layers.update({
                "wq": P(None, None, "model"),
                "wk": P(None, None, "model"),
                "wv": P(None, None, "model"),
            })
            if self.attention_bias:
                layers["bq"] = P(None, "model")
                layers["bk"] = P(None, "model")
                layers["bv"] = P(None, "model")
        specs: Dict[str, Any] = {
            "embed": P(None, None),
            "final_norm": P(),
            "layers": layers,
            "dense_layers": {
                "gate": P(None, None, "model"),
                "up": P(None, None, "model"),
                "down": P(None, "model", None),
            },
            "moe_layers": {
                "router": P(), "router_bias": P(),
                "w1": P(None, "model", None, None),
                # router_bias dropped below for non-v3 routers

                "w3": P(None, "model", None, None),
                "w2": P(None, "model", None, None),
                "shared_gate": P(None, None, "model"),
                "shared_up": P(None, None, "model"),
                "shared_down": P(None, "model", None),
            },
        }
        if not self.num_moe:
            specs.pop("moe_layers")
        elif self.route_mode != "v3":
            specs["moe_layers"].pop("router_bias")
        if not self.tie_word_embeddings:
            specs["lm_head"] = P(None, "model")
        return specs

    def quantizable_weights(self) -> List[str]:
        return []  # MLA low-rank projections stay full precision (rd 2)

    # ---- loading ------------------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        la = "model.layers.{i}."
        maps = [
            (la + "input_layernorm.weight", "layers.input_norm", False),
            (la + "post_attention_layernorm.weight", "layers.post_norm",
             False),
            (la + "self_attn.o_proj.weight", "layers.wo", True),
        ]
        if not self.mla:
            maps += [
                (la + "self_attn.q_proj.weight", "layers.wq", True),
                (la + "self_attn.k_proj.weight", "layers.wk", True),
                (la + "self_attn.v_proj.weight", "layers.wv", True),
            ]
            if self.attention_bias:
                maps += [
                    (la + "self_attn.q_proj.bias", "layers.bq", False),
                    (la + "self_attn.k_proj.bias", "layers.bk", False),
                    (la + "self_attn.v_proj.bias", "layers.bv", False),
                ]
            return maps
        maps += [
            (la + "self_attn.kv_a_proj_with_mqa.weight", "layers.kv_a",
             True),
            (la + "self_attn.kv_a_layernorm.weight", "layers.kv_a_norm",
             False),
            (la + "self_attn.kv_b_proj.weight", "layers.kv_b", True),
        ]
        if self.q_rank:
            maps += [
                (la + "self_attn.q_a_proj.weight", "layers.q_a", True),
                (la + "self_attn.q_a_layernorm.weight",
                 "layers.q_a_norm", False),
                (la + "self_attn.q_b_proj.weight", "layers.q_b", True),
            ]
        else:
            maps.append((la + "self_attn.q_proj.weight", "layers.wq",
                         True))
        return maps

    def hf_aux_mappings(self):
        la = "model.layers.{i}."
        Ld, Lm = self.num_dense, self.num_moe
        out = [
            (la + "mlp.gate_proj.weight", "dense_layers.gate", True, Ld),
            (la + "mlp.up_proj.weight", "dense_layers.up", True, Ld),
            (la + "mlp.down_proj.weight", "dense_layers.down", True, Ld),
        ]
        if not Lm:
            return out
        out += [
            (la + "mlp.gate.weight", "moe_layers.router", True, Lm, Ld),
            (la + "mlp.shared_experts.gate_proj.weight",
             "moe_layers.shared_gate", True, Lm, Ld),
            (la + "mlp.shared_experts.up_proj.weight",
             "moe_layers.shared_up", True, Lm, Ld),
            (la + "mlp.shared_experts.down_proj.weight",
             "moe_layers.shared_down", True, Lm, Ld),
        ]
        if self.route_mode == "v3":
            out.append((la + "mlp.gate.e_score_correction_bias",
                        "moe_layers.router_bias", False, Lm, Ld))
        return out

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        if not self.num_moe:
            return []
        p = "model.layers.{i}.mlp.experts.{e}"
        return [
            (f"{p}.gate_proj.weight", "moe_layers.w1", True),
            (f"{p}.up_proj.weight", "moe_layers.w3", True),
            (f"{p}.down_proj.weight", "moe_layers.w2", True),
        ]

    # ---- forward ------------------------------------------------------

    def _route(self, h: jax.Array, router: jax.Array,
               bias: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
        """Gate dispatch by route_mode.

        v3 ("noaux_tc"): sigmoid scores, group-limited top-k with the
        selection bias (group score = sum of top-2), weights from
        UNBIASED scores, optional renorm, x routed_scaling.
        v2 ("greedy"/"group_limited_greedy", HF modeling_deepseek_v2
        MoEGate): softmax scores, group score = max, NO renorm,
        x routed_scaling.
        v1 (deepseek-moe): softmax scores, plain top-k, renorm iff
        norm_topk_prob.
        """
        T = h.shape[0]
        logits = jnp.dot(h, router, preferred_element_type=jnp.float32)
        E, G = self.num_experts, self.n_group

        def group_limit(choice):
            if G <= 1 or self.topk_group >= G:
                return choice
            grouped = choice.reshape(T, G, E // G)
            if self.route_mode == "v3":
                group_scores = jnp.sum(jax.lax.top_k(grouped, 2)[0],
                                       axis=-1)
            else:
                group_scores = jnp.max(grouped, axis=-1)
            _, group_idx = jax.lax.top_k(group_scores, self.topk_group)
            group_mask = jnp.zeros((T, G), jnp.bool_).at[
                jnp.arange(T)[:, None], group_idx].set(True)
            return jnp.where(jnp.repeat(group_mask, E // G, axis=-1),
                             choice, 0.0)

        if self.route_mode == "v3":
            scores = jax.nn.sigmoid(logits)
            choice = group_limit(scores + bias.astype(jnp.float32))
            _, ids = jax.lax.top_k(choice, self.top_k)
            weights = jnp.take_along_axis(scores, ids, axis=-1)
            if self.norm_topk_prob:
                weights = weights / (jnp.sum(weights, -1, keepdims=True)
                                     + 1e-20)
            return weights * self.routed_scaling, ids.astype(jnp.int32)
        scores = jax.nn.softmax(logits, axis=-1)
        if self.route_mode == "v2":
            choice = group_limit(scores)
            weights, ids = jax.lax.top_k(choice, self.top_k)
            return (weights * self.routed_scaling,
                    ids.astype(jnp.int32))
        weights, ids = jax.lax.top_k(scores, self.top_k)  # v1
        if self.norm_topk_prob and self.top_k > 1:
            weights = weights / jnp.sum(weights, -1, keepdims=True)
        return weights * self.routed_scaling, ids.astype(jnp.int32)

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
        NH = self.num_heads
        x = params["embed"][batch.token_ids].astype(self.dtype)
        if self.embedding_multiplier != 1.0:
            x = x * jnp.asarray(self.embedding_multiplier, self.dtype)
        rm = self.residual_multiplier  # muP scale_depth (MiniCPM3)
        cos = self._cos[batch.positions]
        sin = self._sin[batch.positions]
        neox = not self.mla or not self.rope_interleave

        def rms(v, w):
            out, _ = rms_norm(v, w, self.rms_eps)
            return out

        def attention_gqa(x, lp, pages, slots, pidx):
            # Standard llama-style attention (DeepSeek V1).
            NKV, D = self.num_kv_heads_padded, self.head_dim
            h = rms(x, lp["input_norm"])
            q, k, v = (qmatmul(h, lp["wq"]), qmatmul(h, lp["wk"]),
                       qmatmul(h, lp["wv"]))
            if "bq" in lp:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            q = q.astype(self.dtype).reshape(-1, NH, D)
            k = k.astype(self.dtype).reshape(-1, NKV, D)
            v = v.astype(self.dtype).reshape(-1, NKV, D)
            q = apply_rope(q, cos, sin, is_neox_style=True)
            k = apply_rope(k, cos, sin, is_neox_style=True)
            pages = write_kv(pages, k, v, slots)
            attn = ragged_paged_attention(
                q, pages, batch.kv_lens, pidx,
                batch.cu_q_lens, batch.num_seqs, sm_scale=self.sm_scale,
                mesh=mesh, use_kernel=use_attention_kernel)
            attn = attn.reshape(-1, NH * D)
            o = qmatmul(attn, lp["wo"]).astype(self.dtype)
            if rm != 1.0:
                o = o * jnp.asarray(rm, o.dtype)
            return x + o, pages

        def attention_mla(x, lp, pages, slots, pidx):
            h = rms(x, lp["input_norm"])
            if self.q_rank:
                qa = rms(qmatmul(h, lp["q_a"]).astype(self.dtype),
                         lp["q_a_norm"])
                q = qmatmul(qa, lp["q_b"])
            else:
                q = qmatmul(h, lp["wq"])
            q = q.astype(self.dtype).reshape(-1, NH, self.qk_dim)
            q_nope, q_rot = (q[..., :self.nope_dim],
                             q[..., self.nope_dim:])
            ckv = qmatmul(h, lp["kv_a"]).astype(self.dtype)
            latent, k_rot = (ckv[..., :self.kv_rank],
                             ckv[..., self.kv_rank:])
            latent = rms(latent, lp["kv_a_norm"])
            kvb = qmatmul(latent, lp["kv_b"]).astype(self.dtype)
            kvb = kvb.reshape(-1, NH, self.nope_dim + self.v_dim)
            k_nope, v = (kvb[..., :self.nope_dim],
                         kvb[..., self.nope_dim:])
            q_rot = apply_rope(q_rot, cos, sin, is_neox_style=neox)
            k_rot = apply_rope(k_rot[:, None, :], cos, sin,
                               is_neox_style=neox)
            k_rot = jnp.broadcast_to(k_rot,
                                     (k_rot.shape[0], NH, self.rope_dim))
            q = jnp.concatenate([q_nope, q_rot], axis=-1)
            k = jnp.concatenate([k_nope, k_rot], axis=-1)
            v_pad = jnp.pad(v, ((0, 0), (0, 0),
                                (0, self.qk_dim - self.v_dim)))
            pages = write_kv(pages, k, v_pad, slots)
            attn = ragged_paged_attention(
                q, pages, batch.kv_lens, pidx,
                batch.cu_q_lens, batch.num_seqs, sm_scale=self.sm_scale,
                mesh=mesh, use_kernel=use_attention_kernel)
            attn = attn[..., :self.v_dim].reshape(-1, NH * self.v_dim)
            o = qmatmul(attn, lp["wo"]).astype(self.dtype)
            if rm != 1.0:
                o = o * jnp.asarray(rm, o.dtype)
            return x + o, pages

        def attention_mla_latent(x, lp, pages, slots, pidx):
            """Absorbed MLA (latent cache): score_h(t) =
            (q_nope_h @ W_k_h^T) . latent_t + q_rot_h . k_rot_t and
            out_h = (sum_t p_t latent_t) @ W_v_h — kv_b never expands
            into per-token per-head K/V."""
            h = rms(x, lp["input_norm"])
            if self.q_rank:
                qa = rms(qmatmul(h, lp["q_a"]).astype(self.dtype),
                         lp["q_a_norm"])
                q = qmatmul(qa, lp["q_b"])
            else:
                q = qmatmul(h, lp["wq"])
            q = q.astype(self.dtype).reshape(-1, NH, self.qk_dim)
            q_nope, q_rot = (q[..., :self.nope_dim],
                             q[..., self.nope_dim:])
            q_rot = apply_rope(q_rot, cos, sin, is_neox_style=neox)
            ckv = qmatmul(h, lp["kv_a"]).astype(self.dtype)
            latent, k_rot = (ckv[..., :self.kv_rank],
                             ckv[..., self.kv_rank:])
            latent = rms(latent, lp["kv_a_norm"])
            k_rot = apply_rope(k_rot[:, None, :], cos, sin,
                               is_neox_style=neox)[:, 0]
            lat_dim = self.kv_rank + self.rope_dim
            pad = self.head_eff - lat_dim
            k_w = jnp.pad(jnp.concatenate([latent, k_rot], axis=-1),
                          ((0, 0), (0, pad)))[:, None, :]
            v_w = jnp.pad(latent,
                          ((0, 0),
                           (0, self.head_eff - self.kv_rank)))[:, None, :]
            pages = write_kv(pages, k_w, v_w, slots)
            kvb = lp["kv_b"].reshape(self.kv_rank, NH,
                                     self.nope_dim + self.v_dim)
            w_k = kvb[..., :self.nope_dim]  # [r, n, d]
            q_lat = jnp.einsum("tnd,rnd->tnr", q_nope,
                               w_k.astype(self.dtype))
            q_eff = jnp.concatenate([q_lat, q_rot], axis=-1)
            q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, pad)))
            attn = ragged_paged_attention(
                q_eff, pages, batch.kv_lens, pidx,
                batch.cu_q_lens, batch.num_seqs, sm_scale=self.sm_scale,
                mesh=mesh, use_kernel=use_attention_kernel,
                kv_replicated=True)
            out_lat = attn[..., :self.kv_rank]  # [T, NH, r]
            w_v = kvb[..., self.nope_dim:]  # [r, n, v]
            attn_v = jnp.einsum("tnr,rnd->tnd", out_lat,
                                w_v.astype(self.dtype))
            o = qmatmul(attn_v.reshape(-1, NH * self.v_dim), lp["wo"])
            o = o.astype(self.dtype)
            if rm != 1.0:
                o = o * jnp.asarray(rm, o.dtype)
            return x + o, pages

        if not self.mla:
            attention = attention_gqa
        elif self.mla_latent:
            attention = attention_mla_latent
        else:
            attention = attention_mla

        def dense_layer(x, pages, slots, pidx, scanned):
            lp, mp = scanned
            x, pages = attention(x, lp, pages, slots, pidx)
            h = rms(x, lp["post_norm"])
            gate = qmatmul(h, mp["gate"])
            up = qmatmul(h, mp["up"])
            act = silu_and_mul(gate.astype(self.dtype),
                               up.astype(self.dtype))
            ff = qmatmul(act, mp["down"]).astype(self.dtype)
            if rm != 1.0:
                ff = ff * jnp.asarray(rm, ff.dtype)
            x = x + ff
            return x, pages

        def moe_layer(x, pages, slots, pidx, scanned):
            lp, mp = scanned
            x, pages = attention(x, lp, pages, slots, pidx)
            h = rms(x, lp["post_norm"])
            weights, ids = self._route(h, mp["router"],
                                       mp.get("router_bias"))
            routed = apply_experts(h, mp["w1"], mp["w3"], mp["w2"],
                                   weights, ids, mesh=mesh)
            gate = qmatmul(h, mp["shared_gate"])
            up = qmatmul(h, mp["shared_up"])
            act = silu_and_mul(gate.astype(self.dtype),
                               up.astype(self.dtype))
            shared = qmatmul(act, mp["shared_down"])
            ff = routed.astype(self.dtype) + shared.astype(self.dtype)
            if rm != 1.0:
                ff = ff * jnp.asarray(rm, ff.dtype)
            x = x + ff
            return x, pages

        Ld = self.num_dense
        lp_all = params["layers"]
        lp_dense = jax.tree.map(lambda a: a[:Ld], lp_all)

        x, kv_pages = scan_layers_paged(
            dense_layer, x, kv_pages,
            (lp_dense, params["dense_layers"]), batch,
            layer_ids=jnp.arange(Ld, dtype=jnp.int32))
        if self.num_moe:
            lp_moe = jax.tree.map(lambda a: a[Ld:], lp_all)
            x, kv_pages = scan_layers_paged(
                moe_layer, x, kv_pages,
                (lp_moe, params["moe_layers"]), batch,
                layer_ids=jnp.arange(Ld, self.num_layers,
                                     dtype=jnp.int32))
        x = rms(x, params["final_norm"])
        return kv_pages, x


class DeepseekV2ForCausalLM(DeepseekV3ForCausalLM):
    """DeepSeek-V2/V2-Lite: same MLA attention; softmax gate with
    greedy / group_limited_greedy (group max) top-k, no correction bias,
    no top-k renorm (HF modeling_deepseek_v2 MoEGate semantics).
    Reference: aphrodite/modeling/models/deepseek_v2.py."""

    route_mode = "v2"


class DeepseekForCausalLM(DeepseekV3ForCausalLM):
    """DeepSeek V1 / deepseek-moe-16b: standard GQA attention (no MLA),
    softmax top-k routing with optional renorm (norm_topk_prob), shared
    experts, leading dense layers.
    Reference: aphrodite/modeling/models/deepseek.py."""

    route_mode = "v1"
    mla = False
