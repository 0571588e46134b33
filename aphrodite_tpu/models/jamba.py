"""Jamba: hybrid Mamba/attention layers with interleaved MoE FFNs.

Reference: aphrodite/modeling/models/jamba.py (JambaForCausalLM) with
the HybridMambaAttentionDynamicCache; HF transformers modeling_jamba is
the numerical oracle.

TPU-native design: Jamba runs through the attention-free dense-chunk
runner path ([S, Lc] layout, per-sequence state slots), with a cache
triple (conv_state, ssm_state, per-slot KV). The per-slot KV holds each
sequence's keys/values at absolute positions (one slot spans
max_model_len tokens), so attention layers need no paged machinery —
the block manager already hands out exactly one slot per sequence for
attention-free models. Layer stacks are split by type (mamba / attn /
dense-FF / MoE-FF) and loaded via the loader's explicit-index aux
stacks; the forward walks layers in a Python loop indexing each stack
at its per-type position (period patterns are static).

Layer math:
- mamba mixer == Mamba-1 (models/mamba.py) plus Jamba's dt/B/C
  RMSNorms after the x_proj split (HF JambaMambaMixer.slow_forward).
- attention: GQA with NO positional encoding (Jamba has none).
- FFN: SwiGLU; MoE layers route softmax-all-then-top-k WITHOUT
  renormalization (HF JambaSparseMoeBlock).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.models.layers import rms_norm
from aphrodite_tpu.ops.moe import grouped_expert_mlp, topk_routing

logger = init_logger(__name__)


class JambaForCausalLM:
    is_attention_free = True  # scheduled via per-sequence state slots

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        self.config = model_config
        self.parallel_config = parallel_config or ParallelConfig()
        if self.parallel_config.pipeline_parallel_size > 1:
            raise NotImplementedError(
                "pipeline parallelism over hybrid stacks is not wired")
        hf = model_config.hf_config
        self.hidden_size = model_config.get_hidden_size()
        self.num_layers = int(hf["num_hidden_layers"])
        self.num_heads = int(hf["num_attention_heads"])
        self.num_kv_heads = int(hf.get("num_key_value_heads",
                                       self.num_heads))
        self.head_dim = self.hidden_size // self.num_heads
        self.intermediate = int(hf["intermediate_size"])
        self.d_state = int(hf.get("mamba_d_state", 16))
        self.d_conv = int(hf.get("mamba_d_conv", 4))
        self.expand = int(hf.get("mamba_expand", 2))
        self.d_inner = self.expand * self.hidden_size
        self.dt_rank = hf.get("mamba_dt_rank")
        if self.dt_rank in (None, "auto"):
            self.dt_rank = (self.hidden_size + 15) // 16
        self.dt_rank = int(self.dt_rank)
        self.use_conv_bias = bool(hf.get("mamba_conv_bias", True))
        self.use_proj_bias = bool(hf.get("mamba_proj_bias", False))
        self.num_experts = int(hf.get("num_experts", 1))
        self.top_k = int(hf.get("num_experts_per_tok", 2))
        attn_period = int(hf.get("attn_layer_period", 8))
        attn_offset = int(hf.get("attn_layer_offset", 4))
        e_period = int(hf.get("expert_layer_period", 2))
        e_offset = int(hf.get("expert_layer_offset", 1))
        self.attn_idx = [l for l in range(self.num_layers)
                         if l % attn_period == attn_offset]
        self.mamba_idx = [l for l in range(self.num_layers)
                          if l not in self.attn_idx]
        self.moe_idx = [l for l in range(self.num_layers)
                        if self.num_experts > 1
                        and l % e_period == e_offset]
        self.dense_idx = [l for l in range(self.num_layers)
                          if l not in self.moe_idx]
        # Loader hooks: expert stacks live at these (interleaved) layers.
        self.expert_layer_indices = self.moe_idx
        self.vocab_size = model_config.get_vocab_size()
        self.rms_eps = float(hf.get("rms_norm_eps", 1e-6))
        self.tie_word_embeddings = bool(
            hf.get("tie_word_embeddings", False))
        self.max_model_len = model_config.max_model_len
        self.dtype = jnp.dtype(model_config.dtype)
        self.sliding_window = None

    # ------------------------------------------------------------------
    # Params
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        H, I = self.hidden_size, self.intermediate
        Din, N, R, C = self.d_inner, self.d_state, self.dt_rank, self.d_conv
        Lm, La = len(self.mamba_idx), len(self.attn_idx)
        Ld, Le = len(self.dense_idx), len(self.moe_idx)
        QH, KV, Dh = self.num_heads, self.num_kv_heads, self.head_dim
        shapes: Dict[str, Any] = {
            "embed": (self.vocab_size, H),
            "final_norm": (H,),
            "mamba": {
                "norm": (Lm, H),
                "in_proj": (Lm, H, 2 * Din),
                "conv_w": (Lm, C, Din),
                "x_proj": (Lm, Din, R + 2 * N),
                "dt_ln": (Lm, R),
                "b_ln": (Lm, N),
                "c_ln": (Lm, N),
                "dt_proj": (Lm, R, Din),
                "dt_bias": (Lm, Din),
                "A_log": (Lm, Din, N),
                "D": (Lm, Din),
                "out_proj": (Lm, Din, H),
            },
        }
        if self.use_conv_bias:
            shapes["mamba"]["conv_b"] = (Lm, Din)
        if La:
            shapes["attn"] = {
                "norm": (La, H),
                "wq": (La, H, QH * Dh),
                "wk": (La, H, KV * Dh),
                "wv": (La, H, KV * Dh),
                "wo": (La, QH * Dh, H),
            }
        if Ld:
            shapes["ff_dense"] = {
                "norm": (Ld, H),
                "gate": (Ld, H, I),
                "up": (Ld, H, I),
                "down": (Ld, I, H),
            }
        if Le:
            shapes["ff_moe"] = {
                "norm": (Le, H),
                "router": (Le, H, self.num_experts),
                "experts_gate": (Le, self.num_experts, H, I),
                "experts_up": (Le, self.num_experts, H, I),
                "experts_down": (Le, self.num_experts, I, H),
            }
        if not self.tie_word_embeddings:
            shapes["lm_head"] = (H, self.vocab_size)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        """TP: attention heads, SSM channels, FFN columns, and MoE
        experts all shard over "model"; GSPMD inserts the
        contraction psums (out/x_proj/down)."""
        from jax.sharding import PartitionSpec as P

        m = "model"
        specs: Dict[str, Any] = {
            "embed": P(), "final_norm": P(),
            "mamba": {
                "norm": P(),
                "in_proj": P(None, None, m),
                "conv_w": P(None, None, m),
                "x_proj": P(None, m, None),
                "dt_ln": P(), "b_ln": P(), "c_ln": P(),
                "dt_proj": P(None, None, m),
                "dt_bias": P(None, m),
                "A_log": P(None, m, None),
                "D": P(None, m),
                "out_proj": P(None, m, None),
            },
        }
        if self.use_conv_bias:
            specs["mamba"]["conv_b"] = P(None, m)
        if len(self.attn_idx):
            specs["attn"] = {
                "norm": P(),
                "wq": P(None, None, m),
                "wk": P(None, None, m),
                "wv": P(None, None, m),
                "wo": P(None, m, None),
            }
        if len(self.dense_idx):
            specs["ff_dense"] = {
                "norm": P(),
                "gate": P(None, None, m),
                "up": P(None, None, m),
                "down": P(None, m, None),
            }
        if len(self.moe_idx):
            specs["ff_moe"] = {
                "norm": P(), "router": P(),
                "experts_gate": P(None, m, None, None),
                "experts_up": P(None, m, None, None),
                "experts_down": P(None, m, None, None),
            }
        if not self.tie_word_embeddings:
            specs["lm_head"] = P(None, m)
        return specs

    def cache_specs(self):
        from jax.sharding import PartitionSpec as P

        return (P(None, None, None, "model"),       # conv: channels
                P(None, None, "model", None),       # ssm: channels
                P(None, None, None, "model", None))  # kv: combined heads

    def quantizable_weights(self) -> List[str]:
        return []

    # ------------------------------------------------------------------
    # Cache: (conv, ssm, per-slot KV)
    # ------------------------------------------------------------------

    def init_cache(self, num_slots: int, dtype=None):
        Lm, La = len(self.mamba_idx), len(self.attn_idx)
        conv = jnp.zeros((Lm, num_slots + 1, self.d_conv - 1,
                          self.d_inner), jnp.float32)
        ssm = jnp.zeros((Lm, num_slots + 1, self.d_inner, self.d_state),
                        jnp.float32)
        kv = jnp.zeros((max(La, 1), num_slots + 1, self.max_model_len,
                        2 * self.num_kv_heads, self.head_dim), self.dtype)
        return conv, ssm, kv

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return []  # everything routes through interleaved aux stacks

    def hf_aux_mappings(self):
        pre = "model.layers.{i}"
        mam = f"{pre}.mamba"
        mi, ai = self.mamba_idx, self.attn_idx
        di, ei = self.dense_idx, self.moe_idx
        maps = [
            (f"{pre}.input_layernorm.weight", "mamba.norm", False,
             len(mi), mi),
            (f"{mam}.in_proj.weight", "mamba.in_proj", True, len(mi), mi),
            (f"{mam}.conv1d.weight", "mamba.conv_w", False, len(mi), mi),
            (f"{mam}.x_proj.weight", "mamba.x_proj", True, len(mi), mi),
            (f"{mam}.dt_layernorm.weight", "mamba.dt_ln", False,
             len(mi), mi),
            (f"{mam}.b_layernorm.weight", "mamba.b_ln", False,
             len(mi), mi),
            (f"{mam}.c_layernorm.weight", "mamba.c_ln", False,
             len(mi), mi),
            (f"{mam}.dt_proj.weight", "mamba.dt_proj", True, len(mi), mi),
            (f"{mam}.dt_proj.bias", "mamba.dt_bias", False, len(mi), mi),
            (f"{mam}.A_log", "mamba.A_log", False, len(mi), mi),
            (f"{mam}.D", "mamba.D", False, len(mi), mi),
            (f"{mam}.out_proj.weight", "mamba.out_proj", True,
             len(mi), mi),
        ]
        if self.use_conv_bias:
            maps.append((f"{mam}.conv1d.bias", "mamba.conv_b", False,
                         len(mi), mi))
        if ai:
            maps += [
                (f"{pre}.input_layernorm.weight", "attn.norm", False,
                 len(ai), ai),
                (f"{pre}.self_attn.q_proj.weight", "attn.wq", True,
                 len(ai), ai),
                (f"{pre}.self_attn.k_proj.weight", "attn.wk", True,
                 len(ai), ai),
                (f"{pre}.self_attn.v_proj.weight", "attn.wv", True,
                 len(ai), ai),
                (f"{pre}.self_attn.o_proj.weight", "attn.wo", True,
                 len(ai), ai),
            ]
        if di:
            maps += [
                (f"{pre}.pre_ff_layernorm.weight", "ff_dense.norm",
                 False, len(di), di),
                (f"{pre}.feed_forward.gate_proj.weight", "ff_dense.gate",
                 True, len(di), di),
                (f"{pre}.feed_forward.up_proj.weight", "ff_dense.up",
                 True, len(di), di),
                (f"{pre}.feed_forward.down_proj.weight", "ff_dense.down",
                 True, len(di), di),
            ]
        if ei:
            maps += [
                (f"{pre}.pre_ff_layernorm.weight", "ff_moe.norm",
                 False, len(ei), ei),
                (f"{pre}.feed_forward.router.weight", "ff_moe.router",
                 True, len(ei), ei),
            ]
        return maps

    def hf_expert_mappings(self) -> List[Tuple[str, str, bool]]:
        if not self.moe_idx:
            return []
        e = "model.layers.{i}.feed_forward.experts.{e}"
        return [
            (f"{e}.gate_proj.weight", "ff_moe.experts_gate", True),
            (f"{e}.up_proj.weight", "ff_moe.experts_up", True),
            (f"{e}.down_proj.weight", "ff_moe.experts_down", True),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("model.embed_tokens.weight", "embed", False),
            ("model.final_layernorm.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps

    def maybe_pad_kv_weight(self, our_path: str,
                            arr: np.ndarray) -> np.ndarray:
        if our_path == "mamba.conv_w" and arr.ndim == 3:
            # [Din, 1, C] -> [C, Din] time-major depthwise taps.
            return np.ascontiguousarray(arr[:, 0, :].T)
        return arr

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)

        def walk(shapes, path=""):
            out = {}
            for k, v in shapes.items():
                p = f"{path}.{k}" if path else k
                if isinstance(v, dict):
                    out[k] = walk(v, p)
                elif "norm" in k or k.endswith("_ln"):
                    out[k] = np.ones(v, np.float32)
                elif k == "A_log":
                    out[k] = np.log(np.tile(
                        np.arange(1, self.d_state + 1, dtype=np.float32),
                        v[:-1] + (1,)))
                else:
                    scale = 1.0 / np.sqrt(v[-1] if len(v) > 1 else 1)
                    out[k] = rng.standard_normal(v).astype(
                        np.float32) * scale
            return out

        return walk(self.param_shapes())

    # ------------------------------------------------------------------
    # Forward: dense [S, Lc] chunk layout
    # ------------------------------------------------------------------

    def forward_chunk(
        self,
        params: Dict[str, Any],
        cache,
        token_ids: jax.Array,  # i32[S, Lc]
        q_lens: jax.Array,  # i32[S]
        slots: jax.Array,  # i32[S]
        fresh: Optional[jax.Array] = None,  # bool[S]
        start_pos: Optional[jax.Array] = None,  # i32[S] chunk start
    ):
        conv_cache, ssm_cache, kv_cache = cache
        S, Lc = token_ids.shape
        h = params["embed"][token_ids].astype(self.dtype)
        tpos = jnp.arange(Lc, dtype=jnp.int32)[None, :]
        valid = tpos < q_lens[:, None]
        sp = (start_pos if start_pos is not None
              else jnp.zeros((S,), jnp.int32))

        mi = ai = di = ei = 0
        for l in range(self.num_layers):
            if l in self.attn_idx:
                h, kv_cache = self._attn_layer(
                    params["attn"], ai, h, kv_cache, slots, sp, valid)
                ai += 1
            else:
                h, conv_cache, ssm_cache = self._mamba_layer(
                    params["mamba"], mi, h, conv_cache, ssm_cache, slots,
                    q_lens, fresh, valid)
                mi += 1
            if l in self.moe_idx:
                h = self._moe_ff(params["ff_moe"], ei, h)
                ei += 1
            else:
                h = self._dense_ff(params["ff_dense"], di, h)
                di += 1

        h, _ = rms_norm(h, params["final_norm"], self.rms_eps)
        last_idx = jnp.maximum(q_lens - 1, 0)
        last = jnp.take_along_axis(
            h, last_idx[:, None, None].repeat(h.shape[-1], axis=2),
            axis=1)[:, 0]
        return (conv_cache, ssm_cache, kv_cache), last

    def _attn_layer(self, ap, i, h, kv_cache, slots, sp, valid):
        S, Lc, H = h.shape
        QH, KV, Dh = self.num_heads, self.num_kv_heads, self.head_dim
        max_len = kv_cache.shape[2]
        trash = kv_cache.shape[1] - 1
        hn, _ = rms_norm(h, ap["norm"][i], self.rms_eps)
        q = jnp.einsum("slh,hd->sld", hn, ap["wq"][i]).reshape(
            S, Lc, QH, Dh)
        k = jnp.einsum("slh,hd->sld", hn, ap["wk"][i]).reshape(
            S, Lc, KV, Dh)
        v = jnp.einsum("slh,hd->sld", hn, ap["wv"][i]).reshape(
            S, Lc, KV, Dh)

        # Write this chunk's K/V at absolute positions into the slot KV.
        pos_idx = sp[:, None] + jnp.arange(Lc, dtype=jnp.int32)[None, :]
        pos_w = jnp.minimum(pos_idx, max_len - 1)
        slot_rows = jnp.where(valid, slots[:, None], trash)  # [S, Lc]
        kv_new = jnp.concatenate([k, v], axis=2)  # [S, Lc, 2KV, Dh]
        layer_kv = kv_cache[i].at[slot_rows, pos_w].set(
            kv_new.astype(kv_cache.dtype))
        kv_cache = kv_cache.at[i].set(layer_kv)

        all_kv = layer_kv[slots]  # [S, max_len, 2KV, Dh]
        kk = all_kv[:, :, :KV].astype(self.dtype)
        vv = all_kv[:, :, KV:].astype(self.dtype)
        group = QH // KV
        kk = jnp.repeat(kk, group, axis=2)  # [S, max_len, QH, Dh]
        vv = jnp.repeat(vv, group, axis=2)

        scores = jnp.einsum("slqd,smqd->sqlm", q, kk).astype(
            jnp.float32) * (Dh ** -0.5)
        # Causal over absolute positions: query at pos_idx[s, l] sees
        # columns m <= pos_idx[s, l] (all such columns are written).
        cols = jnp.arange(max_len, dtype=jnp.int32)[None, None, None, :]
        mask = cols <= pos_idx[:, None, :, None]
        scores = jnp.where(mask, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("sqlm,smqd->slqd", attn, vv).reshape(
            S, Lc, QH * Dh)
        out = jnp.einsum("sld,dh->slh", out, ap["wo"][i])
        return h + out.astype(self.dtype), kv_cache

    def _mamba_layer(self, mp, i, h, conv_cache, ssm_cache, slots,
                     q_lens, fresh, valid):
        S, Lc, H = h.shape
        Din, N, R, C = (self.d_inner, self.d_state, self.dt_rank,
                        self.d_conv)
        hn, _ = rms_norm(h, mp["norm"][i], self.rms_eps)
        xz = jnp.einsum("slh,hd->sld", hn, mp["in_proj"][i])
        xpart, z = jnp.split(xz, 2, axis=-1)
        xpart = jnp.where(valid[..., None], xpart, 0.0)

        conv_l = conv_cache[i]
        init = conv_l[slots]  # [S, C-1, Din]
        if fresh is not None:
            init = jnp.where(fresh[:, None, None], 0.0,
                             init.astype(jnp.float32)).astype(init.dtype)
        full = jnp.concatenate([init.astype(xpart.dtype), xpart], axis=1)
        conv = jnp.zeros_like(xpart)
        for tap in range(C):
            conv = conv + full[:, tap:tap + Lc, :] * mp["conv_w"][i][tap]
        if "conv_b" in mp:
            conv = conv + mp["conv_b"][i]
        conv = jax.nn.silu(conv.astype(jnp.float32)).astype(self.dtype)
        conv = jnp.where(valid[..., None], conv, 0.0)
        idx = (q_lens[:, None] +
               jnp.arange(C - 1, dtype=jnp.int32)[None, :])
        new_conv = jnp.take_along_axis(full, idx[..., None], axis=1)

        dbc = jnp.einsum("sld,dr->slr", conv, mp["x_proj"][i])
        dt = dbc[..., :R]
        Bmat = dbc[..., R:R + N]
        Cmat = dbc[..., R + N:]
        # Jamba's extra RMSNorms on the selection parameters.
        dt, _ = rms_norm(dt, mp["dt_ln"][i], self.rms_eps)
        Bmat, _ = rms_norm(Bmat, mp["b_ln"][i], self.rms_eps)
        Cmat, _ = rms_norm(Cmat, mp["c_ln"][i], self.rms_eps)
        Bmat = Bmat.astype(jnp.float32)
        Cmat = Cmat.astype(jnp.float32)
        dt = jnp.einsum("slr,rd->sld", dt, mp["dt_proj"][i]) + \
            mp["dt_bias"][i]
        dt = jax.nn.softplus(dt.astype(jnp.float32))
        A = -jnp.exp(mp["A_log"][i].astype(jnp.float32))

        a_t = jnp.exp(dt[..., None] * A[None, None])
        xf = conv.astype(jnp.float32)
        b_t = (dt * xf)[..., None] * Bmat[:, :, None, :]
        a_t = jnp.where(valid[..., None, None], a_t, 1.0)
        b_t = jnp.where(valid[..., None, None], b_t, 0.0)

        h0 = ssm_cache[i][slots].astype(jnp.float32)
        if fresh is not None:
            h0 = jnp.where(fresh[:, None, None], 0.0, h0)

        def ssm_step(hc, t):
            hc = a_t[:, t] * hc + b_t[:, t]
            y = jnp.einsum("sdn,sn->sd", hc, Cmat[:, t])
            return hc, y

        h_final, ys = jax.lax.scan(ssm_step, h0, jnp.arange(Lc))
        y = jnp.moveaxis(ys, 0, 1)
        y = y + xf * mp["D"][i][None, None]
        y = y * jax.nn.silu(z.astype(jnp.float32))
        out = jnp.einsum("sld,dh->slh", y.astype(self.dtype),
                         mp["out_proj"][i])

        conv_cache = conv_cache.at[i].set(
            conv_l.at[slots].set(new_conv.astype(conv_cache.dtype)))
        ssm_cache = ssm_cache.at[i].set(
            ssm_cache[i].at[slots].set(h_final.astype(ssm_cache.dtype)))
        return h + out.astype(self.dtype), conv_cache, ssm_cache

    def _dense_ff(self, fp, i, h):
        hn, _ = rms_norm(h, fp["norm"][i], self.rms_eps)
        gate = jax.nn.silu(
            jnp.einsum("slh,hi->sli", hn, fp["gate"][i]).astype(
                jnp.float32)).astype(self.dtype)
        up = jnp.einsum("slh,hi->sli", hn, fp["up"][i])
        return h + jnp.einsum("sli,ih->slh", gate * up, fp["down"][i])

    def _moe_ff(self, fp, i, h):
        S, Lc, H = h.shape
        hn, _ = rms_norm(h, fp["norm"][i], self.rms_eps)
        flat = hn.reshape(S * Lc, H)
        logits = jnp.einsum("th,he->te", flat, fp["router"][i])
        # HF JambaSparseMoeBlock: softmax over ALL experts, top-k,
        # NO renormalization.
        weights, ids = topk_routing(logits, self.top_k,
                                    renormalize=False, pre_softmax=True)
        out = grouped_expert_mlp(flat, fp["experts_gate"][i],
                                 fp["experts_up"][i],
                                 fp["experts_down"][i], weights, ids)
        return h + out.reshape(S, Lc, H).astype(self.dtype)

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        if self.tie_word_embeddings:
            return jnp.dot(hidden, params["embed"].T,
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
