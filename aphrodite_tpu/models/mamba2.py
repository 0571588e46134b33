"""Mamba2 (SSD) causal LM — attention-free (Codestral-Mamba family).

Reference: aphrodite/modeling/models/mamba-family mamba2 path (the
mamba_ssm SSD kernels). Differences from Mamba-1 handled here: scalar
A/dt PER HEAD (state [nH, head_dim, N]), B/C produced by the SAME conv
stream (grouped, broadcast over heads), and a gated RMSNorm before
out_proj. The recurrence runs as a lax.scan over time (the chunked SSD
matmul formulation is a round-2 throughput optimization); state slots
ride the same block-manager mapping as Mamba-1.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.layers import rms_norm
from aphrodite_tpu.models.mamba import MambaForCausalLM


class Mamba2ForCausalLM(MambaForCausalLM):
    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.n_groups = int(hf.get("n_groups", 1))
        self.num_heads = int(hf.get("num_heads"))
        self.head_dim = int(hf.get("head_dim",
                                   self.d_inner // self.num_heads))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.rms_eps = float(hf.get("layer_norm_epsilon", 1e-5))

    def param_shapes(self) -> Dict[str, Any]:
        H, L = self.hidden_size, self.num_layers
        Din, C, nH = self.d_inner, self.d_conv, self.num_heads
        proj_out = 2 * Din + 2 * self.n_groups * self.d_state + nH
        shapes = {
            "embed": (self.vocab_size, H),
            "final_norm": (H,),
            "layers": {
                "norm": (L, H),
                "in_proj": (L, H, proj_out),
                "conv_w": (L, C, self.conv_dim),
                "dt_bias": (L, nH),
                "A_log": (L, nH),
                "D": (L, nH),
                "gated_norm": (L, Din),
                "out_proj": (L, Din, H),
            },
        }
        if self.use_conv_bias:
            shapes["layers"]["conv_b"] = (L, self.conv_dim)
        if not self.tie_word_embeddings:
            shapes["lm_head"] = (H, self.vocab_size)
        return shapes

    def param_shardings(self):
        """TP shards channels/heads; the mixed in_proj concat axis
        ([z | x | B | C | dt]) reshards at the splits (correct under
        GSPMD; interleaved layouts are a later optimization)."""
        from jax.sharding import PartitionSpec as P

        m = "model"
        specs = {
            "embed": P(),
            "final_norm": P(),
            "layers": {
                "norm": P(),
                "in_proj": P(None, None, m),
                "conv_w": P(None, None, m),
                "dt_bias": P(None, m),
                "A_log": P(None, m),
                "D": P(None, m),
                "gated_norm": P(None, m),
                "out_proj": P(None, m, None),
            },
        }
        if self.use_conv_bias:
            specs["layers"]["conv_b"] = P(None, m)
        if not self.tie_word_embeddings:
            specs["lm_head"] = P(None, m)
        return specs

    def cache_specs(self):
        from jax.sharding import PartitionSpec as P

        return (P(None, None, None, "model"),
                P(None, None, "model", None, None))

    def init_cache(self, num_slots: int, dtype=None) -> Tuple[jax.Array,
                                                              jax.Array]:
        dtype = dtype or jnp.float32
        conv = jnp.zeros((self.num_layers, num_slots + 1, self.d_conv - 1,
                          self.conv_dim), dtype)
        ssm = jnp.zeros((self.num_layers, num_slots + 1, self.num_heads,
                         self.head_dim, self.d_state), dtype)
        return conv, ssm

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "backbone.layers.{i}.mixer"
        maps = [
            ("backbone.layers.{i}.norm.weight", "layers.norm", False),
            (f"{p}.in_proj.weight", "layers.in_proj", True),
            (f"{p}.dt_bias", "layers.dt_bias", False),
            (f"{p}.A_log", "layers.A_log", False),
            (f"{p}.D", "layers.D", False),
            (f"{p}.norm.weight", "layers.gated_norm", False),
            (f"{p}.out_proj.weight", "layers.out_proj", True),
            (f"{p}.conv1d.weight", "layers.conv_w", False),
        ]
        if self.use_conv_bias:
            maps.append((f"{p}.conv1d.bias", "layers.conv_b", False))
        return maps

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)

        def walk(shapes):
            out = {}
            for k, v in shapes.items():
                if isinstance(v, dict):
                    out[k] = walk(v)
                elif "norm" in k:
                    out[k] = np.ones(v, np.float32)
                elif k == "A_log":
                    out[k] = np.zeros(v, np.float32)
                else:
                    scale = 1.0 / np.sqrt(v[-1] if len(v) > 1 else 1)
                    out[k] = rng.standard_normal(v).astype(
                        np.float32) * scale
            return out

        return walk(self.param_shapes())

    def forward_chunk(
        self,
        params: Dict[str, Any],
        cache: Tuple[jax.Array, jax.Array],
        token_ids: jax.Array,  # i32[S, Lc]
        q_lens: jax.Array,  # i32[S]
        slots: jax.Array,  # i32[S]
        fresh: Optional[jax.Array] = None,  # bool[S]
        start_pos: Optional[jax.Array] = None,  # unused (stateful SSM)
    ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
        conv_cache, ssm_cache = cache
        S, Lc = token_ids.shape
        Din, N, C = self.d_inner, self.d_state, self.d_conv
        nH, P, G = self.num_heads, self.head_dim, self.n_groups
        x = params["embed"][token_ids].astype(self.dtype)
        tpos = jnp.arange(Lc, dtype=jnp.int32)[None, :]
        valid = tpos < q_lens[:, None]

        def layer_fn(h, scanned):
            lp, conv_l, ssm_l = scanned
            hn, _ = rms_norm(h, lp["norm"], self.rms_eps)
            proj = jnp.einsum("slh,hd->sld", hn, lp["in_proj"])
            z = proj[..., :Din]
            xBC = proj[..., Din:Din + self.conv_dim]
            dt = proj[..., Din + self.conv_dim:]  # [S, Lc, nH]
            xBC = jnp.where(valid[..., None], xBC, 0.0)

            init = conv_l[slots]
            if fresh is not None:
                init = jnp.where(fresh[:, None, None], 0.0,
                                 init.astype(jnp.float32)).astype(init.dtype)
            full = jnp.concatenate([init.astype(xBC.dtype), xBC], axis=1)
            conv = jnp.zeros_like(xBC)
            for tap in range(C):
                conv = conv + full[:, tap:tap + Lc, :] * lp["conv_w"][tap]
            if "conv_b" in lp:
                conv = conv + lp["conv_b"]
            conv = jax.nn.silu(conv.astype(jnp.float32)).astype(self.dtype)
            conv = jnp.where(valid[..., None], conv, 0.0)
            idx = (q_lens[:, None] +
                   jnp.arange(C - 1, dtype=jnp.int32)[None, :])
            new_conv = jnp.take_along_axis(full, idx[..., None], axis=1)

            xs = conv[..., :Din].astype(jnp.float32)
            Bmat = conv[..., Din:Din + G * N].astype(jnp.float32)
            Cmat = conv[..., Din + G * N:].astype(jnp.float32)
            xs = xs.reshape(S, Lc, nH, P)
            reps = nH // G
            Bh = jnp.repeat(Bmat.reshape(S, Lc, G, N), reps, axis=2)
            Ch = jnp.repeat(Cmat.reshape(S, Lc, G, N), reps, axis=2)

            dt = jax.nn.softplus(
                dt.astype(jnp.float32) + lp["dt_bias"])  # [S, Lc, nH]
            A = -jnp.exp(lp["A_log"].astype(jnp.float32))  # [nH]
            a_t = jnp.exp(dt * A)  # [S, Lc, nH]
            a_t = jnp.where(valid[..., None], a_t, 1.0)
            dtx = jnp.where(valid[..., None, None],
                            dt[..., None] * xs, 0.0)  # [S, Lc, nH, P]

            h0 = ssm_l[slots].astype(jnp.float32)  # [S, nH, P, N]
            if fresh is not None:
                h0 = jnp.where(fresh[:, None, None, None], 0.0, h0)

            def ssm_step(hc, t):
                hc = (a_t[:, t][..., None, None] * hc +
                      dtx[:, t][..., None] * Bh[:, t][:, :, None, :])
                y = jnp.einsum("shpn,shn->shp", hc, Ch[:, t])
                return hc, y

            h_final, ys = jax.lax.scan(ssm_step, h0, jnp.arange(Lc))
            y = jnp.moveaxis(ys, 0, 1)  # [S, Lc, nH, P]
            y = y + xs * lp["D"][None, None, :, None]
            y = y.reshape(S, Lc, Din)
            # Gated RMSNorm: norm(y * silu(z)) * weight.
            y = y * jax.nn.silu(z.astype(jnp.float32))
            y, _ = rms_norm(y, lp["gated_norm"], self.rms_eps)
            out = jnp.einsum("sld,dh->slh", y.astype(self.dtype),
                             lp["out_proj"])
            h = h + out.astype(self.dtype)
            new_conv_l = conv_l.at[slots].set(
                new_conv.astype(conv_l.dtype))
            new_ssm_l = ssm_l.at[slots].set(h_final.astype(ssm_l.dtype))
            return h, (new_conv_l, new_ssm_l)

        h, (new_conv, new_ssm) = jax.lax.scan(
            layer_fn, x, (params["layers"], conv_cache, ssm_cache))
        h, _ = rms_norm(h, params["final_norm"], self.rms_eps)
        last_idx = jnp.maximum(q_lens - 1, 0)
        last = jnp.take_along_axis(
            h, last_idx[:, None, None].repeat(h.shape[-1], axis=2),
            axis=1)[:, 0]
        return (new_conv, new_ssm), last
