"""Mamba (selective state-space) causal LM — attention-free.

Reference: aphrodite/modeling/models/mamba-family (Jamba/Mamba) backed by
the Triton selective-scan + causal-conv1d kernels (modeling/layers/mamba/
ops/mamba_ssm.py:371, kernels/mamba/*, 1,316 LoC C++). TPU-native
re-design: the recurrence runs as a `lax.scan` over time, vectorized over
the batch ([S, Lc] dense chunk layout), with per-sequence conv/SSM state
carried in slot-indexed cache arrays — there is no KV cache; each
sequence owns ONE state slot (the runner maps it through the existing
block manager by setting block_size = max_model_len, so scheduling is
unchanged).

Layer math follows the published Mamba-1 formulation (HF slow path):
  x, z = split(in_proj(h));  x = silu(causal_conv1d(x, state))
  dt, B, C = x_proj(x);      dt = softplus(dt_proj(dt))
  h_t = exp(dt*A) * h_{t-1} + (dt*x_t) outer B_t;  y = h_t . C_t + D*x
  out = out_proj(y * silu(z))
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.models.layers import rms_norm

logger = init_logger(__name__)


class MambaForCausalLM:
    is_attention_free = True

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        self.config = model_config
        self.parallel_config = parallel_config or ParallelConfig()
        if self.parallel_config.pipeline_parallel_size > 1:
            raise NotImplementedError(
                "pipeline parallelism over SSM layers is not wired yet")
        hf = model_config.hf_config
        self.hidden_size = model_config.get_hidden_size()
        self.num_layers = int(hf["num_hidden_layers"])
        self.d_state = int(hf.get("state_size", 16))
        self.d_conv = int(hf.get("conv_kernel", 4))
        self.expand = int(hf.get("expand", 2))
        self.d_inner = int(hf.get("intermediate_size",
                                  self.expand * self.hidden_size))
        self.dt_rank = hf.get("time_step_rank")
        if self.dt_rank in (None, "auto"):
            self.dt_rank = (self.hidden_size + 15) // 16
        self.dt_rank = int(self.dt_rank)
        self.vocab_size = model_config.get_vocab_size()
        self.rms_eps = float(hf.get("layer_norm_epsilon", 1e-5))
        self.use_conv_bias = bool(hf.get("use_conv_bias", True))
        self.use_bias = bool(hf.get("use_bias", False))
        self.tie_word_embeddings = bool(
            hf.get("tie_word_embeddings", True))
        self.dtype = jnp.dtype(model_config.dtype)
        self.sliding_window = None

    # ------------------------------------------------------------------
    # Params
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        H, L = self.hidden_size, self.num_layers
        Din, N, R, C = self.d_inner, self.d_state, self.dt_rank, self.d_conv
        shapes = {
            "embed": (self.vocab_size, H),
            "final_norm": (H,),
            "layers": {
                "norm": (L, H),
                "in_proj": (L, H, 2 * Din),
                "conv_w": (L, C, Din),      # time-major depthwise taps
                "x_proj": (L, Din, R + 2 * N),
                "dt_proj": (L, R, Din),
                "dt_bias": (L, Din),
                "A_log": (L, Din, N),
                "D": (L, Din),
                "out_proj": (L, Din, H),
            },
        }
        if self.use_conv_bias:
            shapes["layers"]["conv_b"] = (L, Din)
        if not self.tie_word_embeddings:
            shapes["lm_head"] = (H, self.vocab_size)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        """TP shards the d_inner channel axis — the selective scan is
        per-channel independent, so the only cross-shard reductions are
        x_proj (dt/B/C read all channels) and out_proj, which GSPMD
        turns into one psum each. The [x; z] concat axis of in_proj
        reshards at the split (correct; an interleaved layout would
        avoid the collective — roadmap)."""
        m = "model"
        specs = {
            "embed": P(),
            "final_norm": P(),
            "layers": {
                "norm": P(),
                "in_proj": P(None, None, m),
                "conv_w": P(None, None, m),
                "x_proj": P(None, m, None),
                "dt_proj": P(None, None, m),
                "dt_bias": P(None, m),
                "A_log": P(None, m, None),
                "D": P(None, m),
                "out_proj": P(None, m, None),
            },
        }
        if self.use_conv_bias:
            specs["layers"]["conv_b"] = P(None, m)
        if not self.tie_word_embeddings:
            specs["lm_head"] = P(None, m)
        return specs

    def cache_specs(self) -> Tuple[P, P]:
        """(conv, ssm) state shardings: both split on d_inner."""
        return (P(None, None, None, "model"),
                P(None, None, "model", None))

    def quantizable_weights(self) -> List[str]:
        # Weight quantization of the SSM projections lands with the
        # qmatmul routing for einsum call sites (roadmap).
        return []

    # ------------------------------------------------------------------
    # Cache: per-slot conv + SSM state (replaces the KV cache)
    # ------------------------------------------------------------------

    def init_cache(self, num_slots: int, dtype=None) -> Tuple[jax.Array,
                                                              jax.Array]:
        dtype = dtype or jnp.float32
        conv = jnp.zeros((self.num_layers, num_slots + 1, self.d_conv - 1,
                          self.d_inner), dtype)
        ssm = jnp.zeros((self.num_layers, num_slots + 1, self.d_inner,
                         self.d_state), dtype)
        return conv, ssm

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        p = "backbone.layers.{i}.mixer"
        maps = [
            ("backbone.layers.{i}.norm.weight", "layers.norm", False),
            (f"{p}.in_proj.weight", "layers.in_proj", True),
            (f"{p}.x_proj.weight", "layers.x_proj", True),
            (f"{p}.dt_proj.weight", "layers.dt_proj", True),
            (f"{p}.dt_proj.bias", "layers.dt_bias", False),
            (f"{p}.A_log", "layers.A_log", False),
            (f"{p}.D", "layers.D", False),
            (f"{p}.out_proj.weight", "layers.out_proj", True),
            # conv1d.weight [Din, 1, C] -> handled via maybe_pad hook
            (f"{p}.conv1d.weight", "layers.conv_w", False),
        ]
        if self.use_conv_bias:
            maps.append((f"{p}.conv1d.bias", "layers.conv_b", False))
        return maps

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("backbone.embeddings.weight", "embed", False),
            ("backbone.norm_f.weight", "final_norm", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps

    def maybe_pad_kv_weight(self, our_path: str,
                            arr: np.ndarray) -> np.ndarray:
        if our_path == "layers.conv_w" and arr.ndim == 3:
            # [Din, 1, C] -> [C, Din] (time-major taps).
            return np.ascontiguousarray(arr[:, 0, :].T)
        return arr

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
                    out[k] = np.log(np.tile(
                        np.arange(1, self.d_state + 1, dtype=np.float32),
                        (self.num_layers, self.d_inner, 1)))
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
        cache: Tuple[jax.Array, jax.Array],
        token_ids: jax.Array,  # i32[S, Lc]
        q_lens: jax.Array,  # i32[S] valid lengths (0 for padding rows)
        slots: jax.Array,  # i32[S] state slots (trash = num_slots)
        fresh: Optional[jax.Array] = None,  # bool[S]: zero initial state
        start_pos: Optional[jax.Array] = None,  # unused (stateful SSM)
    ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
        """Returns (new_cache, last_hidden [S, H]). `fresh` rows ignore
        whatever a previous occupant left in the recycled state slot."""
        conv_cache, ssm_cache = cache
        S, Lc = token_ids.shape
        Din, N, R, C = (self.d_inner, self.d_state, self.dt_rank,
                        self.d_conv)
        x = params["embed"][token_ids].astype(self.dtype)  # [S, Lc, H]
        tpos = jnp.arange(Lc, dtype=jnp.int32)[None, :]
        valid = tpos < q_lens[:, None]  # [S, Lc]

        def layer_fn(h, scanned):
            lp, conv_l, ssm_l = scanned  # conv_l [slots+1, C-1, Din]
            hn, _ = rms_norm(h, lp["norm"], self.rms_eps)
            xz = jnp.einsum("slh,hd->sld", hn, lp["in_proj"])
            xpart, z = jnp.split(xz, 2, axis=-1)  # [S, Lc, Din] each
            xpart = jnp.where(valid[..., None], xpart, 0.0)

            # Causal depthwise conv with carried state.
            init = conv_l[slots]  # [S, C-1, Din]
            if fresh is not None:
                init = jnp.where(fresh[:, None, None], 0.0,
                                 init.astype(jnp.float32)).astype(init.dtype)
            full = jnp.concatenate([init.astype(xpart.dtype), xpart],
                                   axis=1)  # [S, C-1+Lc, Din]
            conv = jnp.zeros_like(xpart)
            for tap in range(C):
                # Output t uses input (t + tap) of `full` for tap index
                # counted from the oldest: full[t .. t+C-1] with weights
                # conv_w[0..C-1]; output t aligns at full[t + C - 1].
                conv = conv + full[:, tap:tap + Lc, :] * lp["conv_w"][tap]
            if "conv_b" in lp:
                conv = conv + lp["conv_b"]
            conv = jax.nn.silu(conv.astype(jnp.float32)).astype(self.dtype)
            conv = jnp.where(valid[..., None], conv, 0.0)

            # New conv state: last C-1 *valid* inputs per sequence.
            idx = (q_lens[:, None] +
                   jnp.arange(C - 1, dtype=jnp.int32)[None, :])  # [S, C-1]
            new_conv = jnp.take_along_axis(full, idx[..., None], axis=1)

            # Input-dependent SSM parameters.
            dbc = jnp.einsum("sld,dr->slr", conv, lp["x_proj"])
            dt = dbc[..., :R]
            Bmat = dbc[..., R:R + N].astype(jnp.float32)  # [S, Lc, N]
            Cmat = dbc[..., R + N:].astype(jnp.float32)
            dt = jnp.einsum("slr,rd->sld", dt, lp["dt_proj"]) + \
                lp["dt_bias"]
            dt = jax.nn.softplus(dt.astype(jnp.float32))  # [S, Lc, Din]
            A = -jnp.exp(lp["A_log"].astype(jnp.float32))  # [Din, N]

            a_t = jnp.exp(dt[..., None] * A[None, None])  # [S, Lc, Din, N]
            xf = conv.astype(jnp.float32)
            b_t = (dt * xf)[..., None] * Bmat[:, :, None, :]
            # Masked steps carry state through unchanged.
            a_t = jnp.where(valid[..., None, None], a_t, 1.0)
            b_t = jnp.where(valid[..., None, None], b_t, 0.0)

            h0 = ssm_l[slots].astype(jnp.float32)
            if fresh is not None:
                h0 = jnp.where(fresh[:, None, None], 0.0, h0)

            def ssm_step(hc, t):
                hc = a_t[:, t] * hc + b_t[:, t]
                y = jnp.einsum("sdn,sn->sd", hc, Cmat[:, t])
                return hc, y

            h_final, ys = jax.lax.scan(ssm_step, h0,
                                       jnp.arange(Lc))
            y = jnp.moveaxis(ys, 0, 1)  # [S, Lc, Din]
            y = y + xf * lp["D"][None, None]
            y = y * jax.nn.silu(z.astype(jnp.float32))
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
        # Last valid hidden per sequence.
        last_idx = jnp.maximum(q_lens - 1, 0)
        last = jnp.take_along_axis(
            h, last_idx[:, None, None].repeat(h.shape[-1], axis=2),
            axis=1)[:, 0]
        return (new_conv, new_ssm), last

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        if self.tie_word_embeddings:
            return jnp.dot(hidden, params["embed"].T,
                           preferred_element_type=jnp.float32)
        return jnp.dot(hidden, params["lm_head"],
                       preferred_element_type=jnp.float32)
