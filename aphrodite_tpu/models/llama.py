"""Llama-family causal LM (also serves Mistral, Qwen2, and other
pre-norm/RoPE/SwiGLU decoders via config flags).

TPU-first re-design of the reference exemplar model
(aphrodite/modeling/models/llama.py:344): instead of nn.Modules with
TP-aware Linear classes (modeling/layers/linear.py), the model is a pure
function over a params pytree. All layers are stacked on a leading [L]
axis and the forward is a single `lax.scan` — compile time is O(1) in
depth and XLA fuses the layer body once. Tensor parallelism is expressed
as `PartitionSpec`s on the stacked params (Megatron sharding: QKV/gate/up
column-wise, O/down row-wise); XLA inserts the all-reduces the reference
does via NCCL (communication_op.py:10-32).
"""

import functools
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.common.logger import init_logger
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.layers import (apply_rope, compute_rope_tables,
                                         gelu_and_mul, layer_norm,
                                         rms_norm, scan_layers_paged,
                                         silu_and_mul)
from aphrodite_tpu.ops.attention import ragged_paged_attention
from aphrodite_tpu.ops.kv_cache import write_kv
from aphrodite_tpu.quantization.qlinear import qmatmul

logger = init_logger(__name__)


def wrap_quant_stacked(layer_params, layer_fn, num_layers: int):
    """Route grouped-container weights (packed int4 AND unpacked gguf
    q5/q6/q8/iq levels) around the scan's xs slicing: a sliced operand
    handed to a pallas matmul is materialized by XLA (a full extra
    read+write of the quantized bytes per layer). The stacked [L, ...]
    containers are closed over and a per-layer index rides the scan;
    qmatmul dispatches on "_idx" (quantization/qlinear.py). int8
    {q, scale} containers stay on the scan path: XLA's mixed dot reads
    the sliced operand in place. Returns (layer_params', layer_fn');
    scanned[0] must be the layer params pytree."""
    quant_stacked = {k: v for k, v in layer_params.items()
                     if isinstance(v, dict)
                     and ("q4p" in v or "q4" in v)}
    if not quant_stacked:
        return layer_params, layer_fn
    layer_params = {k: v for k, v in layer_params.items()
                    if k not in quant_stacked}
    layer_params["_lidx"] = jnp.arange(num_layers, dtype=jnp.int32)

    def wrapped(x, pages, slots, pidx, scanned):
        lp = dict(scanned[0])
        lidx = lp.pop("_lidx")
        for name, w in quant_stacked.items():
            lp[name] = {**w, "_idx": lidx}
        return layer_fn(x, pages, slots, pidx, (lp, *scanned[1:]))

    return layer_params, wrapped


class LlamaForCausalLM:
    """Functional Llama. Params are a dict pytree; see `param_shardings`.

    Subclass knobs cover the pre-norm/RoPE decoder family: Qwen2 (bias),
    Mistral (sliding window), Gemma ((1+w) norms, embed scaling, gelu),
    Gemma2 (soft-caps, extra norms), Phi-3 (fused qkv/gate_up weights),
    Mixtral (MoE MLP) — mirroring the reference's per-arch model files
    (modeling/models/*.py) without duplicating the decoder loop.
    """

    # Head counts need not divide tp: whole KV groups zero-pad up to the
    # next multiple (see __init__). Subclasses with bespoke head layouts
    # (per-layer GQA schedules) opt out.
    supports_asymmetric_tp: bool = True
    # Flags overridden by subclasses (e.g. Qwen2 adds attention bias).
    attention_bias: bool = False
    tie_word_embeddings_default: bool = False
    # RMSNorm computes x * (offset + w): llama 0 + w, gemma 1 + w.
    norm_weight_offset: float = 0.0
    # "rms" (llama) or "layernorm" (starcoder2: mean-centered + bias).
    norm_type: str = "rms"
    # LayerNorm bias terms present (starcoder2/bloom yes, mpt no_bias).
    norm_bias: bool = True
    # Non-parametric norms (olmo-v1: plain LayerNorm, NO weight/bias
    # parameters anywhere).
    norm_parametric: bool = True
    # Ungated-MLP activation: "gelu_tanh" (starcoder2/bloom) or exact
    # "gelu" (mpt).
    ungated_act: str = "gelu_tanh"
    # Gated (SwiGLU/GeGLU) vs plain two-matmul MLP (starcoder2).
    gated_mlp: bool = True
    # Bias on MLP projections (starcoder2).
    mlp_bias: bool = False
    # Bias on the attention output projection.
    o_proj_bias: bool = False
    # Multiply token embeddings by sqrt(hidden) (gemma).
    scale_embeddings: bool = False
    # Granite-style muP multipliers (1.0 = off).
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    # MLP activation: "silu" (llama) or "gelu_tanh" (gemma).
    hidden_act: str = "silu"
    # Gemma2-style logit/attention soft-capping (0 = off).
    logit_softcap: float = 0.0
    attn_softcap: float = 0.0
    # Positional scheme: RoPE (llama) vs ALiBi biases (bloom; subclass
    # sets use_rope=False and fills self.alibi_slopes in __init__).
    use_rope: bool = True
    # RoPE pairing: "neox" rotate-half (llama) or "gptj" interleaved
    # (cohere/gpt-j).
    rope_style: str = "neox"
    # LayerNorm on token embeddings before the first layer (bloom).
    embedding_norm: bool = False
    # Learned absolute position embeddings added to token embeddings
    # (opt/gpt2); pos_offset shifts the table index (OPT reserves 2).
    learned_positions: bool = False
    pos_offset: int = 0
    # Parallel residual: x + attn(ln1(x)) + mlp(ln2(x)) in one hop
    # (gpt-neox/pythia use_parallel_residual). single_norm (phi/cohere)
    # feeds the MLP the SAME ln1 output (no post_norm params at all).
    parallel_residual: bool = False
    single_norm: bool = False
    # OPT-350m do_layer_norm_before=False: LayerNorm applied to the SUM
    # after each residual (x = norm(x + attn(x))), no pre-norm.
    postnorm_residual: bool = False
    # Post-norm residual order (Molmo norm_after / Chameleon swin_norm):
    # x = x + norm(attn(x)); x = x + norm(mlp(x)) — the norms move from
    # the block inputs to the block outputs.
    norm_after: bool = False
    # Bias on the (untied) LM head projection (phi).
    lm_head_bias: bool = False
    # Clamp QKV projections to [-clip, clip] (dbrx clip_qkv; 0 = off).
    qkv_clip: float = 0.0

    @classmethod
    def supports_head_padding(cls) -> bool:
        """Eligibility for asymmetric-TP zero-padded head groups: the
        subclass must run the base forward/param machinery (subclasses
        overriding them index heads with the unpadded counts)."""
        return (cls.supports_asymmetric_tp
                and cls.forward is LlamaForCausalLM.forward
                and cls.param_shapes is LlamaForCausalLM.param_shapes
                and cls.maybe_pad_kv_weight
                is LlamaForCausalLM.maybe_pad_kv_weight)

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        self.config = model_config
        self.parallel_config = parallel_config or ParallelConfig()
        hf = model_config.hf_config
        self.hidden_size = model_config.get_hidden_size()
        self.num_layers = model_config.get_num_layers()
        self.num_heads = model_config.get_num_attention_heads()
        self.num_kv_heads = model_config.get_total_num_kv_heads()
        self.head_dim = model_config.get_head_size()
        self.intermediate_size = int(hf["intermediate_size"])
        self.vocab_size = model_config.get_vocab_size()
        self.rms_eps = float(hf.get("rms_norm_eps", 1e-6))
        self.rope_theta = float(hf.get("rope_theta", 10000.0))
        self.rope_scaling = hf.get("rope_scaling")
        self.max_position = model_config.max_model_len
        # The checkpoint's trained context (long-lora factors scale
        # relative to THIS, not the serving max_model_len).
        self.orig_max_position = int(
            hf.get("max_position_embeddings") or self.max_position)
        # Partial rotary (gpt-neox rotary_pct, phi partial_rotary_factor):
        # RoPE applies to the leading rotary_dim dims of each head.
        pct = float(hf.get("rotary_pct")
                    or hf.get("partial_rotary_factor") or 1.0)
        self.rotary_dim = max(2, int(self.head_dim * pct))
        if hf.get("rotary_dim"):  # absolute override (gpt-j)
            self.rotary_dim = int(hf["rotary_dim"])
        tie_cfg = hf.get("tie_word_embeddings")
        self.tie_word_embeddings = bool(
            self.tie_word_embeddings_default if tie_cfg is None
            else tie_cfg)
        self.attention_bias = bool(
            hf.get("attention_bias", self.attention_bias))
        self.sliding_window = model_config.get_sliding_window()
        self.dtype = jnp.dtype(model_config.dtype)
        self.sm_scale = self.head_dim**-0.5

        tp = self.parallel_config.tensor_parallel_size
        if self.num_heads % max(self.num_kv_heads, 1) != 0:
            raise ValueError(
                f"q heads ({self.num_heads}) must be a multiple of kv "
                f"heads ({self.num_kv_heads})")
        q_per_kv = self.num_heads // max(self.num_kv_heads, 1)
        if self.num_kv_heads % tp == 0:
            # Even split — the common case.
            self.num_kv_heads_padded = self.num_kv_heads
            self.num_heads_padded = self.num_heads
            self._kv_pad_mode = "none"
        elif tp % self.num_kv_heads == 0:
            # tp > num_kv_heads with exact fit: KV heads replicate onto
            # shards (reference: modeling/layers/linear.py
            # QKVParallelLinear replicates kv heads when tp exceeds them).
            self.num_kv_heads_padded = tp
            self.num_heads_padded = self.num_heads
            self._kv_pad_mode = "replicate"
        else:
            # Asymmetric TP (reference parallel_state.py:1200,1216 uneven
            # rank partitions): SPMD shard_map needs equal shards, so
            # instead of uneven splits we zero-pad WHOLE KV GROUPS (a kv
            # head + its q_per_kv q heads) up to the next multiple of tp.
            # Padded groups are exact no-ops: k=v=0 pages attend to
            # nothing (uniform softmax x zero V = 0) and the o-projection
            # rows for padded q heads are zero. Cost is the padded KV
            # cache rows; tp need not divide the head counts.
            if not type(self).supports_head_padding():
                raise ValueError(
                    f"{type(self).__name__}: head counts "
                    f"({self.num_heads}/{self.num_kv_heads}) are not "
                    f"divisible by tp={tp} and this architecture does "
                    f"not support asymmetric-TP head padding")
            self.num_kv_heads_padded = -(-self.num_kv_heads // tp) * tp
            self.num_heads_padded = self.num_kv_heads_padded * q_per_kv
            self._kv_pad_mode = "zero"
        # Asymmetric TP also pads the MLP intermediate axis (zero gate
        # columns make padded lanes exact no-ops: silu(0)*up = 0, and the
        # padded down-projection rows are zero anyway). Round to a
        # multiple of lcm(tp, 128): per-rank shards stay lane-aligned AND
        # 128-wide quantization groups along the down-projection's K axis
        # keep their original boundaries (padding must not change the
        # rounding of real weights).
        self.intermediate_padded = self.intermediate_size
        if self._kv_pad_mode == "zero" and self.intermediate_size % tp:
            import math

            unit = tp * 128 // math.gcd(tp, 128)
            self.intermediate_padded = \
                -(-self.intermediate_size // unit) * unit

        # Per-head ALiBi slopes (f32[NH]); set by subclasses (bloom).
        self.alibi_slopes: Optional[jax.Array] = None
        # Per-layer rope enable mask (bool[L]); None = rope everywhere.
        # SmolLM3-style NoPE layers set entries False.
        self.rope_layer_mask: Optional[jax.Array] = None
        # Blocksparse attention (phi-3-small): (block_size, local_blocks,
        # vert_stride) + per-global-head vertical phase offsets, with an
        # optional per-layer enable mask (False = dense layer).
        self.blocksparse_params: Optional[Tuple[int, int, int]] = None
        self.bs_head_offsets: Optional[jax.Array] = None
        self.bs_layer_mask: Optional[jax.Array] = None
        # M-RoPE (Qwen2-VL): frequency bands split into temporal/height/
        # width sections; ForwardBatch.mrope_positions selects which of
        # the three position streams indexes each band (reference
        # MRotaryEmbedding, rotary_embedding.py:726). HF 4.5x rewrites
        # rope type "mrope" to "default", so detect by section presence.
        self.mrope_section: Optional[Tuple[int, ...]] = None
        if self.rope_scaling and self.rope_scaling.get("mrope_section"):
            self.mrope_section = tuple(
                int(s) for s in self.rope_scaling["mrope_section"])
            if sum(self.mrope_section) != self.rotary_dim // 2:
                raise ValueError(
                    f"mrope_section {self.mrope_section} must sum to "
                    f"rotary_dim/2 ({self.rotary_dim // 2})")
        self._cos, self._sin = compute_rope_tables(
            self.rotary_dim,
            self.max_position,
            base=self.rope_theta,
            rope_scaling=self.rope_scaling,
            dtype=jnp.float32,
        )
        # Long-context LoRA (reference lora/models.py:37 long_lora
        # scaling + LinearScalingRotaryEmbeddingWithLora): per-factor
        # linear-scaled rope regions appended to the base table; a
        # request served by a long-lora adapter offsets its rope
        # positions into its factor's region (runner rope_positions).
        self.long_lora_rope_offsets: Dict[float, int] = {1.0: 0}
        factors = getattr(model_config, "long_lora_scaling_factors",
                          None)
        if factors:
            if self.rope_scaling:
                raise ValueError(
                    "long_lora_scaling_factors compose linear scaling "
                    "over the BASE rope; the checkpoint already has "
                    f"rope_scaling={self.rope_scaling}")
            import numpy as _np

            cos_parts, sin_parts = [self._cos], [self._sin]
            offset = int(self._cos.shape[0])
            for f in sorted(set(float(f) for f in factors)):
                if f <= 1.0:
                    continue
                ext_len = int(round(f * self.orig_max_position))
                c2, s2 = compute_rope_tables(
                    self.rotary_dim, ext_len, base=self.rope_theta,
                    rope_scaling={"type": "linear", "factor": f},
                    dtype=jnp.float32)
                self.long_lora_rope_offsets[f] = offset
                offset += ext_len
                cos_parts.append(c2)
                sin_parts.append(s2)
            self._cos = jnp.asarray(
                _np.concatenate([_np.asarray(c) for c in cos_parts]))
            self._sin = jnp.asarray(
                _np.concatenate([_np.asarray(s) for s in sin_parts]))

    # ------------------------------------------------------------------
    # Params: shapes + shardings
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        H, L = self.hidden_size, self.num_layers
        NH, NKV, D = (self.num_heads_padded, self.num_kv_heads_padded,
                      self.head_dim)
        F = getattr(self, "intermediate_padded", self.intermediate_size)
        V = self.vocab_size
        shapes = {
            "embed": (V, H),
            "final_norm": (H,),
            "layers": {
                "input_norm": (L, H),
                "wq": (L, H, NH * D),
                "wk": (L, H, NKV * D),
                "wv": (L, H, NKV * D),
                "wo": (L, NH * D, H),
                "post_norm": (L, H),
            },
        }
        if self.gated_mlp:
            shapes["layers"].update({
                "gate": (L, H, F),
                "up": (L, H, F),
                "down": (L, F, H),
            })
            if self.mlp_bias:
                shapes["layers"]["gate_b"] = (L, F)
                shapes["layers"]["up_b"] = (L, F)
                shapes["layers"]["down_b"] = (L, H)
        else:
            shapes["layers"].update({
                "fc1": (L, H, F),
                "fc2": (L, F, H),
            })
            if self.mlp_bias:
                shapes["layers"]["fc1_b"] = (L, F)
                shapes["layers"]["fc2_b"] = (L, H)
        if self.attention_bias:
            shapes["layers"]["bq"] = (L, NH * D)
            shapes["layers"]["bk"] = (L, NKV * D)
            shapes["layers"]["bv"] = (L, NKV * D)
        if self.o_proj_bias:
            shapes["layers"]["bo"] = (L, H)
        if self.norm_type == "layernorm" and self.norm_bias:
            shapes["layers"]["input_norm_b"] = (L, H)
            shapes["layers"]["post_norm_b"] = (L, H)
            shapes["final_norm_b"] = (H,)
        if self.embedding_norm:
            shapes["embed_norm"] = (H,)
            if self.norm_type == "layernorm" and self.norm_bias:
                shapes["embed_norm_b"] = (H,)
        if self.learned_positions:
            # Checkpoint table length follows the HF-declared maximum
            # (independent of a user-lowered max_model_len); OPT bakes
            # its 2 offset rows into the stored table.
            hf = self.config.hf_config
            base_len = int(hf.get("max_position_embeddings")
                           or hf.get("n_positions") or self.max_position)
            shapes["embed_pos"] = (base_len + self.pos_offset, H)
        if not self.tie_word_embeddings:
            shapes["lm_head"] = (H, V)
            if self.lm_head_bias:
                shapes["lm_head_b"] = (V,)
        if self.single_norm:
            shapes["layers"].pop("post_norm", None)
            shapes["layers"].pop("post_norm_b", None)
        if not self.norm_parametric:
            for key in ("input_norm", "input_norm_b", "post_norm",
                        "post_norm_b"):
                shapes["layers"].pop(key, None)
            for key in ("final_norm", "final_norm_b"):
                shapes.pop(key, None)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = {
            "embed": P(None, None),
            "final_norm": P(),
            "layers": {
                "input_norm": P(),
                "wq": P(None, None, "model"),
                "wk": P(None, None, "model"),
                "wv": P(None, None, "model"),
                "wo": P(None, "model", None),
                "post_norm": P(),
            },
        }
        if self.gated_mlp:
            specs["layers"].update({
                "gate": P(None, None, "model"),
                "up": P(None, None, "model"),
                "down": P(None, "model", None),
            })
            if self.mlp_bias:
                specs["layers"]["gate_b"] = P(None, "model")
                specs["layers"]["up_b"] = P(None, "model")
                specs["layers"]["down_b"] = P()
        else:
            specs["layers"].update({
                "fc1": P(None, None, "model"),
                "fc2": P(None, "model", None),
            })
            if self.mlp_bias:
                specs["layers"]["fc1_b"] = P(None, "model")
                specs["layers"]["fc2_b"] = P()
        if self.attention_bias:
            specs["layers"]["bq"] = P(None, "model")
            specs["layers"]["bk"] = P(None, "model")
            specs["layers"]["bv"] = P(None, "model")
        if self.o_proj_bias:
            specs["layers"]["bo"] = P()
        if self.norm_type == "layernorm" and self.norm_bias:
            specs["layers"]["input_norm_b"] = P()
            specs["layers"]["post_norm_b"] = P()
            specs["final_norm_b"] = P()
        if self.embedding_norm:
            specs["embed_norm"] = P()
            if self.norm_type == "layernorm" and self.norm_bias:
                specs["embed_norm_b"] = P()
        if self.learned_positions:
            specs["embed_pos"] = P(None, None)
        if not self.tie_word_embeddings:
            specs["lm_head"] = P(None, "model")
            if self.lm_head_bias:
                specs["lm_head_b"] = P("model")
        if self.single_norm:
            specs["layers"].pop("post_norm", None)
            specs["layers"].pop("post_norm_b", None)
        if not self.norm_parametric:
            for key in ("input_norm", "input_norm_b", "post_norm",
                        "post_norm_b"):
                specs["layers"].pop(key, None)
            for key in ("final_norm", "final_norm_b"):
                specs.pop(key, None)
        if self.parallel_config.pipeline_parallel_size > 1:
            # Layer-stacked arrays shard their leading [L] dim over the
            # "pipe" axis (each stage holds its layer slice).
            specs["layers"] = {
                k: P("pipe", *tuple(v)[1:]) for k, v in
                specs["layers"].items()
            }
        return specs

    def fuse_projections(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Load-time projection fusion: concatenate wq|wk|wv -> wqkv and
        gate|up -> w13 along the output axis (all share the same input
        activation), halving the per-layer matmul count from 7 to 4.

        For the packed-int4 path this is the per-layer megakernel the
        roadmap names (docs/roadmap.md): each pallas_call pays a pipeline
        fill/drain, and at decode shapes the drains were ~40% of matmul
        time (tools/quant_microbench.py fused-vs-split). Dense bf16 and
        int8 containers fuse the same way — one MXU pass reads the
        activation once.

        Single-shard only (tp == pp == 1): under TP the fused output
        axis would need Megatron-style per-rank interleaving to keep
        shard boundaries aligned with head groups (reference
        QKVParallelLinear does this implicitly; our GSPMD slices would
        reshard). The runner gates the call accordingly.
        """
        if not (self.supports_pipelined
                or getattr(self, "supports_projection_fusion", False)):
            return params  # custom forward: unknown layer structure
        lp = params.get("layers")
        if lp is None or "wqkv" in lp or "w13" in lp:
            return params

        def fusable(names):
            kinds = []
            for n in names:
                w = lp.get(n)
                if w is None:
                    return False
                if isinstance(w, dict):
                    if "q4p" in w:
                        g = 2 * w["q4p"].shape[-2] // w["scale"].shape[-2]
                        kinds.append(("q4p", w["q4p"].shape[-2], g))
                    elif "q4" in w:
                        g = w["q4"].shape[-2] // w["scale"].shape[-2]
                        kinds.append(("q4", w["q4"].shape[-2], g))
                    elif "act" in w:
                        return False  # fp8 w8a8: act-scale plumbing
                    else:
                        kinds.append(("q", w["q"].shape[-2], 0))
                else:
                    kinds.append(("dense", w.shape[-2], 0))
            return all(k == kinds[0] for k in kinds)

        def cat(names, out):
            ws = [lp[n] for n in names]
            if isinstance(ws[0], dict):
                lp[out] = {k: jnp.concatenate([w[k] for w in ws], axis=-1)
                           for k in ws[0]}
            else:
                lp[out] = jnp.concatenate(ws, axis=-1)
            for n in names:
                del lp[n]

        if fusable(("wq", "wk", "wv")):
            cat(("wq", "wk", "wv"), "wqkv")
            if "bq" in lp:
                lp["bqkv"] = jnp.concatenate(
                    [lp.pop("bq"), lp.pop("bk"), lp.pop("bv")], axis=-1)
        if (self.gated_mlp and type(self).mlp is LlamaForCausalLM.mlp
                and fusable(("gate", "up"))):
            # Subclasses with a custom MLP (phi3small gegelu) read
            # lp["gate"]/lp["up"] themselves — leave their params alone.
            cat(("gate", "up"), "w13")
            if "gate_b" in lp:
                lp["b13"] = jnp.concatenate(
                    [lp.pop("gate_b"), lp.pop("up_b")], axis=-1)
        return params

    def unfuse_projections(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Inverse of fuse_projections: split wqkv / w13 back into the
        canonical per-projection keys. Used when persisting params
        (save_sharded_state) so checkpoints keep the loadable layout."""
        lp = params.get("layers")
        if lp is None:
            return params
        NH, NKV, D = (self.num_heads_padded, self.num_kv_heads_padded,
                      self.head_dim)

        def split(name, bounds, outs):
            w = lp.pop(name, None)
            if w is None:
                return
            for (lo, hi), out in zip(bounds, outs):
                if isinstance(w, dict):
                    lp[out] = {k: v[..., lo:hi] for k, v in w.items()}
                else:
                    lp[out] = w[..., lo:hi]

        qb = ((0, NH * D), (NH * D, (NH + NKV) * D),
              ((NH + NKV) * D, (NH + 2 * NKV) * D))
        split("wqkv", qb, ("wq", "wk", "wv"))
        if "bqkv" in lp:
            b = lp.pop("bqkv")
            lp["bq"], lp["bk"], lp["bv"] = (b[..., lo:hi] for lo, hi in qb)
        F = getattr(self, "intermediate_padded", self.intermediate_size)
        fb = ((0, F), (F, 2 * F))
        split("w13", fb, ("gate", "up"))
        if "b13" in lp:
            b = lp.pop("b13")
            lp["gate_b"], lp["up_b"] = (b[..., lo:hi] for lo, hi in fb)
        return params

    def quantizable_weights(self) -> List[str]:
        """Param paths eligible for weight quantization (the Linear-layer
        set; embeddings/norms/lm_head stay full precision, matching the
        reference's LinearMethod scope)."""
        attn = ["layers.wq", "layers.wk", "layers.wv", "layers.wo"]
        if self.gated_mlp:
            return attn + ["layers.gate", "layers.up", "layers.down"]
        return attn + ["layers.fc1", "layers.fc2"]

    def kv_cache_spec(self) -> P:
        """Sharding of each layer-stacked kv_pages array
        [L, num_pages, page_size, 2*KV, D]: KV heads over "model",
        layers over "pipe" under pipeline parallelism."""
        pipe = "pipe" if \
            self.parallel_config.pipeline_parallel_size > 1 else None
        return P(pipe, None, None, "model", None)

    @property
    def kv_cache_shape_suffix(self) -> Tuple[int, int]:
        return (2 * self.num_kv_heads_padded, self.head_dim)

    # ------------------------------------------------------------------
    # Weight loading
    # ------------------------------------------------------------------

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random-init params (DummyModelLoader equivalent,
        model_loader/loader.py:373) as host numpy arrays."""
        rng = np.random.default_rng(seed)

        def make(shape):
            scale = 1.0 / np.sqrt(shape[-1] if len(shape) > 1 else 1)
            arr = rng.standard_normal(size=shape, dtype=np.float32) * scale
            return arr.astype(jnp.dtype(self.dtype).type
                              if self.dtype != jnp.bfloat16 else np.float32)

        def walk(shapes):
            out = {}
            for k, v in shapes.items():
                if isinstance(v, dict):
                    out[k] = walk(v)
                elif k.endswith("norm") or "norm" in k:
                    out[k] = np.ones(v, dtype=np.float32)
                else:
                    out[k] = make(v)
            return out

        params = walk(self.param_shapes())
        if getattr(self, "_kv_pad_mode", "none") == "zero":
            # Keep the padded head groups exact no-ops under dummy
            # weights too (random values there would make the padded
            # model a different function from the unpadded one).
            D = self.head_dim
            lp = params.get("layers", {})
            qcol = self.num_heads * D
            kvcol = self.num_kv_heads * D
            F = self.intermediate_size
            for key, col in (("wq", qcol), ("wk", kvcol), ("wv", kvcol),
                             ("bq", qcol), ("bk", kvcol), ("bv", kvcol),
                             ("gate", F), ("up", F), ("fc1", F),
                             ("gate_b", F), ("up_b", F), ("fc1_b", F)):
                if key in lp:
                    lp[key][..., col:] = 0.0
            for key, row in (("wo", qcol), ("down", F), ("fc2", F)):
                if key in lp:
                    lp[key][..., row:, :] = 0.0
        return params

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        """(hf_template, our_path, transpose) for per-layer weights.

        HF stores Linear weights [out, in]; ours are [in, out] (transpose).
        """
        maps = [
            ("model.layers.{i}.input_layernorm.weight",
             "layers.input_norm", False),
            ("model.layers.{i}.self_attn.q_proj.weight", "layers.wq", True),
            ("model.layers.{i}.self_attn.k_proj.weight", "layers.wk", True),
            ("model.layers.{i}.self_attn.v_proj.weight", "layers.wv", True),
            ("model.layers.{i}.self_attn.o_proj.weight", "layers.wo", True),
            ("model.layers.{i}.post_attention_layernorm.weight",
             "layers.post_norm", False),
        ]
        if self.gated_mlp:
            maps += [
                ("model.layers.{i}.mlp.gate_proj.weight", "layers.gate",
                 True),
                ("model.layers.{i}.mlp.up_proj.weight", "layers.up", True),
                ("model.layers.{i}.mlp.down_proj.weight", "layers.down",
                 True),
            ]
        else:
            maps += [
                ("model.layers.{i}.mlp.c_fc.weight", "layers.fc1", True),
                ("model.layers.{i}.mlp.c_proj.weight", "layers.fc2", True),
            ]
            if self.mlp_bias:
                maps += [
                    ("model.layers.{i}.mlp.c_fc.bias", "layers.fc1_b",
                     False),
                    ("model.layers.{i}.mlp.c_proj.bias", "layers.fc2_b",
                     False),
                ]
        if self.o_proj_bias:
            maps.append(("model.layers.{i}.self_attn.o_proj.bias",
                         "layers.bo", False))
        if self.norm_type == "layernorm" and self.norm_bias:
            maps += [
                ("model.layers.{i}.input_layernorm.bias",
                 "layers.input_norm_b", False),
                ("model.layers.{i}.post_attention_layernorm.bias",
                 "layers.post_norm_b", False),
            ]
        if self.attention_bias:
            maps += [
                ("model.layers.{i}.self_attn.q_proj.bias", "layers.bq",
                 False),
                ("model.layers.{i}.self_attn.k_proj.bias", "layers.bk",
                 False),
                ("model.layers.{i}.self_attn.v_proj.bias", "layers.bv",
                 False),
            ]
        if not self.norm_parametric:
            maps = [m for m in maps if "norm" not in m[1]]
        return maps

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("model.embed_tokens.weight", "embed", False),
            ("model.norm.weight", "final_norm", False),
        ]
        if self.norm_type == "layernorm" and self.norm_bias:
            maps.append(("model.norm.bias", "final_norm_b", False))
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        if not self.norm_parametric:
            maps = [m for m in maps if "norm" not in m[1]]
        return maps

    def maybe_pad_kv_weight(self, our_path: str,
                            arr: np.ndarray) -> np.ndarray:
        """Adapt head-indexed projection weights to the padded head
        layout: replicate KV groups when tp > num_kv_heads (exact fit),
        or zero-pad whole KV groups for asymmetric TP (tp not dividing
        the head counts; reference parallel_state.py:1200 splits ranks
        unevenly instead — SPMD wants equal shards)."""
        if self.num_kv_heads_padded == self.num_kv_heads:
            return arr
        D = self.head_dim
        if self._kv_pad_mode == "replicate":
            if our_path in ("layers.wk", "layers.wv"):
                reps = self.num_kv_heads_padded // self.num_kv_heads
                # arr: [..., in, kv*D] -> REPEAT each head group in place
                # ([g1,g1,g2,g2], not tiled [g1,g2,g1,g2]): under TP the
                # column shards must pair q-head i with kv-head
                # i//q_per_kv.
                in_dim = arr.shape[0]
                arr = arr.reshape(in_dim, self.num_kv_heads, D)
                arr = np.repeat(arr, reps, axis=1)
                return arr.reshape(in_dim, -1)
            if our_path in ("layers.bk", "layers.bv"):
                reps = self.num_kv_heads_padded // self.num_kv_heads
                arr = arr.reshape(self.num_kv_heads, D)
                arr = np.repeat(arr, reps, axis=0)
                return arr.reshape(-1)
            return arr
        # Zero-pad mode: append zero q/k/v columns (and zero o-proj
        # ROWS) for the padded groups. Group pairing is preserved
        # because q_per_kv is unchanged and padding sits at the end on
        # both the q and kv axes.
        kv_extra = (self.num_kv_heads_padded - self.num_kv_heads) * D
        q_extra = (self.num_heads_padded - self.num_heads) * D
        if our_path in ("layers.wk", "layers.wv"):
            return np.concatenate(
                [arr, np.zeros((arr.shape[0], kv_extra), arr.dtype)],
                axis=1)
        if our_path == "layers.wq":
            return np.concatenate(
                [arr, np.zeros((arr.shape[0], q_extra), arr.dtype)],
                axis=1)
        if our_path == "layers.wo":
            return np.concatenate(
                [arr, np.zeros((q_extra, arr.shape[1]), arr.dtype)],
                axis=0)
        if our_path in ("layers.bk", "layers.bv"):
            return np.concatenate([arr, np.zeros((kv_extra,), arr.dtype)])
        if our_path == "layers.bq":
            return np.concatenate([arr, np.zeros((q_extra,), arr.dtype)])
        f_extra = self.intermediate_padded - self.intermediate_size
        if f_extra:
            if our_path in ("layers.gate", "layers.up", "layers.fc1"):
                return np.concatenate(
                    [arr, np.zeros((arr.shape[0], f_extra), arr.dtype)],
                    axis=1)
            if our_path in ("layers.down", "layers.fc2"):
                return np.concatenate(
                    [arr, np.zeros((f_extra, arr.shape[1]), arr.dtype)],
                    axis=0)
            if our_path in ("layers.gate_b", "layers.up_b",
                            "layers.fc1_b"):
                return np.concatenate(
                    [arr, np.zeros((f_extra,), arr.dtype)])
        return arr

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------

    def forward(
        self,
        params: Dict[str, Any],
        kv_pages: jax.Array,  # [L, num_pages, page_size, 2*KV, D]
        batch: ForwardBatch,
        *,
        mesh: Optional[Mesh] = None,
        use_attention_kernel: Optional[bool] = None,
        kv_scales: Optional[Tuple[jax.Array, jax.Array]] = None,
        lora: Optional[Dict[str, Any]] = None,
        cp_axis: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Run the decoder. Returns (new_kv_pages, hidden[T, H]).

        cp_axis: context-parallel prefill (worker _execute_cp_prefill):
        this forward runs INSIDE a shard_map whose `cp_axis` shards the
        chunk's query tokens; batch.token_ids/positions are the LOCAL
        shard slice while batch.slot_mapping covers the FULL chunk. Each
        layer all-gathers its freshly-projected K/V so every shard
        writes the identical full-chunk KV (replicated pages stay
        consistent) and attends its local queries against the full
        prefix — causality holds because the shard's kv_len is
        prefix + (rank+1) * local_len.

        lora: optional {module: {"A": [L, n, in, r], "B": [L, n, r, out]}}
        slot-stacked adapters; tokens route by ForwardBatch.lora_* via
        grouped matmuls (ops/lora.py — the reference's Punica SGMV).

        kv_scales: optional per-layer (k_scale[L], v_scale[L]) for a
        quantized KV cache (fp8/int8). Dequant never happens inside the
        attention kernel: k_scale folds into q (q·(s·K) == (s·q)·K) and
        v_scale into the attention output — the TPU equivalent of the
        reference's in-kernel scale multiplies
        (kernels/attention/attention_kernels.cu fp8/int8 paths).
        """
        x, layer_fn = self._embed_and_layer_fn(
            params, batch, mesh=mesh,
            use_attention_kernel=use_attention_kernel, lora=lora,
            cp_axis=cp_axis)
        layer_params = params["layers"]
        use_lora = lora is not None and batch.lora_sorted_idx is not None

        # Grouped-container weights (packed int4 AND unpacked gguf
        # q5/q6/q8/iq levels) bypass the scan's xs slicing: a sliced
        # operand to the pallas matmul would be materialized by XLA
        # (full extra read+write of the quantized bytes per layer).
        # Instead the stacked [L, ...] arrays are closed over and the
        # per-layer index rides the scan; qmatmul dispatches on "_idx"
        # (quantization/qlinear.py). int8 {q, scale} containers stay on
        # the scan path: XLA's mixed dot reads the sliced operand in
        # place (no pallas boundary to force a copy).
        layer_params, layer_fn = wrap_quant_stacked(
            layer_params, layer_fn, self.num_layers)

        k_scales, v_scales = kv_scales if kv_scales is not None else (None,
                                                                      None)
        lora_scan = lora if use_lora else None

        def scan_body(x, pages, slots, pidx, sc):
            # rope/blocksparse masks None keeps the scanned pytree
            # unchanged (and the compiled graph identical) for models
            # without per-layer heterogeneity.
            return layer_fn(x, pages, slots, pidx, (*sc, None, None))

        pp = self.parallel_config.pipeline_parallel_size
        if pp > 1 and mesh is not None:
            x, new_kv_pages = self._layers_pipeline(
                scan_body, x, layer_params, kv_pages, k_scales, v_scales,
                lora_scan, batch, mesh, pp)
        elif getattr(self, "bskcn", None) is not None:
            # Solar-style backbone skip connections: the layer stack runs
            # as scans over segments, with snapshot/blend ops at the
            # (static) bskcn layer indices between segments.
            x, new_kv_pages = self._layers_bskcn(
                scan_body, x, kv_pages,
                (layer_params, k_scales, v_scales, lora_scan), batch)
        elif (self.rope_layer_mask is not None
              or self.bs_layer_mask is not None):
            # lax.scan carries None xs channels as empty pytrees, so
            # absent masks pass through as None per step.
            x, new_kv_pages = scan_layers_paged(
                layer_fn, x, kv_pages,
                (layer_params, k_scales, v_scales, lora_scan,
                 self.rope_layer_mask, self.bs_layer_mask), batch)
        else:
            x, new_kv_pages = scan_layers_paged(
                scan_body, x, kv_pages,
                (layer_params, k_scales, v_scales, lora_scan), batch)
        if not getattr(self, "skip_final_norm", False):
            x = self._norm(x, params.get("final_norm"),
                           params.get("final_norm_b"))
        return new_kv_pages, x

    def _embed_and_layer_fn(
        self,
        params: Dict[str, Any],
        batch: ForwardBatch,
        *,
        mesh: Optional[Mesh] = None,
        use_attention_kernel: Optional[bool] = None,
        lora: Optional[Dict[str, Any]] = None,
        cp_axis: Optional[str] = None,
    ):
        """Per-batch forward preamble: token embedding (+ positional
        machinery) and the layer-body closure. Factored out of `forward`
        so the pipelined multi-batch path (`forward_pipelined`) can build
        an independent layer body per in-flight sub-batch."""
        NH, NKV, D = (self.num_heads_padded, self.num_kv_heads_padded,
                      self.head_dim)
        x = params["embed"][batch.token_ids]  # [T, H]
        x = x.astype(self.dtype)
        if self.scale_embeddings:
            x = x * jnp.asarray(self.hidden_size**0.5, self.dtype)
        if self.embedding_multiplier != 1.0:
            x = x * jnp.asarray(self.embedding_multiplier, self.dtype)
        if batch.embeds_override is not None:
            # Multimodal splice: image-placeholder positions take their
            # precomputed (vision tower + projector) embeddings verbatim.
            x = jnp.where(batch.embeds_mask[:, None],
                          batch.embeds_override.astype(self.dtype), x)
        if self.learned_positions:
            pos = batch.positions + self.pos_offset
            x = x + params["embed_pos"][pos].astype(self.dtype)
        if self.embedding_norm:
            x = self._norm(x, params["embed_norm"],
                           params.get("embed_norm_b")).astype(self.dtype)
        if batch.mrope_positions is not None and self.mrope_section:
            # Section-wise gather: band i takes its cos/sin from the
            # T/H/W position stream assigned to it.
            bounds = np.cumsum((0,) + self.mrope_section)
            cos = jnp.concatenate([
                self._cos[batch.mrope_positions[i]][:, bounds[i]:bounds[i + 1]]
                for i in range(3)
            ], axis=-1)
            sin = jnp.concatenate([
                self._sin[batch.mrope_positions[i]][:, bounds[i]:bounds[i + 1]]
                for i in range(3)
            ], axis=-1)
        else:
            rope_pos = batch.positions
            if batch.rope_offsets is not None:
                # Long-context LoRA: offset into the adapter factor's
                # appended linear-scaled rope region.
                rope_pos = rope_pos + batch.rope_offsets
            cos = self._cos[rope_pos]  # [T, D/2]
            sin = self._sin[rope_pos]

        alibi = self.alibi_slopes
        if alibi is not None and alibi.shape[0] != NH:
            # Asymmetric-TP head padding: slope values for padded q heads
            # are irrelevant (their K/V pages are zero and their o-proj
            # rows are zero) — zeros keep the bias arithmetic finite.
            alibi = jnp.pad(alibi, (0, NH - alibi.shape[0]))
        bs_offsets = self.bs_head_offsets
        if bs_offsets is not None and bs_offsets.shape[0] != NH:
            bs_offsets = jnp.pad(bs_offsets, (0, NH - bs_offsets.shape[0]))

        layer_params = params["layers"]
        has_bias = "bq" in layer_params
        # Under pipeline parallelism the layer body runs inside a
        # partial-manual {"pipe"} shard_map; the attention op's own
        # {"model"} shard_map nests inside it (pp x tp), so the mesh
        # passes through either way.
        inner_mesh = mesh

        use_lora = lora is not None and batch.lora_sorted_idx is not None

        def lora_add(y, h_in, la, module):
            if not use_lora or module not in la:
                return y
            from aphrodite_tpu.ops.lora import lora_delta

            delta = lora_delta(h_in, la[module]["A"], la[module]["B"],
                               batch.lora_sorted_idx,
                               batch.lora_unsort_idx,
                               batch.lora_group_sizes)
            return y + delta

        def layer_fn(x, pages, slots, pidx, scanned):
            # pages: the FLAT [L*P, page, 2K, D] cache (scan carry);
            # slots/pidx are pre-offset into this layer's page region
            # (scan_layers_paged) so the write is an in-place scatter.
            lp, k_scale, v_scale, la, rope_on, bs_on = scanned
            h = x if (self.norm_after or self.postnorm_residual) \
                else self._norm(x, lp.get("input_norm"),
                                lp.get("input_norm_b"))
            if "wqkv" in lp:
                # Load-time fused projection (fuse_projections): one
                # matmul, split at the (padded) head boundaries.
                qkv = qmatmul(h, lp["wqkv"])
                if "bqkv" in lp:
                    qkv = qkv + lp["bqkv"]
                q, k, v = (qkv[:, :NH * D],
                           qkv[:, NH * D:(NH + NKV) * D],
                           qkv[:, (NH + NKV) * D:])
                # LoRA deltas add per-projection, matching the split
                # path (adapters store wq/wk/wv separately).
                q = lora_add(q, h, la, "wq")
                k = lora_add(k, h, la, "wk")
                v = lora_add(v, h, la, "wv")
            else:
                q = lora_add(qmatmul(h, lp["wq"]), h, la, "wq")
                k = lora_add(qmatmul(h, lp["wk"]), h, la, "wk")
                v = lora_add(qmatmul(h, lp["wv"]), h, la, "wv")
                if has_bias:
                    q = q + lp["bq"]
                    k = k + lp["bk"]
                    v = v + lp["bv"]
            if self.qkv_clip:
                c = self.qkv_clip
                q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
            q = q.astype(self.dtype).reshape(-1, NH, D)
            k = k.astype(self.dtype).reshape(-1, NKV, D)
            v = v.astype(self.dtype).reshape(-1, NKV, D)
            q, k = self.qk_norm(q, k, lp)
            if self.use_rope:
                # apply_rope handles partial rotary (table width) and
                # both NeoX rotate-half / GPT-J interleaved styles.
                # NoPE layers (rope_on False) get the identity rotation
                # cos=1/sin=0 (smollm3 no_rope_layers).
                neox = self.rope_style == "neox"
                if rope_on is None:
                    c, s = cos, sin
                else:
                    c = jnp.where(rope_on, cos, 1.0)
                    s = jnp.where(rope_on, sin, 0.0)
                q = apply_rope(q, c, s, is_neox_style=neox)
                k = apply_rope(k, c, s, is_neox_style=neox)
            if cp_axis is not None:
                # Context-parallel prefill: every shard assembles the
                # full chunk's K/V (slots already cover the full chunk).
                k = jax.lax.all_gather(k, cp_axis, axis=0, tiled=True)
                v = jax.lax.all_gather(v, cp_axis, axis=0, tiled=True)
            pages = write_kv(pages, k, v, slots,
                             k_scale=k_scale, v_scale=v_scale)
            if k_scale is not None:
                q = q * k_scale.astype(q.dtype)
            attn = ragged_paged_attention(
                q,
                pages,
                batch.kv_lens,
                pidx,
                batch.cu_q_lens,
                batch.num_seqs,
                sm_scale=self.sm_scale,
                sliding_window=self.sliding_window,
                soft_cap=self.attn_softcap or None,
                alibi_slopes=alibi,
                blocksparse=self.blocksparse_params,
                bs_head_offsets=bs_offsets,
                bs_on=bs_on,
                mesh=inner_mesh,
                use_kernel=use_attention_kernel,
            )
            if v_scale is not None:
                attn = attn * v_scale.astype(attn.dtype)
            attn = attn.reshape(-1, NH * D)
            o = lora_add(qmatmul(attn, lp["wo"]), attn, la, "wo")
            if "bo" in lp:
                o = o + lp["bo"]
            if self.parallel_residual:
                # x + attn(ln1(x)) + mlp(ln2(x)) (gpt-neox); phi/cohere
                # feed the MLP the same ln1 output (single_norm).
                h2 = h if self.single_norm else self._norm(
                    x, lp.get("post_norm"), lp.get("post_norm_b"))
                x = x + o.astype(self.dtype) + self.mlp(
                    lp, h2, mesh=inner_mesh, lora=la,
                    lora_add=lora_add).astype(self.dtype)
            elif self.postnorm_residual:
                x = self._norm(x + o.astype(self.dtype),
                               lp.get("input_norm"),
                               lp.get("input_norm_b"))
                ff = self.mlp(lp, x, mesh=inner_mesh, lora=la,
                              lora_add=lora_add).astype(self.dtype)
                x = self._norm(x + ff, lp.get("post_norm"),
                               lp.get("post_norm_b"))
            elif self.norm_after:
                o = self._norm(o.astype(self.dtype), lp.get("input_norm"),
                               lp.get("input_norm_b"))
                x = x + o.astype(self.dtype)
                ff = self.mlp(lp, x, mesh=inner_mesh, lora=la,
                              lora_add=lora_add).astype(self.dtype)
                ff = self._norm(ff, lp.get("post_norm"),
                                lp.get("post_norm_b"))
                x = x + ff.astype(self.dtype)
            else:
                rm = self.residual_multiplier
                if rm != 1.0:
                    o = o * jnp.asarray(rm, o.dtype)
                x = x + o.astype(self.dtype)
                h = self._norm(x, lp.get("post_norm"),
                               lp.get("post_norm_b"))
                ff = self.mlp(lp, h, mesh=inner_mesh, lora=la,
                              lora_add=lora_add).astype(self.dtype)
                if rm != 1.0:
                    ff = ff * jnp.asarray(rm, ff.dtype)
                x = x + ff
            return x, pages

        return x, layer_fn

    def _layers_bskcn(self, layer_fn, x, kv_pages, scanned, batch):
        """Segmented layer execution for Solar bskcn skip connections
        (reference modeling/models/solar.py:321-339): at layer i, first
        snapshot the activation if i ∈ bskcn_1/bskcn_2, then blend it
        with the stored snapshot if i ∈ bskcn_3/bskcn_4 (inference uses
        bskcn_tv[1]). The reference tracks (hidden, residual) pairs; our
        x carries the full activation, and blending x directly is the
        same linear combination."""
        cfg = self.bskcn
        tv = jnp.asarray(cfg["tv"], self.dtype)
        L = self.num_layers
        s1, s2 = set(cfg["s1"]), set(cfg["s2"])
        s3, s4 = set(cfg["s3"]), set(cfg["s4"])
        bounds = sorted({0, L, *s1, *s2, *s3, *s4})
        h1 = h2 = None
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if lo in s1:
                h1 = x
            if lo in s2:
                h2 = x
            if lo in s3:
                x = h1 * tv + x * (1 - tv)
            if lo in s4:
                x = h2 * tv + x * (1 - tv)
            seg = jax.tree.map(lambda a: a[lo:hi], scanned)
            x, kv_pages = scan_layers_paged(
                layer_fn, x, kv_pages, seg, batch,
                layer_ids=jnp.arange(lo, hi, dtype=jnp.int32))
        return x, kv_pages

    @staticmethod
    def _layers_pipeline(layer_fn, x, layer_params, kv_pages, k_scales,
                         v_scales, lora_scan, batch, mesh, pp: int):
        """Pipeline-parallel layer execution.

        The stacked [L, ...] params and KV pages are sharded over the
        "pipe" mesh axis (each stage holds L/pp layers — the memory
        point of PP, reference parallel_state.py:1028 + IntermediateTensors
        send/recv). Execution is staged SPMD: stage s runs its local
        layer scan when active, then hands activations to s+1 via
        ppermute — the TPU-native form of the reference's NCCL
        send/recv pipeline (worker_base.py:291-330).
        """
        from jax.sharding import PartitionSpec as P

        def body(local_layers, local_kv, local_ks, local_vs, local_lora,
                 x):
            my = jax.lax.axis_index("pipe")
            perm = [(i, (i + 1) % pp) for i in range(pp)]

            def stage_step(carry, s):
                x, kv = carry

                def run(args):
                    xx, kv_in = args
                    # Local layer ids 0..L/pp-1: the local cache shard
                    # only covers this stage's layers.
                    return scan_layers_paged(
                        layer_fn, xx, kv_in,
                        (local_layers, local_ks, local_vs, local_lora),
                        batch)

                x, kv = jax.lax.cond(my == s, run, lambda a: a, (x, kv))
                x = jax.lax.ppermute(x, "pipe", perm)
                return (x, kv), None

            (x, kv), _ = jax.lax.scan(stage_step, (x, local_kv),
                                      jnp.arange(pp))
            # After pp hops the final activations sit on stage 0;
            # broadcast them so every shard returns the same value.
            x = jax.lax.psum(
                jnp.where(my == 0, x, jnp.zeros_like(x)), "pipe")
            return x, kv

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("pipe"), P("pipe"), P("pipe"), P("pipe"),
                      P("pipe"), P()),
            out_specs=(P(), P("pipe")),
            axis_names={"pipe"},
            check_vma=False,
        )
        return fn(layer_params, kv_pages, k_scales, v_scales, lora_scan, x)

    @property
    def supports_pipelined(self) -> bool:
        """Whether forward_pipelined covers this model's layer stack.
        Subclasses with a custom ``forward`` (MLA, per-layer embedding
        scaling, ...) and Solar bskcn segments (snapshot/blend ops
        between scans) are excluded — their step semantics are not the
        plain embed + homogeneous-layer-scan the wrap-around schedule
        reuses."""
        return (type(self).forward is LlamaForCausalLM.forward
                and getattr(self, "bskcn", None) is None)

    def forward_pipelined(
        self,
        params: Dict[str, Any],
        kv_pages: jax.Array,
        batches: ForwardBatch,  # leaves stacked [M, ...]
        *,
        mesh: Mesh,
        kv_scales: Optional[Tuple[jax.Array, jax.Array]] = None,
        use_attention_kernel: Optional[bool] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Microbatched pipeline-parallel forward (prefill path).

        Runs M microbatches through pp stages in ONE program with the
        classic wrap-around schedule: at step t, stage s processes
        microbatch t-s, then hands activations to stage s+1 via
        ppermute. After the pp-1-step fill, every stage's MXU is busy —
        this is the throughput point of PP that the plain staged
        execution (_layers_pipeline) lacks, and the TPU-native answer to
        the reference's virtual-engine microbatch overlap
        (aphrodite_engine.py:1056-1059, worker_base.py:291-330).

        Microbatches are cuts of the flat token stream; a cut may fall
        mid-sequence, which is exactly chunked-prefill semantics: the
        schedule guarantees microbatch m-1 leaves stage s before m
        arrives, so the later chunk's attention reads KV the earlier
        chunk already wrote. Idle (fill/drain) stages run on zeros with
        their KV writes routed to the trash page.

        Returns (new_kv_pages, hidden[M, T_mb, H]).
        """
        from jax.sharding import PartitionSpec as P

        pp = self.parallel_config.pipeline_parallel_size
        M = batches.token_ids.shape[0]
        k_scales, v_scales = kv_scales if kv_scales is not None else (None,
                                                                      None)
        layer_params = params["layers"]
        other_params = {k: v for k, v in params.items() if k != "layers"}

        def body(local_layers, local_kv, local_ks, local_vs, local_masks,
                 other, bst):
            my = jax.lax.axis_index("pipe")
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            pages_per_layer = local_kv.shape[1]
            page_size = local_kv.shape[2]
            t_mb = bst.token_ids.shape[1]
            trash = ((pages_per_layer - 1) * page_size +
                     (jnp.arange(t_mb, dtype=jnp.int32) % page_size))
            rope_mask, bs_mask = local_masks

            def step_fn(carry, t):
                x_cur, kv, out = carry
                m = t - my
                active = (m >= 0) & (m < M)
                m_c = jnp.clip(m, 0, M - 1)
                batch_m = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, m_c, 0, keepdims=False), bst)
                # Idle (fill/drain) stages scatter into the trash page.
                batch_m = batch_m._replace(slot_mapping=jnp.where(
                    active, batch_m.slot_mapping, trash))
                full_params = dict(other)
                full_params["layers"] = local_layers
                x_emb, layer_fn = self._embed_and_layer_fn(
                    full_params, batch_m, mesh=mesh,
                    use_attention_kernel=use_attention_kernel)
                # Stage 0 injects the fresh microbatch; later stages
                # continue the activations handed over by ppermute.
                x_in = jnp.where(my == 0, x_emb, x_cur)
                x_o, kv = scan_layers_paged(
                    layer_fn, x_in, kv,
                    (local_layers, local_ks, local_vs, None, rope_mask,
                     bs_mask), batch_m)
                take = active & (my == pp - 1)
                out = out.at[m_c].set(jnp.where(take, x_o, out[m_c]))
                x_nxt = jax.lax.ppermute(x_o, "pipe", perm)
                return (x_nxt, kv, out), None

            h = other["embed"].shape[-1]
            x0 = jnp.zeros((t_mb, h), self.dtype)
            out0 = jnp.zeros((M, t_mb, h), self.dtype)
            (_, kv, out), _ = jax.lax.scan(
                step_fn, (x0, local_kv, out0),
                jnp.arange(M + pp - 1, dtype=jnp.int32))
            # Finished microbatches live on the last stage; psum
            # replicates them (all other stages contribute zeros).
            out = jax.lax.psum(out, "pipe")
            return out, kv

        masks = (self.rope_layer_mask, self.bs_layer_mask)
        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("pipe"), P("pipe"), P("pipe"), P("pipe"),
                      P("pipe"), P(), P()),
            out_specs=(P(), P("pipe")),
            axis_names={"pipe"},
            check_vma=False,
        )
        x, new_kv_pages = fn(layer_params, kv_pages, k_scales, v_scales,
                             masks, other_params, batches)
        if not getattr(self, "skip_final_norm", False):
            x = self._norm(x, params.get("final_norm"),
                           params.get("final_norm_b"))
        return new_kv_pages, x

    def qk_norm(self, q: jax.Array, k: jax.Array,
                lp: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        """Per-head query/key normalization hook (identity for Llama;
        Qwen3 overrides with head-dim RMSNorm)."""
        return q, k

    def _norm(self, x: jax.Array, weight: Optional[jax.Array],
              bias: Optional[jax.Array] = None) -> jax.Array:
        if weight is None:  # non-parametric (olmo-v1)
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + self.rms_eps)).astype(
                x.dtype)
        w = weight + self.norm_weight_offset if self.norm_weight_offset \
            else weight
        if self.norm_type == "layernorm":
            return layer_norm(x, w, bias, self.rms_eps)
        out, _ = rms_norm(x, w, self.rms_eps)
        return out

    def mlp(self, lp: Dict[str, Any], h: jax.Array, *,
            mesh: Optional[Mesh] = None, lora=None,
            lora_add=None) -> jax.Array:
        def maybe_lora(y, h_in, module):
            if lora_add is None:
                return y
            return lora_add(y, h_in, lora, module)

        if not self.gated_mlp:
            up = qmatmul(h, lp["fc1"])
            if "fc1_b" in lp:
                up = up + lp["fc1_b"]
            if self.ungated_act == "relu":
                act = jax.nn.relu(up).astype(self.dtype)
            elif self.ungated_act == "relu2":
                r = jax.nn.relu(up.astype(jnp.float32))
                act = (r * r).astype(self.dtype)
            else:
                act = jax.nn.gelu(
                    up.astype(jnp.float32),
                    approximate=(self.ungated_act != "gelu"),
                ).astype(self.dtype)
            out = qmatmul(act, lp["fc2"])
            if "fc2_b" in lp:
                out = out + lp["fc2_b"]
            return out

        if "w13" in lp:
            # Load-time fused gate|up (fuse_projections): one matmul.
            g13 = qmatmul(h, lp["w13"])
            if "b13" in lp:
                g13 = g13 + lp["b13"]
            F = g13.shape[-1] // 2
            gate = maybe_lora(g13[:, :F], h, "gate")
            up = maybe_lora(g13[:, F:], h, "up")
        else:
            gate = maybe_lora(qmatmul(h, lp["gate"]), h, "gate")
            up = maybe_lora(qmatmul(h, lp["up"]), h, "up")
            if "gate_b" in lp:
                gate = gate + lp["gate_b"]
            if "up_b" in lp:
                up = up + lp["up_b"]
        if self.hidden_act == "gelu_tanh":
            act = gelu_and_mul(gate.astype(self.dtype),
                               up.astype(self.dtype))
        else:
            act = silu_and_mul(gate.astype(self.dtype),
                               up.astype(self.dtype))
        out = maybe_lora(qmatmul(act, lp["down"]), act, "down")
        if "down_b" in lp:
            out = out + lp["down_b"]
        return out

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        """hidden [S, H] -> logits [S, V] in float32 (reference
        layers/logits_processor.py: gather + TP-gathered LM head)."""
        if self.tie_word_embeddings:
            # The embed table may carry extra prompt-adapter rows; the LM
            # head only covers the true vocabulary.
            embed = params["embed"][:self.vocab_size]
            logits = jnp.dot(hidden, embed.T,
                             preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(hidden, params["lm_head"],
                             preferred_element_type=jnp.float32)
            if "lm_head_b" in params:
                logits = logits + params["lm_head_b"].astype(jnp.float32)
        if getattr(self, "logit_scale", None):
            logits = logits * jnp.float32(self.logit_scale)
        if self.logit_softcap:
            cap = self.logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        return logits
