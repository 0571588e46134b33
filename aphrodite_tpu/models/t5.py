"""T5 / Flan-T5 encoder-decoder.

Rides the encoder-decoder runner (models/bart.py pioneered the cross-KV
pages; reference enc-dec runner + HF T5 semantics). T5 specifics:
pre-norm RMSNorm blocks without biases, NO attention scaling (absorbed
into init), relative-position BUCKET biases shared from each stack's
first block (bidirectional buckets in the encoder, causal in the
decoder; cross-attention carries no bias), gated-gelu or relu FFNs, and
the d_model**-0.5 logit scaling when the head ties to the embedding.

The decoder self-attention needs a per-(q,k)-distance bias, which the
paged kernel has no input for — decoder steps gather their own pages
and run dense masked attention with the bias computed in-graph from
positions (correct for any chunking; a biased kernel is a later perf
step). Encoder lengths bound the gather like the cross path.
"""

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.layers import flatten_kv_pages
from aphrodite_tpu.ops.kv_cache import write_kv

_NEG = -1e30


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32)


def _rel_bucket(rel, bidirectional: bool, num_buckets: int,
                max_distance: int):
    """HF T5Attention._relative_position_bucket, jnp port.
    rel = k_pos - q_pos."""
    ret = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rel > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(rel)
    else:
        n = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5ForConditionalGeneration:
    is_encoder_decoder = True
    is_attention_free = False
    is_multimodal = False

    def __init__(self, model_config: ModelConfig,
                 parallel_config: Optional[ParallelConfig] = None) -> None:
        self.config = model_config
        self.parallel_config = parallel_config or ParallelConfig()
        if self.parallel_config.pipeline_parallel_size > 1:
            raise NotImplementedError(
                "pipeline parallelism over enc-dec stacks is not wired")
        hf = model_config.hf_config
        D = model_config.get_hidden_size()
        self.hidden_size = D
        self.enc_layers = int(hf.get("num_layers", 6))
        self.num_layers = int(hf.get("num_decoder_layers",
                                     self.enc_layers))
        self.num_heads = int(hf.get("num_heads", 8))
        self.num_kv_heads = self.num_heads
        self.num_kv_heads_padded = self.num_heads
        self.head_dim = int(hf.get("d_kv", 64))
        self.ffn = int(hf.get("d_ff", 4 * D))
        self.vocab_size = model_config.get_vocab_size()
        self.rms_eps = float(hf.get("layer_norm_epsilon", 1e-6))
        self.num_buckets = int(hf.get("relative_attention_num_buckets",
                                      32))
        self.max_distance = int(hf.get(
            "relative_attention_max_distance", 128))
        act = str(hf.get("feed_forward_proj", "relu"))
        self.gated = act.startswith("gated-")
        self.act = act.replace("gated-", "")
        self.tie_word_embeddings = bool(
            hf.get("tie_word_embeddings", True))
        self.decoder_start_token_id = int(
            hf.get("decoder_start_token_id", 0))
        self.dtype = jnp.dtype(model_config.dtype)
        self.max_position = model_config.max_model_len

    # ---- cache geometry -------------------------------------------------

    @property
    def kv_cache_shape_suffix(self) -> Tuple[int, int]:
        return (2 * self.num_heads, self.head_dim)

    @property
    def cross_kv_cache_shape_suffix(self) -> Tuple[int, int]:
        return (2 * self.num_heads, self.head_dim)

    def kv_cache_spec(self) -> P:
        return P(None, None, None, "model", None)

    # ---- params ----------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        D, V = self.hidden_size, self.vocab_size
        Le, Ld, F = self.enc_layers, self.num_layers, self.ffn
        ID = self.num_heads * self.head_dim

        def attn(L):
            return {"wq": (L, D, ID), "wk": (L, D, ID),
                    "wv": (L, D, ID), "wo": (L, ID, D)}

        enc = dict(attn(Le))
        enc.update({"ln1": (Le, D), "ln2": (Le, D),
                    "wo_ff": (Le, F, D)})
        dec = dict(attn(Ld))
        dec.update({
            "ln1": (Ld, D),
            "cwq": (Ld, D, ID), "cwk": (Ld, D, ID),
            "cwv": (Ld, D, ID), "cwo": (Ld, ID, D),
            "cln": (Ld, D),
            "ln2": (Ld, D),
            "wo_ff": (Ld, F, D),
        })
        if self.gated:
            enc["wi0"] = (Le, D, F)
            enc["wi1"] = (Le, D, F)
            dec["wi0"] = (Ld, D, F)
            dec["wi1"] = (Ld, D, F)
        else:
            enc["wi"] = (Le, D, F)
            dec["wi"] = (Ld, D, F)
        shapes = {
            "embed": (V, D),
            "enc_rel_bias": (self.num_buckets, self.num_heads),
            "dec_rel_bias": (self.num_buckets, self.num_heads),
            "enc_final_ln": (D,),
            "dec_final_ln": (D,),
            "encoder": enc,
            "decoder": dec,
        }
        if not self.tie_word_embeddings:
            shapes["lm_head"] = (D, V)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        """TP: heads + FFN columns shard; the relative-bias tables
        shard on their head axis (the in-graph bucket gather indexes
        the replicated bucket axis)."""
        m = "model"
        head = {"wq": P(None, None, m), "wk": P(None, None, m),
                "wv": P(None, None, m), "wo": P(None, m, None),
                "cwq": P(None, None, m), "cwk": P(None, None, m),
                "cwv": P(None, None, m), "cwo": P(None, m, None),
                "wi": P(None, None, m), "wi0": P(None, None, m),
                "wi1": P(None, None, m), "wo_ff": P(None, m, None)}

        def spec_for(node):
            return {k: (spec_for(v) if isinstance(v, dict)
                        else head.get(k, P()))
                    for k, v in node.items()}

        specs = spec_for(self.param_shapes())
        specs["enc_rel_bias"] = P(None, m)
        specs["dec_rel_bias"] = P(None, m)
        if not self.tie_word_embeddings:
            specs["lm_head"] = P(None, m)
        return specs

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)

        def walk(shapes):
            return {k: (walk(v) if isinstance(v, dict) else
                        (rng.standard_normal(v) * 0.02).astype(
                            np.float32))
                    for k, v in shapes.items()}

        return walk(self.param_shapes())

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        d = "decoder.block.{i}."
        maps = [
            (d + "layer.0.SelfAttention.q.weight", "decoder.wq", True),
            (d + "layer.0.SelfAttention.k.weight", "decoder.wk", True),
            (d + "layer.0.SelfAttention.v.weight", "decoder.wv", True),
            (d + "layer.0.SelfAttention.o.weight", "decoder.wo", True),
            (d + "layer.0.layer_norm.weight", "decoder.ln1", False),
            (d + "layer.1.EncDecAttention.q.weight", "decoder.cwq", True),
            (d + "layer.1.EncDecAttention.k.weight", "decoder.cwk", True),
            (d + "layer.1.EncDecAttention.v.weight", "decoder.cwv", True),
            (d + "layer.1.EncDecAttention.o.weight", "decoder.cwo", True),
            (d + "layer.1.layer_norm.weight", "decoder.cln", False),
            (d + "layer.2.DenseReluDense.wo.weight", "decoder.wo_ff",
             True),
            (d + "layer.2.layer_norm.weight", "decoder.ln2", False),
        ]
        if self.gated:
            maps += [
                (d + "layer.2.DenseReluDense.wi_0.weight", "decoder.wi0",
                 True),
                (d + "layer.2.DenseReluDense.wi_1.weight", "decoder.wi1",
                 True),
            ]
        else:
            maps.append((d + "layer.2.DenseReluDense.wi.weight",
                         "decoder.wi", True))
        return maps

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = [
            ("shared.weight", "embed", False),
            ("encoder.embed_tokens.weight", "embed", False),
            ("encoder.final_layer_norm.weight", "enc_final_ln", False),
            ("decoder.final_layer_norm.weight", "dec_final_ln", False),
            ("encoder.block.0.layer.0.SelfAttention."
             "relative_attention_bias.weight", "enc_rel_bias", False),
            ("decoder.block.0.layer.0.SelfAttention."
             "relative_attention_bias.weight", "dec_rel_bias", False),
        ]
        if not self.tie_word_embeddings:
            maps.append(("lm_head.weight", "lm_head", True))
        return maps

    def hf_aux_mappings(self) -> List:
        e = "encoder.block.{i}."
        pairs = [
            (e + "layer.0.SelfAttention.q.weight", "encoder.wq", True),
            (e + "layer.0.SelfAttention.k.weight", "encoder.wk", True),
            (e + "layer.0.SelfAttention.v.weight", "encoder.wv", True),
            (e + "layer.0.SelfAttention.o.weight", "encoder.wo", True),
            (e + "layer.0.layer_norm.weight", "encoder.ln1", False),
            (e + "layer.1.DenseReluDense.wo.weight", "encoder.wo_ff",
             True),
            (e + "layer.1.layer_norm.weight", "encoder.ln2", False),
        ]
        if self.gated:
            pairs += [
                (e + "layer.1.DenseReluDense.wi_0.weight", "encoder.wi0",
                 True),
                (e + "layer.1.DenseReluDense.wi_1.weight", "encoder.wi1",
                 True),
            ]
        else:
            pairs.append((e + "layer.1.DenseReluDense.wi.weight",
                          "encoder.wi", True))
        return [(t, p, tr, self.enc_layers) for t, p, tr in pairs]

    # ---- shared pieces -----------------------------------------------------

    def _ffn(self, lp, x):
        if self.gated:
            g = x @ lp["wi0"]
            g = (jax.nn.gelu(g, approximate=True) if self.act == "gelu"
                 else jax.nn.relu(g))
            h = g * (x @ lp["wi1"])
        else:
            h = x @ lp["wi"]
            h = (jax.nn.gelu(h, approximate=True) if self.act == "gelu"
                 else jax.nn.relu(h))
        return h @ lp["wo_ff"]

    # ---- encoder program ----------------------------------------------------

    def encode_and_write_cross(self, params, cross_kv, tokens, positions,
                               slot_mapping, enc_len, embeds=None,
                               embeds_mask=None):
        f32 = jnp.float32
        H, Dh = self.num_heads, self.head_dim
        x = params["embed"][tokens].astype(f32)
        if embeds is not None:
            # Encoder-side multimodal splice (BLIP2-T5 query features).
            x = jnp.where(embeds_mask[:, None], embeds.astype(f32), x)
        E = x.shape[0]
        key_ok = jnp.arange(E) < enc_len[0]
        # Bidirectional relative bias, shared across layers.
        rel = positions[None, :] - positions[:, None]  # k - q
        bucket = _rel_bucket(rel, True, self.num_buckets,
                             self.max_distance)
        bias = params["enc_rel_bias"].astype(f32)[bucket]  # [E, E, H]
        bias = jnp.transpose(bias, (2, 0, 1))  # [H, E, E]

        def enc_block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _rms(x, lp["ln1"], self.rms_eps)
            q = (h @ lp["wq"]).reshape(E, H, Dh)
            k = (h @ lp["wk"]).reshape(E, H, Dh)
            v = (h @ lp["wv"]).reshape(E, H, Dh)
            scores = jnp.einsum("qhd,khd->hqk", q, k) + bias
            scores = jnp.where(key_ok[None, None, :], scores, _NEG)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(E, -1)
            x = x + o @ lp["wo"]
            h = _rms(x, lp["ln2"], self.rms_eps)
            return x + self._ffn(lp, h), None

        x, _ = jax.lax.scan(enc_block, x, params["encoder"])
        x = _rms(x, params["enc_final_ln"], self.rms_eps)

        flat, L, Pg = flatten_kv_pages(cross_kv)
        page_size = cross_kv.shape[2]

        def write_layer(flat, sc):
            lidx, lp = sc
            k = (x @ lp["cwk"].astype(f32)).reshape(E, H, Dh)
            v = (x @ lp["cwv"].astype(f32)).reshape(E, H, Dh)
            slots = slot_mapping + lidx * (Pg * page_size)
            return write_kv(flat, k.astype(cross_kv.dtype),
                            v.astype(cross_kv.dtype), slots), None

        flat, _ = jax.lax.scan(
            write_layer, flat,
            (jnp.arange(L, dtype=jnp.int32), params["decoder"]))
        return flat.reshape(cross_kv.shape)

    # ---- decoder forward -----------------------------------------------------

    def forward(
        self,
        params: Dict[str, Any],
        kv_pages: jax.Array,
        batch: ForwardBatch,
        *,
        mesh: Optional[Mesh] = None,
        kv_scales=None,
        lora=None,
        cross_kv: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        f32 = jnp.float32
        H, Dh = self.num_heads, self.head_dim
        T = batch.token_ids.shape[0]
        S = batch.kv_lens.shape[0]
        x = params["embed"][batch.token_ids].astype(f32)

        if batch.cu_q_lens is not None:
            seq_of = jnp.searchsorted(batch.cu_q_lens[1:],
                                      jnp.arange(T, dtype=jnp.int32),
                                      side="right").astype(jnp.int32)
            seq_of = jnp.minimum(seq_of, S - 1)
        else:
            seq_of = jnp.arange(T, dtype=jnp.int32)
        enc_lens_t = batch.cross_kv_lens[seq_of]
        kv_lens_t = batch.kv_lens[seq_of]

        Np = batch.page_indices.shape[1]
        page_size = kv_pages.shape[2]
        Nk = Np * page_size

        # Pure-decode batches route self-attention through the grouped
        # decode kernel with its T5 relative-bucket bias input
        # (ops/decode_attention.py): flat in kv_len instead of the
        # dense O(T * Nk) page gather + bias expansion per layer per
        # step that the fallback below pays.
        import jax as _jax
        from aphrodite_tpu.ops.decode_attention import (
            paged_decode_attention, supports as _decode_supports)

        _q_probe = jnp.zeros((T, H, Dh), jnp.bfloat16)
        decode_fast = (
            batch.cu_q_lens is None
            and kv_pages.dtype == jnp.bfloat16
            and _jax.default_backend() in ("tpu", "axon")
            and _decode_supports(_q_probe, kv_pages[0],
                                 batch.page_indices))

        if not decode_fast:
            # Dense fallback (prefill always; decode on unsupported
            # shapes/backends): gather own pages with the causal
            # relative bias.
            k_pos = jnp.arange(Nk, dtype=jnp.int32)
            # k valid: k_pos <= q_pos AND k_pos < kv_len of the row.
            q_pos = batch.positions
            ok = (k_pos[None, :] <= q_pos[:, None]) & \
                (k_pos[None, :] < kv_lens_t[:, None])  # [T, Nk]
            rel = k_pos[None, :] - q_pos[:, None]
            bucket = _rel_bucket(rel, False, self.num_buckets,
                                 self.max_distance)
            bias = params["dec_rel_bias"].astype(f32)[bucket]
            bias = jnp.transpose(bias, (0, 2, 1))  # [T, H, Nk]
        else:
            bias_table = jnp.transpose(
                params["dec_rel_bias"].astype(f32))  # [H, NB]

        flat, L, Pg = flatten_kv_pages(kv_pages)

        def layer_fn(carry, sc):
            x, flat = carry
            lidx, lp, cross_layer = sc
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            # self-attention
            h = _rms(x, lp["ln1"], self.rms_eps)
            q = (h @ lp["wq"]).reshape(T, H, Dh)
            k = (h @ lp["wk"]).reshape(T, H, Dh)
            v = (h @ lp["wv"]).reshape(T, H, Dh)
            slots = batch.slot_mapping + lidx * (Pg * page_size)
            flat = write_kv(flat, k.astype(kv_pages.dtype),
                            v.astype(kv_pages.dtype), slots)
            pidx = batch.page_indices + lidx * Pg
            if decode_fast:
                o = paged_decode_attention(
                    q.astype(jnp.bfloat16), flat, batch.kv_lens, pidx,
                    None, sm_scale=1.0,  # T5 attention is unscaled
                    rel_bias=bias_table,
                    rel_bias_meta=(self.num_buckets, self.max_distance),
                ).astype(f32).reshape(T, -1)
            else:
                kv = flat[pidx]  # [S, Np, page, 2H, Dh]
                kv = kv.reshape(S, Nk, 2 * H, Dh).astype(f32)
                # write_kv interleaves K/V per head on the combined axis.
                kt = kv[:, :, 0::2][seq_of]  # [T, Nk, H, Dh]
                vt = kv[:, :, 1::2][seq_of]
                scores = jnp.einsum("thd,tnhd->thn", q, kt) + bias
                scores = jnp.where(ok[:, None, :], scores, _NEG)
                attn = jax.nn.softmax(scores, axis=-1)
                o = jnp.einsum("thn,tnhd->thd", attn, vt).reshape(T, -1)
            x = x + o @ lp["wo"]
            # cross-attention (no bias)
            h = _rms(x, lp["cln"], self.rms_eps)
            cq = (h @ lp["cwq"]).reshape(T, H, Dh)
            ckv = cross_layer[batch.cross_page_indices]
            Nc = ckv.shape[1] * ckv.shape[2]
            ckv = ckv.reshape(S, Nc, 2 * H, Dh).astype(f32)
            ck = ckv[:, :, 0::2][seq_of]
            cv = ckv[:, :, 1::2][seq_of]
            cs = jnp.einsum("thd,tnhd->thn", cq, ck)
            cok = jnp.arange(Nc)[None, :] < enc_lens_t[:, None]
            cs = jnp.where(cok[:, None, :], cs, _NEG)
            ca = jax.nn.softmax(cs, axis=-1)
            co = jnp.einsum("thn,tnhd->thd", ca, cv).reshape(T, -1)
            x = x + co @ lp["cwo"]
            # ffn
            h = _rms(x, lp["ln2"], self.rms_eps)
            x = x + self._ffn(lp, h)
            return (x, flat), None

        (x, flat), _ = jax.lax.scan(
            layer_fn, (x, flat),
            (jnp.arange(L, dtype=jnp.int32), params["decoder"], cross_kv))
        x = _rms(x, params["dec_final_ln"], self.rms_eps)
        return flat.reshape(kv_pages.shape), x.astype(self.dtype)

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        h = hidden.astype(jnp.float32)
        if self.tie_word_embeddings:
            # HF scales tied-head inputs by d_model**-0.5.
            h = h * jnp.asarray(self.hidden_size**-0.5, jnp.float32)
            return h @ params["embed"].astype(jnp.float32).T
        return h @ params["lm_head"].astype(jnp.float32)
