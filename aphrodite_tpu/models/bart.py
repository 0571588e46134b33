"""BART encoder-decoder (reference aphrodite/modeling/models/bart.py +
worker/enc_dec_model_runner.py).

TPU design: the ENCODER runs as one jitted program per encoder-length
bucket at the sequence's first prefill step — it computes encoder
hidden states and immediately scatters every decoder layer's cross
K/V into the sequence's cross pages (write-once). Decoder steps are
the standard paged causal program plus a per-layer cross-attention
read: cross pages gather per sequence, full (non-causal) attention
masked by encoder length. Cross K/V never changes after the encoder
pass, so decode carries no extra state and the cross cache is passed
read-only (no donation).

Post-norm transformer (residual-then-LayerNorm), learned positions
with BART's +2 offset, shared embedding matrix for encoder/decoder/
lm_head plus the final_logits_bias buffer.
"""

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aphrodite_tpu.common.config import ModelConfig, ParallelConfig
from aphrodite_tpu.models.interface import ForwardBatch
from aphrodite_tpu.models.layers import scan_layers_paged
from aphrodite_tpu.ops.attention import ragged_paged_attention
from aphrodite_tpu.ops.kv_cache import write_kv

_NEG = -1e30


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


class BartForConditionalGeneration:
    is_encoder_decoder = True
    is_attention_free = False
    is_multimodal = False
    # mBART flips to pre-norm (LN before attn/ffn) and adds a final
    # layer_norm to both stacks.
    pre_norm = False
    # Whisper's decoder lacks the embedding LayerNorm and k-proj biases.
    ln_embedding = True
    k_bias = True

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
        self.enc_layers = int(hf.get("encoder_layers", 12))
        self.num_layers = int(hf.get("decoder_layers", 12))
        self.num_heads = int(hf.get("decoder_attention_heads", 16))
        self.enc_heads = int(hf.get("encoder_attention_heads",
                                    self.num_heads))
        self.num_kv_heads = self.num_heads
        self.num_kv_heads_padded = self.num_heads
        self.head_dim = D // self.num_heads
        self.enc_ffn = int(hf.get("encoder_ffn_dim", 4 * D))
        self.dec_ffn = int(hf.get("decoder_ffn_dim", 4 * D))
        self.vocab_size = model_config.get_vocab_size()
        self.max_position = int(hf.get("max_position_embeddings", 1024))
        self.scale_embedding = bool(hf.get("scale_embedding", False))
        self.decoder_start_token_id = int(
            hf.get("decoder_start_token_id", 2))
        self.dtype = jnp.dtype(model_config.dtype)
        self.sm_scale = self.head_dim**-0.5
        self.pos_offset = 2  # BartLearnedPositionalEmbedding

    # ---- cache geometry -------------------------------------------------

    @property
    def kv_cache_shape_suffix(self) -> Tuple[int, int]:
        return (2 * self.num_heads, self.head_dim)

    @property
    def cross_kv_cache_shape_suffix(self) -> Tuple[int, int]:
        return (2 * self.num_heads, self.head_dim)

    def kv_cache_spec(self) -> P:
        # Self- and cross-KV shard on the interleaved combined-head
        # axis, aligned with the head sharding of the projections.
        return P(None, None, None, "model", None)

    # ---- params ----------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        D, V = self.hidden_size, self.vocab_size
        Le, Ld = self.enc_layers, self.num_layers
        Fe, Fd = self.enc_ffn, self.dec_ffn
        P2 = self.max_position + self.pos_offset

        def attn(L):
            return {
                "wq": (L, D, D), "bq": (L, D),
                "wk": (L, D, D), "bk": (L, D),
                "wv": (L, D, D), "bv": (L, D),
                "wo": (L, D, D), "bo": (L, D),
            }

        enc = dict(attn(Le))
        enc.update({
            "ln1": (Le, D), "ln1_b": (Le, D),
            "fc1": (Le, D, Fe), "fc1_b": (Le, Fe),
            "fc2": (Le, Fe, D), "fc2_b": (Le, D),
            "ln2": (Le, D), "ln2_b": (Le, D),
        })
        dec = dict(attn(Ld))
        dec.update({
            "ln1": (Ld, D), "ln1_b": (Ld, D),
            "cwq": (Ld, D, D), "cbq": (Ld, D),
            "cwk": (Ld, D, D), "cbk": (Ld, D),
            "cwv": (Ld, D, D), "cbv": (Ld, D),
            "cwo": (Ld, D, D), "cbo": (Ld, D),
            "cln": (Ld, D), "cln_b": (Ld, D),
            "fc1": (Ld, D, Fd), "fc1_b": (Ld, Fd),
            "fc2": (Ld, Fd, D), "fc2_b": (Ld, D),
            "ln2": (Ld, D), "ln2_b": (Ld, D),
        })
        shapes = {
            "embed": (V, D),
            "logits_bias": (V,),
            "enc_pos": (P2, D), "dec_pos": (P2, D),
            "enc_ln_emb": (D,), "enc_ln_emb_b": (D,),
            "dec_ln_emb": (D,), "dec_ln_emb_b": (D,),
            "encoder": enc,
            "decoder": dec,
        }
        if self.pre_norm:
            shapes["enc_final_ln"] = (D,)
            shapes["enc_final_ln_b"] = (D,)
            shapes["dec_final_ln"] = (D,)
            shapes["dec_final_ln_b"] = (D,)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        """TP shards attention heads + FFN columns; all einsums are
        head- or column-parallel so GSPMD inserts one psum per
        wo/cwo/fc2 contraction."""
        m = "model"
        head_out = {"wq": P(None, None, m), "bq": P(None, m),
                    "wk": P(None, None, m), "bk": P(None, m),
                    "wv": P(None, None, m), "bv": P(None, m),
                    "wo": P(None, m, None), "bo": P()}
        ffn = {"fc1": P(None, None, m), "fc1_b": P(None, m),
               "fc2": P(None, m, None), "fc2_b": P()}

        def spec_for(node, prefix=""):
            out = {}
            for k, v in node.items():
                if isinstance(v, dict):
                    out[k] = spec_for(v)
                elif k in head_out:
                    out[k] = head_out[k]
                elif k.startswith("c") and k[1:] in head_out:
                    out[k] = head_out[k[1:]]
                elif k in ffn:
                    out[k] = ffn[k]
                else:
                    out[k] = P()
            return out

        return spec_for(self.param_shapes())

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.RandomState(seed)

        def walk(shapes):
            out = {}
            for k, v in shapes.items():
                if isinstance(v, dict):
                    out[k] = walk(v)
                else:
                    out[k] = (rng.standard_normal(v) * 0.02).astype(
                        np.float32)
            return out

        return walk(self.param_shapes())

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        d = "model.decoder.layers.{i}."
        return [
            (d + "self_attn.q_proj.weight", "decoder.wq", True),
            (d + "self_attn.q_proj.bias", "decoder.bq", False),
            (d + "self_attn.k_proj.weight", "decoder.wk", True),
            (d + "self_attn.k_proj.bias", "decoder.bk", False),
            (d + "self_attn.v_proj.weight", "decoder.wv", True),
            (d + "self_attn.v_proj.bias", "decoder.bv", False),
            (d + "self_attn.out_proj.weight", "decoder.wo", True),
            (d + "self_attn.out_proj.bias", "decoder.bo", False),
            (d + "self_attn_layer_norm.weight", "decoder.ln1", False),
            (d + "self_attn_layer_norm.bias", "decoder.ln1_b", False),
            (d + "encoder_attn.q_proj.weight", "decoder.cwq", True),
            (d + "encoder_attn.q_proj.bias", "decoder.cbq", False),
            (d + "encoder_attn.k_proj.weight", "decoder.cwk", True),
            (d + "encoder_attn.k_proj.bias", "decoder.cbk", False),
            (d + "encoder_attn.v_proj.weight", "decoder.cwv", True),
            (d + "encoder_attn.v_proj.bias", "decoder.cbv", False),
            (d + "encoder_attn.out_proj.weight", "decoder.cwo", True),
            (d + "encoder_attn.out_proj.bias", "decoder.cbo", False),
            (d + "encoder_attn_layer_norm.weight", "decoder.cln", False),
            (d + "encoder_attn_layer_norm.bias", "decoder.cln_b", False),
            (d + "fc1.weight", "decoder.fc1", True),
            (d + "fc1.bias", "decoder.fc1_b", False),
            (d + "fc2.weight", "decoder.fc2", True),
            (d + "fc2.bias", "decoder.fc2_b", False),
            (d + "final_layer_norm.weight", "decoder.ln2", False),
            (d + "final_layer_norm.bias", "decoder.ln2_b", False),
        ]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("model.shared.weight", "embed", False),
            ("model.encoder.embed_tokens.weight", "embed", False),
            ("model.decoder.embed_tokens.weight", "embed", False),
            ("final_logits_bias", "logits_bias", False),
            ("model.encoder.embed_positions.weight", "enc_pos", False),
            ("model.decoder.embed_positions.weight", "dec_pos", False),
            ("model.encoder.layernorm_embedding.weight", "enc_ln_emb",
             False),
            ("model.encoder.layernorm_embedding.bias", "enc_ln_emb_b",
             False),
            ("model.decoder.layernorm_embedding.weight", "dec_ln_emb",
             False),
            ("model.decoder.layernorm_embedding.bias", "dec_ln_emb_b",
             False),
        ] + ([
            ("model.encoder.layer_norm.weight", "enc_final_ln", False),
            ("model.encoder.layer_norm.bias", "enc_final_ln_b", False),
            ("model.decoder.layer_norm.weight", "dec_final_ln", False),
            ("model.decoder.layer_norm.bias", "dec_final_ln_b", False),
        ] if self.pre_norm else [])

    def hf_aux_mappings(self) -> List:
        e = "model.encoder.layers.{i}."
        pairs = [
            (e + "self_attn.q_proj.weight", "encoder.wq", True),
            (e + "self_attn.q_proj.bias", "encoder.bq", False),
            (e + "self_attn.k_proj.weight", "encoder.wk", True),
            (e + "self_attn.k_proj.bias", "encoder.bk", False),
            (e + "self_attn.v_proj.weight", "encoder.wv", True),
            (e + "self_attn.v_proj.bias", "encoder.bv", False),
            (e + "self_attn.out_proj.weight", "encoder.wo", True),
            (e + "self_attn.out_proj.bias", "encoder.bo", False),
            (e + "self_attn_layer_norm.weight", "encoder.ln1", False),
            (e + "self_attn_layer_norm.bias", "encoder.ln1_b", False),
            (e + "fc1.weight", "encoder.fc1", True),
            (e + "fc1.bias", "encoder.fc1_b", False),
            (e + "fc2.weight", "encoder.fc2", True),
            (e + "fc2.bias", "encoder.fc2_b", False),
            (e + "final_layer_norm.weight", "encoder.ln2", False),
            (e + "final_layer_norm.bias", "encoder.ln2_b", False),
        ]
        return [(t, path, tr, self.enc_layers) for t, path, tr in pairs]

    def finalize_params(self, params: Dict[str, Any]) -> None:
        if "logits_bias" not in params:  # buffer often absent / zeros
            params["logits_bias"] = np.zeros((self.vocab_size,),
                                             np.float32)
        lb = params["logits_bias"]
        if lb.ndim == 2:  # stored [1, V]
            params["logits_bias"] = lb.reshape(-1)

    # ---- encoder program --------------------------------------------------

    def encode_and_write_cross(self, params, cross_kv, tokens, positions,
                               slot_mapping, enc_len, embeds=None,
                               embeds_mask=None):
        """Encoder forward over ONE padded sequence + cross-K/V scatter
        for every decoder layer. tokens/positions/slot_mapping [Ep];
        enc_len i32[1]. Returns the updated (donated) cross cache."""
        D, H, Dh = self.hidden_size, self.enc_heads, \
            self.hidden_size // self.enc_heads
        x = params["embed"][tokens].astype(self.dtype)
        if self.scale_embedding:
            x = x * jnp.asarray(math.sqrt(D), self.dtype)
        if embeds is not None:
            x = jnp.where(embeds_mask[:, None],
                          embeds.astype(self.dtype), x)
        x = x + params["enc_pos"][positions + self.pos_offset].astype(
            self.dtype)
        x = _ln(x, params["enc_ln_emb"], params["enc_ln_emb_b"]).astype(
            self.dtype)
        E = x.shape[0]
        key_ok = jnp.arange(E) < enc_len[0]

        def self_attn(h, lp):
            q = ((h @ lp["wq"] + lp["bq"]) * self.sm_scale).reshape(
                E, H, Dh).astype(jnp.float32)
            k = (h @ lp["wk"] + lp["bk"]).reshape(E, H, Dh).astype(
                jnp.float32)
            v = (h @ lp["wv"] + lp["bv"]).reshape(E, H, Dh).astype(
                jnp.float32)
            scores = jnp.einsum("qhd,khd->hqk", q, k)
            scores = jnp.where(key_ok[None, None, :], scores, _NEG)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(E, D)
            return o.astype(self.dtype) @ lp["wo"] + lp["bo"]

        def ffn(h, lp):
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            return h @ lp["fc2"] + lp["fc2_b"]

        def enc_block(x, lp):
            x32 = x.astype(jnp.float32)
            if self.pre_norm:
                o = self_attn(
                    _ln(x32, lp["ln1"], lp["ln1_b"]).astype(self.dtype),
                    lp)
                x32 = x32 + o.astype(jnp.float32)
                h = ffn(_ln(x32, lp["ln2"], lp["ln2_b"]).astype(
                    self.dtype), lp)
                x32 = x32 + h.astype(jnp.float32)
            else:
                o = self_attn(x, lp)
                x32 = _ln(x32 + o.astype(jnp.float32), lp["ln1"],
                          lp["ln1_b"])
                h = ffn(x32.astype(self.dtype), lp)
                x32 = _ln(x32 + h.astype(jnp.float32), lp["ln2"],
                          lp["ln2_b"])
            return x32.astype(self.dtype), None

        x, _ = jax.lax.scan(enc_block, x, params["encoder"])
        if self.pre_norm:
            x = _ln(x.astype(jnp.float32), params["enc_final_ln"],
                    params["enc_final_ln_b"]).astype(self.dtype)

        # Cross K/V for every decoder layer, scattered into the pages.
        from aphrodite_tpu.models.layers import flatten_kv_pages

        flat, L, Pg = flatten_kv_pages(cross_kv)
        page_size = cross_kv.shape[2]
        KVh = self.num_heads

        def write_layer(flat, sc):
            lidx, lp = sc
            k = (x @ lp["cwk"] + lp.get("cbk", 0.0)).reshape(
                E, KVh, self.head_dim)
            v = (x @ lp["cwv"] + lp["cbv"]).reshape(E, KVh, self.head_dim)
            slots = slot_mapping + lidx * (Pg * page_size)
            flat = write_kv(flat, k.astype(cross_kv.dtype),
                            v.astype(cross_kv.dtype), slots)
            return flat, None

        flat, _ = jax.lax.scan(
            write_layer, flat,
            (jnp.arange(L, dtype=jnp.int32), params["decoder"]))
        return flat.reshape(cross_kv.shape)

    # ---- decoder forward ---------------------------------------------------

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
        D, H, Dh = self.hidden_size, self.num_heads, self.head_dim
        T = batch.token_ids.shape[0]
        S = batch.kv_lens.shape[0]
        x = params["embed"][batch.token_ids].astype(self.dtype)
        if self.scale_embedding:
            x = x * jnp.asarray(math.sqrt(D), self.dtype)
        x = x + params["dec_pos"][batch.positions +
                                  self.pos_offset].astype(self.dtype)
        if self.ln_embedding:
            x = _ln(x, params["dec_ln_emb"],
                    params["dec_ln_emb_b"]).astype(self.dtype)

        # Token -> sequence row mapping for the cross gather.
        if batch.cu_q_lens is not None:
            seq_of = jnp.searchsorted(batch.cu_q_lens[1:],
                                      jnp.arange(T, dtype=jnp.int32),
                                      side="right").astype(jnp.int32)
            seq_of = jnp.minimum(seq_of, S - 1)
        else:
            seq_of = jnp.arange(T, dtype=jnp.int32)
        enc_lens_t = batch.cross_kv_lens[seq_of]  # [T]

        def self_attn(xd, lp, pages, slots, pidx):
            q = ((xd @ lp["wq"] + lp["bq"]) * self.sm_scale).reshape(
                T, H, Dh).astype(self.dtype)
            k = (xd @ lp["wk"] + lp.get("bk", 0.0)).reshape(
                T, H, Dh).astype(
                self.dtype)
            v = (xd @ lp["wv"] + lp["bv"]).reshape(T, H, Dh).astype(
                self.dtype)
            pages = write_kv(pages, k, v, slots)
            attn = ragged_paged_attention(
                q, pages, batch.kv_lens, pidx, batch.cu_q_lens,
                batch.num_seqs, sm_scale=1.0, mesh=mesh)
            return attn.reshape(T, D) @ lp["wo"] + lp["bo"], pages

        def cross_attn(xd, lp, cross_layer):
            cq = ((xd @ lp["cwq"] + lp["cbq"]) * self.sm_scale).reshape(
                T, H, Dh).astype(jnp.float32)
            kv = cross_layer[batch.cross_page_indices]
            # [S, np, page, 2H, Dh] -> [S, N, 2H, Dh]
            kv = kv.reshape(S, -1, 2 * H, Dh).astype(jnp.float32)
            # write_kv interleaves K/V per head on the combined axis.
            ck = kv[:, :, 0::2][seq_of]  # [T, N, H, Dh]
            cv = kv[:, :, 1::2][seq_of]
            N = ck.shape[1]
            scores = jnp.einsum("thd,tnhd->thn", cq, ck)
            ok = jnp.arange(N)[None, :] < enc_lens_t[:, None]
            scores = jnp.where(ok[:, None, :], scores, _NEG)
            cattn = jax.nn.softmax(scores, axis=-1)
            co = jnp.einsum("thn,tnhd->thd", cattn, cv).reshape(T, D)
            return co.astype(self.dtype) @ lp["cwo"] + lp["cbo"]

        def ffn(xd, lp):
            h = jax.nn.gelu(xd @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            return h @ lp["fc2"] + lp["fc2_b"]

        def layer_fn(x, pages, slots, pidx, sc):
            lp, cross_layer = sc
            x32 = x.astype(jnp.float32)
            if self.pre_norm:
                h = _ln(x32, lp["ln1"], lp["ln1_b"]).astype(self.dtype)
                o, pages = self_attn(h, lp, pages, slots, pidx)
                x32 = x32 + o.astype(jnp.float32)
                h = _ln(x32, lp["cln"], lp["cln_b"]).astype(self.dtype)
                x32 = x32 + cross_attn(h, lp, cross_layer).astype(
                    jnp.float32)
                h = _ln(x32, lp["ln2"], lp["ln2_b"]).astype(self.dtype)
                x32 = x32 + ffn(h, lp).astype(jnp.float32)
            else:
                o, pages = self_attn(x, lp, pages, slots, pidx)
                x32 = _ln(x32 + o.astype(jnp.float32), lp["ln1"],
                          lp["ln1_b"])
                co = cross_attn(x32.astype(self.dtype), lp, cross_layer)
                x32 = _ln(x32 + co.astype(jnp.float32), lp["cln"],
                          lp["cln_b"])
                h = ffn(x32.astype(self.dtype), lp)
                x32 = _ln(x32 + h.astype(jnp.float32), lp["ln2"],
                          lp["ln2_b"])
            return x32.astype(self.dtype), pages

        x, new_kv = scan_layers_paged(
            layer_fn, x, kv_pages, (params["decoder"], cross_kv), batch)
        if self.pre_norm:
            x = _ln(x.astype(jnp.float32), params["dec_final_ln"],
                    params["dec_final_ln_b"]).astype(self.dtype)
        return new_kv, x

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        logits = hidden.astype(jnp.float32) @ \
            params["embed"].astype(jnp.float32).T
        return logits + params["logits_bias"].astype(jnp.float32)


class MBartForConditionalGeneration(BartForConditionalGeneration):
    """mBART: BART weights/layout with PRE-norm layers and a final
    layer_norm on both stacks (reference models/bart.py mbart variant;
    HF MBartModel). Language-token decoder starts are the caller's job
    (pass decoder_prompt_token_ids=[eos, lang_code])."""

    pre_norm = True
