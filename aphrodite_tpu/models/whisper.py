"""Whisper ASR (speech-to-text) on the encoder-decoder runner.

Beyond the reference snapshot's inventory — speech transcription rides
the same cross-KV pages BART/T5 pioneered: the AUDIO encoder (the
whisper conv+transformer stack shared with Ultravox/Qwen2-Audio) runs
once per request over the full 30s window (HF pads short clips with
silence and attends everything — no masking) and scatters every
decoder layer's cross K/V; the decoder is the BART stack flipped to
whisper's conventions (pre-norm with a final layer_norm, no embedding
LayerNorm, no k-proj biases, zero position offset, head tied to the
token embedding).

Requests put the DECODER prompt (<|startoftranscript|><|lang|><|task|>
...) in prompt_token_ids and the log-mel features [num_mel_bins,
frames] under multi_modal_data={"audio": ...}.
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.bart import BartForConditionalGeneration, _ln
from aphrodite_tpu.models.layers import flatten_kv_pages
from aphrodite_tpu.ops.kv_cache import write_kv


class WhisperForConditionalGeneration(BartForConditionalGeneration):
    pre_norm = True
    ln_embedding = False
    k_bias = False
    encoder_takes_audio = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        hf.setdefault("encoder_layers", hf.get("encoder_layers", 32))
        super().__init__(model_config, parallel_config)
        self.pos_offset = 0
        # The decoder position table is max_target_positions long.
        self.max_position = int(hf.get("max_target_positions", 448))
        self.tie_word_embeddings = True
        self.a_mels = int(hf.get("num_mel_bins", 128))
        self.a_max_pos = int(hf.get("max_source_positions", 1500))
        self.a_hidden = self.hidden_size  # d_model shared
        self.a_heads = int(hf.get("encoder_attention_heads",
                                  self.num_heads))
        self.a_ffn = int(hf.get("encoder_ffn_dim", self.dec_ffn))
        self.a_layers = self.enc_layers

    def encoder_feature_len(self, mel) -> int:
        # Full-window encoding: 1500 frames regardless of clip length.
        return self.a_max_pos

    # ---- params ----------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        for k in ("enc_pos", "enc_ln_emb", "enc_ln_emb_b", "encoder",
                  "enc_final_ln", "enc_final_ln_b", "logits_bias",
                  "dec_ln_emb", "dec_ln_emb_b"):
            shapes.pop(k, None)
        shapes["decoder"].pop("bk", None)
        shapes["decoder"].pop("cbk", None)
        E, La, F = self.a_hidden, self.a_layers, self.a_ffn
        shapes["audio"] = {
            "conv1_w": (E, self.a_mels, 3), "conv1_b": (E,),
            "conv2_w": (E, E, 3), "conv2_b": (E,),
            "pos": (self.a_max_pos, E),
            "layers": {
                "ln1": (La, E), "ln1_b": (La, E),
                "wq": (La, E, E), "bq": (La, E),
                "wk": (La, E, E),
                "wv": (La, E, E), "bv": (La, E),
                "wo": (La, E, E), "bo": (La, E),
                "ln2": (La, E), "ln2_b": (La, E),
                "fc1": (La, E, F), "fc1_b": (La, F),
                "fc2": (La, F, E), "fc2_b": (La, E),
            },
            "final_ln": (E,), "final_ln_b": (E,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        from jax.sharding import PartitionSpec as P

        specs = super().param_shardings()  # bart's sharded text specs
        m = "model"
        specs["audio"] = {
            "conv1_w": P(), "conv1_b": P(),
            "conv2_w": P(), "conv2_b": P(),
            "pos": P(),
            "layers": {
                "ln1": P(), "ln1_b": P(),
                "wq": P(None, None, m), "bq": P(None, m),
                "wk": P(None, None, m),
                "wv": P(None, None, m), "bv": P(None, m),
                "wo": P(None, m, None), "bo": P(),
                "ln2": P(), "ln2_b": P(),
                "fc1": P(None, None, m), "fc1_b": P(None, m),
                "fc2": P(None, m, None), "fc2_b": P(),
            },
            "final_ln": P(), "final_ln_b": P(),
        }
        # Dropped text params (bart keys whisper removes) are already
        # absent from param_shapes; prune their stale spec entries.
        shapes = self.param_shapes()

        def prune(sp, sh):
            return {k: (prune(v, sh[k]) if isinstance(v, dict) else v)
                    for k, v in sp.items() if k in sh}

        return prune(specs, shapes)

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = super().hf_param_mappings()
        return [m for m in maps
                if m[1] not in ("decoder.bk", "decoder.cbk")]

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return [
            ("model.decoder.embed_tokens.weight", "embed", False),
            ("model.decoder.embed_positions.weight", "dec_pos", False),
            ("model.decoder.layer_norm.weight", "dec_final_ln", False),
            ("model.decoder.layer_norm.bias", "dec_final_ln_b", False),
        ]

    def hf_aux_mappings(self) -> List:
        lay = "model.encoder.layers.{i}."
        pairs = [
            (lay + "self_attn_layer_norm.weight", "audio.layers.ln1",
             False),
            (lay + "self_attn_layer_norm.bias", "audio.layers.ln1_b",
             False),
            (lay + "self_attn.q_proj.weight", "audio.layers.wq", True),
            (lay + "self_attn.q_proj.bias", "audio.layers.bq", False),
            (lay + "self_attn.k_proj.weight", "audio.layers.wk", True),
            (lay + "self_attn.v_proj.weight", "audio.layers.wv", True),
            (lay + "self_attn.v_proj.bias", "audio.layers.bv", False),
            (lay + "self_attn.out_proj.weight", "audio.layers.wo", True),
            (lay + "self_attn.out_proj.bias", "audio.layers.bo", False),
            (lay + "final_layer_norm.weight", "audio.layers.ln2", False),
            (lay + "final_layer_norm.bias", "audio.layers.ln2_b", False),
            (lay + "fc1.weight", "audio.layers.fc1", True),
            (lay + "fc1.bias", "audio.layers.fc1_b", False),
            (lay + "fc2.weight", "audio.layers.fc2", True),
            (lay + "fc2.bias", "audio.layers.fc2_b", False),
        ]
        out = [(t, p, tr, self.a_layers) for t, p, tr in pairs]
        for name, path, tr in [
            ("model.encoder.conv1.weight", "audio.conv1_w", False),
            ("model.encoder.conv1.bias", "audio.conv1_b", False),
            ("model.encoder.conv2.weight", "audio.conv2_w", False),
            ("model.encoder.conv2.bias", "audio.conv2_b", False),
            ("model.encoder.embed_positions.weight", "audio.pos", False),
            ("model.encoder.layer_norm.weight", "audio.final_ln", False),
            ("model.encoder.layer_norm.bias", "audio.final_ln_b", False),
        ]:
            out.append((name, path, tr, 1))
        return out

    def finalize_params(self, params: Dict[str, Any]) -> None:
        pass  # no logits_bias / conv reshapes needed

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        return hidden.astype(jnp.float32) @ \
            params["embed"].astype(jnp.float32).T

    # ---- audio encoder + cross write --------------------------------------

    def encode_audio_and_write_cross(self, params, cross_kv, mel,
                                     slot_mapping):
        """[mels, 2*max_source_positions] full-window log-mel -> encoder
        states -> every decoder layer's cross K/V scattered into the
        cross pages."""
        f32 = jnp.float32
        ap = params["audio"]
        E, heads = self.a_hidden, self.a_heads
        D = E // heads
        x = mel.astype(f32)[None]
        x = jax.lax.conv_general_dilated(
            x, ap["conv1_w"].astype(f32), (1,), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        x = jax.nn.gelu(x + ap["conv1_b"].astype(f32)[None, :, None],
                        approximate=False)
        x = jax.lax.conv_general_dilated(
            x, ap["conv2_w"].astype(f32), (2,), [(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        x = jax.nn.gelu(x + ap["conv2_b"].astype(f32)[None, :, None],
                        approximate=False)
        x = x[0].T  # [1500, E]
        T = x.shape[0]
        x = x + ap["pos"].astype(f32)[:T]
        scale = 1.0 / math.sqrt(D)

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _ln(x, lp["ln1"], lp["ln1_b"])
            q = ((h @ lp["wq"] + lp["bq"]) * scale).reshape(T, heads, D)
            k = (h @ lp["wk"]).reshape(T, heads, D)
            v = (h @ lp["wv"] + lp["bv"]).reshape(T, heads, D)
            attn = jax.nn.softmax(
                jnp.einsum("qhd,khd->hqk", q, k), axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(T, E)
            x = x + o @ lp["wo"] + lp["bo"]
            h = _ln(x, lp["ln2"], lp["ln2_b"])
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            return x + h @ lp["fc2"] + lp["fc2_b"], None

        x, _ = jax.lax.scan(block, x, ap["layers"])
        x = _ln(x, ap["final_ln"].astype(f32),
                ap["final_ln_b"].astype(f32))
        x = x.astype(self.dtype)

        flat, L, Pg = flatten_kv_pages(cross_kv)
        page_size = cross_kv.shape[2]
        KVh = self.num_heads

        def write_layer(flat, sc):
            lidx, lp = sc
            k = (x @ lp["cwk"]).reshape(T, KVh, self.head_dim)
            v = (x @ lp["cwv"] + lp["cbv"]).reshape(T, KVh,
                                                    self.head_dim)
            slots = slot_mapping + lidx * (Pg * page_size)
            return write_kv(flat, k.astype(cross_kv.dtype),
                            v.astype(cross_kv.dtype), slots), None

        flat, _ = jax.lax.scan(
            write_layer, flat,
            (jnp.arange(L, dtype=jnp.int32), params["decoder"]))
        return flat.reshape(cross_kv.shape)
