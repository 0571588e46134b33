"""Ultravox: Whisper audio encoder + frame-stacking SwiGLU projector
onto a Llama text stack.

Reference: aphrodite/modeling/models/ultravox.py. TPU design mirrors
the vision towers: the whole audio path (mel features -> whisper conv +
pre-norm encoder -> stack-by-8 projector) runs ONCE per audio clip at
request-add as one jitted program per frame bucket; the projected
features splice at audio-placeholder positions through the SAME
embeds_override machinery the vision models use (the engine's modality
key is "audio" here).

Audio items are precomputed log-mel features [num_mel_bins, frames]
(WhisperFeatureExtractor output); frames may be shorter than whisper's
30s window (the reference's ModifiedWhisperEncoder relaxation —
position embeddings slice to the actual length, ultravox.py:239).
"""

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rms(x, w, eps=1e-6):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


class UltravoxModel(LlamaForCausalLM):
    is_multimodal = True
    modality = "audio"

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        a = dict(hf["audio_config"])
        self.a_hidden = int(a.get("d_model", a.get("hidden_size", 1280)))
        self.a_layers = int(a.get("encoder_layers", 32))
        self.a_heads = int(a.get("encoder_attention_heads", 20))
        self.a_ffn = int(a.get("encoder_ffn_dim", 5120))
        self.a_mels = int(a.get("num_mel_bins", 128))
        self.a_max_pos = int(a.get("max_source_positions", 1500))
        self.stack_factor = int(hf.get("stack_factor", 8))
        self.projector_act = str(hf.get("projector_act", "swiglu"))
        # Reference hardcodes the llama3 reserved token (ultravox.py:43).
        self.image_token_index = int(hf.get("audio_token_index", 128002))
        self._audio_jit = None

    # ---- params ------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        E, La, F = self.a_hidden, self.a_layers, self.a_ffn
        sd = E * self.stack_factor
        mid = self.hidden_size
        out_in = mid // 2 if self.projector_act == "swiglu" else mid
        shapes["audio"] = {
            "conv1_w": (E, self.a_mels, 3), "conv1_b": (E,),
            "conv2_w": (E, E, 3), "conv2_b": (E,),
            "pos": (self.a_max_pos, E),
            "layers": {
                "ln1": (La, E), "ln1_b": (La, E),
                "wq": (La, E, E), "bq": (La, E),
                "wk": (La, E, E),  # whisper k_proj has no bias
                "wv": (La, E, E), "bv": (La, E),
                "wo": (La, E, E), "bo": (La, E),
                "ln2": (La, E), "ln2_b": (La, E),
                "fc1": (La, E, F), "fc1_b": (La, F),
                "fc2": (La, F, E), "fc2_b": (La, E),
            },
            "final_ln": (E,), "final_ln_b": (E,),
        }
        shapes["projector"] = {
            "ln_pre": (sd,),
            "w1": (sd, mid),
            "w2": (out_in, self.hidden_size),
            "ln_post": (self.hidden_size,),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()

        def rep(node):
            return {k: (rep(v) if isinstance(v, dict) else P())
                    for k, v in node.items()}

        mine = self.param_shapes()
        specs["audio"] = rep(mine["audio"])
        specs["projector"] = rep(mine["projector"])
        return specs

    def _with_lm(self, maps):
        return [("language_model." + n, p, t) for n, p, t in maps]

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List:
        lay = "audio_tower.layers.{i}."
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
            ("audio_tower.conv1.weight", "audio.conv1_w", False),
            ("audio_tower.conv1.bias", "audio.conv1_b", False),
            ("audio_tower.conv2.weight", "audio.conv2_w", False),
            ("audio_tower.conv2.bias", "audio.conv2_b", False),
            ("audio_tower.embed_positions.weight", "audio.pos", False),
            ("audio_tower.layer_norm.weight", "audio.final_ln", False),
            ("audio_tower.layer_norm.bias", "audio.final_ln_b", False),
            ("multi_modal_projector.ln_pre.weight", "projector.ln_pre",
             False),
            ("multi_modal_projector.linear_1.weight", "projector.w1",
             True),
            ("multi_modal_projector.linear_2.weight", "projector.w2",
             True),
            ("multi_modal_projector.ln_post.weight", "projector.ln_post",
             False),
        ]:
            out.append((name, path, tr, 1))
        return out

    # ---- audio tower ---------------------------------------------------

    def _audio_forward(self, params, mel, n_frames):
        """[mels, Fpad] log-mel features -> [Fpad/2/stack, text_H]
        projected audio embeddings (fp32, whisper-exact for the real
        frames; padding is masked out of attention and sliced off on
        host)."""
        f32 = jnp.float32
        ap = params["audio"]
        E, heads = self.a_hidden, self.a_heads
        D = E // heads
        x = mel.astype(f32)[None]  # [1, mels, F]
        # conv1 k=3 s=1 p=1, conv2 k=3 s=2 p=1 over time, gelu after each.
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
        x = x[0].T  # [T, E]
        T = x.shape[0]
        x = x + ap["pos"].astype(f32)[:T]
        n_tok = (n_frames[0] + 1) // 2  # post-conv2 real length
        key_ok = jnp.arange(T) < n_tok
        scale = 1.0 / math.sqrt(D)

        def block(x, lp):
            lp = jax.tree.map(lambda a: a.astype(f32), lp)
            h = _ln(x, lp["ln1"], lp["ln1_b"])
            q = ((h @ lp["wq"] + lp["bq"]) * scale).reshape(T, heads, D)
            k = (h @ lp["wk"]).reshape(T, heads, D)
            v = (h @ lp["wv"] + lp["bv"]).reshape(T, heads, D)
            scores = jnp.einsum("qhd,khd->hqk", q, k)
            scores = jnp.where(key_ok[None, None, :], scores, -1e30)
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(T, E)
            x = x + o @ lp["wo"] + lp["bo"]
            h = _ln(x, lp["ln2"], lp["ln2_b"])
            h = jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"],
                            approximate=False)
            return x + h @ lp["fc2"] + lp["fc2_b"], None

        x, _ = jax.lax.scan(block, x, ap["layers"])
        x = _ln(x, ap["final_ln"].astype(f32),
                ap["final_ln_b"].astype(f32))
        # The reference zero-pads the EMBEDDINGS to a stack_factor
        # multiple (StackAudioFrames); mirror by zeroing padded rows so
        # a partly-real stack group matches exactly.
        x = jnp.where(key_ok[:, None], x, 0.0)
        # Projector: stack stack_factor frames, RMS, swiglu MLP, RMS.
        sf = self.stack_factor
        x = x.reshape(T // sf, sf * E)
        pj = params["projector"]
        x = _rms(x, pj["ln_pre"].astype(f32))
        x = x @ pj["w1"].astype(f32)
        if self.projector_act == "swiglu":
            # FlippedSiluAndMul: silu on the SECOND half, gate the first.
            x1, x2 = jnp.split(x, 2, axis=-1)
            x = jax.nn.silu(x2) * x1
        else:
            x = jax.nn.gelu(x, approximate=False)
        x = x @ pj["w2"].astype(f32)
        return _rms(x, pj["ln_post"].astype(f32))

    def num_item_tokens(self, item) -> int:
        F = np.asarray(item).shape[1]
        return int(math.ceil(((F + 1) // 2) / self.stack_factor))

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        mel = np.asarray(item, np.float32)
        if mel.ndim != 2 or mel.shape[0] != self.a_mels:
            raise ValueError(
                "Ultravox audio items must be log-mel features "
                f"[{self.a_mels}, frames]; got {mel.shape}")
        F = mel.shape[1]
        max_f = self.a_max_pos * 2
        if F > max_f:
            raise ValueError(
                f"audio longer than whisper's window: {F} > {max_f} "
                "mel frames (chunk the audio)")
        sf2 = self.stack_factor * 2
        # Pad so post-conv2 length is a stack_factor multiple, bucketed
        # to bound recompiles.
        bucket = max(sf2, 320)
        Fp = min(-F % bucket + F, max_f)
        if Fp < F or Fp % sf2:
            Fp = -F % sf2 + F
        if Fp > F:
            mel = np.pad(mel, ((0, 0), (0, Fp - F)))
        if self._audio_jit is None:
            self._audio_jit = jax.jit(self._audio_forward)
        out = np.asarray(self._audio_jit(params, jnp.asarray(mel),
                                         jnp.asarray([F], np.int32)))
        n_tok = int(math.ceil((F + 1) // 2 / self.stack_factor))
        return out[:n_tok].astype(np.float32)
