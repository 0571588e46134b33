"""Qwen2-Audio: whisper-style audio encoder + 2x average pool + linear
projector onto a Qwen2 text stack.

Beyond the reference's inventory (its audio model is Ultravox), but
free to serve here: the tower shares Ultravox's whisper layout plus
Qwen2Audio's in-encoder AvgPool1d(2) before the final layer norm (HF
modeling_qwen2_audio Qwen2AudioEncoder.forward). One jitted program per
mel-frame bucket; items are log-mel features [num_mel_bins, frames]
under the "audio" modality key.
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


class Qwen2AudioForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True
    modality = "audio"
    attention_bias = True  # Qwen2 text stack

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        a = dict(hf["audio_config"])
        self.a_hidden = int(a.get("d_model", 1280))
        self.a_layers = int(a.get("encoder_layers", 32))
        self.a_heads = int(a.get("encoder_attention_heads", 20))
        self.a_ffn = int(a.get("encoder_ffn_dim", 5120))
        self.a_mels = int(a.get("num_mel_bins", 128))
        self.a_max_pos = int(a.get("max_source_positions", 1500))
        self.image_token_index = int(hf.get("audio_token_index", 151646))
        self._audio_jit = None

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        E, La, F = self.a_hidden, self.a_layers, self.a_ffn
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
        shapes["projector"] = {"w": (E, self.hidden_size),
                               "b": (self.hidden_size,)}
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
        out = []
        for n, p, t in maps:
            out.append(("language_model." + n, p, t))
            if n.startswith("model."):
                out.append((n.replace("model.", "model.language_model.",
                                      1), p, t))
        return out

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm(super().hf_param_mappings())

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm(super().hf_global_mappings())

    def hf_aux_mappings(self) -> List:
        out = []
        for pre in ("", "model."):
            lay = pre + "audio_tower.layers.{i}."
            pairs = [
                (lay + "self_attn_layer_norm.weight", "audio.layers.ln1",
                 False),
                (lay + "self_attn_layer_norm.bias", "audio.layers.ln1_b",
                 False),
                (lay + "self_attn.q_proj.weight", "audio.layers.wq",
                 True),
                (lay + "self_attn.q_proj.bias", "audio.layers.bq",
                 False),
                (lay + "self_attn.k_proj.weight", "audio.layers.wk",
                 True),
                (lay + "self_attn.v_proj.weight", "audio.layers.wv",
                 True),
                (lay + "self_attn.v_proj.bias", "audio.layers.bv",
                 False),
                (lay + "self_attn.out_proj.weight", "audio.layers.wo",
                 True),
                (lay + "self_attn.out_proj.bias", "audio.layers.bo",
                 False),
                (lay + "final_layer_norm.weight", "audio.layers.ln2",
                 False),
                (lay + "final_layer_norm.bias", "audio.layers.ln2_b",
                 False),
                (lay + "fc1.weight", "audio.layers.fc1", True),
                (lay + "fc1.bias", "audio.layers.fc1_b", False),
                (lay + "fc2.weight", "audio.layers.fc2", True),
                (lay + "fc2.bias", "audio.layers.fc2_b", False),
            ]
            out += [(t, p, tr, self.a_layers) for t, p, tr in pairs]
            at = pre + "audio_tower."
            for name, path, tr in [
                (at + "conv1.weight", "audio.conv1_w", False),
                (at + "conv1.bias", "audio.conv1_b", False),
                (at + "conv2.weight", "audio.conv2_w", False),
                (at + "conv2.bias", "audio.conv2_b", False),
                (at + "embed_positions.weight", "audio.pos", False),
                (at + "layer_norm.weight", "audio.final_ln", False),
                (at + "layer_norm.bias", "audio.final_ln_b", False),
                (pre + "multi_modal_projector.linear.weight",
                 "projector.w", True),
                (pre + "multi_modal_projector.linear.bias",
                 "projector.b", False),
            ]:
                out.append((name, path, tr, 1))
        return out

    # ---- audio tower ---------------------------------------------------

    def _audio_forward(self, params, mel, n_frames):
        """[mels, Fpad] -> [T_pooled, text_H] (fp32, HF-exact for the
        real frames; padding masked + sliced on host)."""
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
        x = x[0].T  # [T, E]
        T = x.shape[0]
        x = x + ap["pos"].astype(f32)[:T]
        n_tok = (n_frames[0] - 1) // 2 + 1
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
        # AvgPool1d(kernel=2, stride=2) over time, then final LN
        # (Qwen2AudioEncoder.forward).
        x = x[:T - T % 2].reshape(-1, 2, E).mean(axis=1)
        x = _ln(x, ap["final_ln"].astype(f32),
                ap["final_ln_b"].astype(f32))
        pj = params["projector"]
        return x @ pj["w"].astype(f32) + pj["b"].astype(f32)

    def num_item_tokens(self, item) -> int:
        F = np.asarray(item).shape[1]
        n_tok = (F - 1) // 2 + 1
        return (n_tok - 2) // 2 + 1

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        mel = np.asarray(item, np.float32)
        if mel.ndim != 2 or mel.shape[0] != self.a_mels:
            raise ValueError(
                "Qwen2-Audio items must be log-mel features "
                f"[{self.a_mels}, frames]; got {mel.shape}")
        F = mel.shape[1]
        max_f = self.a_max_pos * 2
        if F > max_f:
            raise ValueError(
                f"audio longer than the encoder window: {F} > {max_f}")
        bucket = 320
        Fp = min(-F % bucket + F, max_f)
        if Fp % 4:  # post-conv2 length must stay pool-aligned
            Fp += 4 - Fp % 4
        if Fp > F:
            mel = np.pad(mel, ((0, 0), (0, Fp - F)))
        if self._audio_jit is None:
            self._audio_jit = jax.jit(self._audio_forward)
        out = np.asarray(self._audio_jit(params, jnp.asarray(mel),
                                         jnp.asarray([F], np.int32)))
        n_tok = (F - 1) // 2 + 1
        n_pooled = (n_tok - 2) // 2 + 1
        return out[:n_pooled].astype(np.float32)
