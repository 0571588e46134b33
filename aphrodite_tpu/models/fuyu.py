"""Fuyu-8B: raw image patches projected straight into a Persimmon LM
(no vision tower).

Reference: aphrodite/modeling/models/fuyu.py (FuyuForCausalLM).
The image is resized/padded to patch multiples, cut into raster-order
patches flattened as (patch_h, patch_w, channels) — HF
FuyuImageProcessor.patchify_image — and each patch runs through ONE
linear (vision_embed_tokens) into the text hidden size. The prompt
layout per image is nrows repetitions of (ncols image tokens + one
NEWLINE token, ids 71011/71019, fuyu.py:48-49,96-105); features splice
only into the image-token runs, the newline tokens embed as normal
vocabulary.

Input item per image: [3, H, W] pixels (H, W multiples of patch_size),
or {"image_patches": f32[n, 3*p*p], "ncols": c, "nrows": r} for
pre-patchified processor output.
"""

from typing import Any, Dict, List, Tuple

import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.persimmon import PersimmonForCausalLM

_IMAGE_TOKEN_ID = 71011
_NEWLINE_TOKEN_ID = 71019


class FuyuForCausalLM(PersimmonForCausalLM):
    is_multimodal = True

    def __init__(self, model_config, parallel_config=None) -> None:
        hf = model_config.hf_config
        # FuyuConfig serializes the LM vocab as _vocab_size / nests it
        # in text_config; hoist for the base accessors.
        if "vocab_size" not in hf:
            hf["vocab_size"] = int(
                (hf.get("text_config") or {}).get("vocab_size")
                or hf.get("_vocab_size"))
        super().__init__(model_config, parallel_config)
        self.patch = int(hf.get("patch_size", 30))
        self.channels = int(hf.get("num_channels", 3))
        self.image_token_index = int(
            hf.get("image_token_id", _IMAGE_TOKEN_ID))
        self.newline_token_id = int(
            hf.get("image_newline_id", _NEWLINE_TOKEN_ID))

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        F = self.channels * self.patch * self.patch
        shapes["vision_embed"] = (F, self.hidden_size)
        shapes["vision_embed_b"] = (self.hidden_size,)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["vision_embed"] = P()
        specs["vision_embed_b"] = P()
        return specs

    def _with_lm_prefix(self, maps):
        """HF Fuyu nests the Persimmon LM: pre-4.52 checkpoints use
        language_model.model.*, post-4.52 model.language_model.*;
        accept both plus the bare persimmon naming."""
        out = []
        for hf_name, path, transpose in maps:
            out.append((hf_name, path, transpose))
            out.append(("language_model." + hf_name, path, transpose))
            if hf_name.startswith("model."):
                out.append((hf_name.replace(
                    "model.", "model.language_model.", 1), path,
                    transpose))
        return out

    def hf_param_mappings(self) -> List[Tuple[str, str, bool]]:
        return self._with_lm_prefix(super().hf_param_mappings())

    def hf_split_mappings(self):
        out = []
        for hf_name, slices, transpose in super().hf_split_mappings():
            out.append((hf_name, slices, transpose))
            out.append(("language_model." + hf_name, slices, transpose))
            if hf_name.startswith("model."):
                out.append((hf_name.replace(
                    "model.", "model.language_model.", 1), slices,
                    transpose))
        return out

    def hf_global_mappings(self) -> List[Tuple[str, str, bool]]:
        maps = self._with_lm_prefix(super().hf_global_mappings())
        maps += [
            ("vision_embed_tokens.weight", "vision_embed", True),
            ("vision_embed_tokens.bias", "vision_embed_b", False),
            ("model.vision_embed_tokens.weight", "vision_embed", True),
            ("model.vision_embed_tokens.bias", "vision_embed_b", False),
        ]
        return maps

    # ---- vision ------------------------------------------------------

    def encode_images(self, params, patches):
        """patches f[B, n, 3*p*p] -> [B, n, H] (one linear)."""
        import jax.numpy as jnp

        w = params["vision_embed"].astype(jnp.float32)
        b = params["vision_embed_b"].astype(jnp.float32)
        return (patches.astype(jnp.float32) @ w + b).astype(self.dtype)

    @staticmethod
    def _patchify(px: np.ndarray, p: int) -> Tuple[np.ndarray, int, int]:
        """[3, H, W] -> raster patches [nr*nc, p*p*3] flattened in
        (ph, pw, C) order (HF FuyuImageProcessor.patchify_image)."""
        c, H, W = px.shape
        nr, nc = H // p, W // p
        x = px.reshape(c, nr, p, nc, p)
        x = x.transpose(1, 3, 2, 4, 0).reshape(nr * nc, p * p * c)
        return np.ascontiguousarray(x), nr, nc

    def _item_patches(self, item):
        if isinstance(item, dict):
            patches = np.asarray(item["image_patches"], np.float32)
            return patches, int(item["nrows"]), int(item["ncols"])
        px = np.asarray(item, np.float32)
        if px.ndim != 3 or px.shape[0] != self.channels:
            raise ValueError(f"fuyu expects [3, H, W] pixels or a "
                             f"patch dict; got {px.shape}")
        patches, nr, nc = self._patchify(px, self.patch)
        return patches, nr, nc

    def encode_image_item(self, params, item, tower_fn) -> np.ndarray:
        import jax.numpy as jnp

        patches, _, _ = self._item_patches(item)
        return np.asarray(tower_fn(params, jnp.asarray(patches[None]))[0],
                          np.float32)

    def expand_image_item(self, item, feats):
        """Token layout + per-row splice spans for one image."""
        _, nr, nc = self._item_patches(item)
        toks: List[int] = []
        spans = []
        for r in range(nr):
            spans.append((len(toks), feats[r * nc:(r + 1) * nc]))
            toks.extend([self.image_token_index] * nc)
            toks.append(self.newline_token_id)
        return toks, spans
