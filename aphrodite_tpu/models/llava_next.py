"""LLaVA-NeXT (LLaVA-1.6): anyres tiled vision input on the LLaVA
stack.

Reference: aphrodite/modeling/models/llava_next.py
(LlavaNextForConditionalGeneration). The image is preprocessed (by the
HF processor, outside the engine) into 1 base tile + an anyres grid of
tiles, all at the tower's native resolution; every tile runs the CLIP
tower + projector, and the features are re-assembled spatially
("spatial_unpad", llava_next.py:415-480): grid tiles are laid out as
one big patch-grid image, the padding introduced by aspect-preserving
resize is sliced off (transformers unpad_image), a learned
image_newline embedding is appended to each row, and the base tile's
features are prepended.

TPU-native split: the tower (the FLOPs) runs as one jitted program
over the tile batch; the merge — pure indexing on a few hundred
vectors, shape-dependent on the ORIGINAL image size — runs in numpy on
host at request-add time, producing the variable-length feature span
the engine splices at prefill.

Input item per image: {"pixel_values": f32[n_tiles, 3, S, S],
"image_size": (orig_h, orig_w)} (the HF processor's outputs), or a
plain [3, S, S] array for a single base tile.
"""

import math
from typing import Any, Dict, List, Tuple

import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llava import LlavaForConditionalGeneration


def select_best_resolution(original_size, possible_resolutions):
    """transformers.image_processing_utils.select_best_resolution."""
    oh, ow = original_size
    best_fit = None
    max_eff = 0
    min_waste = float("inf")
    for height, width in possible_resolutions:
        scale = min(width / ow, height / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = width * height - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste = eff, waste
            best_fit = (height, width)
    return best_fit


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size):
    h, w = select_best_resolution(image_size, grid_pinpoints)
    return h // patch_size, w // patch_size


def unpad_image(x: np.ndarray, original_size) -> np.ndarray:
    """transformers llava_next.unpad_image on [C, H, W] numpy."""
    oh, ow = original_size
    ch, cw = x.shape[1:]
    if ow / oh > cw / ch:
        new_h = int(round(oh * (cw / ow), 7))
        pad = (ch - new_h) // 2
        return x[:, pad:ch - pad, :]
    new_w = int(round(ow * (ch / oh), 7))
    pad = (cw - new_w) // 2
    return x[:, :, pad:cw - pad]


class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):
    def __init__(self, model_config, parallel_config) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.grid_pinpoints = [tuple(p) for p in
                               hf.get("image_grid_pinpoints") or []]

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes["image_newline"] = (self.hidden_size,)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["image_newline"] = P()
        return specs

    def hf_aux_mappings(self):
        out = super().hf_aux_mappings()
        out.append(("image_newline", "image_newline", False, 1))
        out.append(("model.image_newline", "image_newline", False, 1))
        return out

    # ---- host-side anyres merge --------------------------------------

    def encode_image_item(self, params, item, tower_fn) -> np.ndarray:
        import jax.numpy as jnp

        if isinstance(item, dict):
            tiles = np.asarray(item["pixel_values"], np.float32)
            image_size = tuple(int(v) for v in item["image_size"])
        else:
            px = np.asarray(item, np.float32)
            tiles = px[None]
            image_size = px.shape[1:]
        feats = np.asarray(tower_fn(params, jnp.asarray(tiles)),
                           np.float32)  # [n_tiles, n_patch, H]
        newline = np.asarray(params["image_newline"], np.float32)
        g = self.v_image_size // self.v_patch
        base = feats[0]  # [g*g, H] (CLS already dropped by strategy)
        if feats.shape[0] == 1:
            return np.concatenate([base, newline[None]], axis=0)
        nph, npw = get_anyres_image_grid_shape(
            image_size, self.grid_pinpoints, self.v_image_size)
        H = feats.shape[-1]
        other = feats[1:1 + nph * npw].reshape(nph, npw, g, g, H)
        # [H, nph*g, npw*g] big patch-grid image.
        x = other.transpose(4, 0, 2, 1, 3).reshape(
            H, nph * g, npw * g)
        x = unpad_image(x, image_size)
        ch = x.shape[1]
        x = np.concatenate(
            [x, np.broadcast_to(newline[:, None, None], (H, ch, 1))],
            axis=2)  # newline column per row
        x = x.reshape(H, -1).T  # [ch*(cw+1), H]
        return np.concatenate([base, x], axis=0)
