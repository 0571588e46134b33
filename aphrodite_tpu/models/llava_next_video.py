"""LLaVA-NeXT-Video: the LLaVA CLIP tower applied per video frame with
a spatial 2x2 pool before the projector.

Reference: aphrodite/modeling/models/llava_next_video.py. TPU design:
the frame batch runs through the SAME jitted CLIP tower as LLaVA (one
call for all frames), then the parameter-free spatial pool + projector;
each video contributes num_frames * (grid/stride)^2 features at its
video-placeholder token. Video items are pixel stacks
[num_frames, 3, S, S] under the engine's "video" modality key.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.llava import LlavaForConditionalGeneration


class LlavaNextVideoForConditionalGeneration(LlavaForConditionalGeneration):
    modality = "video"

    def __init__(self, model_config, parallel_config=None) -> None:
        super().__init__(model_config, parallel_config)
        hf = model_config.hf_config
        self.image_token_index = int(hf.get("video_token_index", 32000))
        self.pool_stride = int(hf.get("spatial_pool_stride", 2))
        self.pool_mode = str(hf.get("spatial_pool_mode", "average"))
        grid = self.v_image_size // self.v_patch
        self.tokens_per_frame = (grid // self.pool_stride) ** 2
        self.num_image_tokens = self.tokens_per_frame  # per frame

    def encode_images(self, params: Dict[str, Any],
                      pixel_values: jax.Array) -> jax.Array:
        """[F, 3, S, S] frames -> [F, tokens_per_frame, tH]: CLIP tower
        (feature layer/strategy as LLaVA), spatial pool, projector."""
        from aphrodite_tpu.models.clip_vision import clip_tower

        x = clip_tower(params["vision"], pixel_values,
                       patch=self.v_patch, image_size=self.v_image_size,
                       hidden=self.v_hidden, heads=self.v_heads,
                       eps=self.v_eps)
        if self.feature_strategy == "default":
            x = x[:, 1:]
        F = x.shape[0]
        g = self.v_image_size // self.v_patch
        s = self.pool_stride
        x = x.reshape(F, g, g, -1)
        x = x.reshape(F, g // s, s, g // s, s, x.shape[-1])
        if self.pool_mode == "max":
            x = jnp.max(x, axis=(2, 4))
        else:
            x = jnp.mean(x, axis=(2, 4))
        x = x.reshape(F, self.tokens_per_frame, -1)
        pj = params["projector"]
        x = x @ pj["w1"].astype(jnp.float32) + pj["b1"].astype(
            jnp.float32)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ pj["w2"].astype(jnp.float32) + pj["b2"].astype(
            jnp.float32)
        return x.astype(self.dtype)

    def encode_image_item(self, params, item, fn=None) -> np.ndarray:
        px = np.asarray(item, np.float32)
        if px.ndim == 3:
            px = px[None]  # single frame
        S = self.v_image_size
        if px.ndim != 4 or px.shape[1:] != (3, S, S):
            raise ValueError(
                "LLaVA-NeXT-Video items must be frame stacks "
                f"[num_frames, 3, {S}, {S}]; got {px.shape}")
        if fn is None:
            fn = jax.jit(self.encode_images)
        out = np.asarray(fn(params, jnp.asarray(px)))
        return out.reshape(-1, out.shape[-1]).astype(np.float32)
