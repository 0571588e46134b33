"""experts_int8: load-time int8 quantization of MoE EXPERT weights.

Reference parity: aphrodite/quantization/experts_int8.py — experts are
quantized to int8 with per-(expert, out-channel) scales at load so
large expert stacks fit HBM; attention/router/dense layers stay full
precision. The expert containers {q int8[L, E, K, N],
scale f32[L, E, 1, N]} materialize to the compute dtype per layer
inside the lax.scan (one layer's experts at a time — the capacity win
holds) and run through the same ragged_dot path (ops/moe.py).
"""

from typing import Any, Dict

import numpy as np

NAME = "experts_int8"
RUNTIME_QUANTIZE = True
# Only the model's expert_weights() quantize (loader
# quantize_params_at_load).
EXPERT_ONLY = True


def quantize_from_float(w: np.ndarray) -> Dict[str, Any]:
    """w[..., K, N] float -> {q: int8, scale: f32[..., 1, N]}."""
    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.maximum(absmax / 127.0, 1e-8).astype(np.float32)
    q = np.clip(np.round(w / scale), -128, 127).astype(np.int8)
    return {"q": q, "scale": scale}
