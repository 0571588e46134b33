"""FP8 (E4M3) W8A8 quantization with per-channel weight scales.

Reference parity: aphrodite/quantization/fp8.py + CUTLASS w8a8 kernels
(kernels/quantization/cutlass_w8a8, fp8/common.cu): weights per-channel
static scales, activations dynamically quantized per token in-graph
(quantization/qlinear.py:_fp8_w8a8_matmul). Checkpoints already in fp8
(weight + weight_scale tensors) load directly; bf16 checkpoints are
quantized at load when --quantization fp8 is requested.
"""

from typing import Any, Dict

import numpy as np

NAME = "fp8"
RUNTIME_QUANTIZE = True

_E4M3_MAX = 448.0


def quantize_from_float(w: np.ndarray) -> Dict[str, Any]:
    """w[..., K, N] float -> {q: f8e4m3, scale: f32[..., 1, N], act: fp8}."""
    import ml_dtypes

    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.maximum(absmax / _E4M3_MAX, 1e-12).astype(np.float32)
    q = (w / scale).astype(ml_dtypes.float8_e4m3fn)
    # No marker key: qmatmul dispatches W8A8 on q.dtype == float8_e4m3fn
    # (string leaves would break pytree maps / lax.scan).
    return {"q": q, "scale": scale}
