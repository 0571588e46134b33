"""INT8 weight-only quantization (per-output-channel scales).

Reference parity: aphrodite/quantization/tpu_int8.py — the only method the
reference could run on TPU. Weights are quantized at load time from the
fp16/bf16 checkpoint (`_quantize_weight`, tpu_int8.py:77-91); the matmul
keeps int8 operands on the MXU and folds dequant into one output rescale
(quantization/qlinear.py:_int8_matmul).
"""

from typing import Any, Dict

import numpy as np

NAME = "int8"
# Weights arrive as full-precision checkpoints; we quantize at load.
RUNTIME_QUANTIZE = True


def quantize_from_float(w: np.ndarray) -> Dict[str, Any]:
    """w[..., K, N] float -> {q: int8, scale: f32[..., 1, N]}."""
    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.maximum(absmax / 127.0, 1e-8).astype(np.float32)
    q = np.clip(np.round(w / scale), -128, 127).astype(np.int8)
    return {"q": q, "scale": scale}
