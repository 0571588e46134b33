"""QuantLLM FPx (fp2..fp7) weight-only quantization at load.

Reference: quantization/fp6.py — checkpoints are DENSE fp16; the
reference quantizes each linear weight at load to an eXmY minifloat
grid with a per-output-row scale (torchao's to_scaled_tc_fpx:
scale = max|row| / max_normal, then round-to-nearest-even onto the
grid) and runs a CUDA dequant-GEMM. The TC bit-shuffled packing is a
tensor-core artifact with no TPU analogue, so we apply the identical
value rounding at load and serve the rounded weights dense — the
numerics match the reference's dequantized kernel output.

The method name is `quant_llm` with `fp2`..`fp7` aliases fixing the
bit width (reference quantization/__init__.py:36,54-61); exponent bits
come from quantization_config.exp_bits when present, else the
reference's default of 2 (fp6.py:31, FP6 = E2M3).
"""

from typing import Tuple

import numpy as np

# The reference defaults exp_bits=2 (fp6.py:31 -> FP6 = E2M3), capped
# so at least a sign and zero mantissa bits remain for tiny widths.
def _default_exp(bits: int) -> int:
    return min(2, bits - 1)

RUNTIME_QUANTIZE = False


def fpx_grid(ebits: int, mbits: int) -> np.ndarray:
    """All non-negative representable values of the 1+ebits+mbits
    minifloat (subnormals + normals, no inf/nan), ascending."""
    exp_bias = (1 << (ebits - 1)) - 1
    vals = []
    for e in range(1 << ebits):
        for m in range(1 << mbits):
            if e == 0:  # subnormal
                v = m / (1 << mbits) * 2.0 ** (1 - exp_bias)
            else:
                v = (1 + m / (1 << mbits)) * 2.0 ** (e - exp_bias)
            vals.append(v)
    return np.asarray(vals, np.float64)


def round_to_fpx(w: np.ndarray, ebits: int, mbits: int,
                 reduce_axis: int = -1) -> np.ndarray:
    """Scaled round-to-nearest-even onto the eXmY grid with one scale
    per output row, i.e. per slice along `reduce_axis` (to_scaled_tc_fpx
    semantics, fp6_utils.py:493-508: HF [out, in] weights reduce the
    LAST axis; our stacked [L, in, out] params reduce axis -2)."""
    w = np.asarray(w, np.float32)
    orig_shape = w.shape
    moved = np.moveaxis(w, reduce_axis, -1)
    moved_shape = moved.shape
    w2 = moved.reshape(-1, moved_shape[-1]).astype(np.float64)
    grid = fpx_grid(ebits, mbits)
    max_normal = grid[-1]
    scale = np.maximum(np.abs(w2).max(axis=1), 1e-12) / max_normal
    # fp6.py stores the scale as fp16; mirror that precision loss.
    scale = scale.astype(np.float16).astype(np.float64)
    x = w2 / scale[:, None]
    sign = np.sign(x)
    mag = np.minimum(np.abs(x), max_normal)
    # Round-to-nearest on the grid with ties going to the even code —
    # adjacent grid codes differ by 1, so "even code" is the one whose
    # index is even.
    hi = np.searchsorted(grid, mag)  # grid[hi-1] <= mag (left insert)
    hi = np.clip(hi, 1, grid.size - 1)
    lo = hi - 1
    dlo = mag - grid[lo]
    dhi = grid[hi] - mag
    pick_hi = (dhi < dlo) | ((dhi == dlo) & (hi % 2 == 0))
    # Exact grid hits: searchsorted(left) returns the element index.
    exact = grid[lo] == mag
    q = np.where(exact, grid[lo], np.where(pick_hi, grid[hi], grid[lo]))
    out = (sign * q * scale[:, None]).reshape(moved_shape)
    out = np.moveaxis(out, -1, reduce_axis)
    return np.ascontiguousarray(out.reshape(orig_shape),
                                dtype=np.float32)


def parse_bits(name: str, hf_qcfg) -> Tuple[int, int]:
    """(ebits, mbits) for a method name (fp6, quant_llm, ...) plus an
    optional quantization_config carrying bits/exp_bits."""
    qcfg = hf_qcfg or {}
    bits = int(qcfg.get("bits", 0)) or (
        int(name[2]) if name.startswith("fp") and name[2:].isdigit() else 6)
    ebits = int(qcfg.get("exp_bits", 0)) or _default_exp(bits)
    return ebits, bits - ebits - 1
