"""KV-cache scale calibration + export.

TPU-native answer to the reference's offline calibration toolkit
(`aphrodite/kv_quant/{calibrate.py,observer.py,export_kv_params.py}`,
LMDeploy-derived): run calibration text through the model with a
full-precision KV cache, record per-layer absmax of the written K/V, and
export per-layer scales in the exact JSON schema the engine loads via
``--quantization-param-path``
(loader/weights.py::load_kv_cache_scales; reference
weight_utils.py:504).

Where the reference hooks per-layer torch observers into the forward,
ours reads the absmax straight off the paged bf16 KV cache after
prefill — the cache rows ARE the post-RoPE K/V the quantized cache would
store, so the observed range is exactly what quantize-on-write will see.

Usage (offline):
    python -m aphrodite_tpu.tools.kv_calibrate <model_dir> \
        --output kv_scales.json [--text-file calib.txt] [--fmt e4m3]

then serve with:
    aphrodite run <model_dir> --kv-cache-dtype fp8 \
        --quantization-param-path kv_scales.json
"""

import argparse
import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)

# Representable maxima of the narrow cache dtypes (float8_e4m3fn /
# float8_e5m2 / int8).
FMT_MAX = {"e4m3": 448.0, "e5m2": 57344.0, "int8": 127.0}

_DEFAULT_CALIB_TEXTS = [
    "The quick brown fox jumps over the lazy dog. " * 8,
    "In a shocking finding, scientists discovered a herd of unicorns "
    "living in a remote, previously unexplored valley. " * 4,
    "def fibonacci(n):\n    if n < 2:\n        return n\n    "
    "return fibonacci(n - 1) + fibonacci(n - 2)\n" * 4,
    "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 " * 4,
]


def observe_kv_absmax(llm) -> Dict[str, np.ndarray]:
    """Per-layer absmax of K and V currently resident in the bf16 cache.

    Cache layout [L, P+1, ps, 2*KV, D]: combined-head index 2h holds K of
    kv-head h, 2h+1 holds V (ops/kv_cache.write_kv interleave).
    Unwritten slots are zero and cannot raise an absmax.
    """
    pages = llm.engine.runner.kv_pages
    if str(pages.dtype) not in ("bfloat16", "float32"):
        raise ValueError(
            f"calibration needs a full-precision cache, got {pages.dtype}"
            " — run with kv_cache_dtype='auto'")
    arr = np.asarray(pages, dtype=np.float32)  # [L, P, ps, 2KV, D]
    k_amax = np.abs(arr[:, :, :, 0::2, :]).max(axis=(1, 2, 3, 4))
    v_amax = np.abs(arr[:, :, :, 1::2, :]).max(axis=(1, 2, 3, 4))
    return {"k_amax": k_amax, "v_amax": v_amax}


def calibrate_kv_scales(
    llm,
    texts: Optional[Sequence[str]] = None,
    prompt_token_ids: Optional[List[List[int]]] = None,
    fmt: str = "e4m3",
) -> Dict[int, float]:
    """Prefill calibration prompts, observe K/V ranges, return per-layer
    scales (one scale per layer applied to both K and V, matching the
    reference's schema and our loader)."""
    from aphrodite_tpu.common.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=1, detokenize=False)
    if prompt_token_ids is not None:
        llm.generate(prompt_token_ids=prompt_token_ids, sampling_params=sp)
    else:
        llm.generate(list(texts or _DEFAULT_CALIB_TEXTS),
                     sampling_params=sp)
    obs = observe_kv_absmax(llm)
    amax = np.maximum(obs["k_amax"], obs["v_amax"])
    dtype_max = FMT_MAX[fmt]
    scales = {}
    for layer, a in enumerate(amax):
        # Guard unobserved layers (amax 0) with the identity scale.
        scales[layer] = float(a / dtype_max) if a > 0 else 1.0
    logger.info("calibrated %d layers: scale range [%.4g, %.4g]",
                len(scales), min(scales.values()), max(scales.values()))
    return scales


def export_kv_params(scales: Dict[int, float], path: str,
                     tp_rank: int = 0) -> None:
    """Write the --quantization-param-path JSON (reference
    kv_quant/export_kv_params.py schema, consumed by
    weight_utils.py:504 / our loader/weights.py:446)."""
    payload = {
        "kv_cache": {
            "dtype": "float8_e4m3",
            "scaling_factor": {
                str(tp_rank): {str(k): v for k, v in sorted(scales.items())}
            },
        }
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    logger.info("kv scales written to %s", path)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="calibrate per-layer KV-cache scales")
    parser.add_argument("model", help="model directory")
    parser.add_argument("--output", default="kv_scales.json")
    parser.add_argument("--text-file", default=None,
                        help="newline-separated calibration texts "
                             "(default: built-in sample)")
    parser.add_argument("--fmt", choices=sorted(FMT_MAX), default="e4m3")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--max-num-seqs", type=int, default=8)
    args = parser.parse_args(argv)

    from aphrodite_tpu import LLM

    texts = None
    if args.text_file:
        with open(args.text_file) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
    llm = LLM(model=args.model, dtype=args.dtype,
              max_num_seqs=args.max_num_seqs)
    scales = calibrate_kv_scales(llm, texts=texts, fmt=args.fmt)
    export_kv_params(scales, args.output)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
