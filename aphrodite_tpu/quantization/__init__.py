"""Quantization registry (reference: aphrodite/quantization/__init__.py:29-63).

Methods map HF `quantization_config.quant_method` strings to our quantized
weight containers + matmul implementations. The reference's 25-method CUDA
zoo collapses into a small set of TPU-native kernels:
- int8 / tpu_int8: per-channel weight-only int8 (reference tpu_int8.py)
- fp8: W8A8 float8-e4m3 with per-channel weight + dynamic per-token
  activation scales (reference fp8.py / CUTLASS w8a8)
- gptq / awq: 4-bit group-quantized weight-only (reference Marlin/Machete
  GEMMs) via a fused dequant-matmul Pallas kernel
- compressed-tensors: config translation onto the above
"""

from typing import Optional

_SUPPORTED = ("int8", "tpu_int8", "fp8", "gptq", "awq", "compressed-tensors")


def get_quantization_method(name: Optional[str]):
    """Returns the quant method module for a config name (None = dense)."""
    if name is None:
        return None
    name = name.lower()
    if name in ("int8", "tpu_int8", "eetq"):
        # eetq is int8 weight-only quantized AT LOAD from a normal
        # checkpoint (reference eetq.py quantizes via the EETQ lib);
        # per-channel int8 at load is the same capability here.
        from aphrodite_tpu.quantization import int8 as m

        return m
    if name == "experts_int8":
        from aphrodite_tpu.quantization import experts_int8 as m

        return m
    if name in ("fp8", "fbgemm_fp8"):
        from aphrodite_tpu.quantization import fp8 as m

        return m
    if name in ("bitsandbytes", "squeezellm", "aqlm", "hqq", "qqq",
                "marlin", "gptq_marlin_24", "quant_llm", "fp2", "fp3",
                "fp4", "fp5", "fp6", "fp7", "quip", "modelopt",
                "deepspeedfp"):
        # Handled entirely by the loader (dequantize-at-load or
        # quantize-at-load); no runtime quant method.
        return None
    if name in ("gptq", "awq", "awq_marlin", "gptq_marlin"):
        from aphrodite_tpu.quantization import int4 as m

        return m
    raise ValueError(
        f"quantization method {name!r} is not supported yet; "
        f"supported: {_SUPPORTED}")
