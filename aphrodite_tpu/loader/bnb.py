"""bitsandbytes checkpoint dequantization (nf4 / fp4 / int8).

Reference: model_loader/loader.py BitsAndBytesModelLoader (:667). The
reference keeps bnb's packed 4-bit weights and runs bnb CUDA kernels;
bnb's LUT codebooks have no MXU-friendly layout, so on TPU we
dequantize to dense floats at load time and serve through the normal
bf16/int8 paths. The on-disk format follows bitsandbytes >= 0.42
serialization:

  X.weight                               packed uint8, two 4-bit codes
                                         per byte (first element in the
                                         HIGH nibble), row-major over
                                         the original [out, in] shape
  X.weight.absmax                        per-64-block scale (uint8 codes
                                         when double-quantized)
  X.weight.quant_map                     the 16-entry nf4/fp4 codebook
  X.weight.nested_absmax /               double-quant: absmax's own
    .nested_quant_map                    256-block scales + 256-entry map
  X.weight.quant_state.bitsandbytes__*   JSON metadata (shape, blocksize,
                                         nested_blocksize, nested_offset)

8-bit (load_in_8bit) checkpoints store X.weight as int8 [out, in] with
a per-row X.SCB scale: w = int8 * SCB[:, None] / 127.
"""

import json
from typing import Any, Dict, Iterable, Tuple

import numpy as np

from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)

_QS_SUFFIXES = (".quant_state.bitsandbytes__nf4",
                ".quant_state.bitsandbytes__fp4")
_SIDE_SUFFIXES = (".absmax", ".quant_map", ".nested_absmax",
                  ".nested_quant_map") + _QS_SUFFIXES


def _is_side_tensor(name: str) -> bool:
    return (any(name.endswith(sfx) for sfx in _SIDE_SUFFIXES)
            or name.endswith(".SCB"))


def _dequant_4bit(name: str, packed: np.ndarray,
                  side: Dict[str, np.ndarray]) -> np.ndarray:
    qs_raw = None
    for sfx in _QS_SUFFIXES:
        qs_raw = side.get(name + sfx)
        if qs_raw is not None:
            break
    meta = json.loads(bytes(np.asarray(qs_raw, np.uint8)))
    blocksize = int(meta.get("blocksize", 64))
    shape = tuple(int(x) for x in meta["shape"])
    n = int(np.prod(shape))

    absmax = np.asarray(side[name + ".absmax"])
    if name + ".nested_absmax" in side:
        # Double quant: absmax stored as uint8 codes into the nested
        # 256-entry map, scaled per nested block, shifted by offset.
        code2 = np.asarray(side[name + ".nested_quant_map"], np.float32)
        am2 = np.asarray(side[name + ".nested_absmax"], np.float32)
        nb = int(meta.get("nested_blocksize", 256))
        offset = np.float32(meta.get("nested_offset", 0.0))
        absmax = (code2[absmax.astype(np.int64)] *
                  np.repeat(am2, nb)[:absmax.size] + offset)
    absmax = np.asarray(absmax, np.float32)

    quant_map = np.asarray(side[name + ".quant_map"], np.float32)
    raw = np.asarray(packed, np.uint8).reshape(-1)
    codes = np.empty(raw.size * 2, np.uint8)
    codes[0::2] = raw >> 4
    codes[1::2] = raw & 0xF
    codes = codes[:n]
    w = quant_map[codes] * np.repeat(absmax, blocksize)[:n]
    return w.reshape(shape).astype(np.float32)


def bnb_dequant_iterator(
        model_dir: str) -> Iterable[Tuple[str, np.ndarray]]:
    """Wrap the safetensors stream, yielding DENSE tensors for every
    bnb-quantized entry and passing everything else through."""
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    side: Dict[str, np.ndarray] = {}
    for name, arr in safetensors_weight_iterator(model_dir):
        if _is_side_tensor(name):
            side[name] = np.asarray(arr)

    n_deq = 0
    for name, arr in safetensors_weight_iterator(model_dir):
        if _is_side_tensor(name):
            continue
        if any(name + sfx in side for sfx in _QS_SUFFIXES):
            n_deq += 1
            yield name, _dequant_4bit(name, arr, side)
        elif name.endswith(".weight") and \
                name[:-len(".weight")] + ".SCB" in side:
            scb = np.asarray(side[name[:-len(".weight")] + ".SCB"],
                             np.float32)
            n_deq += 1
            yield name, (np.asarray(arr, np.float32) *
                         scb[:, None] / 127.0)
        else:
            yield name, arr
    logger.info("bitsandbytes: dequantized %d packed tensors", n_deq)


def squeezellm_dequant_iterator(
        model_dir: str) -> Iterable[Tuple[str, np.ndarray]]:
    """SqueezeLLM 4-bit LUT checkpoints -> dense weights at load.

    Format (reference quantization/squeezellm.py + the NUQ4 kernel,
    kernels/quantization/squeezellm/quant_cuda_kernel.cu:84-120):
    X.qweight int32 [in/8, out], each word packing 8 consecutive INPUT
    positions low-nibble-first for one output column; X.lookup_table
    [out, 16] per-channel codebooks. The LUT has no affine structure,
    so TPU serves these dense (dequantize-at-load, like bnb)."""
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    luts: Dict[str, np.ndarray] = {}
    for name, arr in safetensors_weight_iterator(model_dir):
        if name.endswith(".lookup_table"):
            luts[name] = np.asarray(arr)

    n_deq = 0
    for name, arr in safetensors_weight_iterator(model_dir):
        if name.endswith(".lookup_table"):
            continue
        if name.endswith(".qweight") and \
                name[:-len(".qweight")] + ".lookup_table" in luts:
            lut = np.asarray(
                luts[name[:-len(".qweight")] + ".lookup_table"],
                np.float32)  # [out, 16]
            q = np.asarray(arr).astype(np.uint32)  # [in/8, out]
            shifts = np.arange(0, 32, 4, dtype=np.uint32)
            codes = (q[:, None, :] >> shifts[None, :, None]) & 0xF
            codes = codes.reshape(-1, q.shape[1])  # [in, out]
            out_idx = np.arange(lut.shape[0])[None, :]
            w = lut[out_idx, codes.astype(np.int64)]  # [in, out]
            # -> HF's [out, in] convention.
            n_deq += 1
            yield name[:-len(".qweight")] + ".weight", \
                np.ascontiguousarray(w.T.astype(np.float32))
        else:
            yield name, arr
    logger.info("squeezellm: dequantized %d LUT tensors", n_deq)


def aqlm_dequant_iterator(model_dir: str,
                          nbits: int) -> Iterable[Tuple[str, np.ndarray]]:
    """AQLM additive-codebook checkpoints -> dense weights at load.

    Format (reference quantization/aqlm.py:34-71 dequantize_weight):
    X.codes [num_out_groups, num_in_groups, num_codebooks] (signed ints
    masked to nbits), X.codebooks [num_codebooks, codebook_size,
    out_group_size, in_group_size], X.scales [num_out_groups, 1, 1, 1];
    the weight group (og, ig) is the SUM over codebooks of the indexed
    vectors, scaled per out-group."""
    from aphrodite_tpu.loader.weights import safetensors_weight_iterator

    side: Dict[str, np.ndarray] = {}
    for name, arr in safetensors_weight_iterator(model_dir):
        if name.endswith(".codebooks") or name.endswith(".scales"):
            side[name] = np.asarray(arr)

    n_deq = 0
    for name, arr in safetensors_weight_iterator(model_dir):
        if name.endswith(".codebooks") or name.endswith(".scales"):
            continue
        if name.endswith(".codes") and \
                name[:-len(".codes")] + ".codebooks" in side:
            base = name[:-len(".codes")]
            cb = np.asarray(side[base + ".codebooks"], np.float32)
            scales = np.asarray(side[base + ".scales"], np.float32)
            codes = np.asarray(arr).astype(np.int64) & ((1 << nbits) - 1)
            og, ig, ncb = codes.shape
            _, _, ogs, igs = cb.shape
            w = cb[np.arange(ncb)[None, None, :], codes]
            w = w.sum(axis=2)  # [og, ig, ogs, igs]
            w = w * scales.reshape(og, 1, 1, 1)
            w = w.transpose(0, 2, 1, 3).reshape(og * ogs, ig * igs)
            n_deq += 1
            yield base + ".weight", np.ascontiguousarray(
                w.astype(np.float32))
        else:
            yield name, arr
    logger.info("aqlm: dequantized %d additive-codebook tensors", n_deq)


def _safetensors_raw_entries(path: str):
    """Header dict {name: (dtype_str, shape, (start, end))} + data
    offset — lets us read dtypes the safetensors numpy backend can't
    (fp8)."""
    import json as _json
    import struct

    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        header = _json.loads(f.read(n))
    return header, 8 + n


def modelopt_dequant_iterator(model_dir: str
                              ) -> Iterable[Tuple[str, np.ndarray]]:
    """ModelOpt FP8 checkpoints -> dense weights at load.

    Format (reference quantization/modelopt.py): X.weight stored
    fp8_e4m3fn with per-tensor X.weight_scale (f32); X.input_scale is
    the static activation scale (dropped — our fp8 path quantizes
    activations dynamically). The numpy safetensors backend can't map
    F8_E4M3, so fp8 tensors read raw and view via ml_dtypes."""
    import os as _os

    import ml_dtypes

    index_path = _os.path.join(model_dir, "model.safetensors.index.json")
    if _os.path.exists(index_path):
        import json as _json

        with open(index_path) as f:
            files = sorted(set(_json.load(f)["weight_map"].values()))
    else:
        files = sorted(fn for fn in _os.listdir(model_dir)
                       if fn.endswith(".safetensors"))

    # Pass 1: scales + fp8 entries from raw headers.
    scales: Dict[str, np.ndarray] = {}
    fp8_entries: Dict[str, Tuple[str, tuple, tuple, int]] = {}
    for fn in files:
        path = _os.path.join(model_dir, fn)
        header, base = _safetensors_raw_entries(path)
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            if meta["dtype"] in ("F8_E4M3", "F8_E5M2"):
                fp8_entries[name] = (meta["dtype"],
                                     tuple(meta["shape"]),
                                     tuple(meta["data_offsets"]), base,
                                     path)

    n_deq = 0
    from safetensors import safe_open

    for fn in files:
        path = _os.path.join(model_dir, fn)
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                if name in fp8_entries:
                    continue  # raw-read below (np backend can't map)
                arr = f.get_tensor(name)
                if name.endswith(".input_scale"):
                    continue
                if name.endswith(".weight_scale"):
                    scales[name] = np.asarray(arr, np.float32)
                    continue
                yield name, arr
    for name, (dt, shape, (lo, hi), base, path) in fp8_entries.items():
        with open(path, "rb") as f:
            f.seek(base + lo)
            raw = f.read(hi - lo)
        ftype = (ml_dtypes.float8_e4m3fn if dt == "F8_E4M3"
                 else ml_dtypes.float8_e5m2)
        w = np.frombuffer(raw, dtype=ftype).reshape(shape)
        scale = scales.get(name + "_scale")
        sval = float(scale.reshape(-1)[0]) if scale is not None else 1.0
        n_deq += 1
        yield name, np.ascontiguousarray(
            w.astype(np.float32) * sval)
    logger.info("modelopt: dequantized %d fp8 tensors", n_deq)
